package graft.tools

import graft.operators.{LinearTextModel, LogisticCrossScorer}

/** Generates the committed model test artifacts (deterministic, so the
  * binaries are reproducible byte-for-byte):
  * `sbt "runMain graft.tools.MakeModel src/test/resources/graft"`.
  */
object MakeModel {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("src/test/resources/graft")
    new java.io.File(dir).mkdirs()
    val gltm = s"$dir/text_linear_64.gltm"
    val vocab = 256
    val dim = 64
    val rnd = new java.util.Random(42)
    val weights = Array.fill(vocab)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    LinearTextModel.save(gltm, new LinearTextModel(vocab, dim, weights))
    println(s"wrote $gltm (${new java.io.File(gltm).length()} bytes)")
    // the distilled logistic rerank scorer: bias, then weights for
    // (overlap, jaccard, log1p(len), query-coverage) — plausible
    // hand-distilled values; being LOADED FROM BYTES is the point
    val glsc = s"$dir/cross_logistic.glsc"
    LogisticCrossScorer.save(glsc, new LogisticCrossScorer(
      Array(-2.0f, 0.7f, 3.0f, 0.15f, 1.5f)))
    println(s"wrote $glsc (${new java.io.File(glsc).length()} bytes)")

    // r11: the committed BPE tokenizer vocab — deterministic greedy
    // byte-pair training over the sf0.001 corpus word frequencies
    // (tie-broken lexicographically, so retraining on the same corpus
    // is byte-stable). Goes into main resources: the tokenizer ships
    // with the library like a real vocab file.
    val corpusDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val bpeOut = "src/main/resources/graft/bpe_merges.gbpe"
    if (new java.io.File(corpusDir).exists()) {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
      import org.apache.spark.sql.functions._
      val freqs = spark.read.parquet(s"$corpusDir/documents.parquet")
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy { case (w, f) => (-f, w) }
      new java.io.File(bpeOut).getParentFile.mkdirs()
      // 48 merges: the synthetic corpus vocabulary is small (~31
      // words, Σ(len−1) ≈ 124 pair slots), so training to exhaustion
      // would collapse every word to one token — the cap leaves real
      // subword structure for the apply loop to exercise
      graft.operators.BpeTokenizer.save(bpeOut,
        graft.operators.BpeTokenizer.train(freqs, numMerges = 48))
      println(s"wrote $bpeOut (${new java.io.File(bpeOut).length()} bytes, " +
        s"${freqs.size} distinct words)")
      spark.stop()
    } else println(s"skipping BPE artifact: no corpus at $corpusDir")
  }
}
