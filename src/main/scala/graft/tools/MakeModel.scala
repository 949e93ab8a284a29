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
  }
}
