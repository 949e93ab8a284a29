package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Ingest
import java.nio.file.Files

class IngestSpec extends AnyFunSuite {
  import SparkSuite._

  private lazy val docs = Tables.documents(spark, Sf)

  test("jsonl roundtrip preserves the corpus") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/d"
    docs.select("doc_id", "text", "lang", "source").write.json(dir)
    val back = Ingest.fromJsonl(spark, dir)
    assert(back.count() === docs.count())
    assert(back.agg(sum("n_chars")).head().getLong(0)
      === docs.agg(sum("n_chars")).head().getLong(0))
  }

  test("csv roundtrip preserves the corpus") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/d"
    docs.select("doc_id", "text", "lang", "source")
      .write.option("header", "true").csv(dir)
    val back = Ingest.fromCsv(spark, dir)
    assert(back.count() === docs.count())
  }

  test("text ingest assigns ids and filters empties") {
    val dir = Files.createTempDirectory("graft-txt").toString + "/d"
    docs.select("text").write.text(dir)
    val back = Ingest.fromText(spark, dir, "txt")
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
  }

  test("text re-ingest is idempotent end-to-end (content-derived ids)") {
    // the positional-id assignment made every re-read of the same file
    // look new to the anti-join (r9 review) — content-hash ids fix it
    val src = Files.createTempDirectory("graft-txt2").toString + "/d"
    docs.select("text").write.text(src)
    val corpus = Files.createTempDirectory("graft-txt2c").toString + "/c"
    val n1 = Ingest.appendCorpus(Ingest.fromText(spark, src, "txt"), corpus)
    assert(n1 > 0)
    val n2 = Ingest.appendCorpus(Ingest.fromText(spark, src, "txt"), corpus)
    assert(n2 === 0, "re-ingesting the same file must append nothing")
  }

  test("incremental append is idempotent: a re-run ingests zero duplicates") {
    val dir = Files.createTempDirectory("graft-incr").toString + "/c"
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val total = docs.count()
    // initial corpus: the first half of the docs
    Ingest.writeCorpus(docs.filter(col("doc_id") % 2 === 0).selectExpr(cols: _*), dir)
    // a batch overlapping the corpus: only the new half lands
    val n1 = Ingest.appendCorpus(docs.selectExpr(cols: _*), dir)
    assert(n1 === docs.filter(col("doc_id") % 2 === 1).count())
    // re-delivering the same batch appends nothing
    val n2 = Ingest.appendCorpus(docs.selectExpr(cols: _*), dir)
    assert(n2 === 0)
    val corpus = spark.read.parquet(dir)
    assert(corpus.count() === total)
    assert(corpus.select("doc_id").distinct().count() === total)
  }

  test("compaction collapses append-accumulated small files without changing data") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/c"
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    Ingest.writeCorpus(docs.filter(col("doc_id") % 4 === 0).selectExpr(cols: _*), dir)
    // three incremental appends, each leaving its own files per partition
    (1 to 3).foreach(r =>
      Ingest.appendCorpus(docs.filter(col("doc_id") % 4 === r).selectExpr(cols: _*), dir))
    val before = spark.read.parquet(dir)
    val beforeRows = before.collect().map(_.toString).sorted
    def parquetFiles(p: String): Long = {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(p), spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(p), true)
      var n = 0L
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
      n
    }
    val filesBefore = parquetFiles(dir)
    val filesAfter = Ingest.compactCorpus(spark, dir)
    assert(filesAfter < filesBefore, s"$filesAfter >= $filesBefore")
    val afterRows = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(afterRows.toSeq === beforeRows.toSeq)
  }

  test("corpus writer partitions by lang for directory pruning") {
    val dir = Files.createTempDirectory("graft-corpus").toString + "/c"
    Ingest.writeCorpus(docs.select("doc_id", "text", "lang", "source", "n_chars"), dir)
    val parts = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(parts.length === 5, parts.mkString(","))
    val en = spark.read.parquet(dir).filter(col("lang") === "en")
    en.collect()
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
  }
}
