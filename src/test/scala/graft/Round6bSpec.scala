package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EventOps, TextAnalysis, TrainingMix}

/** Round-6 batch 5: hourly session concurrency, decayed LTV,
  * duplicate-line profile, PMI collocations, weighted sampling.
  * Each query is checked against an independent brute-force
  * recomputation, not just shape invariants.
  */
class Round6bSpec extends AnyFunSuite {
  import SparkSuite._

  test("concurrency matches the brute-force overlap count and conserves session totals") {
    val c = EventOps.concurrency(spark, Sf)
    val sess = EventOps.sessionize(spark, Sf)
      .select(expr("start_us div 3600000000").as("h0"),
        expr("end_us div 3600000000").as("h1"))
    // every session starts exactly once
    assert(c.agg(sum("started_sessions")).head().getLong(0) === sess.count())
    assert(c.filter(col("active_sessions") < col("started_sessions")).count() === 0)
    // brute force: for EVERY hour in the output, active = sessions with h0 ≤ h ≤ h1
    val brute = c.select(col("hour_id")).crossJoin(sess)
      .filter(col("h0") <= col("hour_id") && col("hour_id") <= col("h1"))
      .groupBy("hour_id").agg(count(lit(1)).as("bf"))
    val mism = c.join(brute, "hour_id")
      .filter(col("active_sessions") =!= col("bf")).count()
    assert(mism === 0)
    // no hour outside any session's span appears
    assert(c.filter(col("active_sessions") === 0).count() === 0)
  }

  test("decayed LTV equals the per-row recomputation and never exceeds raw value") {
    val out = EventOps.decayLtv(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val p = Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(p.nonEmpty && out.nonEmpty)
    val ref = p.map(_._2).max
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    p.groupBy(_._1).foreach { case (uid, rows) =>
      val (n, raw, dec) = out(uid)
      assert(n === rows.length)
      val rawE = r6(rows.map(r => math.floor(r._3 * 100.0 + 0.5).toLong).sum / 100.0)
      val decE = r6(rows.map { r =>
        val decay = math.pow(0.5, ((ref - r._2) / 86400000000.0) / 30.0)
        math.floor(r._3 * decay * 1e6 + 0.5).toLong
      }.sum / 1e6)
      assert(raw === rawE, s"user $uid raw")
      assert(dec === decE, s"user $uid decayed")
      assert(dec <= raw + 1e-9, s"user $uid decay must shrink value")
    }
  }

  test("dup-line fractions match hand computation on fixtures") {
    import spark.implicits._
    val df = Seq(
      (1L, "a\na\nb"),          // 2 of 3 lines duplicated
      (2L, "x\n  \n\nx\nyy"),   // blank lines dropped: x,x,yy → 2/3 count, 2/4 chars
      (3L, "solo"),
      (4L, "   \n\t\n")         // nothing survives trimming
    ).toDF("doc_id", "text")
    val lines = filter(transform(split(col("text"), "\n"), l => trim(l)),
      l => length(l) > 0)
    val got = df.select(col("doc_id"),
      TextAnalysis.dupCountFrac(lines).as("fc"),
      TextAnalysis.dupCharFrac(lines).as("fl"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got(1L) === (r6(2.0 / 3), r6(2.0 / 3)))
    assert(got(2L) === (r6(2.0 / 3), r6(2.0 / 4)))
    assert(got(3L) === (0.0, 0.0))
    assert(got(4L) === (0.0, 0.0))
  }

  test("dup-line profile over the corpus stays in range and keep agrees with the fractions") {
    val d = TextAnalysis.dupLines(spark, Sf)
    assert(d.count() === Tables.documents(spark, Sf).count())
    assert(d.filter(col("dup_line_frac") < 0 || col("dup_line_frac") > 1).count() === 0)
    assert(d.filter(col("dup_char_frac") < 0 || col("dup_char_frac") > 1).count() === 0)
    assert(d.filter(col("keep") =!=
      (col("dup_line_frac") <= 0.30 && col("dup_char_frac") <= 0.20).cast("long"))
      .count() === 0)
  }

  test("pmi matches the brute-force counts and orders by association strength") {
    val got = TextAnalysis.pmi(spark, Sf, minCount = 2, topK = 10).collect()
    assert(got.nonEmpty)
    // brute force counts off the same tokenization
    val docs = Tables.documents(spark, Sf).select("text").collect().map(_.getString(0))
    val toks = docs.map(_.trim.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val bis = toks.flatMap(t => t.zip(t.drop(1)).map { case (a, b) => s"$a $b" })
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nu = uni.values.sum.toDouble
    val nb = bis.values.sum.toDouble
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    var prev = Double.MaxValue
    got.foreach { r =>
      val (bg, cbg, ca, cb, pmi) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      val Array(a, b) = bg.split(" ", 2)
      assert(cbg === bis(bg) && cbg >= 2)
      assert(ca === uni(a) && cb === uni(b))
      val exp = r6(math.log((cbg / nb) / ((ca / nu) * (cb / nu))))
      assert(pmi === exp, s"pmi($bg)")
      assert(pmi <= prev); prev = pmi
    }
  }

  test("weighted sample equals the brute-force Efraimidis–Spirakis top-k") {
    val k = 3
    val got = TrainingMix.weightedSample(spark, Sf, perSource = k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    val docs = Tables.documents(spark, Sf)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      rows.map { case (id, _, nc) =>
        val h1 = (id * 2654435761L + 40503L) % 4294967296L
        val h2 = (h1 * 1103515245L + 11L) % 4294967296L
        val u = (h2 + 0.5) / 4294967296.0
        (id, math.log(u) / math.max(nc, 1L))
      }.sortBy { case (id, pri) => (-pri, id) }
        .take(k).zipWithIndex
        .map { case ((id, _), i) => (id, src, (i + 1).toLong) }
    }.toSet
    assert(got === exp)
    // deterministic: a second run is identical
    val again = TrainingMix.weightedSample(spark, Sf, perSource = k)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(again === got)
  }
}
