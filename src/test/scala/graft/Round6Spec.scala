package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EventOps, TextAnalysis, TrainingMix}

/** Round-6 additions: as-of join, grid gap-fill, char-weighted
  * repetition, readability, hash-threshold stratified sampling.
  */
class Round6Spec extends AnyFunSuite {
  import SparkSuite._

  test("asof join covers every purchase and matches the brute-force range formulation") {
    val a = EventOps.asofJoin(spark, Sf)
    val ev = Tables.events(spark, Sf)
    assert(a.count() === ev.filter(col("event_type") === "purchase").count())
    // the carried click never postdates its purchase; the gap is consistent
    assert(a.filter(col("click_us") > col("us")).count() === 0)
    assert(a.filter(col("click_us").isNotNull &&
      col("gap_us") =!= col("us") - col("click_us")).count() === 0)
    assert(a.filter(col("click_us").isNull && col("click_val").isNotNull).count() === 0)
    // brute force: per purchase, max click timestamp ≤ the purchase's
    val e = ev.select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("us").as("cus"))
    val brute = e.filter(col("event_type") === "purchase")
      .join(c, col("user_id") === col("cu") && col("cus") <= col("us"), "left")
      .groupBy(col("event_id")).agg(max(col("cus")).as("bf_click_us"))
    val mismatches = a.select(col("event_id"), col("click_us")).join(brute, "event_id")
      .filter(!(col("click_us") <=> col("bf_click_us"))).count()
    assert(mismatches === 0)
  }

  test("gap fill materializes the complete type × hour grid with conserved totals") {
    val g = EventOps.gapFill(spark, Sf)
    val ev = Tables.events(spark, Sf)
    val types = ev.select("event_type").distinct().count()
    val b = g.agg(min("hb").as("lo"), max("hb").as("hi")).head()
    assert(g.count() === types * (b.getLong(1) - b.getLong(0) + 1))
    assert(g.groupBy("event_type", "hb").count().filter(col("count") > 1).count() === 0)
    assert(g.agg(sum("n")).head().getLong(0) === ev.count())
    // filled cells are explicit zeros, not absences
    assert(g.filter(col("n") === 0).count() > 0)
    assert(g.filter(col("n") === 0 && col("val_sum") =!= 0.0).count() === 0)
  }

  test("dup-char fraction matches the hand computation on fixtures") {
    import spark.implicits._
    import graft.functions.TextFunctions.{gramsAll, tokens}
    val got = Seq("a b a b", "x y z", "q q q q q", "solo")
      .toDF("text")
      .select(TextAnalysis.dupCharFrac(gramsAll(tokens(col("text")), 2)).as("f"))
      .as[Double].collect().toSeq
    // "a b a b": grams {a b, b a, a b} → dup 2·3, tot 9; "q q…": all dup
    assert(got === Seq(0.666667, 0.0, 1.0, 0.0))
  }

  test("repetition fracs are bounded and keep is exactly their conjunction") {
    val r = TextAnalysis.repetition(spark, Sf)
    Seq("dup2_char_frac", "dup3_char_frac", "dup4_char_frac").foreach { c =>
      assert(r.filter(col(c) < 0.0 || col(c) > 1.0).count() === 0, c)
    }
    val expected = ((col("dup2_char_frac") <= 0.10) && (col("dup3_char_frac") <= 0.08)
      && (col("dup4_char_frac") <= 0.06)).cast("long")
    assert(r.filter(col("keep") =!= expected).count() === 0)
    assert(r.count() === Tables.documents(spark, Sf).count())
  }

  test("readability columns match a plain-Scala recount") {
    val rows = TextAnalysis.readability(spark, Sf).orderBy("doc_id").limit(8).collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, Sf).orderBy("doc_id").limit(8)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val t = texts(r.getLong(r.fieldIndex("doc_id")))
      val words = t.trim.split("\\s+").length
      val syl = "[aeiouy]+".r.findAllIn(t.toLowerCase).size
      val sent = math.max("[.!?]+".r.findAllIn(t).size, 1)
      assert(r.getLong(r.fieldIndex("n_words")) === words.toLong)
      assert(r.getLong(r.fieldIndex("n_syllables")) === syl.toLong)
      assert(r.getLong(r.fieldIndex("n_sentences")) === sent.toLong)
      val ease = 206.835 - 1.015 * (words.toDouble / sent) - 84.6 * (syl.toDouble / words)
      assert(math.abs(r.getDouble(r.fieldIndex("flesch_ease")) - ease) < 1e-5)
    }
  }

  test("scd2 intervals tile each user's timeline: contiguous versions, abutting bounds") {
    val s = EventOps.scd2(spark, Sf)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val chk = s
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .withColumn("next_tier", lead(col("tier"), 1).over(w))
      .withColumn("rn", row_number().over(w))
    // versions are 1..n with no gaps
    assert(chk.filter(col("version") =!= col("rn")).count() === 0)
    // each interval closes exactly where the next opens; only the last is open
    assert(chk.filter(col("next_from").isNotNull &&
      col("valid_to_us") =!= col("next_from")).count() === 0)
    assert(chk.filter(col("next_from").isNull && col("valid_to_us").isNotNull).count() === 0)
    // consecutive versions always change tier (runs were collapsed)
    assert(chk.filter(col("next_tier").isNotNull && col("next_tier") === col("tier")).count() === 0)
    // every event's tier agrees with the version covering its timestamp
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        expr("cast(get_json_object(props, '$.k') as int) div 25").as("ev_tier"))
    val covered = ev.join(s, Seq("user_id"))
      .filter(col("us") >= col("valid_from_us") &&
        (col("valid_to_us").isNull || col("us") < col("valid_to_us")))
    assert(covered.count() === ev.count())
    assert(covered.filter(col("ev_tier") =!= col("tier")).count() === 0)
  }

  test("triangle listing matches a brute-force closure over the frequent-pair set") {
    val tri = graft.operators.GraphOps.triangles(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(tri.nonEmpty)
    tri.foreach { case (a, b, c, _) => assert(a < b && b < c) }
    // brute force over the (bounded) frequent-pair set
    val b = Tables.lineitem(spark, Sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val sup = b.as("x").join(b.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .groupBy(col("x.p").as("pa"), col("y.p").as("pb")).count()
      .filter(col("count") >= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val verts = sup.keySet.flatMap(e => Set(e._1, e._2)).toSeq.sorted
    val brute = for {
      (a, b2) <- sup.keySet.toSeq
      c <- verts if b2 < c && sup.contains((b2, c)) && sup.contains((a, c))
    } yield (a, b2, c, Seq(sup((a, b2)), sup((b2, c)), sup((a, c))).min)
    assert(tri.toSet === brute.toSet)
  }

  test("benford audit: digits 1-9, fractions sum to one, chi2 terms non-negative") {
    val b = graft.operators.Relational.benford(spark, Sf).collect()
    assert(b.map(_.getLong(0)).toSeq.sorted === (1L to 9L))
    val obsSum = b.map(_.getDouble(2)).sum
    assert(math.abs(obsSum - 1.0) < 1e-4, obsSum)
    // exp fracs are the Benford constants
    b.foreach { r =>
      val d = r.getLong(0)
      assert(math.abs(r.getDouble(3) - math.log10(1.0 + 1.0 / d)) < 1e-6)
      assert(r.getDouble(4) >= 0.0)
    }
    assert(b.map(_.getLong(1)).sum ===
      Tables.orders(spark, Sf).filter(col("o_totalprice") > 0).count())
  }

  test("zipf fit: every language slopes downward and uses at most topN ranks") {
    val z = TextAnalysis.zipf(spark, Sf).collect()
    assert(z.nonEmpty)
    z.foreach { r =>
      assert(r.getDouble(r.fieldIndex("zipf_slope")) < 0.0)
      assert(r.getLong(r.fieldIndex("n")) <= 100L)
    }
  }

  test("pca power iteration returns one unit-norm direction per dimension") {
    val p = graft.operators.KnnSearch.pcaIter(spark, Sf).collect()
    val d = Tables.embeddings(spark, Sf).select(size(col("embedding"))).head().getInt(0)
    assert(p.length === d)
    assert(p.map(_.getLong(0)).toSeq === (1 to d).map(_.toLong))
    val norm = p.map(r => math.pow(r.getDouble(1), 2)).sum
    assert(math.abs(norm - 1.0) < 1e-3)
    // the direction is non-degenerate: not a single dominant axis
    assert(p.map(r => math.abs(r.getDouble(1))).max < 0.999)
  }

  test("frame sampling keeps every stride-th frame with exact slicing") {
    val f = graft.multimodal.Multimodal.framesQuery(spark, Sf)
    assert(f.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    assert(f.filter(col("frame_len") < 1 || col("frame_len") > 32).count() === 0)
    // expected row count from document lengths: |{i : i < ceil(len/32), i%4=0}|
    val exp = Tables.documents(spark, Sf)
      .select(ceil(col("n_chars") / lit(32.0)).cast("int").as("nf"))
      .filter(col("nf") > 0)
      .select(((col("nf") - 1) / lit(4) + 1).cast("long").as("k"))
      .agg(sum(col("k"))).head().getLong(0)
    assert(f.count() === exp)
  }

  test("resize preserves aspect ordering and pins the long side to 128") {
    val r = graft.multimodal.Multimodal.resizeQuery(spark, Sf)
    assert(r.filter(greatest(col("rs_width"), col("rs_height")) =!= 128).count() === 0)
    assert(r.filter((col("width") >= col("height")) =!=
      (col("rs_width") >= col("rs_height"))).count() === 0)
    assert(r.count() === Tables.documents(spark, Sf).count())
  }

  test("stratified sample is exactly the per-row md5 predicate (Scala recount)") {
    def h8Of(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
    def cutOf(lang: String): String = lang match {
      case "en" => "80000000"
      case "de" | "fr" => "4ccccccc"
      case _ => "33333333"
    }
    val s = TrainingMix.stratifiedSample(spark, Sf).collect()
    assert(s.nonEmpty)
    s.foreach { r =>
      val h8 = r.getString(r.fieldIndex("h8"))
      assert(h8 === h8Of(r.getLong(r.fieldIndex("doc_id"))))
      assert(h8 < cutOf(r.getString(r.fieldIndex("lang"))))
    }
    // nothing below its cutoff was missed
    val expKeep = Tables.documents(spark, Sf).select("doc_id", "lang").collect()
      .count(r => h8Of(r.getLong(0)) < cutOf(r.getString(1)))
    assert(s.length === expKeep)
  }
}
