package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventOps, IvfIndex, TextAnalysis}

/** Round-4 operators: Gopher repetition rules, exact substring dedup,
  * A/B readout, Markov transitions, cluster purity.
  */
class Round4Spec extends AnyFunSuite {
  import SparkSuite._

  test("gopher rules cover every doc and the keep flag matches its inputs") {
    val g = TextAnalysis.gopherRules(spark, Sf).cache()
    assert(g.count() === Tables.documents(spark, Sf).count())
    // fractions are genuine fractions
    assert(g.filter(col("uniq_frac") < 0 || col("uniq_frac") > 1).count() === 0)
    assert(g.filter(col("top2_frac") < 0 || col("top2_frac") > 1).count() === 0)
    assert(g.filter(col("dup3_frac") < 0 || col("dup3_frac") > 1).count() === 0)
    // keep is exactly the composed threshold decision on the emitted columns
    val bad = g.filter(col("keep") =!=
      (col("top2_frac") <= 0.08 && col("uniq_frac") >= 0.42
        && col("mean_wlen") >= 3.0 && col("mean_wlen") <= 10.0).cast("long"))
    assert(bad.count() === 0)
    g.unpersist()
  }

  test("substring dupes: every reported pair shares that many 8-token windows") {
    import graft.functions.TextFunctions.tokens
    val pairs = Dedup.substringDupes(spark, Sf).collect()
    assert(pairs.nonEmpty && pairs.forall(r => r.getLong(0) < r.getLong(1)))
    val winSets = Tables.documents(spark, Sf)
      .select(col("doc_id"),
        graft.functions.TextExprs.shingles(tokens(col("text")), 8).as("w"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    pairs.foreach { r =>
      val shared = winSets(r.getLong(0)).intersect(winSets(r.getLong(1))).size
      assert(shared === r.getLong(2),
        s"pair (${r.getLong(0)},${r.getLong(1)}) claims ${r.getLong(2)} windows, has $shared")
    }
  }

  test("ab test partitions all users and conserves purchase revenue") {
    val ab = EventOps.abTest(spark, Sf).cache()
    val ev = Tables.events(spark, Sf)
    assert(ab.count() === 2)
    assert(ab.agg(sum("n_users")).head().getLong(0) ===
      ev.select(countDistinct(col("user_id"))).head().getLong(0))
    val totalRev = ev.filter(col("event_type") === "purchase")
      .agg(sum(graft.functions.VectorFunctions.cents(col("value"), 100.0)))
      .head().getLong(0)
    assert(ab.agg(sum("rev_cents")).head().getLong(0) === totalRev)
    assert(ab.filter(col("n_converted") > col("n_users")).count() === 0)
    ab.unpersist()
  }

  test("markov transition probabilities normalize per from_type") {
    val m = EventOps.markovTransitions(spark, Sf).cache()
    // each user with k events contributes k-1 transitions
    val ev = Tables.events(spark, Sf)
    val expected = ev.count() - ev.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(m.agg(sum("n")).head().getLong(0) === expected)
    val sums = m.groupBy("from_type").agg(sum("p").as("sp"))
      .filter(abs(col("sp") - 1.0) > 1e-4)
    assert(sums.count() === 0)
    m.unpersist()
  }

  test("entropy is bounded by ln(n_uniq) and zero for constant docs") {
    val e = TextAnalysis.entropyScore(spark, Sf).cache()
    assert(e.count() === Tables.documents(spark, Sf).count())
    assert(e.filter(col("entropy") < 0).count() === 0)
    // H <= ln(distinct types), modulo the 1e-6 integerization
    assert(e.filter(col("entropy") > log(col("n_uniq")) + 1e-3).count() === 0)
    assert(e.filter(col("n_uniq") === 1 && col("entropy") =!= 0.0).count() === 0)
    assert(e.filter(col("norm_entropy") < 0 || col("norm_entropy") > 1.001).count() === 0)
    e.unpersist()
  }

  test("bigram LM: log-probs are non-positive and rows ordered worst-first") {
    val b = TextAnalysis.bigramLm(spark, Sf).collect()
    assert(b.length === 10)
    assert(b.forall(_.getDouble(2) <= 0.0))
    assert(b.map(_.getDouble(2)).toSeq === b.map(_.getDouble(2)).sorted.toSeq)
  }

  test("windowed funnel stages shrink and are bounded by the unbounded funnel") {
    val f = EventOps.windowedFunnel(spark, Sf).head()
    val (nv, nc, np) = (f.getLong(0), f.getLong(1), f.getLong(2))
    assert(nv >= nc && nc >= np)
    val unbounded = EventOps.funnel(spark, Sf)
    assert(nv === unbounded.filter(col("view_us").isNotNull).count())
    assert(nc <= unbounded.filter(col("click_us").isNotNull).count())
  }

  test("salted aggregation is exactly the plain groupBy") {
    val salted = EventOps.skewAgg(spark, Sf)
      .orderBy("event_type").collect().toSeq
    val plain = Tables.events(spark, Sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.VectorFunctions.cents(col("value"), 100.0)).as("sum_cents"))
      .orderBy("event_type").collect().toSeq
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) ===
      plain.map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
  }

  test("rfm segments cover every user and scores stay in 1..5") {
    val r = EventOps.rfmSegments(spark, Sf).cache()
    val nUsers = Tables.events(spark, Sf)
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(r.agg(sum("n_users")).head().getLong(0) === nUsers)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      assert(r.filter(col(c) < 1 || col(c) > 5).count() === 0, c)
    }
    r.unpersist()
  }

  test("ood scores are the k largest assignment distances, descending") {
    val o = IvfIndex.oodScores(spark, Sf).collect()
    assert(o.length === 15)
    val scores = o.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted.reverse)
    // the reported minimum really is >= every unreported distance
    val floor = scores.min
    val below = IvfIndex.assign(spark, Sf)
      .filter(graft.functions.VectorFunctions.r6(col("d2")) > floor).count()
    assert(below <= 15)
  }

  test("misra-gries sketch keeps every guaranteed heavy hitter with bounded error") {
    val k = 64
    val exact = Tables.documents(spark, Sf)
      .select(col("lang"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val totals = exact.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val sketch = TextAnalysis.heavySketch(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(2)) -> r.getLong(3)).toMap
    // every item with freq > N/(k+1) must be present at rank <= 5 if in top-5;
    // check the global top token per lang (far above the threshold)
    totals.foreach { case (lang, n) =>
      val top = exact.filter(_._1._1 == lang).maxBy(m => (m._2, m._1._2))
      assert(top._2 > n / (k + 1), s"test premise: top token heavy in $lang")
      assert(sketch.contains((lang, top._1._2)), s"top token of $lang missing")
    }
    // estimates never exceed truth and are within N/(k+1) below it
    sketch.foreach { case ((lang, tok), est) =>
      val truth = exact((lang, tok))
      assert(est <= truth, s"$lang/$tok overestimated")
      assert(truth - est <= totals(lang) / (k + 1), s"$lang/$tok outside MG bound")
    }
  }

  test("rebalance plan: actions match the integer thresholds and cover all clusters") {
    val plan = IvfIndex.rebalancePlan(spark, Sf).collect()
    val total = plan.map(_.getLong(1)).sum
    val k = plan.length.toLong
    assert(total === Tables.embeddings(spark, Sf).count())
    plan.foreach { r =>
      val (n, action) = (r.getLong(1), r.getString(2))
      val expected =
        if (n * k > total * 2) "split" else if (n * k * 2 < total) "merge" else "keep"
      assert(action === expected, s"cluster ${r.getLong(0)}")
    }
  }

  test("dataset card aggregates match their standalone operator twins") {
    val card = graft.operators.TrainingMix.datasetCard(spark, Sf).head()
    val docs = Tables.documents(spark, Sf)
    assert(card.getLong(0) === docs.count())
    assert(card.getLong(1) === docs.select(countDistinct(col("lang"))).head().getLong(0))
    val keepRate = TextAnalysis.gopherRules(spark, Sf)
      .agg(sum("keep"), count(lit(1))).head()
    assert(card.getDouble(4) ===
      math.floor(keepRate.getLong(0).toDouble / keepRate.getLong(1) * 1e6 + 0.5) / 1e6)
    assert(card.getLong(5) === Dedup.minhashLsh(spark, Sf).count())
  }

  test("changepoint CUSUM matches a driver-side recomputation") {
    import graft.functions.VectorFunctions.cents
    val daily = Tables.events(spark, Sf)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(cents(col("value"), 100.0)).as("rev"))
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = daily.map(_._2).sum
    val nd = daily.length.toLong
    var cum = 0L
    val naive = daily.zipWithIndex.map { case ((day, rev), i) =>
      cum += rev
      (day, math.abs(nd * cum - (i + 1) * total))
    }.sortBy { case (day, s) => (-s, day) }.take(3)
    val got = EventOps.changepoint(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.toSeq === naive.toSeq)
  }

  test("trained quantizer: codes span [0,255] and reconstruction error is step-bounded") {
    val q = graft.operators.KnnSearch.quantizeTrained(spark, Sf).cache()
    assert(q.count() === Tables.embeddings(spark, Sf).count())
    Seq("c0", "c1", "c2", "c3").foreach { c =>
      assert(q.filter(col(c) < 0 || col(c) > 255).count() === 0, c)
    }
    // some dimension attains its own min (code 0) and max (code 255)
    assert(q.filter(col("c0") === 0).count() > 0 || q.filter(col("c1") === 0).count() > 0)
    assert(q.filter(col("c0") === 255).count() > 0 || q.filter(col("c1") === 255).count() > 0)
    // per-dim error <= (range/510)^2 at the decision boundary; bound with
    // the widest dimension range across the corpus
    val stats = Tables.embeddings(spark, Sf)
      .select(posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy("i").agg((max(col("v")) - min(col("v"))).as("range"))
      .agg(max(col("range"))).head().getFloat(0).toDouble
    val bound = 64L * math.ceil(math.pow(stats / 510.0, 2) * 1e9 + 1).toLong
    assert(q.filter(col("recon_e9") > bound).count() === 0)
    q.unpersist()
  }

  test("q5 local-supplier join: only ASIA nations, all dims broadcast") {
    val df = graft.operators.Relational.q5(spark, Sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5) // 5 nations per region
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p) // the single fact-fact join stays hash/broadcast at this SF
  }

  test("dau/mau: dau never exceeds mau and the first day has dau == mau") {
    val d = EventOps.dauMau(spark, Sf).orderBy("day").collect()
    assert(d.nonEmpty)
    assert(d.forall(r => r.getLong(1) <= r.getLong(2)))
    assert(d.forall(r => r.getDouble(3) > 0 && r.getDouble(3) <= 1.0))
    // nothing precedes the first active day, so its trailing window is itself
    assert(d.head.getLong(1) === d.head.getLong(2))
  }

  test("basket lift: supports recompute exactly and ranking is by lift") {
    val rows = graft.operators.Relational.basketLift(spark, Sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= 3))
    val lifts = rows.map(_.getDouble(5)).toSeq
    assert(lifts === lifts.sorted.reverse)
    // recompute the top pair's counts directly
    val top = rows.head
    val op = Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_partkey").distinct().cache()
    val na = op.filter(col("l_partkey") === top.getLong(0)).count()
    val nb = op.filter(col("l_partkey") === top.getLong(1)).count()
    val nab = op.filter(col("l_partkey") === top.getLong(0))
      .select("l_orderkey")
      .join(op.filter(col("l_partkey") === top.getLong(1)).select("l_orderkey"), "l_orderkey")
      .count()
    assert((top.getLong(3), top.getLong(4), top.getLong(2)) === ((na, nb, nab)))
    op.unpersist()
  }

  test("phash dedup matches a naive recomputation; hamming<=3 pairs are exhaustive") {
    val got = graft.multimodal.Multimodal.phashDedup(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.nonEmpty)
    // driver-side signature recomputation (same algebra as the 64-bit
    // TextExprs.simhash, r8)
    def sigOf(text: String): Long = {
      val votes = new Array[Int](64)
      val md = java.security.MessageDigest.getInstance("MD5")
      text.grouped(4).foreach { blk =>
        val d = md.digest(blk.getBytes("UTF-8"))
        var h = 0L
        var by = 0
        while (by < 8) { h = (h << 8) | (d(by) & 0xffL); by += 1 }
        var b = 0
        while (b < 64) { votes(b) += (((h >>> (63 - b)) & 1L) * 2 - 1).toInt; b += 1 }
      }
      (0 until 64).foldLeft(0L)((s, b) => if (votes(b) > 0) s | (1L << b) else s)
    }
    val sigs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> sigOf(r.getString(1)))
    val naive = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 6
    } yield (a, b) -> h.toLong).toMap
    // every reported pair has the exactly-recomputed hamming
    got.foreach { case (p, h) => assert(naive.get(p).contains(h), s"pair $p hamming") }
    // pigeonhole: 4 byte blocks catch every pair at hamming <= 3
    naive.filter(_._2 <= 3).keys.foreach(p =>
      assert(got.contains(p), s"guaranteed pair $p missing"))
  }

  test("residual ivfpq: sane recall vs brute force and tighter codes than raw PQ") {
    import graft.functions.VectorFunctions.dot
    // probe ~30% of the ⌈√N⌉-scheduled clusters (pre-r9: 3 of 10) with a
    // 100-deep candidate cut: measured recall at sf0.001 is limited by
    // the 16-codeword ADC ordering, not the probe (full probe at
    // cand=50 also reads 3/10; cand=100 recovers half the true top-10)
    val nprobe = math.ceil(
      graft.operators.IvfIndex.centroids(spark, Sf).count() * 0.3).toInt
    val got = graft.operators.PqIndex.searchIvfPqResidual(spark, Sf,
        nprobe = nprobe, candidates = 100)
      .collect()
    assert(got.length === 10)
    val exact = got.map(_.getDouble(3)).toSeq
    assert(exact === exact.sorted.reverse)
    val q = Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    val brute = Tables.embeddings(spark, Sf).crossJoin(broadcast(q))
      .select(col("vec_id"), dot(col("embedding"), col("qvec")).as("s"))
      .orderBy(col("s").desc, col("vec_id").asc).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = got.map(_.getLong(1)).count(brute.contains)
    assert(recall >= 5, s"recall@10 = $recall/10 vs brute force")
  }

  test("sma forecast: full-history days only, forecast is the trailing mean") {
    val rows = EventOps.forecastSma(spark, Sf).orderBy("day").collect()
    assert(rows.nonEmpty)
    // recompute from the daily series
    import graft.functions.VectorFunctions.cents
    val daily = Tables.events(spark, Sf)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(cents(col("value"), 100.0)).as("rev"))
      .orderBy("day").collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = daily.toMap
    rows.foreach { r =>
      val day = r.getLong(0)
      val i = daily.indexWhere(_._1 == day)
      assert(i >= 7, s"day $day lacks 7-day history")
      val sumPrev = daily.slice(i - 7, i).map(_._2).sum
      assert(r.getLong(2) === sumPrev * 1000000L / 7, s"forecast day $day")
      assert(r.getLong(1) === byDay(day))
    }
  }

  test("outer coverage reproduces both aggregates with zero-filled gaps") {
    val got = graft.operators.Relational.outerCoverage(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val cust = Tables.customer(spark, Sf)
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 8000)
      .join(Tables.nation(spark, Sf), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val supp = Tables.supplier(spark, Sf)
      .filter(col("s_acctbal") > 8000)
      .join(Tables.nation(spark, Sf), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet === (cust.keySet ++ supp.keySet))
    got.foreach { case (n, (nc, ns)) =>
      assert(nc === cust.getOrElse(n, 0L) && ns === supp.getOrElse(n, 0L), n)
    }
  }

  test("unpivot emits one row per (source, metric) with the stats values") {
    val stats = graft.operators.Chunker.stats(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    val long = graft.operators.Relational.unpivotStats(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(long.size === stats.size * 3)
    stats.foreach { case (s, (nd, sc, st)) =>
      assert(long((s, "n_docs")) === nd && long((s, "sum_chars")) === sc
        && long((s, "sum_toks")) === st, s)
    }
  }

  test("streaks: active days conserve and the longest streak is bounded") {
    val s = EventOps.activityStreaks(spark, Sf).cache()
    val userDays = Tables.events(spark, Sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().count()
    assert(s.agg(sum("active_days")).head().getLong(0) === userDays)
    assert(s.filter(col("longest_streak") > col("active_days")).count() === 0)
    assert(s.filter(col("n_streaks") < 1).count() === 0)
    s.unpersist()
  }

  test("cluster purity: modal share and totals are consistent") {
    val p = IvfIndex.clusterPurity(spark, Sf).cache()
    assert(p.agg(sum("n_vecs")).head().getLong(0) ===
      Tables.embeddings(spark, Sf).count())
    assert(p.filter(col("n_top") > col("n_vecs")).count() === 0)
    assert(p.filter(col("purity") <= 0 || col("purity") > 1).count() === 0)
    p.unpersist()
  }
}
