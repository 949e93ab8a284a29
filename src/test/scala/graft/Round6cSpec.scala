package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EventOps, TextAnalysis}

/** Round-6 batch 6: Gini/Lorenz revenue concentration and Heaps'-law
  * vocabulary growth. Both checked against independent brute-force
  * recomputations (the distributed rank vs a plain global sort; the
  * bucketed curve vs a collected token replay).
  */
class Round6cSpec extends AnyFunSuite {
  import SparkSuite._

  private def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("gini matches the global-sort brute force exactly") {
    val out = EventOps.gini(spark, Sf).collect()
    assert(out.length === 1)
    val row = out.head
    val p = Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val totals = p.groupBy(_._1).map { case (u, rows) =>
      u -> rows.map(r => math.floor(r._2 * 100.0 + 0.5).toLong).sum
    }.toSeq.sortBy { case (u, t) => (t, u) }
    val n = totals.length.toLong
    val s = totals.map(_._2).sum
    val st9 = totals.zipWithIndex.map { case ((_, t), i) =>
      math.floor(((i + 1).toDouble / n) * (t.toDouble / s) * 1e9 + 0.5).toLong
    }.sum
    val gini = r6(2.0 * (st9 / 1e9) - (n + 1).toDouble / n)
    val t10 = totals.drop((n - n / 10).toInt).map(_._2).sum
    val t1 = totals.drop((n - n / 100).toInt).map(_._2).sum
    assert(row.getLong(row.fieldIndex("n_users")) === n)
    assert(row.getDouble(row.fieldIndex("total_value")) === r6(s / 100.0))
    assert(row.getDouble(row.fieldIndex("gini")) === gini)
    assert(row.getDouble(row.fieldIndex("top10_share")) === r6(t10 / (1.0 * s)))
    assert(row.getDouble(row.fieldIndex("top1_share")) === r6(t1 / (1.0 * s)))
    // sanity: a share is a share, gini lives in [0, 1)
    assert(gini >= 0.0 && gini < 1.0)
    assert(t10.toDouble / s >= 0.1 - 1e-9) // top decile holds >= uniform share
  }

  test("gini of a perfectly equal population is zero") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gini-eq").toString
    (1L to 40L).map(u => (u, "2024-06-01 10:00:00", u, "purchase", 5.0, "{}"))
      .toDF("event_id", "ts0", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts0").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = EventOps.gini(spark, dir).collect().head
    assert(row.getDouble(row.fieldIndex("gini")) === 0.0)
    assert(row.getDouble(row.fieldIndex("top10_share")) === 0.1)
  }

  test("gini of total concentration approaches (n-1)/n") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gini-conc").toString
    // 19 users with ~nothing, 1 user with everything
    ((1L to 19L).map(u => (u, "2024-06-01 10:00:00", u, "purchase", 0.01, "{}")) :+
      ((20L, "2024-06-01 10:00:00", 20L, "purchase", 10000.0, "{}")))
      .toDF("event_id", "ts0", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts0").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = EventOps.gini(spark, dir).collect().head
    // exact: gini -> (n-1)/n = 0.95 as the small holdings -> 0
    assert(row.getDouble(row.fieldIndex("gini")) > 0.94)
    assert(row.getDouble(row.fieldIndex("top10_share")) > 0.999)
  }

  test("lorenz deciles match the global-sort brute force and tile the population") {
    val out = EventOps.lorenz(spark, Sf).collect().sortBy(_.getLong(0))
    val p = Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val totals = p.groupBy(_._1).map { case (u, rows) =>
      u -> rows.map(r => math.floor(r._2 * 100.0 + 0.5).toLong).sum
    }.toSeq.sortBy { case (u, t) => (t, u) }
    val n = totals.length.toLong
    val s = totals.map(_._2).sum
    val byDecile = totals.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n }
    var cum = 0L
    (0L to 9L).foreach { d =>
      val rows = byDecile.getOrElse(d, Seq.empty)
      val row = out.find(_.getLong(0) === d)
      assert(row.isDefined === rows.nonEmpty, s"decile $d presence")
      row.foreach { r =>
        val tv = rows.map(_._1._2).sum
        cum += tv
        assert(r.getLong(r.fieldIndex("n_users")) === rows.length.toLong)
        assert(r.getDouble(r.fieldIndex("value")) === r6(tv / 100.0))
        assert(r.getDouble(r.fieldIndex("share")) === r6(tv / (1.0 * s)))
        assert(r.getDouble(r.fieldIndex("cum_share")) === r6(cum / (1.0 * s)))
      }
    }
    // the deciles tile the whole population and the curve ends at 1
    assert(out.map(_.getLong(1)).sum === n)
    assert(out.last.getDouble(out.last.fieldIndex("cum_share")) === 1.0)
    // Lorenz convexity holds per capita (decile SUMS can dip when n is
    // not divisible by 10 and a 5-user decile precedes a 4-user one):
    // mean value per user is nondecreasing across deciles
    val means = out.map(r =>
      r.getDouble(r.fieldIndex("value")) / r.getLong(r.fieldIndex("n_users")))
    means.sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-9, s"per-user means must be nondecreasing: $a > $b")
      case _ => ()
    }
  }

  test("user overlap matches the brute-force pair count and Jaccard identities") {
    val out = EventOps.userOverlap(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byType = ev.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._1).toSet }
    val types = byType.keys.toSeq.sorted
    val expected = for {
      i <- types.indices; j <- (i + 1) until types.length
      a = types(i); b = types(j)
      both = (byType(a) intersect byType(b)).size
      if both > 0
    } yield (a, b) -> (byType(a).size.toLong, byType(b).size.toLong, both.toLong)
    assert(out.keySet === expected.map(_._1).toSet)
    expected.foreach { case (k, (ua, ub, uboth)) =>
      val (ga, gb, gboth, jac) = out(k)
      assert((ga, gb, gboth) === ((ua, ub, uboth)), s"pair $k")
      assert(jac === r6(uboth / (1.0 * (ua + ub - uboth))), s"jaccard $k")
    }
  }

  test("novelty matches the collected-shingle replay; first doc is fully novel") {
    val out = TextAnalysis.novelty(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sh = docs.map { case (d, t) =>
      val tk = t.trim.split("\\s+")
      d -> (if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).toSeq.distinct
            else Seq.empty[String])
    }
    val firstDoc = sh.flatMap { case (d, gs) => gs.map(g => (g, d)) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    sh.filter(_._2.nonEmpty).foreach { case (d, gs) =>
      val (ng, nn, nv) = out(d)
      assert(ng === gs.length.toLong, s"doc $d gram count")
      val novel = gs.count(g => firstDoc(g) == d).toLong
      assert(nn === novel, s"doc $d novel count")
      assert(nv === r6(novel / (1.0 * gs.length)), s"doc $d novelty")
    }
    // docs under 3 tokens have no shingles and no row
    assert(out.keySet === sh.filter(_._2.nonEmpty).map(_._1).toSet)
    // the minimum doc_id with shingles is 100% novel by construction
    val d0 = sh.filter(_._2.nonEmpty).map(_._1).min
    assert(out(d0)._3 === 1.0)
  }

  test("MAD outliers match the brute force and survive a whale the z-score can't") {
    val out = EventOps.madOutliers(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    val ev = Tables.events(spark, Sf).select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val xs = rows.map(_._2).toSeq
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      val rzs = xs.map(x => math.abs(0.6745 * (x - med) / mad))
      val (gm, gd, gn, gz) = out(t)
      assert(gm === r6(med), s"$t median")
      assert(gd === r6(mad), s"$t mad")
      assert(gn === (if (mad > 0) rzs.count(_ > 3.5).toLong else 0L), s"$t outliers")
      assert(gz === r6(rzs.max), s"$t max rz")
    }
    // robustness: inject one whale into a copied table — the median and
    // MAD barely move while the mean/stddev screen visibly shifts
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    val base = ev.zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, "2024-06-01 10:00:00", i.toLong % 50, t, v, "{}")
    }
    val whale = (999999L, "2024-06-01 10:00:00", 1L, base.head._4, 1e9, "{}")
    (base :+ whale).toSeq
      .toDF("event_id", "ts0", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts0").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val spiked = EventOps.madOutliers(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val t0 = whale._4
    val (m0, d0, n0, _) = out(t0)
    val (m1, d1, n1) = spiked(t0)
    // median/MAD shift at most one order-statistic step; the whale
    // itself is simply one more outlier
    assert(math.abs(m1 - m0) < d0, s"median moved robustly: $m0 -> $m1")
    assert(math.abs(d1 - d0) < d0, s"MAD moved robustly: $d0 -> $d1")
    assert(n1 >= n0, "the whale cannot reduce the outlier count")
  }

  test("lsh recall: hits are real brute-force hits and more probes never hurt") {
    import graft.operators.LshAnn
    val r2 = LshAnn.recallReport(spark, Sf, k = 5, probes = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(r2.nonEmpty)
    r2.foreach { case (q, (hits, rec)) =>
      assert(hits >= 0L && hits <= 5L, s"query $q hits out of range")
      assert(rec === r6(hits / 5.0), s"query $q recall mismatch")
    }
    // monotonicity: probing every bucket (>= 2^NumPlanes probes would
    // be exhaustive; NumPlanes+1 covers all hamming-1 flips) can only
    // add candidates, so per-query hits never decrease
    val rAll = LshAnn.recallReport(spark, Sf, k = 5, probes = LshAnn.NumPlanes + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    r2.foreach { case (q, (hits, _)) =>
      assert(rAll(q) >= hits, s"query $q lost hits with more probes")
    }
    // recall-floor sanity at the corpus level: per-query hits>=1 is NOT
    // guaranteed (scores are unnormalized dot products, so dot(q,x) can
    // exceed dot(q,q) and the self vector need not make the brute-force
    // top-5; a data refresh could then legitimately zero one query), but
    // a 2-probe LSH sweep that finds nothing ANYWHERE is broken — assert
    // a mean-recall floor instead of the data-dependent per-query claim
    val meanRecall = r2.values.map(_._2).sum / r2.size
    assert(meanRecall >= 0.2, s"mean 2-probe recall collapsed: $meanRecall")
  }

  test("holt backtest matches the scalar recursion replay") {
    val out = EventOps.forecastHolt(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val daily = Tables.events(spark, Sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (d, xs) =>
        d -> xs.map(x => math.floor(x._2 * 100.0 + 0.5).toLong).sum
      }.toSeq.sortBy(_._1)
    assert(daily.length >= 3 && out.size === daily.length - 1)
    var l = daily.head._2 / 100.0
    var b = 0.0
    daily.tail.foreach { case (d, cents) =>
      val y = cents / 100.0
      val f = l + b
      val (ga, gf, ge) = out(d)
      assert(ga === r6(y), s"day $d actual")
      assert(gf === r6(f), s"day $d forecast")
      assert(ge === r6(math.abs(y - f)), s"day $d err")
      val newL = 0.5 * y + 0.5 * f
      b = 0.25 * (newL - l) + 0.75 * b
      l = newL
    }
  }

  test("holt locks onto a perfect linear trend; a flat-mean forecast cannot") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-holt-trend").toString
    // value 10, 20, 30, ... per day: after warmup the one-step error -> 0
    (0L until 30L).map { d =>
      (d, java.time.Instant.ofEpochSecond(86400L * (19000 + d)).toString.replace("T", " ").replace("Z", ""),
        d % 5, "purchase", 10.0 * (d + 1), "{}")
    }.toDF("event_id", "ts0", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("ts0").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = EventOps.forecastHolt(spark, dir).collect()
      .sortBy(_.getLong(0))
    val lastErr = rows.last.getDouble(rows.last.fieldIndex("abs_err"))
    val firstErr = rows.head.getDouble(rows.head.fieldIndex("abs_err"))
    assert(lastErr < 1.0, s"holt must converge on a linear trend, err=$lastErr")
    assert(firstErr > lastErr, "error must shrink as the trend is learned")
    // a flat forecast (previous value) is off by the slope (10) forever
    assert(lastErr < 5.0)
  }

  test("degree distribution matches the edge-set brute force and the handshake identity") {
    import graft.operators.GraphOps
    val out = GraphOps.degreeDist(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = GraphOps.frequentPairs(spark, Sf, 2).select("pa", "pb")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty && out.nonEmpty)
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (_, xs) => xs.size.toLong }
    val expected = deg.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    assert(out === expected)
    // handshake: sum of degrees = 2 * |edges|; node count conserved
    assert(out.map { case (d, n) => d * n }.sum === 2L * edges.length)
    assert(out.values.sum === deg.size.toLong)
  }

  test("new-vs-returning matches brute force and conserves users and user-days") {
    val out = EventOps.newVsReturning(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ud = Tables.events(spark, Sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val firstDay = ud.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    ud.groupBy(_._2).foreach { case (d, xs) =>
      val nNew = xs.count { case (u, _) => firstDay(u) == d }.toLong
      val (gn, gr) = out(d)
      assert(gn === nNew, s"day $d new")
      assert(gr === xs.length - nNew, s"day $d returning")
    }
    // every user is new exactly once; every user-day is counted once
    assert(out.values.map(_._1).sum === firstDay.size.toLong)
    assert(out.values.map(v => v._1 + v._2).sum === ud.length.toLong)
  }

  test("ship delay matches the brute force per priority") {
    import graft.operators.Relational
    val out = Relational.shipDelay(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val li = Tables.lineitem(spark, Sf).select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, Sf)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("d"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def q(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted.map(_.toDouble)
      val h = (s.length - 1) * p
      val lo = math.floor(h).toInt
      if (lo + 1 > s.length - 1) s(lo)
      else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    li.groupBy(_._1).foreach { case (p, rows) =>
      val ds = rows.map(_._2).toSeq
      val (n, mn, mx, p50, p90) = out(p)
      assert(n === ds.length.toLong && mn === ds.min && mx === ds.max, s"$p basic stats")
      assert(p50 === r6(q(ds, 0.5)), s"$p p50")
      assert(p90 === r6(q(ds, 0.9)), s"$p p90")
      // note: the synthetic generator draws shipdate independent of
      // orderdate, so negative delays exist — the metric reports them
      // honestly (in production that IS the data-quality finding)
    }
  }

  test("seasonality grid conserves events and value; calendar keys are in range") {
    val out = EventOps.seasonalDow(spark, Sf).collect()
    val n = Tables.events(spark, Sf).count()
    assert(out.map(_.getLong(2)).sum === n)
    assert(math.abs(out.map(_.getDouble(4)).sum - 1.0) < 1e-3)
    out.foreach { r =>
      val (dow, hour) = (r.getLong(0), r.getLong(1))
      assert(dow >= 0 && dow <= 6 && hour >= 0 && hour <= 23, s"cell ($dow,$hour)")
    }
    // spot-check the dow convention on a known date: 2024-06-03 is a Monday
    val mondayEpochDay = java.time.LocalDate.parse("2024-06-03").toEpochDay
    assert((mondayEpochDay + 3) % 7 === 0L, "epoch-math dow: Monday must map to 0")
  }

  test("funnel time matches the sequential-first brute force") {
    val out = EventOps.funnelTime(spark, Sf).collect()
    assert(out.length === 1)
    val r = out.head
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val fv = byUser.flatMap { case (u, xs) =>
      val vs = xs.filter(_._2 == "view").map(_._3)
      if (vs.isEmpty) None else Some(u -> vs.min)
    }
    val fc = fv.flatMap { case (u, v) =>
      val cs = byUser(u).filter(x => x._2 == "click" && x._3 > v).map(_._3)
      if (cs.isEmpty) None else Some(u -> (v, cs.min))
    }
    val fp = fc.flatMap { case (u, (v, c)) =>
      val ps = byUser(u).filter(x => x._2 == "purchase" && x._3 > c).map(_._3)
      if (ps.isEmpty) None else Some(u -> (v, c, ps.min))
    }
    assert(r.getLong(r.fieldIndex("n_view_users")) === fv.size.toLong)
    assert(r.getLong(r.fieldIndex("n_clicked")) === fc.size.toLong)
    assert(r.getLong(r.fieldIndex("n_converted")) === fp.size.toLong)
    def q(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted.map(_.toDouble)
      val h = (s.length - 1) * p
      val lo = math.floor(h).toInt
      if (lo + 1 > s.length - 1) s(lo) else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    val v2c = fp.values.map(x => (x._2 - x._1) / 1000000L).toSeq
    val c2p = fp.values.map(x => (x._3 - x._2) / 1000000L).toSeq
    assert(r.getDouble(r.fieldIndex("p50_view_click_s")) === r6(q(v2c, 0.5)))
    assert(r.getDouble(r.fieldIndex("p90_view_click_s")) === r6(q(v2c, 0.9)))
    assert(r.getDouble(r.fieldIndex("p50_click_purchase_s")) === r6(q(c2p, 0.5)))
    assert(r.getDouble(r.fieldIndex("p90_click_purchase_s")) === r6(q(c2p, 0.9)))
    // funnel monotonicity
    assert(fv.size >= fc.size && fc.size >= fp.size && fp.nonEmpty)
  }

  test("length profile matches the brute force per source") {
    val out = TextAnalysis.lengthProfile(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val docs = Tables.documents(spark, Sf)
      .select(col("source"), col("n_chars"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def q(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted.map(_.toDouble)
      val h = (s.length - 1) * p
      val lo = math.floor(h).toInt
      if (lo + 1 > s.length - 1) s(lo) else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val (n, mt, p10, p50, p90) = out(src)
      assert(n === xs.length.toLong)
      val toks = xs.map(_._3.trim.split("\\s+").length.toLong)
      assert(mt === r6(toks.sum / (1.0 * xs.length)), s"$src mean tokens")
      val cs = xs.map(_._2).toSeq
      assert(p10 === r6(q(cs, 0.1)) && p50 === r6(q(cs, 0.5)) && p90 === r6(q(cs, 0.9)),
        s"$src percentiles")
    }
  }

  test("dim variance matches the brute force and is nonnegative everywhere") {
    import graft.operators.KnnSearch
    val out = KnnSearch.dimVariance(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val embs = Tables.embeddings(spark, Sf).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble))
    val d = embs.head.length
    assert(out.size === d)
    (1 to d).foreach { pos =>
      val vs = embs.map(_(pos - 1))
      val s6 = vs.map(v => math.floor(v * 1e6 + 0.5).toLong).sum
      val q9 = vs.map(v => math.floor(v * v * 1e9 + 0.5).toLong).sum
      val mean = s6 / 1e6 / vs.length
      val (gm, gv) = out(pos.toLong)
      assert(gm === r6(mean), s"pos $pos mean")
      assert(gv === r6(q9 / 1e9 / vs.length - mean * mean), s"pos $pos var")
      assert(gv >= -1e-9, s"pos $pos variance must be nonnegative")
    }
  }

  test("repeat-purchase cadence matches the per-user gap brute force") {
    val out = EventOps.repeatPurchase(spark, Sf).collect().head
    val p = Tables.events(spark, Sf).filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = p.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val sorted = xs.sortBy(x => (x._3, x._2))
      sorted.sliding(2).collect {
        case Array(a, b) => u -> (b._3 - a._3) / 1000000L
      }
    }
    def q(xs: Seq[Long], pp: Double): Double = {
      val s = xs.sorted.map(_.toDouble)
      val h = (s.length - 1) * pp
      val lo = math.floor(h).toInt
      if (lo + 1 > s.length - 1) s(lo) else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
    }
    assert(out.getLong(0) === gaps.length.toLong)
    assert(out.getLong(1) === gaps.map(_._1).distinct.length.toLong)
    assert(out.getDouble(2) === r6(q(gaps.map(_._2), 0.5)))
    assert(out.getDouble(3) === r6(q(gaps.map(_._2), 0.9)))
    assert(gaps.forall(_._2 >= 0L))
  }

  test("vocab overlap matches the per-source type-set brute force") {
    val out = TextAnalysis.vocabOverlap(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val docs = Tables.documents(spark, Sf).select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).map { case (s, xs) =>
      s -> xs.flatMap(_._2.trim.split("\\s+")).toSet
    }
    val srcs = vocab.keys.toSeq.sorted
    for (i <- srcs.indices; j <- (i + 1) until srcs.length) {
      val (a, b) = (srcs(i), srcs(j))
      val shared = (vocab(a) intersect vocab(b)).size.toLong
      if (shared > 0) {
        val (ta, tb, sh, jac) = out((a, b))
        assert(ta === vocab(a).size.toLong && tb === vocab(b).size.toLong)
        assert(sh === shared, s"pair ($a,$b)")
        assert(jac === r6(shared / (1.0 * (ta + tb - shared))))
      } else assert(!out.contains((a, b)))
    }
  }

  test("cohort LTV matches brute force and conserves purchases and revenue") {
    val out = EventOps.cohortLtv(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val first = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min / 604800000000L }
    val sizes = first.values.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val purchases = ev.filter(_._2 == "purchase")
    val grid = purchases.groupBy(p => (first(p._1), p._3 / 604800000000L - first(p._1)))
    grid.foreach { case ((cw, wa), xs) =>
      val (cu, np, rev, rpu) = out((cw, wa))
      assert(cu === sizes(cw))
      assert(np === xs.length.toLong)
      val vc = xs.map(x => math.floor(x._4 * 100.0 + 0.5).toLong).sum
      assert(rev === r6(vc / 100.0), s"cell ($cw,$wa)")
      assert(rpu === r6(vc / 100.0 / sizes(cw)), s"cell ($cw,$wa) per-user")
    }
    assert(out.keySet === grid.keySet)
    // conservation: cells hold every purchase exactly once
    assert(out.values.map(_._2).sum === purchases.length.toLong)
    // week_age is never negative (first event is the cohort anchor)
    assert(out.keys.forall(_._2 >= 0L))
  }

  test("JS divergence matches brute force and lives in [0, ln 2]") {
    val out = TextAnalysis.jsDivergence(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val docs = Tables.documents(spark, Sf).select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val dist = docs.groupBy(_._1).map { case (s, xs) =>
      val toks = xs.flatMap(_._2.trim.split("\\s+"))
      val n = toks.length.toDouble
      s -> toks.groupBy(identity).map { case (t, ys) => t -> ys.length / n }
    }
    def c9(x: Double) = math.floor(x * 1e9 + 0.5).toLong
    val srcs = dist.keys.toSeq.sorted
    for (i <- srcs.indices; j <- (i + 1) until srcs.length) {
      val (sa, sb) = (srcs(i), srcs(j))
      val (pa, pb) = (dist(sa), dist(sb))
      val shared = pa.keySet intersect pb.keySet
      val s9 = shared.toSeq.map { t =>
        val (p, q) = (pa(t), pb(t)); val m = (p + q) / 2.0
        c9(0.5 * (p * math.log(p / m) + q * math.log(q / m)))
      }.sum
      val pm9 = shared.toSeq.map(t => c9(pa(t))).sum
      val qm9 = shared.toSeq.map(t => c9(pb(t))).sum
      val js = r6(s9 / 1e9 + 0.5 * math.log(2.0) *
        ((1.0 - pm9 / 1e9) + (1.0 - qm9 / 1e9)))
      val (gs, gj) = out((sa, sb))
      assert(gs === shared.size.toLong, s"($sa,$sb) shared types")
      assert(gj === js, s"($sa,$sb) js")
      assert(gj >= -1e-9 && gj <= math.log(2.0) + 1e-9, s"($sa,$sb) out of range")
    }
  }

  test("energy profile matches the byte-window brute force") {
    val out = graft.multimodal.Multimodal.energyQuery(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    docs.filter(_._2.nonEmpty).foreach { case (d, t) =>
      val wins = t.grouped(32).toSeq
      val (nw, peak, mean) = out(d)
      assert(nw === wins.length.toLong, s"doc $d windows")
      val sums = wins.map(w => w.map(_.toInt).map(_.toLong).sum)
      val peakE = wins.zip(sums).map { case (w, s) => s / (1.0 * w.length) }.max
      assert(peak === r6(peakE), s"doc $d peak")
      assert(mean === r6(sums.sum / (1.0 * t.length)), s"doc $d mean")
      // byte "energy" of printable ASCII lives in [32, 127]
      assert(mean >= 32.0 && mean <= 127.0)
    }
    assert(out.keySet === docs.filter(_._2.nonEmpty).map(_._1).toSet)
  }

  test("hapax profile matches brute force; identities hold") {
    val out = TextAnalysis.hapaxProfile(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    val docs = Tables.documents(spark, Sf).select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    docs.groupBy(_._1).foreach { case (s, xs) =>
      val toks = xs.flatMap(_._2.trim.split("\\s+"))
      val byTok = toks.groupBy(identity).map { case (_, ys) => ys.length }
      val (nt, ny, nh, ttr, hs) = out(s)
      assert(nt === toks.length.toLong && ny === byTok.size.toLong)
      assert(nh === byTok.count(_ == 1).toLong)
      assert(ttr === r6(ny / (1.0 * nt)) && hs === r6(nh / (1.0 * ny)))
      // hapax <= types <= tokens, always
      assert(nh <= ny && ny <= nt)
    }
  }

  test("heaps curve matches the collected-token replay and the fit is sane") {
    val out = TextAnalysis.heaps(spark, Sf).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mxd = docs.map(_._1).max
    def bkt(d: Long) = (d * 20) / (mxd + 1)
    val toks = docs.flatMap { case (d, t) =>
      t.trim.split("\\s+").map(w => (bkt(d), w))
    }
    val ntPer = toks.groupBy(_._1).map { case (b, xs) => b -> xs.length.toLong }
    val nvPer = toks.groupBy(_._2).map { case (_, xs) => xs.map(_._1).min }
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val bks = ntPer.keys.toSeq.sorted
    var (ct, cv) = (0L, 0L)
    val expCurve = bks.map { b =>
      ct += ntPer(b); cv += nvPer.getOrElse(b, 0L)
      b -> (ct, cv)
    }.toMap
    out.foreach { r =>
      val b = r.getLong(r.fieldIndex("bkt"))
      val (et, ev) = expCurve(b)
      assert(r.getLong(r.fieldIndex("cum_tokens")) === et, s"bucket $b tokens")
      assert(r.getLong(r.fieldIndex("cum_types")) === ev, s"bucket $b types")
    }
    assert(out.map(_.getLong(0)).toSet === expCurve.keySet)
    // the fit columns are constant across rows and match the
    // brute-force least squares over the integerized checkpoints
    val betas = out.map(r => r.getDouble(r.fieldIndex("heaps_beta"))).distinct
    assert(betas.length === 1)
    def c6(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    val pts = bks.map { b =>
      val (t, v) = expCurve(b); (c6(math.log(t.toDouble)), c6(math.log(v.toDouble)))
    }
    val fn = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map { case (x, y) => c6((x / 1e6) * (y / 1e6)) }.sum
    val sxx = pts.map { case (x, _) => c6((x / 1e6) * (x / 1e6)) }.sum
    val slope = (fn * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6)) /
      (fn * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6))
    assert(betas.head === r6(slope))
    // on the synthetic closed-vocab corpus the exponent is ~0 (types
    // saturate in the first bucket); it can never exceed linear growth
    assert(betas.head >= 0.0 && betas.head < 1.0)
    // curve is monotone nondecreasing in both coordinates
    val sortedRows = out.sortBy(_.getLong(0))
    sortedRows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) <= b.getLong(1) && a.getLong(2) <= b.getLong(2))
      case _ => ()
    }
  }
}
