package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.AnnExprs
import graft.functions.VectorFunctions._
import graft.operators.{IvfIndex, PqIndex}

/** The native ANN expressions (NearestCentroidExpr, PqCodesExpr,
  * PqAdcExpr, ResidualAdcExpr) must agree EXACTLY with the HOF
  * formulations that define their semantics (and that the DuckDB
  * oracle mirrors) — on the whole sf0.001 corpus, on degenerate
  * embeddings (NULL, empty, short, long, null elements), and on seeded
  * random vectors.
  */
class AnnParitySpec extends AnyFunSuite {
  import SparkSuite._

  private def q: DataFrame =
    Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

  // ---- full-corpus parity ------------------------------------------------

  test("nearest centroid: native == HOF on the whole corpus, bitwise") {
    val cents = IvfIndex.centroids(spark, Sf)
    val centsLit = IvfIndex.centroidLiteral(cents)
    val both = Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))
      .withColumn("n", IvfIndex.nearest(col("embedding"), cents))
      .withColumn("h", IvfIndex.nearestHof(col("embedding"), centsLit))
      .select(col("vec_id"), col("n.d2"), col("n.cluster_id"),
        col("h.d2"), col("h.cluster_id"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"d2 mismatch: $r")
      assert(r.getLong(2) === r.getLong(4), s"cluster mismatch: $r")
    }
  }

  test("pq adc: native == HOF on the whole corpus") {
    val got = pqPair()
    assert(got.nonEmpty)
    got.foreach { case (id, n, h) => assert(n === h, s"vec $id adc: native $n hof $h") }
  }

  private def pqPair(): Seq[(Long, Long, Long)] = {
    val n = invokeAdc(native = true).withColumnRenamed("approx_e9", "n_e9")
    val h = invokeAdc(native = false).select(col("vec_id"), col("approx_e9").as("h_e9"))
    n.join(h, "vec_id").select("vec_id", "n_e9", "h_e9").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def invokeAdc(native: Boolean): DataFrame =
    if (native) {
      // adcScored is private; search exposes approx_score = approx_e9/1e9
      // rounded — instead drive the expression directly with the same
      // metadata the operator collects
      val cb = cbMeta()
      val lut = lutMeta()
      Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))
        .withColumn("approx_e9", AnnExprs.pqAdc(col("embedding"), cb, lut))
        .select("vec_id", "approx_e9")
    } else PqIndex.adcScoredHof(spark, Sf, q).select("vec_id", "approx_e9")

  private def cbMeta(): Array[Array[Array[Double]]] = {
    val rows = PqIndex.codebooks(spark, Sf)
      .select(col("s"), col("code").cast("long"), col("cvec")).collect()
    val bySub = rows.groupBy(_.getInt(0))
    Array.tabulate(PqIndex.NumSub) { s =>
      bySub(s).sortBy(_.getLong(1)).map(_.getSeq[Float](2).map(_.toDouble).toArray)
    }
  }

  private def lutMeta(): Array[Array[Long]] = {
    val rows = PqIndex.codebooks(spark, Sf).crossJoin(broadcast(q))
      .select(col("s"), col("code").cast("long"),
        cents(dot(expr(s"slice(qvec, s * ${PqIndex.SubDim} + 1, ${PqIndex.SubDim})"),
          col("cvec")), 1e9).as("e9"))
      .collect()
    Array.tabulate(PqIndex.NumSub) { s =>
      val bySub = rows.filter(_.getInt(0) == s).map(r => r.getLong(1) -> r.getLong(2)).toMap
      Array.tabulate(PqIndex.NumCodes)(c => bySub(c.toLong))
    }
  }

  test("pq encode: native == HOF row-for-row") {
    val n = PqIndex.encode(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val h = PqIndex.encodeHof(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(n.nonEmpty && n === h)
  }

  test("residual ivfpq: native == HOF on the whole corpus") {
    val n = PqIndex.residualScoredHof(spark, Sf, q)
      .select(col("vec_id"), col("cluster_id").as("h_cl"), col("res_e9").as("h_e9"))
    val cents = IvfIndex.centroids(spark, Sf)
    val (ids, cvecs) = IvfIndex.centroidMeta(cents)
    val rcb = rcbMeta()
    val lut = rLutMeta()
    val nat = Tables.embeddings(spark, Sf).select(col("vec_id"), col("embedding"))
      .withColumn("ra", AnnExprs.residualAdc(col("embedding"), ids, cvecs, rcb, lut))
      .select(col("vec_id"), col("ra.cluster_id").as("n_cl"), col("ra.res_e9").as("n_e9"))
    val both = nat.join(n, "vec_id").collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(1) === r.getLong(3), s"cluster: $r")
      assert(r.getLong(2) === r.getLong(4), s"res_e9: $r")
    }
  }

  private def rcbMeta(): Array[Array[Array[Double]]] = {
    val rows = PqIndex.residualCodebooks(spark, Sf)
      .select(col("s"), col("code").cast("long"), col("rcvec")).collect()
    val bySub = rows.groupBy(_.getInt(0))
    Array.tabulate(PqIndex.NumSub) { s =>
      bySub(s).sortBy(_.getLong(1)).map(_.getSeq[Double](2).toArray)
    }
  }

  private def rLutMeta(): Array[Array[Long]] = {
    val rows = PqIndex.residualCodebooks(spark, Sf).crossJoin(broadcast(q))
      .select(col("s"), col("code").cast("long"),
        cents(dot(expr(s"slice(qvec, s * ${PqIndex.SubDim} + 1, ${PqIndex.SubDim})"),
          col("rcvec")), 1e9).as("e9"))
      .collect()
    Array.tabulate(PqIndex.NumSub) { s =>
      val bySub = rows.filter(_.getInt(0) == s).map(r => r.getLong(1) -> r.getLong(2)).toMap
      Array.tabulate(PqIndex.NumCodes)(c => bySub(c.toLong))
    }
  }

  // ---- degenerate embeddings --------------------------------------------

  /** NULL, empty, too-short, too-long, null-element, and valid rows —
    * every corner the HOF chain resolves through NULL-poisoned d² and
    * struct ordering.
    */
  private lazy val degenerate: DataFrame = {
    val dim = 64
    def vec(seed: Int, n: Int): Seq[Any] =
      (0 until n).map(i => ((seed * 31 + i * 7) % 13 - 6) / 3.0f)
    val rows = Seq(
      Row(1L, null),
      Row(2L, Seq.empty[Float]),
      Row(3L, vec(3, 5)),
      Row(4L, vec(4, dim + 6)),
      Row(5L, vec(5, dim).updated(2, null)),
      Row(6L, vec(6, dim)),
      Row(7L, vec(7, dim).updated(63, null)),
      Row(8L, vec(8, dim - 1)), // one short: windows 0-2 valid, 3 not
      // NaN elements pass the null-window check but poison every d² to
      // NaN — Spark total ordering (NaN == NaN, after +Inf) must give
      // (NaN, min id) / code 0, not the seed values (ADVICE r7)
      Row(9L, vec(9, dim).updated(10, Float.NaN)),
      Row(10L, (0 until dim).map(_ => Float.NaN)),
    )
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true))))
  }

  test("degenerate embeddings: nearest native == HOF (NULL d2, min id)") {
    val cents = IvfIndex.centroids(spark, Sf)
    val centsLit = IvfIndex.centroidLiteral(cents)
    val got = degenerate
      .withColumn("n", IvfIndex.nearest(col("embedding"), cents))
      .withColumn("h", IvfIndex.nearestHof(col("embedding"), centsLit))
      .select(col("vec_id"), col("n.d2"), col("n.cluster_id"),
        col("h.d2"), col("h.cluster_id"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(3), s"d2 nullness: $r")
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(3)), s"d2: $r")
      assert(r.getLong(2) === r.getLong(4), s"cluster: $r")
    }
    // the malformed rows (1,2,3,4,5,7,8) must resolve to NULL d2 + min id
    val minId = IvfIndex.centroids(spark, Sf).agg(min(col("cluster_id"))).head().getLong(0)
    got.filter(r => !Set(6L, 9L, 10L).contains(r.getLong(0))).foreach { r =>
      assert(r.isNullAt(1) && r.getLong(2) === minId, s"malformed row: $r")
    }
    // NaN rows: d2 is NaN (not NULL) and the tiebreak still lands on
    // the min cluster_id — Spark total ordering, not seed leakage
    got.filter(r => Set(9L, 10L).contains(r.getLong(0))).foreach { r =>
      assert(!r.isNullAt(1) && r.getDouble(1).isNaN && r.getLong(2) === minId,
        s"NaN row: $r")
    }
  }

  test("degenerate embeddings: pq adc native == HOF (code 0 windows)") {
    val cb = cbMeta()
    val lut = lutMeta()
    val cbLit = PqIndex.codebookLiteral(spark, Sf)
    val lutLit = PqIndex.lutLiteral(spark, Sf, q)
    val hofE9 = aggregate(sequence(lit(0), lit(PqIndex.NumSub - 1)), lit(0L), (acc, s) =>
      acc + element_at(element_at(lutLit, s + 1),
        array_min(transform(element_at(cbLit, s + 1), c =>
          struct(dist2(slice(col("embedding"), s * PqIndex.SubDim + 1,
            lit(PqIndex.SubDim)), c.getField("cvec")).as("d2"),
            c.getField("code").as("code"))))
          .getField("code").cast("int") + 1))
    val got = degenerate
      .select(col("vec_id"),
        AnnExprs.pqAdc(col("embedding"), cb, lut).as("n"),
        hofE9.as("h"),
        AnnExprs.pqCodes(col("embedding"), cb).as("codes"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"adc: $r")
      assert(r.getSeq[Long](3).length === PqIndex.NumSub)
    }
    // row 8 (one element short): windows 0..2 real codes, window 3 code 0
    val codes8 = got.find(_.getLong(0) == 8L).get.getSeq[Long](3)
    assert(codes8(3) === 0L)
  }

  test("degenerate embeddings: residual native == HOF chain") {
    val cents = IvfIndex.centroids(spark, Sf)
    val (ids, cvecs) = IvfIndex.centroidMeta(cents)
    val centsLit = IvfIndex.centroidLiteral(cents)
    val rcb = rcbMeta()
    val lut = rLutMeta()
    val rcbLit = PqIndex.residualCodebookLiteral(spark, Sf)
    val lutLit = {
      val rows = PqIndex.residualCodebooks(spark, Sf).crossJoin(broadcast(q))
        .select(col("s"), col("code").cast("long"),
          cents2(dot(expr(s"slice(qvec, s * ${PqIndex.SubDim} + 1, ${PqIndex.SubDim})"),
            col("rcvec"))).as("e9"))
        .collect()
      array((0 until PqIndex.NumSub).map { s =>
        val bySub = rows.filter(_.getInt(0) == s).map(r => r.getLong(1) -> r.getLong(2)).toMap
        array((0 until PqIndex.NumCodes).map(c => lit(bySub(c.toLong))): _*)
      }: _*)
    }
    val best = IvfIndex.nearestHof(col("embedding"), centsLit)
    val resE9 = aggregate(sequence(lit(0), lit(PqIndex.NumSub - 1)), lit(0L), (acc, s) =>
      acc + element_at(element_at(lutLit, s + 1),
        array_min(transform(element_at(rcbLit, s + 1), c =>
          struct(dist2(slice(col("rvec"), s * PqIndex.SubDim + 1,
            lit(PqIndex.SubDim)), c.getField("rcvec")).as("d2"),
            c.getField("code").as("code"))))
          .getField("code").cast("int") + 1))
    val hof = degenerate
      .withColumn("cluster_id", best.getField("cluster_id"))
      .withColumn("cvec",
        element_at(filter(centsLit,
          c => c.getField("cluster_id") === col("cluster_id")), 1).getField("cvec"))
      .withColumn("rvec", zip_with(col("embedding"), col("cvec"),
        (a, b) => a.cast("double") - b.cast("double")))
      .select(col("vec_id"), col("cluster_id").as("h_cl"), resE9.as("h_e9"))
    val nat = degenerate
      .withColumn("ra", AnnExprs.residualAdc(col("embedding"), ids, cvecs, rcb, lut))
      .select(col("vec_id"), col("ra.cluster_id").as("n_cl"), col("ra.res_e9").as("n_e9"))
    val both = nat.join(hof, "vec_id").collect()
    assert(both.length === 10)
    both.foreach { r =>
      assert(r.getLong(1) === r.getLong(3), s"cluster: $r")
      assert(r.getLong(2) === r.getLong(4), s"res_e9: $r")
    }
  }

  private def cents2(c: org.apache.spark.sql.Column) = cents(c, 1e9)

  // ---- vector-sum aggregator (VecAggParity) -----------------------------

  test("meanVectors == posexplode twin on the corpus, bitwise") {
    val assigned = IvfIndex.assignedEmbeddings(spark, Sf)
      .select(col("cluster_id"), col("embedding"))
    val a = IvfIndex.meanVectors(assigned).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = IvfIndex.meanVectorsExploded(assigned).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.nonEmpty && a.keySet === b.keySet)
    a.foreach { case (cl, va) =>
      val vb = b(cl)
      assert(va.length === vb.length, s"cluster $cl dims")
      va.indices.foreach(i =>
        assert(java.lang.Double.doubleToLongBits(va(i)) ===
          java.lang.Double.doubleToLongBits(vb(i)), s"cluster $cl dim $i"))
    }
  }

  test("meanVectors == posexplode twin on ragged and null-bearing groups") {
    val rows = Seq(
      Row(1L, Seq[Any](1.0f, 2.0f, 3.0f)),
      Row(1L, Seq[Any](0.5f, null)),     // ragged + null element
      Row(2L, Seq[Any](2.0f)),
      Row(3L, Seq[Any](null, 4.0f)),     // null at dim 0
      Row(3L, Seq[Any](1.0f)),           // shorter row
      Row(3L, null),                     // whole-row NULL: contributes nothing
    )
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("cluster_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true))))
    val a = IvfIndex.meanVectors(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = IvfIndex.meanVectorsExploded(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a.keySet === b.keySet)
    a.foreach { case (cl, va) => assert(va === b(cl), s"cluster $cl") }
    // spot math: cluster 3 dim 0 averages over BOTH rows bearing the dim
    // (the null element counts toward n, contributes 0 to the sum)
    assert(a(3L) === Seq(0.5, 4.0))
    assert(a(1L) === Seq(0.75, 1.0, 3.0))
  }

  // ---- seeded random parity ---------------------------------------------

  test("seeded random vectors: all three natives == HOF") {
    val rnd = new scala.util.Random(0xA77)
    val dim = 64
    val rows = (1 to 200).map { i =>
      val n = if (i % 17 == 0) rnd.nextInt(80) else dim
      Row(i.toLong, Seq.fill(n)((rnd.nextFloat() - 0.5f) * 4f): Seq[Any])
    } :+ Row(0L, null)
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("vec_id", LongType, nullable = false),
        StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true))))
    val cents0 = IvfIndex.centroids(spark, Sf)
    val centsLit = IvfIndex.centroidLiteral(cents0)
    val cb = cbMeta()
    val lut = lutMeta()
    val cbLit = PqIndex.codebookLiteral(spark, Sf)
    val lutLit = PqIndex.lutLiteral(spark, Sf, q)
    val hofE9 = aggregate(sequence(lit(0), lit(PqIndex.NumSub - 1)), lit(0L), (acc, s) =>
      acc + element_at(element_at(lutLit, s + 1),
        array_min(transform(element_at(cbLit, s + 1), c =>
          struct(dist2(slice(col("embedding"), s * PqIndex.SubDim + 1,
            lit(PqIndex.SubDim)), c.getField("cvec")).as("d2"),
            c.getField("code").as("code"))))
          .getField("code").cast("int") + 1))
    val got = df
      .withColumn("n", IvfIndex.nearest(col("embedding"), cents0))
      .withColumn("h", IvfIndex.nearestHof(col("embedding"), centsLit))
      .select(col("vec_id"),
        col("n.d2"), col("n.cluster_id"), col("h.d2"), col("h.cluster_id"),
        AnnExprs.pqAdc(col("embedding"), cb, lut).as("n_e9"), hofE9.as("h_e9"))
      .collect()
    assert(got.length === 201)
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(3), s"d2 nullness: $r")
      if (!r.isNullAt(1))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(3)), s"d2: $r")
      assert(r.getLong(2) === r.getLong(4), s"cluster: $r")
      assert(r.getLong(5) === r.getLong(6), s"adc: $r")
    }
  }
}
