package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.KnnSearch

/** Semantics of the reduced-precision search modes (binary
  * quantization and Matryoshka truncation): signature packing is
  * bit-correct, and each mode's candidate stage actually recovers the
  * exact top answers at test scale (a recall floor, not a formal
  * guarantee).
  */
class SearchModesSpec extends AnyFunSuite {
  import SparkSuite._

  test("signBits packs the sign pattern exactly") {
    import spark.implicits._
    // 64-dim vector: component i positive iff i ∈ {0, 5, 33, 63}
    val v = (0 until 64).map(i => if (Set(0, 5, 33, 63)(i)) 1.0f else -1.0f)
    val df = Seq(Tuple1(v)).toDF("embedding")
      .select(KnnSearch.signBits(col("embedding"), 1).as("lo"),
        KnnSearch.signBits(col("embedding"), 33).as("hi"))
    val row = df.head()
    assert(row.getLong(0) == ((1L << 0) | (1L << 5)))
    // hi word covers 0-based components 32..63 → bit = i - 32
    assert(row.getLong(1) == ((1L << 1) | (1L << 31)))
  }

  test("binary search recovers most of the exact top-10 at sf0.001") {
    val exact = KnnSearch.topK(spark, Sf, k = 10).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val bin = KnnSearch.binarySearch(spark, Sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    // 64-bit signatures over 64-dim vectors: hamming is a coarse proxy;
    // candidates=50 of 500 must still catch at least half the true top-10
    assert((exact & bin).size >= 5, s"binary recall too low: ${(exact & bin).size}/10")
  }

  test("matryoshka search recovers the exact top-1 and most of top-10") {
    val exact = KnnSearch.topK(spark, Sf, k = 10)
      .collect().map(_.getLong(0))
    val mat = KnnSearch.matryoshkaSearch(spark, Sf).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(mat.contains(exact.head), "16-dim prefix stage lost the exact top-1")
    // 16 of 64 dims is a lossy proxy; measured recall at sf0.001 is 6/10
    assert((exact.toSet & mat).size >= 6,
      s"matryoshka recall too low: ${(exact.toSet & mat).size}/10")
  }

  test("ivf+pq recovers most of the exact top-10 despite double approximation") {
    val exact = KnnSearch.topK(spark, Sf, k = 10).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    // probe ~30% of the ⌈√N⌉-scheduled clusters (the pre-r9 constant
    // was nprobe=3 of 10); both approximation stages lose candidates —
    // half the true top-10 is the measured floor at sf0.001
    val nprobe = math.ceil(
      graft.operators.IvfIndex.centroids(spark, Sf).count() * 0.3).toInt
    val ivfpq = graft.operators.PqIndex.searchIvfPq(spark, Sf, nprobe = nprobe)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact & ivfpq).size >= 5, s"ivf+pq recall: ${(exact & ivfpq).size}/10")
  }

  test("mmr picks are distinct, led by the top-rel hit, and more diverse than top-k") {
    val pool = KnnSearch.topK(spark, Sf, k = 20)
      .collect().map(_.getLong(0))
    val mmr = KnnSearch.mmrSearch(spark, Sf).collect()
    val ids = mmr.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(ids.distinct.length == 5)
    assert(ids.head == pool.head, "first MMR pick must be the relevance argmax")
    assert(ids.toSet.subsetOf(pool.toSet), "picks must come from the retrieved pool")
    // diversity: mean pairwise dot of the MMR set is below the plain
    // top-5's — otherwise the diversification did nothing
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, Sf)
      .filter(col("vec_id").isin(pool.take(5) ++ ids: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def meanPairDot(s: Seq[Long]): Double = {
      val ps = for (a <- s; b <- s if a < b) yield
        vecs(a).zip(vecs(b)).map { case (x, y) => x.toDouble * y.toDouble }.sum
      ps.sum / ps.length
    }
    assert(meanPairDot(ids.toSeq) <= meanPairDot(pool.take(5).toSeq),
      "MMR set is no more diverse than the plain top-5")
  }

  test("multivec maxsim dominates the pooled dot product (per-part max ≥ aligned part)") {
    import org.apache.spark.sql.functions._
    val mv = KnnSearch.multivecSearch(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(mv.size == 10)
    // Σ_s max_t dot(q_s, d_t) ≥ Σ_s dot(q_s, d_s) = dot(q, d) — exactly,
    // for every doc (the aligned part is one of the maxed-over choices)
    val pooled = KnnSearch.scored(
        Tables.embeddings(spark, Sf).select("vec_id", "embedding"),
        Tables.embeddings(spark, Sf).filter(col("vec_id") === 0)
          .select(col("embedding").as("qvec")))
      .filter(col("vec_id").isin(mv.keys.toSeq: _*))
      .select("vec_id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    mv.foreach { case (id, ms) =>
      assert(ms >= pooled(id) - 1e-6, s"maxsim $ms < pooled ${pooled(id)} for vec $id")
    }
  }

  test("rocchio expansion keeps the query's own neighborhood on top") {
    val base = KnnSearch.topK(spark, Sf, k = 10).collect().map(_.getLong(0)).toSet
    val exp = KnnSearch.rocchioSearch(spark, Sf).collect().map(_.getLong(0)).toSet
    // β=0.5 feedback from the top-5 nudges, not replaces: the expanded
    // ranking must still share most of the original top-10
    assert((base & exp).size >= 6, s"rocchio drifted: ${(base & exp).size}/10 overlap")
    assert(exp.contains(0L), "the query vector itself fell out of its own results")
  }

  test("binary hamming is symmetric-bounded: 0 for the query itself") {
    // vec_id 0 IS the query: its hamming must be 0 and it must rank top-1 by score
    val rows = KnnSearch.binarySearch(spark, Sf).collect()
    val self = rows.find(_.getLong(0) == 0L)
    assert(self.isDefined && self.get.getLong(1) == 0L)
  }
}
