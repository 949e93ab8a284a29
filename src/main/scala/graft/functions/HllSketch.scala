package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperLogLog sketch as a mergeable `Aggregator` — the fourth custom
  * sketch aggregator (bottom-k, Misra–Gries, Bloom, now HLL). Spark's
  * built-in `approx_count_distinct` answers one query; what it does NOT
  * give you is the SKETCH as a value — and at 100 TB the useful shape
  * is pre-aggregated sketches (one 4 KiB register array per day /
  * source / shard, stored next to the data) that merge in O(m) to
  * answer any distinct-count rollup later WITHOUT rescanning the
  * corpus. Register-wise max is a commutative idempotent monoid, so
  * the sketch is partitioning-invariant and the merge of per-slice
  * sketches is BYTE-IDENTICAL to the sketch of the union (spec-pinned).
  *
  * Standard dense HLL (Flajolet et al. 2007): p = 12 → m = 4096 byte
  * registers, rsd ≈ 1.04/√m ≈ 1.6%; bias-corrected raw estimate with
  * the linear-counting fallback below 2.5·m (the small-range regime
  * where raw HLL is biased). Keys are hashed with `xxhash64` on the
  * Catalyst side, so the aggregator's input is already a uniform
  * 64-bit value — first p bits pick the register, the rest feed the
  * leading-zero rank (max rank 53 fits a signed byte).
  */
object HllSketch {

  val P = 12
  val M: Int = 1 << P
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  class HllAgg extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](M)
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      val idx = (h >>> (64 - P)).toInt
      val w = h << P
      val rank = (if (w == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rank > b(idx)) b(idx) = rank.toByte
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
    override def outputEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
  }

  /** One aggregation pass over `df`'s `key` column → the 4 KiB register
    * array (a broadcast-sized summary of an arbitrarily large key set).
    */
  def build(df: DataFrame, key: Column): Array[Byte] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(xxhash64(key).as("h")).as[Long]
      .select(new HllAgg().toColumn)
      .head()
  }

  /** Register-wise max — merging per-slice sketches ≡ sketching the
    * union (exactly, not approximately: same registers).
    */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == M && b.length == M)
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = if (a(i) > b(i)) a(i) else b(i); i += 1 }
    out
  }

  /** Cardinality estimate: bias-corrected raw HLL, linear counting in
    * the small-range regime (raw ≤ 2.5·m with empty registers).
    */
  def estimate(regs: Array[Byte]): Double = {
    require(regs.length == M)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M.toDouble * M.toDouble / sum
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else raw
  }
}
