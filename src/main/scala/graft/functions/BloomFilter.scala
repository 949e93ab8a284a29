package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Bloom filter as a mergeable `Aggregator` (the third
  * custom sketch aggregator after bottom-k and Misra–Gries), plus a
  * fully-relational probe — the 100 TB incremental-ingest primitive:
  * build a bloom over the EXISTING corpus's keys in one aggregation
  * pass (O(m/64) state per partition, element-wise OR merge — the
  * result is partitioning-invariant), broadcast the bit array, and
  * pre-filter an incoming batch map-side so the exact anti-join only
  * ever sees the (tiny) maybe-duplicate slice. A "definitely new" row
  * never reaches the join — bloom filters have NO false negatives.
  *
  * Hashing: both sides derive (h1, h2) = (xxhash64(key),
  * xxhash64(xxhash64(key))) as COLUMNS, and the k probe positions are
  * h1 XOR rotl(h2, r_i) with fixed rotations r_i ∈ [1, 63] — pure
  * bitwise math, identical on the JVM (aggregator) and Catalyst
  * (probe) sides, and safe under ANSI mode (no overflowing `+`/`*`).
  * The probe is column-only (`shiftrightunsigned` via call_function
  * with a column shift amount) — zero UDFs, stays inside codegen.
  */
object BloomFilter {

  /** Rotation schedule; i < 16 keeps every amount in [1, 63]. */
  private def rot(i: Int): Int = (17 * i + 11) % 63 + 1

  class BloomAgg(m: Int, k: Int) extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    require(m % 64 == 0 && m > 0 && k >= 1 && k <= 16)
    override def zero: Array[Long] = new Array[Long](m / 64)
    override def reduce(b: Array[Long], h: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < k) {
        val r = rot(i)
        val hi = h._1 ^ ((h._2 << r) | (h._2 >>> (64 - r)))
        val pos = java.lang.Math.floorMod(hi, m.toLong).toInt
        b(pos >> 6) |= 1L << (pos & 63)
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  private def h1(key: Column): Column = xxhash64(key)
  private def h2(key: Column): Column = xxhash64(xxhash64(key))

  /** One aggregation pass over `df`'s `key` column → the bit array
    * (m/64 longs — e.g. m = 2²⁰ bits is 128 KiB, a broadcast-sized
    * summary of an arbitrarily large key set).
    */
  def build(df: DataFrame, key: Column, m: Int = 1 << 20, k: Int = 5): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(h1(key).as("h1"), h2(key).as("h2")).as[(Long, Long)]
      .select(new BloomAgg(m, k).toColumn)
      .head()
  }

  /** Column predicate: every probed bit set. Pure bitwise column math
    * against the literal bit array — no UDF, no join, map-side only.
    */
  def mightContain(bits: Array[Long], key: Column, m: Int = 1 << 20, k: Int = 5): Column = {
    val arr = lit(bits)
    (0 until k).map { i =>
      val r = rot(i)
      val hi = h1(key).bitwiseXOR(
        shiftleft(h2(key), r).bitwiseOR(shiftrightunsigned(h2(key), 64 - r)))
      val pos = pmod(hi, lit(m.toLong))
      val word = element_at(arr, (pos / lit(64L)).cast("int") + 1)
      call_function("shiftrightunsigned", word, (pos % lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Incremental-ingest dedup: rows of `incoming` whose `key` is not in
    * `existing`. The bloom splits incoming map-side; only the
    * maybe-duplicate slice (true dups + ~FP-rate of the rest) pays the
    * exact anti-join — at 100 TB that join's probe side shrinks from
    * |incoming| to about |dups|, while correctness stays EXACT: the
    * false-positive slice is rescued by the anti-join, and false
    * negatives don't exist.
    */
  def newAgainstCorpus(existing: DataFrame, incoming: DataFrame, keyCol: String,
      m: Int = 1 << 20, k: Int = 5): DataFrame = {
    val bits = build(existing, col(keyCol), m, k)
    val maybe = incoming.filter(mightContain(bits, col(keyCol), m, k))
      .join(existing.select(col(keyCol)), Seq(keyCol), "left_anti")
    incoming.filter(!mightContain(bits, col(keyCol), m, k)).unionByName(maybe)
  }
}
