package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-dimension vector sum as the fifth custom mergeable `Aggregator`
  * (after bottom-k, Misra–Gries, Bloom, HLL): Σ floor(v_i·scale + 0.5)
  * and a per-dimension row count, as parallel long arrays — the
  * order-independent integer contract (SURVEY §6) applied to whole
  * vectors.
  *
  * This is the k-means update step (and any per-group mean-embedding)
  * without `posexplode`'s dim× row fan-out: the exploded twin turns a
  * 64-dim corpus into 64× rows through two hash aggregations just to
  * add numbers that were already sitting next to each other; here each
  * input row folds into a long[dim] buffer in place and buffers merge
  * elementwise (commutative monoid — partitioning-invariant, so sums
  * are BITWISE the exploded formulation's; IvfIndex.meanVectors'
  * parity is pinned by VecAggParity in AnnParitySpec).
  *
  * Null/ragged handling mirrors the exploded twin: a NULL element
  * contributes nothing to its dimension's sum while its row still
  * counts toward that dimension's n (posexplode emits the (pos, NULL)
  * row; SUM skips it, COUNT(1) doesn't); rows of different lengths
  * contribute only to the dimensions they have — the per-dim counts
  * reproduce posexplode's per-pos group sizes exactly. Sole divergence
  * (documented, unreachable for real embeddings): a dimension whose
  * every value is NULL averages to 0 here but NULL in the exploded
  * form (SUM over only-NULLs).
  */
object VecAgg {

  type Buf = (Array[Long], Array[Long]) // (scaled sums, per-dim counts)

  class VecSumScaled(scale: Double)
      extends Aggregator[Seq[Option[Float]], Buf, (Seq[Long], Seq[Long])] {
    override def zero: Buf = (Array.emptyLongArray, Array.emptyLongArray)

    override def reduce(b: Buf, v: Seq[Option[Float]]): Buf = {
      if (v == null) return b
      val n = v.size
      val sums = if (b._1.length >= n) b._1 else java.util.Arrays.copyOf(b._1, n)
      val cnts = if (b._2.length >= n) b._2 else java.util.Arrays.copyOf(b._2, n)
      var i = 0
      val it = v.iterator
      while (it.hasNext) {
        val x = it.next()
        if (x.isDefined) sums(i) += math.floor(x.get.toDouble * scale + 0.5).toLong
        cnts(i) += 1
        i += 1
      }
      (sums, cnts)
    }

    override def merge(a: Buf, b: Buf): Buf = {
      def add(x: Array[Long], y: Array[Long]): Array[Long] = {
        val (big, small) = if (x.length >= y.length) (x, y) else (y, x)
        var i = 0
        while (i < small.length) { big(i) += small(i); i += 1 }
        big
      }
      (add(a._1, b._1), add(a._2, b._2))
    }

    override def finish(b: Buf): (Seq[Long], Seq[Long]) = (b._1.toSeq, b._2.toSeq)
    override def bufferEncoder: Encoder[Buf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[(Seq[Long], Seq[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Seq[Long])]()
  }

  /** struct(_1: array<bigint> scaled sums, _2: array<bigint> counts). */
  def vecSumE9(vec: Column): Column =
    udaf(new VecSumScaled(1e9)).apply(vec)
}
