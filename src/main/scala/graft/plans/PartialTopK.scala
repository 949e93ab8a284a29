package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Partition-local partial top-k per group — the missing physical
  * operator for distributed k-NN (SURVEY.md §5).
  *
  * A `row_number() OVER (PARTITION BY g ORDER BY s)` plan shuffles
  * EVERY scored row to the rank stage; at 100 TB the k-NN scored set is
  * |corpus| × |queries| rows and that shuffle is the whole job. This
  * operator runs before the shuffle and keeps at most k rows per
  * (group, input partition) — only p×q×k candidate rows move, provably
  * containing the global per-group top-k (any row outside a partition's
  * local top-k is beaten by ≥k rows of its own partition and can never
  * rank ≤ k globally under the same total order).
  *
  * Implemented as the full custom-operator stack: logical node →
  * planner strategy (registered via `SparkSessionExtensions` or
  * `spark.experimental.extraStrategies`) → physical exec whose
  * `doExecute` keeps a bounded per-group buffer per partition. The
  * final exact rank is still the normal window over the survivors.
  *
  * Ordering contract (must match the downstream window exactly):
  * score DESC, tiebreak ASC — both read by ordinal from the child
  * output (group: long, score: double, tiebreak: long).
  */
case class PartialTopKNode(groupCol: String, scoreCol: String, tieCol: String,
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  // the key columns live here as names, not expressions — claim the
  // whole child output so ColumnPruning doesn't strip the columns this
  // operator reads (without this the optimizer pushes an empty Project
  // underneath and planning sees no columns at all)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan = copy(child = c)
}

case class PartialTopKExec(groupOrd: Int, scoreOrd: Int, tieOrd: Int, k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, s, t, kk) = (groupOrd, scoreOrd, tieOrd, k)
    child.execute().mapPartitions { it =>
      // per-group bounded buffers: worst row evicted when size > k under
      // the exact ordering of the downstream `desc(score), asc(tie)`
      // window — java.lang.Double.compare ranks NaN above every double
      // (Spark's total order), and NULL scores rank last (desc = nulls
      // last), so the survivors provably contain the window's top-k even
      // with NaN/NULL scores present.
      final class Entry(val isNull: Boolean, val score: Double, val tie: Long,
          val row: InternalRow)
      // >0 iff a ranks strictly better (earlier in DESC order) than b
      def rankCmp(aNull: Boolean, aScore: Double, aTie: Long,
          bNull: Boolean, bScore: Double, bTie: Long): Int = {
        if (aNull != bNull) { if (aNull) -1 else 1 }
        else {
          val c = if (aNull) 0 else java.lang.Double.compare(aScore, bScore)
          if (c != 0) c else java.lang.Long.compare(bTie, aTie)
        }
      }
      val heaps = new java.util.HashMap[Long, java.util.PriorityQueue[Entry]]()
      // min-heap: head = worst-ranked entry
      val cmp = new java.util.Comparator[Entry] {
        def compare(a: Entry, b: Entry): Int =
          rankCmp(a.isNull, a.score, a.tie, b.isNull, b.score, b.tie)
      }
      it.foreach { row =>
        val key = row.getLong(g)
        var h = heaps.get(key)
        if (h == null) { h = new java.util.PriorityQueue[Entry](kk + 1, cmp); heaps.put(key, h) }
        val nul = row.isNullAt(s)
        val sc = if (nul) 0.0 else row.getDouble(s)
        val ti = row.getLong(t)
        // test against the current worst BEFORE copying: once the heap is
        // full, the common case is rejection, which must not allocate
        val worst = if (h.size < kk) null else h.peek()
        if (worst == null ||
            rankCmp(nul, sc, ti, worst.isNull, worst.score, worst.tie) > 0) {
          h.add(new Entry(nul, sc, ti, row.copy()))
          if (h.size > kk) h.poll()
        }
      }
      val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
      heaps.values().forEach(h => h.forEach(e => out += e.row))
      out.iterator
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan = copy(child = c)
}

object PartialTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartialTopKNode(g, s, t, k, child) =>
      def ord(name: String, want: org.apache.spark.sql.types.DataType): Int = {
        val i = child.output.indexWhere(_.name == name)
        require(i >= 0, s"PartialTopK: column $name not found in ${child.output.map(_.name)}")
        require(child.output(i).dataType == want,
          s"PartialTopK: $name must be $want, got ${child.output(i).dataType}")
        i
      }
      PartialTopKExec(ord(g, LongType), ord(s, DoubleType), ord(t, LongType), k,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Session extension (`.withExtensions(new GraftExtensions)`) — or use
  * `PartialTopK.apply`, which self-registers on the experimental
  * strategy list.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => PartialTopKStrategy)
}

object PartialTopK {
  private def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(PartialTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ PartialTopKStrategy

  /** Keep at most k rows per group per input partition under
    * (scoreCol DESC, tieCol ASC) — a superset of the global per-group
    * top-k, to be finalized by the usual rank window.
    */
  def apply(df: DataFrame, groupCol: String, scoreCol: String, tieCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    ColumnBridge.ofRows(spark,
      PartialTopKNode(groupCol, scoreCol, tieCol, k, df.queryExecution.analyzed))
  }
}
