package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data generator: writes an N×-replica of a testdata SF
  * directory with disjoint key spaces per replica, so the slow-tail
  * queries can be measured at ~10× the bench SF and their scaling
  * exponents recorded (SURVEY §15). Replica semantics per table:
  *
  *  - documents: doc_id offset; text letter-rotated per replica (the
  *    lowercase alphabet shifted by k — a length-preserving bijection).
  *    Within a replica the exact/near-dup structure of the original
  *    corpus is preserved bit-for-bit; across replicas token identity
  *    is broken, so LSH candidate pairs scale ~linearly with corpus
  *    size — the "constant dup rate" regime a real 10× corpus has.
  *    (Naive replication without perturbation would make every copy a
  *    near-dup of its original and grow pairs quadratically — a
  *    different workload, not a bigger one.)
  *  - embeddings: vec_id offset; a deterministic per-replica jitter on
  *    each component decorrelates replicas.
  *  - events: event_id/user_id offset (10× users, same activity shape,
  *    same day grid).
  *  - orders/lineitem/customer/supplier/part: all keys offset
  *    consistently, so FK joins stay closed and the trade graph
  *    becomes N disjoint copies (nodes ×N, edges ×N).
  *  - nation/region: dimensions, copied once.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> [replicas=10]
  */
object ScaleUp {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"

  private def rotated(k: Int): String = {
    val s = k % 26
    Lower.drop(s) + Lower.take(s)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val n = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    def replicate(name: String, per: (DataFrame, Int) => DataFrame,
        parts: Int): Unit = {
      val base = tbl(name)
      val all = (0 until n).map(k => per(base, k)).reduce(_ union _)
      all.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name x$n done")
    }

    replicate("documents", (df, k) => df.select(
      (col("doc_id") + k * 10000000L).as("doc_id"),
      translate(col("text"), Lower, rotated(k)).as("text"),
      col("lang"), col("source"), col("n_chars")), 8)

    replicate("embeddings", (df, k) => df.select(
      (col("vec_id") + k * 10000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x + ((col("vec_id") * 31 + i * 17 + k * 7) % 21 - lit(10))
          .cast("float") * lit(0.001f)).cast("float")).as("embedding"),
      col("label")), 4)

    replicate("events", (df, k) => df.select(
      (col("event_id") + k * 1000000000L).as("event_id"), col("ts"),
      (col("user_id") + k * 1000000000L).as("user_id"),
      col("event_type"), col("value"), col("props")), 8)

    replicate("orders", (df, k) => df.select(
      (col("o_orderkey") + k * 1000000000L).as("o_orderkey"),
      (col("o_custkey") + k * 100000000L).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), 8)

    replicate("lineitem", (df, k) => df.select(
      (col("l_orderkey") + k * 1000000000L).as("l_orderkey"),
      (col("l_partkey") + k * 100000000L).as("l_partkey"),
      (col("l_suppkey") + k * 10000000L).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), 16)

    replicate("customer", (df, k) => df.select(
      (col("c_custkey") + k * 100000000L).as("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"),
      col("c_mktsegment")), 4)

    replicate("supplier", (df, k) => df.select(
      (col("s_suppkey") + k * 10000000L).as("s_suppkey"),
      col("s_name"), col("s_nationkey"), col("s_acctbal")), 2)

    replicate("part", (df, k) => df.select(
      (col("p_partkey") + k * 100000000L).as("p_partkey"),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), 4)

    Seq("nation", "region").foreach { name =>
      tbl(name).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name copied")
    }

    spark.stop()
  }
}
