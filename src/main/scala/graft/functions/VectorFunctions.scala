package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as pure Catalyst `Column` expressions (no UDFs) so every
  * operator stays inside whole-stage codegen.
  *
  * Numeric contract (see SURVEY.md §6): all math is elementwise
  * float→double (exact) followed by a *sequential left-to-right* double
  * fold (`aggregate` HOF). DuckDB's `list_reduce` folds the same way, so
  * dot products / norms are bitwise identical across engines before any
  * rounding.
  *
  * Mirrors the reference's encode/search math: L2-normalize at encode
  * time (reference encode_assets.py:28-34, `normalize_embeddings=True`)
  * and dot-product scoring at search time (reference store_assets.py:40-77,
  * Qdrant `Distance.DOT`).
  */
object VectorFunctions {

  /** Sequential sum of a double array: ((0.0 + x1) + x2) + ... */
  def seqSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float/double vectors, accumulated in double.
    * Backed by the codegen'd [[VectorExprs.DotProductExpr]]; `dotHof`
    * is the HOF twin used to prove bitwise equivalence.
    */
  def dot(a: Column, b: Column): Column = VectorExprs.dot(a, b)

  /** HOF formulation of `dot` (interpreted; kept as the numeric spec). */
  def dotHof(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Squared euclidean distance (k-means / IVF assignment metric). */
  def dist2(a: Column, b: Column): Column = VectorExprs.dist2(a, b)

  /** HOF formulation of `dist2` (interpreted; the numeric spec). */
  def dist2Hof(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy of the vector, given its precomputed norm column
    * (pass `norm(a)` or a cached column; avoids re-deriving the fold per
    * element).
    */
  def l2normalize(a: Column, nrm: Column): Column =
    transform(a, x => x.cast("double") / nrm)

  /** Bit-exact cross-engine rounding to 6 decimals:
    * floor(x*1e6 + 0.5)/1e6 uses only IEEE-exact ops, so identical input
    * doubles give identical output doubles in Spark and DuckDB (unlike
    * `round`, whose half-up path differs between engines).
    */
  def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Same, 9 decimals (for per-row integerization of small magnitudes). */
  def cents(c: Column, scale: Double): Column =
    floor(c * lit(scale) + lit(0.5)).cast("long")

  /** Global window over a PROVABLY BOUNDED input — a ≤ top-k row set
    * after a `.limit()`, or a series already collapsed to one row per
    * day/group — never corpus-sized data. This is a plain
    * unpartitioned window: WindowExec's "No Partition Defined" warning
    * WILL fire for it, and is moot at every call site by construction
    * (the r5 `partitionBy(lit(0))` cosmetic was erased by Spark 4.1's
    * EliminateWindowPartitions rule anyway — same plan, false comfort).
    * The harness mains quiet that one logger instead; call sites keep
    * this helper as the documentation that the input is bounded.
    */
  def boundedWindow(order: Column*): org.apache.spark.sql.expressions.WindowSpec =
    org.apache.spark.sql.expressions.Window.orderBy(order: _*)
}
