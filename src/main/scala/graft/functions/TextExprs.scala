package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup hot path. Each has an HOF /
  * relational twin that defines the semantics (and that the DuckDB
  * oracle mirrors); specs assert exact equality.
  */
object TextExprs {

  /** Distinct k-word shingles of a token array in one pass
    * (first-occurrence order — the same order
    * `array_distinct(transform(sequence...))` produces).
    */
  case class ShinglesExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val out = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i + k <= n) {
        var s = toks.getUTF8String(i)
        var j = 1
        while (j < k) {
          s = UTF8String.concat(s, UTF8String.fromString(" "), toks.getUTF8String(i + j))
          j += 1
        }
        out.add(s)
        i += 1
      }
      new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** 32-bit SimHash of a token multiset in one pass. Bit b of the
    * signature is the sign of Σ_tokens (±1), where the vote is bit
    * (31-b) of the first 4 md5 bytes (big-endian) — exactly the
    * md5-nibble formulation of the relational twin
    * (Dedup.simhashSignaturesRelational / the DuckDB oracle).
    */
  case class SimHashExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType

    @transient private lazy val digest = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val votes = new Array[Int](32)
      val md = digest.get()
      var i = 0
      while (i < n) {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        val h = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff)
        var b = 0
        while (b < 32) {
          votes(b) += (((h >>> (31 - b)) & 1) * 2 - 1)
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 32) {
        if (votes(b) > 0) sig |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(sig)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Run-length duplicate statistics of a string array in ONE pass:
    * struct(dup_cnt, tot_cnt, dup_mass, tot_mass), where an element
    * counts as duplicated iff its multiplicity ≥ 2 and mass weights by
    * character length. Semantics twin: the array_sort + `aggregate`
    * HOF folds (TextAnalysis.dupCountFracHof/dupCharFracHof, which the
    * DuckDB oracle mirrors); this native replaces TWO sorted HOF folds
    * per row (count-frac + char-frac each re-sorted the array) with
    * one sort + one scan in plain JVM code — the text-quality scan is
    * the hot path of a 100 TB curation pass, and `aggregate` lambdas
    * evaluate interpreted per element.
    */
  case class DupStatsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("dup_cnt", LongType, nullable = false),
      StructField("tot_cnt", LongType, nullable = false),
      StructField("dup_mass", LongType, nullable = false),
      StructField("tot_mass", LongType, nullable = false)))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val xs = new Array[UTF8String](n)
      var i = 0
      while (i < n) { xs(i) = arr.getUTF8String(i); i += 1 }
      // any total order groups equal elements — binary UTF8 order here,
      // with null elements grouped first (current call sites never
      // produce element nulls, but a future caller gets defined
      // behavior — all nulls mutually equal, mass 0 — instead of an NPE
      // from compareTo/numChars)
      java.util.Arrays.sort(xs, (a: UTF8String, b: UTF8String) =>
        if (a eq null) { if (b eq null) 0 else -1 }
        else if (b eq null) 1
        else a.compareTo(b))
      var dupCnt = 0L; var dupMass = 0L; var totMass = 0L
      var run = 0L; var runMass = 0L
      i = 0
      while (i < n) {
        val len = if (xs(i) eq null) 0L else xs(i).numChars().toLong
        totMass += len
        if (i > 0 && xs(i) == xs(i - 1)) { run += 1; runMass += len }
        else {
          if (run >= 2) { dupCnt += run; dupMass += runMass }
          run = 1; runMass = len
        }
        i += 1
      }
      if (run >= 2) { dupCnt += run; dupMass += runMass }
      org.apache.spark.sql.catalyst.InternalRow(dupCnt, n.toLong, dupMass, totMass)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** [[DupStatsExpr]] fused with k-gram construction: the duplicate
    * statistics of `gramsAll(tokens, k)` computed in ONE native pass —
    * hash-counting (gram string → count) instead of materializing the
    * gram array and sorting it. The r8 real-document A/B showed the
    * repetition hot path was never the fold: building ~3k gram strings
    * per document through an interpreted `transform`+`concat_ws`
    * lambda cost ~95 s on the 10k-doc archive corpus for native and
    * HOF folds alike — the gram CONSTRUCTION is the scan cost at
    * 100 TB. Gram strings are still built (space-joined, exactly
    * concat_ws(" ") for non-null tokens — a null token is treated as
    * the empty token, GramCountsExpr precedent), so counts and char
    * masses are identical to the unfused chain; the parity spec pins
    * the struct bitwise. A NULL token array yields all-zero stats —
    * same as the unfused chain, whose size()-guard resolves NULL to an
    * empty gram array.
    */
  case class DupGramStatsExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1)
    override def dataType: DataType = StructType(Seq(
      StructField("dup_cnt", LongType, nullable = false),
      StructField("tot_cnt", LongType, nullable = false),
      StructField("dup_mass", LongType, nullable = false),
      StructField("tot_mass", LongType, nullable = false)))
    override def nullable: Boolean = false

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null)
        return org.apache.spark.sql.catalyst.InternalRow(0L, 0L, 0L, 0L)
      val toks = v.asInstanceOf[ArrayData]
      val n = toks.numElements()
      def tok(i: Int): UTF8String = {
        val t = toks.getUTF8String(i)
        if (t eq null) UTF8String.EMPTY_UTF8 else t
      }
      val sp = UTF8String.fromString(" ")
      // gram string -> (count, numChars); one pass, no gram array
      val counts = new java.util.HashMap[UTF8String, Array[Long]]()
      var i = 0
      while (i + k <= n) {
        var g = tok(i)
        var j = 1
        while (j < k) { g = UTF8String.concat(g, sp, tok(i + j)); j += 1 }
        val e = counts.get(g)
        if (e == null) counts.put(g, Array(1L, g.numChars().toLong))
        else e(0) += 1
        i += 1
      }
      var dupCnt = 0L; var totCnt = 0L; var dupMass = 0L; var totMass = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e(0); val m = c * e(1)
        totCnt += c; totMass += m
        if (c >= 2) { dupCnt += c; dupMass += m }
      }
      org.apache.spark.sql.catalyst.InternalRow(dupCnt, totCnt, dupMass, totMass)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Raw Gopher repetition statistics of a token array in ONE pass:
    * struct(n_toks, n_uniq, top2_cnt, n_g2, dup3_cnt, n_g3, tok_mass),
    * all longs. Replaces five interpreted HOF traversals per row
    * (gramsAll×2, array_sort + aggregate fold for the top-bigram run,
    * array_distinct×2, the token-length fold) with one hash-counting
    * scan — the quality-decision scan is the hot path of a 100 TB
    * curation pass. The double arithmetic (r6 fractions, keep
    * thresholds) deliberately stays OUTSIDE in column expressions, so
    * the consumer's values are bit-identical to the HOF twin
    * (TextAnalysis.gopherStatsHof, which the DuckDB oracle mirrors).
    */
  case class GopherRawExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_toks", LongType, nullable = false),
      StructField("n_uniq", LongType, nullable = false),
      StructField("top2_cnt", LongType, nullable = false),
      StructField("n_g2", LongType, nullable = false),
      StructField("dup3_cnt", LongType, nullable = false),
      StructField("n_g3", LongType, nullable = false),
      StructField("tok_mass", LongType, nullable = false)))

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      // null elements never occur at the call sites (split() output);
      // treat one as the empty token for defined behavior
      def tok(i: Int): UTF8String = {
        val t = toks.getUTF8String(i)
        if (t eq null) UTF8String.EMPTY_UTF8 else t
      }
      val sp = UTF8String.fromString(" ")
      val uniq = new java.util.HashSet[UTF8String]()
      val big = new java.util.HashMap[UTF8String, Long]()
      val tri = new java.util.HashSet[UTF8String]()
      var mass = 0L
      var i = 0
      while (i < n) {
        val t = tok(i)
        mass += t.numChars().toLong
        uniq.add(t)
        if (i + 1 < n) {
          val b = UTF8String.concat(t, sp, tok(i + 1))
          big.merge(b, 1L, (a, x) => a + x)
          if (i + 2 < n) tri.add(UTF8String.concat(b, sp, tok(i + 2)))
        }
        i += 1
      }
      var top2 = 0L
      val it = big.values().iterator()
      while (it.hasNext) { val v = it.next(); if (v > top2) top2 = v }
      val nG2 = if (n >= 2) (n - 1).toLong else 0L
      val nG3 = if (n >= 3) (n - 2).toLong else 0L
      org.apache.spark.sql.catalyst.InternalRow(
        n.toLong, uniq.size.toLong, top2, nG2, nG3 - tri.size, nG3, mass)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Raw token-entropy statistics in ONE pass:
    * struct(n_uniq, ent_e6), where ent_e6 is Σ over distinct tokens of
    * floor((-p·ln p)·1e6 + 0.5) with p = count/n — term-for-term the
    * integerized fold of the HOF twin (TextAnalysis.entropyScoreHof /
    * the DuckDB oracle), so the sum is identical regardless of
    * iteration order. Replaces an array_sort + interpreted run-length
    * `aggregate` fold per row with one hash count.
    */
  case class EntropyRawExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StructType(Seq(
      StructField("n_uniq", LongType, nullable = false),
      StructField("ent_e6", LongType, nullable = false)))

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val counts = new java.util.HashMap[UTF8String, Long]()
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i)
        counts.merge(if (t eq null) UTF8String.EMPTY_UTF8 else t, 1L, (a, x) => a + x)
        i += 1
      }
      var ent = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        // exactly cents(-p * log(p), 1e6) on the same IEEE doubles
        val p = it.next().toDouble / (1.0 * n)
        ent += math.floor((-p) * math.log(p) * 1e6 + 0.5).toLong
      }
      org.apache.spark.sql.catalyst.InternalRow(counts.size.toLong, ent)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Per-row k-gram COUNTS in one pass: array<struct<g,c>> with one
    * entry per distinct k-gram (first-occurrence order) and its
    * multiplicity. Exploding this instead of the raw gram stream gives
    * downstream corpus-level counting the same totals (Σc ≡ one row
    * per occurrence) while (a) shrinking the exploded volume to
    * per-doc DISTINCT grams and (b) replacing the interpreted
    * `transform`+`concat_ws` gram construction with native JVM code —
    * the two dominant costs of the bigram-LM / PMI family. Semantics
    * twin: `gramCountsHof` (array_distinct + per-gram filter count);
    * GramCountsParity in PropertyParitySpec asserts exact equality.
    */
  case class GramCountsExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("c", LongType, nullable = false))), containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      // null elements never occur at the call sites (split() output);
      // treat one as the empty token for defined behavior
      def tok(i: Int): UTF8String = {
        val t = toks.getUTF8String(i)
        if (t eq null) UTF8String.EMPTY_UTF8 else t
      }
      val sp = UTF8String.fromString(" ")
      val counts = new java.util.LinkedHashMap[UTF8String, Long]()
      var i = 0
      while (i + k <= n) {
        var g = tok(i)
        var j = 1
        while (j < k) { g = UTF8String.concat(g, sp, tok(i + j)); j += 1 }
        counts.merge(g, 1L, (a, x) => a + x)
        i += 1
      }
      val out = new Array[Any](counts.size)
      val it = counts.entrySet().iterator()
      i = 0
      while (it.hasNext) {
        val e = it.next()
        out(i) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def shingles(tokens: Column, k: Int = 3): Column =
    ColumnBridge.column(ShinglesExpr(ColumnBridge.expression(tokens), k))

  def simhash(tokens: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(tokens)))

  def dupStats(xs: Column): Column =
    ColumnBridge.column(DupStatsExpr(ColumnBridge.expression(xs)))

  def dupGramStats(tokens: Column, k: Int): Column =
    ColumnBridge.column(DupGramStatsExpr(ColumnBridge.expression(tokens), k))

  def gramCounts(tokens: Column, k: Int): Column =
    ColumnBridge.column(GramCountsExpr(ColumnBridge.expression(tokens), k))

  /** HOF twin of [[gramCounts]] — the semantic definition (spec-only;
    * O(G²) interpreted, never on the hot path).
    */
  def gramCountsHof(tokens: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val grams = TextFunctions.gramsAll(tokens, k)
    transform(array_distinct(grams), g =>
      struct(g.as("g"), size(filter(grams, x => x === g)).cast("long").as("c")))
  }

  def gopherRaw(tokens: Column): Column =
    ColumnBridge.column(GopherRawExpr(ColumnBridge.expression(tokens)))

  def entropyRaw(tokens: Column): Column =
    ColumnBridge.column(EntropyRawExpr(ColumnBridge.expression(tokens)))
}
