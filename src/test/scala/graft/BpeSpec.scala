package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.BpeTokenizer

/** r11 (r10 verdict #6): the committed BPE tokenizer artifact. The
  * separator-string apply (what the DuckDB oracle mirrors as a
  * recursive CTE) must equal an INDEPENDENT textbook list-based BPE
  * apply on every corpus word; the committed bytes must load, be
  * byte-flip sensitive (CRC), and round-trip; training must be
  * deterministic; the graded query must be partitioning-invariant.
  */
class BpeSpec extends AnyFunSuite {
  import SparkSuite._

  /** Textbook reference apply: repeatedly find the LOWEST-RANK merge
    * with an adjacent occurrence in the token list and merge its
    * occurrences left-to-right non-overlapping — no separator-string
    * tricks, so agreement is evidence, not tautology.
    */
  private def referenceEncode(merges: Array[(String, String)], word: String): Seq[String] = {
    def codepoints(w: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.result()
    }
    var toks = codepoints(word)
    var progressed = true
    while (progressed) {
      progressed = false
      val applicable = merges.indexWhere { case (a, b) =>
        toks.indices.dropRight(1).exists(i => toks(i) == a && toks(i + 1) == b)
      }
      if (applicable >= 0) {
        val (a, b) = merges(applicable)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2
          } else { out += toks(i); i += 1 }
        }
        toks = out.result()
        progressed = true
      }
    }
    toks
  }

  private lazy val corpusWords: Seq[String] =
    Tables.documents(spark, Sf)
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  test("committed artifact loads and its merges are non-trivial") {
    val t = BpeTokenizer.default
    assert(t.merges.length >= 16)
    // merged tokens must be reachable: every merge's parts are either
    // single codepoints or earlier merge outputs
    val known = collection.mutable.Set.empty[String]
    t.merges.foreach { case (a, b) =>
      assert(a.codePointCount(0, a.length) == 1 || known.contains(a), s"orphan left part '$a'")
      assert(b.codePointCount(0, b.length) == 1 || known.contains(b), s"orphan right part '$b'")
      known += a + b
    }
  }

  test("separator-string apply == textbook list-based apply on every corpus word") {
    val t = BpeTokenizer.default
    assert(corpusWords.nonEmpty)
    corpusWords.foreach { w =>
      assert(t.encodeWord(w) === referenceEncode(t.merges, w), s"word '$w'")
      assert(t.countWord(w) === referenceEncode(t.merges, w).size.toLong, s"count '$w'")
    }
    // r12 artifact shape: the documents vocabulary is the training
    // corpus's Zipf HEAD, so every word fully merges to one token
    // (exactly what a real tokenizer does to frequent words), while
    // identifier-shaped words — the long tail the 2k merges can't
    // enumerate — keep subword structure
    val counts = corpusWords.map(t.countWord)
    assert(counts.exists(_ == 1L), "no corpus word fully merged")
    // long-tail identifiers — custkeys far beyond the trained range, so
    // no full-name merge chain can exist for them — keep subword
    // structure (heavily-shared small-key names MAY fully merge: the
    // table legitimately learns them whole, like a real tokenizer
    // learns frequent words)
    val tail = (0 until 50).map(i => f"Customer#${1000000 + i * 7013}%09d")
    val tailCounts = tail.map(t.countWord)
    assert(tailCounts.count(_ > 1L) >= 25,
      s"long-tail identifiers lost subword structure: $tailCounts")
  }

  test("adversarial words: empty, single char, unseen chars, overlap chains") {
    val t = BpeTokenizer.default
    val words = Seq("", "a", "zzzzqqqq", "ÜñïÇødé", "aaaa", "ererer",
      corpusWords.headOption.map(_ * 3).getOrElse("xxx"))
    words.foreach { w =>
      assert(t.encodeWord(w) === referenceEncode(t.merges, w), s"word '$w'")
    }
    assert(t.countWord("") === 0L)
  }

  test("r12: fast rank-scan apply == separator-string reference on corpus + identifier fuzz") {
    // the r12 apply loop replaced the O(M·L) pattern scan with an
    // O(L²) rank lookup; the ORACLE still mirrors the string-replace
    // semantics, so the two must stay bit-equal — pinned on the real
    // corpus vocabulary plus the identifier-shaped words the 2k-merge
    // artifact was trained on
    val t = BpeTokenizer.default
    val fuzz = (0 until 200).map(i => f"Customer#${i * 7919 % 1000000}%09d") ++
      (0 until 50).map(i => f"Supplier#$i%09d") ++
      Seq("{\"k\":", "76}", "1-URGENT", "MACHINERY", "anodized", "Brand#34",
        "PROMO", "BURNISHED", "aaaabbbb", "Customer#Customer#")
    (corpusWords ++ fuzz).foreach { w =>
      val ref = t.encodeStateReference(w)
      assert(t.encodeState(w) === ref, s"state of '$w'")
      val toks = ref.split(BpeTokenizer.Sep).filter(_.nonEmpty).toSeq
      assert(t.encodeWord(w) === toks, s"tokens of '$w'")
      assert(t.countWord(w) === toks.size.toLong, s"count of '$w'")
    }
    // the artifact is the realistic-size table the verdict asked for
    assert(t.merges.length >= 1024, s"merge table too small: ${t.merges.length}")
  }

  test("r13 (ADVICE r12): separator-containing words tokenize as textbook BPE") {
    // the trainer skips -bearing words, so no merge part contains
    // the separator and it can never merge — the token-list fast path is
    // exactly the textbook semantics for these words (the r12 string-
    // state fallback corrupted them: countWord halved separator runs,
    // encodeWord dropped them)
    val t = BpeTokenizer.default
    val sep = BpeTokenizer.Sep.toString
    val words = Seq(sep, sep * 4, s"ab${sep}cd", s"${sep}MACHINERY$sep",
      s"Customer#${sep}000012", s"a$sep$sep b".replace(" ", ""),
      corpusWords.headOption.map(w => w + sep + w).getOrElse(s"x${sep}x"))
    words.foreach { w =>
      val want = referenceEncode(t.merges, w)
      assert(t.encodeWord(w) === want, s"tokens of '${w.replace(sep, "<SEP>")}'")
      assert(t.countWord(w) === want.size.toLong,
        s"count of '${w.replace(sep, "<SEP>")}'")
      // every input separator survives as its own token
      assert(t.encodeWord(w).count(_ == sep) === w.count(_ == BpeTokenizer.Sep))
    }
    // the string encoding is honestly partial now, not silently corrupt
    assertThrows[IllegalArgumentException](t.encodeState(s"ab${sep}cd"))
  }

  test("bytes round-trip; every byte flip fails the CRC load") {
    val t = BpeTokenizer.default
    val bytes = BpeTokenizer.toBytes(t)
    val again = BpeTokenizer.fromBytes(bytes)
    assert(again.merges.toSeq === t.merges.toSeq)
    // flip a byte in the merges body and in the CRC itself
    Seq(13, bytes.length / 2, bytes.length - 3).foreach { pos =>
      val bad = bytes.clone()
      bad(pos) = (bad(pos) ^ 0x40).toByte
      assertThrows[IllegalArgumentException](BpeTokenizer.fromBytes(bad))
    }
  }

  test("training is deterministic and rank-monotone") {
    val freqs = corpusWords.zipWithIndex.map { case (w, i) => (w, (i % 7 + 1).toLong) }
    val t1 = BpeTokenizer.train(freqs, 24)
    val t2 = BpeTokenizer.train(freqs, 24)
    assert(BpeTokenizer.toBytes(t1).toSeq === BpeTokenizer.toBytes(t2).toSeq)
  }

  test("graded query is partitioning-invariant") {
    val a = graft.operators.TextAnalysis.bpeTokens(spark, Sf)
      .collect().map(_.toString).sorted.toSeq
    // a different partitioning must not change any count (the memo is
    // per-partition state — this pins it as semantics-free)
    val sc = spark.sparkContext
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val b = graft.operators.TextAnalysis.bpeTokens(spark, Sf)
        .repartition(3).collect().map(_.toString).sorted.toSeq
      assert(b === a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
