package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational}
import graft.functions.TextFunctions.tokens

/** The blocking schemes (SymSpell deletion neighborhoods, SimHash byte
  * banding) trade pair-space for recall. These specs pin down exactly
  * what is preserved: fuzzy matching is EXACT (the candidate superset
  * provably contains every pair within distance 2), SimHash banding is
  * exhaustive up to the pigeonhole bound (hamming ≤ blocks-1) and a
  * documented candidate filter above it.
  */
class BlockingSpec extends AnyFunSuite {
  import SparkSuite._

  test("deletion-neighborhood fuzzy matching reproduces the cartesian result exactly") {
    val fast = Relational.fuzzyTokens(spark, Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val vocab = Tables.documents(spark, Sf)
      .select(explode(tokens(col("text"))).as("tok")).distinct()
      .filter(col("tok").rlike("^[A-Za-z]+$"))
    val naive = vocab.select(col("tok").as("tok_a"))
      .crossJoin(vocab.select(col("tok").as("tok_b")))
      .filter(col("tok_a") < col("tok_b"))
      .withColumn("dist", levenshtein(col("tok_a"), col("tok_b")).cast("long"))
      .filter(col("dist") <= 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(fast === naive, s"fast-naive=${(fast -- naive).take(5)} naive-fast=${(naive -- fast).take(5)}")
  }

  test("simhash banding is exhaustive for hamming <= blocks-1 (pigeonhole)") {
    // 4 byte blocks: ≤3 differing bits cannot touch all 4 blocks, so
    // every such pair MUST share a block and survive the banded join
    val banded = Dedup.simhashPairs(spark, Sf, maxHamming = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = Dedup.simhashSignatures(spark, Sf)
      .join(Tables.documents(spark, Sf).select("doc_id", "lang"), "doc_id")
    val allPairs = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("lang"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("lang")), Seq("lang"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sig_a").bitwiseXOR(col("sig_b"))) <= 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded === allPairs,
      s"pigeonhole violated: missing=${(allPairs -- banded).take(5)}")
  }

  test("banded simhash pairs all share at least one 16-bit block") {
    val p = Dedup.simhashPairs(spark, Sf)
    val sigs = Dedup.simhashSignatures(spark, Sf)
    val withSigs = p
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
    val sharesBlock = (0 until Dedup.SimhashBlocks).map(b =>
      shiftright(col("sig_a"), 16 * b).bitwiseAND(lit(65535L))
        === shiftright(col("sig_b"), 16 * b).bitwiseAND(lit(65535L)))
      .reduce(_ || _)
    assert(withSigs.filter(!sharesBlock).count() === 0)
  }
}
