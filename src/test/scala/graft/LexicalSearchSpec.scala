package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{LexicalSearch, TextAnalysis, TrainingMix}
import graft.functions.TextFunctions.tokens

/** Behavioral specs for the lexical/hybrid search and training-set
  * assembly operators (the oracle proves cross-engine equality; these
  * pin down the semantics themselves).
  */
class LexicalSearchSpec extends AnyFunSuite {
  import SparkSuite._

  test("bm25 scores only docs containing a query term, ranked deterministically") {
    val rows = LexicalSearch.bm25(spark, Sf, k = 1000).collect()
    assert(rows.nonEmpty)
    // every scored doc matched at least one term, every score positive
    rows.foreach { r =>
      assert(r.getLong(1) > 0 || r.getLong(2) > 0) // tf_vector, tf_hash
      assert(r.getDouble(3) > 0)
    }
    // descending by score with doc_id tiebreak
    val scores = rows.map(r => (-r.getDouble(3), r.getLong(0)))
    assert(scores.sameElements(scores.sorted))
  }

  test("bm25 contribution grows with tf when dl is equal (saturating, not linear)") {
    // group docs by length; within a length class, higher tf_vector
    // must never score below lower tf_vector + equal tf_hash
    val rows = LexicalSearch.bm25(spark, Sf, k = 1000)
      .join(Tables.documents(spark, Sf).select(col("doc_id"),
        size(tokens(col("text"))).as("dl")), "doc_id")
      .collect().map(r => (r.getInt(4), r.getLong(2), r.getLong(1), r.getDouble(3)))
    for {
      ((dlA, hashA, tfA, sA), i) <- rows.zipWithIndex
      (dlB, hashB, tfB, sB) <- rows.drop(i + 1)
      if dlA == dlB && hashA == hashB && tfA > tfB
    } assert(sA >= sB, s"tf=$tfA scored $sA < tf=$tfB at $sB (dl=$dlA)")
  }

  test("hybrid rrf fuses both rank lists and prefers doubly-ranked docs") {
    val rows = LexicalSearch.hybridRrf(spark, Sf).collect()
    assert(rows.nonEmpty)
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) || r.isNullAt(2))
    // any doc on both lists outscores any doc on one list at ranks <= 20:
    // 1/(60+a)+1/(60+b) > 1/61 requires ranks <= 20 on both — holds here
    for (b <- both; s <- single)
      assert(b.getDouble(3) > s.getDouble(3))
    // rrf value is exactly the sum of the two reciprocal ranks
    both.foreach { r =>
      val expect = 1.0 / (60 + r.getLong(1)) + 1.0 / (60 + r.getLong(2))
      assert(math.abs(r.getDouble(3) - expect) < 1e-8)
    }
  }

  test("pii scrub removes every email/phone/ip match it counted") {
    import TextAnalysis.{EmailRe, Ipv4Re, PhoneRe}
    val out = TextAnalysis.piiScrub(spark, Sf)
    assert(out.filter(col("n_emails") < 1 || col("n_ips") < 1 || col("n_phones") < 1)
      .count() === 0) // the injection guarantees at least one of each
    // re-scanning the scrubbed text finds zero residual matches: rebuild
    // scrubbed text (piiScrub emits its hash) and scan it
    val raw = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com call 555-0100-"),
      lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
      lit(" from 10."), pmod(col("doc_id"), lit(200)).cast("string"),
      lit(".0."), pmod(col("doc_id"), lit(250)).cast("string"), lit(" end"))
    val scrubbed = Tables.documents(spark, Sf).select(
      regexp_replace(regexp_replace(regexp_replace(raw,
        EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>").as("s"))
    assert(scrubbed.filter(
      regexp_count(col("s"), lit(EmailRe)) > 0 ||
        regexp_count(col("s"), lit(Ipv4Re)) > 0 ||
        regexp_count(col("s"), lit(PhoneRe)) > 0).count() === 0)
  }

  test("sequence packing fills shards to the budget without splitting docs") {
    // small budget so the tiny sf0.001 corpus genuinely spans shards
    val budget = 256L
    val shards = TrainingMix.packSequences(spark, Sf, budget = budget).collect()
    assert(shards.exists(_.getLong(1) > 0), "expected multiple shards per source")
    // every non-final shard of a source starts because the previous one
    // crossed the budget: cumulative tokens before a shard's first doc
    // >= shard * budget and < (shard+1) * budget by construction
    shards.groupBy(_.getString(0)).foreach { case (_, ss) =>
      val byShard = ss.sortBy(_.getLong(1))
      // shard ids are dense from 0
      assert(byShard.map(_.getLong(1)).sameElements(byShard.indices.map(_.toLong)))
      // doc ranges do not overlap across consecutive shards
      byShard.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4)) // last_doc < first_doc
        case _ =>
      }
    }
    // total tokens are preserved
    val total = shards.map(_.getLong(3)).sum
    val expect = Tables.documents(spark, Sf)
      .select(sum(size(tokens(col("text")))).cast("long")).head().getLong(0)
    assert(total === expect)
    // a shard only ever exceeds the budget by less than its last doc:
    // cum_before of the last doc is under (shard+1)*budget
    shards.filter(_.getLong(2) > 1).foreach { s =>
      assert(s.getLong(3) > 0 && s.getLong(3) < budget * 3)
    }
  }

  test("searchHybrid fuses text-query BM25 with the encoded-vector ranks") {
    val r = graft.operators.SearchApi
      .searchHybrid(spark, Sf, "vector hash join table").collect()
    assert(r.nonEmpty && r.length <= 10)
    // ordered by fused score with doc_id tiebreak
    val keys = r.map(x => (-x.getDouble(3), x.getLong(0)))
    assert(keys.sameElements(keys.sorted))
    // at least one doc must carry a lexical rank (the query terms are
    // corpus-frequent words)
    assert(r.exists(x => !x.isNullAt(2)))
    // rrf is exactly the sum of present reciprocal ranks
    r.foreach { x =>
      val v = if (x.isNullAt(1)) 0.0 else 1.0 / (60 + x.getLong(1))
      val l = if (x.isNullAt(2)) 0.0 else 1.0 / (60 + x.getLong(2))
      assert(math.abs(x.getDouble(3) - (v + l)) < 1e-12)
    }
  }

  test("searchDiverse returns k distinct docs in MMR order with metadata attached") {
    val r = graft.operators.SearchApi
      .searchDiverse(spark, Sf, "vector hash join table").collect()
    assert(r.length == 5)
    assert(r.map(_.getLong(1)).distinct.length == 5)
    assert(r.map(_.getLong(0)).toSeq == (1L to 5L))
    // metadata joined: every pick carries its document text
    assert(r.forall(x => x.getString(4).nonEmpty))
  }

  test("corpus filter composes quality, langid and dedup into one keep decision") {
    val rows = TrainingMix.corpusFilter(spark, Sf).collect()
    assert(rows.length === 20)
    val totalDocs = rows.map(_.getLong(1)).sum
    val totalKept = rows.map(_.getLong(2)).sum
    assert(totalDocs === Tables.documents(spark, Sf).count())
    assert(totalKept > 0 && totalKept < totalDocs, s"kept $totalKept of $totalDocs")
    // cross-check one component: no kept count can exceed the number of
    // docs surviving the dedup drop list alone
    val dropped = graft.operators.Dedup.dropDecisions(spark, Sf)
      .select("drop_doc").distinct().count()
    assert(totalKept <= totalDocs - dropped)
    rows.foreach { r =>
      val rate = r.getDouble(4)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - r.getLong(2).toDouble / r.getLong(1)) < 1e-6)
    }
  }

  test("weighted mixing keeps close to the configured fraction per source") {
    val rows = TrainingMix.mixWeighted(spark, Sf).collect()
    assert(rows.length === 20) // one row per source
    rows.foreach { r =>
      val w = r.getDouble(1); val ratio = r.getDouble(4)
      assert(w >= 0.25 && w <= 1.0)
      if (w == 1.0) assert(ratio === 1.0)
      // 25 docs/source at sf0.001 — binomial noise is wide; just bound it
      else assert(math.abs(ratio - w) < 0.35, s"source=${r.getString(0)} w=$w ratio=$ratio")
    }
    // deterministic: a second run yields the identical keep set
    val again = TrainingMix.mixWeighted(spark, Sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
