package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, DedupGroups, DedupIndex}

/** r12 (r11 verdict #7): the incremental drop ledger served from the
  * maintained [[DedupGroups]] table. Pins (a) the incrementally-built
  * ledger (known slice seeded offline + one ingest fold) equals the
  * batch group rule on the grown corpus — components over ALL verified
  * pairs at the drop threshold, drop every non-min member — and (b)
  * re-delivering the ingest batch's pairs leaves the ledger unchanged
  * (exactly-once without a log, the DedupGroupsSpec pattern).
  */
class DropIncrementalSpec extends AnyFunSuite {
  import SparkSuite._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def docs: DataFrame =
    Tables.fanOut(Tables.documents(spark, Sf)).select(col("doc_id"), col("text"))

  private def ledgerOf(state: String): Seq[(Long, Long)] =
    DedupGroups.groupsDf(spark, state)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"), col("component"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("incremental drop ledger == batch group rule on the grown corpus; re-delivery is a no-op") {
    val base = docs.filter(pmod(col("doc_id"), lit(3)) =!= 2)
    val incoming = docs.filter(pmod(col("doc_id"), lit(3)) === 2)

    // offline: band index + groups seeded from the known slice's own pairs
    val idx = tmp("graft-dropinc-idx")
    DedupIndex.writeBandIndex(base, idx)
    val state = tmp("graft-dropinc-state")
    DedupGroups.initGroups(spark, state,
      DedupIndex.indexedNearDups(spark, idx, base, DedupIndex.DropThreshold)
        .select(col("doc_a"), col("doc_b")))

    // one ingest: fold the incoming slice's verified pairs
    val pairs = DedupIndex.newNearDups(spark, idx, incoming, base,
        DedupIndex.DropThreshold)
      .select(col("doc_a"), col("doc_b"))
    DedupGroups.foldPairs(spark, state, pairs)
    val got = ledgerOf(state)

    // batch reference: every verified pair of the grown corpus at the
    // same threshold, components, drop all non-min members
    val idxAll = tmp("graft-dropinc-all")
    DedupIndex.writeBandIndex(docs, idxAll)
    val want = Dedup.componentsOfPairs(
        DedupIndex.indexedNearDups(spark, idxAll, docs, DedupIndex.DropThreshold)
          .select(col("doc_a"), col("doc_b")))
      .filter(col("doc_id") =!= col("component"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

    assert(got === want)
    assert(got.nonEmpty, "no drops at the threshold — spec is vacuous")
    // the fold actually contributed: some dropped doc is from the
    // incoming slice (otherwise the ingest leg went untested)
    assert(got.exists { case (d, _) => d % 3 == 2 },
      "no incoming doc in the ledger — the fold leg is vacuous")

    // exactly-once: re-delivering the batch leaves the ledger unchanged
    DedupGroups.foldPairs(spark, state, pairs)
    assert(ledgerOf(state) === got)
  }
}
