package graft.plans

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for shared-scan caches.
  *
  * Several query-shaped entry points persist an intermediate frame so
  * two downstream traversals share one corpus shuffle (userOverlap's
  * per-user type sets, pmi/jsDivergence/vocabOverlap's vocab tables,
  * heaps' bucket curve). Those functions return a LAZY DataFrame — the
  * action that consumes the cache happens in the caller — so there is
  * no in-function "last action" to unpersist after, and a full-surface
  * run (Bench drives 148 queries through one session) would otherwise
  * accumulate cached blocks for the whole session lifetime.
  *
  * [[shared]] bounds that accumulation: each call persists the frame
  * and enrolls it in a small FIFO; once more than [[cap]] shared scans
  * are live, the oldest is unpersisted (non-blocking). Eviction is
  * always safe — an evicted frame that is still referenced simply
  * recomputes from lineage — so the policy trades at most one extra
  * recompute for a hard ceiling on cached-block residency. The cap is
  * deliberately small: a shared scan only needs to survive the few
  * actions its own query runs immediately after building the plan.
  */
object ScanShare {
  private val live = new ConcurrentLinkedQueue[DataFrame]()

  /** Max simultaneously-cached shared scans per JVM. */
  val cap: Int = 4

  /** Persist `df` (MEMORY_AND_DISK) and enroll it for bounded-lifetime
    * eviction. Use via `.transform(ScanShare.shared)` in place of a
    * bare `.persist(...)` whose unpersist point is outside the
    * function.
    */
  def shared(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    live.add(p)
    while (live.size > cap) {
      val old = live.poll()
      if (old ne null) old.unpersist(false)
    }
    p
  }

  /** Release every enrolled cache now (used by specs). */
  def drain(): Unit = {
    var old = live.poll()
    while (old ne null) { old.unpersist(false); old = live.poll() }
  }

  /** Number of currently-enrolled shared scans (used by specs). */
  def liveCount: Int = live.size
}
