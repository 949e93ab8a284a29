package graft

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexMaintenance

/** r14 (ADVICE r13, medium): the cross-process swap lock must not eat
  * live holders. Pins: (1) a held lock is respected (tryWithSwapLock →
  * None); (2) the heartbeat keeps a SLOW fold's lock fresh past
  * staleMs, so it is never presumed dead; (3) a genuinely dead lock
  * (stale mtime, no heartbeat) is broken and taken over; (4) release
  * is token-guarded — a holder that WAS usurped cannot delete the
  * usurper's lock from its `finally`.
  */
class SwapLockSpec extends AnyFunSuite {
  import SparkSuite._

  private def fsFor(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpLock(name: String): Path =
    new Path(Files.createTempDirectory(name).toString, "_lock")

  test("a fresh foreign lock is respected; a stale one is taken over") {
    val lock = tmpLock("graft-lock-stale")
    val fs = fsFor(lock)
    val out = fs.create(lock, false)
    try out.write("someone-else".getBytes("UTF-8")) finally out.close()
    assert(IndexMaintenance.tryWithSwapLock(fs, lock)(42).isEmpty,
      "a freshly-held lock was stolen")
    // age it past staleness: no heartbeat for > staleMs ⇒ presumed dead
    fs.setTimes(lock, System.currentTimeMillis() - 60000, -1)
    assert(IndexMaintenance.tryWithSwapLock(fs, lock, staleMs = 30000)(42)
      === Some(42), "a dead lock was not taken over")
    assert(!fs.exists(lock), "takeover did not release the lock after the body")
  }

  test("the heartbeat keeps a slow fold alive past staleMs") {
    val lock = tmpLock("graft-lock-hb")
    val fs = fsFor(lock)
    val inBody = new CountDownLatch(1)
    val finish = new CountDownLatch(1)
    val holder = new Thread(() => {
      IndexMaintenance.tryWithSwapLock(fs, lock, staleMs = 2500) {
        inBody.countDown()
        finish.await()
      }: Unit
    })
    holder.start()
    inBody.await()
    // wait past staleMs: without heartbeats the prober below would
    // presume the holder dead and break its lock mid-fold
    Thread.sleep(4000)
    assert(IndexMaintenance.tryWithSwapLock(fs, lock, staleMs = 2500)(42).isEmpty,
      "a live slow holder was presumed dead (heartbeat missing)")
    finish.countDown()
    holder.join(10000)
    assert(!fs.exists(lock), "holder did not release its own lock")
  }

  test("release is token-guarded: a usurped holder leaves the usurper's lock alone") {
    val lock = tmpLock("graft-lock-token")
    val fs = fsFor(lock)
    val inBody = new CountDownLatch(1)
    val finish = new CountDownLatch(1)
    val holder = new Thread(() => {
      IndexMaintenance.tryWithSwapLock(fs, lock, staleMs = 600000) {
        inBody.countDown()
        finish.await()
      }: Unit
    })
    holder.start()
    inBody.await()
    // simulate a usurper (a stale-takeover that raced a paused holder):
    // the lock file now carries someone else's token
    fs.delete(lock, false)
    val out = fs.create(lock, false)
    try out.write("usurper-token".getBytes("UTF-8")) finally out.close()
    finish.countDown()
    holder.join(10000)
    assert(fs.exists(lock),
      "the usurped holder deleted the usurper's lock — third maintainer admitted")
    val in = fs.open(lock)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    assert(content === "usurper-token")
  }
}
