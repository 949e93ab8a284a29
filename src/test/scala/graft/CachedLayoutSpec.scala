package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexMaintenance

/** r12: the shared install-once cached-layout core (bandIndexFor /
  * lexIndexFor / residualIndexFor / dropStateFor / ivfIndexFor all ride
  * it). Pins: build runs once per fingerprint; a crashed partial (base
  * present, no `_complete` marker) is cleared and rebuilt rather than
  * served; different fingerprints get different installs.
  */
class CachedLayoutSpec extends AnyFunSuite {
  import SparkSuite._

  private def freshPrefix() =
    s"spec${java.util.UUID.randomUUID().toString.take(8)}"

  test("build runs once; the installed path is reused") {
    val prefix = freshPrefix()
    var builds = 0
    def get() = IndexMaintenance.cachedLayout(spark, prefix, "fp-a") { staging =>
      builds += 1
      val d = new java.io.File(staging); d.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$staging/payload"), "x".getBytes)
    }
    val p1 = get()
    val p2 = get()
    assert(p1 === p2)
    assert(builds === 1)
    assert(new java.io.File(s"$p1/payload").exists())
    assert(new java.io.File(s"$p1/_complete").exists())
  }

  test("a crashed partial install (no marker) is cleared and rebuilt") {
    val prefix = freshPrefix()
    var builds = 0
    def get(fp: String) = IndexMaintenance.cachedLayout(spark, prefix, fp) { staging =>
      builds += 1
      val d = new java.io.File(staging); d.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$staging/payload"), s"b$builds".getBytes)
    }
    val p1 = get("fp-crash")
    // simulate the crash window: marker gone, stale payload left behind
    assert(new java.io.File(s"$p1/_complete").delete())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$p1/stale"), "stale".getBytes)
    val p2 = get("fp-crash")
    assert(p2 === p1)
    assert(builds === 2, "marker-less partial was served instead of rebuilt")
    assert(!new java.io.File(s"$p1/stale").exists(),
      "stale partial contents survived the reinstall")
    assert(new java.io.File(s"$p1/_complete").exists())
  }

  test("fingerprints key separate installs") {
    val prefix = freshPrefix()
    def get(fp: String) = IndexMaintenance.cachedLayout(spark, prefix, fp) { staging =>
      new java.io.File(staging).mkdirs()
    }
    assert(get("fp-1") !== get("fp-2"))
  }
}
