package graft

import org.scalatest.funsuite.AnyFunSuite

/** TmpSweep: the crash-safe startup sweep (r15 verdict finding #5) —
  * reaps only KNOWN-prefix roots OLDER than the staleness window, so
  * a concurrently-running gate's live dirs and unrelated content
  * survive. The spec sweeps an ISOLATED root (never the shared /tmp,
  * where a real sweep could reap a concurrently-running gate's
  * >30-min-old persisted-index caches). No Spark needed. */
class TmpSweepSpec extends AnyFunSuite {

  test("stale known-prefix roots are reaped; fresh and foreign dirs survive") {
    val root = java.nio.file.Files.createTempDirectory("sweepspec").toFile
    def mkdir(name: String, ageMs: Long): java.io.File = {
      val d = new java.io.File(root, name)
      assert(d.mkdir(), s"could not create $d")
      // a nested file proves the sweep deletes recursively
      java.nio.file.Files.writeString(d.toPath.resolve("x.txt"), "x")
      assert(d.setLastModified(System.currentTimeMillis() - ageMs))
      d
    }
    val staleGate = mkdir("mvjf_gate_stale", TmpSweep.StaleMs + 60000)
    val staleIdx = mkdir("hybidx_stale", TmpSweep.StaleMs + 60000)
    val freshGate = mkdir("mvsf_gate_fresh", 0)
    val foreign = mkdir("notgraft_stale", TmpSweep.StaleMs + 60000)
    try {
      val n = TmpSweep.sweep(root.toString)
      assert(n == 2, s"expected 2 reaped, got $n")
      assert(!staleGate.exists, "stale gate root must be reaped")
      assert(!staleIdx.exists, "stale index root must be reaped")
      assert(freshGate.exists, "fresh (live) gate root must survive")
      assert(foreign.exists, "non-graft dirs must never be touched")
    } finally {
      Seq(freshGate, foreign).foreach { d =>
        new java.io.File(d, "x.txt").delete(); d.delete()
      }
      root.delete()
    }
  }
}
