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

  test("live-owner pidfile protects a stale-mtime root; dead owner does not") {
    val root = java.nio.file.Files.createTempDirectory("sweepspec").toFile
    def mk(name: String, pid: String): java.io.File = {
      val d = new java.io.File(root, name)
      assert(d.mkdir())
      java.nio.file.Files.writeString(d.toPath.resolve("_OWNER"), pid)
      assert(d.setLastModified(System.currentTimeMillis() - TmpSweep.StaleMs - 60000))
      d
    }
    // our own pid is alive by definition; pid 2^22 exceeds the default
    // Linux pid_max so it can never name a live process
    val live = mk("hybidx_live", ProcessHandle.current().pid().toString)
    val dead = mk("hybidx_dead", (1L << 22).toString)
    try {
      TmpSweep.sweep(root.toString)
      assert(live.exists, "a >30-min root whose owning pid is ALIVE must survive " +
        "(it may be a long run's persisted index, only being read)")
      assert(!dead.exists, "a stale root with a dead owner is an orphan")
    } finally {
      new java.io.File(live, "_OWNER").delete(); live.delete(); root.delete()
    }
  }

  test("stale io-probe FILES are reaped; gateTempDir registers + refuses") {
    val root = java.nio.file.Files.createTempDirectory("sweepspec").toFile
    val probe = new java.io.File(root, "graft_ioprobe123.bin")
    java.nio.file.Files.writeString(probe.toPath, "x")
    assert(probe.setLastModified(System.currentTimeMillis() - TmpSweep.StaleMs - 60000))
    try {
      TmpSweep.sweep(root.toString)
      assert(!probe.exists, "a SIGKILL-orphaned probe file must be reaped")
    } finally { probe.delete(); root.delete() }
    // gateTempDir: known prefix → dir with _OWNER carrying our pid
    val d = TmpSweep.gateTempDir("mvjm_gate")
    try {
      val owner = java.nio.file.Files.readString(d.resolve("_OWNER")).trim
      assert(owner == ProcessHandle.current().pid().toString)
    } finally {
      java.nio.file.Files.deleteIfExists(d.resolve("_OWNER"))
      java.nio.file.Files.deleteIfExists(d)
    }
    // unknown prefix → loud failure (the drift guard: a new gate must
    // add its prefix to Prefixes or it cannot allocate a root at all)
    intercept[IllegalArgumentException] { TmpSweep.gateTempDir("rogue_gate") }
  }
}
