package graft

/** Crash-safe /tmp hygiene for the benchmark/gate mains (r15 verdict
  * finding #5): shutdown hooks cannot fire on SIGKILL, so a
  * driver-killed Bench/ScaleGate run leaves its per-query gate temp
  * roots (`mvjf_gate*`, `streambench*`, …) orphaned. Instead of
  * trying to make the hooks survive a kill — impossible — each main
  * SWEEPS stale roots at startup: any directory under
  * `java.io.tmpdir` whose name carries one of the known graft
  * prefixes and whose mtime predates the current run by more than
  * [[StaleMs]] is reaped. The age guard keeps a concurrently-running
  * gate's live directories safe (their mtimes are current); the
  * prefix list keeps everything else in /tmp untouched — notably the
  * ScaleUp replicas (`graft_scale*`) and scaling caches, which are
  * deliberate cross-run caches, not leaks.
  */
object TmpSweep {

  /** Temp roots created by query gates and bench mains — the set that
    * a SIGKILL can orphan. (Test-suite roots use `graft-test`, reaped
    * by the suite's own TestTmp shutdown hook in a clean exit and by
    * this sweep after a killed run.) */
  val Prefixes: Seq[String] = Seq(
    "graft-test", "streambench", "latbench", "txload",
    "mvjf_gate", "mvsf_gate", "mvsi_gate", "mvjr_gate", "mvrw_gate",
    "mvsr_gate", "mvtk_gate", "mvmm_gate", "mvloop_gate",
    "qskmv_gate", "kmvmv_gate", "bmrw_gate", "hybidx", "ivfidx")

  /** A root older than this is presumed orphaned by a dead run. */
  val StaleMs: Long = 30L * 60 * 1000

  /** Sweep `root` (default: the process tmpdir). The root parameter
    * exists for tests — a spec must not run a REAL sweep on the
    * shared /tmp, where it could reap a concurrently-running gate's
    * >30-min-old persisted-index caches. */
  def sweep(root: String =
              sys.props.getOrElse("java.io.tmpdir", "/tmp")): Int = {
    val tmp = new java.io.File(root)
    val cutoff = System.currentTimeMillis() - StaleMs
    val stale = Option(tmp.listFiles()).getOrElse(Array.empty).filter { f =>
      f.isDirectory && Prefixes.exists(f.getName.startsWith) &&
        f.lastModified < cutoff
    }
    stale.foreach { d =>
      try deleteTree(d.toPath)
      catch { case _: java.io.IOException => () } // best-effort
    }
    if (stale.nonEmpty)
      System.err.println(s"[tmpsweep] reaped ${stale.length} stale roots: " +
        stale.map(_.getName).take(8).mkString(", "))
    stale.length
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    val walk = Files.walk(p)
    try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f =>
      Files.deleteIfExists(f))
    finally walk.close()
  }
}
