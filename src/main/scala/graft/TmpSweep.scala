package graft

/** Crash-safe /tmp hygiene for the benchmark/gate mains (r15 verdict
  * finding #5): shutdown hooks cannot fire on SIGKILL, so a
  * driver-killed Bench/ScaleGate run leaves its per-query gate temp
  * roots (`mvjf_gate*`, `streambench*`, …) orphaned. Instead of
  * trying to make the hooks survive a kill — impossible — each main
  * SWEEPS stale roots at startup: any directory under
  * `java.io.tmpdir` whose name carries one of the known graft
  * prefixes and whose mtime predates the current run by more than
  * [[StaleMs]] is reaped. Liveness (r16 ADVICE): mtime alone
  * overstates it — a directory that is only being READ keeps its
  * creation mtime, so a >30-min run's live index roots could be
  * reaped by a concurrent main's startup sweep. Roots created
  * through [[gateTempDir]] therefore carry an `_OWNER` pidfile and
  * the sweep SKIPS any root whose owning pid is still alive,
  * whatever its mtime. The prefix list keeps everything else in /tmp
  * untouched — notably the ScaleUp replicas (`graft_scale*`) and
  * scaling caches, which are deliberate cross-run caches, not leaks.
  */
object TmpSweep {

  /** Temp roots created by query gates and bench mains — the set that
    * a SIGKILL can orphan. This list is the single source of truth:
    * gate code MUST allocate its roots via [[gateTempDir]], which
    * refuses a prefix not listed here — so a new gate cannot drift
    * out of the sweep's sight (the r16 ADVICE found `mvjm_gate`
    * missing for exactly that reason). (Test-suite roots use
    * `graft-test`, reaped by the suite's own TestTmp shutdown hook in
    * a clean exit and by this sweep after a killed run.) */
  val Prefixes: Seq[String] = Seq(
    "graft-test", "streambench", "latbench", "txload",
    "mvjf_gate", "mvsf_gate", "mvsi_gate", "mvjr_gate", "mvrw_gate",
    "mvsr_gate", "mvtk_gate", "mvmm_gate", "mvloop_gate", "mvjm_gate",
    "mvjtk_gate", "snapchunk_gate",
    "qskmv_gate", "kmvmv_gate", "bmrw_gate", "hybidx", "ivfidx")

  /** Orphanable plain FILES (not directories): the Bench io probe's
    * scratch file — a SIGKILL mid-probe leaves it, and the directory
    * sweep never saw it (r16 ADVICE). */
  val FilePrefixes: Seq[String] = Seq("graft_ioprobe")

  /** A root older than this is presumed orphaned by a dead run. */
  val StaleMs: Long = 30L * 60 * 1000

  private val OwnerFile = "_OWNER"

  /** Create a gate/bench temp root under the process tmpdir. The
    * prefix MUST be in [[Prefixes]] (loud failure otherwise — that is
    * the drift guard), and the root gets an `_OWNER` pidfile so a
    * concurrent main's sweep can tell a live >30-min run from a
    * SIGKILL orphan. */
  def gateTempDir(prefix: String): java.nio.file.Path = {
    require(Prefixes.contains(prefix),
      s"temp prefix '$prefix' is not in TmpSweep.Prefixes - add it there " +
        "first so a killed run's root is reapable")
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    try java.nio.file.Files.writeString(dir.resolve(OwnerFile),
      ProcessHandle.current().pid().toString)
    catch { case _: java.io.IOException => () } // best-effort liveness
    dir
  }

  private def ownerAlive(dir: java.io.File): Boolean = {
    val f = new java.io.File(dir, OwnerFile)
    if (!f.isFile) false
    else try {
      val pid = java.nio.file.Files.readString(f.toPath).trim.toLong
      val h = ProcessHandle.of(pid)
      h.isPresent && h.get.isAlive
    } catch { case _: Throwable => false }
  }

  /** Sweep `root` (default: the process tmpdir). The root parameter
    * exists for tests — a spec must not run a REAL sweep on the
    * shared /tmp, where it could reap a concurrently-running gate's
    * >30-min-old persisted-index caches. */
  def sweep(root: String =
              sys.props.getOrElse("java.io.tmpdir", "/tmp")): Int = {
    val tmp = new java.io.File(root)
    val cutoff = System.currentTimeMillis() - StaleMs
    val all = Option(tmp.listFiles()).getOrElse(Array.empty)
    val stale = all.filter { f =>
      f.isDirectory && Prefixes.exists(f.getName.startsWith) &&
        f.lastModified < cutoff && !ownerAlive(f)
    }
    stale.foreach { d =>
      try deleteTree(d.toPath)
      catch { case _: java.io.IOException => () } // best-effort
    }
    val staleFiles = all.filter { f =>
      f.isFile && FilePrefixes.exists(f.getName.startsWith) &&
        f.lastModified < cutoff
    }
    staleFiles.foreach(f => { f.delete(); () })
    if (stale.nonEmpty || staleFiles.nonEmpty)
      System.err.println(s"[tmpsweep] reaped ${stale.length} stale roots, " +
        s"${staleFiles.length} stale files: " +
        (stale ++ staleFiles).map(_.getName).take(8).mkString(", "))
    stale.length + staleFiles.length
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
