package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session keeps the
  * suite fast; tests only read/craft tiny frames). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.ready(
      GraftSession.builder(master = "local[2]", shufflePartitions = 2)
        .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** JVM-wide temp-dir factory for specs: every dir is created under ONE
  * session root that a shutdown hook deletes recursively, so a full
  * `sbt test` leaves /tmp clean no matter how an individual test exits
  * (the OpsSpec checkpoint-dir discipline generalized; a per-test
  * `finally` can't cover frames that stay lazily readable until the
  * suite ends, the shutdown hook covers everything at once). */
object TestTmp {
  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-test")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(p)))
    p
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    def sweep(): Unit = {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    // Files.walk's LAZY iteration wraps a mid-walk race (Spark's own
    // shutdown reaper deleting files under the same tree) in
    // UncheckedIOException, which the old IOException catch let
    // escape as a stack trace in the suite's exit output. One retry
    // sweeps what the race left behind; best-effort after that.
    def quiet(f: () => Unit): Boolean =
      try { f(); true } catch {
        case _: java.io.IOException => false
        case _: java.io.UncheckedIOException => false
      }
    if (!quiet(() => sweep())) { quiet(() => sweep()); () }
  }

  /** Drop-in replacement for `Files.createTempDirectory(prefix)`. */
  def dir(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sfDir = "/root/testdata/sf0.001"
}
