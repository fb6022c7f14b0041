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

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sfDir = "/root/testdata/sf0.001"
}
