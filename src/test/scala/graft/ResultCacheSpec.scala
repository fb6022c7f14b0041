package graft

import org.apache.spark.sql.functions._
import graft.sinks.{PkTableSink, ResultCache}

/** D29: version-stamped query result cache — hits never evaluate the
  * query, any source commit silently misses, vacuum removes only
  * stale entries. */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("hit serves stored bytes without evaluating the query; commit misses") {
    val root = fresh("rc") + "/t"
    val cacheDir = fresh("rc-cache")
    PkTableSink.mergeTx(spark, root,
      (0L until 100L).map(i => (i, 1L, i % 7, false)).toDF("id", "ver", "g", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    var evals = 0
    def q = {
      evals += 1
      PkTableSink.readTx(spark, root, spark.emptyDataFrame)
        .groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
    }
    val (r1, hit1) = ResultCache.cached(spark, cacheDir, "byg", Seq(root))(q)
    assert(!hit1 && evals == 1)
    val want = r1.orderBy(col("g")).collect().toSeq
    val (r2, hit2) = ResultCache.cached(spark, cacheDir, "byg", Seq(root))(q)
    assert(hit2 && evals == 1, "a hit must not evaluate the by-name query")
    assert(r2.orderBy(col("g")).collect().toSeq == want)
    // a commit changes the stamp: same tag misses and recomputes
    PkTableSink.mergeTx(spark, root,
      Seq((200L, 1L, 3L, false)).toDF("id", "ver", "g", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val (r3, hit3) = ResultCache.cached(spark, cacheDir, "byg", Seq(root))(q)
    assert(!hit3 && evals == 2)
    assert(r3.where(col("g") === 3).select(col("n")).as[Long].head() ==
      want.find(_.getLong(0) == 3).get.getLong(1) + 1)
  }

  test("multi-table stamp: a commit to EITHER source misses; vacuum drops only stale") {
    val rootA = fresh("rcA") + "/t"
    val rootB = fresh("rcB") + "/t"
    val cacheDir = fresh("rc-cache2")
    def seed(root: String, n: Long) = PkTableSink.mergeTx(spark, root,
      (0L until n).map(i => (i, 1L, false)).toDF("id", "ver", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    seed(rootA, 10); seed(rootB, 20)
    def q = PkTableSink.readTx(spark, rootA, spark.emptyDataFrame)
      .crossJoin(PkTableSink.readTx(spark, rootB, spark.emptyDataFrame)
        .select(count(lit(1)).as("b_rows")))
    val (_, h1) = ResultCache.cached(spark, cacheDir, "join", Seq(rootA, rootB))(q)
    val (_, h2) = ResultCache.cached(spark, cacheDir, "join", Seq(rootA, rootB))(q)
    assert(!h1 && h2)
    seed(rootB, 21) // commit only to B
    val (_, h3) = ResultCache.cached(spark, cacheDir, "join", Seq(rootA, rootB))(q)
    assert(!h3, "a commit to the second source must invalidate")
    // vacuum: the stale first entry goes, the live second stays
    val gone = ResultCache.vacuum(spark, cacheDir, Map("join" -> Seq(rootA, rootB)))
    assert(gone.size == 1 && gone.head.startsWith("join.v"), s"vacuumed $gone")
    val (_, h4) = ResultCache.cached(spark, cacheDir, "join", Seq(rootA, rootB))(q)
    assert(h4, "the live entry must survive vacuum")
  }
}
