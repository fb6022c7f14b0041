package graft

import org.apache.spark.sql.functions._
import graft.sinks.{PkTableSink, ResultCache}

/** D29: version-stamped query result cache — hits never evaluate the
  * query, any source commit silently misses, vacuum removes only
  * stale entries. */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(prefix: String) =
    TestTmp.dir(prefix).toString

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

  test("a commit landing DURING evaluation is never published under the old stamp") {
    val root = fresh("rcMid") + "/t"
    val cacheDir = fresh("rc-cache3")
    PkTableSink.mergeTx(spark, root,
      (0L until 50L).map(i => (i, 1L, false)).toDF("id", "ver", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    // the query COMMITS to its own source as an evaluation side effect
    // (local[n] single JVM: the executor task runs the merge) — the
    // deterministic stand-in for "another writer lands mid-query"
    val committed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def q = {
      val base = PkTableSink.readTx(spark, root, spark.emptyDataFrame)
        .select(col("id")).as[Long].collect() // snapshot BEFORE the commit
      if (committed.compareAndSet(false, true))
        PkTableSink.mergeTx(spark, root,
          Seq((999L, 1L, false)).toDF("id", "ver", "del"),
          Seq("id"), Seq("ver"), "del", writer = "w2")
      base.toSeq.toDF("id")
    }
    val (r1, hit1) = ResultCache.cached(spark, cacheDir, "mid", Seq(root))(q)
    assert(!hit1 && r1.count() == 50, "the evaluated result is served")
    // nothing may be published: neither the old stamp (result computed
    // against it is fine, but the stamp moved before publish — the
    // conservative contract refuses) nor any other visible entry
    val fs = new org.apache.hadoop.fs.Path(cacheDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(cacheDir))
      .map(_.getPath.getName).filter(n => n.startsWith("mid.v")).toSeq
    assert(entries.forall(e =>
        !fs.exists(new org.apache.hadoop.fs.Path(s"$cacheDir/$e/_SUCCESS"))),
      s"stale-stamp entry published: $entries")
    // next call misses (no entry) and, with no mid-flight commit this
    // time, publishes under the NEW stamp; a third call hits it
    val (_, hit2) = ResultCache.cached(spark, cacheDir, "mid", Seq(root))(
      PkTableSink.readTx(spark, root, spark.emptyDataFrame).groupBy().count())
    val (_, hit3) = ResultCache.cached(spark, cacheDir, "mid", Seq(root))(
      PkTableSink.readTx(spark, root, spark.emptyDataFrame).groupBy().count())
    assert(!hit2 && hit3)
    // vacuum clears any orphaned publish-race temp dirs
    ResultCache.vacuum(spark, cacheDir, Map("mid" -> Seq(root)))
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(cacheDir))
      .map(_.getPath.getName).filter(_.startsWith(".tmp_")).toSeq
    assert(leftovers.isEmpty, s"orphaned temp dirs: $leftovers")
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

  test("a CORRUPT entry under a valid _SUCCESS is deleted and republished, not recomputed forever") {
    val root = fresh("rcCor") + "/t"
    val cacheDir = fresh("rc-cache4")
    PkTableSink.mergeTx(spark, root,
      (0L until 30L).map(i => (i, 1L, false)).toDF("id", "ver", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    var evals = 0
    def q = { evals += 1
      PkTableSink.readTx(spark, root, spark.emptyDataFrame).groupBy().count() }
    val (_, h1) = ResultCache.cached(spark, cacheDir, "cor", Seq(root))(q)
    assert(!h1 && evals == 1)
    // corrupt the published entry IN PLACE: overwrite every parquet
    // part with garbage bytes while _SUCCESS stays valid
    val fs = new org.apache.hadoop.fs.Path(cacheDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entry = fs.listStatus(new org.apache.hadoop.fs.Path(cacheDir))
      .map(_.getPath).find(_.getName.startsWith("cor.v")).get
    fs.listStatus(entry).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).foreach { p =>
        val out = fs.create(p, true)
        out.write("not a parquet footer".getBytes("UTF-8")); out.close()
      }
    // read fails -> entry deleted -> recompute -> REPUBLISH good copy
    val (r2, h2) = ResultCache.cached(spark, cacheDir, "cor", Seq(root))(q)
    assert(!h2 && evals == 2 && r2.as[Long].head() == 30L)
    // the republished copy now serves hits again — corruption was
    // repaired, not masked by an eternal per-call recompute
    val (r3, h3) = ResultCache.cached(spark, cacheDir, "cor", Seq(root))(q)
    assert(h3 && evals == 2 && r3.as[Long].head() == 30L)
  }
}
