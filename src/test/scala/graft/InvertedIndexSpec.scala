package graft

import org.apache.spark.sql.functions._
import graft.functions.Rbm
import graft.sinks.{InvertedIndex, PkTableSink}

/** D27: persisted full-text inverted index (StarRocks GIN parity) —
  * bitmap posting lists, version-stamped freshness, exact fallback. */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() =
    TestTmp.dir("invidx").toString + "/t"

  private val docs = Seq(
    (0L, 1L, "Spark shuffles data across the cluster", false),
    (1L, 1L, "Catalyst optimizes the logical plan", false),
    (2L, 1L, "Spark plans joins with Catalyst rules", false),
    (3L, 1L, "bitmap indexes accelerate point lookups", false),
    (4L, 1L, "the cluster runs Spark executors", false)
  ).toDF("id", "ver", "text", "del")

  private def bruteForce(terms: Seq[String], all: Boolean): Set[Long] = {
    val hits = terms.map(t =>
      array_contains(InvertedIndex.tokens(col("text")), t.toLowerCase))
    docs.where(if (all) hits.reduce(_ && _) else hits.reduce(_ || _))
      .select(col("id")).as[Long].collect().toSet
  }

  test("andBm/toIds: container algebra across array, dense and 2^16 boundaries") {
    // bucket 0 dense (2000 ids), bucket 1 sparse; ids straddle 65536
    val a = spark.range(0, 2000).select(col("id"))
      .union(Seq(65536L + 7, 65536L + 9).toDF("id"))
    val b = Seq(1L, 3L, 1999L, 2001L, 65536L + 9, 5L * 65536L).toDF("id")
    val bms = a.agg(Rbm.rbmOf(col("id")).as("ba"))
      .crossJoin(b.agg(Rbm.rbmOf(col("id")).as("bb")))
    val got = bms.select(Rbm.toIds(Rbm.andBm(col("ba"), col("bb"))).as("ids"),
        Rbm.cardinality(Rbm.andBm(col("ba"), col("bb"))).as("n"))
      .as[(Seq[Long], Long)].head()
    assert(got._1 == Seq(1L, 3L, 1999L, 65536L + 9) && got._2 == 4, s"got $got")
    // disjoint bitmaps AND to a bitmap with no buckets at all
    val disjoint = Seq(2001L).toDF("id").agg(Rbm.rbmOf(col("id")).as("bb"))
    val none = a.agg(Rbm.rbmOf(col("id")).as("ba")).crossJoin(disjoint)
      .select(size(map_keys(Rbm.andBm(col("ba"), col("bb")))).as("k"),
        Rbm.toIds(Rbm.andBm(col("ba"), col("bb"))).as("ids"))
      .as[(Int, Seq[Long])].head()
    // bucket 0 survives (both sides occupy it) but carries no ids
    assert(none._2.isEmpty, s"got $none")
  }

  test("index search: ALL and ANY match the exact scan; missing term empties ALL") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, docs, Seq("id"), Seq("ver"), "del", writer = "w")
    InvertedIndex.buildTx(spark, root, "id", "text")
    assert(InvertedIndex.isCurrent(spark, root))
    def search(terms: Seq[String], all: Boolean): Set[Long] =
      InvertedIndex.searchTx(spark, root, docs.drop("del"), "id", "text", terms, all)
        .select(col("id")).as[Long].collect().toSet
    assert(search(Seq("spark"), all = true) == Set(0L, 2L, 4L))
    assert(search(Seq("Spark", "catalyst"), all = true) ==
      bruteForce(Seq("spark", "catalyst"), all = true))            // {2}
    assert(search(Seq("spark", "catalyst"), all = false) ==
      bruteForce(Seq("spark", "catalyst"), all = false))           // {0,1,2,4}
    assert(search(Seq("spark", "zeppelin"), all = true).isEmpty)
    assert(search(Seq("zeppelin", "bitmap"), all = false) == Set(3L))
    // analyzer normalization: punctuation and case fold away
    assert(search(Seq("Spark!"), all = true) == Set(0L, 2L, 4L))
  }

  test("phrase search: in-order adjacency parity vs brute force; chain + fallback unchanged") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, docs, Seq("id"), Seq("ver"), "del", writer = "w")
    InvertedIndex.buildTx(spark, root, "id", "text")
    def phrase(p: String): Set[Long] =
      InvertedIndex.phraseTx(spark, root, docs.drop("del"), "id", "text", p)
        .select(col("id")).as[Long].collect().toSet
    // adjacency in order: docs 0 and 4 share tokens {across?, the,
    // cluster}; "across the" is adjacent only in doc 0, while the
    // MATCH_ALL candidate set for {the, cluster} spans both
    assert(bruteForce(Seq("the", "cluster"), all = true) == Set(0L, 4L))
    assert(phrase("the cluster") == Set(0L, 4L))
    assert(phrase("across the") == Set(0L))
    assert(phrase("cluster runs") == Set(4L))
    // both terms present in doc 4 but not adjacent ⇒ no phrase hit
    assert(phrase("cluster spark") == Set.empty)
    // case/punctuation normalize through the analyzer
    assert(phrase("SPARK, plans!") == Set(2L))
    // terms present but never adjacent ⇒ empty (MATCH_ALL would hit)
    assert(phrase("catalyst spark") == Set.empty)
    // single-token phrase degrades to MATCH on that term
    assert(phrase("spark") == Set(0L, 2L, 4L))
    // phrase longer than any doc ⇒ empty, no descending-sequence crash
    assert(phrase("spark shuffles data across the cluster and beyond today") == Set.empty)
    // chain maintenance: an upsert changes doc 4's phrase; delta chain
    // serves the probe and the stale posting re-verifies away
    PkTableSink.mergeTx(spark, root,
      Seq((4L, 2L, "the cluster idles without Spark", false))
        .toDF("id", "ver", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    InvertedIndex.updateTx(spark, root, "id", "text")
    assert(InvertedIndex.isCurrent(spark, root))
    assert(phrase("the cluster") == Set(0L, 4L))
    assert(phrase("cluster runs") == Set.empty, "stale adjacency must re-verify away")
    // broken chain (commit without updateTx) → exact fallback parity
    PkTableSink.mergeTx(spark, root,
      Seq((5L, 1L, "spark plans nothing here", false)).toDF("id", "ver", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(!InvertedIndex.isCurrent(spark, root))
    assert(phrase("spark plans") == Set(2L, 5L))
  }

  test("posting probe pushes token equality to the scan; no base-table scan in the ids plan") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, docs, Seq("id"), Seq("ver"), "del", writer = "w")
    val v = InvertedIndex.buildTx(spark, root, "id", "text")
    val posts = spark.read.parquet(s"$root/_invidx.v$v")
      .where(col("token") === "spark")
    val plan = posts.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(token,spark)"),
      s"token filter not pushed:\n${plan.take(600)}")
  }

  test("incremental chain: delta postings cover upserts; stale entries re-verified away") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, docs, Seq("id"), Seq("ver"), "del", writer = "w")
    InvertedIndex.buildTx(spark, root, "id", "text")
    def search(terms: Seq[String], all: Boolean = true): Set[Long] =
      InvertedIndex.searchTx(spark, root, docs.drop("del"), "id", "text", terms, all)
        .select(col("id")).as[Long].collect().toSet
    // commit 1: new doc with a brand-new token; update doc 0 so its
    // old token 'shuffles' is STALE in the base postings
    PkTableSink.mergeTx(spark, root,
      Seq((9L, 1L, "zeppelin rides the cluster", false),
          (0L, 2L, "Spark sorts data across the cluster", false))
        .toDF("id", "ver", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(!InvertedIndex.isCurrent(spark, root))
    InvertedIndex.updateTx(spark, root, "id", "text")
    assert(InvertedIndex.isCurrent(spark, root), "chain must reach the new version")
    assert(search(Seq("zeppelin")) == Set(9L), "delta postings must serve new docs")
    assert(search(Seq("shuffles")).isEmpty,
      "stale base posting must be removed by the exact re-verify")
    assert(search(Seq("sorts")) == Set(0L), "updated text must be searchable")
    // commit 2 + second delta: chain of two hops; delete doc 3
    PkTableSink.mergeTx(spark, root,
      Seq((3L, 2L, "bitmap indexes accelerate point lookups", true))
        .toDF("id", "ver", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    InvertedIndex.updateTx(spark, root, "id", "text")
    assert(InvertedIndex.isCurrent(spark, root))
    assert(search(Seq("bitmap")).isEmpty,
      "deleted doc must not surface (semi-join on live base)")
    assert(search(Seq("cluster"), all = true) == Set(0L, 4L, 9L),
      "chain union across base + two deltas")
    // the delta dirs are delta-SIZED, not corpus-sized
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("_invidx.d"))
    assert(names.length == 2, s"expected two delta dirs, got ${names.toSeq}")
    val d1 = spark.read.parquet(s"$root/${names.sorted.head}")
    assert(d1.count() < spark.read.parquet(s"$root/_invidx.v0").count())
  }

  test("sidecar GC keeps the live chain + current stats/dict, deletes the rest") {
    import graft.sinks.{GlobalDict, SidecarGc, TableStats}
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, docs, Seq("id"), Seq("ver"), "del", writer = "w")
    InvertedIndex.buildTx(spark, root, "id", "text")        // _invidx.v0 (stale soon)
    TableStats.analyzeTx(spark, root)                       // _stats.v0 (stale soon)
    GlobalDict.buildTx(spark, root, "text")                 // _dict.text.v0 (stale soon)
    PkTableSink.mergeTx(spark, root,
      Seq((9L, 1L, "fresh spark document", false)).toDF("id", "ver", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    InvertedIndex.updateTx(spark, root, "id", "text")       // chain v0 + d0_1 → LIVE
    TableStats.analyzeTx(spark, root)                       // _stats.v1 live
    val gone = SidecarGc.vacuum(spark, root).sorted
    assert(gone == Seq("_dict.text.v0", "_stats.v0"), s"deleted: $gone")
    // the chain's base is part of the live chain — search still serves
    assert(InvertedIndex.isCurrent(spark, root))
    val (used, n) = InvertedIndex.searchStatsTx(spark, root, docs.drop("del"),
      "id", "text", Seq("spark"))
    assert(used && n == 4)
    assert(TableStats.statsTx(spark, root).isDefined)
    // after a full rebuild the old chain becomes garbage
    InvertedIndex.buildTx(spark, root, "id", "text")        // _invidx.v1
    val gone2 = SidecarGc.vacuum(spark, root).sorted
    assert(gone2 == Seq("_invidx.d0_1", "_invidx.v0"), s"deleted: $gone2")
    assert(InvertedIndex.isCurrent(spark, root))
  }

  test("a commit withdraws the index (exact fallback), rebuild restores it") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, docs, Seq("id"), Seq("ver"), "del", writer = "w")
    InvertedIndex.buildTx(spark, root, "id", "text")
    // new doc mentioning spark arrives WITHOUT a rebuild
    PkTableSink.mergeTx(spark, root,
      Seq((9L, 1L, "fresh spark document", false)).toDF("id", "ver", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    assert(!InvertedIndex.isCurrent(spark, root))
    val (used, n) = InvertedIndex.searchStatsTx(spark, root, docs.drop("del"),
      "id", "text", Seq("spark"))
    assert(!used && n == 4, s"fallback must see the new doc: used=$used n=$n")
    InvertedIndex.buildTx(spark, root, "id", "text")
    val (used2, n2) = InvertedIndex.searchStatsTx(spark, root, docs.drop("del"),
      "id", "text", Seq("spark"))
    assert(used2 && n2 == 4, s"rebuilt index must serve: used=$used2 n=$n2")
  }

  test("rankTx: idf ranking from committed postings matches the brute computation; stale chain throws") {
    val root = freshRoot()
    PkTableSink.mergeTx(spark, root, docs, Seq("id"), Seq("ver"), "del", writer = "w")
    InvertedIndex.buildTx(spark, root, "id", "text")
    val n = docs.count()
    val q = docs.where(col("id") === 0L) // query doc: spark/shuffles/data/across/the/cluster
    val got = InvertedIndex.rankTx(spark, root, q, col("id"), col("text"), n)
      .select(col("qid"), col("id"), col("s"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(r => (-r._3, r._2))
    // brute: per-token idf units over ALL docs, summed per candidate
    val dt = docs.select(col("id"),
        explode(array_distinct(InvertedIndex.tokens(col("text")))).as("t"))
      .as[(Long, String)].collect().toSeq
    val df = dt.groupBy(_._2).map { case (t, xs) => t -> xs.size }.toMap
    def iu(t: String): Long =
      math.floor(math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * 1e4 + 0.5).toLong
    val qToks = dt.filter(_._1 == 0L).map(_._2).toSet
    val want = dt.filter(x => x._1 != 0L && qToks.contains(x._2))
      .groupBy(_._1).map { case (id, xs) => (0L, id, xs.map(x => iu(x._2)).sum) }
      .toSeq.sortBy(r => (-r._3, r._2))
    assert(got == want, s"got $got\nwant $want")
    // the token filter must reach the postings parquet scan (isin →
    // PushedFilters In) — the 100 TB contract: rank cost ∝ the query's
    // postings, never the index
    val plan = InvertedIndex.rankTx(spark, root, q, col("id"), col("text"), n)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(token") ||
      plan.contains("PushedFilters: [IsNotNull(token), In(token"),
      s"token filter not pushed to the postings scan:\n$plan")
    // ranking needs a FRESH chain: a commit past the chain end throws
    PkTableSink.mergeTx(spark, root,
      Seq((9L, 2L, "new spark doc", false)).toDF("id", "ver", "text", "del"),
      Seq("id"), Seq("ver"), "del", writer = "w")
    val e = intercept[IllegalStateException] {
      InvertedIndex.rankTx(spark, root, q, col("id"), col("text"), n + 1)
    }
    assert(e.getMessage.contains("stale"), e.getMessage)
    // updateTx heals the chain and the new doc ranks (shares "spark")
    InvertedIndex.updateTx(spark, root, "id", "text")
    val healed = InvertedIndex.rankTx(spark, root, q, col("id"), col("text"), n + 1)
      .select(col("id")).as[Long].collect().toSet
    assert(healed.contains(9L), s"new doc must rank after updateTx: $healed")
  }
}
