package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{FilteredAnn, GraphIndex, IvfIndex, Similarity}

/** Metadata-filtered ANN on the persisted indexes (C74): selectivity
  * dispatch, the eligible-only and fill guarantees, exact-leg parity
  * with an independent brute ranking, and the over-fetch fallback. */
class FilteredAnnSpec extends SparkSpec {

  /** Temp index root deleted in finally — tests leave /tmp clean. */
  private def withRoot(sub: String)(body: String => Unit): Unit = {
    val tmp = TestTmp.dir("fann")
    try body(tmp.toString + "/" + sub)
    finally {
      val walk = java.nio.file.Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
  }

  private def emb = Tables.embeddings(spark, sfDir).where(col("vec_id") < 250)

  private def queriesOf(df: DataFrame) =
    df.where(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** Independent filtered ground truth: window-rank brute over the
    * eligible slice (not the TopKBy path the exact leg uses). */
  private def truth(corpus: DataFrame, elig: DataFrame, q: DataFrame,
                    k: Int): DataFrame = {
    val c = corpus.join(elig.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", Similarity.normSq(col("v")))
    val qf = q.select(col("qid"), col("qvec").cast("array<double>").as("qv"))
      .withColumn("qn2", Similarity.normSq(col("qv")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    c.join(broadcast(qf), col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        Similarity.cosineWithNorms(Similarity.dot(col("qv"), col("v")),
          col("qn2"), col("n2")).as("cos"))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"))
  }

  private def pairSet(df: DataFrame) =
    df.select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("graph index: sharp filter takes the exact leg — parity with independent brute, eligible-only") {
   withRoot("g") { root =>
    GraphIndex.build(emb, col("vec_id"), col("embedding"), root)
    val sharp = emb.where(col("label") === 3).select(col("vec_id")) // ~10%
    val q = queriesOf(emb)
    val res = GraphIndex.searchFiltered(spark, root, q, col("qid"),
      col("qvec"), k = 3, sharp, col("vec_id"))
    val want = truth(emb, sharp, q, 3)
    // exact dispatch: identical (qid, rank, nid) triples
    val got3 = res.select(col("qid"), col("rank"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want3 = want.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got3 == want3, "exact leg must equal the filtered brute ranking")
    val eligSet = sharp.as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(res.collect().forall(r => eligSet(r.getAs[Long]("nid"))))
   }
  }

  test("graph index: broad filter routes the full graph — eligible-only, fill guarantee, high recall") {
   withRoot("g") { root =>
    GraphIndex.build(emb, col("vec_id"), col("embedding"), root)
    val broad = emb.where(col("label") < 5).select(col("vec_id")) // ~50%
    val q = queriesOf(emb)
    val k = 3
    val res = GraphIndex.searchFiltered(spark, root, q, col("qid"),
      col("qvec"), k, broad, col("vec_id")).localCheckpoint(true)
    val eligSet = broad.as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(res.collect().forall(r => eligSet(r.getAs[Long]("nid"))),
      "every returned id must satisfy the predicate")
    // fill: each query returns min(k, |elig \ {self}|) rows
    val nElig = eligSet.size
    val byQ = res.collect().groupBy(_.getAs[Long]("qid"))
    q.select(col("qid")).as[Long](spark.implicits.newLongEncoder).collect()
      .foreach { id =>
        val target = math.min(k, nElig - (if (eligSet(id)) 1 else 0))
        assert(byQ.get(id).map(_.length).getOrElse(0) == target,
          s"query $id: fill ${byQ.get(id).map(_.length)} != $target")
      }
    // recall vs the filtered truth
    val hits = pairSet(res).intersect(pairSet(truth(emb, broad, q, k))).size
    val total = pairSet(truth(emb, broad, q, k)).size
    assert(hits.toDouble / total >= 0.9, s"recall $hits/$total below 0.9")
   }
  }

  test("graph index: over-fetch starvation triggers the exact fallback; fill still guaranteed") {
   withRoot("g") { root =>
    GraphIndex.build(emb, col("vec_id"), col("embedding"), root)
    val broad = emb.where(col("label") < 5).select(col("vec_id"))
    val q = queriesOf(emb)
    // k near the over-fetch budget (overFetch=1 → raw top-10 holds
    // ~5 eligible at 50% selectivity) — most queries come up short and
    // must be REPLACED by the exact leg
    val k = 10
    val res = GraphIndex.searchFiltered(spark, root, q, col("qid"),
      col("qvec"), k, broad, col("vec_id"), overFetch = 1)
      .localCheckpoint(true)
    val nElig = broad.count()
    val target = math.min(k.toLong, nElig - 1) // queries may be eligible
    val counts = res.groupBy(col("qid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("n"))
    assert(counts.nonEmpty && counts.forall(n => n == k.toLong || n == target),
      s"fallback must top every query up to its target; got ${counts.toSeq}")
    // fallback rows are EXACT: full agreement with the filtered truth
    val t = truth(emb, broad, q, k)
    // queries that went through fallback return the exact top-k; spot
    // the weakest guarantee — overall recall must now be ~1 because
    // nearly every query fell back
    val hits = pairSet(res).intersect(pairSet(t)).size
    assert(hits.toDouble / pairSet(t).size >= 0.95,
      "fallback-dominated result must be near-exact")
   }
  }

  test("ivf index: pre-filtered in-cell scoring — eligible-only + fill; sharp filter exact") {
   withRoot("ivf") { root =>
    IvfIndex.build(emb, col("vec_id"),
      col("embedding").cast("array<double>"), root)
    val q = queriesOf(emb)
    val broad = emb.where(col("label") < 5).select(col("vec_id"))
    val res = IvfIndex.searchFiltered(spark, root, q, col("qid"),
      col("qvec"), k = 3, broad, col("vec_id"), nprobe = 2)
      .localCheckpoint(true)
    val eligSet = broad.as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(res.collect().forall(r => eligSet(r.getAs[Long]("nid"))))
    val counts = res.groupBy(col("qid")).agg(count(lit(1)).as("n")).collect()
    assert(counts.nonEmpty && counts.forall(_.getAs[Long]("n") == 3L),
      "fill guarantee: k rows per query (eligible set is large)")
    // sharp → exact-leg parity
    val sharp = emb.where(col("label") === 3).select(col("vec_id"))
    val ex = IvfIndex.searchFiltered(spark, root, q, col("qid"),
      col("qvec"), k = 3, sharp, col("vec_id"))
    assert(pairSet(ex) == pairSet(truth(emb, sharp, q, 3)))
   }
  }

  test("empty eligible set returns an empty frame, not an error") {
   withRoot("g") { root =>
    GraphIndex.build(emb, col("vec_id"), col("embedding"), root)
    val none = emb.where(col("label") === 99).select(col("vec_id"))
    val res = GraphIndex.searchFiltered(spark, root, queriesOf(emb),
      col("qid"), col("qvec"), k = 3, none, col("vec_id"))
    assert(res.count() == 0)
   }
  }
}
