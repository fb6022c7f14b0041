package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{GraphIndex, Similarity}

/** Maximal-Marginal-Relevance rerank (C78): the greedy's diversity
  * semantics on a designed pool, and the production composition — the
  * pool drawn from the PERSISTED graph index, the unrolled declarative
  * rerank pinned against an independent driver-side greedy replay. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("mmr prefers a diverse result over a redundant near-duplicate") {
    // q=(1,0); A and B are EXACT duplicates at cos 1.0, C is the
    // diverse neighbor at cos 0.8. Plain top-3 orders A,B,C; with
    // λ=0.4 the redundancy penalty must demote B below C.
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),  // the query
      (1L, Array(1.0f, 0.0f)),  // A
      (2L, Array(1.0f, 0.0f)),  // B — duplicate of A
      (3L, Array(0.8f, 0.6f))   // C — diverse
    ).toDF("id", "vec")
    val got = Similarity.mmrTopkBrute(df, col("id"), col("vec"),
        isQuery = _ === 0, pool = 3, m = 3, lambda = 0.4)
      .select(col("rank"), col("nid")).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 3L, 3L -> 2L)) // A, C, B
  }

  test("mmr over the persisted graph-index pool matches a driver-side greedy replay") {
    val root = TestTmp.dir("mmridx").toString + "/idx"
    val emb = Tables.embeddings(spark, sfDir).where(col("vec_id") < 300)
    GraphIndex.build(emb, col("vec_id"), col("embedding"), root)

    // production shape: recall stage = the committed index (cost
    // ∝ queries·beam, never a corpus scan), rerank stage = MMR over
    // that pool with vectors re-attached from the lake
    val queries = emb.where(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val pool = GraphIndex.search(spark, root, queries,
        col("qid"), col("qvec"), k = 10)
      .select(col("qid"), col("nid"))
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", Similarity.normSq(col("v")))
    val q = queries.select(col("qid"),
        col("qvec").cast("array<double>").as("qv"))
      .withColumn("qn2", Similarity.normSq(col("qv")))
    val cand = pool
      .join(vecs.withColumnRenamed("vec_id", "nid"), Seq("nid"))
      .join(q, Seq("qid"))
      .select(col("qid"), col("nid"), col("v"), col("n2"),
        Similarity.cosineWithNorms(Similarity.dot(col("qv"), col("v")),
          col("qn2"), col("n2")).as("cos"))
    val lambda = 0.7
    val got = Similarity.mmrRerank(cand, m = 3, lambda = lambda)
      .select(col("qid"), col("rank"), col("nid"), col("mmr"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (qid, r, nid, s) => (qid, r) -> ((nid, s)) }.toMap

    // independent replay: collect the pool and run the greedy in
    // plain Scala — same left-to-right dots, same λ·c − (1−λ)·pen
    // doubles, same nid tie-break; selection AND scores must agree
    val rows = cand.select(col("qid"), col("nid"), col("v"), col("cos"))
      .as[(Long, Long, Seq[Double], Double)].collect()
    def dotL(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cosL(a: Seq[Double], b: Seq[Double]): Double =
      dotL(a, b) / math.sqrt(dotL(a, a) * dotL(b, b))
    val mu = 1.0 - lambda
    val want = rows.groupBy(_._1).flatMap { case (qid, pool) =>
      var selected = List.empty[(Long, Seq[Double])]
      (1 to 3).flatMap { rank =>
        val rem = pool.filter(p => !selected.exists(_._1 == p._2))
        if (rem.isEmpty) None else {
          val scored = rem.map { case (_, nid, v, c) =>
            val pen = if (selected.isEmpty) 0.0
                      else selected.map(s => cosL(v, s._2)).max
            (nid, v, lambda * c - (if (selected.isEmpty) 0.0 else mu * pen))
          }
          val best = scored.minBy { case (nid, _, s) => (-s, nid) }
          selected = (best._1, best._2) :: selected
          Some((qid, rank.toLong) -> ((best._1, best._3)))
        }
      }
    }.toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    // the operator exports mmr through Rounding.r(_, 4) — apply the
    // same floor-form rounding to the replay's raw score
    def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    want.foreach { case (k, (nid, s)) =>
      assert(got(k)._1 == nid, s"$k: picked ${got(k)._1}, replay says $nid")
      assert(got(k)._2 == r4(s))
    }
  }
}
