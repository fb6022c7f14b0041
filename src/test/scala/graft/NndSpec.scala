package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Graph-ANN (NN-descent + beam walk) quality pins:
  *
  *  - task-local walk ≡ BSP hop loop, bit-for-bit (rank AND rounded
  *    cosine), on the same corpus/graph/queries — the fast path may
  *    never drift from the scale path;
  *  - recall floor vs brute force (the KMeansSpec discipline:
  *    int8 ≥ 0.9, pq ≥ 0.6 — the graph walk pins ≥ 0.9 on top-3 SET
  *    recall), so a graph-quality regression fails a test instead of
  *    silently changing a green audit number.
  */
class NndSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)

  test("task-local walk is bit-identical to the BSP hop loop") {
    val v = emb.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", Similarity.normSq(col("v")))
    val g = Similarity.nndSearchGraph(emb, col("vec_id"), col("embedding"))
    val q = v.where(col("id") % 10 === 0)
      .select(col("id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val local = asSet(Similarity.nndBeamSearch(v, g, q, k = 3))
    val bsp = asSet(Similarity.nndBeamSearch(v, g, q, k = 3,
      localMaxNodes = 0))
    assert(local.nonEmpty && local == bsp,
      s"local/BSP drift: only-local=${local -- bsp}, only-bsp=${bsp -- local}")
  }

  test("beam-walk top-3 set recall >= 0.9 vs brute force") {
    def asSets(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("nid")).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = asSets(Similarity.topkBruteForce(emb, col("vec_id"),
      col("embedding"), isQuery = _ % 10 === 0, k = 3))
    val got = asSets(Similarity.nnDescentTopk(emb, col("vec_id"),
      col("embedding"), isQuery = _ % 10 === 0, k = 3))
    assert(got.keySet == exact.keySet)
    val hits = exact.map { case (q, t) => (got(q) & t).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    assert(recall >= 0.9, s"nnd top-3 set recall $recall below 0.9")
  }
}
