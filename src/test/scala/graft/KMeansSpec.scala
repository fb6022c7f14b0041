package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** k-means|| seeding: determinism, shape, and clustering quality vs
  * the corpus-row-stand-in centroids. */
class KMeansSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)

  private def cost(centers: Seq[(Long, Array[Double])]): Double = {
    // mean squared distance to the nearest center over the corpus
    val cents = centers.map(_._2)
    val d2 = cents.map { c =>
      val cn2 = c.map(x => x * x).sum
      col("n2") + lit(cn2) - lit(2.0) *
        call_function("double_dot", col("v"), typedLit(c.toSeq))
    }.reduce(least(_, _))
    emb.select(col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", call_function("double_dot", col("v"), col("v")))
      .agg(avg(d2)).collect()(0).getDouble(0)
  }

  test("kmeans|| centroids are deterministic across runs") {
    val a = Similarity.kmeansCentroids(emb, col("vec_id"), col("embedding"), k = 8)
    val b = Similarity.kmeansCentroids(emb, col("vec_id"), col("embedding"), k = 8)
    assert(a.map(_._1) == b.map(_._1))
    assert(a.zip(b).forall { case ((_, x), (_, y)) => x.sameElements(y) })
  }

  test("returns k finite centroids of corpus dimensionality") {
    val c = Similarity.kmeansCentroids(emb, col("vec_id"), col("embedding"), k = 8)
    assert(c.size == 8)
    assert(c.forall(_._2.length == 64))
    assert(c.forall(_._2.forall(x => !x.isNaN && !x.isInfinite)))
  }

  test("kmeans|| centroids beat corpus-row stand-ins on clustering cost") {
    val trained = Similarity.kmeansCentroids(emb, col("vec_id"), col("embedding"), k = 16)
    val standIns = emb.where(col("vec_id") % 25 === 0)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val (ct, cs) = (cost(trained), cost(standIns))
    assert(ct < cs, s"kmeans cost $ct not below stand-in cost $cs")
  }

  test("ann_ivf_kmeans query returns ranked neighbors for every query point") {
    val df = SparkEntry.queries("ann_ivf_kmeans")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // per-query ranks are 1..n with n <= 3 and cosines non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq)
      val coss = sorted.map(_.getDouble(4)).toSeq
      assert(coss == coss.sorted.reverse)
      assert(sorted.length <= 3)
    }
  }
}
