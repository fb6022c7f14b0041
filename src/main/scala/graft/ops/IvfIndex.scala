package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the train / add / search lifecycle (FAISS's
  * public split) as parquet artifacts, so the expensive parts run
  * ONCE per corpus and every search job starts from the stored index:
  *
  * {{{
  *   <root>/centroids/   (cid, cv double[], cn2)   — k-means|| output
  *   <root>/vectors/     (id, v double[], n2, cell) — assigned corpus
  * }}}
  *
  * `build` trains deterministic k-means|| centroids and materializes
  * the one-pass cell assignment; `search` reads both back, probes the
  * query's top-`nprobe` cells and scores exact cosine inside them —
  * no training or assignment cost at query time. The vectors table is
  * REPARTITIONED BY CELL on write, so a probe reads only its cells'
  * files instead of scanning the corpus (partition pruning at 100 TB;
  * `spark.read.parquet(...).where($"cell" === c)` prunes directories).
  *
  * Incremental adds = assign the new batch against the stored
  * centroids and append its partitions; retrain when drift matters
  * (the standard IVF operating procedure).
  */
object IvfIndex {

  /** Train + assign + persist. Returns the number of corpus vectors
    * indexed. */
  def build(df: DataFrame, id: Column, vec: Column, root: String,
            k: Int = 16): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = Similarity.kmeansCentroids(df, id, vec, k)
    cents.map { case (cid, c) => (cid, c.toSeq) }.toDF("cid", "cv")
      .select(col("cid"), col("cv").cast("array<double>").as("cv"))
      .withColumn("cn2", Similarity.normSq(col("cv")))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$root/centroids")
    val v = df.select(id.as("id"), vec.cast("array<double>").as("v"))
      .withColumn("n2", Similarity.normSq(col("v")))
    val assigned = Similarity.assignCells(v, readCentroids(spark, root))
    assigned.write.mode("overwrite").partitionBy("cell").parquet(s"$root/vectors")
    spark.read.parquet(s"$root/vectors").count()
  }

  /** Assign a NEW batch against the stored centroids and append it to
    * the index (no retraining). Returns rows added. */
  def add(df: DataFrame, id: Column, vec: Column, root: String): Long = {
    val spark = df.sparkSession
    val v = df.select(id.as("id"), vec.cast("array<double>").as("v"))
      .withColumn("n2", Similarity.normSq(col("v")))
    val assigned = Similarity.assignCells(v, readCentroids(spark, root))
    assigned.write.mode("append").partitionBy("cell").parquet(s"$root/vectors")
    v.count()
  }

  /** Top-k cosine neighbors from the stored index for a query frame
    * `(qid, qvec)`. Output: (qid, cell, rank, nid, cos). */
  def search(spark: SparkSession, root: String, queries: DataFrame,
             qid: Column, qvec: Column, k: Int, nprobe: Int = 1): DataFrame = {
    val cent = readCentroids(spark, root)
    // partition-column inference types cell=N dirs as INT; restore the
    // LongType the in-memory path emits so both outputs union cleanly
    val assigned = spark.read.parquet(s"$root/vectors")
      .withColumn("cell", col("cell").cast("long"))
    val q = queries.select(qid.as("qid"), qvec.cast("array<double>").as("qv"))
      .withColumn("qn2", Similarity.normSq(col("qv")))
    Similarity.searchAssigned(assigned, cent, q, k, nprobe)
  }

  private def readCentroids(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/centroids")
}
