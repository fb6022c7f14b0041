package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for asymptotic benchmarking: writes
  * an N× replica of a testdata dir in which per-replica semantics are
  * EXACTLY the base corpus's, so the ground-truth cost curve of every
  * operator is linear in the replica count and a measured exponent
  * above ~1 is the operator's own superlinearity, not an artifact of
  * the data transform.
  *
  * Construction (replica 0 is the identity — the base corpus is a
  * subset of the scaled one):
  *  - fact keys shift by `replica × 10^9`: key joins stay within a
  *    replica, `id % k` predicate densities are unchanged;
  *  - dimension tables (region/nation/supplier/part) are shared, as
  *    dimensions are at real scale-ups;
  *  - document text gets every TOKEN prefixed with a replica tag:
  *    token/shingle multisets of different replicas are fully
  *    disjoint, so dedup/decontamination pair structure is exactly
  *    `N ×` the base corpus's (naive row duplication instead turns
  *    each duplicate group quadratic: N replicas of one text are
  *    N(N−1)/2 spurious cross-pairs);
  *  - embeddings are multiplied by a per-replica deterministic ±1
  *    sign vector — an ORTHOGONAL transform, so all within-replica
  *    dot products and cosines are bit-identical to the base while
  *    cross-replica similarity decorrelates (no spurious near-dup
  *    pairs between replicas of one vector).
  */
object ScaleUp {

  private val KeyOffset = 1000000000L

  private def shift(df: DataFrame, r: Int, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * KeyOffset)))

  /** ±1 per (replica, dim), md5-derived; replica 0 is all +1. */
  private def signs(r: Int, dim: Int): Seq[Float] =
    if (r == 0) Seq.fill(dim)(1.0f)
    else (0 until dim).map { d =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-scale:$r:$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0f else -1.0f
    }

  private def replica(spark: SparkSession, src: String, table: String, r: Int): DataFrame = {
    val df = spark.read.parquet(s"$src/$table.parquet")
    table match {
      case "customer" => shift(df, r, "c_custkey")
      case "orders"   => shift(df, r, "o_orderkey", "o_custkey")
      case "lineitem" => shift(df, r, "l_orderkey")
      case "events"   => shift(df, r, "event_id", "user_id")
      case "documents" =>
        val tagged =
          if (r == 0) df
          else df.withColumn("text",
            array_join(transform(split(col("text"), " "),
              t => concat(lit(s"g${r}x"), t)), " "))
            .withColumn("n_chars", length(col("text")).cast("long"))
        shift(tagged, r, "doc_id")
      case "embeddings" =>
        val flipped =
          if (r == 0) df
          else {
            val s = typedLit(signs(r, 64))
            df.withColumn("embedding",
              zip_with(col("embedding"), s, (x, sg) => x * sg).cast("array<float>"))
          }
        shift(flipped, r, "vec_id")
      case _ => df // shared dimensions
    }
  }

  /** Fingerprint of a corpus dir: (name, size, mtime) of every
    * top-level parquet entry, order-stable. A replica marker carries
    * the BASE corpus's fingerprint so a regenerated/replaced testdata
    * dir, or a replica half-written by a killed run (no marker at
    * all), can never be silently measured against (r16 verdict #3:
    * the two same-HEAD scaling artifacts disagreed 29-37× and one
    * showed physically-impossible sub-base 10× times — a stale or
    * corrupt replica is the only construction that produces that). */
  def fingerprint(dir: String): String = {
    val d = new java.io.File(dir)
    val entries = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map { f =>
        // a parquet "file" here is usually a Spark-written DIRECTORY;
        // its own mtime moves on any rewrite, and for raw testdata
        // single files size+mtime pin the content
        s"${f.getName}:${f.length}:${f.lastModified}"
      }
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def marker(src: String, replicas: Int): String =
    s"replicas=$replicas src=${fingerprint(src)}"

  /** Write the scaled corpus (no-op when `dst` already holds one
    * built from THIS base corpus at THIS replica count). */
  def ensure(spark: SparkSession, src: String, dst: String, replicas: Int): Unit = {
    require(replicas >= 1, "replicas must be >= 1")
    val done = new java.io.File(s"$dst/_SCALED_OK")
    // reuse only a corpus built at the SAME replica count FROM the
    // SAME base corpus — a marker from a different scale or a
    // regenerated testdata would silently gate against wrong data
    if (done.exists() &&
      java.nio.file.Files.readString(done.toPath).trim == marker(src, replicas))
      return
    if (done.exists()) done.delete() // invalid marker: rebuild from scratch
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      val out =
        if (Seq("region", "nation", "supplier", "part").contains(t))
          replica(spark, src, t, 0)
        else (0 until replicas).map(r => replica(spark, src, t, r))
          .reduce(_ unionByName _)
      out.write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
    }
    done.getParentFile.mkdirs()
    java.nio.file.Files.writeString(done.toPath, marker(src, replicas) + "\n")
  }

  /** The marker string of a previously-ensured replica at `dst`, for
    * cache-key composition (empty when absent/invalid). */
  def markerOf(dst: String): String = {
    val done = new java.io.File(s"$dst/_SCALED_OK")
    if (!done.exists()) ""
    else try java.nio.file.Files.readString(done.toPath).trim
    catch { case _: java.io.IOException => "" }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcDir> <dstDir> [replicas=10]")
    val replicas = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.builder(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure(spark, args(0), args(1), replicas)
    spark.stop()
  }
}
