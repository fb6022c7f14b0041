package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERSION-STAMPED query result cache over TxLog-backed lake tables —
  * the StarRocks query-cache role, made table-format-explicit: a
  * query's materialized result is stored as
  * `<cacheDir>/<tag>.v<stamp>` parquet where the stamp is the ordered
  * tuple of its source tables' CURRENT versions. A hit is only
  * possible when every source table is at exactly the version the
  * entry was computed against — any commit anywhere in the source set
  * changes the stamp and the entry silently misses. Correctness never
  * depends on invalidation messages; the stamp IS the freshness
  * proof (same discipline as [[TableStats]]/[[GlobalDict]]/
  * [[InvertedIndex]]: stale artifacts are unreachable, not wrong).
  *
  * Why it matters at 100 TB: dashboard/report queries re-run
  * verbatim between commits; serving the stored result costs a
  * cache-parquet scan (result-sized) instead of the full query. The
  * query thunk is BY-NAME — on a hit it is never evaluated, so no
  * plan is built and no source scan happens.
  *
  * The result is round-tripped through parquet even on a miss, so
  * hit and miss return byte-identical frames (no fast-path schema
  * drift). [[vacuum]] deletes entries whose stamp no longer matches
  * the sources' current versions; live entries are untouched.
  */
object ResultCache {

  private def fsOf(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stampOf(spark: SparkSession, roots: Seq[String]): String =
    roots.map(r => TxLog.current(spark, r).map(_.version).getOrElse(
      throw new IllegalStateException(s"ResultCache: no committed version under $r")))
      .mkString("_")

  private val TagOk = "^[A-Za-z0-9][A-Za-z0-9_-]*$".r

  /** Serve `tag`'s result for the CURRENT versions of `roots`, or
    * evaluate `query`, store, and serve. Returns (result, wasHit). */
  def cached(spark: SparkSession, cacheDir: String, tag: String,
             roots: Seq[String])(query: => DataFrame): (DataFrame, Boolean) = {
    require(TagOk.matches(tag), s"cache tag '$tag' unusable as a path segment")
    require(roots.nonEmpty, "ResultCache needs at least one source table")
    val dir = s"$cacheDir/$tag.v${stampOf(spark, roots)}"
    val fs = fsOf(spark, cacheDir)
    if (fs.exists(new Path(dir, "_SUCCESS")))
      (spark.read.parquet(dir), true)
    else {
      query.write.mode("overwrite").parquet(dir)
      (spark.read.parquet(dir), false)
    }
  }

  /** Delete entries whose stamp differs from the sources' CURRENT
    * versions (a tag's live entry survives). Returns deleted names.
    * Callers pass the same `roots` per tag as at [[cached]] time;
    * unknown tags are removed wholesale when `dropUnknown`. */
  def vacuum(spark: SparkSession, cacheDir: String,
             tagRoots: Map[String, Seq[String]],
             dropUnknown: Boolean = false): Seq[String] = {
    val fs = fsOf(spark, cacheDir)
    val p = new Path(cacheDir)
    if (!fs.exists(p)) return Nil
    fs.listStatus(p).map(_.getPath.getName).toSeq.flatMap { name =>
      val (tag, stamp) = name.lastIndexOf(".v") match {
        case -1 => (name, "")
        case i  => (name.take(i), name.drop(i + 2))
      }
      tagRoots.get(tag) match {
        case Some(roots) if stamp == stampOf(spark, roots) => None
        case Some(_) => fs.delete(new Path(p, name), true); Some(name)
        case None if dropUnknown => fs.delete(new Path(p, name), true); Some(name)
        case None => None
      }
    }
  }
}
