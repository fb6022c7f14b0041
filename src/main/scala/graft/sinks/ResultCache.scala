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
    val stamp = stampOf(spark, roots)
    val dir = s"$cacheDir/$tag.v$stamp"
    val fs = fsOf(spark, cacheDir)
    // the hit-path read can transiently fail if a racing publisher's
    // crashed-remnant cleanup unlinks the dir between our _SUCCESS
    // check and the read — treat PATH-MISSING as a miss (evaluate
    // below). Any OTHER failure under a present _SUCCESS is a CORRUPT
    // entry (bad footer, truncated file): swallowing it as a miss
    // would recompute every call and never republish (the publish
    // path sees the corrupt winner's _SUCCESS and yields), masking
    // the corruption forever — delete the entry so the recompute
    // below republishes a good copy.
    val hit =
      if (!fs.exists(new Path(dir, "_SUCCESS"))) None
      else try Some(spark.read.parquet(dir))
      catch {
        case _: java.io.FileNotFoundException => None
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null &&
              (e.getMessage.contains("PATH_NOT_FOUND") ||
                e.getMessage.contains("Path does not exist")) => None
        case scala.util.control.NonFatal(_) =>
          fs.delete(new Path(dir), true)
          None
      }
    if (hit.isDefined)
      (hit.get, true)
    else {
      // Two races guarded here:
      //  1. stamp-then-evaluate: a commit landing DURING evaluation
      //     would store a result computed against newer versions under
      //     the older stamp. Re-read the versions after evaluating and
      //     only persist when they still equal the stamp — otherwise
      //     serve the (correct, fresher) result uncached.
      //  2. concurrent writers: mode=overwrite into the final path lets
      //     a reader that just saw _SUCCESS race a mid-overwrite
      //     rewrite. Write to a tag-private temp dir and RENAME into
      //     place — rename is atomic on HDFS-like stores, and a loser
      //     of the rename race just discards its temp copy.
      val tmp = s"$cacheDir/.tmp_${tag}_${java.util.UUID.randomUUID()}"
      query.write.mode("overwrite").parquet(tmp)
      val stillCurrent = stampOf(spark, roots) == stamp
      val published = stillCurrent && {
        if (fs.exists(new Path(dir, "_SUCCESS"))) {
          // lost the publish race — the winner's copy serves; our
          // temp copy is garbage NOW, not at the next vacuum
          fs.delete(new Path(tmp), true)
          true
        } else {
          // Hadoop rename into an EXISTING directory moves the source
          // INSIDE it (and "succeeds") — a dir without _SUCCESS is a
          // crashed publish remnant and must be cleared, or every
          // later hit-check would see a dir holding only .tmp_* junk.
          // Re-check _SUCCESS IMMEDIATELY before the delete: a winner
          // whose rename landed between the check above and here must
          // keep its just-published copy (we then take the lost-race
          // branch's semantics: serve the winner, drop our temp).
          if (fs.exists(new Path(dir))) {
            if (fs.exists(new Path(dir, "_SUCCESS"))) {
              fs.delete(new Path(tmp), true)
              true
            } else {
              fs.delete(new Path(dir), true)
              fs.rename(new Path(tmp), new Path(dir))
            }
          } else fs.rename(new Path(tmp), new Path(dir))
        }
      }
      if (published) {
        (spark.read.parquet(dir), false)
      } else {
        // stale stamp or lost the publish race: serve the temp result
        // this evaluation produced, then drop the directory. The frame
        // is materialized (collect-free: read it back before delete
        // would lazily re-scan, so localCheckpoint-shaped copy is
        // overkill here — instead keep the temp dir and register it
        // for deletion on JVM exit; result-sized, vacuumed next run).
        fs.deleteOnExit(new Path(tmp))
        (spark.read.parquet(tmp), false)
      }
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
      // orphaned publish-race temp dirs are always garbage
      if (name.startsWith(".tmp_")) {
        fs.delete(new Path(p, name), true); Some(name)
      } else {
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
}
