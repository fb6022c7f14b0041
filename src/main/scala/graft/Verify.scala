package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run every (filtered) SparkEntry query against `sfDir`, write each
    * result to `outDir/<name>` parquet plus the oracle map — the body
    * shared by the driver's per-round gate and [[ScaleGate]]'s sf1
    * gate. Returns the names that FAILED to execute. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
           only: Option[Set[String]] = None,
           exclude: Set[String] = Set.empty): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) =>
        only.forall(_.contains(name)) && !exclude.contains(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failed += name
      }
    }
    writeOracleJson(outDir)
    failed.toSeq
  }

  def main(args: Array[String]): Unit = {
    TmpSweep.sweep() // reap roots orphaned by a killed prior run
    // optional 3rd arg: comma-separated query-name filter (local
    // iteration; the driver always runs the full set)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Option.empty[Set[String]])
      case Array(s, o, n) => (s, o, Some(n.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.ready(GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, maxPartitionBytes = "4m").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    dump(spark, sfDir, outDir, only)
    spark.stop()
  }

  private def writeOracleJson(outDir: String): Unit = {
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // bounded-memory overrides for the 10× gate (check.py merges them
    // over oracle_sql.json; the driver's harness ignores the file)
    val scale = SparkEntry.oracleSqlScale
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql_scale.json"), scale)
  }
}
