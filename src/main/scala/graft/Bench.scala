package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line {"metric":…,"queries":{…}}. A query that
  * throws logs to stderr and reports -1 so a regression is visible in
  * the output rather than silently averaged away.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, maxPartitionBytes = "4m").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // execute the physical plan directly: forces the COMPLETE plan
    // including any final orderBy (a bare .count() plants a logical
    // Aggregate on top, and EliminateSorts then drops the output sort,
    // under-measuring queries whose contract includes it)
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.count()
    // Steady-state measurement: one full untimed pass first (JIT/codegen
    // compilation, parquet footer + file-listing caches, shuffle service
    // spin-up all land here), then the timed pass measures the engine.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try exec(fn(spark, sfDir))
      catch { case _: Throwable => () }
    }
    // two timed runs, keep the min — GC pauses in a shared JVM add
    // multi-second outliers to single observations
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { exec(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0
        }
      }
      name -> (if (times.forall(_ >= 0)) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // end-to-end streaming CDC rate, measured per round (not
    // self-reported): envelope files → stream → unwrap → keyed upsert
    val (streamRows, streamSecs) =
      try StreamBench.run(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] stream FAILED: ${e.getMessage}"); (0L, -1.0)
      }
    val streamRate = if (streamSecs > 0) (streamRows / streamSecs).toLong else -1L
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""stream_rows_per_sec":$streamRate,"stream_rows":$streamRows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
