package graft

/** Dev utility: time individual SparkEntry queries in isolation
  * (median of N full executions after one warm-up), outside the full
  * Bench sweep — for confirming whether a suite-level timing delta is
  * the query's own or an artifact of suite position / JVM state.
  *
  * usage: runMain graft.TimeQuery <sfDir> <q1,q2,...> [runs=3]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <q1,q2,...> [runs=3]")
    val (sfDir, names) = (args(0), args(1).split(",").toSeq)
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.ready(GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      def exec(): Long = fn(spark, sfDir).queryExecution.toRdd.count()
      exec() // warm-up
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); exec(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"TIMEQ $name%-28s median=${times(times.size / 2)}%.3f " +
        f"min=${times.head}%.3f max=${times.last}%.3f runs=$runs")
    }
    spark.stop()
  }
}
