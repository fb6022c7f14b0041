package graft

/** Diagnostic main for the streaming throughput bench: runs
  * StreamBench.run (warm + timed like Bench) and prints every
  * micro-batch's progress breakdown (durationMs: addBatch, getBatch,
  * walCommit, commitOffsets, stateOperators), so the per-batch cost
  * structure is visible instead of one opaque rows/s number.
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.ready(GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt, maxPartitionBytes = "4m").getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val progresses = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        progresses.add(e.progress.json)
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val warm = StreamBench.run(spark, sfDir)
    println(s"warm: rows=${warm._1} secs=${warm._2} rate=${(warm._1 / warm._2).toLong}")
    progresses.clear()
    val (n, secs) = StreamBench.run(spark, sfDir)
    println(s"timed: rows=$n secs=$secs rate=${(n / secs).toLong}")
    progresses.forEach(p => println(p))
    spark.stop()
  }
}
