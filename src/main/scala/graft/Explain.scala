package graft

/** Plan-audit main: prints the formatted physical plan for the named
  * queries (all if none given) so scan pushdown (`PushedFilters`,
  * `ReadSchema`), broadcast joins, and WholeStageCodegen spans can be
  * inspected. Usage: runMain graft.Explain [sfDir] [name,name,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).headOption.map(_.split(",").toSet)
    // 3rd arg "executed": run the query first and print the FINAL
    // AQE-re-optimized plan (exchange reuse, AQEShuffleRead, runtime
    // join changes are only visible there — guide §7.2)
    val executed = args.lift(2).contains("executed")
    val spark = GraftSession.get()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => names.forall(_.contains(q._1)))
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try {
          val df = fn(spark, sfDir)
          if (executed) {
            df.queryExecution.toRdd.count()
            println(df.queryExecution.executedPlan.toString)
          } else println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    spark.stop()
  }
}
