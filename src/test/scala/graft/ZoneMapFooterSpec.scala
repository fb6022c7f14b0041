package graft

import org.apache.spark.sql.functions._
import graft.sinks.ZoneMap

/** r17 optimization: the parquet-footer zone-map fast path must record
  * EXACTLY what the distributed stats job records — same files, same
  * row counts, same min/max string renderings, same kinds — and must
  * refuse (falling back to the job) whenever the footer stats cannot
  * be trusted to reproduce them (non-ASCII string min/max, where
  * UTF8-binary and UTF16 orders can diverge). */
class ZoneMapFooterSpec extends SparkSpec {
  import spark.implicits._

  private def statsOf(dir: String) =
    ZoneMap.read(spark, dir).get
      .map(st => st.file -> ((st.rows, st.mins, st.maxs, st.kinds))).toMap

  test("footer path ≡ job path: files, rows, min/max renderings, kinds") {
    val dir = TestTmp.dir("zmfooter").toString + "/d"
    Seq(
      (1L, 7.5, "alpha", Option("x")),
      (2L, -0.25, "omega", None),
      (9L, 1.0e7, "beta", None),
      (4L, 3.25, "gamma", Option("y")))
      .toDF("id", "score", "name", "opt")
      .repartition(3, col("id"))
      .write.mode("overwrite").parquet(dir)
    val cols = Seq("id", "score", "name", "opt", "absent")
    require(ZoneMap.footerWrite(spark, dir, cols),
      "clean ASCII dir must take the footer path")
    val fast = statsOf(dir)
    ZoneMap.writeViaJob(spark, dir, cols)
    val viaJob = statsOf(dir)
    assert(fast == viaJob, s"footer stats diverge from job stats:\n$fast\nvs\n$viaJob")
    assert(fast.values.map(_._1).sum == 4L)
  }

  test("all-null column: recorded as unprunable by both paths") {
    val dir = TestTmp.dir("zmfooter").toString + "/nulls"
    Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    require(ZoneMap.footerWrite(spark, dir, Seq("id", "v")))
    val fast = statsOf(dir)
    ZoneMap.writeViaJob(spark, dir, Seq("id", "v"))
    assert(statsOf(dir) == fast)
    assert(fast.values.forall { case (_, mins, _, _) => !mins.contains("v") })
  }

  test("non-ASCII string stats force the job fallback; write() stays correct") {
    val dir = TestTmp.dir("zmfooter").toString + "/uni"
    Seq((1L, "café"), (2L, "zz")).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    assert(!ZoneMap.footerWrite(spark, dir, Seq("id", "v")),
      "non-ASCII string min/max must defer to the job path")
    ZoneMap.write(spark, dir, Seq("id", "v")) // public entry falls back
    val st = statsOf(dir)
    assert(st.values.exists { case (_, mins, maxs, _) =>
      mins.get("v").contains("café") && maxs.get("v").contains("zz") })
  }
}
