package graft

import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioned co-located joins — the lake analogue of
  * StarRocks' `DISTRIBUTED BY HASH(key)` (see
  * /root/reference/create-starrocks-tables.sh). Writing both fact
  * tables bucketed by the join key lets Spark join them with NO
  * exchange on either side — at 100 TB this removes the dominant
  * shuffle of fact-fact joins entirely.
  */
class BucketSpec extends SparkSpec {

  test("bucketed fact tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // a fresh (per-JVM derby) metastore doesn't know about leftover
    // warehouse dirs from prior runs — clear the locations physically
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("li_b", "ord_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // hint a merge join: at test SF the dim would broadcast, hiding the
    // co-location property this spec demonstrates
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    // the join itself must not exchange either side (bucket layout is
    // the partitioning); only the final aggregation shuffles
    val joinPart = p.split("HashAggregate").last
    assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"))
    assert(!joinPart.contains("Exchange"),
      s"join should be exchange-free over bucketed tables:\n$p")

    // and the result matches the unbucketed join
    val expected = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val actual = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(actual.keySet == expected.keySet)
    assert(actual.forall { case (k, v) => math.abs(v - expected(k)) < 1e-6 })
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
