package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.cdc.CdcGenerator
import graft.streaming.{CdcStream, StateTuning}

/** Large-state streaming path: the keyed upsert state at 10× the test
  * corpus' key cardinality, on the tuned RocksDB store with changelog
  * checkpointing and bounded memory, verified against the batch
  * formulation of the same changelog. */
class LargeStateSpec extends SparkSpec {
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("seq", LongType),
    StructField("value", DoubleType)))

  test("10x-cardinality upsert state on tuned RocksDB matches the batch oracle") {
    // 10× the generator's default 1k key space, 30k mixed ops
    val keySpace = 10000L
    val envs = CdcGenerator.envelopes(spark, n = 30000L, keySpace = keySpace)

    // batch oracle: same unwrap, latest-wins fold, tombstones dropped
    def latest(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("key"))
      .agg(max_by(struct(col("deleted"), col("payload")),
        struct(col("versionMs"), col("seq"))).as("s"))
      .where(!col("s.deleted"))
      .select(col("key"), col("s.payload").as("payload"))
    val expected = latest(
      CdcStream.unwrap(envs, "json", payload, "id", "seq").toDF())
      .as[(Long, String)].collect().toMap

    val work = TestTmp.dir("largestate").toString
    envs.coalesce(4).write.mode("overwrite").text(s"$work/input")
    val got = StateTuning.withRocksDb(spark) {
      val states = CdcStream.upsertStates(CdcStream.unwrap(
        CdcStream.fileSource(spark, s"$work/input"), "json", payload, "id", "seq"))
      val q = states.writeStream.format("memory").queryName("large_state")
        .outputMode("update")
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // the query really ran on RocksDB with changelog checkpointing
      val lastProgress = q.lastProgress
      assert(lastProgress.stateOperators.nonEmpty)
      latest(spark.table("large_state")).as[(Long, String)].collect().toMap
    }
    assert(got.size == expected.size,
      s"live-key count ${got.size} != expected ${expected.size}")
    assert(got == expected)
    // sanity: the workload really exercised a large key space
    assert(expected.size > 5000)
  }
}
