package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{Envelope, PkTable, RoutineLoad}

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("envelope encode/parse/unwrap roundtrip preserves the image") {
    val df = Seq((1L, "a", "c"), (2L, "b", "u"), (3L, "c", "d"))
      .toDF("id", "v", "op")
    val enc = df.select(Envelope.encode(col("op"), lit(42L),
      Seq(col("id"), col("v")), "db", "t").as("json"))
    val parsed = enc.select(Envelope.parse(col("json"), payload).as("env"))
    val out = Envelope.extractNewRecordState(parsed, col("env"), payload)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getAs[String]("__deleted")).toSeq == Seq("false", "false", "true"))
    // delete rows carry the before-image
    assert(out(2).getAs[String]("v") == "c")
  }

  test("tombstones (null op) are dropped by unwrap") {
    val rows = Seq("""{"before":null,"after":{"id":1,"v":"x"},"op":"c","ts_ms":1}""",
      """null""", """{"before":null,"after":null,"op":null,"ts_ms":null}""")
    val parsed = rows.toDF("json")
      .select(Envelope.parse(col("json"), payload).as("env"))
    val out = Envelope.extractNewRecordState(parsed, col("env"), payload)
    assert(out.count() == 1)
  }

  test("PkTable.compact: latest version wins, delete removes key, out-of-order safe") {
    val chg = Seq(
      (1L, 1, "a", false), (1L, 3, "a3", false), (1L, 2, "a2", false), // out of order
      (2L, 1, "b", false), (2L, 2, "b2", true),                        // deleted last
      (3L, 2, "c2", false), (3L, 1, "cDel", true)                      // deleted then re-upserted
    ).toDF("k", "ver", "v", "del")
    val out = PkTable.compact(chg, Seq("k"), Seq(col("ver")), col("del"))
      .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a3"), (3L, "c2")))
  }

  test("PkTable.snapshotMerge: changelog overrides, deletes drop, new keys insert") {
    val snap = Seq((1L, "s1", 0), (2L, "s2", 0), (3L, "s3", 0)).toDF("k", "v", "ver")
    val chg = Seq((2L, "c2", 5, false), (3L, "x", 5, true), (4L, "c4", 5, false))
      .toDF("k", "v", "ver", "del")
    val out = PkTable.snapshotMerge(snap, chg.select("k", "v", "ver"),
      Seq("k"), Seq(col("ver")),
      // delete flag must be evaluated against the changelog frame
      deleteFlag = col("v") === "x")
      .orderBy("k").select("k", "v").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "s1"), (2L, "c2"), (4L, "c4")))
  }

  test("multi-table feed routes by source.table like table.include.list") {
    val mixed = Seq(
      """{"before":null,"after":{"id":1,"v":"o1"},"source":{"connector":"mysql","db":"testdb","table":"orders"},"op":"c","ts_ms":1}""",
      """{"before":null,"after":{"id":2,"v":"c1"},"source":{"connector":"mysql","db":"testdb","table":"customers"},"op":"c","ts_ms":1}""",
      """{"before":null,"after":{"id":3,"v":"o2"},"source":{"connector":"mysql","db":"testdb","table":"orders"},"op":"c","ts_ms":2}""")
      .toDF("json")
    val orders = graft.streaming.CdcStream.routeTable(mixed, "json", "orders")
    val customers = graft.streaming.CdcStream.routeTable(mixed, "json", "customers")
    assert(orders.count() == 2 && customers.count() == 1)
    val parsed = orders.select(Envelope.parse(col("json"), payload).as("env"))
    val out = Envelope.extractNewRecordState(parsed, col("env"), payload)
    assert(out.select("v").as[String].collect().toSet == Set("o1", "o2"))
  }

  test("RoutineLoad error accounting tags corrupt lines, keeps good rows") {
    val lines = Seq("""{"id":1,"v":"a"}""", "garbage{{{", """{"id":3,"v":"c"}""").toDF("line")
    val out = RoutineLoad.mapWithErrors(lines, col("line"), payload, "id")
    assert(out.where(col("__error")).count() == 1)
    assert(out.where(!col("__error")).select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("RoutineLoad jsonpaths mapping types columns and tolerates extras") {
    val lines = Seq("""{"a":1,"b":"x","extra":9}""", """{"a":2,"b":"y"}""").toDF("line")
    val out = RoutineLoad.map(lines, col("line"), Seq(
      RoutineLoad.ColumnSpec("a", "$.a", LongType),
      RoutineLoad.ColumnSpec("b", "$.b", StringType),
      RoutineLoad.ColumnSpec("missing", "$.nope", StringType)))
      .orderBy("a").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.forall(_.isNullAt(2)))
  }

  test("schema evolution: lossless widenings accepted, narrowings refused") {
    import graft.cdc.SchemaEvolution._
    assert(canWiden(IntegerType, LongType) && canWiden(FloatType, DoubleType))
    assert(canWiden(DecimalType(10, 2), DecimalType(12, 2)))
    assert(!canWiden(DecimalType(12, 2), DecimalType(10, 2)))
    assert(!canWiden(LongType, IntegerType) && !canWiden(DoubleType, FloatType))
    assert(!canWiden(StringType, LongType))
    assert(canWiden(LongType, DecimalType(22, 2)) && !canWiden(LongType, DecimalType(12, 2)))

    val stored = StructType(Seq(StructField("k", IntegerType),
      StructField("v", FloatType)))
    val incoming = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType), StructField("extra", StringType)))
    val evolved = evolve(stored, incoming)
    assert(evolved.map(f => f.name -> f.dataType) ==
      Seq("k" -> LongType, "v" -> DoubleType, "extra" -> StringType))
    intercept[IllegalArgumentException] {
      evolve(StructType(Seq(StructField("k", StringType))),
        StructType(Seq(StructField("k", LongType))))
    }
  }

  test("widenMerge: INT/FLOAT snapshot follows a BIGINT/DOUBLE changelog") {
    import graft.cdc.SchemaEvolution
    val stored = Seq((1, 1.5f, 0L), (2, 2.5f, 0L)).toDF("k", "v", "ver")
    val changes = Seq((1L, 9.25, 1L, false), (3L, 3.75, 1L, false), (2L, 0.0, 1L, true))
      .toDF("k", "v", "ver", "del")
    val out = SchemaEvolution.widenMerge(stored, changes, Seq("k"), Seq("ver"), "del")
      .orderBy("k").as[(Long, Double, Long)].collect()
    // key 1 updated, key 2 deleted, key 3 inserted
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((1L, 9.25), (3L, 3.75)))
    intercept[IllegalArgumentException] {
      // changelog NARROWER than table on a non-widenable pair
      SchemaEvolution.widenTo(Seq((1L, "x")).toDF("k", "v"),
        StructType(Seq(StructField("k", IntegerType), StructField("v", StringType))))
    }
  }
}
