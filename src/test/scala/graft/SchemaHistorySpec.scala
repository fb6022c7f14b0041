package graft

import org.apache.spark.sql.types._
import graft.cdc.SchemaHistory

/** Durable DDL changelog (D50): diff-derived column events recorded
  * transactionally, replayable to the schema AS OF any sequence — the
  * lake analogue of the reference's schemahistory topic. */
class SchemaHistorySpec extends SparkSpec {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  test("observations diff into events; replay reconstructs every intermediate schema") {
    val root = TestTmp.dir("ddlh").toString + "/g"
    val v0 = st("id" -> LongType, "name" -> StringType)
    val v1 = st("id" -> LongType, "name" -> StringType, "bal" -> IntegerType)
    val v2 = st("id" -> LongType, "name" -> StringType, "bal" -> LongType) // widen
    val v3 = st("id" -> LongType, "bal" -> LongType)                       // drop name
    val v4 = st("id" -> LongType, "bal" -> LongType, "name" -> StringType) // re-add

    assert(SchemaHistory.record(spark, root, "cust", v0).toMap ==
      Map("id" -> "add", "name" -> "add"))
    assert(SchemaHistory.record(spark, root, "cust", v0).isEmpty,
      "unchanged observation must record nothing (idempotent redelivery)")
    assert(SchemaHistory.record(spark, root, "cust", v1) == Seq("bal" -> "add"))
    assert(SchemaHistory.record(spark, root, "cust", v2) == Seq("bal" -> "widen"))
    assert(SchemaHistory.record(spark, root, "cust", v3) == Seq("name" -> "drop"))
    assert(SchemaHistory.record(spark, root, "cust", v3).isEmpty,
      "a drop records ONCE, not once per subsequent observation")
    assert(SchemaHistory.record(spark, root, "cust", v4) == Seq("name" -> "add"))
    assert(SchemaHistory.lastSeq(spark, root, "cust").contains(4L))

    // replay at every sequence: strict = the source's literal shape
    def strictAt(seq: Long): Set[(String, DataType)] =
      SchemaHistory.replay(spark, root, "cust", seq, strict = true)
        .fields.map(f => (f.name, f.dataType)).toSet
    assert(strictAt(0L) == Set("id" -> LongType, "name" -> StringType))
    assert(strictAt(1L) == v1.fields.map(f => (f.name, f.dataType)).toSet)
    assert(strictAt(2L) == v2.fields.map(f => (f.name, f.dataType)).toSet)
    assert(strictAt(3L) == Set("id" -> LongType, "bal" -> LongType))
    assert(strictAt(4L) == v4.fields.map(f => (f.name, f.dataType)).toSet)
    // non-strict (lake view, D30 semantics): the drop never unlearns
    assert(SchemaHistory.replay(spark, root, "cust", 3L)
      .fieldNames.toSet == Set("id", "name", "bal"))
  }

  test("narrowing is rejected loudly; tables are independent") {
    val root = TestTmp.dir("ddlh2").toString + "/g"
    assert(SchemaHistory.record(spark, root, "t1",
      st("k" -> LongType)).nonEmpty)
    intercept[IllegalArgumentException] {
      SchemaHistory.record(spark, root, "t1", st("k" -> IntegerType))
    }
    // a second table's history interleaves in the same log without bleed
    assert(SchemaHistory.record(spark, root, "t2",
      st("x" -> StringType)) == Seq("x" -> "add"))
    assert(SchemaHistory.replay(spark, root, "t1", strict = true)
      .fieldNames.toSeq == Seq("k"))
    assert(SchemaHistory.events(spark, root, "t2").count() == 1)
  }
}
