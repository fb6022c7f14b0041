package graft

import org.apache.spark.sql.functions._
import graft.sinks.StarRocksSink

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("D3: stream-load sink ships all rows as labeled JSON-line chunks") {
    val dir = TestTmp.dir("srsink").toString
    val df = (1 to 100).map(i => (i.toLong, s"name_$i")).toDF("id", "name")
    val chunks = StarRocksSink.write(df, "load1", StarRocksSink.fileTransport(dir),
      maxChunkBytes = 512)
    val files = new java.io.File(dir).listFiles().toSeq
    assert(files.nonEmpty && chunks == files.length)
    assert(files.forall(_.getName.startsWith("load1-")))
    val lines = files.flatMap(f =>
      scala.io.Source.fromFile(f).getLines().toSeq)
    assert(lines.length == 100)
    assert(lines.forall(l => l.startsWith("{") && l.contains("\"id\":")))
  }

  test("D1: partitioned PK-table parquet sink round-trips") {
    val dir = TestTmp.dir("pksink").toString + "/t"
    val df = Tables.orders(spark, sfDir)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    StarRocksSink.writePkTable(df, dir, "order_month")
    val back = spark.read.parquet(dir)
    assert(back.count() == df.count())
    // partition pruning: a single-month read touches one directory
    val months = back.select("order_month").distinct().count()
    assert(months > 1)
  }

  test("incremental PK-table sink: micro-batch merges accumulate correctly") {
    import graft.sinks.PkTableSink
    val root = TestTmp.dir("pkinc").toString + "/t"
    def batch(rows: (Long, Long, String, Boolean)*) =
      rows.toDF("id", "ver", "v", "del")
    // batch 1: two inserts
    PkTableSink.merge(spark, root, batch((1L, 1L, "a", false), (2L, 1L, "b", false)),
      Seq("id"), Seq("ver"), "del")
    // batch 2: update 1, delete 2, insert 3
    PkTableSink.merge(spark, root, batch((1L, 2L, "a2", false), (2L, 2L, "x", true), (3L, 1L, "c", false)),
      Seq("id"), Seq("ver"), "del")
    val t = PkTableSink.read(spark, root, batch().drop("del"))
      .orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(t == Seq((1L, "a2"), (3L, "c")))
    // replaying batch 2 is idempotent
    PkTableSink.merge(spark, root, batch((1L, 2L, "a2", false), (2L, 2L, "x", true), (3L, 1L, "c", false)),
      Seq("id"), Seq("ver"), "del")
    val t2 = PkTableSink.read(spark, root, batch().drop("del"))
      .orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(t2 == t)
    assert(PkTableSink.currentVersion(spark, root).contains(2L))
  }

  test("PK-table sink vacuum keeps recent versions, never the current") {
    import graft.sinks.PkTableSink
    val root = TestTmp.dir("pkvac").toString + "/t"
    def batch(rows: (Long, Long, String, Boolean)*) =
      rows.toDF("id", "ver", "v", "del")
    (1 to 4).foreach { i =>
      PkTableSink.merge(spark, root, batch((i.toLong, i.toLong, s"v$i", false)),
        Seq("id"), Seq("ver"), "del")
    }
    // versions 0..3 exist, current = 3; keep 2 → delete 0 and 1
    val deleted = PkTableSink.vacuum(spark, root, keepVersions = 2)
    assert(deleted == Seq(0L, 1L))
    assert(PkTableSink.currentVersion(spark, root).contains(3L))
    val t = PkTableSink.read(spark, root, batch().drop("del"))
    assert(t.count() == 4) // table content untouched
    // idempotent
    assert(PkTableSink.vacuum(spark, root, keepVersions = 2).isEmpty)
  }

  test("PK-table sink commit refuses to overwrite a concurrent writer's pointer") {
    import graft.sinks.PkTableSink
    import java.nio.file.{Files, Paths}
    val root = TestTmp.dir("pkconc").toString + "/t"
    def batch(rows: (Long, Long, String, Boolean)*) =
      rows.toDF("id", "ver", "v", "del")
    PkTableSink.merge(spark, root, batch((1L, 1L, "a", false)), Seq("id"), Seq("ver"), "del")
    // another writer won the race to v1: our rename target exists, so
    // the commit must FAIL (rename-to-existing), never clobber
    Files.writeString(Paths.get(root, "_CURRENT.v1"), "1")
    intercept[IllegalStateException] {
      PkTableSink.commit(spark, root, 1L)
    }
    assert(PkTableSink.currentVersion(spark, root).contains(1L))
  }

  test("PK-table sink commit survives crash debris and legacy pointers") {
    import graft.sinks.PkTableSink
    import java.nio.file.{Files, Paths}
    val root = TestTmp.dir("pkcrash").toString + "/t"
    def batch(rows: (Long, Long, String, Boolean)*) =
      rows.toDF("id", "ver", "v", "del")
    PkTableSink.merge(spark, root, batch((1L, 1L, "a", false)), Seq("id"), Seq("ver"), "del")
    PkTableSink.merge(spark, root, batch((2L, 1L, "b", false)), Seq("id"), Seq("ver"), "del")
    // crash debris: an orphaned tmp pointer and a stale lower-version
    // pointer must not affect resolution (max version wins)
    Files.writeString(Paths.get(root, "_CURRENT.tmp7"), "7")
    Files.writeString(Paths.get(root, "_CURRENT.v0"), "0")
    assert(PkTableSink.currentVersion(spark, root).contains(1L))
    val t = PkTableSink.read(spark, root, batch().drop("del"))
      .orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq
    assert(t == Seq((1L, "a"), (2L, "b")))
    // legacy single-_CURRENT layout still reads, and the next merge
    // migrates it to a versioned pointer
    val legacyRoot = TestTmp.dir("pklegacy").toString + "/t"
    PkTableSink.merge(spark, legacyRoot, batch((5L, 1L, "e", false)), Seq("id"), Seq("ver"), "del")
    val ptr = Paths.get(legacyRoot).toFile.listFiles().map(_.getName)
      .filter(_.startsWith("_CURRENT")).toSeq
    Files.writeString(Paths.get(legacyRoot, "_CURRENT"), "0")
    ptr.filter(_.startsWith("_CURRENT.v")).foreach(n => Files.delete(Paths.get(legacyRoot, n)))
    assert(PkTableSink.currentVersion(spark, legacyRoot).contains(0L))
    PkTableSink.merge(spark, legacyRoot, batch((6L, 1L, "f", false)), Seq("id"), Seq("ver"), "del")
    assert(PkTableSink.currentVersion(spark, legacyRoot).contains(1L))
    val names = Paths.get(legacyRoot).toFile.listFiles().map(_.getName).toSet
    assert(names.contains("_CURRENT.v1") && !names.contains("_CURRENT"))
  }

  test("D2: JSON-lines and CSV sources read with explicit schemas") {
    val dir = TestTmp.dir("src").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.json"),
      "{\"id\":1,\"v\":\"x\"}\n{\"id\":2,\"v\":\"y\"}\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "a.csv"),
      "id,v\n3,z\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val j = spark.read.schema(schema).json(s"$dir/a.json")
    val c = spark.read.schema(schema).option("header", "true").csv(s"$dir/a.csv")
    assert(j.count() == 2 && c.count() == 1)
    assert(j.unionByName(c).count() == 3)
    // ORC round-trip (the other columnar lake format Spark ships)
    j.write.mode("overwrite").orc(s"$dir/orc")
    assert(spark.read.orc(s"$dir/orc").count() == 2)
  }
}
