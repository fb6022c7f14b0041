package graft

import org.apache.spark.sql.functions._
import graft.functions.Rbm

/** Compressed-bitmap (roaring-shaped) correctness: unbounded id
  * domains, dense/array container transitions, canonical form,
  * column-level set algebra, and size ∝ occupied buckets. */
class RbmSpec extends SparkSpec {
  import spark.implicits._

  private def bmOf(ids: Seq[Long], parts: Int = 3): Rbm.Bm =
    ids.toDF("id").repartition(parts)
      .agg(Rbm.rbmOf(col("id")).as("b")).as[Rbm.Bm].head()

  test("distinct count over a 2^44 id domain needs no capacity parameter") {
    // ids scattered across the full wide domain — the old dense bitmap
    // (cap 2^20) threw on every one of these
    val ids = (0 until 5000).map(i => (i.toLong * 2796203L * 1259L) & ((1L << 44) - 1))
    val n = ids.toDF("id").repartition(7)
      .agg(Rbm.rbmDistinct(col("id")).as("n")).as[Long].head()
    assert(n == ids.distinct.size.toLong)
    // same answer through the value + column-math path
    assert(Seq(bmOf(ids)).toDF("b").select(Rbm.cardinality(col("b")))
      .as[Long].head() == ids.distinct.size.toLong)
  }

  test("canonical form: sparse buckets are exact arrays, dense buckets are 1024 words") {
    // bucket 0: 100 sparse ids; bucket 5: 60000 ids (dense)
    val sparse = (0 until 100).map(i => i.toLong * 601 % 65536)
    val dense = (0 until 60000).map(i => (5L << 16) + i)
    val bm = bmOf(sparse ++ dense)
    assert(bm.keySet == Set(0L, 5L))
    val c0 = bm(0L)
    assert(c0.length == sparse.distinct.size && c0.sameElements(c0.sorted))
    assert(bm(5L).length == Rbm.DenseWords)
    // canonical regardless of partitioning/arrival order
    val bm2 = bmOf(scala.util.Random.shuffle(sparse ++ dense), parts = 11)
    assert(bm.keySet == bm2.keySet &&
      bm.forall { case (k, c) => c.sameElements(bm2(k)) })
  }

  test("a bucket that crosses 1024 ids upgrades to a dense container exactly") {
    val ids = (0 until 1500).map(_.toLong * 7 % 65536).distinct
    val bm = bmOf(ids.map(v => (9L << 16) + v))
    assert(bm(9L).length == Rbm.DenseWords)
    assert(Seq(bm).toDF("b").select(Rbm.cardinality(col("b")))
      .as[Long].head() == ids.size.toLong)
    // 1023 distinct ids stays an array container
    val bm2 = bmOf((0 until 1023).map(v => (9L << 16) + v.toLong))
    assert(bm2(9L).length == 1023)
  }

  test("andCardinality covers dense∧dense, dense∧array, array∧array, missing buckets") {
    val denseA = (0 until 2000).map(i => i.toLong * 2 % 65536)        // bucket 0, dense
    val denseB = (0 until 2000).map(i => i.toLong * 3 % 65536)        // bucket 0, dense
    val arrA = Seq(1L, 63L, 64L, 65L, 200L).map(_ + (1L << 16))       // bucket 1, array
    val arrB = Seq(63L, 64L, 100L, 200L).map(_ + (1L << 16))          // bucket 1, array
    val mixA = (0 until 1500).map(i => (2L << 16) + i.toLong)         // bucket 2, dense
    val mixB = Seq(0L, 1L, 70000L % 65536, 1499L, 1500L).map(_ + (2L << 16)) // bucket 2, array
    val onlyA = Seq((7L << 16) + 5L)                                  // bucket 7 absent in B
    val a = bmOf(denseA ++ arrA ++ mixA ++ onlyA)
    val b = bmOf(denseB ++ arrB ++ mixB)
    val got = Seq((a, b)).toDF("a", "b")
      .select(Rbm.andCardinality(col("a"), col("b")).as("n")).as[Long].head()
    val want = ((denseA ++ arrA ++ mixA ++ onlyA).toSet
      intersect (denseB ++ arrB ++ mixB).toSet).size.toLong
    assert(got == want)
    // and the asymmetric dense∧array case in the other orientation
    val got2 = Seq((b, a)).toDF("a", "b")
      .select(Rbm.andCardinality(col("a"), col("b")).as("n")).as[Long].head()
    assert(got2 == want)
  }

  test("value size is ∝ cardinality/occupied buckets, never ∝ the id domain") {
    // 2000 sparse ids spread over a 2^40 domain: a dense bitmap of that
    // domain would be 2^40/8 = 128 GiB; the compressed value must cost
    // ≤ one long per id plus map keys.
    val ids = (0 until 2000).map(i => (i.toLong * 549755813L) & ((1L << 40) - 1))
    val bm = bmOf(ids)
    val totalLongs = bm.valuesIterator.map(_.length.toLong).sum
    assert(totalLongs == ids.distinct.size.toLong) // exact arrays, no slack
    assert(bm.size.toLong <= ids.distinct.size.toLong)
    // a dense bucket is capped at 1024 words no matter how many ids hit it
    val hot = bmOf((0 until 65536).map(i => (3L << 16) + i.toLong))
    assert(hot(3L).length == Rbm.DenseWords)
  }

  test("union of pre-built bitmaps = direct build, any grouping/partitioning") {
    // ids split across 6 'days' with heavy overlap, spanning sparse and
    // dense buckets (bucket 0 goes dense via the 0..2000 run)
    val rows = (0 until 9000).map { i =>
      val id = if (i < 3000) i.toLong
        else ((i.toLong * 48271L) % 500000L) | ((i % 3).toLong << 40)
      (i % 6, id)
    }
    val daily = rows.toDF("day", "id").repartition(5)
      .groupBy("day").agg(Rbm.rbmOf(col("id")).as("bm"))
    for (parts <- Seq(1, 3, 7)) {
      val unioned = daily.repartition(parts)
        .agg(Rbm.rbmUnionCount(col("bm")).as("n")).as[Long].head()
      assert(unioned === rows.map(_._2).distinct.size.toLong,
        s"union count wrong at $parts partitions")
    }
    // partial-group rollup: per-day bitmaps re-grouped coarser
    val byPair = rows.toDF("day", "id").repartition(4)
      .groupBy("day").agg(Rbm.rbmOf(col("id")).as("bm"))
      .withColumn("half", col("day") % 2)
      .groupBy("half").agg(Rbm.rbmUnionCount(col("bm")).as("n"))
      .as[(Int, Long)].collect().toMap
    val expect = rows.groupBy(_._1 % 2)
      .map { case (h, rs) => h -> rs.map(_._2).distinct.size.toLong }
    assert(byPair === expect)
  }

  test("randomized differential vs Set semantics") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val a = Seq.fill(800)(rnd.nextLong(1L << 34))
      val b = Seq.fill(800)(
        if (rnd.nextBoolean()) a(rnd.nextInt(a.size)) else rnd.nextLong(1L << 34))
      val row = Seq((bmOf(a), bmOf(b))).toDF("a", "b")
        .select(Rbm.cardinality(col("a")).as("ca"),
          Rbm.cardinality(col("b")).as("cb"),
          Rbm.andCardinality(col("a"), col("b")).as("cab"))
        .as[(Long, Long, Long)].head()
      assert(row._1 == a.distinct.size.toLong)
      assert(row._2 == b.distinct.size.toLong)
      assert(row._3 == (a.toSet intersect b.toSet).size.toLong)
    }
  }

  test("StarRocks-named SQL surface: bitmap_* aggregates resolve in spark.sql") {
    val rows = (0L until 3000L).map(i => (i % 40, i % 700)).toDF("g", "uid")
    rows.createOrReplaceTempView("sql_rbm_rows")
    // direct exact distinct per group
    val direct = spark.sql(
      "SELECT g, bitmap_distinct_count(uid) AS n FROM sql_rbm_rows GROUP BY g")
      .as[(Long, Long)].collect().toMap
    val want = rows.groupBy(col("g")).agg(countDistinct(col("uid")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(direct == want)
    // the rollup shape: per-group bitmaps re-aggregate to the global
    // count without touching rows again — StarRocks' MV pattern
    val rolled = spark.sql(
      """SELECT bitmap_union_count(bm) AS n FROM
        |  (SELECT g, bitmap_agg(uid) AS bm FROM sql_rbm_rows GROUP BY g)""".stripMargin)
      .as[Long].head()
    assert(rolled == 700L)
    // bitmap_union keeps the bitmap; the scalar column algebra
    // (cardinality) composes on top of the SQL aggregate's output
    val unioned = spark.sql(
      """SELECT bitmap_union(bm) AS bm FROM
        |  (SELECT g, bitmap_agg(uid) AS bm FROM sql_rbm_rows GROUP BY g)""".stripMargin)
    assert(unioned.select(Rbm.cardinality(col("bm"))).as[Long].head() == 700L)
    // mg_sketch surfaces the heavy-hitter candidates
    val mg = spark.sql(
      "SELECT mg_sketch(CAST(uid AS STRING)) AS mg FROM sql_rbm_rows WHERE uid < 3")
      .as[Map[String, Long]].head()
    assert(mg.keySet == Set("0", "1", "2"))
  }
}
