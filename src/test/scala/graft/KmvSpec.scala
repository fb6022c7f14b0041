package graft

import org.apache.spark.sql.functions._
import graft.functions.Kmv

/** KMV bottom-k sketch: exactness below k, estimator error bounds,
  * partition-order determinism, and the q_kmv_setops gate flags. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("below k distincts the sketch is exact (distinct count and membership)") {
    val df = (1L to 500L).map(i => i % 200).toDF("v")
      .select(Kmv.hash63(col("v")).as("h"))
    val est = df.agg(Kmv.kmvDistinct(col("h"), k = 1024)).as[Long].head()
    assert(est == 200L, s"m<k must be exact, got $est")
    val sk = df.agg(Kmv.kmvOf(col("h"), k = 1024)).as[Array[Long]].head()
    assert(sk.length == 200 && sk.sorted.sameElements(sk) && sk.distinct.length == 200)
  }

  test("distinct estimate within 10% of exact at n >> k") {
    val n = 50000L
    val df = (1L to n).toDF("v").select(Kmv.hash63(col("v")).as("h"))
    val est = df.agg(Kmv.kmvDistinct(col("h"), k = 1024)).as[Long].head()
    assert(math.abs(est - n) <= 0.10 * n, s"est=$est exact=$n")
  }

  test("sketch values are partition-order deterministic (1 vs 16 partitions)") {
    val vals = (1L to 30000L).map(i => (i * 2654435761L) % 20000)
    val a = vals.toDF("v").repartition(1)
      .select(Kmv.hash63(col("v")).as("h"))
      .agg(Kmv.kmvOf(col("h"))).as[Array[Long]].head()
    val b = vals.reverse.toDF("v").repartition(16)
      .select(Kmv.hash63(col("v")).as("h"))
      .agg(Kmv.kmvOf(col("h"))).as[Array[Long]].head()
    assert(a.sameElements(b), "bottom-k must not depend on arrival/merge order")
  }

  test("pair estimators: intersection/union/jaccard within bounds on a known overlap") {
    // A = [1, 30000], B = [20001, 50000] → |A∩B| = 10000, |A∪B| = 50000
    val a = (1L to 30000L).toDF("v").select(Kmv.hash63(col("v")).as("h"))
      .agg(Kmv.kmvOf(col("h")).as("sk"))
    val b = (20001L to 50000L).toDF("v").select(Kmv.hash63(col("v")).as("h"))
      .agg(Kmv.kmvOf(col("h")).as("sk"))
    val row = a.select(col("sk").as("ska")).crossJoin(b.select(col("sk").as("skb")))
      .select(Kmv.intersectEst(col("ska"), col("skb")).as("i"),
        Kmv.unionEst(col("ska"), col("skb")).as("u"),
        Kmv.jaccardEst(col("ska"), col("skb")).as("j"))
      .as[(Double, Double, Double)].head()
    assert(math.abs(row._1 - 10000) <= 0.15 * 10000, s"inter est ${row._1}")
    assert(math.abs(row._2 - 50000) <= 0.10 * 50000, s"union est ${row._2}")
    assert(math.abs(row._3 - 0.2) <= 0.05, s"jaccard est ${row._3}")
  }

  test("kmvMerge of partitioned sketches is bit-identical to the direct sketch") {
    // the rollup verb: per-day (here per-slice) sketches merged over
    // the sketch COLUMN must equal sketching the concatenated input —
    // distinct-bottom-k is order-free, so this is exact equality, not
    // an estimate bound
    val vals = (1L to 40000L).map(i => ((i * 2654435761L) % 15000, i % 7))
    val hashed = vals.toDF("v", "slice")
      .select(col("slice"), Kmv.hash63(col("v")).as("h"))
    val direct = hashed.agg(Kmv.kmvOf(col("h"))).as[Array[Long]].head()
    val merged = hashed.groupBy(col("slice")).agg(Kmv.kmvOf(col("h")).as("sk"))
      .agg(Kmv.kmvMerge(col("sk"))).as[Array[Long]].head()
    assert(merged.sameElements(direct),
      "rolled-up sketch must be bit-identical to the direct sketch")
  }

  test("q_kmv_rollup gate: exact values match a recount and every flag is true") {
    val out = SparkEntry.queries("q_kmv_rollup")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("est_ok"), s"est_ok false in $r")
      assert(r.getAs[Boolean]("merge_det_ok"), s"merge_det_ok false in $r")
    }
  }

  test("SQL-name surface is bit-identical to the typed helpers") {
    // every kmv_* SQL name expands through GraftSqlBridge to the SAME
    // native composition the Column helpers build, so equality here is
    // exact — sketches compare as arrays, estimates as doubles
    graft.functions.SqlFunctions.register(spark)
    (1L to 20000L).map(i => (i % 9000, i % 3)).toDF("v", "g")
      .createOrReplaceTempView("kmv_sql_src")
    val sql = spark.sql(
      """WITH per AS (SELECT g, kmv_sketch(kmv_hash(v)) AS sk
        |            FROM kmv_sql_src GROUP BY g),
        |m AS (SELECT kmv_union(sk) AS sk FROM per)
        |SELECT kmv_distinct_est(sk) AS d,
        |  kmv_intersect_est(sk, sk) AS i, kmv_union_est(sk, sk) AS u,
        |  kmv_jaccard_est(sk, sk) AS j, sk FROM m""".stripMargin)
      .as[(Double, Double, Double, Double, Array[Long])].head()
    val typedSk = (1L to 20000L).map(i => (i % 9000, i % 3)).toDF("v", "g")
      .select(col("g"), Kmv.hash63(col("v")).as("h"))
      .groupBy(col("g")).agg(Kmv.kmvOf(col("h")).as("sk"))
      .agg(Kmv.kmvMerge(col("sk")).as("sk"))
    val typed = typedSk
      .select(Kmv.distinctEst(col("sk")).as("d"),
        Kmv.intersectEst(col("sk"), col("sk")).as("i"),
        Kmv.unionEst(col("sk"), col("sk")).as("u"),
        Kmv.jaccardEst(col("sk"), col("sk")).as("j"), col("sk"))
      .as[(Double, Double, Double, Double, Array[Long])].head()
    assert(sql._5.sameElements(typed._5), "stored sketches differ")
    assert(sql._1 == typed._1 && sql._2 == typed._2 &&
      sql._3 == typed._3 && sql._4 == typed._4, s"$sql vs $typed")
    assert(sql._4 == 1.0, "self-jaccard must be exactly 1.0")
  }

  test("q_kmv_setops gate: exact values match a recount and every flag is true") {
    val out = SparkEntry.queries("q_kmv_setops")(spark, sfDir).collect()
    assert(out.length == 3, s"3 returnflag pairs expected, got ${out.length}")
    out.foreach { r =>
      val (na, nb, ni, nu) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"))
      assert(nu == na + nb - ni)
      Seq("da_ok", "db_ok", "inter_ok", "union_ok", "jac_ok").foreach { f =>
        assert(r.getAs[Boolean](f), s"$f false in $r")
      }
    }
  }
}
