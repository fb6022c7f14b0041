package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.functions.Kmv
import graft.streaming.KmvMv

/** The distinct-count sketch MV (SketchMv's KMV flavor, the StarRocks
  * HLL aggregate-column workflow): CDC stream → foreachBatch → KMV
  * sketch column committed via mergeTxGroup → distinct-users rollup
  * reading the COMMITTED sketches.
  *
  * KMV's equivalence contract is STRONGER than QskMv's: distinct
  * bottom-k is partition- and batch-order free, so the committed
  * sketch must be BIT-IDENTICAL to a one-shot sketch of the same rows
  * (array equality, not a rank band), and every estimate served from
  * the MV equals the direct estimate exactly. Plus the transactional
  * edges: a replayed batch id is a zero-job no-op, and the view
  * converges across duplicate delivery.
  */
class KmvMvSpec extends SparkSpec {
  import spark.implicits._

  private def t(d: Int, h: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")

  test("stream -> committed KMV column -> distinct rollup is bit-identical to batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    val root = TestTmp.dir("kmvmv").toString + "/mv"
    // per-day ids are u + (d-1)·umax/2, so each type's two days
    // overlap by half: type a spans 600 distinct ids (below k =
    // exact), type b 4500 (above k = estimated)
    val all = for {
      (tp, umax) <- Seq(("a", 400), ("b", 3000)); d <- 1 to 2; u <- 0 until umax
    } yield (t(d, 1 + u % 20), tp, (u + (d - 1) * umax / 2).toLong)

    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val stream = input.toDF().toDF("ts", "event_type", "user_id")
      .withColumn("day", to_date(col("ts")))
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        KmvMv.maintainTx(root, batch, id,
          groupCols = Seq("event_type", "day"), idCol = col("user_id"))
        ()
      }.start()
    // three deliveries, second reversed (out-of-order arrival)
    val (b1, rest) = all.splitAt(all.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2.reverse: _*); q.processAllAvailable()
    input.addData(b3: _*); q.processAllAvailable()
    q.stop()

    val schemaOf = Seq.empty[(String, java.sql.Date, Array[Long], Long, Long)]
      .toDF("event_type", "day", "sk", "n", "batch_id")
    val mv = KmvMv.readMv(spark, root, schemaOf)

    // exact key set + exact row counts
    val keys = mv.select(col("event_type"), col("day"), col("n"))
      .as[(String, java.sql.Date, Long)].collect().toSet
    def d(i: Int) = java.sql.Date.valueOf(s"2024-01-0$i")
    assert(keys == Set(("a", d(1), 400L), ("a", d(2), 400L),
      ("b", d(1), 3000L), ("b", d(2), 3000L)))

    // per-key committed sketches are BIT-IDENTICAL to direct sketches
    // of the same rows — the order-free guarantee through the whole
    // stream → partial → union → commit path
    val rawDf = all.toDF("ts", "event_type", "user_id")
      .withColumn("day", to_date(col("ts")))
    val direct = rawDf.groupBy(col("event_type"), col("day"))
      .agg(Kmv.kmvOf(Kmv.hash63(col("user_id"))).as("sk"))
      .select(col("event_type"), col("day"), col("sk"))
      .as[(String, java.sql.Date, Array[Long])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    mv.select(col("event_type"), col("day"), col("sk"))
      .as[(String, java.sql.Date, Array[Long])].collect()
      .foreach { case (tp, dy, sk) =>
        assert(sk.sameElements(direct((tp, dy))),
          s"committed sketch for ($tp, $dy) differs from the direct sketch")
      }

    // a REPLAYED batch id is refused without running jobs and the
    // committed view is byte-stable across it
    val dup = spark.createDataFrame(
      b1.map { case (ts, tp, u) => (ts, tp, u, new java.sql.Date(ts.getTime)) })
      .toDF("ts", "event_type", "user_id", "day")
    assert(!KmvMv.maintainTx(root, dup, batchId = 0L,
      groupCols = Seq("event_type", "day"), idCol = col("user_id")))
    assert(KmvMv.readMv(spark, root, schemaOf).select(col("n")).as[Long]
      .collect().sum == 2 * 400L + 2 * 3000L)

    // rollup from the COMMITTED column: type a (600 < k) must be
    // EXACT; type b's estimate equals the direct estimate exactly
    // (same merged sketch) and sits within the KMV error band of the
    // true distinct count (2 days overlap half: 1.5 × umax)
    val rolled = KmvMv.rollup(mv, Seq("event_type"))
      .select(col("event_type"), col("n_events"), col("n_keys"),
        col("du_est"))
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rolled("a")._2 == 800L && rolled("a")._3 == 2L)
    assert(rolled("a")._4 == 600.0, s"below-k must be exact: ${rolled("a")}")
    val bTrue = 3000.0 * 1.5
    assert(math.abs(rolled("b")._4 - bTrue) <= 0.10 * bTrue,
      s"type b estimate ${rolled("b")._4} vs true $bTrue")
    val directB = KmvMv.rollup(
      direct.collect { case ((tp, dy), sk) if tp == "b" => (tp, dy, sk, 1L) }
        .toSeq.toDF("event_type", "day", "sk", "n"),
      Seq("event_type"))
      .select(col("du_est")).as[Double].head()
    assert(rolled("b")._4 == directB,
      "MV-served estimate must equal the direct estimate exactly")
  }

  test("Doctor covers the MV group root: chain degrade -> compact repair, " +
      "rollup unchanged") {
    import graft.sinks.Doctor
    val root = TestTmp.dir("kmvmv_doc")
      .toString + "/mv"
    // 10 micro-batches, one commit each → 10 dirs unioned per read
    (0 until 10).foreach { i =>
      val rows = (0 until 200).map(u => ("t", s"2024-01-0${1 + i % 3}",
        (i * 200 + u).toLong))
      assert(KmvMv.maintainTx(root,
        rows.toDF("event_type", "day", "user_id")
          .withColumn("day", col("day").cast("date")),
        i, Seq("event_type", "day"), col("user_id")))
    }
    val schemaOf = Seq.empty[(String, java.sql.Date, Array[Long], Long, Long)]
      .toDF("event_type", "day", "sk", "n", "batch_id")
    val before = KmvMv.rollup(KmvMv.readMv(spark, root, schemaOf),
      Seq("event_type")).select(col("n_events"), col("n_keys"), col("du_est"))
      .as[(Long, Long, Double)].head()

    val bad = Doctor.examine(spark, root)
    val chain = bad.findings.find(_.check == "delta chain 'mv'")
      .getOrElse(fail("group root must report a per-table chain finding"))
    assert(!chain.ok && chain.remedy.contains("compactTxGroup"),
      s"10 dirs must degrade the finding: $chain")

    val fixed = Doctor.repairIndex(spark, root)
    assert(fixed.healthy, s"repair must fold the chain:\n${fixed.render}")

    // the compacted view serves the IDENTICAL rollup (KMV is
    // deterministic, so this is exact equality, estimates included)
    val after = KmvMv.rollup(KmvMv.readMv(spark, root, schemaOf),
      Seq("event_type")).select(col("n_events"), col("n_keys"), col("du_est"))
      .as[(Long, Long, Double)].head()
    assert(after == before, s"rollup drifted across compact: $before -> $after")
    assert(before._1 == 2000L && before._2 == 3L, s"counts: $before")
    assert(math.abs(before._3 - 2000.0) <= 200.0,
      s"2000 distinct ids within the KMV band: $before")
  }

  test("flavor guard: a QskMv writer pointed at a KmvMv root fails fast") {
    import graft.streaming.QskMv
    val root = TestTmp.dir("kmvflav").toString + "/mv"
    assert(KmvMv.maintainTx(root,
      Seq(("a", java.sql.Date.valueOf("2024-01-01"), 1L))
        .toDF("event_type", "day", "user_id"),
      0L, Seq("event_type", "day"), col("user_id")))
    // the same root through the OTHER flavor must refuse before any
    // commit — interleaved sketch encodings would corrupt the view
    val e = intercept[IllegalArgumentException] {
      QskMv.maintainTx(root,
        Seq(("a", java.sql.Date.valueOf("2024-01-01"), 2.0))
          .toDF("event_type", "day", "value"),
        1L, Seq("event_type", "day"), col("value"))
    }
    assert(e.getMessage.contains("flavor"), e.getMessage)
    // the ORIGINAL flavor continues unharmed
    assert(KmvMv.maintainTx(root,
      Seq(("a", java.sql.Date.valueOf("2024-01-01"), 2L))
        .toDF("event_type", "day", "user_id"),
      1L, Seq("event_type", "day"), col("user_id")))
  }

  test("kmv_union over a NULL sketch row skips it instead of NPE") {
    val df = Seq(Tuple1(Seq(1L, 5L, 9L)), Tuple1(null.asInstanceOf[Seq[Long]]),
        Tuple1(Seq(5L, 7L)))
      .toDF("sk")
    val merged = df.agg(Kmv.kmvMerge(col("sk")).as("m"))
      .select(col("m")).as[Array[Long]].head()
    assert(merged.toSeq == Seq(1L, 5L, 7L, 9L), merged.toSeq)
  }
}
