package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{PkTable, SchemaEvolution}

/** Property tests for the algebraic claims the engine's scale paths
  * rest on. These are the invariants cited in scaladocs:
  *  - salted two-phase compaction ≡ plain compaction (max_by is
  *    associative/commutative, so pre-folding per salt is legal);
  *  - compaction ≡ the latest-wins reference semantics under version
  *    collisions (the tie-break path);
  *  - lossless widening preserves every value bit-for-bit.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def checkProp(prop: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  // small changelogs with colliding keys AND colliding versions (the
  // tie-break path), ~10% deletes. seq is the row index — unique like
  // a binlog position, so (ver, seq) totally orders each key's rows
  // and the expected winner is well-defined (max_by ties on a fully
  // duplicated version struct are legitimately arbitrary).
  private val changelogGen: Gen[List[(Long, Long, Long, Double, Boolean)]] =
    Gen.listOfN(60, for {
      k   <- Gen.choose(0L, 7L)
      ver <- Gen.choose(0L, 5L)
      v   <- Gen.choose(-100.0, 100.0)
      del <- Gen.frequency(9 -> false, 1 -> true)
    } yield (k, ver, v, del)).map(_.zipWithIndex.map {
      case ((k, ver, v, del), i) => (k, ver, i.toLong, v, del)
    })

  private def reference(rows: List[(Long, Long, Long, Double, Boolean)]): Map[Long, (Long, Long, Double)] =
    rows.groupBy(_._1).flatMap { case (k, g) =>
      val latest = g.maxBy(r => (r._2, r._3))
      if (latest._5) None else Some(k -> ((latest._2, latest._3, latest._4)))
    }

  test("compact and compactSalted both equal the latest-wins reference") {
    checkProp(Prop.forAllNoShrink(changelogGen) { rows =>
      val df = rows.toDF("k", "ver", "seq", "v", "del")
      def run(out: org.apache.spark.sql.DataFrame) =
        out.select(col("k"), col("ver"), col("seq"), col("v"))
          .as[(Long, Long, Long, Double)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val plain = run(PkTable.compact(df, Seq("k"), Seq(col("ver"), col("seq")), col("del")))
      val salted = run(PkTable.compactSalted(df, Seq("k"), Seq(col("ver"), col("seq")), col("del"), salts = 4))
      val ref = reference(rows)
      plain == ref && salted == ref
    }, minTests = 15)
  }

  test("multi-writer merge is commit-order invariant (latestPerKey fold)") {
    // the transactional sink's correctness claim: for ANY partition of
    // a changelog into batches and ANY commit order of those batches,
    // folding with latestPerKey (tombstones retained) reaches the same
    // final table — because latest-wins by (ver, seq) is associative,
    // commutative, and idempotent over the union
    val batchedGen = for {
      rows  <- changelogGen
      cuts  <- Gen.choose(1, 4)
      order <- Gen.choose(0, 5)
    } yield (rows, cuts, order)
    checkProp(Prop.forAllNoShrink(batchedGen) { case (rows, nBatches, orderSeed) =>
      val batches = rows.zipWithIndex.groupMap(_._2 % nBatches)(_._1)
        .toList.sortBy(_._1).map(_._2)
      val order = new scala.util.Random(orderSeed).shuffle(batches.indices.toList)
      def fold(ixs: List[Int]): Map[Long, (Long, Long, Double, Boolean)] = {
        val start = batches(ixs.head)
          .toDF("k", "ver", "seq", "v", "del")
        val acc = ixs.tail.foldLeft(start) { (cur, i) =>
          PkTable.latestPerKey(
            cur.unionByName(batches(i).toDF("k", "ver", "seq", "v", "del")),
            Seq("k"), Seq(col("ver"), col("seq")))
        }
        PkTable.latestPerKey(acc, Seq("k"), Seq(col("ver"), col("seq")))
          .as[(Long, Long, Long, Double, Boolean)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      }
      val inOrder = fold(batches.indices.toList)
      val shuffled = fold(order)
      // live view matches the single-shot compact reference
      val live = inOrder.collect { case (k, (ver, seq, v, false)) => k -> ((ver, seq, v)) }
      inOrder == shuffled && live == reference(rows)
    }, minTests = 10)
  }

  test("bucketed range join equals the naive formulation for any bucket width") {
    val rjGen = for {
      pts <- Gen.listOfN(25, for {
        k <- Gen.choose(0L, 4L); p <- Gen.choose(0L, 500L)
      } yield (k, p))
      ivs <- Gen.listOfN(12, for {
        k <- Gen.choose(0L, 4L); s <- Gen.choose(0L, 450L); len <- Gen.choose(1L, 120L)
      } yield (k, s, s + len))
      width <- Gen.oneOf(1L, 7L, 64L, 128L, 1000L)
    } yield (pts, ivs, width)
    checkProp(Prop.forAllNoShrink(rjGen) { case (pts, ivs, width) =>
      val l = pts.zipWithIndex.map { case ((k, p), i) => (i.toLong, k, p) }
        .toDF("pid", "k", "p")
      val r = ivs.zipWithIndex.map { case ((k, s, e), i) => (i.toLong, k, s, e) }
        .toDF("iid", "k2", "s", "e")
      val got = graft.ops.RangeJoin.pointInInterval(l, r,
        leftKey = col("k"), point = col("p"),
        rightKey = col("k2"), start = col("s"), endExcl = col("e"),
        bucketWidth = width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val naive = l.join(r, col("k") === col("k2") && col("p") >= col("s") && col("p") < col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      got == naive
    }, minTests = 10)
  }

  test("lossless widening preserves every value") {
    import org.apache.spark.sql.types._
    val rowsGen = Gen.listOfN(30, for {
      i <- Gen.choose(Int.MinValue, Int.MaxValue)
      f <- Gen.choose(-1e6f, 1e6f)
    } yield (i, f))
    checkProp(Prop.forAllNoShrink(rowsGen) { rows =>
      val df = rows.toDF("i", "f")
      val target = StructType(Seq(StructField("i", LongType), StructField("f", DoubleType)))
      val wide = SchemaEvolution.widenTo(df, target)
        .as[(Long, Double)].collect().sortBy(r => (r._1, r._2)).toList
      val expect = rows.map { case (i, f) => (i.toLong, f.toDouble) }
        .sortBy(r => (r._1, r._2))
      wide == expect
    }, minTests = 8)
  }

  test("window-funnel kernel: first-anchor depth never exceeds max-anchor depth") {
    // random event streams over 3 step types + noise; both kernel
    // modes run pure-JVM via a crafted ArrayData
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val steps = Array("s0", "s1", "s2")
    val evGen = Gen.listOfN(25, for {
      ts <- Gen.choose(0L, 50L)
      et <- Gen.oneOf("s0", "s1", "s2", "zz")
    } yield (ts, et))
    checkProp(Prop.forAllNoShrink(evGen, Gen.oneOf(true, false)) { (evs, dedup) =>
      val arr = ArrayData.toArrayData(evs.map { case (ts, et) =>
        InternalRow(ts, UTF8String.fromString(et))
      }.toArray)
      val first = graft.functions.WindowFunnelImpl.depth(
        arr, steps, 20L, dedup, firstAnchorOnly = true)
      val best = graft.functions.WindowFunnelImpl.depth(
        arr, steps, 20L, dedup, firstAnchorOnly = false)
      first <= best && best <= steps.length &&
        (first > 0) == evs.exists(_._2 == "s0")
    }, minTests = 200)
  }

  test("Misra-Gries: superset + undercount bound for any stream and capacity") {
    val streamGen = for {
      n     <- Gen.choose(30, 300)
      items <- Gen.listOfN(n, Gen.choose(0, 20).map(i => s"i$i"))
      k     <- Gen.choose(2, 8)
    } yield (items, k)
    checkProp(Prop.forAllNoShrink(streamGen) { case (items, k) =>
      val agg = new graft.functions.HeavyHitters(k)
      // split the stream into chunks, reduce each, merge pairwise —
      // exercises the PODS'12 merge path, not just sequential reduce
      val sketch = items.grouped(math.max(1, items.size / 4))
        .map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      val n = items.size.toLong
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = exact.filter { case (_, c) => c > n / (k + 1) }.keySet
      sketch.size <= k &&
        heavy.subsetOf(sketch.keySet) &&
        sketch.forall { case (i, c) => c <= exact(i) && exact(i) - c <= n / (k + 1) }
    }, minTests = 300)
  }

  test("bounded top-k: any chunked merge equals the exact sorted head") {
    val streamGen = for {
      n     <- Gen.choose(0, 120)
      rows  <- Gen.listOfN(n, Gen.zip(Gen.choose(0.0, 10.0), Gen.choose(0L, 50L)))
      k     <- Gen.choose(1, 8)
      parts <- Gen.choose(1, 6)
    } yield (rows, k, parts)
    checkProp(Prop.forAllNoShrink(streamGen) { case (rows, k, parts) =>
      val agg = new graft.functions.TopKBy(k)
      val merged = if (rows.isEmpty) agg.zero
        else rows.grouped(math.max(1, rows.size / parts))
          .map(_.foldLeft(agg.zero)(agg.reduce))
          .reduce(agg.merge)
      val exact = rows.sortWith((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(k)
      merged == exact
    }, minTests = 300)
  }

  test("sliding chunks: full coverage, stride-aligned starts, hash locality") {
    val docGen = for {
      n      <- Gen.choose(1, 40)
      toks   <- Gen.listOfN(n, Gen.alphaLowerStr.map(s => "t" + s.take(3)))
      chunk  <- Gen.choose(1, 10)
      stride <- Gen.choose(1, 10)
    } yield (toks, chunk, stride)
    checkProp(Prop.forAllNoShrink(docGen) { case (toks, chunk, stride) =>
      val df = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val rows = graft.ops.Packing.chunkSliding(df, col("doc_id"), col("text"),
          chunk, stride)
        .select(col("chunk_idx"), col("start_tok"), col("n_tok"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toList
      val starts = rows.map(_._2)
      val expectStarts = (0L until toks.size.toLong by stride.toLong).toList
      starts == expectStarts &&
        rows.forall { case (i, s, n) =>
          i == s / stride && n == math.min(chunk.toLong, toks.size - s) } &&
        // overlapping mode (chunk ≥ stride) covers every token; a
        // stride larger than the chunk legitimately samples with gaps
        (stride > chunk ||
          toks.indices.forall(p => rows.exists { case (_, s, n) => p >= s && p < s + n }))
    }, minTests = 60)
  }
}
