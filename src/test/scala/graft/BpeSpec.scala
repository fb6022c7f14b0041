package graft

import org.apache.spark.sql.functions._
import graft.functions.BpeImpl
import graft.ops.Bpe

/** BPE apply: kernel vs an independent one-merge-at-a-time reference,
  * hierarchical merge tables, and the Spark column/id plumbing. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Deliberately elementary reference: find the lowest-(rank, position)
    * occurrence of any table pair, merge that SINGLE occurrence, and
    * start over — no batching, no per-rank passes. */
  private def reference(words: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
    var units = words.toVector
    var go = true
    while (go) {
      val hits = for {
        (p, r) <- merges.zipWithIndex
        i <- units.indices.dropRight(1)
        if units(i) == p._1 && units(i + 1) == p._2
      } yield (r, i)
      if (hits.isEmpty) go = false
      else {
        val (_, i) = hits.min
        units = (units.take(i) :+ (units(i) + " " + units(i + 1))) ++ units.drop(i + 2)
      }
    }
    units
  }

  private def kernel(words: Seq[String], merges: Seq[(String, String)]): Seq[String] =
    BpeImpl.encode(words.toArray, merges.map(_._1).toArray, merges.map(_._2).toArray).toSeq

  test("kernel equals the one-merge-at-a-time reference on randomized corpora") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c", "d", "e")
    for (trial <- 1 to 200) {
      val words = Seq.fill(2 + rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.size)))
      // random base-word merge table (distinct pairs, random order = ranks)
      val merges = rnd.shuffle(
        (for (x <- alphabet; y <- alphabet) yield (x, y)).toVector).take(1 + rnd.nextInt(8))
      assert(kernel(words, merges) == reference(words, merges),
        s"trial $trial: words=$words merges=$merges")
    }
  }

  test("hierarchical merge tables (components that are merged units) work") {
    // rank1 builds "a b"; rank2 merges the MERGED unit with c
    val merges = Seq(("a", "b"), ("a b", "c"))
    assert(kernel(Seq("a", "b", "c", "d"), merges) == Seq("a b c", "d"))
    assert(reference(Seq("a", "b", "c", "d"), merges) == Seq("a b c", "d"))
    // rank order decides: with the pair rank flipped, (a,b) still wins
    // first wherever it occurs, and the hierarchy still resolves
    val flipped = Seq(("b", "c"), ("a", "b c"))
    assert(kernel(Seq("a", "b", "c"), flipped) == Seq("a b c"))
    // overlapping same-rank occurrences merge left-to-right
    assert(kernel(Seq("a", "a", "a"), Seq(("a", "a"))) == Seq("a a", "a"))
    assert(kernel(Seq("a", "a", "a", "a"), Seq(("a", "a"))) == Seq("a a", "a a"))
  }

  test("mergeTable ranks by (count desc, pair asc) and encodeWithIds is dense") {
    val df = Seq(
      (1L, "x y x y z w"),
      (2L, "x y q"),
      (3L, "z w")).toDF("doc_id", "text")
    val merges = Bpe.mergeTable(df, col("text"), k = 2)
    // "x y" occurs 3×, "z w" 2× → ranks 1, 2
    assert(merges == Seq(("x", "y"), ("z", "w")))
    val out = Bpe.encodeWithIds(df, col("doc_id"), col("text"), merges)
      .orderBy(col("doc_id"), col("seq"))
      .as[(Long, Long, String, Long)].collect().toSeq
    val tokens = out.map(_._3)
    assert(out.filter(_._1 == 1L).map(_._3) == Seq("x y", "x y", "z w"))
    assert(out.filter(_._1 == 2L).map(_._3) == Seq("x y", "q"))
    // ids are dense 1..|vocab| in lexicographic token order
    val vocab = tokens.distinct.sorted
    val idOf = out.map(r => r._3 -> r._4).toMap
    assert(vocab.zipWithIndex.forall { case (t, i) => idOf(t) == i + 1 })
  }

  test("encodeWithIds: dense lexicographic ids across many prefix buckets, " +
    "and the plan has NO unpartitioned window") {
    // Tokens spanning many 2-char prefix buckets, including 1-char
    // tokens (whose prefix is a proper prefix of longer tokens — the
    // boundary case of the monotone-bucketing argument) and repeats.
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "ab", "abc", "b", "ba", "bb", "c", "ca",
      "q", "qq", "qqq", "z", "zz", "x y", "!", "!!", "0", "01")
    val docs = (1L to 60L).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val out = Bpe.encodeWithIds(df, col("doc_id"), col("text"), merges = Nil)
    val rows = out.as[(Long, Long, String, Long)].collect().toSeq
    // global contract: ids dense 1..|vocab| in binary token order
    val idOf = rows.map(r => r._3 -> r._4).toMap
    val vocab = rows.map(_._3).distinct.sorted
    assert(vocab.zipWithIndex.forall { case (t, i) => idOf(t) == i + 1 },
      s"ids not dense-lexicographic: ${vocab.map(t => t -> idOf(t))}")
    // scale assertion (the r9-verdict fix): every WindowExec in the
    // executed plan is PARTITIONED — the vocabulary numbering never
    // runs as a single-task global sort
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def windows(p: SparkPlan): Seq[WindowExec] = p.collect {
      case w: WindowExec => Seq(w)
      case a: AdaptiveSparkPlanExec => windows(a.executedPlan)
    }.flatten
    val ws = windows(out.queryExecution.executedPlan)
    assert(ws.nonEmpty, "expected the bucketed numbering WindowExec")
    ws.foreach(w => assert(w.partitionSpec.nonEmpty,
      s"unpartitioned WindowExec in bpe_encode plan:\n$w"))
  }

  test("trainMerges is truly iterative: later rounds rank pairs of MERGED units") {
    // corpus "a b c a b c": static pair counts are (a,b)=2, (b,c)=2,
    // (c,a)=1 — a static top-2 table would adopt (a,b) then (b,c).
    // The trainer instead recounts after merging (a,b): the state is
    // ["a b", c, "a b", c], where ("a b", c)=2 dominates — a pair that
    // does not even exist in the static statistic.
    val df = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val got = Bpe.trainMerges(df, col("text"), rounds = 2)
    assert(got == Seq((1L, "a", "b", 2L), (2L, "a b", "c", 2L)))
    // and the static ranking really would have differed
    assert(Bpe.mergeTable(df, col("text"), k = 2) == Seq(("a", "b"), ("b", "c")))
    // exhaustion: a one-pair corpus stops after all pairs merge away
    val tiny = Seq((1L, "p q")).toDF("doc_id", "text")
    assert(Bpe.trainMerges(tiny, col("text"), rounds = 5) ==
      Seq((1L, "p", "q", 1L)))
  }
}
