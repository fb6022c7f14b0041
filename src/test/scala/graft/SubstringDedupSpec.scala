package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** ExactSubstr dedup (Lee et al. 2022): maximal ≥ k-token repeated
  * spans at arbitrary offsets — including the cases fixed-boundary
  * segment dedup (C32) and doc-level MinHash structurally miss. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("a 60-token span shared by 2 docs is found; segment dedup misses it") {
    // the same 60 tokens sit at offset 10 in doc 1 and offset 25 in doc 2,
    // inside otherwise-disjoint text
    val shared = words("dup", 60)
    val doc1 = (words("a", 10) ++ shared ++ words("b", 30)).mkString(" ")
    val doc2 = (words("c", 25) ++ shared ++ words("d", 15)).mkString(" ")
    val df = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")

    val spans = Dedup.substringSpans(df, col("doc_id"), col("text"), k = 50)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // exactly the shared span, maximal, in both docs (1-based inclusive)
    assert(spans == Seq((1L, 11L, 70L, 60L), (2L, 26L, 85L, 60L)))

    // fixed 50-token segments at the same k: boundaries at 1/51/101 never
    // line up with offsets 10 and 25, so no segment repeats across docs
    val seg = Dedup.segmentDedup(df, col("doc_id"), col("text"),
      segLen = 50, minDocs = 2)
      .select(col("doc_id"), col("n_kept")).as[(Long, Long)].collect().toMap
    val nSegs1 = math.ceil(100 / 50.0).toLong
    val nSegs2 = math.ceil(100 / 50.0).toLong
    assert(seg(1L) == nSegs1 && seg(2L) == nSegs2) // nothing removed → missed
  }

  test("a span repeated twice within ONE doc is found (self-repeat)") {
    val rep = words("r", 25)
    val doc = (rep ++ words("x", 10) ++ rep).mkString(" ")
    val spans = Dedup.substringSpans(Seq((7L, doc)).toDF("doc_id", "text"),
      col("doc_id"), col("text"), k = 25)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(spans == Seq((7L, 1L, 25L, 25L), (7L, 36L, 60L, 25L)))
  }

  test("overlapping and abutting duplicated windows merge into one maximal span") {
    // doc 1 repeats tokens [1..12] of doc 2's [1..12]: with k=5 the
    // duplicated windows at positions 1..8 merge into ONE span [1,12]
    val common = words("m", 12)
    val df = Seq(
      (1L, (common ++ words("p", 5)).mkString(" ")),
      (2L, (words("q", 4) ++ common).mkString(" "))).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(df, col("doc_id"), col("text"), k = 5)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(spans == Seq((1L, 1L, 12L, 12L), (2L, 5L, 16L, 12L)))
  }

  test("distinct docs yield no spans; docs shorter than k are skipped") {
    val df = Seq((1L, words("a", 30).mkString(" ")),
      (2L, words("b", 30).mkString(" ")),
      (3L, "tiny doc")).toDF("doc_id", "text")
    assert(Dedup.substringSpans(df, col("doc_id"), col("text"), k = 20).count() == 0)
  }

  test("substringClean removes exactly the duplicated span and keeps order") {
    val shared = words("s", 20)
    val head = words("h", 5)
    val tail = words("t", 5)
    val df = Seq(
      (1L, (head ++ shared ++ tail).mkString(" ")),
      (2L, shared.mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.substringClean(df, col("doc_id"), col("text"), k = 20)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((30L, 20L, (head ++ tail).mkString(" "))))
    assert(got(2L) == ((20L, 20L, ""))) // fully duplicated doc empties out
    // an untouched doc passes through verbatim with dup_tokens = 0
    val solo = Seq((9L, words("z", 25).mkString(" "))).toDF("doc_id", "text")
    val s = Dedup.substringClean(solo, col("doc_id"), col("text"), k = 20)
      .as[(Long, Long, Long, String)].head()
    assert(s == ((9L, 25L, 0L, words("z", 25).mkString(" "))))
  }

  test("substringContamination: ref-leaked span found; train-train repeats do NOT mark") {
    val leaked = words("leak", 30)
    val trainDup = words("td", 30)
    // doc 1 leaks the ref excerpt at offset 5; docs 2+3 share a span
    // with EACH OTHER only (dedup's business, not decontamination's)
    val t1 = (words("p", 5) ++ leaked ++ words("q", 10)).mkString(" ")
    val t2 = (trainDup ++ words("u", 10)).mkString(" ")
    val t3 = (words("v", 8) ++ trainDup).mkString(" ")
    val train = Seq((1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text")
    val ref = Seq((100L, (words("r", 12) ++ leaked).mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.substringContamination(train, col("doc_id"), col("text"),
        ref, col("doc_id"), col("text"), k = 25)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // only doc 1's leaked span, maximal (1-based inclusive: 6..35)
    assert(got == Seq((1L, 6L, 35L, 30L)), got.toString)
  }
}
