package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{CdcGenerator, PkTable}
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Degenerate-input hardening: operators must return empty/identity
  * results, not throw, on empty frames and trivial documents.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("dedup operators tolerate empty and single-word corpora") {
    assert(Dedup.minhashLshPairs(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, col("doc_id"), col("text")).count() == 0)
    val tiny = Seq((1L, "one"), (2L, "two words")).toDF("doc_id", "text")
    // fewer words than the shingle width → no shingles → no pairs
    assert(Dedup.ngramJaccardPairs(tiny, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.simhash32(tiny, col("doc_id"), col("text")).count() == 2)
    assert(Dedup.duplicateClusters(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() == 0)
  }

  test("r2 ops tolerate empty inputs") {
    import graft.ops.Profiling
    // profiling an empty table: zero nulls, zero distincts — not SQL nulls
    val stats = Profiling.columnStats(emptyDocs, Seq("doc_id", "text")).collect()
    assert(stats.length == 2)
    assert(stats.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L))
    // decontamination with an empty reference flags nothing
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(Dedup.ngramOverlapHits(docs, col("doc_id"), col("text"),
      emptyDocs, col("text")).count() == 0)
    // incremental dedup with an empty corpus finds nothing
    assert(Dedup.minhashLshPairsAgainst(emptyDocs, col("doc_id"), col("text"),
      docs, col("doc_id"), col("text")).count() == 0)
  }

  test("PkTable.compact on an empty changelog yields an empty table") {
    val empty = Seq.empty[(Long, Long, String, Boolean)].toDF("k", "ver", "v", "del")
    assert(PkTable.compact(empty, Seq("k"), Seq(col("ver")), col("del")).count() == 0)
  }

  test("similarity ops tolerate an empty corpus") {
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.cosinePairs(emptyVecs, col("vec_id"), col("embedding"), 0.4).count() == 0)
    assert(Similarity.topkBruteForce(emptyVecs, col("vec_id"), col("embedding"),
      _ % 2 === 0, k = 3).count() == 0)
  }

  test("text analysis tolerates empty strings") {
    val d = Seq((1L, "")).toDF("doc_id", "text")
    val q = TextAnalysis.tokenCounts(d, col("doc_id"), col("text")).collect()(0)
    assert(q.getAs[Long]("ws_tokens") == 1L) // split("") → [""], like the oracle
    assert(TextAnalysis.winnowFingerprint(d, col("doc_id"), col("text")).count() == 0)
  }

  test("CdcGenerator is deterministic and respects the op mix") {
    val a = CdcGenerator.envelopes(spark, 1000).collect().map(_.getString(0))
    val b = CdcGenerator.envelopes(spark, 1000).collect().map(_.getString(0))
    assert(a.toSeq == b.toSeq)
    val dels = a.count(_.contains("\"op\":\"d\""))
    assert(dels > 50 && dels < 200) // ~10% deletes
    // generated envelopes drive the real pipeline
    val payload = StructType(Seq(StructField("id", LongType),
      StructField("seq", LongType), StructField("value", DoubleType)))
    val cfg = CdcPipeline.Config(payload, "id", "seq")
    val table = CdcPipeline.materialize(
      Seq.empty[(Long, Long, Double)].toDF("id", "seq", "value"),
      CdcPipeline.unwrapBatch(a.toSeq.toDF("json"), "json", cfg), cfg)
    assert(table.count() > 0)
    assert(table.select("id").distinct().count() == table.count()) // PK property
  }
}
