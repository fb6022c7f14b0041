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
    assert(Dedup.editDistancePairs(emptyDocs, col("doc_id"), col("text"))
      .count() == 0)
    // shorter than the gram width → fingerprint 0 for both → banded
    // together, verified by editSim ("one"/"two" at lev 3 of len 3
    // fails 0.8; identical empties pass via the 0/0 guard)
    val short = Seq((1L, "one"), (2L, "two"), (3L, ""), (4L, ""))
      .toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(short, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((3L, 4L)))
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

  test("r6 ops tolerate degenerate inputs") {
    import graft.ops.{Mixture, Packing, TextAnalysis}
    // empty corpus: every new op yields an empty (not failing) frame
    assert(Packing.chunkSliding(emptyDocs, col("doc_id"), col("text"), 64, 48).count() == 0)
    assert(TextAnalysis.bpePairCounts(emptyDocs, col("text"), 10).count() == 0)
    assert(TextAnalysis.gopherFilter(emptyDocs, col("doc_id"), col("text")).count() == 0)
    assert(Mixture.temperatureWeights(emptyDocs.withColumn("lang", lit("en")),
      col("lang"), lit(1L)).count() == 0)

    // empty TEXT: no NaN poisoning — the doc is cleanly rejected
    val withEmpty = Seq((1L, ""), (2L, (1 to 30).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val gf = TextAnalysis.gopherFilter(withEmpty, col("doc_id"), col("text"))
      .select(col("doc_id"), col("punct_ratio"), col("keep"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(!gf(1L)._1.isNaN && !gf(1L)._2) // rejected, ratio finite
    assert(gf(2L)._2)

    // single stratum: mixture weight is exactly 1
    val one = Seq(("en", 10L), ("en", 20L)).toDF("lang", "n")
    val w = Mixture.temperatureWeights(one, col("lang"), col("n"))
      .select(col("weight")).as[Double].head()
    assert(w == 1.0)

    // sketch capacity above the domain: MG is exact
    val agg = new graft.functions.HeavyHitters(10)
    val exact = List("a", "b", "a", "c", "a", "b")
      .foldLeft(agg.zero)(agg.reduce)
    assert(exact == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))

    // unicode tokens survive chunk hashing and pair counting
    val uni = Seq((1L, "naïve café naïve café")).toDF("doc_id", "text")
    assert(Packing.chunkSliding(uni, col("doc_id"), col("text"), 2, 2).count() == 2)
    val pairs = TextAnalysis.bpePairCounts(uni, col("text"), 5)
      .as[(String, Long)].collect().toMap
    assert(pairs("café naïve") == 1L && pairs("naïve café") == 2L)
  }

  test("thumbnail tolerates an empty payload (sequence(1,0) trap)") {
    import graft.ops.Multimodal
    val withEmpty = Seq((1L, ""), (2L, "abcdefgh")).toDF("doc_id", "text")
    val rows = Multimodal.thumbnail(withEmpty, col("doc_id"), col("text"), step = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // empty payload → empty thumb, md5(''), like the oracle's range(1,1,4)
    assert(rows(1L) == ((0L, 0L, "d41d8cd98f00b204e9800998ecf8427e")))
    assert(rows(2L)._2 == 2L) // chars 1 and 5 kept
  }

  test("r8 ops tolerate degenerate inputs") {
    import graft.ops.Multimodal
    // audio: empty and sub-sample payloads → zero frames, zero energy
    val audio = Multimodal.audioEnergy(
        Seq((1L, ""), (2L, "x"), (3L, "xy")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audio(1L) == ((0L, 0L)) && audio(2L) == ((0L, 0L)) && audio(3L) == ((1L, 1L)))
    // embedding decontamination: an empty eval slice flags nothing
    val vecs = Seq((1L, Array.fill(64)(1.0f)), (2L, Array.fill(64)(-1.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.decontaminateByEmbedding(vecs, col("vec_id"),
      col("embedding"), isEval = _ < 0, threshold = 0.3, bands = 16).count() == 0)
    // CDC chunking on empty/short texts: one chunk per non-empty doc,
    // sub-window docs produce no boundary candidates (sequence guard)
    val chunks = SparkEntry.queries("chunk_cdc")(spark, sfDir)
    assert(chunks.where(col("n_chunks") < 1).count() == 0)
    // perplexity buckets on a corpus too small for 3 buckets: every
    // doc lands somewhere, nothing throws, masses add up
    val b = SparkEntry.queries("quality_perplexity_buckets")(spark, sfDir)
      .agg(sum(col("n_docs"))).as[Long].head()
    val scoreable = Tables.documents(spark, sfDir)
      .where(size(split(col("text"), " ")) >= 2).count()
    assert(b == scoreable, s"bucketed $b of $scoreable scoreable docs")
  }
}
