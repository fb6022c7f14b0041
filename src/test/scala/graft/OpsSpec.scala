package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again today"),
    (1L, "the quick brown fox jumps over the lazy dog again and again tomorrow"), // near-dup of 0
    (2L, "completely different content about spark engines and shuffles at scale"),
    (3L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 0
  ).toDF("doc_id", "text")

  test("bloom-pruned decontamination equals the exact operator, plan carries the probe") {
    import graft.ops.Dedup
    val d = Tables.documents(spark, sfDir)
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("id").as[(Long, Long)].collect().toSeq
    val exact = run(Dedup.ngramOverlapHits(
      d.where(col("doc_id") % 10 =!= 3), col("doc_id"), col("text"),
      d.where(col("doc_id") % 10 === 3), col("text")))
    val bloomed = Dedup.ngramOverlapHitsBloom(
      d.where(col("doc_id") % 10 =!= 3), col("doc_id"), col("text"),
      d.where(col("doc_id") % 10 === 3), col("text"))
    assert(run(bloomed) == exact && exact.nonEmpty)
    // the prune really is in the plan (pre-join Filter with the probe)
    assert(bloomed.queryExecution.executedPlan.toString.contains("bloom_contains"))
  }

  test("exact dedup groups exact duplicates, keeps min id") {
    val g = Dedup.exactGroups(docs, col("doc_id"), md5(col("text")))
    assert(g.count() == 3)
    val dup = g.where(col("n_copies") === 2).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("keep_id") == 0L)
  }

  test("minhash-LSH finds near-dups and exact dups, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // near-dups
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("incremental minhash dedup pairs the batch against the corpus only") {
    // corpus: 0 (and 2, unrelated); batch: 1 (near-dup of 0), 3 (exact
    // dup of 0). Corpus-internal pairs (0,2) and batch-internal pairs
    // (1,3) must NOT appear.
    val corpus = docs.where(col("doc_id").isin(0L, 2L))
    val batch = docs.where(col("doc_id").isin(1L, 3L))
    val pairs = Dedup.minhashLshPairsAgainst(
      corpus, col("doc_id"), col("text"), batch, col("doc_id"), col("text"))
      .select("new_id", "prior_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 0L), (3L, 0L)))
  }

  test("ngram jaccard matches brute-force on the same pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"))
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((0L, 3L)) == 1.0)
    assert(pairs((0L, 1L)) > 0.8 && pairs((0L, 1L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("duplicate clusters: transitive pairs collapse to one component") {
    // chain 1-2, 2-3 plus isolated pair 7-9: components {1,2,3}, {7,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val c = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(c(1L) == 1L && c(2L) == 1L && c(3L) == 1L)
    assert(c(7L) == 7L && c(9L) == 7L)
  }

  test("simhash: identical docs have hamming 0; near-dups small hamming") {
    val sim = Dedup.simhash32(docs, col("doc_id"), col("text"))
    val h = sim.as[(Long, Long)].collect().toMap
    assert(h(0L) == h(3L))
    assert(java.lang.Long.bitCount(h(0L) ^ h(1L)) <= 6)
    assert(h(0L) >= 0 && h(0L) < (1L << 32))
  }

  test("simhash64 banding: 4 bands x 16 bits, lossless at hamming <= 3") {
    // synthetic fingerprints exercise every band including the sign
    // bit (band 3 = bits 48-63: arithmetic shiftright must be masked)
    val sim = Seq(
      (1L, 0L),
      (2L, 1L << 63),                                     // hamming(1,2)=1
      (3L, (1L << 63) | (1L << 47) | (1L << 31) | (1L << 15)), // 1 bit per band
      (4L, 0L)                                            // exact dup of 1
    ).toDF("id", "simhash")
    val got = Dedup.simhashPairs(sim, maxHamming = 3, bits = 64)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // (1,3)/(3,4) are hamming 4 — every band differs, so they are not
    // even candidates; (2,3) shares only band 3 (both 0x8000 after
    // mask) and survives at hamming 3
    assert(got == Map((1L, 2L) -> 1L, (1L, 4L) -> 0L, (2L, 3L) -> 3L, (2L, 4L) -> 1L))
  }

  test("edit-distance dedup: typo variants pair, rewrites don't, never all-pairs") {
    // long enough that one edit moves only ~6 of ~520 6-grams — the
    // operator targets document-scale text, not tweets
    val base = "pack my box with five dozen liquor jugs while the jay " +
      "quickly vexed a dwarf zombie under the bright warm afternoon sun " +
      "near the old stone bridge across the quiet river valley where tall " +
      "green trees sway gently in the light summer breeze carrying distant " +
      "bird songs over meadows full of yellow flowers and small humming " +
      "insects that drift lazily between ancient mossy boulders while " +
      "farmers gather ripe golden wheat into tidy bundles before evening " +
      "rain clouds roll slowly down from high granite peaks covered in " +
      "late spring snow"
    val typo = base.updated(100, 'x') // 1 substitution (both hash views stay close)
    val other = "completely different content about spark shuffles and " +
      "partitions with entirely unrelated words in a long enough body " +
      "that gram statistics are stable"
    val df = Seq((1L, base), (2L, typo), (3L, other), (4L, ""), (5L, ""))
      .toDF("doc_id", "text")
    val q = Dedup.editDistancePairs(df, col("doc_id"), col("text"))
    val m = q.select("doc_a", "doc_b", "lev", "edit_sim")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(m((1L, 2L))._1 === 1L)          // the typo pair, exact distance
    assert(m((1L, 2L))._2 > 0.99)
    assert(m((4L, 5L)) === ((0L, 1.0)))    // empty-vs-empty: 0/0 guard
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L)) // rewrite excluded
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "edit dedup must stay banded")
  }

  test("SimHashGramsPair: fp1 is bit-identical to SimHashGrams; fp2 from the digest tail") {
    import graft.functions.SimHashGramsImpl
    import org.apache.spark.unsafe.types.UTF8String
    // the single-digest pair's first view must equal the classic
    // fingerprint EXACTLY — that is what keeps editdist banding
    // unchanged across the r9 one-pass rewrite — and the second view
    // must equal a from-scratch fold of md5 bytes 8-15
    val samples = Seq("", "ab", "abcdef", "abcdefg",
      "the quick brown fox jumps over the lazy dog " * 5,
      "𝄞a𝄢b astral-plane codepoints count one position each padded")
    samples.foreach { s =>
      val u = UTF8String.fromString(s)
      val pair = SimHashGramsImpl.computePair(u, 6)
      assert(pair.getLong(0) == SimHashGramsImpl.compute(u, 6),
        s"fp1 diverged on '${s.take(30)}'")
      // fp2 reference: fold the tail half of each gram digest
      val cp = s.codePoints().toArray
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new Array[Int](64)
      (0 to cp.length - 6).foreach { i =>
        val d = md.digest(new String(cp, i, 6).getBytes("UTF-8"))
        var h = 0L; (8 until 16).foreach(b => h = (h << 8) | (d(b) & 0xffL))
        (0 until 64).foreach(j =>
          counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1))
      }
      var want = 0L
      (0 until 64).foreach(j => if (counts(j) > 0) want |= (1L << j))
      assert(pair.getLong(1) == want, s"fp2 diverged on '${s.take(30)}'")
    }
  }

  test("simhash_grams: wrong arity raises a named error, not an index crash") {
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val one = intercept[Throwable] {
      spark.sql("SELECT simhash_grams('abc')").collect()
    }
    assert(msgChain(one).contains("2 arguments"), s"got: ${msgChain(one)}")
    val three = intercept[Throwable] {
      spark.sql("SELECT simhash_grams('abc', 3, 4)").collect()
    }
    assert(msgChain(three).contains("2 arguments"), s"got: ${msgChain(three)}")
  }

  test("simhash_grams: short strings fingerprint to 0, codepoint windows") {
    val got = spark.range(1)
      .select(
        call_function("simhash_grams", lit(""), lit(3)).as("e"),
        call_function("simhash_grams", lit("ab"), lit(3)).as("s"),
        call_function("simhash_grams", lit("abc"), lit(3)).as("one"),
        // 4 codepoints (astral plane chars are ONE position each, as in
        // DuckDB substr): gram set {𝄞a𝄢, a𝄢b} — 2 grams, not the 6 a
        // UTF-16 code-unit window would produce
        call_function("simhash_grams", lit("𝄞a𝄢b"), lit(3)).as("cp"))
      .head()
    assert(got.getLong(0) === 0L && got.getLong(1) === 0L)
    assert(got.getLong(2) !== 0L)
    // the codepoint fingerprint equals the explicit 2-gram construction
    val grams = Seq("𝄞a𝄢", "a𝄢b")
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    grams.foreach { g =>
      val d = md.digest(g.getBytes("UTF-8"))
      var h = 0L; (0 until 8).foreach(b => h = (h << 8) | (d(b) & 0xffL))
      (0 until 64).foreach(j =>
        counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1))
    }
    var want = 0L
    (0 until 64).foreach(j => if (counts(j) > 0) want |= (1L << j))
    assert(got.getLong(3) === want)
  }

  test("simhash64 fingerprints use the full 64-bit range") {
    val sim = Dedup.simhash64(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(sim(0L) == sim(3L))
    // some real doc sets a bit above 32 (i.e. the fingerprint is not
    // secretly 32-bit)
    assert(sim.values.exists(v => (v >>> 32) != 0L))
  }

  test("PPJoin prefix filter keeps hot shingles out of prefixes") {
    // 30 sets of 10 tokens: 9 unique each + 1 universal boilerplate
    // token (999). Frequency-ascending canonical order puts the
    // universal token last, so no 3-token prefix contains it and the
    // prefix self-join has NO quadratic bucket.
    val tok = (0 until 30).flatMap { i =>
      (0 until 9).map(j => (i.toLong, 10L, (i * 100 + j).toLong)) :+ ((i.toLong, 10L, 999L))
    }.toDF("id", "sz", "t")
    val prefix = graft.ops.Dedup.prefixRows(tok, 4, 5) // t=0.8: p = 10 - 8 + 1 = 3
    assert(prefix.where(col("t") === 999L).count() == 0)
    val perDoc = prefix.groupBy("id").count().as[(Long, Long)].collect()
    assert(perDoc.length == 30 && perDoc.forall(_._2 == 3L))
  }

  test("ngram jaccard stays correct and skew-free with universal boilerplate") {
    // every doc ends with the same boilerplate sentence; only docs 0/1
    // are near-duplicates of each other
    val boiler = "common boiler plate text here"
    val head = (0 until 30).map(j => s"w$j").mkString(" ")
    // J(0,1) = 31/36 ≈ 0.861 (28 shared head shingles + 3 boiler-interior)
    val docs = Seq(
      (0L, s"$head $boiler"),
      (1L, s"$head k $boiler")) ++
      (2 until 20).map(i => (i.toLong, s"x$i y$i z$i w$i v$i $boiler"))
    val df = docs.toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, col("doc_id"), col("text"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("duplicateClusters converges on a long chain via pointer jumping") {
    // a 200-node chain has diameter 199 — naive min-label propagation
    // needs 199 rounds; pointer jumping needs ~log2(199) ≈ 8
    val n = 200
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val local = Dedup.duplicateClusters(chain).as[(Long, Long)].collect()
    assert(local.length == n && local.forall(_._2 == 0L))
    // reliable-checkpoint path (executor-loss-tolerant on a cluster).
    // The checkpoint dir is deleted by a SHUTDOWN HOOK, not in finally:
    // setCheckpointDir sticks to the shared SparkContext, so any later
    // test that checkpoints would silently recreate a deleted dir (the
    // leak a finally-delete caused) — one JVM-wide dir, reaped at exit,
    // leaves /tmp clean without racing the shared session.
    val ckptDir = TestTmp.dir("graft-ckpt")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        val walk = java.nio.file.Files.walk(ckptDir)
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        finally walk.close()
      } catch { case _: java.io.IOException => () }))
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val reliable = Dedup.duplicateClusters(chain).as[(Long, Long)].collect()
    assert(reliable.length == n && reliable.forall(_._2 == 0L))
  }

  test("cosine math matches a hand computation") {
    val v = Seq((1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(0.6f, 0.8f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("id", "v")
    val cos = v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        Similarity.cosine(col("a.v"), col("b.v")).as("c"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // float32 inputs: 0.6f/0.8f carry ~1e-8 representation error
    assert(math.abs(cos((1L, 2L)) - 0.6) < 1e-6)
    assert(math.abs(cos((1L, 3L))) < 1e-6)
  }

  test("brute-force topk returns k ordered neighbors per query") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Similarity.topkBruteForce(emb, col("vec_id"), col("embedding"),
      isQuery = _ % 100 === 0, k = 3).collect()
    val byQ = out.groupBy(_.getAs[Long]("qid"))
    assert(byQ.values.forall(_.length == 3))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Double]("cos")).sliding(2).forall(p => p.head >= p.last))
    }
  }

  test("IVF: every vector lands in exactly one cell; in-cell topk ranked") {
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    val out = Similarity.ivfTopk(emb, col("vec_id"), col("embedding"),
      isCentroid = _ % 10 === 0, isQuery = _ % 30 === 0, k = 2).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("rank") <= 2))
  }

  test("IVF nprobe: probe #1 is the assigned cell; nprobe=2 only adds neighbors") {
    val emb = Tables.embeddings(spark, sfDir)
    def run(np: Int) = Similarity.ivfTopk(emb, col("vec_id"), col("embedding"),
      isCentroid = _ % 25 === 0, isQuery = _ % 40 === 0, k = 3, nprobe = np)
      .select("qid", "rank", "nid", "cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    val one = run(1)
    val two = run(2)
    // same queries, same k; nprobe=2 can only improve (or tie) each
    // rank's cosine — per query, the rank-1 cosine never decreases
    def best(s: Set[(Long, Long, Long, Double)]) =
      s.filter(_._2 == 1L).map(r => r._1 -> r._4).toMap
    val b1 = best(one); val b2 = best(two)
    assert(b1.keySet == b2.keySet)
    assert(b1.forall { case (q, c) => b2(q) >= c })
  }

  test("decontamination flags docs overlapping the reference slice") {
    val docs = Seq(
      (1L, "the secret eval question about spark shuffles appears here"),
      (2L, "totally unrelated training document about cooking pasta properly"),
      (3L, "the secret eval question about nothing"), // ref slice (3 % 10 == 3)
      (11L, "another clean doc speaking of gardens and rain")
    ).toDF("doc_id", "text")
    val hits = Dedup.ngramOverlapHits(
      train = docs.where(col("doc_id") % 10 =!= 3), trainId = col("doc_id"),
      trainText = col("text"),
      ref = docs.where(col("doc_id") % 10 === 3), refText = col("text"),
      shingleN = 3, minHits = 2)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares "the secret eval", "secret eval question",
    // "eval question about" with doc 3 → 3 hits; docs 2/11 clean
    assert(hits == Map(1L -> 3L))
  }

  test("column profiling counts nulls and distincts in one pass") {
    import graft.ops.Profiling
    val df = Seq((Some(1L), Some("a")), (Some(1L), None), (None, Some("b")))
      .toDF("k", "v")
    val stats = Profiling.columnStats(df, Seq("k", "v"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(stats("k") == (1L, 1L)) // one null, one distinct value
    assert(stats("v") == (1L, 2L))
    val approx = Profiling.approxColumnStats(df, Seq("k", "v"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(approx == Map("k" -> 1L, "v" -> 1L)) // null counts exact
  }

  test("langId picks the language with most stopword hits") {
    val d = Seq((1L, "the cat of the house is in the garden"),
      (2L, "el gato de la casa es un animal"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(d, col("doc_id"), col("text"))
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en"); assert(out(2L) == "es"); assert(out(3L) == "und")
  }

  test("quality score components are consistent") {
    val d = Seq((1L, "the dog runs. the dog sits!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(d, col("doc_id"), col("text")).collect()(0)
    assert(r.getAs[Long]("n_chars") == 27L)
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Double]("punct_ratio") > 0)
    assert(r.getAs[Double]("quality") > 0 && r.getAs[Double]("quality") <= 1.0)
  }

  test("token counts: regex classes split letters/digits/punct") {
    val d = Seq((1L, "abc 123 x.y abc")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(d, col("doc_id"), col("text")).collect()(0)
    assert(r.getAs[Long]("ws_tokens") == 4L)
    // abc, 123, x, ., y, abc
    assert(r.getAs[Long]("re_tokens") == 6L)
    assert(r.getAs[Long]("distinct_tokens") == 3L)
  }

  test("winnowing fingerprints: shared content → shared fingerprints") {
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprint(d, col("doc_id"), col("text"))
      .select("doc_id", "fp_min", "fp_max").collect()
    assert(fp.length == 2)
    assert(fp(0).getString(1) == fp(1).getString(1))
    assert(fp(0).getString(2) == fp(1).getString(2))
  }

  test("multimodal: partition-wise stub decode matches the column twin") {
    val d = Seq((5L, "hello media payload abcdefgh")).toDF("doc_id", "text")
    val viaPartitions = Multimodal.decodePartitions(
      d.withColumn("bin", encode(col("text"), "UTF-8")), col("doc_id"), col("bin"))
      .collect()(0)
    val viaColumns = Multimodal.binaryMeta(d, col("doc_id"), col("text")).collect()(0)
    assert(viaPartitions.n_bytes.toLong == viaColumns.getAs[Long]("n_bytes"))
    assert(viaPartitions.content_md5 == viaColumns.getAs[String]("content_md5"))
    assert(viaPartitions.width == viaColumns.getAs[Int]("width"))
    assert(viaPartitions.height == viaColumns.getAs[Int]("height"))
  }

  test("frame sampling emits every 4th block with correct digests") {
    val text = "x" * 300 // 5 blocks of 64 → frames 0 and 4
    val d = Seq((1L, text)).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(d, col("doc_id"), col("text"))
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 4L))
  }

  test("BPE pair counts rank adjacent pairs with deterministic ties") {
    val d = Seq((1L, "a b a b c"), (2L, "a b z"), (3L, "q")).toDF("doc_id", "text")
    // pairs: doc1 → "a b","b a","a b","b c"; doc2 → "a b","b z";
    // doc3 has one token → contributes nothing
    val got = TextAnalysis.bpePairCounts(d, col("text"), topK = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("mixture weights: sqrt temperature, weights sum to 1") {
    val d = Seq(
      ("en", "one two three four"), ("en", "five six seven eight"),
      ("de", "eins zwei")
    ).toDF("lang", "text")
    val got = graft.ops.Mixture.temperatureWeights(d, col("lang"),
        size(split(col("text"), " ")))
      .orderBy(col("stratum"))
      .as[(String, Long, Double)].collect().toSeq
    // n: de=2, en=8 → √2/(√2+√8), √8/(√2+√8) = 1/3, 2/3
    assert(got.map(t => (t._1, t._2)) == Seq(("de", 2L), ("en", 8L)))
    assert(math.abs(got(0)._3 - 1.0 / 3) < 1e-6)
    assert(math.abs(got(1)._3 - 2.0 / 3) < 1e-6)
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-5)
  }

  test("Misra-Gries sketch: candidate superset + undercount bound, any partitioning") {
    // skewed stream: item i appears 2^(10-i) times, i = 0..9, plus
    // 200 singleton tail items; n = 2046 + 200 = 2246
    val rows = (0 to 9).flatMap(i => Seq.fill(1 << (10 - i))(s"hot$i")) ++
      (1 to 200).map(i => s"tail$i")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    val k = 5
    val heavy = exact.filter { case (_, c) => c > n / (k + 1) }.keySet
    assert(heavy.nonEmpty && heavy.size <= k) // the test is non-vacuous
    for (parts <- Seq(1, 2, 7)) { // vary partitioning → vary merge order
      val sketch = spark.createDataset(scala.util.Random.shuffle(rows))
        .repartition(parts)
        .select(graft.functions.HeavyHitters.mgSketch(col("value"), k).as("mg"))
        .as[Map[String, Long]].head()
      assert(sketch.size <= k, s"sketch over capacity at parts=$parts")
      assert(heavy.subsetOf(sketch.keySet),
        s"guarantee broken at parts=$parts: $heavy not in ${sketch.keySet}")
      // each kept counter is a lower bound, short by at most n/(k+1)
      sketch.foreach { case (item, c) =>
        val e = exact(item)
        assert(c <= e && e - c <= n / (k + 1),
          s"counter bound broken for $item: kept=$c exact=$e")
      }
    }
  }

  test("heavy-hitters query equals the exact thresholded counts") {
    val got = SparkEntry.queries("q_heavy_hitters")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok")).as[String].collect()
    val n = toks.length.toLong
    val want = toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 51 > n }.toMap
    assert(got == want && got.nonEmpty)
  }

  test("bitmap algebra: AND popcount equals exact intersection across word boundaries") {
    import graft.functions.BitmapDistinct._
    // ids straddle the 64-bit word boundary to catch word-indexing bugs
    val a = Seq(1L, 63L, 64L, 65L, 200L).toDF("id")
      .agg(bitmapOf(col("id"), 256).as("b")).as[Array[Long]].head()
    val b = Seq(63L, 64L, 100L, 200L).toDF("id")
      .agg(bitmapOf(col("id"), 256).as("b")).as[Array[Long]].head()
    val n = Seq((a, b)).toDF("a", "b")
      .select(bitmapAndCount(col("a"), col("b")).as("n")).as[Long].head()
    assert(n == 3L) // {63, 64, 200}
  }

  test("gopher filter: each rule fires independently and keep is their AND") {
    val longOk = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = Seq(
      (1L, longOk),                                  // passes everything
      (2L, "too short to pass"),                     // fails r_len
      (3L, (1 to 30).map(_ => "same").mkString(" ")) // fails r_dup (29/30 dup)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFilter(d, col("doc_id"), col("text"))
      .select(col("doc_id"), col("r_len"), col("r_dup"), col("keep"))
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(got(1L) == ((true, true, true)))
    assert(got(2L) == ((false, true, false)))
    assert(got(3L) == ((true, false, false)))
  }

  test("hashed linear classifier: exact integer weight sums, md5-replayable") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "alpha"), (3L, "zzz zzz")).toDF("doc_id", "text")
    val got = TextAnalysis.hashedLinearScore(d, col("doc_id"), col("text"))
      .select(col("doc_id"), col("w_sum"), col("n_tokens"), col("keep"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    // reference: same md5 derivations in plain Scala
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def w(tok: String): Long = {
      val b = java.lang.Long.parseLong(md5hex("b:" + tok).take(8), 16) % 1024
      java.lang.Long.parseLong(md5hex("w:" + b).take(8), 16) % 2001 - 1000
    }
    val exp1 = Seq("alpha", "beta", "gamma").map(w).sum
    assert(got(1L) == ((exp1, 3L, exp1 > 0)))
    assert(got(2L) == ((w("alpha"), 1L, w("alpha") > 0)))
    // repeated token counts twice — bag, not set
    assert(got(3L) == ((2 * w("zzz"), 2L, 2 * w("zzz") > 0)))
  }

  test("ngram coverage: full, partial, and zero coverage; short docs absent") {
    val train = Seq((10L, "a b c d e")).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a b c d"),     // both shingles in train → 1.0
      (2L, "a b c x y z"), // 1 of 4 shingles in train → 0.25
      (3L, "p q r s"),     // none → 0.0
      (4L, "one two")      // < 3 tokens → no shingles → absent
    ).toDF("doc_id", "text")
    val got = Dedup.ngramCoverage(train, col("text"), eval, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_shingles"), col("n_covered"), col("coverage"))
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((4L, 1L, 0.25)),
      3L -> ((2L, 0L, 0.0))))
  }

  test("JL sign projection: deterministic, norm-preserving in expectation") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sfDir)
    val proj = Similarity.projectSigns(emb, col("vec_id"), col("embedding"),
      outDims = 16, inDims = 64)
    // exact determinism: literal planes → identical bits across runs
    val a = proj.orderBy("vec_id", "dim").collect()
    val b = Similarity.projectSigns(emb, col("vec_id"), col("embedding"),
      outDims = 16, inDims = 64).orderBy("vec_id", "dim").collect()
    assert(a.sameElements(b))
    assert(a.length % 16 == 0 && a.nonEmpty)
    // E[‖y‖²] = ‖x‖² for the 1/√k-scaled ±1 construction: the mean
    // squared-norm ratio over the corpus concentrates near 1
    val ratio = proj.groupBy("vec_id").agg(sum(col("y") * col("y")).as("pn"))
      .join(emb.select(col("vec_id"),
        Similarity.normSq(col("embedding")).as("on")), "vec_id")
      .agg(avg(col("pn") / col("on"))).as[Double].head()
    assert(ratio > 0.9 && ratio < 1.1, s"mean norm ratio $ratio")
  }

  test("importance sampling: deterministic, quality-biased, per-row threshold") {
    import graft.ops.TextAnalysis
    val d = Tables.documents(spark, sfDir)
    val a = TextAnalysis.importanceSample(d, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    val b = TextAnalysis.importanceSample(d, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(a.sameElements(b) && a.nonEmpty)
    // the draw is weighted BY quality: kept docs average higher
    // quality than the full corpus
    val keptAvg = a.map(_.getDouble(1)).sum / a.length
    val allQ = TextAnalysis.qualityScore(d, col("doc_id"), col("text"))
      .select(col("quality")).as[Double].collect()
    val allAvg = allQ.sum / allQ.length
    assert(keptAvg > allAvg, s"kept=$keptAvg corpus=$allAvg")
    // and it IS a sample, not a pass-through
    assert(a.length < allQ.length)
  }

  test("token KL divergence: zero against itself, non-negative on the corpus") {
    // single-language corpus: the language IS the corpus → p == q,
    // every integer ratio is exactly 1, kl exactly 0
    val same = Seq((1L, "en", "a b c"), (2L, "en", "a d")).toDF("doc_id", "lang", "text")
    val z = TextAnalysis.tokenKlDivergence(same, col("lang"), col("text"))
      .select(col("lang"), col("kl")).as[(String, Double)].collect()
    assert(z.toSeq == Seq(("en", 0.0)))
    // real corpus: KL ≥ 0 per language (Gibbs), one row per language
    val kls = TextAnalysis.tokenKlDivergence(
        Tables.documents(spark, sfDir), col("lang"), col("text"))
      .select(col("lang"), col("kl")).as[(String, Double)].collect().toMap
    assert(kls.size == 5 && kls.values.forall(_ >= 0.0), s"got $kls")
  }

  test("band-skew probe surfaces bucket collapse without running the join") {
    // 4 identical docs collide in EVERY minhash band; 2 unrelated docs
    // land in their own buckets — the probe must read max occupancy 4
    // and predict >= bands * C(4,2) candidate pairs, all via one
    // linear aggregation
    val docs = (Seq.fill(4)(
      "the quick brown fox jumps over the lazy dog again and again") ++ Seq(
      "completely different text about catalyst optimizer rule injection",
      "another unrelated document mentioning bloom filters and zone maps"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val skew = Dedup.bandSkew(
      Dedup.minhashBandRows(docs, col("doc_id"), col("text")), Seq("band", "bh"))
    assert(skew.maxOccupancy == 4, s"collapsed bucket not detected: $skew")
    assert(skew.bandRows == 6 * 8)
    assert(skew.candPairs >= 8L * 6 && skew.candPairs < 8L * 6 + 8 * 2,
      s"pair prediction off: $skew")
    // and the editdist banding probe agrees on the same corpus
    val ed = Dedup.bandSkew(
      Dedup.editDistanceBandRows(docs, col("doc_id"), col("text")), Seq("band", "bv"))
    assert(ed.maxOccupancy == 4 && ed.candPairs >= 4L * 6, s"editdist probe: $ed")
  }

  test("PCM frame energies: signed 16-bit assembly, partial frames, odd tail") {
    // crafted bytes exercise the signed branch ASCII corpora cannot:
    // 0x80 0x00 → -32768, 0xff 0xff → -1, 0x7f 0xff → 32767
    val bytes = Array[Byte](0x80.toByte, 0x00, 0xff.toByte, 0xff.toByte,
      0x7f, 0xff.toByte, 0x00, 0x02, 0x01) // 4 samples + odd tail byte
    val (n, energies) = Multimodal.pcmFrameEnergies(bytes, frame = 3)
    assert(n == 4)
    // frame 0: (-32768)² + (-1)² + 32767² ; frame 1 (partial): 2²
    assert(energies.toSeq == Seq(32768L * 32768 + 1 + 32767L * 32767, 4L))
    // empty payload: zero samples, zero frames
    assert(Multimodal.pcmFrameEnergies(Array.emptyByteArray, 64) == ((0, Array.empty[Long])) ||
      Multimodal.pcmFrameEnergies(Array.emptyByteArray, 64)._2.isEmpty)
    // the query-facing op agrees with a hand fold on a fixture row
    val df = Seq((7L, "abcdef")).toDF("doc_id", "text")
    val row = Multimodal.audioEnergy(df, col("doc_id"), col("text"), frame = 2)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    val s = "abcdef".getBytes("UTF-8")
    def smp(i: Int) = ((s(2 * i) << 8) | (s(2 * i + 1) & 0xff)).toShort.toLong
    val e0 = smp(0) * smp(0) + smp(1) * smp(1)
    val e1 = smp(2) * smp(2)
    assert(row == ((7L, 3L, 2L, (if (e0 >= e1) 0L else 1L),
      math.max(e0, e1), math.floor((e0 + e1).toDouble / 2 * 10000 + 0.5) / 10000)))
  }

  test("embedding decontamination flags near-eval vectors, min-eval-id tie-break") {
    // base direction + its negation; ids 0 and 50 are eval (id % 50 == 0)
    val base = Array.tabulate(64)(i => ((i * 37 + 11) % 19 - 9).toFloat)
    val anti = base.map(-_)
    val vecs = Seq(
      (0L, base),                  // eval
      (50L, base.map(_ * 2f)),     // eval, same direction as 0 → cos ties at 1.0
      (1L, base.map(_ * 0.5f)),    // corpus: cos 1.0 to both evals → flagged, eval_id 0
      (2L, anti),                  // corpus: cos -1.0 → never flagged
      (3L, base.map(_ * 3f))       // corpus: cos 1.0 → flagged
    ).toDF("vec_id", "embedding")
    val out = Similarity.decontaminateByEmbedding(vecs, col("vec_id"),
        col("embedding"), isEval = _ % 50 === 0, threshold = 0.35, bands = 16)
      .orderBy(col("id")).as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 0L, 1.0), (3L, 0L, 1.0)), s"got $out")
  }

  test("leakage-safe split: cluster-mates share a split, all docs covered") {
    val docs = Tables.documents(spark, sfDir)
    val out = SparkEntry.queries("sample_split_leakage")(spark, sfDir)
    assert(out.count() == docs.count(), "split must cover every doc")
    // one split value per cluster representative — the leakage property
    val perCluster = out.groupBy(col("rep"))
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1)
    assert(perCluster.count() == 0, "a cluster straddles splits")
    // and clusters genuinely exist at this sf (the check is not vacuous)
    val multi = out.groupBy(col("rep")).count().where(col("count") > 1)
    assert(multi.count() > 0, "no multi-doc cluster in the fixture corpus")
  }

  test("bitmap retention: set algebra matches exact distinct-set replay") {
    val out = SparkEntry.queries("q_bitmap_retention")(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.nonEmpty)
    // replay with plain distinct sets (tiny at this sf)
    val du = Tables.events(spark, sfDir)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"), col("user_id"))
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val days = du.keys.toSeq.sorted
    days.sliding(2).foreach {
      case Seq(pd, d) =>
        val (cur, prev) = (du(d), du(pd))
        val got = out(d)
        assert(got == ((d, cur.size.toLong, prev.size.toLong,
          (cur & prev).size.toLong, (cur -- prev).size.toLong,
          (prev -- cur).size.toLong)), s"day $d mismatch: $got")
      case _ =>
    }
    assert(out.size == days.size - 1, "one row per consecutive-day pair")
  }
}
