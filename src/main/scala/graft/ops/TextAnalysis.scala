package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Rounding

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, winnowing fingerprints.
  *
  * Everything is a Catalyst column expression (whole-stage codegen;
  * no UDFs). Scoring formulas are integer/ratio arithmetic so the
  * DuckDB oracle reproduces them bit-for-bit.
  */
object TextAnalysis {

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of a byte array (matches `md5()` output; ~20× faster
    * than per-byte String.format on hot paths). */
  def hexString(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Tiny deterministic stopword lists per language for the n-gram/
    * stopword-hit language heuristic. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  val StopwordsEs: Seq[String] = Seq("el", "la", "de", "y", "que", "en", "un", "una", "es", "por")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "ein")
  val StopwordsFr: Seq[String] = Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans")

  // long-typed so outputs line up with BIGINT-counting engines (oracle)
  private def hits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(lit(_)): _*))).cast("long")

  /** Stopword-hit language scores + argmax language ('und' when no
    * list scores > 0). Ties break in fixed order en > es > de > fr.
    */
  def langId(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tokens = split(lower(text), " ")
    val scored = df.select(id.as("doc_id"), tokens.as("toks"))
      .withColumn("en_hits", hits(col("toks"), StopwordsEn))
      .withColumn("es_hits", hits(col("toks"), StopwordsEs))
      .withColumn("de_hits", hits(col("toks"), StopwordsDe))
      .withColumn("fr_hits", hits(col("toks"), StopwordsFr))
    val best = greatest(col("en_hits"), col("es_hits"), col("de_hits"), col("fr_hits"))
    scored.select(col("doc_id"),
      when(best <= 0, lit("und"))
        .when(col("en_hits") === best, lit("en"))
        .when(col("es_hits") === best, lit("es"))
        .when(col("de_hits") === best, lit("de"))
        .otherwise(lit("fr")).as("pred_lang"),
      col("en_hits"), col("es_hits"), col("de_hits"), col("fr_hits"),
      size(col("toks")).cast("long").as("n_tokens"))
  }

  /** Quality metrics + a composite score:
    * n_chars, n_tokens, punct ratio, stopword ratio, mean token length.
    * score = 0.4·stopword_ratio + 0.3·min(n_tokens,100)/100
    *       + 0.3·(1 − punct_ratio), rounded to 4dp.
    */
  def qualityScore(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = split(text, " ")
    val m = df.select(id.as("doc_id"), text.as("t"), toks.as("toks"))
      .withColumn("n_chars", length(col("t")).cast("long"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_punct", length(col("t")) - length(regexp_replace(col("t"), "[.,!?;:]", "")))
      .withColumn("n_stop", hits(col("toks"), StopwordsEn))
    m.select(col("doc_id"), col("n_chars"), col("n_tokens"),
      Rounding.r(col("n_punct").cast("double") / col("n_chars"), 4).as("punct_ratio"),
      Rounding.r(col("n_stop").cast("double") / col("n_tokens"), 4).as("stopword_ratio"),
      Rounding.r((col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"), 4).as("mean_token_len"),
      Rounding.r(lit(0.4) * (col("n_stop").cast("double") / col("n_tokens"))
        + lit(0.3) * (least(col("n_tokens"), lit(100)).cast("double") / 100)
        + lit(0.3) * (lit(1.0) - col("n_punct").cast("double") / col("n_chars")), 4).as("quality"))
  }

  /** Token counts: whitespace tokens, BPE-ish regex tokens
    * (letter runs / digit runs / single other chars), distinct tokens.
    */
  def tokenCounts(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = split(text, " ")
    df.select(id.as("doc_id"),
      size(toks).cast("long").as("ws_tokens"),
      size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("re_tokens"),
      size(array_distinct(toks)).cast("long").as("distinct_tokens"))
  }

  /** Winnowing fingerprint (Schleimer et al., SIGMOD 2003 — public
    * algorithm): k-char gram md5 hashes; each window of w consecutive
    * grams selects its min hash; the fingerprint is the distinct
    * selected set. Emitted as per-doc summary (count/min/max) so the
    * result is compact at any scale.
    */
  def winnowFingerprint(df: DataFrame, id: Column, text: Column,
                        k: Int = 5, w: Int = 10): DataFrame = {
    val norm = lower(regexp_replace(text, "\\s+", " "))
    // The semantic spec is the SQL-window formulation the oracle runs
    // (per-gram md5, min over a w-row trailing window, distinct
    // selected). A document's winnowing is self-contained, so the
    // engine computes it in ONE partition-local typed pass — per doc:
    // digest the k-grams, slide the w-window min, aggregate distinct/
    // min/max in place. No gram-row explode, no shuffle, no window
    // sort (the exploded formulation moves ~|chars| rows through an
    // exchange; this moves one row per doc). Bit-identical output.
    // Corpus is ASCII, so char positions agree with SQL substr.
    // repartition first: a small parquet input arrives as one split,
    // which would serialize the digest work onto a single task
    val src = df.select(id.cast("long").as("doc_id"), norm.as("t"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    import src.sparkSession.implicits._
    src.as[(Long, String)].flatMap { case (i, t) =>
      if (t.length < k + w - 1) Iterator.empty
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val n = t.length - (k - 1)
        val ghs = new Array[String](n)
        var j = 0
        while (j < n) {
          ghs(j) = TextAnalysis.hexString(md.digest(t.substring(j, j + k).getBytes("UTF-8")))
          j += 1
        }
        val seen = new java.util.HashSet[String]()
        var fpMin: String = null
        var fpMax: String = null
        var end = w - 1 // 0-based end of the first full window
        while (end < n) {
          var m = ghs(end - w + 1)
          var q = end - w + 2
          while (q <= end) { if (ghs(q).compareTo(m) < 0) m = ghs(q); q += 1 }
          seen.add(m)
          if (fpMin == null || m.compareTo(fpMin) < 0) fpMin = m
          if (fpMax == null || m.compareTo(fpMax) > 0) fpMax = m
          end += 1
        }
        Iterator.single((i, seen.size.toLong, fpMin, fpMax))
      }
    }.toDF("doc_id", "n_fingerprints", "fp_min", "fp_max")
  }

  /** Corpus-wide adjacent-token-pair frequencies — the statistic the
    * first BPE merge step ranks on (Sennrich et al. 2016's count
    * table, here over whitespace tokens). Top `topK` pairs by count,
    * ties broken by pair text so the cutoff is engine-deterministic.
    *
    * Scale shape: pair explode is row-local; one hash aggregation on
    * pair (map-side partial combine collapses each partition's
    * repeats before the exchange), then a TakeOrdered top-k — never a
    * full sort of the pair vocabulary.
    */
  def bpePairCounts(df: DataFrame, text: Column, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    df.select(split(text, " ").as("w"))
      .where(size(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair")).limit(topK)
  }

  /** Composed quality-filter pipeline (Gopher/RefinedWeb-style rule
    * stack) with per-rule accounting: every rule is a boolean column,
    * `keep` is their conjunction — so the output both filters and
    * explains each rejection (which rule fired). All metrics are
    * row-local integer/ratio math; no shuffle.
    *
    * Rules: token count in [minTokens, maxTokens]; mean token length
    * in [2, 12]; duplicate-token fraction ≤ maxDupFrac; punctuation
    * ratio ≤ 0.2.
    */
  def gopherFilter(df: DataFrame, id: Column, text: Column,
                   minTokens: Int = 20, maxTokens: Int = 100000,
                   maxDupFrac: Double = 0.6): DataFrame = {
    val m = df.select(id.as("doc_id"), text.as("t"), split(text, " ").as("toks"))
      .withColumn("n_chars", length(col("t")).cast("long"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_punct",
        (length(col("t")) - length(regexp_replace(col("t"), "[.,!?;:]", ""))).cast("long"))
      .withColumn("dup_frac", Rounding.r(
        lit(1.0) - size(array_distinct(col("toks"))).cast("double") / col("n_tokens"), 4))
      .withColumn("mean_token_len", Rounding.r(
        (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"), 4))
      // n_chars = 0 (empty doc) would make the ratio NaN and poison
      // every comparison downstream; an empty doc is punct-free
      .withColumn("punct_ratio", Rounding.r(
        when(col("n_chars") === 0, 0.0)
          .otherwise(col("n_punct").cast("double") / col("n_chars")), 4))
    m.select(col("doc_id"), col("n_tokens"), col("dup_frac"),
        col("mean_token_len"), col("punct_ratio"),
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens).as("r_len"),
        (col("mean_token_len") >= 2.0 && col("mean_token_len") <= 12.0).as("r_word_len"),
        (col("dup_frac") <= maxDupFrac).as("r_dup"),
        (col("punct_ratio") <= 0.2).as("r_punct"))
      .withColumn("keep",
        col("r_len") && col("r_word_len") && col("r_dup") && col("r_punct"))
  }

  /** BM25 relevance of every document against a fixed query-term set
    * (Robertson–Spärck Jones; the Okapi formulation with the +1 idf
    * floor). Returns (doc_id, n_terms, score) for docs containing ≥1
    * query term.
    *
    * Scale shape: the token explode is FILTERED to the query terms
    * before any shuffle (only matching tokens reach the (doc, term)
    * aggregation); corpus stats (N, avgdl) and the per-term document
    * frequencies are tiny aggregates broadcast into the scoring join.
    * Exactness: N, dl, avgdl's numerator, tf, and df are integer
    * aggregates (order-independent); the only FP is the final per-term
    * score, summed per doc and 4dp-rounded — the same ln-then-round
    * contract text_unigram_logprob proves cross-engine.
    */
  def bm25(docs: DataFrame, id: Column, text: Column, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25: empty query")
    val d = docs.select(id.as("doc_id"), split(text, " ").as("w"))
    val stats = d.agg(
      count(lit(1)).cast("double").as("n"),
      (sum(size(col("w"))).cast("double") / count(lit(1))).as("avgdl"))
    val tok = d.select(col("doc_id"), size(col("w")).cast("double").as("dl"),
        explode(col("w")).as("t"))
      .where(col("t").isin(terms: _*))
    val tf = tok.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val dft = tf.groupBy(col("t"))
      .agg(countDistinct(col("doc_id")).cast("double").as("dft"))
    tf.join(broadcast(dft), "t")
      .crossJoin(broadcast(stats))
      .withColumn("s",
        log(lit(1.0) + (col("n") - col("dft") + 0.5) / (col("dft") + 0.5)) *
          col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), Rounding.r(sum(col("s")), 4).as("score"))
  }

  /** Importance (quality-weighted) deterministic sampling: keep each
    * document with probability equal to its quality score — the
    * curation step that biases a corpus toward quality WITHOUT a hard
    * cutoff (hard thresholds collapse diversity; weighted keeps a
    * graded tail). Deterministic Bernoulli draw per doc: the md5
    * uniform u ∈ [0, 2³²) is compared against floor(quality·2³²) —
    * same engine-stable keyed-uniform trick as sample_deterministic
    * (C15), with the threshold now per-row. Row-local; no shuffle.
    */
  def importanceSample(df: DataFrame, id: Column, text: Column): DataFrame = {
    val q = qualityScore(df, id, text).select(col("doc_id"), col("quality"))
    val u = conv(substring(md5(concat(col("doc_id"), lit(":imp"))), 1, 8), 16, 10)
      .cast("long")
    q.where(u < floor(col("quality") * 4294967296.0).cast("long"))
  }

  /** Flesch reading-ease readability (public formula: 206.835 −
    * 1.015·words/sentences − 84.6·syllables/words) with the standard
    * cheap approximations — sentences = [.!?]+ runs (min 1),
    * syllables = vowel-group runs per word (min 1/word). The
    * readability band is a corpus-curation signal alongside C10/C36
    * (too-easy ≈ boilerplate, unreadable ≈ garbled).
    *
    * Row-local; all three inputs are exact integer counts, the formula
    * is the only FP (fixed left-to-right association, 4dp). */
  def readability(df: DataFrame, id: Column, text: Column): DataFrame = {
    val syll = aggregate(
      transform(split(text, " "), w =>
        greatest(lit(1), size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))))),
      lit(0L), (acc, x) => acc + x)
    val m = df.select(id.as("doc_id"),
      greatest(lit(1L),
        size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long"))
        .as("n_sentences"),
      size(split(text, " ")).cast("long").as("n_tokens"),
      syll.as("n_syllables"))
    m.select(col("doc_id"), col("n_sentences"), col("n_tokens"), col("n_syllables"),
      Rounding.r(
        lit(206.835) -
          lit(1.015) * (col("n_tokens").cast("double") /
            col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            col("n_tokens").cast("double")), 4).as("flesch"))
  }

  /** fastText-style hashed-feature LINEAR quality classifier: tokens
    * hash into a fixed bucket space, each bucket carries a weight, a
    * document's score is the mean bucket weight of its tokens and the
    * keep decision is score > 0 (Joulin et al. 2016's shape — the
    * model-based quality filter production pipelines run after the
    * rule-based Gopher stage). Weights here are md5-derived stand-ins
    * for a trained model's (deterministic, engine-replayable); swapping
    * in trained weights is a broadcast-table change, not a plan change.
    *
    * Exactness: weights are INTEGER milli-units in [-1000, 1000], so
    * the per-doc weight sum is an exact integer aggregate (any
    * partitioning/order); score and probability are single FP steps on
    * that integer, 4dp-rounded.
    *
    * Scale shape: one token explode → one hash aggregation keyed by
    * doc; the "model" never materializes (bucket weight is an
    * expression of the token), so nothing broadcasts and shuffle
    * carries one (doc, int) pair per token — partial-agg'd map-side.
    */
  def hashedLinearScore(df: DataFrame, id: Column, text: Column,
                        buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val tok = df.select(id.as("doc_id"), explode(split(text, " ")).as("t"))
    val bucket = conv(substring(md5(concat(lit("b:"), col("t"))), 1, 8), 16, 10)
      .cast("long") % buckets
    val wInt = conv(substring(md5(concat(lit("w:"), bucket.cast("string"))), 1, 8),
      16, 10).cast("long") % 2001L - 1000L
    tok.select(col("doc_id"), wInt.as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w")).as("w_sum"), count(lit(1)).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("w_sum"),
        Rounding.r(col("w_sum").cast("double") /
          (col("n_tokens") * 1000L).cast("double"), 4).as("score"),
        Rounding.r(lit(1.0) / (lit(1.0) +
          exp(col("w_sum").cast("double") * -4.0 /
            (col("n_tokens") * 1000L).cast("double"))), 4).as("prob"),
        (col("w_sum") > 0L).as("keep"))
  }

  /** Per-language token-distribution KL divergence from the corpus
    * distribution — the training-mix drift report (which language
    * slice diverges most from the blended corpus, the statistic
    * mixture re-weighting and domain-shift monitors read). Add-one
    * smoothing over the joint vocabulary so zero counts are defined:
    * KL(lang ‖ corpus) = Σ_t p_t · ln(p_t / q_t),
    * p_t = (c_l(t)+1)/(n_l+V), q_t = (c(t)+1)/(n+V).
    *
    * Exactness: all counts are integer aggregates; each term's ratio
    * is formed from exact integer products before ONE double division
    * each, and terms are fixed-point-rounded to 1e-10 INTEGER units
    * summed as longs — the total is order-independent and
    * engine-identical, with only deterministic per-term FP (2 divides,
    * 1 ln, 1 multiply) before the fixed-point cut. Integer products
    * stay under 2^63 while tokens·vocab < ~3·10^18 (far past any
    * gate scale; at true 100 TB corpora move the ratio to log space:
    * ln num − ln den).
    *
    * Scale shape: token counts shuffle on token; the evaluation grid
    * is vocab × |languages| rows (languages are few), the per-language
    * totals and corpus scalars broadcast.
    */
  def tokenKlDivergence(df: DataFrame, langCol: Column, text: Column): DataFrame = {
    val tok = df.select(langCol.as("lang"), explode(split(text, " ")).as("t"))
    val global = tok.groupBy(col("t")).agg(count(lit(1)).as("c_g"))
    val perLang = tok.groupBy(col("lang"), col("t")).agg(count(lit(1)).as("c_l"))
    val totals = tok.groupBy(col("lang")).agg(count(lit(1)).as("n_l"))
    val scalars = global.agg(sum(col("c_g")).as("n_g"), count(lit(1)).as("v"))
    val grid = global.crossJoin(broadcast(totals)).crossJoin(broadcast(scalars))
      .join(perLang, Seq("lang", "t"), "left")
      .withColumn("c_l", coalesce(col("c_l"), lit(0L)))
    val num = (col("c_l") + 1L) * (col("n_g") + col("v"))
    val den = (col("n_l") + col("v")) * (col("c_g") + 1L)
    val term = (col("c_l") + 1L).cast("double") /
      (col("n_l") + col("v")).cast("double") *
      log(num.cast("double") / den.cast("double"))
    grid
      .select(col("lang"), col("n_l"),
        floor(term * 1e10 + 0.5).cast("long").as("ti"))
      .groupBy(col("lang"))
      .agg(max(col("n_l")).as("n_tokens"),
        Rounding.r(sum(col("ti")).cast("double") / 1e10, 4).as("kl"))
  }

  /** Top-k TF-IDF terms per document — the per-doc keyword extraction
    * every retrieval-ish corpus pipeline carries (BM25's C48 sibling,
    * but per-document output instead of per-query relevance).
    * tf = in-doc term count, idf = ln((N+1)/(df+1)) + 1 (the smoothed
    * sklearn form: never negative, never divides by zero), score =
    * tf·idf rounded to 4dp BEFORE ranking, so rank ties break on the
    * rounded value + term text identically in any engine.
    *
    * Scale shape: one explode → two hash aggregates (both partial-agg
    * friendly: (doc,term) then (term)) → a term-keyed join of per-doc
    * tf rows against the |vocab| df table (AQE picks broadcast when
    * vocab fits) → per-doc top-k via a row_number window PARTITIONED
    * by doc (millions of small partitions, never a global sort). The
    * corpus size N rides in as a broadcast 1-row frame, not a driver
    * collect.
    */
  def tfIdfTopTerms(df: DataFrame, id: Column, text: Column,
                    topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = df.select(id.as("doc_id"), split(text, " ").as("toks"))
    val tf = docs.select(col("doc_id"), explode(col("toks")).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", Rounding.r(
        col("tf").cast("double") *
          (log((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")) + 1.0),
        4))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)))
      .where(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Deterministic curriculum ordering — the "easy first" training
    * schedule: documents are bucketed by their composite quality score
    * (fixed decile cutoffs on [[qualityScore]]'s 4dp value — no global
    * quantile pass), ordered inside each bucket by a content-free
    * deterministic hash of the id (so the within-difficulty order is
    * unbiased and reproducible), and assigned a GLOBAL training
    * position: bucket offsets are a 10-row cumulative sum, positions
    * are per-bucket row_numbers plus the bucket's offset.
    *
    * Scale shape: no global sort and no global window — the only
    * windows are partitioned by bucket (10 partitions of the POSITION
    * assignment, each a streaming row_number over a hash-ordered
    * shuffle; for 100 TB add the hash prefix to the partition key and
    * roll offsets per (bucket, prefix) the same way). The curriculum
    * consumer reads ORDER BY position.
    */
  def curriculumOrder(df: DataFrame, id: Column, text: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = qualityScore(df, id, text)
      .select(col("doc_id"), col("quality"))
      // quality is already 4dp-rounded: decile cutoffs are exact
      .withColumn("bucket", least(floor(col("quality") * 10), lit(9L)).cast("long"))
      .withColumn("h", md5(col("doc_id").cast("string")))
    val counts = q.groupBy(col("bucket")).agg(count(lit(1)).as("n_bucket"))
    val offsets = counts
      .withColumn("offset",
        coalesce(sum(col("n_bucket")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    q.join(broadcast(offsets), "bucket")
      .withColumn("position", col("offset") +
        row_number().over(Window.partitionBy(col("bucket"))
          .orderBy(col("h"), col("doc_id"))))
      .select(col("position"), col("doc_id"), col("bucket"), col("quality"))
  }
}
