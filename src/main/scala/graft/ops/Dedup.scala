package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Rounding

/** Document deduplication for large-scale training-data pipelines.
  *
  * All operators are pure DataFrame transforms (explode → groupBy →
  * join); nothing collects to the driver. Hashing is md5-based so the
  * same bits are computable by any engine (the DuckDB oracle replays
  * the identical construction).
  *
  * Scale notes (100 TB):
  *  - exact/normalized dedup: one hash-aggregate on a 32-byte digest —
  *    shuffle carries digests, not documents.
  *  - MinHash-LSH: signature cost ∝ docs × k; the band bucket-join
  *    replaces the O(n²) pair space; the band id is part of the join
  *    key so bucket skew spreads across bands; exact Jaccard runs only
  *    on surviving candidates.
  *  - exact set-similarity join: inverted-index join + size-ratio
  *    pruning (lossless for Jaccard ≥ t). At extreme scale swap the
  *    index for prefix-filtering (PPJoin) — same frame shape.
  */
object Dedup {

  /** w-word shingles of a single-space-separated text column, distinct. */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = split(text, " ")
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature of a shingle set: k md5 "permutations"
    * h_i(s) = md5(i || ':' || s); the signature entry is the
    * lexicographic min (md5 hex is fixed-width, so string min is a
    * consistent permutation min).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    array((0 until k).map(i =>
      array_min(transform(shingles, s => md5(concat(lit(s"$i:"), s))))): _*)

  /** LSH band digests: bands × rowsPerBand must equal signature length.
    * Band b's digest = md5 of its rows joined with '|'.
    */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map(b =>
      md5(concat_ws("|", (0 until rowsPerBand).map(j =>
        element_at(sig, b * rowsPerBand + j + 1)): _*)).as(s"band_$b"))

  /** Exact dedup groups: rows hashed by `key`, emitting one row per
    * distinct hash with the minimum id as the kept representative.
    */
  def exactGroups(df: DataFrame, id: Column, key: Column): DataFrame =
    df.groupBy(key.as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash-LSH near-duplicate pairs, exact-Jaccard verified.
    *
    * @return (doc_a, doc_b, jaccard) for candidate pairs sharing at
    *         least one LSH band whose exact shingle Jaccard ≥ threshold.
    */
  def minhashLshPairs(df: DataFrame, id: Column, text: Column,
                      shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                      thresholdNum: Int = 4, thresholdDen: Int = 5): DataFrame = {
    val rowsPerBand = k / bands
    val sh = df.select(id.as("id"), wordShingles(text, shingleN).as("s"))
    val sig = sh.select(col("id"), col("s"), minhashSignature(col("s"), k).as("sig"))
    val bandStructs = (0 until bands).map(b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until rowsPerBand).map(j =>
          element_at(col("sig"), b * rowsPerBand + j + 1)): _*)).as("bh")))
    val banded = sig.select(col("id"),
      explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
    val withSets = cand
      .join(sh.select(col("id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sh.select(col("id").as("doc_b"), col("s").as("sb")), "doc_b")
    withSets
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("uni", size(col("sa")) + size(col("sb")) - col("inter"))
      // integer cross-multiplication: exact thresholding, no FP boundary
      .where(col("inter") * thresholdDen >= col("uni") * thresholdNum)
      .select(col("doc_a"), col("doc_b"),
        Rounding.r(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
  }

  /** Exact all-pairs set-similarity self-join on word shingles
    * (inverted-index formulation + lossless size-ratio pruning:
    * Jaccard ≥ t ⇒ min(|A|,|B|) ≥ t·max(|A|,|B|)).
    */
  def ngramJaccardPairs(df: DataFrame, id: Column, text: Column,
                        shingleN: Int = 3, thresholdNum: Int = 4, thresholdDen: Int = 5): DataFrame = {
    val sh = df.select(id.as("id"), wordShingles(text, shingleN).as("s"))
      .withColumn("sz", size(col("s")))
    val tok = sh.select(col("id"), col("sz"), explode(col("s")).as("t"))
    tok.as("a").join(tok.as("b"),
        col("a.t") === col("b.t") && col("a.id") < col("b.id") &&
          // lossless size pruning, integer-exact: t·max ≤ min
          least(col("a.sz"), col("b.sz")) * thresholdDen >=
            greatest(col("a.sz"), col("b.sz")) * thresholdNum)
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        col("a.sz").as("sa"), col("b.sz").as("sb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("sa") + col("sb") - col("inter"))
      .where(col("inter") * thresholdDen >= col("uni") * thresholdNum)
      .select(col("doc_a"), col("doc_b"),
        Rounding.r(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
  }

  /** 32-bit SimHash over whitespace tokens (duplicates weighted).
    * Token hash = first 8 hex chars of md5 as an unsigned 32-bit int;
    * simhash bit j is set iff Σ_tokens (2·bit_j(h) − 1) > 0.
    */
  def simhash32(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("id"), explode(split(text, " ")).as("t"))
      .withColumn("h", conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val sums = tok.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 32).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col("id"), sim.as("simhash"))
  }

  /** Near-duplicate pairs by SimHash Hamming distance ≤ maxHamming.
    * Pair generation partitions the 32 bits into (maxHamming+1) bands;
    * by pigeonhole any pair within the distance budget matches exactly
    * on ≥1 band, so the band join is lossless — no O(n²) pair scan.
    */
  def simhashPairs(sim: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = 32 / nBands
    val bandStructs = (0 until nBands).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits)
          .bitwiseAND((1L << bandBits) - 1).as("bv")))
    val banded = sim.select(col("id"), col("simhash"),
      explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("simhash"), col("bb.band").as("band"), col("bb.bv").as("bv"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
