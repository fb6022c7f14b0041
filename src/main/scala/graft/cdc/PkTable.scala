package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** StarRocks Primary-Key-table semantics on Spark: a changelog of
  * keyed change rows compacts to "latest version per key wins; a
  * delete as the latest version removes the key"
  * (see /root/reference/create-starrocks-tables.sh — `PRIMARY KEY`
  * tables with persistent index — and the Routine Load upsert flow).
  *
  * Scale design: compaction is ONE hash aggregation —
  * `max_by(struct(all columns), struct(version columns))` — not a
  * `row_number()` window. The window formulation shuffles AND sorts
  * every row; `max_by` gets map-side partial aggregation, so the
  * shuffle carries ~|distinct keys| rows instead of |changelog| rows.
  * At 100 TB of changelog with a much smaller live key set this is the
  * difference between shuffling terabytes and shuffling gigabytes.
  * max_by is associative+commutative, so AQE/partial-agg/salted
  * two-phase rollups all preserve semantics.
  */
object PkTable {

  /** Compact a changelog to latest-per-key.
    *
    * @param df      changelog rows
    * @param keyCols primary-key columns
    * @param version columns ordering versions (e.g. ts, seq) — later wins;
    *                compared lexicographically as a struct
    * @param deleteFlag predicate marking delete rows; the key vanishes if
    *                its latest version is a delete
    */
  def compact(df: DataFrame, keyCols: Seq[String], version: Seq[Column], deleteFlag: Column): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq :+ deleteFlag.as("__is_delete"): _*)
    val latest = df
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, struct(version: _*)).as("__latest"))
    latest
      .where(!col("__latest.__is_delete"))
      .select(df.columns.map(c => col(s"__latest.$c").as(c)).toIndexedSeq: _*)
  }

  /** Latest row per key by version, with NO delete handling — rows
    * marked deleted survive as tombstones. This is the multi-writer
    * merge primitive: when commits can interleave out of version
    * order (transactional concurrent writers), the stored table must
    * keep tombstones so a commit carrying an OLDER insert cannot
    * resurrect a key deleted by a newer version in an earlier commit.
    * Same one-hash-aggregation shape as [[compact]].
    */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], version: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, struct(version: _*)).as("__latest"))
      .select(df.columns.map(c => col(s"__latest.$c").as(c)).toIndexedSeq: _*)
  }

  /** Skew-resistant compaction: two-phase max_by with an explicit salt.
    * Phase 1 aggregates (key, salt) — a hot key's rows spread over
    * `salts` reducers; phase 2 folds the per-salt winners. Because
    * max_by over the version struct is associative and commutative,
    * the result is identical to [[compact]] for ANY salt assignment —
    * here the salt derives from the version columns so it needs no
    * randomness. Use when a handful of keys dominate the changelog
    * (AQE skew-join handles joins; this handles aggregation skew).
    */
  def compactSalted(df: DataFrame, keyCols: Seq[String], version: Seq[Column],
                    deleteFlag: Column, salts: Int): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq :+ deleteFlag.as("__is_delete"): _*)
    val ver = struct(version: _*)
    val phase1 = df
      .withColumn("__salt", pmod(hash(ver), lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(max_by(payload, ver).as("__w"), max(ver).as("__v"))
    val phase2 = phase1
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(col("__w"), col("__v")).as("__latest"))
    phase2
      .where(!col("__latest.__is_delete"))
      .select(df.columns.map(c => col(s"__latest.$c").as(c)).toIndexedSeq: _*)
  }

  /** Merge a snapshot (initial load) with a changelog tail: changelog
    * rows overwrite snapshot rows by key; keys whose latest change is a
    * delete drop out; untouched snapshot keys pass through; brand-new
    * changelog keys appear. This is `snapshot.mode=initial` + the
    * streaming tail materialized in one consistent view.
    *
    * Both frames must share the payload schema (including the version
    * columns — snapshot rows typically carry a floor value there; the
    * internal epoch makes any changelog row outrank any snapshot row
    * regardless). Implementation: union + one compact() = one shuffle.
    */
  def snapshotMerge(snapshot: DataFrame, changelog: DataFrame, keyCols: Seq[String],
                    version: Seq[Column], deleteFlag: Column): DataFrame = {
    val snap = snapshot
      .withColumn("__epoch", lit(0))
      .withColumn("__del", lit(false))
    val chg = changelog
      .withColumn("__epoch", lit(1))
      .withColumn("__del", deleteFlag)
    val unioned = snap.unionByName(chg)
    compact(unioned, keyCols, col("__epoch") +: version, col("__del"))
      .drop("__epoch", "__del")
  }
}
