package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** SQL-name registration for the AGGREGATE surface — the StarRocks
  * function names a migrating user types in `spark.sql(...)` (the
  * reference's tables model cohorts as `BITMAP` columns and query them
  * with the bitmap_* family; create-starrocks-tables.sh):
  *
  *  - `bitmap_agg(id)`          → compressed bitmap of a long column
  *    (StarRocks `bitmap_agg` / `bitmap_union(to_bitmap(x))`)
  *  - `bitmap_union(bm)`        → union of bitmap rows, as a bitmap
  *  - `bitmap_union_count(bm)`  → union of bitmap rows, exact count
  *  - `bitmap_distinct_count(id)` → exact distinct of a long column
  *    (`bitmap_union_count(to_bitmap(x))` fused)
  *  - `mg_sketch(item)`         → Misra–Gries heavy-hitter candidates
  *    at the default capacity (StarRocks `approx_top_k` family; the
  *    variable-k form stays in the typed API — SQL registration binds
  *    one instance)
  *  - `percentile_sketch(x)`    → mergeable quantile sketch of a
  *    double column (StarRocks `percentile_union(percentile_hash(x))`
  *    fused — the PERCENTILE column pre-aggregate)
  *  - `percentile_union(sk)`    → merge stored sketches, as a sketch
  *  - `percentile_union_p50/p90(sk)` → merge + extract one quantile
  *    (`percentile_approx_raw(percentile_union(sk), q)`; a bound-q
  *    instance per name, the mg_sketch convention — variable q stays
  *    in the typed API, `Qsk.qskMergeQuantile`)
  *
  *  - `kmv_sketch(h)`           → bottom-k (theta) distinct sketch of
  *    a 63-bit hash column (`kmv_hash(x)` — injected scalar)
  *  - `kmv_union(sk)`           → merge stored KMV sketches, as a
  *    sketch (bit-identical to sketching the concatenated input)
  *  - `kmv_distinct_count(h)`   → distinct estimate of a hash column
  *    (exact below k); the scalar estimator family over STORED
  *    sketch columns (`kmv_distinct_est` / `kmv_intersect_est` /
  *    `kmv_union_est` / `kmv_jaccard_est`) is injected by
  *    [[graft.GraftExtensions]] as native-expression compositions
  *
  * Scalar bitmap algebra (`Rbm.cardinality` / `andBm` / `toIds`) is
  * pure built-in column math over the map representation, so it needs
  * no registration — it composes in SQL as soon as the aggregate
  * yields the column.
  *
  * Registered per session by [[graft.GraftSession]]; codegen SCALAR
  * expressions (double_dot, simhash…) are injected by
  * [[graft.GraftExtensions]] instead, which survives
  * `spark.sql.extensions` deployment on a plain cluster.
  */
object SqlFunctions {
  def register(spark: SparkSession): Unit = {
    spark.udf.register("bitmap_agg", udaf(new Rbm.RbmOf))
    spark.udf.register("bitmap_union", udaf(new Rbm.RbmUnion))
    spark.udf.register("bitmap_union_count", udaf(new Rbm.RbmUnionCount))
    spark.udf.register("bitmap_distinct_count", udaf(new Rbm.RbmDistinct))
    spark.udf.register("mg_sketch", udaf(new HeavyHitters(50)))
    spark.udf.register("percentile_sketch", udaf(new Qsk.QskOf()))
    spark.udf.register("percentile_union", udaf(new Qsk.QskMerge))
    spark.udf.register("percentile_union_p50", udaf(new Qsk.QskMergeQuantile(0.5)))
    spark.udf.register("percentile_union_p90", udaf(new Qsk.QskMergeQuantile(0.9)))
    // KMV (bottom-k / theta) sketch aggregates at the default k —
    // input is a 63-bit hash column (`kmv_hash(x)`, injected by
    // GraftExtensions beside the scalar estimator family)
    spark.udf.register("kmv_sketch", udaf(new Kmv.KmvOf()))
    spark.udf.register("kmv_union", udaf(new Kmv.KmvMerge()))
    spark.udf.register("kmv_distinct_count", udaf(new Kmv.KmvDistinct()))
  }
}
