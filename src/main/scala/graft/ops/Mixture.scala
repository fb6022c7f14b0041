package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Rounding

/** Pretraining-mixture weight construction: temperature-scaled
  * sampling weights per stratum (language/domain), the standard
  * p_i ∝ n_i^α rule that upweights low-resource strata relative to
  * proportional sampling.
  *
  * α is fixed at 0.5 (sqrt): IEEE-754 requires sqrt to be correctly
  * rounded, so both engines compute the identical double — `pow`
  * carries no such guarantee (Java Math.pow allows 1 ulp error and
  * libm implementations differ), which would make an α≠0.5 weight
  * engine-ambiguous in the last bits. The denominator Σ√n_j is folded
  * LEFT-TO-RIGHT over the strata sorted by name (`aggregate` over a
  * sorted collected list here, `list_reduce` over the same sorted
  * list in the oracle), so double-addition order — the one remaining
  * nondeterminism — is pinned too. Weights replay bit-identically
  * before rounding.
  *
  * Scale shape: the per-stratum aggregation is the only shuffle; its
  * output has stratum cardinality (languages/domains — tens, not
  * rows), so the collect_list fold runs on a frame that is tiny at
  * any corpus size.
  */
object Mixture {

  /** Per-stratum token mass and temperature-scaled weight:
    * (stratum, n_tok, weight) with Σ weight = 1 before rounding. */
  def temperatureWeights(df: DataFrame, stratumCol: Column,
                         tokensCol: Column): DataFrame = {
    val perStratum = df.groupBy(stratumCol.as("stratum"))
      .agg(sum(tokensCol.cast("long")).as("n_tok"))
    perStratum
      .agg(sort_array(collect_list(struct(col("stratum"), col("n_tok")))).as("ls"))
      .select(col("ls"), aggregate(col("ls"), lit(0.0d),
        (acc, x) => acc + sqrt(x("n_tok").cast("double"))).as("denom"))
      .select(explode(col("ls")).as("e"), col("denom"))
      .select(col("e.stratum").as("stratum"), col("e.n_tok").as("n_tok"),
        Rounding.r(sqrt(col("e.n_tok").cast("double")) / col("denom"), 6).as("weight"))
  }
}
