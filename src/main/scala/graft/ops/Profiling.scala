package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling: the column-level health stats a pipeline
  * asserts before training on (or serving) a table.
  *
  * One aggregation pass over the table produces every column's stats;
  * the single result row is unpivoted to (col_name, n_nulls,
  * n_distinct) rows. Exact distinct counts use Catalyst's Expand
  * (input replicated once per DISTINCT aggregate) — fine for a
  * handful of columns; profile very wide tables with
  * [[approxColumnStats]] instead, which stays single-replica.
  */
object Profiling {

  private def unpivot(row: DataFrame, cols: Seq[String]): DataFrame = {
    val structs = cols.map(c => struct(lit(c).as("col_name"),
      col(s"__n_$c").as("n_nulls"), col(s"__d_$c").as("n_distinct")))
    row.select(explode(array(structs: _*)).as("s")).select(col("s.*"))
  }

  /** Exact per-column (nulls, distinct) stats in one pass. (The null
    * count is coalesced: `sum` over an empty table is SQL-null, but an
    * empty table has zero nulls.)
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__n_$c"),
      count_distinct(col(c)).as(s"__d_$c")))
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  /** HLL-based variant for wide tables: no Expand, single input
    * replica; distinct counts carry approx_count_distinct's standard
    * error. */
  def approxColumnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"__n_$c"),
      approx_count_distinct(col(c)).as(s"__d_$c")))
    unpivot(df.agg(aggs.head, aggs.tail: _*), cols)
  }
}
