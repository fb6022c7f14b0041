package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in [[queries]] is one operator/capability from the
  * SURVEY §2 checklist; [[oracleSql]] carries the DuckDB-equivalent
  * SQL for the driver's correctness gate. Column names and types are
  * aligned pairwise (see SURVEY §5 for the parity rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q5-shaped star join: the CDC-materialized fact joined through
    * broadcast dimensions — the reference pipeline's end state.
    */
  def entry(spark: SparkSession): DataFrame =
    QueriesOlap.queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCdc.queries ++ QueriesOlap.queries ++ QueriesData.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * `round(x, d)` in the authored SQL is rewritten to the portable
    * `floor(x·10^d + 0.5)/10^d` form so the oracle's rounding is the
    * same IEEE arithmetic the Spark side uses (see functions.Rounding:
    * library round() semantics differ between engines on half-values).
    */
  def oracleSql: Map[String, String] =
    (QueriesCdc.oracleSql ++ QueriesOlap.oracleSql ++ QueriesData.oracleSql)
      .map { case (k, v) => k -> rewriteRound(v) }

  /** Bounded-memory oracle variants for the 10× scale gate only —
    * same semantics as the [[oracleSql]] entry of the same name,
    * statement-staged so DuckDB's live set stays flat (see
    * QueriesData.oracleSqlScale). Dumped as oracle_sql_scale.json;
    * consumed by tools/check.py, ignored by the driver. */
  def oracleSqlScale: Map[String, String] =
    QueriesData.oracleSqlScale.map { case (k, v) => k -> rewriteRound(v) }

  /** Rewrite every `round(expr, digits)` call in a SQL string to
    * `floor((expr) * 10^digits + 0.5) / 10^digits`, innermost-first,
    * with balanced-parenthesis scanning (no nesting assumptions).
    */
  private[graft] def rewriteRound(sql: String): String = {
    val marker = "round("
    val idx = sql.indexOf(marker)
    if (idx < 0) return sql
    // find the top-level comma and closing paren of this call
    var depth = 1
    var i = idx + marker.length
    var comma = -1
    while (depth > 0 && i < sql.length) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 1 && comma < 0 => comma = i
        case _ =>
      }
      i += 1
    }
    require(depth == 0 && comma > 0, s"unbalanced round() in: $sql")
    val inner = sql.substring(idx + marker.length, comma)
    val digits = sql.substring(comma + 1, i - 1).trim.toInt
    val f = math.pow(10, digits).toLong
    val replaced = sql.substring(0, idx) +
      s"floor(($inner) * $f + 0.5) / $f" + sql.substring(i)
    rewriteRound(replaced)
  }
}
