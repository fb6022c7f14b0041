package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Engine-portable decimal rounding.
  *
  * `round()` semantics differ across engines: Spark rounds the shortest
  * decimal representation (BigDecimal HALF_UP) while C-family engines
  * round the binary value — a double whose repr ends in …5 at the
  * target digit can legitimately round both ways. Exported doubles
  * instead use the explicit `floor(x·10^d + 0.5) / 10^d` form: every
  * step is a plain IEEE-754 op, so any engine evaluating the same
  * formula on the same double produces the same bits. (Half-values
  * round toward +∞; consistency, not tie-break convention, is what
  * result parity needs.)
  */
object Rounding {
  def r(c: Column, digits: Int): Column = {
    val f = math.pow(10, digits)
    floor(c * f + 0.5) / f
  }
  /** The same formula as SQL text, for oracle queries. */
  def sql(expr: String, digits: Int): String = {
    val f = math.pow(10, digits).toLong
    s"floor(($expr) * $f + 0.5) / $f"
  }
}
