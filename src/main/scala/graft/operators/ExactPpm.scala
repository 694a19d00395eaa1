package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact parts-per-million: floor(num * 1e6 / den) as BIGINT with NO
  * intermediate rounding. Spark's decimal division resolves (38,0)/(38,0)
  * to scale 6 and rounds HALF_UP there, which diverges from true floor
  * division (and from the DuckDB twins' HUGEINT `//`) by one ppm once the
  * denominator exceeds ~2e6 — exactly the row counts the operators are
  * pitched at. Subtracting the remainder first (`pmod`) makes the division
  * itself exact at any magnitude, so the scale-6 result carries no
  * fraction to round. Non-negative operands only; NULL when `den` is NULL
  * or non-positive.
  */
private[operators] object ExactPpm {
  def ppm(num: Column, den: Column): Column = {
    val n6 = num.cast("decimal(38,0)") * lit(1000000L)
    val d = den.cast("decimal(38,0)")
    when(den > 0L, ((n6 - pmod(n6, d)) / d).cast("long"))
  }
}
