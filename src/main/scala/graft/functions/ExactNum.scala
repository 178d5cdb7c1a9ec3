package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stable numeric aggregation.
  *
  * Summing doubles is order-dependent; Spark's partition-parallel sums and
  * DuckDB's single-threaded sums would disagree in the low bits, which a
  * hash-compare would flag. Fix: round each row to 4 decimals via a
  * DecimalType cast (exact), sum decimals (exact, any order), then convert
  * back to double. Both engines produce bit-identical doubles.
  *
  * Averages don't need this: the relative error of a double mean is ~n·ε,
  * far below the 4-decimal rounding granularity at our row counts, so
  * `round(avg(x), 4)` is stable.
  */
object ExactNum {
  private val Dec = DecimalType(30, 4)

  /** Order-independent sum of a double expression, rounded to 4 dp. */
  def exactSum(c: Column): Column =
    round(sum(c.cast(Dec)).cast("double"), 4)

  /** DuckDB SQL mirroring [[exactSum]]. */
  def oracleSum(expr: String): String =
    s"round(CAST(sum(CAST(($expr) AS DECIMAL(30,4))) AS DOUBLE), 4)"

  def avg4(c: Column): Column = round(avg(c), 4)

  def oracleAvg(expr: String): String = s"round(avg($expr), 4)"

  /** Exact integer cents of a (nullable) double money value.
    *
    * `round(x, 2)` on a double is engine-divergent for full-precision
    * inputs: Spark HALF_UPs the SHORTEST-DECIMAL repr (0.285 → "0.285"
    * → 0.29) while DuckDB rounds the scaled BINARY value (0.285 is
    * really 0.28499999999999998… → 0.28). Scaling to integer first
    * closes the class: `x * 100` is the same IEEE product bit-for-bit
    * in both engines, and at integer scale every exact half-point
    * (n + 0.5) is dyadic — so a shortest repr ending in ".5" IS binary
    * half, where Spark's HALF_UP and DuckDB's round-half-away-from-zero
    * agree (including negatives), and every non-half product rounds by
    * its true binary side in both. The result is a BIGINT, hash-exact
    * by construction. NULL in → NULL out.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** DuckDB SQL mirroring [[cents]]. */
  def oracleCents(expr: String): String =
    s"CAST(round(($expr) * 100) AS BIGINT)"
}
