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
}
