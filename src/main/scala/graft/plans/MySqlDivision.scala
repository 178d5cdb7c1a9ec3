package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Divide, IntegralDivide, Remainder, TryEval}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** MySQL division semantics at the SQL entry path: `x / 0`, `x DIV 0`
  * and `x % 0` evaluate to NULL (the reference's division/mod paths,
  * tinysql `expression/builtin_arithmetic.go:471`), where ANSI Spark
  * raises DIVIDE_BY_ZERO. The division-family expressions of the PARSED
  * plan are wrapped in `TryEval` (exception → NULL) before analysis —
  * it must happen pre-analysis because constant folding would evaluate a
  * literal `1/0` and throw before any optimizer-stage rule could run.
  * Every other ANSI strictness (overflow errors) stays intact, and the
  * DataFrame operators reach the same semantics through
  * `MySqlCoerce.div` (try_divide), so both entry paths agree.
  */
object MySqlDivision {

  /** Parse, wrap divisions, analyze: the front-end's `spark.sql`. */
  def sql(spark: SparkSession, text: String): DataFrame = {
    val parsed = spark.sessionState.sqlParser.parsePlan(text)
    // bottom-up: a top-down transform would descend into the freshly
    // built TryEval wrapper, meet the same division node and recurse
    val wrapped = parsed.transformUp {
      case p => p.transformExpressionsUp {
        case d: Divide => TryEval(d)
        case d: IntegralDivide => TryEval(d)
        case r: Remainder => TryEval(r)
      }
    }
    org.apache.spark.sql.graft.PlanExec.ofRows(spark, wrapped)
  }
}
