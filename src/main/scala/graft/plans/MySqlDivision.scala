package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Divide, EvalMode, IntegralDivide, Remainder, SubqueryExpression, TryEval}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}

/** MySQL division semantics at the SQL entry path: `x / 0`, `x DIV 0`
  * and `x % 0` evaluate to NULL (the reference's division/mod paths,
  * tinysql `expression/builtin_arithmetic.go:471`), where ANSI Spark
  * raises DIVIDE_BY_ZERO. The division-family expressions of the PARSED
  * plan are rewritten to `TryEval(div in TRY mode)` before analysis —
  * it must happen pre-analysis because constant folding would evaluate
  * a literal `1/0` and throw before any optimizer-stage rule could run.
  * That rewrite is EXACTLY Spark's own `try_divide` replacement
  * (TryDivide → TryEval(Divide(l, r, TRY)), verified in the 4.1.2
  * bytecode): the TryEval wrapper is load-bearing — IntegralDivide's
  * final eval throws DIVIDE_BY_ZERO even in TRY mode, so mode alone
  * left `1 DIV 0` aborting. One KNOWING delta vs MySQL, pinned in
  * ReferenceParitySpec: TryEval catches errors from the division's
  * whole subtree, so an ANSI overflow inside an OPERAND of a division
  * is masked to NULL where MySQL errors — identical to try_divide's
  * own semantics, which the DataFrame path (`MySqlCoerce.div`) already
  * has, so both entry paths agree on every input. ANSI strictness
  * outside divisions stays intact.
  *
  * The walk must reach EVERY plan that can evaluate a division:
  * `transformUp` alone stops at subquery-expression boundaries (a
  * subquery's plan is not a plan CHILD) and at `UnresolvedWith`'s CTE
  * relations (innerChildren, not children) — `1/0` inside
  * `WITH t AS (SELECT 1/0) …` or `SELECT (SELECT 1/0)` used to escape
  * the rewrite and abort under ANSI.
  */
object MySqlDivision {

  private def tryMode(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case w: UnresolvedWith =>
      w.copy(cteRelations = w.cteRelations.map { case (name, rel, mr) =>
        (name, tryMode(rel).asInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias], mr)
      })
    case p => p.transformExpressionsUp {
      case s: SubqueryExpression => s.withNewPlan(tryMode(s.plan))
      // bottom-up keeps the rewrite from re-meeting its own TryEval;
      // guard against double-wrapping anyway (idempotence on re-entry)
      case t @ TryEval(_: Divide | _: IntegralDivide | _: Remainder) => t
      case d: Divide =>
        TryEval(d.copy(evalContext = d.evalContext.copy(evalMode = EvalMode.TRY)))
      case d: IntegralDivide =>
        TryEval(d.copy(evalContext = d.evalContext.copy(evalMode = EvalMode.TRY)))
      case r: Remainder =>
        TryEval(r.copy(evalContext = r.evalContext.copy(evalMode = EvalMode.TRY)))
    }
  }

  /** Parse, switch divisions to TRY mode, analyze: the front-end's
    * `spark.sql`. */
  def sql(spark: SparkSession, text: String): DataFrame =
    org.apache.spark.sql.graft.PlanExec.ofRows(spark,
      tryMode(spark.sessionState.sqlParser.parsePlan(text)))
}
