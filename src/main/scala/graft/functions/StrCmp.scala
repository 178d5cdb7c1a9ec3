package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MySQL STRCMP(a, b) → -1 / 0 / 1 (NULL if either side is NULL), as a
  * native Catalyst expression with whole-stage codegen.
  *
  * The reference implements this as `builtinStrcmp`
  * (tinysql `expression/builtin_string.go:128`, vectorized variant in
  * `builtin_string_vec.go`). Spark has no strcmp built-in; a custom
  * `BinaryExpression` with `doGenCode` keeps it inside codegen — the
  * Spark-native analog of the reference's vectorized kernel.
  */
case class StrCmp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "strcmp"

  // covers the raw SQL `strcmp(...)` path at ANALYSIS time (Spark 4
  // hides AbstractDataType/inputTypes from third-party expressions, so
  // without this a long operand passed analysis and died mid-task as a
  // ClassCastException) — the same guard its sibling expressions
  // DotProduct/Fingerprint carry
  override def checkInputDataTypes(): TypeCheckResult = {
    // NullType accepted: strcmp(NULL, 'x') is valid MySQL (result
    // NULL, via the nullSafeEval short-circuit) — rejecting the NULL
    // literal at analysis would regress a legal call form
    val ok = Seq(left, right).forall(e =>
      e.dataType == StringType || e.dataType == NullType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val c = l.asInstanceOf[UTF8String].compareTo(r.asInstanceOf[UTF8String])
    if (c < 0) -1 else if (c > 0) 1 else 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val c = ctx.freshName("cmp")
      s"""
         |int $c = $l.compareTo($r);
         |${ev.value} = $c < 0 ? -1 : ($c > 0 ? 1 : 0);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StrCmp =
    copy(left = newLeft, right = newRight)
}

object StrCmp {
  /** Registers `strcmp` in the session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "strcmp") { exprs =>
      require(exprs.length == 2,
        s"strcmp expects 2 arguments, got ${exprs.length}")
      StrCmp(exprs(0), exprs(1))
    }

  /** Column-API entry point; requires [[register]] on the session first. */
  def strcmp(a: Column, b: Column): Column = call_function("strcmp", a, b)
}
