package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint (base 31, mod 1e9+7) over the
  * text's code points, as a native Catalyst expression.
  *
  * The DataFrame-composable form — `aggregate(split(text, ''), ...)` —
  * materializes a per-CHARACTER array of single-char strings for every
  * row and folds it with an interpreted lambda: O(n) allocations per
  * document just to walk its characters. This expression walks the code
  * points in one pass inside whole-stage codegen, no allocation beyond
  * the decoded string.
  *
  * Semantics are exactly the fold the composed form computes
  * (`acc = (acc*31 + codepoint) % 1_000_000_007`, left to right; Java's
  * zero-width split never cuts a surrogate pair, so the composed form
  * also iterates code points), and match the DuckDB oracle's
  * `list_reduce(list_transform(string_split(text, ''), ascii), ...)`
  * bit-for-bit. NULL text → NULL.
  */
case class Fingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val acc = ctx.freshName("acc")
      s"""
         |String $s = $in.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % 1000000007L;
         |  $i += Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Fingerprint =
    copy(child = newChild)
}

object Fingerprint {
  /** Registers `graft_fingerprint` in the session's registry (idempotent). */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "graft_fingerprint") { exprs =>
      // arity-check at analysis: exprs.head alone would silently drop
      // extra SQL arguments and return a plausible wrong fingerprint
      require(exprs.length == 1,
        s"graft_fingerprint expects 1 argument, got ${exprs.length}")
      Fingerprint(exprs.head)
    }

  /** Column-API entry point; requires [[register]] on the session first. */
  def fingerprint(text: Column): Column =
    call_function("graft_fingerprint", text)
}
