package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays as a native Catalyst expression.
  *
  * The DataFrame-composable alternatives are both unusable at scale: the
  * `aggregate(zip_with(...))` higher-order fold is interpreted (no
  * codegen), and unrolling `a[0]*b[0] + a[1]*b[1] + …` to 64 terms
  * produces megabyte plan trees (observed 1.5 MiB task binaries) that
  * dominate optimizer/codegen time and spill out of whole-stage codegen.
  * A `doGenCode` loop keeps the plan node O(1)-sized and the inner loop
  * branch-free — the Spark-native analog of a vectorized kernel.
  *
  * Semantics match the left-associated fold `0.0 + a0·b0 + a1·b1 + …`
  * (DuckDB `list_dot_product` evaluation order), so doubles stay
  * bit-identical for the oracle hash-compare. NULL array → NULL; NULL
  * element → NULL; mismatched lengths → error (the dimension guard:
  * a wrong-dimension vector must fail loudly, not silently truncate).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double> — the [[VectorOps.dot]] wrapper casts
  // (a no-op on already-double arrays); checkInputDataTypes covers the
  // raw SQL `graft_dot(...)` path, since Spark 4 hides
  // AbstractDataType/inputTypes from third-party expressions.
  override def dataType: DataType = DoubleType

  // NULL on null input arrays AND on null elements — the latter makes
  // the result nullable even when both children are non-nullable
  // (without this override codegen would assign into a false literal)
  override def nullable: Boolean = true

  // Deliberately NON-foldable (r21): an all-literal dot — centDists'
  // |c|² = graft_dot(cv, cv) over the centroid array literal — must
  // SURVIVE ConstantFolding, or the optimizer folds it to a primitive
  // double that codegen inlines into the generated source, and every
  // Lloyd iteration's new centroid values then produce brand-new
  // source = a full Janino compile per iteration (the exact cost the
  // array-literal form exists to avoid — array literals land in the
  // codegen references array, keeping the source identical across
  // iterations). Cost: a 64-element literal-literal dot evaluates per
  // row (~64 flops) instead of once — noise next to the per-row v·c
  // dots beside it; no other call site passes two literals.
  override def foldable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) throw new IllegalArgumentException(
      s"graft_dot: dimension mismatch: $n vs ${b.numElements()}")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: dimension mismatch: " + $n + " vs " + $b.numElements());
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Registers `graft_dot` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "graft_dot") { exprs =>
      require(exprs.length == 2,
        s"graft_dot expects 2 arguments, got ${exprs.length}")
      DotProduct(exprs(0), exprs(1))
    }

  /** Column-API entry point; requires [[register]] on the session first. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot",
      a.cast("array<double>"), b.cast("array<double>"))
}
