package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** DISTINCT word n-gram hashes of a token array, as one native Catalyst
  * expression: for each window `t[i..i+n-1]` the seed-chained
  * `xxhash64(t[i], …, t[i+n-1])`, deduplicated in-row, as
  * `array<bigint>`; the empty array when the doc is shorter than n
  * (callers explode, so short docs drop exactly like the old CASE
  * guard's empty-array branch).
  *
  * Replaces the `CASE WHEN size(t) >= n THEN transform(sequence(0,
  * size(t)-n), i -> xxhash64(t[i], …)) ELSE array() END` HOF composed
  * with a downstream row-level `.distinct()`. Two costs go away
  * (guide §1.2 step 2 / §5, the r21 allocation target):
  *
  *   - the HOF chain is interpreted per ELEMENT (HigherOrderFunction is
  *     CodegenFallback): a boxed index and boxed hash per window plus
  *     the `sequence` index array per row — profiled as the dominant
  *     per-row churn of the shingle build;
  *   - the `.distinct()` was a corpus-scale row-level hash aggregate
  *     whose only duplicates are WITHIN one document's windows (every
  *     caller feeds one row per doc_id), so an in-row sort+unique over
  *     a primitive long[] produces the identical row set with no
  *     aggregation hash map at all. In-array order changes
  *     (sorted vs first-occurrence) — unobservable after the explode,
  *     since every consumer is a join/aggregation on the VALUE.
  *
  * Hash identity: per window the chain `h = 42; h = xxh64(bytes(t[j]),
  * h)` over the n tokens in order is exactly the multi-arg `xxhash64`
  * expression's evaluation (same XXH64.hashUnsafeBytes, same seed
  * chaining, null elements skipped leaving h unchanged) — DedupSpec
  * pins the equivalence against the built-in, and the DuckDB oracle
  * gate covers the end-to-end counts.
  */
case class WordNgramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, n >= 1 int literal), got " +
        s"(${child.dataType.simpleString}, $n)")
  }

  override def prettyName: String = "graft_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    NgramHash.distinctWindowHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call keeps the whole computation inside whole-stage
    // codegen with zero boxing (the DotProduct discipline)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramHash.distinctWindowHashes($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}

object NgramHash {

  private val EmptyLongs = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** The kernel: chained XXH64 per n-window over the token array's raw
    * UTF-8 bytes, then primitive sort + unique. One long[m] is the only
    * per-row allocation on the happy path (plus the compact result
    * copy when duplicates existed).
    */
  def distinctWindowHashes(a: ArrayData, n: Int): ArrayData = {
    val m = a.numElements() - n + 1
    if (m <= 0) return EmptyLongs
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 42L
      var j = i
      val end = i + n
      while (j < end) {
        // null elements leave the seed unchanged — the multi-arg
        // xxhash64 expression's null semantics (tokenizer output never
        // contains nulls, but slices of foreign arrays could)
        if (!a.isNullAt(j)) {
          val t = a.getUTF8String(j)
          h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset,
            t.numBytes, h)
        }
        j += 1
      }
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 1
    var k = 1
    while (k < m) {
      if (out(k) != out(k - 1)) { out(w) = out(k); w += 1 }
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) out else java.util.Arrays.copyOf(out, w))
  }

  /** Registers `graft_ngram_hashes(t, n)` in the session registry. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "graft_ngram_hashes") { exprs =>
      require(exprs.length == 2,
        s"graft_ngram_hashes expects 2 arguments, got ${exprs.length}")
      val n = exprs(1) match {
        case e if e.foldable &&
            e.dataType == org.apache.spark.sql.types.IntegerType =>
          e.eval().asInstanceOf[Int]
        case other => throw new IllegalArgumentException(
          s"graft_ngram_hashes: n must be an int literal, got $other")
      }
      WordNgramHashes(exprs(0), n)
    }

  /** Column-API entry point; requires [[register]] on the session first. */
  def distinctNgramHashes(t: Column, n: Int): Column =
    call_function("graft_ngram_hashes", t,
      org.apache.spark.sql.functions.lit(n))
}
