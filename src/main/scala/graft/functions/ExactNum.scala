package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-stable numeric aggregation.
  *
  * Summing doubles is order-dependent; Spark's partition-parallel sums and
  * DuckDB's single-threaded sums would disagree in the low bits, which a
  * hash-compare would flag. Fix: quantize each row to EXACT integer 1e-4
  * units by the [[cents]] dyadic argument (round(x·10⁴) is the same IEEE
  * product and the same half-point decision in both engines — at integer
  * scale every half is dyadic, so Spark's shortest-repr HALF_UP and
  * DuckDB's binary half-away agree), sum the longs (exact, any order),
  * and divide once by 10⁴ (one IEEE op on the same exact integer in both
  * engines). A DECIMAL(30,4) per-row CAST was used before, but the cast
  * itself is the round(x,2) divergence class at 4 dp: Spark HALF_UPs the
  * shortest decimal repr while DuckDB rounds the scaled binary value
  * (probed: 6328.11865 → 6328.1187 vs 6328.1186), so one full-precision
  * fixture value away from flipping the hash gate. Averages shared the
  * class via `round(avg(x), 4)` — they now divide the same exact unit
  * sum by the same count (two IEEE ops, same operands both engines).
  */
object ExactNum {

  /** Per-row exact 1e-4 units of a (nullable) double — see [[cents]].
    *
    * Magnitude ceiling: the long cast aborts under ANSI once
    * |x·10⁴| > 2⁶³ (|x| > ~9.2e14), where the old DECIMAL(30,4) path
    * carried magnitudes to 1e26. The loss is deliberate and LOCKSTEP:
    * DuckDB's `CAST(round(x*10000) AS BIGINT)` twin aborts at the same
    * bound, so a too-large fixture value fails BOTH engines loudly
    * (a clear CAST_OVERFLOW mid-suite) rather than forking the hash.
    * Real inputs here are money/measure values ≤ 1e7. */
  private def units4(c: Column): Column = round(c * 10000).cast("long")
  private def oracleUnits4(expr: String): String =
    s"CAST(round(($expr) * 10000) AS BIGINT)"

  /** Order-independent, engine-exact sum of a double expression at 1e-4
    * granularity. */
  def exactSum(c: Column): Column =
    sum(units4(c)).cast("double") / 10000.0

  /** DuckDB SQL mirroring [[exactSum]] (sum(BIGINT) is HUGEINT there —
    * still the exact integer the double conversion sees). */
  def oracleSum(expr: String): String =
    s"(CAST(sum(${oracleUnits4(expr)}) AS DOUBLE) / 10000.0)"

  /** Engine-exact mean at 1e-4 input granularity: the exact unit sum
    * divided by the non-null count, then descaled — deterministic to
    * the last bit in both engines (the old `round(avg(x), 4)` rounded
    * an order-independent mean, but the final round itself was the
    * shortest-repr-vs-binary divergence class on half-ending means). */
  def avg4(c: Column): Column =
    sum(units4(c)).cast("double") / count(c) / 10000.0

  def oracleAvg(expr: String): String =
    s"(CAST(sum(${oracleUnits4(expr)}) AS DOUBLE) / count($expr) / 10000.0)"

  /** Engine-exact 4-dp rounding of a double that STAYS a double (same
    * consumer schema as the old `round(x, 4)`): scale to integer (one
    * IEEE product, bit-identical both engines), round at integer scale
    * (every half is dyadic, so Spark's shortest-repr HALF_UP and
    * DuckDB's binary half-away agree — the [[cents]] argument), then
    * ONE IEEE division of the same exact integer by the same constant.
    * This closes the ~1e-12 accepted residual the similarity outputs
    * (jaccard, cos_sim, ratio scores) carried when a quotient landed
    * within a ULP of a 4-dp half-point — `round(x, 4)` rounded the
    * shortest decimal repr in Spark but the scaled binary in DuckDB.
    * Valid for |x| < ~9e11 (integer scale exact below 2⁵³); similarity
    * and ratio outputs live in [-1, 1e7]. NULL in → NULL out.
    */
  def round4(c: Column): Column = round(c * 10000) / 10000.0

  /** DuckDB SQL mirroring [[round4]] (round(DOUBLE) stays DOUBLE). */
  def oracleRound4(expr: String): String =
    s"(round(($expr) * 10000) / 10000.0)"

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
