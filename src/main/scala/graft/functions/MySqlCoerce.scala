package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL implicit string→number coercion (SURVEY §7.3).
  *
  * MySQL parses the longest valid numeric prefix of a string and coerces
  * the rest away with a warning — `'123abc' + 1 = 124`, `'x' + 1 = 1`
  * (reference `types/convert.go` StrToFloat/getValidFloatPrefix). Spark's
  * default cast yields NULL for any malformed string; this helper closes
  * that delta as a composition of codegen'd built-ins (regexp prefix
  * extract + cast), no UDF.
  */
object MySqlCoerce {

  /** Longest valid float prefix: optional leading whitespace and sign,
    * digits with at most one dot, optional exponent.
    */
  private[graft] val NumPrefix =
    "^[ \\t]*([+-]?(?:[0-9]+\\.?[0-9]*|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?)"

  /** MySQL-semantics string→double: numeric prefix value, 0.0 when the
    * string has no numeric prefix (matching MySQL's coerce-to-zero).
    */
  def toDouble(c: Column): Column = {
    // the extracted prefix is a valid literal whenever non-empty, so the
    // cast is ANSI-safe; no-prefix strings coerce to 0 like MySQL
    val p = regexp_extract(c, NumPrefix, 1)
    when(p === "", lit(0.0)).otherwise(p.cast("double"))
  }

  /** MySQL-semantics string→bigint: the float prefix rounds HALF AWAY
    * FROM ZERO in integer context — '42.9' → 43, '-1.5' → -2 — per the
    * reference's `types/convert.go` floatStrToIntStr → roundIntStr on
    * the first fractional digit (truncation was a silent divergence
    * from that documented behavior). Spark's round() at integer scale
    * equals DuckDB's (every half-point is dyadic — the ExactNum.cents
    * argument), so the oracle twin is `CAST(round(x) AS BIGINT)`
    * bit-for-bit. One knowing delta vs the reference: it rounds the
    * DECIMAL DIGITS, we round the parsed double, so a >15-significant-
    * digit prefix straddling its double's half-point can differ — both
    * ENGINES here still agree with each other. SATURATES at the bigint
    * range like MySQL (convert.go clamps to LLONG_MAX/LLONG_MIN with a
    * warning) — a bare ANSI cast would abort the whole query with
    * CAST_OVERFLOW on a "1e300" prefix instead of coercing.
    * Long.MaxValue.toDouble rounds UP to 2^63 (not representable), so
    * the >= comparison is the correct boundary (and inside it doubles
    * at that magnitude are exact integers, so round() cannot escape
    * the range); Long.MinValue is a power of two and exact.
    */
  def toLong(c: Column): Column = longFromDouble(toDouble(c))

  /** The integer-context step alone (round half away from zero,
    * saturate at the bigint range) for callers whose input is already
    * numeric — the non-strict clamp applies to numeric sources too, and
    * routing them through the string scanner would lose precision on
    * large longs (their shortest double repr is not exact).
    */
  private[graft] def longFromDouble(d: Column): Column =
    when(d >= lit(Long.MaxValue.toDouble), lit(Long.MaxValue))
      .when(d <= lit(Long.MinValue.toDouble), lit(Long.MinValue))
      .otherwise(round(d).cast("bigint"))

  /** MySQL true division (`arithmeticDivide`,
    * `expression/builtin_arithmetic.go:471`): always real-valued, NULL on
    * zero divisor — under ANSI Spark that is exactly `try_divide`.
    */
  def div(a: Column, b: Column): Column = try_divide(a, b)

  /** Independent hand-rolled reimplementation of the reference's
    * `getValidFloatPrefix` scanner (`types/convert.go`) for differential
    * tests — deliberately not sharing the regex above.
    */
  private[graft] def prefixDouble(s0: String): Double = {
    val s = s0.dropWhile(c => c == ' ' || c == '\t')
    var i = 0
    var sawDigit = false
    var sawDot = false
    var end = 0
    // ASCII digits ONLY, like the production regex's [0-9] and the
    // reference scanner: Char.isDigit also accepts Unicode decimal
    // digits (Arabic-Indic, full-width), which substring(...).toDouble
    // then throws on — the differential would CRASH instead of
    // disagreeing gracefully
    def dig(ch: Char) = ch >= '0' && ch <= '9'
    if (i < s.length && (s(i) == '+' || s(i) == '-')) i += 1
    while (i < s.length && (dig(s(i)) || (s(i) == '.' && !sawDot))) {
      if (dig(s(i))) { sawDigit = true; end = i + 1 }
      else sawDot = true
      i += 1
    }
    if (sawDigit && s(i - 1) == '.') end = i // trailing dot is valid
    if (!sawDigit) return 0.0
    // optional exponent: only valid with at least one following digit
    if (i < s.length && (s(i) == 'e' || s(i) == 'E')) {
      var j = i + 1
      if (j < s.length && (s(j) == '+' || s(j) == '-')) j += 1
      val expStart = j
      while (j < s.length && dig(s(j))) j += 1
      if (j > expStart) end = j
    }
    s.substring(0, end).toDouble
  }
}
