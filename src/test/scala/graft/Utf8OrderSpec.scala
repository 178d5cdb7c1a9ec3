package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions.col

import graft.operators.Utf8Order

/** Pins the [[graft.operators.Utf8Order]] contract directly. The
  * ordering is load-bearing for three driver-side fast paths that must
  * replay an ordering the distributed plan / DuckDB oracle also
  * computes (BPE argmax tie-break, text_rank's final sort, Misra-Gries
  * top-k ties); until now it was only exercised indirectly through the
  * BPE non-BMP cross-path test. Each case here is a way the ordering
  * could silently drift from Spark/DuckDB's UTF-8 binary collation.
  * All non-ASCII strings are built from explicit code points so the
  * cases survive any source-encoding mishap.
  */
class Utf8OrderSpec extends SparkSuite {

  private def cp(points: Int*): String =
    points.map(p => new String(Character.toChars(p))).mkString

  private val astral  = cp(0x1F355) // 4-byte UTF-8 (surrogate pair in UTF-16)
  private val bmpHigh = cp(0xFFFD)  // 3-byte UTF-8, above surrogates in UTF-16
  private val samples = Seq(
    "", "a", "ab", "A", "z", "~", cp(0x00), // ASCII incl. boundaries (NUL = lowest code point)
    cp(0xE9), cp(0x7FF),                           // 2-byte UTF-8
    cp(0x800), bmpHigh, cp(0xE000),                // 3-byte UTF-8
    astral, astral + "a", "a" + astral, cp(0x10FFFF), // 4-byte UTF-8
    "na" + cp(0xEF) + "ve", "caf" + cp(0xE9), "cafe")

  test("divergence case: astral sorts above BMP-high in UTF-8, below in UTF-16") {
    // The whole reason this ordering exists: Java's natural String
    // ordering puts the surrogate pair (0xD83C...) BELOW U+FFFD and
    // U+E000, UTF-8 bytes (0xF0... vs 0xEF.../0xEE...) put it ABOVE.
    // If these ever agree, the guard is meaningless.
    assert(Utf8Order.compare(astral, bmpHigh) > 0)
    assert(Ordering.String.compare(astral, bmpHigh) < 0)
    assert(Utf8Order.compare(astral, cp(0xE000)) > 0)
    assert(Ordering.String.compare(astral, cp(0xE000)) < 0)
  }

  test("agrees with UTF-8 byte-array comparison on all sample pairs") {
    def byteCmp(x: String, y: String): Int = {
      val a = x.getBytes(UTF_8); val b = y.getBytes(UTF_8)
      var i = 0
      while (i < a.length && i < b.length) {
        val c = java.lang.Integer.compare(a(i) & 0xFF, b(i) & 0xFF)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(a.length, b.length)
    }
    for (x <- samples; y <- samples)
      assert(Integer.signum(Utf8Order.compare(x, y)) == Integer.signum(byteCmp(x, y)),
        s"Utf8Order vs getBytes(UTF_8) disagree on (${x.codePoints.toArray.mkString(",")}) " +
          s"vs (${y.codePoints.toArray.mkString(",")})")
  }

  test("agrees with Spark's string orderBy (the distributed side of every replay)") {
    import spark.implicits._
    val sparkSorted = samples.toDF("s").orderBy(col("s")).as[String].collect().toSeq
    assert(sparkSorted == samples.sorted(Utf8Order))
  }

  test("total-order laws on the sample set: antisymmetry and transitivity") {
    for (x <- samples; y <- samples)
      assert(Integer.signum(Utf8Order.compare(x, y)) ==
        -Integer.signum(Utf8Order.compare(y, x)))
    for (x <- samples; y <- samples; z <- samples
         if Utf8Order.compare(x, y) <= 0 && Utf8Order.compare(y, z) <= 0)
      assert(Utf8Order.compare(x, z) <= 0)
  }

  test("lone surrogates: the one divergent input class is unreachable after a Spark round-trip") {
    // Ill-formed UTF-16: an unpaired high surrogate. Here — and ONLY
    // here — Utf8Order diverges from the getBytes(UTF_8) byte path:
    // the code-point walk sees 0xD800 (sorts between the 3-byte BMP
    // range and U+E000), while the UTF-8 ENCODER cannot represent a
    // lone surrogate and substitutes '?' (0x3F, sorts below all
    // non-ASCII). Both facts are pinned so neither side can drift
    // silently.
    val lone = new String(Array('\uD800'))
    assert(Utf8Order.compare(lone, cp(0x800)) > 0)   // code-point order
    assert(Utf8Order.compare(lone, cp(0xE000)) < 0)
    assert(new String(lone.getBytes(UTF_8), UTF_8) == "?") // encoder substitutes
    // Why the divergence is unreachable in production: every driver-side
    // replay input (BPE vocab collect, text_rank graph, MG top-k) comes
    // OUT OF a Spark row, and Spark's UTF8String conversion applies the
    // same getBytes(UTF_8) substitution on the way IN — after the
    // round-trip the string literally IS "?", a well-formed string on
    // which all orderings agree. Pinned end-to-end: if a future Spark
    // ever starts preserving lone surrogates (WTF-8-style), this fails
    // and Utf8Order must be revisited.
    import spark.implicits._
    val roundTripped = Seq(lone).toDF("s").as[String].collect().head
    assert(roundTripped == "?",
      s"Spark no longer sanitizes lone surrogates: got code points " +
        roundTripped.codePoints.toArray.mkString(","))
  }

  test("prefix sorts first; equality only on identical strings") {
    assert(Utf8Order.compare("a", "ab") < 0)
    assert(Utf8Order.compare(astral, astral + "a") < 0)
    for (x <- samples; y <- samples)
      assert((Utf8Order.compare(x, y) == 0) == (x == y))
  }
}
