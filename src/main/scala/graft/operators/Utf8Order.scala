package graft.operators

/** UTF-8 binary string ordering — the ordering Spark's UTF8String
  * comparisons and DuckDB's VARCHAR ORDER BY both use. Java's natural
  * `String` ordering compares UTF-16 CODE UNITS instead, which diverges
  * for supplementary characters: a surrogate pair (0xD800-0xDFFF units)
  * sorts BELOW U+E000..U+FFFF in UTF-16 but its 4-byte UTF-8 encoding
  * (0xF0..) sorts ABOVE their 3-byte encodings (0xE0..). Any driver-side
  * fast path that replays an ordering the distributed plan or a DuckDB
  * oracle also computes (BPE argmax tie-break, text_rank's final sort,
  * Misra-Gries top-k ties) must therefore compare UTF-8 bytes, or an
  * astral-character corpus silently picks different winners per path.
  */
private[graft] object Utf8Order extends Ordering[String] {
  override def compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    var r = 0
    while (r == 0 && i < n) {
      r = (a(i) & 0xff) - (b(i) & 0xff)
      i += 1
    }
    if (r != 0) r else a.length - b.length
  }
}
