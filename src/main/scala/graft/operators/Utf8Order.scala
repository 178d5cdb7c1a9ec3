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
  /** Allocation-free code-point walk: UTF-8 is order-preserving on code
    * points, so comparing code points IS the UTF-8 byte comparison —
    * without materializing two byte arrays per call (this runs inside
    * the BPE argmax over a vocabulary-scale pair map, K times per
    * loop). Also safer than getBytes(UTF_8), which silently maps
    * unpaired surrogates to '?' and would order them all equal.
    */
  override def compare(x: String, y: String): Int = {
    val nx = x.length
    val ny = y.length
    var i = 0
    var j = 0
    while (i < nx && j < ny) {
      val cx = x.codePointAt(i)
      val cy = y.codePointAt(j)
      if (cx != cy) return Integer.compare(cx, cy)
      i += Character.charCount(cx)
      j += Character.charCount(cy)
    }
    Integer.compare(nx - i, ny - j)
  }
}
