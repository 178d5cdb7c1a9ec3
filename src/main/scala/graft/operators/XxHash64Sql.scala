package graft.operators

/** DuckDB SQL generator replicating Spark's `xxhash64(string)` — standard
  * XXH64 with seed 42 over the UTF-8 bytes — so hash-dependent queries
  * (SimHash signatures) can have exact DuckDB oracle twins instead of
  * rows-only checks.
  *
  * Emits a chain of CTE stages over a vocabulary CTE `v(t)`, one hash op
  * per stage so expressions stay flat (nesting the 64-bit multiply
  * textually would blow up exponentially). Arithmetic domain: HUGEINT
  * mod 2^64. A 64×64-bit product can exceed HUGEINT's 2^127−1, so
  * multiplies split both operands at 2^32 (validated bit-exact against
  * Spark's xxhash64 across 1–31-byte inputs); rotations are disjoint
  * shift-sums; XOR hops through UBIGINT (DuckDB's xor is not defined on
  * HUGEINT).
  *
  * Unrolled for inputs shorter than 32 bytes: three conditional 8-byte
  * chunk rounds, one conditional 4-byte chunk, three conditional tail
  * bytes, then the avalanche. The ≥ 32-byte four-accumulator path is NOT
  * emitted, and bytes are read as `ascii(t[i])` (= the UTF-8 byte only
  * for ASCII). TESTDATA tokens are ASCII and ≤ 8 bytes; DedupSpec asserts
  * both preconditions so a corpus change fails loudly in the suite, not
  * silently in the oracle.
  */
private[operators] object XxHash64Sql {
  private val M = BigInt(1) << 64
  private val M32 = BigInt(1) << 32
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")

  /** (a * const) mod 2^64 with both operands split at 2^32; `a` must be a
    * plain column reference (it is repeated four times).
    */
  private def mul64(a: String, c: BigInt): String = {
    val (bl, bh) = (c % M32, c >> 32)
    s"(($a % $M32) * $bl + ((($a % $M32) * $bh + ($a // $M32) * $bl) % $M32) * $M32) % $M"
  }

  private def rotl(a: String, r: Int): String =
    s"(($a * ${BigInt(1) << r}) % $M + $a // ${BigInt(1) << (64 - r)})"

  private def xor64(a: String, b: String): String =
    s"CAST(xor(CAST($a AS UBIGINT), CAST($b AS UBIGINT)) AS HUGEINT)"

  /** Little-endian u64 from bytes 8i+1 .. 8i+8 of the `bs` byte list. */
  private def u64le(i: Int): String =
    (0 until 8).map(j =>
      if (j == 0) s"bs[${8 * i + 1}]"
      else s"bs[${8 * i + j + 1}] * ${BigInt(1) << (8 * j)}").mkString(" + ")

  /** CTE chain text (without leading/trailing comma) ending in a stage
    * that holds `(t, h)` with h = unsigned xxhash64(t, seed 42); the
    * final stage's name is [[last]]. Prepend a CTE `v(t)` holding the
    * (distinct) strings to hash.
    */
  val (ctes: String, last: String) = {
    val stages = collection.mutable.ArrayBuffer[(String, String)]()
    var k = 0
    stages += ("xx0" ->
      ("SELECT t, strlen(t) AS n, list_transform(range(1, strlen(t)+1), " +
        s"i -> CAST(ascii(t[i]) AS HUGEINT)) AS bs, " +
        s"CAST(${42 + P5} AS HUGEINT) + strlen(t) AS h FROM v"))
    def prev = s"xx$k"
    // a plain hash-update stage
    def add(hExpr: String): Unit = {
      val p = prev; k += 1
      stages += (s"xx$k" -> s"SELECT t, n, bs, $hExpr AS h FROM $p")
    }
    // a stage computing the chunk scratch value `kc` (NULL when inactive)
    def addK(kExpr: String, cond: String): Unit = {
      val p = prev; k += 1
      stages += (s"xx$k" ->
        s"SELECT t, n, bs, h, CASE WHEN $cond THEN $kExpr END AS kc FROM $p")
    }
    for (i <- 0 until 3) { // 8-byte chunk rounds
      val c = s"n >= ${8 * (i + 1)}"
      addK(u64le(i), c)
      addK(mul64("kc", P2), c)
      addK(rotl("kc", 31), c)
      addK(mul64("kc", P1), c)
      add(s"CASE WHEN $c THEN ${xor64("h", "kc")} ELSE h END")
      add(s"CASE WHEN $c THEN ${rotl("h", 27)} ELSE h END")
      add(s"CASE WHEN $c THEN (${mul64("h", P1)} + $P4) % $M ELSE h END")
    }
    val c4 = "n % 8 >= 4" // 4-byte chunk after the full 8-byte chunks
    val u32 = (0 until 4).map(j =>
      if (j == 0) "bs[(n // 8) * 8 + 1]"
      else s"bs[(n // 8) * 8 + ${j + 1}] * ${BigInt(1) << (8 * j)}")
      .mkString(" + ")
    add(s"CASE WHEN $c4 THEN ${xor64("h", s"(($u32) * $P1) % $M")} ELSE h END")
    add(s"CASE WHEN $c4 THEN ${rotl("h", 23)} ELSE h END")
    add(s"CASE WHEN $c4 THEN (${mul64("h", P2)} + $P3) % $M ELSE h END")
    for (r <- 0 until 3) { // tail bytes (n % 4 of them)
      val c = s"n % 4 > $r"
      val b = s"bs[(n // 8) * 8 + ((n % 8) // 4) * 4 + ${r + 1}]"
      add(s"CASE WHEN $c THEN ${xor64("h", s"($b * $P5) % $M")} ELSE h END")
      add(s"CASE WHEN $c THEN ${rotl("h", 11)} ELSE h END")
      add(s"CASE WHEN $c THEN ${mul64("h", P1)} ELSE h END")
    }
    add(xor64("h", s"h // ${BigInt(1) << 33}")) // avalanche
    add(mul64("h", P2))
    add(xor64("h", s"h // ${BigInt(1) << 29}"))
    add(mul64("h", P3))
    add(xor64("h", s"h // ${BigInt(1) << 32}"))
    (stages.map { case (n, s) => s"$n AS ($s)" }.mkString(",\n"), prev)
  }
}
