package graft

import graft.functions.MySqlCoerce
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-test of the whole non-strict string→number coercion surface
  * (r13 verdict item 3): the r13 saturation work (half-away-from-zero
  * integer context, per-type clamps, DECIMAL try_cast bounds, the
  * unsigned 2⁶⁴-1 / 0 clamp added this round) was built point-by-point
  * from review findings — this spec pins it WHOLESALE, the SURVEY §5
  * vec-vs-row differential idea applied to the write path.
  *
  * Shape: ~250 seeded adversarial strings (type-boundary magnitudes ±
  * fractions, numeric prefixes, whitespace/sign/exponent junk, NULLs)
  * are driven through ONE real non-strict `INSERT … VALUES` statement
  * into a table declaring every integral + decimal target — signed and
  * unsigned — so the REAL `buildIncoming` path runs, not a re-assembled
  * column expression. Every stored cell is then compared against an
  * independent JVM-side model built on [[MySqlCoerce.prefixDouble]]
  * (the hand-rolled scanner already differentially pinned against the
  * production regex in MySqlSemanticsSpec) plus explicit
  * BigDecimal/clamp arithmetic mirroring the reference's
  * `types/convert.go` rules. Engine-vs-engine agreement for the shared
  * toDouble/toLong kernels is carried by the `expr_coercion` DuckDB
  * oracle in the driver gate; this spec extends the pin to the INSERT
  * targets the oracle cannot reach (DuckDB has no MySQL coercion).
  */
class CoercionPropertySpec extends SparkSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(14L))

  // ---- independent model -------------------------------------------------

  private val U64 = BigDecimal("18446744073709551615")

  /** Mirror of MySqlCoerce.toLong: prefix double, saturate at the long
    * range (the >= boundary comment there), else round HALF_UP at scale
    * 0 — which for the sign-symmetric setScale is half AWAY FROM ZERO —
    * then the double→long cast (the production path casts round()'s
    * DOUBLE result, so the model goes through doubleValue too).
    */
  private def longModel(d: Double): Long =
    if (d >= Long.MaxValue.toDouble) Long.MaxValue
    else if (d <= Long.MinValue.toDouble) Long.MinValue
    else java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Spark's double→DECIMAL(p,s) cast: shortest-repr BigDecimal,
    * HALF_UP to the target scale, None when the result exceeds the
    * precision (what try_cast turns into NULL).
    */
  private def castDec(d: Double, p: Int, s: Int): Option[BigDecimal] = {
    val v = BigDecimal.valueOf(d).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val bound = (BigDecimal(10).pow(p) - 1) / BigDecimal(10).pow(s)
    if (v.abs > bound) None else Some(v)
  }

  private def signedClamp(d: Double, mn: Long, mx: Long): Long =
    math.min(math.max(longModel(d), mn), mx)

  private def unsignedClamp(d: Double, ceil: Long): Long =
    math.min(math.max(longModel(d), 0L), ceil)

  /** BIGINT UNSIGNED: 0 floor, 2⁶⁴-1 ceiling (2⁶⁴-1 rounds UP to 2⁶⁴ as
    * a double, so >= is the boundary — same rationale as production). */
  private def u64Model(d: Double): BigDecimal =
    if (d < 0) BigDecimal(0)
    else if (d >= U64.toDouble) U64
    else castDec(d, 20, 0).getOrElse(U64)

  private def signedDecModel(d: Double, p: Int, s: Int): BigDecimal = {
    val bound = (BigDecimal(10).pow(p) - 1) / BigDecimal(10).pow(s)
    castDec(d, p, s).getOrElse(if (d > 0) bound else -bound)
  }

  // ---- generators --------------------------------------------------------

  /** Every type boundary the clamps care about, exact and ±1. */
  private val boundaries = Gen.oneOf(
    "0", "127", "128", "-128", "-129", "255", "256", "32767", "32768",
    "-32768", "-32769", "65535", "65536", "8388607", "8388608",
    "-8388608", "-8388609", "16777215", "16777216",
    "2147483647", "2147483648", "-2147483648", "-2147483649",
    "4294967295", "4294967296", "9223372036854775807",
    "9223372036854775808", "-9223372036854775808", "-9223372036854775809",
    "18446744073709551615", "18446744073709551616",
    "99999999999999999999", "1e19", "2e19", "1e300", "-1e300", "5e-1")

  private val boundaryish: Gen[String] = for {
    ws <- Gen.oneOf("", " ", "\t")
    b <- boundaries
    frac <- Gen.oneOf("", ".5", ".49", ".51", ".4", ".9")
    junk <- Gen.oneOf("", "x", "abc", " 7", "e")
  } yield s"$ws$b$frac$junk"

  private val numericish: Gen[String] = for {
    ws <- Gen.oneOf("", " ", "\t ")
    sign <- Gen.oneOf("", "+", "-")
    intPart <- Gen.oneOf(Gen.const(""), Gen.chooseNum(0, 99999).map(_.toString))
    frac <- Gen.oneOf(Gen.const(""), Gen.chooseNum(0, 999).map("." + _))
    exp <- Gen.oneOf("", "e2", "E-3", "e+18", "e", "eX")
    junk <- Gen.oneOf("", "abc", "x1", " 5", "-", ".")
  } yield s"$ws$sign$intPart$frac$exp$junk"

  private val weird = Gen.oneOf(
    "", "abc", "--1", "++2", "break", "12a34", ".e3", "1.2.3", ". 5", "e9")

  /** None renders as a SQL NULL — the coercion must propagate it, not
    * clamp it (the greatest/least skip-null regression class). */
  private val cell: Gen[Option[String]] = Gen.frequency(
    (4, boundaryish.map(Some(_))),
    (4, numericish.map(Some(_))),
    (1, weird.map(Some(_))),
    (1, Gen.const(None)))

  // ---- the property ------------------------------------------------------

  test("non-strict INSERT coercion: every integral+decimal target " +
    "matches the convert.go model on ~250 seeded adversarial strings") {
    val gs = new GraftSession(spark)
    val strs = samples(cell, 250)
    // all generated characters are SQL-literal-safe by construction
    assert(strs.flatten.forall(_.forall(c =>
      c.isLetterOrDigit || " \t+-.".contains(c))), "unsafe generator output")
    gs.execute("CREATE DATABASE IF NOT EXISTS coprop")
    gs.execute("USE coprop")
    gs.execute("DROP TABLE IF EXISTS cop")
    gs.execute("""CREATE TABLE cop (id INT PRIMARY KEY,
      t TINYINT, s SMALLINT, m MEDIUMINT, i INT, b BIGINT,
      tu TINYINT UNSIGNED, su SMALLINT UNSIGNED,
      mu MEDIUMINT UNSIGNED, iu INT UNSIGNED,
      bu BIGINT UNSIGNED, dc DECIMAL(8,2), d0 DECIMAL(20,0),
      db DOUBLE, fl FLOAT)""")
    gs.execute("SET sql_mode = ''")
    try {
      val rows = strs.zipWithIndex.map { case (so, id) =>
        val v = so.map(s => s"'$s'").getOrElse("NULL")
        s"($id, ${Seq.fill(14)(v).mkString(", ")})"
      }
      gs.execute(s"INSERT INTO cop VALUES ${rows.mkString(",\n")}")
      val got = spark.table("coprop.cop")
        .select("id", "t", "s", "m", "i", "b", "tu", "su", "mu", "iu",
          "bu", "dc", "d0", "db", "fl")
        .collect().map(r => r.getInt(0) -> r).toMap
      assert(got.size == strs.size)
      strs.zipWithIndex.foreach { case (so, id) =>
        val r = got(id)
        so match {
          case None =>
            (1 to 14).foreach(i => assert(r.isNullAt(i),
              s"NULL row $id col $i must stay NULL"))
          case Some(s) =>
            val d = MySqlCoerce.prefixDouble(s)
            def ctx(c: String, got: Any, want: Any) =
              s"row $id '$s' -> $c: got=$got want=$want (d=$d)"
            assert(r.getByte(1).toLong == signedClamp(d, -128, 127),
              ctx("t", r.getByte(1), signedClamp(d, -128, 127)))
            assert(r.getShort(2).toLong == signedClamp(d, -32768, 32767),
              ctx("s", r.getShort(2), signedClamp(d, -32768, 32767)))
            // signed MEDIUMINT: its own ±2²³ range, not the widened INT's
            assert(r.getInt(3).toLong == signedClamp(d, -8388608, 8388607),
              ctx("m", r.getInt(3), signedClamp(d, -8388608, 8388607)))
            assert(r.getInt(4).toLong ==
              signedClamp(d, Int.MinValue, Int.MaxValue),
              ctx("i", r.getInt(4), signedClamp(d, Int.MinValue, Int.MaxValue)))
            assert(r.getLong(5) == longModel(d),
              ctx("b", r.getLong(5), longModel(d)))
            assert(r.getShort(6).toLong == unsignedClamp(d, 255L),
              ctx("tu", r.getShort(6), unsignedClamp(d, 255L)))
            assert(r.getInt(7).toLong == unsignedClamp(d, 65535L),
              ctx("su", r.getInt(7), unsignedClamp(d, 65535L)))
            assert(r.getLong(8) == unsignedClamp(d, 16777215L),
              ctx("mu", r.getLong(8), unsignedClamp(d, 16777215L)))
            assert(r.getLong(9) == unsignedClamp(d, 4294967295L),
              ctx("iu", r.getLong(9), unsignedClamp(d, 4294967295L)))
            assert(BigDecimal(r.getDecimal(10)) == u64Model(d),
              ctx("bu", r.getDecimal(10), u64Model(d)))
            assert(BigDecimal(r.getDecimal(11)) == signedDecModel(d, 8, 2),
              ctx("dc", r.getDecimal(11), signedDecModel(d, 8, 2)))
            assert(BigDecimal(r.getDecimal(12)) == signedDecModel(d, 20, 0),
              ctx("d0", r.getDecimal(12), signedDecModel(d, 20, 0)))
            assert(r.getDouble(13) == d, ctx("db", r.getDouble(13), d))
            assert(r.getFloat(14) == d.toFloat,
              ctx("fl", r.getFloat(14), d.toFloat))
        }
      }
    } finally {
      gs.execute("SET sql_mode = 'STRICT_TRANS_TABLES'")
      gs.execute("DROP TABLE IF EXISTS cop")
    }
  }

  // ---- numeric sources ----------------------------------------------------

  /** The clampNumeric branch (review finding this round): MySQL's
    * non-strict out-of-range clamp applies to NUMERIC values too, so
    * `VALUES (-5)` and `VALUES ('-5')` must store the same 0 in a
    * BIGINT UNSIGNED column. Long sources must survive EXACTLY at u64
    * scale (no double round-trip); double sources follow the same
    * rounding kernel as the string path.
    */
  test("non-strict INSERT clamps unquoted numeric sources at the " +
    "declared range, preserving in-range values exactly") {
    val gs = new GraftSession(spark)
    gs.execute("CREATE DATABASE IF NOT EXISTS coprop")
    gs.execute("USE coprop")
    gs.execute("DROP TABLE IF EXISTS copn")
    gs.execute("""CREATE TABLE copn (id INT PRIMARY KEY,
      m MEDIUMINT, mu MEDIUMINT UNSIGNED, iu INT UNSIGNED,
      bu BIGINT UNSIGNED, i INT, b BIGINT)""")
    gs.execute("SET sql_mode = ''")
    try {
      // batch A: LONG-typed literals (one per row; same value every col)
      val longs = samples(Gen.frequency(
        (3, Gen.chooseNum(Long.MinValue, Long.MaxValue)),
        (2, Gen.chooseNum(-20000000L, 20000000L)),
        (1, Gen.oneOf(0L, 255L, 256L, 8388607L, 8388608L, -8388609L,
          16777216L, 4294967295L, 4294967296L, Long.MaxValue,
          Long.MinValue))), 120).distinct
      gs.execute("INSERT INTO copn VALUES " + longs.zipWithIndex.map {
        case (v, i) => s"($i, $v, $v, $v, $v, $v, $v)" }.mkString(","))
      // batch B: DOUBLE-typed literals (the D suffix pins the type so
      // VALUES cannot silently unify the column to DECIMAL)
      val doubles = samples(Gen.frequency(
        (3, Gen.chooseNum(-1e19, 1e19)),
        (2, Gen.chooseNum(-50000.0, 50000.0)),
        (1, Gen.oneOf(0.5, -0.5, 2.5, -2.5, 1e300, -1e300,
          4294967295.5, 1.8446744073709552e19, 16777215.5))), 120)
        .distinct.filter(d => !d.isNaN && !d.isInfinite)
      val base = 100000
      gs.execute("INSERT INTO copn VALUES " + doubles.zipWithIndex.map {
        case (v, i) =>
          s"(${base + i}, ${v}D, ${v}D, ${v}D, ${v}D, ${v}D, ${v}D)" }.mkString(","))
      val got = spark.table("coprop.copn")
        .select("id", "m", "mu", "iu", "bu", "i", "b")
        .collect().map(r => r.getInt(0) -> r).toMap
      longs.zipWithIndex.foreach { case (v, i) =>
        val r = got(i)
        def ctx(c: String, g: Any, w: Any) = s"long $v -> $c: got=$g want=$w"
        // long→double cast then the shared rounding kernel (exact for
        // every in-range value of these ceilings)
        val d = v.toDouble
        assert(r.getInt(1).toLong == signedClamp(d, -8388608, 8388607),
          ctx("m", r.getInt(1), signedClamp(d, -8388608, 8388607)))
        assert(r.getLong(2) == unsignedClamp(d, 16777215L),
          ctx("mu", r.getLong(2), unsignedClamp(d, 16777215L)))
        assert(r.getLong(3) == unsignedClamp(d, 4294967295L),
          ctx("iu", r.getLong(3), unsignedClamp(d, 4294967295L)))
        // u64 decimal target: EXACT long in, exact decimal out (a long
        // can never exceed 2⁶⁴-1, only the 0 floor can fire)
        val wantBu = if (v < 0) BigDecimal(0) else BigDecimal(v)
        assert(BigDecimal(r.getDecimal(4)) == wantBu,
          ctx("bu", r.getDecimal(4), wantBu))
        // PLAIN signed targets (clamped since the r14 own-diff review):
        // the integral-source long-space path is exact — b is identity
        assert(r.getInt(5).toLong ==
          math.min(math.max(v, Int.MinValue.toLong), Int.MaxValue.toLong),
          ctx("i", r.getInt(5), v))
        assert(r.getLong(6) == v, ctx("b", r.getLong(6), v))
      }
      doubles.zipWithIndex.foreach { case (v, i) =>
        val r = got(base + i)
        def ctx(c: String, g: Any, w: Any) = s"double $v -> $c: got=$g want=$w"
        assert(r.getInt(1).toLong == signedClamp(v, -8388608, 8388607),
          ctx("m", r.getInt(1), signedClamp(v, -8388608, 8388607)))
        assert(r.getLong(2) == unsignedClamp(v, 16777215L),
          ctx("mu", r.getLong(2), unsignedClamp(v, 16777215L)))
        assert(r.getLong(3) == unsignedClamp(v, 4294967295L),
          ctx("iu", r.getLong(3), unsignedClamp(v, 4294967295L)))
        // u64 decimal target: try_cast rounding (HALF_UP at scale 0),
        // ceiling at u64, floor at 0
        val wantBu =
          if (v < 0) BigDecimal(0)
          else castDec(v, 20, 0).map(_.min(U64)).getOrElse(U64)
        assert(BigDecimal(r.getDecimal(4)) == wantBu,
          ctx("bu", r.getDecimal(4), wantBu))
        assert(r.getInt(5).toLong ==
          signedClamp(v, Int.MinValue, Int.MaxValue),
          ctx("i", r.getInt(5), signedClamp(v, Int.MinValue, Int.MaxValue)))
        assert(r.getLong(6) == longModel(v), ctx("b", r.getLong(6), longModel(v)))
      }
    } finally {
      gs.execute("SET sql_mode = 'STRICT_TRANS_TABLES'")
      gs.execute("DROP TABLE IF EXISTS copn")
    }
  }

  // ---- strict mode (r15 verdict item 3) ------------------------------------

  /** The strict-mode 1264 twin of the clamps above, property-tested the
    * same way: strictRangeCheck ships example-tested only (one boundary
    * spec in SqlFrontendSpec), while its non-strict clamp twin has the
    * full differential treatment — this drives every declared-range
    * column (UNSIGNED ladders, signed MEDIUMINT, the DECIMAL(20,0)
    * BIGINT UNSIGNED widening) through all four DML entry points with
    * boundary and seeded-random values, split pass/raise by an
    * independent model of the reference's strict `types/convert.go`.
    */
  test("STRICT-mode 1264 property: declared boundaries pass, ±1 and " +
    "beyond raise, NULL passes, strings split by their coerced value") {
    val gs = new GraftSession(spark)
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    gs.execute("CREATE DATABASE IF NOT EXISTS coprop")
    gs.execute("USE coprop")
    gs.execute("DROP TABLE IF EXISTS scop")
    gs.execute("""CREATE TABLE scop (id INT PRIMARY KEY,
      m MEDIUMINT, tu TINYINT UNSIGNED, su SMALLINT UNSIGNED,
      mu MEDIUMINT UNSIGNED, iu INT UNSIGNED, bu BIGINT UNSIGNED)""")
    // the premise the whole test rests on: strict IS the session default
    assert(gs.query("SELECT @@sql_mode AS m").head.toUpperCase
      .contains("STRICT"))
    case class Col(name: String, mn: BigDecimal, mx: BigDecimal)
    val cols = Seq(
      Col("m", BigDecimal(-8388608), BigDecimal(8388607)),
      Col("tu", BigDecimal(0), BigDecimal(255)),
      Col("su", BigDecimal(0), BigDecimal(65535)),
      Col("mu", BigDecimal(0), BigDecimal(16777215)),
      Col("iu", BigDecimal(0), BigDecimal(4294967295L)),
      Col("bu", BigDecimal(0), BigDecimal("18446744073709551615")))
    // the four DML entry points all route through the same buildIncoming
    // fill — cycled, so every case class exercises each of them
    val entries: Seq[(String, Int, String) => String] = Seq(
      (c, id, v) => s"INSERT INTO scop (id, $c) VALUES ($id, $v)",
      (c, id, v) => s"INSERT INTO scop (id, $c) SELECT $id, $v",
      (c, id, v) => s"REPLACE INTO scop (id, $c) VALUES ($id, $v)",
      (c, id, v) => s"INSERT INTO scop SET id = $id, $c = $v")
    var id = 0
    var entry = 0
    def next(c: String, v: String): String = {
      id += 1; entry += 1
      entries(entry % entries.size)(c, id, v)
    }
    def expectPass(c: Col, lit: String, want: Option[BigDecimal]): Unit = {
      gs.execute(next(c.name, lit))
      val got = spark.table("coprop.scop")
        .where(s"id = $id").select(c.name).collect()(0)
      want match {
        case None => assert(got.isNullAt(0), s"${c.name} $lit: want NULL")
        case Some(w) => assert(BigDecimal(got.get(0).toString) == w,
          s"${c.name} $lit: got ${got.get(0)} want $w")
      }
    }
    def expectRaise(c: Col, lit: String): Unit = {
      val stmt = next(c.name, lit)
      val e = intercept[Exception](gs.execute(stmt))
      assert(chain(e).contains("Out of range"), s"$stmt -> ${chain(e)}")
    }
    try {
      cols.foreach { c =>
        // exact boundaries pass (the check must never false-fire)...
        expectPass(c, c.mn.toString, Some(c.mn))
        expectPass(c, c.mx.toString, Some(c.mx))
        // ...NULL passes (the raise_error branch guards isNotNull)...
        expectPass(c, "NULL", None)
        // ...±1 raises 1264 (all values stay inside the WIDENED storage
        // type's range, so the declared check is the only decider)
        expectRaise(c, (c.mn - 1).toString)
        expectRaise(c, (c.mx + 1).toString)
        // string sources: strict casts FIRST, so a clean numeral splits
        // by its coerced value — max passes, min-1 raises
        expectPass(c, s"'${c.mx}'", Some(c.mx))
        expectRaise(c, s"'${c.mn - 1}'")
      }
      // seeded random values folded into each branch EXPLICITLY: the
      // pass draw into [mn, mx], the raise draw into (mx, mx+span] —
      // the previous mn + |r| % (span*2) fold could never produce an
      // out-of-range value for the widest column (|r| <= 2⁶³-1 < bu's
      // 1.8e19 span), so its raise branch silently went unexercised
      // (ADVICE r16); the forced split exercises both on every column
      val raw = samples(Gen.chooseNum(Long.MinValue, Long.MaxValue), 12)
      cols.zipWithIndex.foreach { case (c, i) =>
        val span = c.mx - c.mn + 1
        val Seq(rPass, rRaise) = raw.slice(i * 2, i * 2 + 2)
        val vPass = c.mn + BigDecimal(rPass).abs % span
        expectPass(c, vPass.toString, Some(vPass))
        val vRaise = c.mx + 1 + BigDecimal(rRaise).abs % span
        expectRaise(c, vRaise.toString)
      }
      // FRACTIONAL numeric sources round half away from zero BEFORE
      // the range check (reference convert.go ConvertFloatToInt rounds
      // first; caught live in r17 by the sql_dml_lifecycle cents gate:
      // Spark's plain cast truncated 878620.9999… to 878620 where
      // MySQL stores 878621). The D suffix pins a DOUBLE source, the
      // CAST pins a positive-scale DECIMAL source.
      val m = cols.head // MEDIUMINT, the gate's own shape
      expectPass(m, "12.5D", Some(BigDecimal(13)))
      expectPass(m, "-12.5D", Some(BigDecimal(-13)))
      expectPass(m, "12.49D", Some(BigDecimal(12)))
      expectPass(m, "CAST(12.5 AS DECIMAL(4,1))", Some(BigDecimal(13)))
      // rounding interacts with the boundary: mx + 0.4 rounds DOWN to
      // mx (pass), mx + 0.5 rounds UP past it (raise 1264)
      expectPass(m, s"${m.mx}.4D", Some(m.mx))
      expectRaise(m, s"${m.mx}.5D")
      expectPass(m, s"${m.mn}.4D", Some(m.mn))
      expectRaise(m, s"${m.mn}.6D")
    } finally gs.execute("DROP TABLE IF EXISTS scop")
  }
}
