package graft

import graft.functions.MySqlCoerce
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Differential tests for the MySQL-vs-Spark semantic deltas SURVEY §7.3
  * calls "the real work": integer division, division by zero, overflow
  * boundaries, and implicit string→number coercion. Property-style over
  * ScalaCheck generators with a fixed seed (driven through one DataFrame
  * per property — distributed eval vs a JVM-side reference).
  */
class MySqlSemanticsSpec extends SparkSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  test("MySQL division: double result, NULL on zero divisor (try_divide)") {
    import spark.implicits._
    val divisors = Gen.oneOf(Gen.const(0L), Gen.chooseNum(-1000000L, 1000000L))
    val pairs = samples(Gen.zip(Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4), divisors), 400)
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"), MySqlCoerce.div(col("a"), col("b")).as("q"))
      .collect()
    assert(rows.head.schema("q").dataType ==
      org.apache.spark.sql.types.DoubleType)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      if (b == 0L) assert(r.isNullAt(2), s"$a / 0 must be NULL")
      else assert(r.getDouble(2) == a.toDouble / b.toDouble)
    }
  }

  test("in-range Long arithmetic is exact; try_* opts out of ANSI errors") {
    import spark.implicits._
    val safe = Gen.chooseNum(-1000000000L, 1000000000L)
    val pairs = samples(Gen.zip(safe, safe), 400)
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"), (col("a") + col("b")).as("s"),
        (col("a") - col("b")).as("d"), (col("a") * col("b")).as("p"))
      .collect()
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == a + b)
      assert(r.getLong(3) == a - b)
      assert(r.getLong(4) == a * b)
    }
    // overflow with the try_ opt-out: NULL, never a wrapped value
    val t = spark.sql(s"SELECT try_add(${Long.MaxValue}L, 1L) AS v").collect()
    assert(t(0).isNullAt(0))
  }

  test("ANSI mode raises on overflow — the reference's error-on-overflow") {
    // The engine dialect errors on BIGINT overflow; Spark's equivalent
    // strictness is ANSI mode, which Engine pins ON (Engine.scala).
    // MySQL's div-by-zero→NULL — which ANSI would also turn into an
    // error — is routed through try_divide/nullif guards instead.
    val old = spark.conf.getOption("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      val e = intercept[Exception] {
        spark.sql(s"SELECT ${Long.MaxValue}L + 1L").collect()
      }
      assert(e.getMessage.toLowerCase.contains("overflow"), e.getMessage)
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
      case None => spark.conf.unset("spark.sql.ansi.enabled")
    }
  }

  test("string→number coercion parses the longest numeric prefix") {
    import spark.implicits._
    val numericish: Gen[String] = for {
      ws <- Gen.oneOf("", " ", "\t ")
      sign <- Gen.oneOf("", "+", "-")
      intPart <- Gen.oneOf(Gen.const(""), Gen.chooseNum(0, 99999).map(_.toString))
      frac <- Gen.oneOf(Gen.const(""), Gen.chooseNum(0, 999).map("." + _))
      exp <- Gen.oneOf("", "e2", "E-3", "e+1", "e", "eX")
      junk <- Gen.oneOf("", "abc", "x1", " 5", "-", ".")
    } yield s"$ws$sign$intPart$frac$exp$junk"
    val messy = Gen.oneOf(numericish,
      Gen.oneOf("", "abc", "--1", "++2", "break", "12a34", ".e3", "1.2.3"))
    val strs = samples(messy, 500)
    val rows = strs.toDF("s")
      .select(col("s"), MySqlCoerce.toDouble(col("s")).as("v"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      val expected = MySqlCoerce.prefixDouble(s)
      assert(r.getDouble(1) == expected,
        s"coercion of '$s': spark=${r.getDouble(1)} expected=$expected")
    }
    // the headline MySQL examples
    val headline = Seq("123abc" -> 123.0, "x" -> 0.0, " 12.5x" -> 12.5,
      "" -> 0.0, "-3e2z" -> -300.0, ".5ok" -> 0.5)
    headline.foreach { case (s, want) =>
      assert(MySqlCoerce.prefixDouble(s) == want)
    }
    val sparkVals = headline.map(_._1).toDF("s")
      .select(MySqlCoerce.toDouble(col("s"))).collect().map(_.getDouble(0))
    assert(sparkVals.toSeq == headline.map(_._2))
  }

  test("integer-context coercion rounds away from zero, saturates at bigint") {
    import spark.implicits._
    // MySQL clamps to LLONG_MAX/LLONG_MIN with a warning
    // (types/convert.go); an ANSI cast would instead abort the whole
    // query with CAST_OVERFLOW on one huge prefix. Fractional prefixes
    // round HALF AWAY FROM ZERO per the reference's floatStrToIntStr →
    // roundIntStr ('42.9' → 43, '-1.5' → -2) — truncation was a silent
    // divergence from that documented rule.
    val vals = Seq("1e300", "-1e300", "9223372036854775807x", "42.9",
      "42.4", "1.5", "-1.5", "-7").toDF("s")
      .select(MySqlCoerce.toLong(col("s"))).collect().map(_.getLong(0))
    assert(vals.toSeq == Seq(Long.MaxValue, Long.MinValue,
      Long.MaxValue, 43L, 42L, 2L, -2L, -7L), vals.mkString(","))
  }

  test("replaceInto helper: scratch columns uniquified, ties last-row-wins") {
    import spark.implicits._
    // a user column literally named __pri must survive intact, and
    // duplicate-key incoming rows must resolve to the LATER row
    // deterministically (the replaceSurvivors contract) — the old fixed
    // "__pri" literal clobbered the user column and left ties arbitrary
    val base = Seq((1L, "old", 7L)).toDF("k", "v", "__pri")
    val inc = Seq((1L, "a", 8L), (1L, "b", 9L), (2L, "c", 10L))
      .toDF("k", "v", "__pri")
    val out = graft.operators.Dml.replaceInto(base, inc, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "b", 9L), (2L, "c", 10L)), out.mkString(","))
  }

  test("replaceInto: NULL unique-key values never collide (replace.go)") {
    import spark.implicits._
    // MySQL REPLACE displacement is a unique-key collision and NULLs
    // never conflict on a unique key: two base NULL-key rows plus one
    // incoming NULL-key row must ALL survive — the unguarded window
    // grouped them into one partition and kept only the newest.
    val base = Seq((Some(1L), "a"), (None, "n1"), (None, "n2"))
      .toDF("k", "v")
    val inc = Seq((Some(1L), "A"), (None, "n3")).toDF("k", "v")
    val out = graft.operators.Dml.replaceInto(base, inc, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1))).toSet
    assert(out == Set((1L, "A"), (-1L, "n1"), (-1L, "n2"), (-1L, "n3")),
      out.mkString(","))
  }

  test("cents is scaled-binary exact on full-precision doubles") {
    import graft.functions.ExactNum
    import spark.implicits._
    // The round(double, 2) divergence class (r12 deferred item (a)):
    // Spark HALF_UPs the SHORTEST-DECIMAL repr while DuckDB rounds the
    // scaled BINARY value — 0.285 is really 0.28499999999999998…, so
    // the engines answer 0.29 vs 0.28 and the hash gate goes red the
    // moment a fixture ships full-precision doubles. ExactNum.cents
    // scales to integer first, where every half-point is dyadic and
    // the engines agree. Expectation computed here by DuckDB's own
    // rule (round-half-away-from-zero on the double product), NOT by
    // Spark — so this is a genuine cross-engine pin, plus hand-checked
    // anchors for the headline divergent values.
    val vals = Seq(0.285, 2.675, 1.005, -0.285, -2.675, 12.5 / 100,
      -12.5 / 100, 0.49999999999999994, 7.0, 0.0, 1e9 + 0.005)
    def duckRound(x: Double): Long = {
      val p = x * 100 // same IEEE product both engines compute
      (math.signum(p) * math.floor(math.abs(p) + 0.5)).toLong
    }
    val out = vals.toDF("v").select(ExactNum.cents(col("v")))
      .collect().map(_.getLong(0))
    assert(out.toSeq == vals.map(duckRound),
      out.zip(vals).mkString(","))
    // hand-checked anchors: the binary value of 0.285*100 is below
    // 28.5, so BOTH engines must say 28 — while Spark's round(x, 2)
    // says 0.29 (the divergence this pin exists to keep closed)
    assert(out(0) == 28L && out(3) == -28L)
    val sparkRound2 = Seq(0.285).toDF("v")
      .select(round(col("v"), 2)).collect()(0).getDouble(0)
    assert(sparkRound2 == 0.29,
      "Spark's shortest-repr rounding changed — revisit the cents rationale")
    // NULL flows through (the join_asof fixture carries NULL values)
    val n = Seq[Option[Double]](None, Some(1.25)).toDF("v")
      .select(ExactNum.cents(col("v"))).collect()
    assert(n(0).isNullAt(0) && n(1).getLong(0) == 125L)
  }

  test("division TRY rewrite reaches every nesting shape (property)") {
    // r14 verdict item 5: the CTE/subquery escapes were found by hand —
    // this generator composes division sites through randomized
    // CTE / scalar-subquery / EXISTS / LATERAL / set-op / aggregate
    // nestings so the NEXT innerChildren-shaped escape fails a spec
    // instead of aborting a fixture query. Two assertions per case:
    // NULL-not-abort (the nested query executes), and agreement with
    // the FLAT rewrite path on the same operands (nesting must never
    // change the value). The flat `/` path is additionally pinned to
    // the DataFrame twin (MySqlCoerce.div) so both entry paths agree.
    import graft.plans.MySqlDivision
    def run(sql: String): Any =
      try MySqlDivision.sql(spark, sql).collect()(0).get(0)
      catch { case e: Exception =>
        fail(s"aborted (rewrite escape?): $sql\n  -> ${e.getMessage}") }
    // value-preserving wrappers over a one-row, one-column (v) query
    val wrappers: Seq[(String, String => String)] = Seq(
      "cte" -> (q => s"WITH t AS ($q) SELECT v FROM t"),
      "cte2" -> (q =>
        s"WITH t AS ($q), u AS (SELECT v FROM t) SELECT v FROM u"),
      "scalar" -> (q => s"SELECT (SELECT v FROM ($q) AS s) AS v"),
      "union" -> (q =>
        s"SELECT DISTINCT v FROM (($q) UNION ALL ($q)) AS un"),
      "lateral" -> (q =>
        s"SELECT l.v AS v FROM (SELECT 1 AS one) AS o, LATERAL ($q) AS l"),
      "exists" -> (q => s"""SELECT CASE WHEN EXISTS (
          SELECT 1 FROM ($q) AS z WHERE z.v IS NOT NULL)
        THEN (SELECT v FROM ($q) AS s2) ELSE NULL END AS v"""),
      "agg" -> (q => s"SELECT max(v) AS v FROM ($q) AS ag"))
    val ops = Seq("/", "DIV", "%")
    val operand = Gen.frequency(
      (3, Gen.chooseNum(-1000000L, 1000000L)),
      (1, Gen.oneOf(Long.MaxValue / 2, Long.MinValue / 2, 0L)))
    val divisor = Gen.frequency((2, Gen.const(0L)),
      (3, Gen.chooseNum(-9L, 9L)))
    // literal core (constant-folding path) and VALUES core (column path)
    def cores(op: String, a: Long, b: Long): Seq[String] = Seq(
      s"SELECT CAST($a AS BIGINT) $op CAST($b AS BIGINT) AS v",
      s"SELECT a $op b AS v FROM (VALUES (CAST($a AS BIGINT), " +
        s"CAST($b AS BIGINT))) AS vt(a, b)")
    val stacks: Seq[Seq[Int]] =
      // every wrapper alone, then 30 random depth-2..3 stacks
      wrappers.indices.map(Seq(_)) ++
        samples(Gen.chooseNum(2, 3).flatMap(n =>
          Gen.listOfN(n, Gen.chooseNum(0, wrappers.size - 1))), 30)
    val cases = samples(Gen.zip(operand, divisor), stacks.size * ops.size)
    var i = 0
    for (stack <- stacks; op <- ops) {
      val (a, b) = cases(i); i += 1
      for (core <- cores(op, a, b)) {
        val flat = run(core)
        if (b == 0L) assert(flat == null, s"$a $op 0 must be NULL: $core")
        val nested = stack.foldLeft(core)((q, w) => wrappers(w)._2(q))
        val got = run(nested)
        assert(got == flat,
          s"nesting ${stack.map(wrappers(_)._1).mkString("+")} changed " +
            s"$a $op $b: flat=$flat nested=$got\n$nested")
      }
      if (op == "/") {
        // flat SQL path == DataFrame path on the same operands
        import spark.implicits._
        val df = Seq((a, b)).toDF("a", "b")
          .select(MySqlCoerce.div(col("a"), col("b"))).collect()(0).get(0)
        assert(df == run(cores(op, a, b).head),
          s"DataFrame vs SQL division disagree on $a / $b")
      }
    }
  }

  test("custom SQL functions reject wrong arity at analysis") {
    graft.functions.StrCmp.register(spark)
    graft.functions.Fingerprint.register(spark)
    // silently dropping extra arguments returned plausible wrong
    // results; now the builder raises with the expected count
    for (sql <- Seq("SELECT strcmp('a')", "SELECT strcmp('a','b','c')",
        "SELECT graft_fingerprint('a','b')")) {
      val e = intercept[Exception](spark.sql(sql).collect())
      assert(e.getMessage != null && e.getMessage.contains("argument"),
        s"$sql -> ${e.getMessage}")
    }
    // and wrong TYPES fail at ANALYSIS, not as a mid-task
    // ClassCastException (checkInputDataTypes — the DotProduct guard,
    // now on strcmp too)
    val t = intercept[Exception](spark.sql("SELECT strcmp(1, 'x')").collect())
    assert(t.getMessage != null &&
      t.getMessage.toLowerCase.contains("string"), t.getMessage)
  }
}
