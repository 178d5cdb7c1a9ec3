package graft

/** Every declared query runs at sf0.001 and produces a sane result; the
  * exact-value gate is the driver's DuckDB compare (replicated locally by
  * tools/compare.py) — here we pin row-level invariants that survive any
  * scale factor.
  */
class QueryInventorySpec extends SparkSuite {

  test("inventory is complete and oracle keys are a subset of queries") {
    assert(SparkEntry.queries.nonEmpty)
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("no oracle uses scaled round() — the engine-divergent form") {
    // r15: round(x, N>=3) on a computed double is the cross-engine
    // divergence class ExactNum.round4 closed (Spark rounds the
    // shortest decimal repr, DuckDB the scaled binary). The dyadic
    // (round((x) * 10000) / 10000.0) form — ExactNum.oracleRound4 —
    // replaced every site; this scan keeps the old form from sneaking
    // back into ANY oracle. round(x, 2) on 2-dp-provenance money
    // fixtures stays allowed (the 3rd decimal of such values is never
    // near a half — a different, provably-safe class).
    // balanced-paren scan, not a regex: the historical offender shape
    // `round(c / (sa.n + sb.n - c), 4)` nests parens inside the call
    def roundScale(sql0: String,
        scaleRe: scala.util.matching.Regex): Boolean = {
      val sql = sql0.toLowerCase
      Iterator.iterate(sql.indexOf("round("))(i =>
        sql.indexOf("round(", i + 1)).takeWhile(_ >= 0).exists { i =>
        var depth = 0
        var j = i + 5 // at the opening paren
        while (j < sql.length && (depth != 0 || j == i + 5)) {
          if (sql(j) == '(') depth += 1
          else if (sql(j) == ')') depth -= 1
          j += 1
        }
        scaleRe.findFirstIn(sql.substring(i + 6, j - 1)).isDefined
      }
    }
    // top-level arg list of THIS call ends with ", N" for N >= 3 —
    // multi-digit scales included (ADVICE r15: the single-digit class
    // [3-9] let a hypothetical round(x, 10) slip past; any scale >= 10
    // is the same engine-divergent class)
    def scaledRound(sql: String): Boolean =
      roundScale(sql, ",\\s*([3-9]|[1-9][0-9]+)\\s*$".r)
    // scanner self-test: the shapes it exists to catch and to pass
    assert(scaledRound("select round(x, 4) from t"))
    assert(scaledRound("select round(c / (sa.n + sb.n - c), 10) from t"))
    assert(scaledRound("select round(x,12) from t"))
    assert(!scaledRound("select round(x, 2) from t"))
    assert(!scaledRound("select (round((x) * 10000) / 10000.0) from t"))
    val bad = SparkEntry.oracleSql.collect {
      case (name, sql) if scaledRound(sql) => name
    }
    assert(bad.isEmpty,
      s"oracles using engine-divergent scaled round(): $bad — use " +
        "ExactNum.oracleRound4 / the dyadic form instead")
    // round(x, 2) allowlist (ADVICE r15): scale-2 is sound ONLY by
    // 2-dp provenance — the money fixture columns are generated at two
    // decimals, so their doubles are never near a 3rd-decimal half.
    // That argument does NOT transfer to arbitrary computed doubles, so
    // instead of a blanket scale-2 exemption, every site is named: a
    // NEW round(x, 2) must be consciously added here with the same
    // provenance argument (or use ExactNum.cents / round4).
    def round2(sql: String): Boolean = roundScale(sql, ",\\s*2\\s*$".r)
    // audited r16: every site rounds a raw money fixture column
    // (c_acctbal / o_totalprice / l_extendedprice, generated at 2 dp),
    // an exact-DECIMAL(18,2) sum (sql_roundtrip/sql_compact — the same
    // double reaches both engines), or dyadic literals (the ALTER
    // lifecycle's 1.5/2.5 score)
    val money2Allowed: Set[String] = Set(
      "dml_insert_select", "dml_replace", "join_full_outer", "join_inner",
      "join_semi_anti", "scan_bucketed_join", "sort_multi", "sql_compact",
      "sql_dml_lifecycle", "sql_roundtrip", "sql_session_vars",
      "sql_subquery", "topn")
    val newScale2 = SparkEntry.oracleSql.collect {
      case (name, sql) if round2(sql) && !money2Allowed(name) => name
    }
    assert(newScale2.isEmpty,
      s"NEW round(x, 2) oracle sites: ${newScale2.toSeq.sorted} — prove " +
        "2-dp provenance and add to the allowlist, or use ExactNum")
    // and the allowlist cannot rot: every entry still uses scale-2
    val stale = money2Allowed.filter(n =>
      !SparkEntry.oracleSql.get(n).exists(round2))
    assert(stale.isEmpty, s"allowlist entries without round(x, 2): $stale")
    // and the canonical helper text itself is pinned, so the Spark-side
    // ExactNum.round4 and every hand-inlined oracle copy stay one
    // greppable form
    assert(graft.functions.ExactNum.oracleRound4("x") ==
      "(round((x) * 10000) / 10000.0)")
    // the oracles that cannot interpolate the helper (plain """ strings
    // whose regex escapes would be mangled by an s-interpolator) carry
    // hand-inlined copies — pin them to the canonical anchor: every
    // `10000` in every oracle must sit inside the exact
    // `* 10000) / 10000.0)` sequence, so a `/ 1000.0` typo or a
    // mis-scaled copy fails here instead of forking a hash at the gate
    // (a paren slip that PRESERVES the anchor still changes values and
    // is caught by the gate + the degenerate half-ending witnesses)
    val standalone10k = "(?<![0-9])10000(?![0-9])".r
    // the three canonical 1e4 anchors (ExactNum.oracleRound4's full
    // text, oracleUnits4's per-row cast, and the oracleSum/oracleAvg
    // descale) plus the one non-scaling use (a % 10000 modulus in the
    // pii fixture ids) are the ONLY sanctioned ways 10000 appears
    val masked = Seq("* 10000) / 10000.0)", "* 10000) AS BIGINT)",
      "/ 10000.0)", "% 10000")
    val drifted = SparkEntry.oracleSql.collect {
      case (name, sql) if standalone10k.findFirstIn(
        masked.foldLeft(sql)(_.replace(_, ""))).isDefined => name
    }
    assert(drifted.isEmpty,
      s"oracles with a non-canonical 1e4 scaling: $drifted — use the " +
        "ExactNum.oracleRound4 text verbatim")
  }

  test("every query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("agg over empty input emits exactly one row with count 0") {
    val row = q("agg_empty_input").collect()(0)
    assert(row.getLong(row.fieldIndex("cnt")) == 0)
    assert(row.isNullAt(row.fieldIndex("sum_qty")))
    assert(row.isNullAt(row.fieldIndex("max_ok")))
  }

  test("topn returns exactly 10 rows, descending") {
    val prices = q("topn").collect().map(_.getDouble(1))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("dml_replace keeps one row per key and replaces multiples of 10") {
    val rows = q("dml_replace").collect()
    val keys = rows.map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
    assert(rows.filter(_.getLong(0) % 10 == 0)
      .forall(_.getString(4) == "REPLACED"))
    assert(rows.filter(_.getLong(0) % 10 != 0)
      .forall(_.getString(4) != "REPLACED"))
  }
}
