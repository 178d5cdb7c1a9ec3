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
