package graft

import graft.operators.Meta

/** DDL / SHOW / DESCRIBE / EXPLAIN surface (SURVEY §2.11) — DDL passes
  * through spark.sql against a temp warehouse.
  */
class MetaSpec extends SparkSuite {

  test("CREATE/INSERT/SELECT/DROP lifecycle on a managed table") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graftdb")
    spark.sql("DROP TABLE IF EXISTS graftdb.t1")
    spark.sql("CREATE TABLE graftdb.t1 (id BIGINT, name STRING) USING parquet")
    spark.sql("INSERT INTO graftdb.t1 VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM graftdb.t1").collect()(0).getLong(0) == 2)
    spark.sql("ALTER TABLE graftdb.t1 ADD COLUMNS (extra DOUBLE)")
    assert(spark.table("graftdb.t1").schema.fieldNames.contains("extra"))
    spark.sql("DROP TABLE graftdb.t1")
    assert(!spark.catalog.tableExists("graftdb.t1"))
  }

  test("showTables lists all registered driver tables") {
    Meta.registerAll(spark, sf)
    val names = Meta.showTables(spark).collect().map(_.getString(0))
    assert(names.sorted.toSeq == Tables.names.sorted)
  }

  test("describe renders name/type pairs") {
    val d = Meta.describe(Tables.load(spark, sf, "region")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(d.contains(("r_regionkey", "int")))
    assert(d.contains(("r_name", "string")))
  }

  test("explain output is a formatted physical plan") {
    val plan = Meta.explainFormatted(q("scan_pruned"))
    assert(plan.contains("Physical Plan"))
    assert(plan.contains("Scan parquet"))
  }
}
