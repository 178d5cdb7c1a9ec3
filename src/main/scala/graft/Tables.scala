package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-provided parquet tables (TESTDATA.md).
  *
  * Plays the role of the reference's schema layer (`model.TableInfo`,
  * tinysql `parser/model/model.go:180`): fixed, explicitly-declared schemas.
  * Here schema comes from parquet footers; Spark's DataSource V2 handles
  * what the reference's TableReader/coprocessor pipeline did (scan ranges,
  * filter pushdown, column pruning — `executor/table_reader.go:32`).
  */
object Tables {
  /** All tables the driver generates, per TESTDATA.md. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at ANY scale factor —
    * region/nation are bounded by geography (≤25 rows) like TPC-H.
    * supplier/part/customer grow with SF: leave those to AQE's
    * size-based broadcast decision instead of forcing a hint.
    */
  val alwaysBroadcast: Set[String] = Set("region", "nation")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to map
    * to its microsecond TimestampType. Read nanos as long and truncate to
    * a µs timestamp — identical to DuckDB's `epoch_us` truncation, so
    * oracle comparisons stay exact.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
