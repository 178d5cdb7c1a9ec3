package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named query: the Spark implementation plus (optionally) an equivalent
  * ANSI-SQL oracle that DuckDB can run over the same parquet tables.
  * Queries without an oracle get a weaker rows-only check from the driver
  * (used for ops whose exact output is not SQL-expressible, e.g. LSH).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** A group of related queries (one per SURVEY.md §2 inventory row). */
trait QueryModule {
  def queries: Seq[Q]
}
