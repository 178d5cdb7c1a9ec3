package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout analog of the reference's secondary indexes
  * (SURVEY §1.4): bucketed + sorted parquet tables.
  *
  * The reference's IndexReader/IndexScan (`executor/distsql.go:166`,
  * cop-side `store/mockstore/mocktikv/executor.go:191`) buy two things:
  * key-clustered access (range scans touch one index range) and
  * pre-sorted order (merge join without re-sort). Spark's equivalents:
  *   - `bucketBy(n, key)` co-locates equal keys in one bucket file →
  *     equi-joins and aggregations on the key need NO shuffle exchange,
  *     the moral equivalent of the coprocessor reading an index range
  *     locally;
  *   - `sortBy(key)` within buckets → merge joins skip the sort;
  *   - bucket pruning on key equality predicates → "SelectedBucketsCount
  *     1 out of N" in the scan, the IndexLookUp point-get analog.
  *
  * At 100 TB this is THE difference between an O(data) shuffle per join
  * and none: bucket the fact tables on their join key at ingest, and
  * every downstream join/agg on that key is exchange-free.
  */
object Indexing extends QueryModule {

  val db = "graft_buck"

  /** table name → (applicationId, source dir) it was last built from. */
  private val built =
    scala.collection.mutable.Map.empty[String, (String, String)]

  /** Bucketed + sorted copy of a driver table, keyed like a secondary
    * index. Built ONCE per session per source dir (like a real index:
    * built at ingest, amortized across every query that probes it) — a
    * bench or verify run that probes the join repeatedly pays the ingest
    * cost once, so the measured time is the probe, not the build.
    *
    * The physical name embeds a SOURCE-DIR hash: a name keyed only by
    * (table, key) aliased across fixture dirs, so switching dirs within
    * one session (the spec suites do) overwrote the table IN PLACE and
    * a lazily-held frame built against the previous dir either read the
    * new dir's rows silently or died on missing files mid-scan. One
    * table per (dir, table, key) keeps every handed-out frame valid for
    * the session's lifetime — index-like, where rebuilding-in-place is
    * not.
    */
  def bucketedCopy(s: SparkSession, d: String, table: String, key: String,
      buckets: Int = 8): String = synchronized {
    // first 8 chars of a canonical UUID are pure hex (the first dash
    // sits at index 8), so the key is exactly 32 bits of fixture-path
    // hash — no dash-stripping needed
    val dirKey = java.util.UUID
      .nameUUIDFromBytes(d.getBytes("UTF-8")).toString.take(8)
    val name = s"$db.${table}_by_${key}_$dirKey"
    val cur = (s.sparkContext.applicationId, d)
    if (!built.get(name).contains(cur) || !s.catalog.tableExists(name)) {
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      // a stale location from a previous session's catalog would make the
      // (mode=overwrite) save fail with LOCATION_ALREADY_EXISTS
      graft.GraftSession.dropStaleLocation(s, name)
      Tables.load(s, d, table).write.mode("overwrite")
        .bucketBy(buckets, key).sortBy(key).saveAsTable(name)
      built(name) = cur
    }
    name
  }

  /** Exchange-free equi-join over two tables bucketed on the join key. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val li = bucketedCopy(s, d, "lineitem", "l_orderkey")
    val ord = bucketedCopy(s, d, "orders", "o_orderkey")
    s.table(li)
      .join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
      .where(col("o_totalprice") > 200000)
      .select(col("l_orderkey"), col("l_partkey"),
        round(col("o_totalprice"), 2).as("price"))
  }

  override val queries: Seq[Q] = Seq(
    Q("scan_bucketed_join",
      bucketedJoin,
      Some("""SELECT l_orderkey, l_partkey, round(o_totalprice, 2) AS price
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_totalprice > 200000"""))
  )
}
