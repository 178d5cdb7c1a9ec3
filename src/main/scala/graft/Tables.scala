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

  /** `events.ts` has shipped as two different physical types across
    * driver rounds: TIMESTAMP(NANOS) (which Spark 4 refuses to map to
    * its microsecond TimestampType — read as nanos-long and truncate,
    * identical to DuckDB's `epoch_us` truncation) and plain
    * timestamp[us] (which loads as TIMESTAMP_NTZ — cast to the
    * session-UTC TimestampType so every downstream window/unix_micros
    * shape and the oracle string form are unchanged). Handle both by
    * inspecting the loaded dtype, not the round. The probe and the
    * normalization are the ONE shared definition for batch and
    * streaming ([[graft.streaming.EventsStream.source]]) — the dtype
    * has already changed twice, and a future change must not be able
    * to split the two paths.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    val tsLong = eventsTsIsLong(spark, dir)
    normalizeEventsTs(load(spark, dir, "events"), tsLong)
  }

  /** True when events.ts ships as TIMESTAMP(NANOS), which the enabled
    * legacy conf reads as a nanos LONG column. Schema-only probe (no
    * data scan), cached per fixture dir — every loadEvents call was
    * paying a redundant footer read. Conf hygiene: the legacy conf must
    * STAY enabled for a nanos fixture (the returned frame reads its
    * files lazily, long after this probe), but for the common
    * non-nanos fixtures it is UNSET again — leaving it on session-wide
    * silently mapped any OTHER nanos timestamp column (a user table's,
    * say) to a bare long instead of failing loudly.
    *
    * The probe result is JVM-global but the conf is PER SESSION, so the
    * conf decision cannot ride the cache: a cache HIT for a nanos dir
    * in a fresh session must still establish the conf, and probing a
    * non-nanos dir must not unset it while THIS session's earlier
    * nanos frames are still lazy (specs DO mix fixture dirs in one
    * session). Every call (re-)asserts the conf for the PASSED
    * session: set when this dir is nanos (idempotent, cheap), unset
    * only when this SESSION has never resolved a nanos dir
    * ([[sessionNanos]]) — consulting the global cache instead would
    * force the conf onto unrelated sessions in the same JVM.
    */
  private[graft] val tsLongCache =
    scala.collection.concurrent.TrieMap.empty[String, Boolean]
  /** Sessions that have RESOLVED a nanos dir, weakly held: the probe
    * RESULT is a file property and caches JVM-globally, but the conf
    * decision is PER SESSION — consulting the global cache forced the
    * legacy conf onto sessions that never touched a nanos fixture,
    * silently mapping THEIR nanos columns to bare longs. Only a session
    * with a live nanos resolution keeps the conf set.
    */
  private[graft] val sessionNanos: java.util.Set[SparkSession] =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))
  def eventsTsIsLong(spark: SparkSession, dir: String): Boolean =
    // One lock around probe + conf decision: the add/set and
    // contains/unset pairs must be atomic against each other — a
    // concurrent non-nanos probe on the same session could otherwise
    // check sessionNanos before a nanos probe's add, then unset the
    // conf after that probe's set, leaving a nanos session without the
    // conf (and the same interleaving could flip the conf mid-footer-
    // read and poison the JVM-global cache). Coarse by design: the
    // probe is schema-only and cached per dir, so contention is nil.
    sessionNanos.synchronized {
      val isLong = tsLongCache.getOrElseUpdate(dir, {
        import org.apache.spark.sql.types._
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // restore on a FAILED probe (missing dir, corrupt footer, no ts
        // column): nothing gets cached and the flow below never runs,
        // so without this the enabled conf leaked session-wide and
        // silently mapped OTHER tables' nanos columns to bare longs.
        // (While a probe is in flight the session necessarily carries
        // the conf for the footer read — the lock serializes probes,
        // but a concurrent NON-probe read on another thread of the same
        // session can observe that window; accepted, the drivers here
        // probe before any events read and sessions are per-driver.)
        try load(spark, dir, "events").schema("ts").dataType == LongType
        catch { case e: Throwable =>
          if (!sessionNanos.contains(spark))
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          throw e
        }
      })
      if (isLong) {
        sessionNanos.add(spark)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      } else if (!sessionNanos.contains(spark))
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      isLong
    }

  /** The shared ts normalization: nanos-long → truncated micros
    * timestamp; timestamp[us] (loaded NTZ) → session-UTC timestamp. */
  def normalizeEventsTs(df: DataFrame, tsLong: Boolean): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    if (tsLong) df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df.withColumn("ts", col("ts").cast(TimestampType))
  }
}
