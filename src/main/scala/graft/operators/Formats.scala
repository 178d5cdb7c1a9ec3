package graft.operators

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Source/sink format breadth beyond parquet: a CSV + JSON round-trip
  * under an EXPLICIT schema. The engine's storage layer is parquet
  * (bucketed managed tables, Indexing.scala); interchange with external
  * pipelines is CSV/JSON, and the property that matters is that a
  * write→read cycle preserves row multiplicity and values exactly —
  * which the oracle checks by aggregating the round-tripped data against
  * the ORIGINAL parquet.
  *
  * Scale posture: both formats scan with per-file/split parallelism like
  * any FileSourceScan. Schema inference is deliberately OFF (explicit
  * schema): inference is a second full pass over the data — a 100 TB
  * anti-pattern — and silently widens types between runs. CSV carries a
  * header only for human debuggability; readers never depend on it.
  */
object Formats extends QueryModule {

  override val queries: Seq[Q] = Seq(

    Q("source_formats",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .filter(col("l_orderkey") <= 1000)
          .select(col("l_orderkey"), col("l_partkey"),
            col("l_quantity"), col("l_returnflag"))
        // DETERMINISTIC scratch dir per (fixture, process), not a fresh
        // createTempDirectory: the result frame lazily reads from these
        // files, so they cannot be deleted here, and a unique dir per
        // invocation leaked one full CSV+JSON copy into /tmp on every
        // bench/verify run. Overwrite mode bounds the footprint to one
        // copy per fixture path per JVM. The PID component keeps two
        // CONCURRENT JVMs (an overlapping bench and verify on the same
        // fixture) from overwriting each other's files while the other's
        // result frame is still lazily reading them — a purely
        // fixture-keyed dir was a cross-process race.
        val key = java.util.UUID
          .nameUUIDFromBytes(d.getBytes("UTF-8")).toString.take(8)
        val tmp = new java.io.File(sys.props("java.io.tmpdir"))
        // sweep scratch dirs left by DEAD processes: the PID suffix
        // fixed the cross-JVM overwrite race but on its own would
        // accumulate one CSV+JSON copy per past JVM forever (crashed
        // runs never clean up after themselves; a live one might still
        // be lazily reading its dir, so only dead owners are swept).
        // Legacy suffix-less `graft_fmt_<key>` dirs (the pre-PID naming)
        // parse to no PID and can have no live owner — this code never
        // writes that name again — so they are always swept. PID reuse
        // is detected EXACTLY where the host allows it: the owner JVM
        // (re-)touches its dir on every run, so a live process whose
        // start instant is CLEARLY later than the dir's mtime (beyond
        // the skew margin) cannot be the writer — the PID was recycled
        // and the copy is dead. Only when /proc denies the start
        // instant entirely does a generous 7-day age cutoff apply
        // (ADVICE r14) — the per-run touch below keeps any session
        // active within a week safe from it, vs. the unbounded
        // accumulation the exact check alone allowed on such hosts.
        // liveness stamp of a scratch dir: its own mtime OR the explicit
        // `.graft_live` marker's, whichever is later (ADVICE r15: on
        // filesystems that reject setLastModified — some network/
        // container mounts — the dir mtime never refreshes, and the
        // 7-day cutoff below would sweep a LIVE long-running session's
        // dir out from under its lazy readers; the touch fallback
        // rewrites the marker instead, and a missing marker reads 0)
        def liveStamp(f: java.io.File): Long = math.max(f.lastModified(),
          new java.io.File(f, ".graft_live").lastModified())
        Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
          .filter(_.getName.startsWith("graft_fmt_"))
          .foreach { f =>
            import scala.jdk.OptionConverters._
            val pid = f.getName.split("_p").lastOption.flatMap(_.toLongOption)
            val mine = pid.contains(ProcessHandle.current().pid())
            // start-vs-mtime compares two clock sources (boot-relative
            // /proc start vs filesystem mtime): require the start to be
            // CLEARLY later before declaring the PID recycled, so a few
            // seconds of skew can't sweep a live owner's dir
            val skewMs = 60000L
            val ownerDead = pid.forall(p =>
              ProcessHandle.of(p).toScala match {
                case None => true // no live process with that PID
                case Some(h) => h.info.startInstant.toScala match {
                  case Some(st) => st.toEpochMilli > liveStamp(f) + skewMs
                  case None =>
                    // restricted /proc visibility: ownership unknowable
                    // exactly — fall back to a generous age cutoff so
                    // recycled-PID garbage can't accumulate FOREVER on
                    // such hosts, while any live session's dir (touched
                    // by its own run) stays untouched for days
                    liveStamp(f) <
                      System.currentTimeMillis() - 7L * 24 * 3600 * 1000
                }
              })
            if (!mine && ownerDead)
              graft.GraftSession.deleteRecursively(f.toPath)
          }
        val dir = new java.io.File(tmp,
          s"graft_fmt_${key}_p${ProcessHandle.current().pid()}")
          .getAbsolutePath
        li.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
        li.write.mode("overwrite").json(s"$dir/json")
        // refresh OUR liveness marker: the csv/json subdir writes don't
        // reliably bump the top dir's mtime, and both the recycled-PID
        // check and the restricted-/proc age cutoff read it. When the
        // filesystem rejects setLastModified (ADVICE r15: permissions,
        // some network/container mounts silently return false), rewrite
        // the `.graft_live` marker file instead — its own fresh mtime is
        // what liveStamp() above consults alongside the dir's. The
        // marker write can itself throw on the same class of mount
        // (ADVICE r16: read-only/quota-limited scratch) — a liveness
        // refresh is best-effort bookkeeping and must degrade to the
        // pre-refresh behavior, never fail the query it serves
        if (!new java.io.File(dir).setLastModified(System.currentTimeMillis()))
          try java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, ".graft_live"), Array.empty[Byte])
          catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[graft] liveness refresh of $dir failed: $e")
          }
        val c = s.read.schema(li.schema).option("header", "true").csv(s"$dir/csv")
        val j = s.read.schema(li.schema).json(s"$dir/json")
        c.select(lit("csv").as("fmt"), col("l_returnflag"), col("l_quantity"))
          .unionAll(j.select(lit("json").as("fmt"), col("l_returnflag"),
            col("l_quantity")))
          .groupBy(col("fmt"), col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("long")).as("qty"))
      },
      // the oracle reads the ORIGINAL parquet — equality proves the
      // write->read cycle lost nothing in either format
      Some("""WITH base AS (SELECT l_returnflag,
                     CAST(l_quantity AS BIGINT) AS q
                   FROM lineitem WHERE l_orderkey <= 1000)
              SELECT fmt, l_returnflag, count(*) AS n,
                     CAST(sum(q) AS BIGINT) AS qty
              FROM (SELECT 'csv' AS fmt, * FROM base
                    UNION ALL
                    SELECT 'json' AS fmt, * FROM base)
              GROUP BY fmt, l_returnflag"""))
  )
}
