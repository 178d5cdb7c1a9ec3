package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query...]")
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // memoryPins: the same per-task allocation-footprint pins the bench
    // session runs with (Engine.memoryPins) — plan-neutral, but the
    // verify session should exercise the identical execution posture
    val spark = Engine.memoryPins(Engine.semanticPins(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional name filter for local iteration — trailing args or the
    // SPARK_GRAFT_ONLY env var; neither = all, as the driver runs it
    // (the driver always invokes with exactly two args).
    val argFilter =
      if (args.length > 2) Some(args.drop(2).mkString(",")) else None
    val names =
      SparkEntry.selectNames(argFilter.orElse(sys.env.get("SPARK_GRAFT_ONLY")))
    val qs = SparkEntry.queries // the map is rebuilt per call — hoist it
    names.foreach { name =>
      // NonFatal ONLY: per-query isolation must not swallow an OOM or
      // linkage error and keep dumping parquet from a JVM in an
      // undefined state — the driver would hash-compare those dumps as
      // if healthy. Fatal errors abort the whole run loudly instead.
      try qs(name)(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any output from a previous dump so a failure is never
        // masked by stale results when outDir is reused
        GraftSession.deleteRecursively(Paths.get(s"$outDir/$name"))
      }
      // free per-query persisted subtrees (same hygiene as Bench)
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    // One escape policy for both driver-parsed artifacts: Bench.jstr
    // (its uXXXX control-char form vs readable two-char escapes is
    // cosmetic; both are valid JSON).
    def q(s: String): String = "\"" + Bench.jstr(s) + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
