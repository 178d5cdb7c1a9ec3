package graft

/** ANALYZE / CBO behavior (SURVEY §4.2): statistics must actually change
  * physical plans, the way the reference's histogram-driven selectivity
  * (`statistics/selectivity.go`, `planner/core/stats.go`) changes access
  * paths and join plans.
  */
class StatsSpec extends SparkSuite {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("column stats flip a selective-filter join from shuffle to broadcast") {
    spark.sql("CREATE DATABASE IF NOT EXISTS statsdb")
    spark.sql("DROP TABLE IF EXISTS statsdb.fact")
    spark.sql("DROP TABLE IF EXISTS statsdb.dim")
    spark.range(20000)
      .selectExpr("id", "id % 100 AS k", "md5(cast(id AS string)) AS pad")
      .write.saveAsTable("statsdb.fact")
    spark.range(20000)
      .selectExpr("id", "md5(cast(id + 7 AS string)) AS pad2")
      .write.saveAsTable("statsdb.dim")

    val sql =
      """SELECT f.id, d.pad2 FROM statsdb.fact f
         JOIN statsdb.dim d ON f.id = d.id WHERE f.k = 1"""

    // Both sides' on-disk size exceeds the threshold, and without CBO the
    // filter does not shrink the estimate -> shuffle join.
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "65536",
      "spark.sql.cbo.enabled" -> "false",
      "spark.sql.cbo.planStats.enabled" -> "false") {
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
    }

    // With per-column stats (NDV of k = 100) CBO estimates ~200 post-
    // filter rows, far below the threshold -> broadcast join.
    Stats.analyze(spark, "statsdb.fact")
    Stats.analyze(spark, "statsdb.dim")
    withConfs( // every CBO conf listed so the shared session is restored
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "65536",
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      "spark.sql.cbo.planStats.enabled" -> "true") {
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan)
    }
  }

  test("ANALYZE records exact row counts in the catalog") {
    assert(Stats.rowCount(spark, "statsdb.fact").contains(BigInt(20000)))
    assert(Stats.rowCount(spark, "statsdb.dim").contains(BigInt(20000)))
  }
}
