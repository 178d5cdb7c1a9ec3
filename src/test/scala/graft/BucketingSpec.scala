package graft

import graft.operators.Indexing
import org.apache.spark.sql.functions._

/** The bucketed/sorted layout must actually eliminate shuffles and prune
  * buckets — otherwise it is not an index analog, just a copy.
  */
class BucketingSpec extends SparkSuite {

  private def withConfs(kvs: (String, String)*)(body: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("join on the bucket key runs without a shuffle exchange") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = Indexing.bucketedJoin(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), "bucketed join still shuffles:\n" + plan)
    }
  }

  test("the same join on unbucketed tables does shuffle (control)") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
      df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("Exchange"))
    }
  }

  test("key-equality predicate prunes to a single bucket (point-get analog)") {
    // autoBucketedScan disables bucketed reading for scan-only queries;
    // force it so the pruning decision is visible
    withConfs("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val li = Indexing.bucketedCopy(spark, sf, "lineitem", "l_orderkey")
      val df = spark.table(li).where(col("l_orderkey") === 1L)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of"),
        "no bucket pruning in:\n" + plan)
    }
  }

  test("bucketed join result equals unbucketed join result") {
    val bucketed = Indexing.bucketedJoin(spark, sf)
      .orderBy("l_orderkey", "l_partkey").collect()
    val plain = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .where(col("o_totalprice") > 200000)
      .select(col("l_orderkey"), col("l_partkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("l_orderkey", "l_partkey").collect()
    assert(bucketed.toSeq == plain.toSeq)
  }
}
