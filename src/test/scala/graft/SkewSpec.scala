package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join contract: identical results to the plain join under
  * extreme skew, and the salt actually spreads the hot key.
  */
class SkewSpec extends SparkSuite {

  // worst-case skew: 90% of lineitem probes hit ONE supplier key
  private def skewed = {
    val li = Tables.load(spark, sf, "lineitem")
    li.select(
      when(col("l_linenumber") > 1, lit(7L)).otherwise(col("l_suppkey"))
        .as("l_suppkey"),
      col("l_extendedprice"))
  }
  private def sup = Tables.load(spark, sf, "supplier")
    .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))

  test("salted join equals the plain join under a hot key") {
    val saltedRes = Skew.saltedJoin(skewed, sup, "l_suppkey", 8)
    val plainRes = skewed.join(sup, Seq("l_suppkey"))
    assert(saltedRes.count() == plainRes.count())
    assert(saltedRes.exceptAll(plainRes).count() == 0)
    assert(plainRes.exceptAll(saltedRes).count() == 0)
  }

  test("the hot key's rows spread across every salt value") {
    // observe the OPERATOR's salt assignment (saltProbe is what saltedJoin
    // joins on), so a constant-salt regression in the operator fails here
    val perSalt = Skew.saltProbe(skewed.filter(col("l_suppkey") === 7L), 8)
      .groupBy("__salt").count().collect()
    assert(perSalt.length == 8, s"expected 8 salts, got ${perSalt.length}")
    val counts = perSalt.map(_.getLong(1))
    // round-robin within partitions → near-uniform spread
    assert(counts.max < counts.sum / 2,
      s"salting failed to spread the hot key: ${counts.mkString(",")}")
  }

  test("the physical join is keyed on (key, salt)") {
    // formatted mode renders "Left keys [2]: [l_suppkey, __salt]" — assert
    // the salt reaches the JOIN KEYS, not merely a projection somewhere
    val plan = graft.operators.Meta.explainFormatted(
      Skew.saltedJoin(skewed, sup, "l_suppkey", 8))
    assert(plan.linesIterator.exists(l =>
        l.contains("keys") && l.contains("__salt")),
      s"salt missing from the join keys:\n$plan")
  }
}
