package graft.operators

import graft.{Q, QueryModule, Tables}
import graft.functions.ExactNum._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-resistant joins. AQE's skew-join splitting (on engine-wide)
  * handles most hot keys at runtime, but a key hot enough to dominate a
  * whole executor — the power-law user_id / hot-document shape every
  * 100 TB corpus has — needs explicit salting: spread the hot key's rows
  * across R shuffle partitions by joining on (key, salt) with the
  * replicated side duplicated R times. The result set is provably
  * identical to the plain join (each probe row meets exactly one replica
  * of each matching build row), so the operator is fully oracle-able.
  *
  * The reference has no analog — its hash join builds one in-memory
  * table per query (`executor/join.go:31`), so skew only costs probe-time
  * imbalance across its goroutine pool; in a shuffled distributed join,
  * skew costs a straggler executor, which is why this exists here.
  */
object Skew extends QueryModule {

  /** Inner equi-join of `probe` (large, possibly skewed on `key`) with
    * `build` (replicated R ways). The probe side gets a uniform
    * per-partition-round-robin salt — deterministic in distribution (each
    * partition's rows cycle 0..R-1, so every salt sees ~1/R of every hot
    * key) while the join RESULT is salt-assignment-independent.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    // salts = 0 would make the probe salt pmod(id, 0) = NULL and the
    // build replication sequence(0, -1) — every probe row silently
    // dropped instead of an error
    require(salts > 0, s"saltedJoin needs salts >= 1, got $salts")
    // case-INsensitive, like Spark resolution (the GraftSession
    // .freshName invariant): a user column named __SALT would be
    // case-insensitively REPLACED by withColumn and then dropped
    require(!(probe.columns ++ build.columns)
        .exists(_.equalsIgnoreCase("__salt")),
      "saltedJoin reserves the __salt column name")
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltProbe(probe, salts).join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** The probe side with the operator's actual `__salt` assignment —
    * exposed so tests observe the real salting expression (not a
    * re-derivation that would mask a regression here).
    */
  private[graft] def saltProbe(probe: DataFrame, salts: Int): DataFrame =
    probe.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))

  override val queries: Seq[Q] = Seq(

    // Salted fact-dim join + aggregate: lineitem salted 8 ways against a
    // replicated supplier projection, per-nation revenue. The oracle is
    // the PLAIN join — identical results is the operator's contract.
    Q("join_skew_salted",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_extendedprice"))
        val sup = Tables.load(s, d, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
        saltedJoin(li, sup, "l_suppkey", 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
            exactSum(col("l_extendedprice")).as("revenue"))
          .orderBy(col("s_nationkey"))
      },
      Some(s"""SELECT s_nationkey, count(*) AS n_items,
                      ${oracleSum("l_extendedprice")} AS revenue
               FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
               GROUP BY s_nationkey ORDER BY s_nationkey""")))
}
