package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-function registration shared by the custom Catalyst
  * expressions (strcmp, graft_dot, …).
  */
object Registry {

  // sessions where OUR builder for a name has been installed; weak keys so
  // closed sessions don't pin the map
  private val installed = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap.KeySetView[String, java.lang.Boolean]]())

  /** Register `name` once per session. The first call in a session always
    * installs OUR builder (replacing any foreign same-named registration —
    * skip-if-exists would silently run the foreign definition); later
    * calls no-op, so the "replaced a previously registered function" WARN
    * fires at most once per session and only when a foreign function was
    * actually displaced.
    */
  def registerOnce(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val mine = installed.computeIfAbsent(spark,
      _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    if (mine.add(name))
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
