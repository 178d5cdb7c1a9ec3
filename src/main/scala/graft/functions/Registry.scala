package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Session-function registration shared by the custom Catalyst
  * expressions (strcmp, graft_dot, …).
  */
object Registry {

  /** Register `name` once per session — an unguarded
    * createOrReplaceTempFunction WARN-spams "replaced a previously
    * registered function" on every call site.
    */
  def registerOnce(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
