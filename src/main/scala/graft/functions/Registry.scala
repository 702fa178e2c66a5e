package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Once-per-session temp-function registration.
  *
  * `createOrReplaceTempFunction` logs a
  * "... replaced a previously registered function" WARN on every
  * replace, and the gate code registers on every Column-handle call —
  * a 530-query bench run used to spam hundreds of those WARNs into
  * the driver's bounded stdout-tail capture, crowding out real
  * diagnostics. Checking `functionExists` first keeps the idempotent
  * contract (the builders are pure, so the first registration is as
  * good as the last) with zero log noise.
  */
object Registry {

  def once(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
