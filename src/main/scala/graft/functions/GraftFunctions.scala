package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Session-scoped registration of graft's custom Catalyst expressions plus
  * Column-level wrappers. Registration is idempotent; every query builder
  * calls [[ensureRegistered]] before using the wrappers so the functions
  * are also reachable from `spark.sql(...)`.
  */
object GraftFunctions {

  private def builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "logfmt_parse" -> ((exprs: Seq[Expression]) => LogfmtParse(exprs.head)),
    // fortinet flavor: drop valueless keys, exclude date/time (stitched
    // separately into the ts field; fortinet.rs:78-105)
    "logfmt_parse_fortinet" -> ((exprs: Seq[Expression]) =>
      LogfmtParse(exprs.head, dropNullValues = true, excludeKeys = Seq("date", "time")))
  )

  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  /** Parse a logfmt string column into map<string,string> (null values for
    * bare keys). Requires [[ensureRegistered]] on the session.
    */
  def logfmt_parse(c: Column): Column = call_function("logfmt_parse", c)

  /** Fortinet flavor: valueless keys dropped, date/time excluded. */
  def logfmt_parse_fortinet(c: Column): Column =
    call_function("logfmt_parse_fortinet", c)
}
