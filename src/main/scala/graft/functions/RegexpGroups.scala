package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Match a regex ONCE per row and return ALL capture groups as
  * array<string> (null if the row doesn't match; null elements for
  * unmatched optional groups).
  *
  * Why it exists: Spark's `regexp_extract(text, re, i)` re-executes the
  * regex for every group index, so a 7-group parse recipe pays 7 matches
  * per row (plus one more for the `rlike` detection). At 10^12 turns the
  * parse stage is the hot loop; this expression makes detection
  * (`isNotNull`) and full extraction cost exactly one regex execution.
  * Deterministic, so whole-stage codegen's common-subexpression
  * elimination shares one call between the `format` tag and the field
  * extraction in the same projection.
  */
case class RegexpGroups(child: Expression, pattern: String) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"regexp_groups requires a string argument, got ${child.dataType.sql}")

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  def matchGroups(input: UTF8String): GenericArrayData = {
    val m = compiled.matcher(input.toString)
    if (!m.find(0)) null
    else {
      val n = m.groupCount()
      val out = new Array[Any](n)
      var i = 1
      while (i <= n) {
        val g = m.group(i)
        out(i - 1) = if (g == null) null else UTF8String.fromString(g)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(input: Any): Any =
    matchGroups(input.asInstanceOf[UTF8String])

  // nullable even when child isn't: no-match -> null
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("regexpGroups", this, classOf[RegexpGroups].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.matchGroups($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpGroups =
    copy(child = newChild)

  override def prettyName: String = "regexp_groups"
}
