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

  // Matcher is reused per thread (reset per row): at 10^12 rows the
  // per-row Matcher allocation is measurable GC pressure
  @transient private lazy val localMatcher: ThreadLocal[java.util.regex.Matcher] =
    ThreadLocal.withInitial(() => compiled.matcher(""))

  def matchGroups(input: UTF8String): GenericArrayData = {
    val m = localMatcher.get()
    val ascii = input.numBytes() == input.numChars()
    // ASCII fast path: match directly over the UTF8String bytes (a
    // zero-copy CharSequence view) and slice groups as zero-copy
    // UTF8String substrings — no String materialization per row. Log
    // lines are overwhelmingly ASCII; char index == byte index there.
    m.reset(if (ascii) new RegexpGroups.Utf8AsciiSeq(input) else input.toString)
    if (!m.find(0)) null
    else {
      val n = m.groupCount()
      val out = new Array[Any](n)
      var i = 1
      while (i <= n) {
        val s = m.start(i)
        out(i - 1) =
          if (s < 0) null
          else if (ascii) input.substringSQL(s + 1, m.end(i) - s)
          else UTF8String.fromString(m.group(i))
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

object RegexpGroups {
  /** Zero-copy CharSequence over an all-ASCII UTF8String's bytes. */
  final class Utf8AsciiSeq(s: UTF8String) extends CharSequence {
    override def length(): Int = s.numBytes()
    override def charAt(i: Int): Char = (s.getByte(i) & 0xff).toChar
    override def subSequence(a: Int, b: Int): CharSequence =
      new Utf8AsciiSeq(s.substringSQL(a + 1, b - a))
    override def toString: String = s.toString
  }
}
