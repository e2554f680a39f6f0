package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Serialize an open-schema event map to the reference's NDJSON line format
  * (log-ship/src/plugins/file.rs:859-871 — `event.to_string()` + '\n'):
  * serde_json with the default BTreeMap event map, i.e. COMPACT output with
  * keys in ascending byte order, string values JSON-escaped exactly like
  * serde_json (`"` `\` and C0 controls only; \b \t \n \f \r shorthands,
  * \u00xx lowercase otherwise). Keys listed in `numericKeys` whose value is
  * a canonical integer are emitted as bare JSON numbers — the reference
  * inserts `t` (and numeric proc_id) as i64, everything else as strings
  * (fortinet.rs:90,105; syslog.rs:55-64).
  *
  * Codegen'd (no CodegenFallback): output serialization rides the same
  * WholeStageCodegen stage as the sink projection.
  */
case class EventJson(child: Expression, numericKeys: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(StringType, StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "event_json requires a map<string,string> argument")
  }

  @transient private lazy val numericU8: Array[UTF8String] =
    numericKeys.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    EventJson.serialize(input.asInstanceOf[MapData], numericU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ejNumeric", numericU8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.EventJson.serialize($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): EventJson =
    copy(child = newChild)

  override def prettyName: String = "event_json"
}

object EventJson {

  /** serde_json-compatible string escape into `sb`. */
  private def appendEscaped(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case x if x < 0x20 =>
          sb.append("\\u")
          sb.append(f"${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
    sb.append('"')
  }

  /** Canonical i64 check: what serde_json would have produced for an i64
    * (optional '-', digits, no leading zeros unless the value is 0).
    */
  private def isCanonicalInt(v: UTF8String): Boolean = {
    val s = v.toString
    val body = if (s.startsWith("-")) s.substring(1) else s
    body.nonEmpty && body.length <= 19 && body.forall(_.isDigit) &&
      (body.length == 1 || body.charAt(0) != '0')
  }

  def serialize(map: MapData, numericKeys: Array[UTF8String]): UTF8String = {
    val n = map.numElements()
    val ka = map.keyArray(); val va = map.valueArray()
    // ascending byte order = Rust String Ord = serde_json BTreeMap order
    // (UTF8String.compareTo is unsigned byte-wise)
    val keys = Array.tabulate(n)(ka.getUTF8String)
    val order = Array.tabulate(n)(identity)
      .sortWith((a, b) => keys(a).compareTo(keys(b)) < 0)
    val sb = new java.lang.StringBuilder(64 + n * 24)
    sb.append('{')
    var first = true
    var oi = 0
    while (oi < order.length) {
      val i = order(oi)
      if (!first) sb.append(',')
      first = false
      appendEscaped(sb, keys(i).toString)
      sb.append(':')
      if (va.isNullAt(i)) sb.append("null")
      else {
        val v = va.getUTF8String(i)
        if (numericKeys.exists(_.equals(keys(i))) && isCanonicalInt(v))
          sb.append(v.toString)
        else appendEscaped(sb, v.toString)
      }
      oi += 1
    }
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }
}
