package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Catalyst expression: parse a logfmt-formatted string into
  * `MapType(String, String)` (null value = key present without `=value`).
  *
  * Built because `str_to_map` cannot handle double-quoted values containing
  * spaces / `=` / delimiters, which the reference's data has everywhere
  * (e.g. `msg="Network.Service: SSL,"` in
  * /root/reference/log-ship/samples/fortinet_log.syslog:1). Semantics match
  * the `logfmt` crate as used by the reference transforms
  * (/root/reference/log-ship/src/plugins/logfmt.rs:75-95 and
  * fortinet.rs:78-92):
  *
  *   - `key=value` bare values end at whitespace; `key=` yields `""`
  *   - `key="quoted value"` may contain spaces/`=`/commas; `\"` and `\\`
  *     escapes are unescaped
  *   - a bare `key` token (no `=`) maps to null (the crate's `val: None`;
  *     logfmt.rs inserts it as JSON null, fortinet.rs drops it)
  *   - duplicate keys: last occurrence wins (serde_json Map insert)
  *
  * Codegen-capable: `doGenCode` emits a call to the static parser so the
  * expression stays inside WholeStageCodegen (no UDF, no interpreter
  * fallback on the hot parse path).
  */
/** @param dropNullValues fortinet mode: drop bare keys with no `=value`
  *   (fortinet.rs:85-88 `if let Some(val) = pair.val`); logfmt mode keeps
  *   them as nulls (logfmt.rs:84 `Value::from(pair.val)`).
  * @param excludeKeys keys consumed by the caller and kept out of the map
  *   (fortinet.rs:80-88 pulls `date`/`time` out for the timestamp stitch).
  */
case class LogfmtParse(
    child: Expression,
    dropNullValues: Boolean = false,
    excludeKeys: Seq[String] = Nil)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"logfmt_parse requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = !dropNullValues)

  @transient private lazy val excludeSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    excludeKeys.foreach(s.add)
    s
  }

  def parseUTF8(input: UTF8String): MapData =
    LogfmtParse.parse(input, dropNullValues, excludeSet)

  override def nullSafeEval(input: Any): Any =
    parseUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("logfmtParse", this, classOf[LogfmtParse].getName)
    defineCodeGen(ctx, ev, c => s"$ref.parseUTF8($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LogfmtParse =
    copy(child = newChild)

  override def prettyName: String = "logfmt_parse"
}

object LogfmtParse {

  private val noExclude = new java.util.HashSet[String]()

  /** Static entry point shared by interpreted eval and generated code. */
  def parseUTF8(input: UTF8String): MapData = parse(input, false, noExclude)

  def parse(
      input: UTF8String,
      dropNullValues: Boolean,
      exclude: java.util.HashSet[String]): MapData = {
    val s = input.toString
    // insertion-ordered, last-wins on duplicate keys
    val keys = mutable.ArrayBuffer.empty[String]
    val vals = mutable.HashMap.empty[String, String] // null value allowed
    val n = s.length
    var i = 0
    while (i < n) {
      // skip inter-token whitespace
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i < n) {
        // key: run of chars that are not whitespace, '=' or '"'
        val keyStart = i
        while (i < n && !Character.isWhitespace(s.charAt(i)) &&
               s.charAt(i) != '=' && s.charAt(i) != '"') i += 1
        val key = s.substring(keyStart, i)
        if (key.isEmpty) {
          // garbage ('=' or '"' with no key): skip one char
          i += 1
        } else if (i < n && s.charAt(i) == '=') {
          i += 1
          var value: String = null
          if (i < n && s.charAt(i) == '"') {
            // quoted value with \" and \\ escapes
            i += 1
            val sb = new java.lang.StringBuilder()
            var closed = false
            while (i < n && !closed) {
              val c = s.charAt(i)
              if (c == '\\' && i + 1 < n &&
                  (s.charAt(i + 1) == '"' || s.charAt(i + 1) == '\\')) {
                sb.append(s.charAt(i + 1)); i += 2
              } else if (c == '"') {
                closed = true; i += 1
              } else {
                sb.append(c); i += 1
              }
            }
            value = sb.toString
          } else {
            // bare value: up to whitespace (possibly empty)
            val vStart = i
            while (i < n && !Character.isWhitespace(s.charAt(i))) i += 1
            value = s.substring(vStart, i)
          }
          if (!exclude.contains(key)) {
            if (!vals.contains(key)) keys += key
            vals(key) = value
          }
        } else {
          // bare key, no '=': value is null (logfmt crate val: None)
          if (!dropNullValues && !exclude.contains(key)) {
            if (!vals.contains(key)) keys += key
            vals(key) = null
          }
        }
      }
    }
    val keyArr = new Array[Any](keys.length)
    val valArr = new Array[Any](keys.length)
    var j = 0
    while (j < keys.length) {
      val k = keys(j)
      keyArr(j) = UTF8String.fromString(k)
      val v = vals(k)
      valArr(j) = if (v == null) null else UTF8String.fromString(v)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keyArr), new GenericArrayData(valArr))
  }
}
