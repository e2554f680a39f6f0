package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}

/** Merge map `right` into map `left`, right winning on key collision — the
  * reference's serde_json insert-overwrite (log-ship/src/plugins/syslog.rs:70-94),
  * executed 2-3 times per syslog row (SD merge + JSON-body merge).
  *
  * Replaces the `map_concat(map_filter(lower, !map_contains_key(upper, k)),
  * upper)` composition: `map_filter` is a higher-order function and therefore
  * CodegenFallback, so that subtree ran INTERPRETED inside the engine's
  * hottest projection, re-evaluating `upper` per lower key (O(k²) with two
  * intermediate map allocations). This expression is whole-stage-codegen'd
  * and builds the result in one allocation.
  *
  * Key order matches the composition it replaces (surviving left keys in
  * order, then all right keys), so oracle hashes are unchanged.
  */
case class MergeMaps(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = {
    val vNull = Seq(left, right).exists {
      _.dataType match {
        case MapType(_, _, n) => n
        case _ => true
      }
    }
    MapType(StringType, StringType, valueContainsNull = vNull)
  }

  // null only when an input is null (BinaryExpression's default null-safe
  // eval/codegen handles that), so the inherited children-based nullable
  // is correct.

  override def checkInputDataTypes(): TypeCheckResult = {
    // NullType keys/values admit the untyped empty `map()` literal (SQL
    // map() is map<void,void>); a valid map can't hold null KEYS so a
    // NullType-keyed side is necessarily empty and never dereferenced
    def strOrVoid(dt: DataType): Boolean =
      dt == StringType || dt == org.apache.spark.sql.types.NullType
    val ok = Seq(left, right).forall {
      _.dataType match {
        case MapType(k, v, _) => strOrVoid(k) && strOrVoid(v)
        case _ => false
      }
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "merge_maps requires two map<string,string> arguments")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    MergeMaps.merge(l.asInstanceOf[MapData], r.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.functions.MergeMaps.merge($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MergeMaps =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "merge_maps"
}

object MergeMaps {

  /** One-pass merge; small-map (≤ ~16 key) nested scan beats building a
    * hash set — syslog events carry 6-12 keys.
    */
  def merge(lower: MapData, upper: MapData): MapData = {
    val ln = lower.numElements()
    val un = upper.numElements()
    if (ln == 0 && un == 0) return EmptyMap
    val lk = lower.keyArray(); val lv = lower.valueArray()
    val uk = upper.keyArray(); val uv = upper.valueArray()
    val keys = new Array[Any](ln + un)
    val vals = new Array[Any](ln + un)
    var cnt = 0
    var i = 0
    while (i < ln) {
      val k = lk.getUTF8String(i)
      var found = false
      var j = 0
      while (j < un && !found) {
        if (k.equals(uk.getUTF8String(j))) found = true
        j += 1
      }
      if (!found) {
        keys(cnt) = k
        vals(cnt) = if (lv.isNullAt(i)) null else lv.getUTF8String(i)
        cnt += 1
      }
      i += 1
    }
    var j = 0
    while (j < un) {
      keys(cnt) = uk.getUTF8String(j)
      vals(cnt) = if (uv.isNullAt(j)) null else uv.getUTF8String(j)
      cnt += 1
      j += 1
    }
    if (cnt == keys.length) {
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
    } else {
      val k2 = new Array[Any](cnt); val v2 = new Array[Any](cnt)
      System.arraycopy(keys, 0, k2, 0, cnt)
      System.arraycopy(vals, 0, v2, 0, cnt)
      new ArrayBasedMapData(new GenericArrayData(k2), new GenericArrayData(v2))
    }
  }

  private val EmptyMap: MapData =
    new ArrayBasedMapData(new GenericArrayData(Array.empty[Any]),
      new GenericArrayData(Array.empty[Any]))
}
