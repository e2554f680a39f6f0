package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, MapType, StringType}

/** Build a map<string,string> from alternating key/value children,
  * SKIPPING entries whose value is null — in one allocation.
  *
  * The parse stage's open-schema `fields` column would otherwise be
  * `map_concat(when(v1.isNotNull, map(k1, v1)).otherwise(map()), ...)`:
  * ~N intermediate single-entry maps plus a concat per row, which at
  * 10^12 turns is the dominant GC pressure of the whole pipeline. Spark has
  * no null-skipping map constructor (CreateMap throws on null values under
  * ANSI; map_filter is a CodegenFallback lambda), hence this expression.
  */
case class CompactMap(children: Seq[Expression]) extends Expression {

  require(children.size % 2 == 0, "compact_map requires key/value pairs")

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "compact_map requires all-string key/value arguments")

  override def eval(input: InternalRow): Any = {
    val n = children.size / 2
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val v = children(2 * i + 1).eval(input)
      if (v != null) {
        keys(cnt) = children(2 * i).eval(input)
        vals(cnt) = v
        cnt += 1
      }
      i += 1
    }
    CompactMap.build(keys, vals, cnt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.size / 2
    val keysArr = ctx.freshName("cmKeys")
    val valsArr = ctx.freshName("cmVals")
    val cnt = ctx.freshName("cmCnt")
    val pairSnippets = (0 until n).map { i =>
      val k = children(2 * i).genCode(ctx)
      val v = children(2 * i + 1).genCode(ctx)
      s"""
         |${v.code}
         |if (!${v.isNull}) {
         |  ${k.code}
         |  $keysArr[$cnt] = ${k.value};
         |  $valsArr[$cnt] = ${v.value};
         |  $cnt++;
         |}
       """.stripMargin
    }
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val body = pairSnippets.mkString("\n")
    ev.copy(
      code = code"""
        |Object[] $keysArr = new Object[$n];
        |Object[] $valsArr = new Object[$n];
        |int $cnt = 0;
        |$body
        |org.apache.spark.sql.catalyst.util.MapData ${ev.value} =
        |  graft.functions.CompactMap.build($keysArr, $valsArr, $cnt);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CompactMap = copy(children = newChildren)

  override def prettyName: String = "compact_map"
}

object CompactMap {
  def build(keys: Array[Any], vals: Array[Any], cnt: Int): MapData = {
    val k = new Array[Any](cnt)
    val v = new Array[Any](cnt)
    System.arraycopy(keys, 0, k, 0, cnt)
    System.arraycopy(vals, 0, v, 0, cnt)
    new ArrayBasedMapData(new GenericArrayData(k), new GenericArrayData(v))
  }
}
