package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Morton (Z-order) bit interleave of two
  * non-negative BIGINT keys — the space-filling-curve primitive behind
  * multi-dimensional data skipping (the technique Delta/Iceberg expose as
  * Z-ORDER BY). Sorting a table by `morton_interleave(a, b)` makes file /
  * row-group min-max ranges narrow in BOTH dimensions simultaneously, so
  * predicates on either column prune — where sorting by `a` alone leaves
  * `b` scattered across every row group.
  *
  * Bit j of each input maps to bits 2j (left) and 2j+1 (right) of the
  * output; the low 21 bits of each input participate (42-bit z-code, so
  * the result is always non-negative). Callers bucket/clamp inputs to
  * 21 bits — the layout use case only needs coarse buckets. A plain
  * while-loop in both eval and codegen: no allocation, whole-stage
  * codegen keeps it in the sort's hot loop.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"morton_interleave requires two BIGINT arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "morton_interleave"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var j = 0
    while (j < 21) {
      z |= ((x >> j) & 1L) << (2 * j)
      z |= ((y >> j) & 1L) << (2 * j + 1)
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val j = ctx.freshName("j")
      val z = ctx.freshName("z")
      s"""
         |long $z = 0L;
         |for (int $j = 0; $j < 21; $j++) {
         |  $z |= (($a >> $j) & 1L) << (2 * $j);
         |  $z |= (($b >> $j) & 1L) << (2 * $j + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutFunctions {
  /** Column-API handle for [[MortonInterleave]] — usable without the
    * session-extension function registry.
    */
  def mortonInterleave(a: Column, b: Column): Column =
    GraftColumnBridge.column(MortonInterleave(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
