package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions: binary-search bucket assignment against a
  * driver-known sorted boundary list — the region-lookup primitive behind
  * the keyed stores' HBase-region analog (a row key maps to the region
  * whose [start, next-start) range covers it:
  * `HPopulate/src/main/java/org/northeastern/Main.java:54-73` creates the
  * region-ranged table this reproduces on parquet).
  *
  * Semantics: for ascending `boundaries` b₀ < b₁ < … < bₙ₋₁, the result is
  * the greatest i with bᵢ ≤ v, clamped to 0 — i.e. region i covers
  * [bᵢ, bᵢ₊₁) with region 0 extended to −∞ and region n−1 to +∞, so every
  * value is covered and assignment is total.
  *
  * Why an Expression and not a join: assigning a region to each row of a
  * large change set via a broadcast range join is O(regions) comparisons
  * per row (BroadcastNestedLoopJoin — Spark has no interval-join
  * optimization); this is O(log regions), allocation-free, and stays
  * inside whole-stage codegen, so region assignment never leaves the
  * scan's hot loop even with 10⁶ regions at 100 TB.
  */
case class LongBoundaryBucket(child: Expression, boundaries: IndexedSeq[Long])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "boundary_bucket requires at least one boundary")
  @transient private lazy val arr: Array[Long] = boundaries.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"boundary_bucket requires a BIGINT argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "boundary_bucket"

  override def nullSafeEval(v: Any): Any = {
    var i = java.util.Arrays.binarySearch(arr, v.asInstanceOf[Long])
    if (i < 0) i = -i - 2
    if (i < 0) 0 else i
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bounds = ctx.addReferenceObj("bounds", arr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      s"""
         |int $i = java.util.Arrays.binarySearch($bounds, $c);
         |if ($i < 0) $i = -$i - 2;
         |${ev.value} = $i < 0 ? 0 : $i;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** String twin of [[LongBoundaryBucket]]; boundaries compare in
  * UTF8String binary order (identical to Java String order for ASCII
  * keys — the md5-hex row keys the keyed queries use).
  */
case class StringBoundaryBucket(child: Expression, boundaries: IndexedSeq[UTF8String])
    extends UnaryExpression {
  require(boundaries.nonEmpty, "boundary_bucket requires at least one boundary")
  @transient private lazy val arr: Array[UTF8String] = boundaries.toArray

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"boundary_bucket requires a STRING argument, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "boundary_bucket"

  override def nullSafeEval(v: Any): Any = {
    var i = java.util.Arrays.binarySearch(
      arr.asInstanceOf[Array[AnyRef]], v.asInstanceOf[AnyRef])
    if (i < 0) i = -i - 2
    if (i < 0) 0 else i
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bounds = ctx.addReferenceObj("bounds", arr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      s"""
         |int $i = java.util.Arrays.binarySearch((Object[]) $bounds, (Object) $c);
         |if ($i < 0) $i = -$i - 2;
         |${ev.value} = $i < 0 ? 0 : $i;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RangeFunctions {
  /** Column-API handle: bucket index of a BIGINT column against sorted
    * boundaries (greatest i with boundaries(i) ≤ v, clamped to 0).
    */
  def longBoundaryBucket(c: Column, boundaries: IndexedSeq[Long]): Column =
    GraftColumnBridge.column(
      LongBoundaryBucket(GraftColumnBridge.expression(c), boundaries))

  /** Column-API handle for STRING keys. */
  def stringBoundaryBucket(c: Column, boundaries: IndexedSeq[String]): Column =
    GraftColumnBridge.column(StringBoundaryBucket(
      GraftColumnBridge.expression(c),
      boundaries.map(UTF8String.fromString)))

  /** Driver-side twin of the expressions, for literal keys (static region
    * pruning is control flow, not data).
    */
  def indexOf[T](boundaries: IndexedSeq[T], v: T)(implicit ord: Ordering[T]): Int = {
    var lo = 0
    var hi = boundaries.length - 1
    var res = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lteq(boundaries(mid), v)) { res = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    res
  }
}
