package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, IntegerType, StructType}

/** Custom table-generating expression (the UDTF class of SURVEY.md §2.6 —
  * the reference's Mapper emitting multiple records per input is exactly
  * this surface): `graft_sliding(arr, size, step)` emits one row per
  * sliding window of `arr`, each row carrying the window as an array.
  * Planned by Spark's own GenerateExec exactly like `explode`, so it
  * distributes and pipelines identically; the expression only defines the
  * per-row fan-out. Windows shorter than `size` (the tail) are not
  * emitted — the same contract as every fixed-shingle operator here.
  *
  * `size`/`step` must be foldable positive ints (validated at analysis,
  * not at runtime, so a bad call fails the query plan, not the job).
  */
case class SlidingWindows(child: Expression, size: Expression, step: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, size, step)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!child.dataType.isInstanceOf[ArrayType])
      return TypeCheckResult.TypeCheckFailure(
        s"graft_sliding needs an array input, got ${child.dataType}")
    if (size.dataType != IntegerType || step.dataType != IntegerType ||
        !size.foldable || !step.foldable)
      return TypeCheckResult.TypeCheckFailure(
        "graft_sliding size/step must be integer literals")
    val sz = size.eval().asInstanceOf[Int]
    val st = step.eval().asInstanceOf[Int]
    if (sz <= 0 || st <= 0)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_sliding size/step must be positive (got $sz, $st)")
    TypeCheckResult.TypeCheckSuccess
  }

  override def elementSchema: StructType =
    new StructType().add("win", child.dataType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val et = child.dataType.asInstanceOf[ArrayType].elementType
    val n = arr.numElements()
    val sz = size.eval().asInstanceOf[Int]
    val st = step.eval().asInstanceOf[Int]
    val objs = arr.toObjectArray(et)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i + sz <= n) {
      out += InternalRow(new GenericArrayData(
        java.util.Arrays.copyOfRange(objs, i, i + sz)))
      i += st
    }
    out
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), size = newChildren(1), step = newChildren(2))
}
