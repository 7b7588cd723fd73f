package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `ARRAY<FLOAT>` columns,
  * accumulated in double with a sequential left-to-right loop — exactly the
  * semantics of the declarative
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)`
  * fold it replaces (see [[graft.plans.FuseDotProduct]]), but without
  * materializing the intermediate zipped array and with whole-stage
  * codegen via [[doGenCode]].
  *
  * The reference's only custom compute surface is hand-written
  * Mapper/Reducer classes (SURVEY.md §2.6); this is the Spark-native
  * equivalent extension point — an `Expression` participating in codegen
  * rather than an opaque UDF.
  *
  * Null semantics match the fold: null array → null; any null element →
  * null result; unequal lengths → null (zip_with pads the shorter array
  * with nulls, so the fold's accumulator goes null — the fused expression
  * must agree or [[graft.plans.FuseDotProduct]] would change results for
  * ragged embeddings).
  */
case class CosineDot(left: Expression, right: Expression) extends BinaryExpression {
  private def isNumArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  // Each side is independently ARRAY<FLOAT> or ARRAY<DOUBLE> (Lloyd
  // assignment dots a float embedding against a double centroid; the
  // pair-scoring stage dots two double arrays) — the element load is the
  // only per-type code, the double accumulation is shared.
  private lazy val leftIsFloat: Boolean =
    left.dataType == ArrayType(FloatType, containsNull = false) ||
      left.dataType == ArrayType(FloatType, containsNull = true)
  private lazy val rightIsFloat: Boolean =
    right.dataType == ArrayType(FloatType, containsNull = false) ||
      right.dataType == ArrayType(FloatType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => isNumArray(e.dataType))
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_dot requires ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getA = if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $getA * $getB;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-API handle for [[CosineDot]] — resolves through the function
    * registry populated by [[graft.plans.GraftExtensions]].
    */
  def cosineDot(a: Column, b: Column): Column = call_function("cosine_dot", a, b)
}
