package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom TopKPerKey operator: marker → logical rewrite → two-phase
  * physical plan, equal to the window-function formulation.
  */
class TopKOperatorSpec extends AnyFunSuite {
  import TestSpark._

  test("custom operator plans as Partial/Final TopKExec with one exchange") {
    val df = ops.RelationalOps.qTopkCustom(spark, Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK"), plan.take(3000))
    assert(plan.contains("PartialTopK"), plan.take(3000))
  }

  test("custom operator result == window row_number formulation") {
    val custom = ops.RelationalOps.qTopkCustom(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val window = ops.RelationalOps.qTopkPerGroup(spark, Sf)
      .select(col("o_custkey"), col("o_orderkey"), col("price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(custom.toSet == window)
    assert(custom.size == window.size, "no duplicate rows from the two phases")
  }

  test("ties broken deterministically by the tiebreak column") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 100L), (1L, 10.0, 101L), (1L, 10.0, 102L), (1L, 5.0, 103L))
      .toDF("k", "v", "id")
    val got = df.filter(call_function("graft_topk", col("k"), col("v"), col("id"), lit(2)))
      .select("id").as[Long].collect().toSet
    assert(got == Set(100L, 101L), s"got $got") // equal v -> lowest ids win
  }

  test("rows with null order values are skipped, not NPE'd (documented contract)") {
    import spark.implicits._
    val df = Seq((1L, Some(10.0), 100L), (1L, None, 101L), (1L, Some(5.0), 102L))
      .toDF("k", "v", "id")
    val got = df.filter(call_function("graft_topk", col("k"), col("v"), col("id"), lit(2)))
      .select("id").as[Long].collect().toSet
    assert(got == Set(100L, 102L), s"got $got") // the null-v row never ranks
  }
}
