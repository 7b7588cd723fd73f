package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate (sketch) aggregates — the constant-memory cardinality /
  * quantile path for 100 TB scans. Not oracle-comparable (DuckDB's
  * sketches differ), so accuracy is asserted against exact answers.
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("approx_count_distinct (HLL++) within 5% of exact cardinality") {
    val df = graft.Tables.lineitem(spark, Sf)
    val exact = df.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = df.select(approx_count_distinct(col("l_orderkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val df = graft.Tables.orders(spark, Sf)
    val exact = df.select(expr("percentile(o_totalprice, 0.5)")).head().getDouble(0)
    val approx = df.select(expr("approx_percentile(o_totalprice, 0.5, 1000)"))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact <= 0.05, s"approx=$approx exact=$exact")
  }

  test("HLL sketches merge across groups (two-level aggregation)") {
    val df = graft.Tables.lineitem(spark, Sf)
    // partial sketches per returnflag, then union-merged cardinality
    val merged = df.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("d"))
      .agg(sum(col("d"))).head().getLong(0)
    val exact = df.select(countDistinct(col("l_orderkey"))).head().getLong(0)
    // flags overlap on orderkeys, so the naive sum over-counts: sanity only
    assert(merged >= exact)
  }
}
