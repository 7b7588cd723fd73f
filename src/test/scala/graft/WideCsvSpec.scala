package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** S1/S2 fidelity goldens: the reference's wide positional CSV ingest shape
  * (~110 ordinal-addressed columns, float-string flags) must produce the
  * exact flagship report the parquet path produces, and the keyed store
  * must serve point lookups through pushed predicates.
  */
class WideCsvSpec extends AnyFunSuite {
  import TestSpark._

  test("wide positional CSV path reproduces the parquet flagship report") {
    val csvRows = ops.SourceSinkOps.qWideCsvReport(spark, Sf).collect()
    val pqRows = ops.FlightOps.qFlightReport(spark, Sf).collect()
    assert(csvRows.toSeq == pqRows.toSeq)
    assert(csvRows.nonEmpty)
  }

  test("wide CSV scan prunes to the six used ordinals") {
    val target = s"${System.getProperty("java.io.tmpdir")}/graft_widecsv_prune"
    graft.Tables.events(spark, Sf)
      .selectExpr((0 until ops.SourceSinkOps.WideCsvCols)
        .map(i => s"'v$i' AS c$i"): _*)
      .write.mode("overwrite").csv(target)
    val df = ops.SourceSinkOps.widePositionalFlights(spark, target)
    val scan = df.queryExecution.executedPlan.toString
    // ReadSchema must carry only the 6 projected ordinals, not 110 columns
    assert(scan.contains("_c37") && !scan.contains("_c38"), scan.take(3000))
  }

  test("keyed lookup returns exactly the requested keys via a pushed IN filter") {
    val df = ops.SourceSinkOps.qKeyedLookup(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(row_key,"), plan.take(3000))
    val rows = df.collect()
    assert(rows.map(_.getLong(1)).toSeq == Seq(10L, 20L, 30L, 40L, 50L))
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect10 = md.digest("10".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows.head.getString(0) == expect10)
  }
}
