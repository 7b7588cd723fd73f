package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming twins must converge to the batch results once the
  * bounded source is drained (Trigger.AvailableNow).
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming tumbling windows == batch qEventsTumbling") {
    val streamed = EventStream.runToMemory(
      spark, EventStream.tumblingCounts(spark, Sf), "t_tumbling")
      .select("ws", "event_type", "n", "sum_value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = ops.EventOps.qEventsTumbling(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch)
  }

  test("mapGroupsWithState user totals == batch groupBy after drain") {
    val streamed = EventStream.runToMemory(
      spark, EventStream.userTotals(spark, Sf).toDF(), "t_user_totals",
      OutputMode.Update())
      .groupBy("user_id").agg(max("n").as("n")) // last update per user
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.Tables.events(spark, Sf)
      .groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }
}
