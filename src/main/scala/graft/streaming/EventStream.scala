package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface — the streaming capability the reference
  * lacks entirely (SURVEY.md §2.6). Same event-time semantics as the batch
  * queries in [[graft.ops.EventOps]] (which are the DuckDB-oracle-checkable
  * forms); these run as incremental streams over a parquet file source and
  * are exercised by StreamingSpec with Trigger.AvailableNow.
  *
  * At scale this is the ingest path: file-source micro-batches, watermarked
  * windowed state in the state store (RocksDB on a real cluster), output
  * append to a sink table.
  */
object EventStream {
  /** The `events` table as a file-source stream (nanos ts → micros, as in
    * Tables.events).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // File-source basePath must be a directory; the fixture table is a
    // single file, so stream the directory with a name filter.
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Watermarked tumbling-window aggregation (streaming twin of
    * EventOps.qEventsTumbling).
    */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("ws"), col("event_type"),
              col("n"), col("sum_value"))

  final case class UserStat(user_id: Long, n: Long, total: Double)

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * count/total. OutputMode.Update; state persists across micro-batches.
    */
  def userTotals(spark: SparkSession, dir: String): Dataset[UserStat] = {
    import spark.implicits._
    eventsStream(spark, dir)
      .select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { r => n += 1; total += r._2 }
          val next = UserStat(uid, n, total)
          state.update(next)
          next
      }
  }

  /** Convenience runner for tests: drain the stream with AvailableNow into
    * an in-memory table and return the result.
    */
  def runToMemory(spark: SparkSession, streamDf: DataFrame, name: String,
                  outputMode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = streamDf.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }
}
