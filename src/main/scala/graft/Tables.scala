package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver fixture tables (see FIXTURES.md §2).
  *
  * All queries read parquet relations so Catalyst gets vectorized scans,
  * predicate pushdown into row-group/page skipping, and column pruning for
  * free. At 100 TB the same code holds: the parquet datasource splits by
  * row group across executors; nothing here is driver-side.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader only accepts as a long when `spark.sql.legacy.parquet
    * .nanosAsLong=true` (set in Verify/Bench/tests). Convert back to a
    * microsecond timestamp here so downstream operators see TimestampType.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Defensive: a caller-built session (e.g. the driver's smoke harness)
    // may lack the flag; it is runtime-settable and required to read the
    // TIMESTAMP(NANOS) column at all.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // Integer `div`, NOT `/`: epoch nanos (~1.7e18) exceed double's 2^53
      // integer range, so float division is off by ±1 microsecond.
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  /** Like [[events]] but retains the raw TIMESTAMP(NANOS) value as
    * `ts_nanos: LONG` — a pure alias of the physical column, so range
    * predicates on it reach the parquet scan as PushedFilters (min/max
    * row-group pruning), which `year(ts)` over the derived timestamp can
    * never do. Callers project `ts_nanos` away after filtering.
    */
  def eventsWithRawTs(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts_nanos", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts_nanos", expr("unix_micros(ts) * 1000"))
  }

  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
