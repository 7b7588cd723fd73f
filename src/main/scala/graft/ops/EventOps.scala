package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time processing over the `events` table — the streaming-style
  * capability the reference lacks (SURVEY.md §2.6: no streaming, no
  * windows). All four queries run the *batch* forms of Spark's event-time
  * primitives (`window`, `session_window`, as-of ordering), which share
  * semantics with their Structured Streaming counterparts in
  * [[graft.streaming.EventStream]]; batch keeps them DuckDB-oracle-checkable.
  *
  * Timestamps are emitted as `unix_micros` BIGINTs: integer event-time
  * microseconds are exactly representable on both engines, so no
  * tz/precision skew can enter the hash compare.
  *
  * Scale: every query shuffles once on a bounded or high-cardinality key
  * (window bucket, user_id); session windows use Spark's native
  * SessionWindow node (sort within user partition), not a driver-side loop.
  */
object EventOps {
  import graft.Tables._

  /** Tumbling 1-hour event-time windows: count + sum per (window, type). */
  def qEventsTumbling(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("ws"), col("event_type"),
              col("n"), col("sum_value"))
      .orderBy(col("ws"), col("event_type"))

  /** Sliding windows (1 hour long, every 30 minutes): each event lands in
    * exactly two windows.
    */
  def qEventsSliding(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("w.start")).as("ws"), col("n"), col("sum_value"))
      .orderBy(col("ws"))

  /** Session windows per user with a 1-hour inactivity gap. A new session
    * starts when the gap from the previous event is >= the gap duration
    * (Spark session window is [start, last_event + gap)).
    */
  def qEventsSession(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(session_window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start"),
              col("n"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Inter-arrival analysis: per-user event gaps via event-time lag, then
    * per-user mean/max gap seconds — the sessionization precursor stat.
    */
  def qEventsInterarrival(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc)
    events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_s", (unix_micros(col("ts")) - col("prev_us")).cast("double") / 1e6)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
           round(avg(col("gap_s")), 2).as("avg_gap_s"),
           round(max(col("gap_s")), 2).as("max_gap_s"))
      .orderBy(col("user_id"))
  }

  /** As-of join: for each 'error' event, the most recent 'click' by the
    * same user at-or-before it. Implemented scalably as a union + single
    * per-user event-time sort with a running `last(click_ts)` — one shuffle
    * on user_id, no per-row probe. (`kind` orders clicks before errors at
    * equal timestamps, matching ASOF's ts_click <= ts_error.)
    */
  def qEventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(0).as("kind"),
              lit(null).cast("long").as("event_id"), col("ts").as("click_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), lit(1).as("kind"),
              col("event_id"), lit(null).cast("timestamp").as("click_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("kind").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Running max == most recent click (ts ascending within the frame);
    // max is incrementally maintained, unlike last(_, ignoreNulls).
    clicks.unionByName(errors)
      .withColumn("last_click", max(col("click_ts")).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
              coalesce(unix_micros(col("last_click")), lit(-1L)).as("click_ts_us"))
      .orderBy(col("event_id"))
  }

  /** Trailing time-RANGE window: per-user rolling count and exact
    * centi-unit sum over the preceding hour of EVENT TIME (a value-offset
    * frame, not a row-count frame — the feature-engineering primitive
    * "activity in the last hour at each event"). The window partitions on
    * user_id (high cardinality, skew-free) and the frame bound is integer
    * microseconds, so peers and bounds are engine-independent.
    */
  def qEventsTimeRange(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-hourUs, 0)
    events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
              expr("cast(round(value * 100) as bigint)").as("value_c"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_c_1h", sum(col("value_c")).over(w))
      .select(col("event_id"), col("user_id"), col("ts_us"),
              col("n_1h"), col("sum_c_1h"))
      .orderBy(col("event_id"))
  }

  /** SCD Type-2 history build: treat each user's event_type as a
    * slowly-changing attribute and reconstruct the versioned dimension —
    * change detection via `lag`, validity intervals via `lead`, an
    * open-ended current row per user. This is the nightly
    * dimension-maintenance shape of a warehouse pipeline. All three
    * window functions share ONE partitioning (user_id) and ONE sort
    * order (ts_us, event_id), so Catalyst plans a single exchange + sort
    * for the whole query — at 100 TB that is one linear shuffle on a
    * high-cardinality skew-free key.
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
              col("event_type").as("attr"))
      .withColumn("prev", lag(col("attr"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("attr"))
      .withColumn("version", row_number().over(w))
      .withColumn("to_us", lead(col("ts_us"), 1).over(w))
      .select(col("user_id"), col("version"), col("attr"),
              col("ts_us").as("from_us"), col("to_us"),
              col("to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** Gap-filled hourly resample per event type: densify the hourly series
    * so silent hours appear as explicit zero rows — the shape every
    * downstream time-series consumer (anomaly detection, forecasting)
    * needs. The dense grid comes from `sequence` + `explode` over per-type
    * [min, max] HOUR INDEXES (span-bounded: grid size = types × hours, a
    * few thousand rows regardless of event volume), then a left join back
    * to the hourly aggregate. At 100 TB the events side partial-aggregates
    * to one row per (type, hour) before any shuffle; the grid side is
    * broadcast-sized by construction. Sums are exact centi-units.
    */
  def qEventsResample(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600000000L
    val hourly = events(spark, dir)
      .select(col("event_type"), expr(s"unix_micros(ts) div $hourUs").as("h"),
              expr("cast(round(value * 100) as bigint)").as("value_c"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("value_c"))
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
              explode(sequence(col("h0"), col("h1"))).as("h"))
    grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), (col("h") * hourUs).as("hb"),
              coalesce(col("n"), lit(0L)).as("n"),
              coalesce(col("value_c"), lit(0L)).as("value_c"))
      .orderBy(col("event_type"), col("hb"))
  }

  /** Daily audience growth: new users per day (first-seen attribution) and
    * the cumulative distinct-user count — "running COUNT(DISTINCT)" made
    * scalable by decomposition: min-aggregate per user (linear, partial
    * combine), day-aggregate (one row per day), then a running sum over
    * the DAY-level relation only. The unbounded window sorts ~hundreds of
    * rows, never the fact table — the aggregate-then-rank pattern.
    */
  def qNewUsersDaily(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val daily = events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) div $dayUs").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    daily
      .withColumn("cum_users",
        sum(col("new_users")).over(Window.orderBy(col("day"))))
      .select((col("day") * dayUs).as("db"), col("new_users"), col("cum_users"))
      .orderBy(col("db"))
  }
}
