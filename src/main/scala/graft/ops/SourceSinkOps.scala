package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink surface closing the reference's remaining I/O operators
  * (SURVEY.md §2.1): CSV scan+parse with explicit schema and quote/escape
  * options (S1/S2 — the opencsv defaults), and the `key TAB value` text
  * sink (S6 — TextOutputFormat). Both are round-trips: write to a temp
  * location, read back through the other format, aggregate — so the oracle
  * validates the entire encode/decode path, not just the write.
  *
  * Plus two scale techniques the reference cannot express:
  *  - Salted two-phase aggregation (hot-key skew: 5 event_types over 100k+
  *    rows would hash to 5 reducers; the salt spreads each key over 16).
  *  - GROUPING SETS as an explicit multi-granularity aggregate.
  */
object SourceSinkOps {
  import graft.Tables._

  private def tmp(dir: String, tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"

  /** S1/S2: events → CSV (explicit quote/escape, no header) → read back
    * with a declared schema (schema-on-read, the Spark analog of the
    * reference's positional constants) → checksum aggregate.
    */
  def qCsvIngest(spark: SparkSession, dir: String): DataFrame = {
    val target = tmp(dir, "csv")
    events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              col("value"), col("props"))
      .write.mode("overwrite")
      .option("quote", "\"").option("escape", "\\").option("header", "false")
      .csv(target)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    spark.read.schema(schema)
      .option("quote", "\"").option("escape", "\\").option("header", "false")
      .csv(target)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value")), 2).as("sum_value"),
           sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .orderBy(col("event_type"))
  }

  /** S6: the flagship report as `AIR-<carrier> TAB <months>` text lines →
    * TextOutputFormat-style sink → read back → line statistics.
    */
  def qTextReport(spark: SparkSession, dir: String): DataFrame = {
    val target = tmp(dir, "text")
    FlightOps.qFlightReport(spark, dir)
      .select(col("report"))
      .write.mode("overwrite").text(target)
    spark.read.text(target)
      .agg(count(lit(1)).as("n_lines"),
           sum(length(col("value"))).as("total_chars"),
           min(substring(col("value"), 1, 10)).as("first_prefix"))
  }

  /** Skew-resistant aggregation: salt the (low-cardinality, hot) group key
    * across 16 sub-keys, partially aggregate, then combine. Result is
    * bit-identical to the direct aggregate — the oracle is the PLAIN
    * GROUP BY, proving the rewrite is semantics-preserving.
    */
  def qSkewSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val salted = events(spark, dir)
      .withColumn("salt", (col("event_id") % 16).cast("int"))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
    salted
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), round(sum(col("s")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Hive-style partitioned write + partition-pruned read: the layout that
    * makes per-key scans touch only their directory at scale. Returns the
    * per-partition counts read back through a pruning filter.
    */
  def partitionedRoundTrip(spark: SparkSession, dir: String,
                           keep: Seq[String]): DataFrame = {
    val target = tmp(dir, "part")
    events(spark, dir)
      .write.mode("overwrite").partitionBy("event_type").parquet(target)
    spark.read.parquet(target)
      .filter(col("event_type").isin(keep: _*)) // prunes to keep.size dirs
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** Small-files compaction: rewrite a directory into ~targetFiles files
    * (sorted within partitions for locality). The maintenance op every
    * long-running ingest pipeline needs.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFiles: Int, sortCol: String): Unit =
    spark.read.parquet(inDir)
      .repartition(targetFiles)
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite").parquet(outDir)

  /** GROUPING SETS over (status, priority) — finer control than cube:
    * only the two single-dimension granularities.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    orders(spark, dir).createOrReplaceTempView("graft_orders")
    spark.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM graft_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin)
  }
}
