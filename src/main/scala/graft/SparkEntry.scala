package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (reproduction layer) and the
  * extension layers (relational, dedup, similarity, text, events/streaming)
  * registers one entry in [[queries]]; SQL-expressible ones register a
  * DuckDB oracle in [[oracleSql]] keyed identically. Column names and value
  * rounding are mirrored exactly between the Spark plan and the oracle SQL
  * (the driver sorts columns by name before hashing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.FlightOps.qFlightReport(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Reproduction layer (SURVEY.md §2.1–§2.5)
    "q_flight_report" -> (ops.FlightOps.qFlightReport _),
    "q_populate" -> (ops.FlightOps.qPopulate _),
    "q_secondary" -> (ops.FlightOps.qSecondary _),
    "q_filter_year" -> (ops.FlightOps.qFilterYear _),
    "q_filter_successful" -> (ops.FlightOps.qFilterSuccessful _),
    "q_group_month_sum_count" -> (ops.FlightOps.qGroupMonthSumCount _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.FlightOracles.all
}
