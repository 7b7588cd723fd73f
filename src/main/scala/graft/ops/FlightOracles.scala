package graft.ops

/** DuckDB oracle SQL for the reproduction layer. Each statement is the ANSI
  * equivalent of the corresponding FlightOps query, written for exact value
  * parity: integer month pivots, COALESCE(...,0) for empty months,
  * FLOOR(AVG)+1 rounding, and round(x, 2) on double sums on BOTH sides so
  * summation-order ulp noise cannot flip the hash compare.
  */
object FlightOracles {
  /** Shared flight-analog projection (FIXTURES.md §3). */
  private val F =
    """WITH f AS (
      |  SELECT event_type AS carrier, year(ts) AS y, month(ts) AS m,
      |         value AS delay,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS k
      |  FROM events
      |), s AS (
      |  SELECT * FROM f WHERE y = 2024 AND k % 7 <> 0 AND k % 11 <> 0
      |)""".stripMargin

  private val pivotCols = (1 to 12)
    .map(m => s"COALESCE(MAX(CASE WHEN m = $m THEN d END), 0) AS m$m")
    .mkString(", ")
  private val reportExpr = (1 to 12)
    .map(m => s"printf(', ($m,%d)', m$m)")
    .mkString(" || ")

  val all: Map[String, String] = Map(
    "q_flight_report" ->
      s"""$F, a AS (
         |  SELECT carrier, m, CAST(FLOOR(AVG(delay)) + 1 AS INT) AS d
         |  FROM s GROUP BY carrier, m
         |), p AS (
         |  SELECT carrier, $pivotCols FROM a GROUP BY carrier
         |)
         |SELECT carrier, ${(1 to 12).map("m" + _).mkString(", ")},
         |       'AIR-' || carrier || chr(9) || $reportExpr AS report
         |FROM p ORDER BY carrier""".stripMargin,

    "q_populate" ->
      """SELECT count(*) AS n_rows, count(*) AS n_keys,
        |       round(sum(value), 2) AS sum_value
        |FROM events""".stripMargin,

    "q_flight_aggregator" ->
      s"""$F, a AS (
         |  SELECT carrier, m, CAST(FLOOR(AVG(delay)) + 1 AS INT) AS d
         |  FROM s GROUP BY carrier, m
         |), c AS (SELECT DISTINCT carrier FROM s)
         |SELECT c.carrier, g.m AS month, COALESCE(a.d, 0) AS d
         |FROM c CROSS JOIN generate_series(1, 12) g(m)
         |LEFT JOIN a ON a.carrier = c.carrier AND a.m = g.m
         |ORDER BY c.carrier, month""".stripMargin,

    "q_secondary" ->
      s"""$F
         |SELECT carrier, m AS month, CAST(FLOOR(AVG(delay)) + 1 AS INT) AS d
         |FROM s GROUP BY carrier, m ORDER BY carrier, m""".stripMargin,

    "q_filter_year" ->
      """SELECT event_type AS carrier, month(ts) AS month, value AS delay
        |FROM events WHERE year(ts) = 2024
        |ORDER BY carrier, month, delay""".stripMargin,

    "q_filter_successful" ->
      s"""$F
         |SELECT carrier, count(*) AS n, round(sum(delay), 2) AS total_delay
         |FROM s GROUP BY carrier ORDER BY carrier""".stripMargin,

    "q_group_month_sum_count" ->
      s"""$F
         |SELECT carrier, m AS month, round(sum(delay), 2) AS sum_delay,
         |       count(*) AS n_flights
         |FROM s GROUP BY carrier, m ORDER BY carrier, m""".stripMargin,
  )
}
