package graft.ops

/** DuckDB oracles for [[EventOps]]. Window starts are reconstructed with
  * integer microsecond bucket arithmetic (`epoch_us // width * width`) —
  * exactly Spark's window-start formula for UTC-aligned windows. Session
  * boundaries use the gaps-and-islands lag/sum rewrite with the same
  * `diff >= gap` new-session rule as Spark's session_window.
  */
object EventOracles {
  private val H = 3600000000L  // 1 hour in microseconds
  private val HH = 1800000000L // 30 min in microseconds

  /** `rounds` UNROLLED synchronous 2-core peel rounds (the
    * q_lpa_communities precedent) over the >=2-basket co-purchase
    * graph — each level keeps edges whose BOTH endpoints had degree
    * >= 2 in the previous level. Every e-level MATERIALIZED: each is
    * referenced 3x (two IN-subqueries + the projection), so default
    * inlining would re-derive the basket self-join 3^level times. */
  private def kcoreOracle(rounds: Int, selfCheck: Boolean = false): String = {
    val peels = (1 to rounds).map { i =>
      val p = i - 1
      s"""d$i AS (SELECT node, count(*) AS d FROM (
         |  SELECT u AS node FROM e$p UNION ALL SELECT v FROM e$p) GROUP BY 1),
         |e$i AS MATERIALIZED (
         |  SELECT u, v FROM e$p
         |  WHERE u IN (SELECT node FROM d$i WHERE d >= 2)
         |    AND v IN (SELECT node FROM d$i WHERE d >= 2))""".stripMargin
    }.mkString(",\n")
    // selfCheck (fixpoint rows only): the engine side peels UNTIL
    // FIXPOINT, so the oracle's unroll is valid only if its last round
    // was a no-op. A fixture whose fixpoint is deeper than the unroll
    // would make the ORACLE the wrong side — fail it loudly instead of
    // pinning a confident wrong answer.
    val chk = if (selfCheck)
      s""",
         |chk AS (SELECT CASE WHEN (SELECT count(*) FROM e$rounds) =
         |  (SELECT count(*) FROM e${rounds - 1}) THEN 1
         |  ELSE CAST(error('kcore oracle unrolled $rounds rounds but the fixture fixpoint is deeper') AS INT) END AS ok)""".stripMargin
    else ""
    val from = if (selfCheck) ", chk WHERE chk.ok = 1" else ""
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v
       |  FROM li a JOIN li b ON a.basket = b.basket AND a.p < b.p
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |$peels$chk
       |SELECT node, count(*) AS core_deg FROM (
       |  SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds)$from
       |GROUP BY 1 ORDER BY node""".stripMargin
  }

  /** `rounds` UNROLLED support-peel rounds + a final support pass
    * (mirrors GraphOps.kTruss at k=3). The oracle enumerates triangles
    * id-ordered (a < b < c); support counts are orientation-independent,
    * so they equal the Spark side's degree-ordered enumeration exactly.
    * Every e-level MATERIALIZED (each referenced by three triangle-join
    * legs + the filter). */
  private def ktrussOracle(rounds: Int, selfCheck: Boolean = false): String = {
    val peels = (1 to rounds).map { i =>
      val p = i - 1
      s"""t$i AS (
         |  SELECT x.u AS a, x.v AS b, y.v AS c
         |  FROM e$p x JOIN e$p y ON y.u = x.u AND x.v < y.v
         |  JOIN e$p z ON z.u = x.v AND z.v = y.v),
         |s$i AS (SELECT u, v, count(*) AS sup FROM (
         |  SELECT a AS u, b AS v FROM t$i UNION ALL SELECT a, c FROM t$i
         |  UNION ALL SELECT b, c FROM t$i) GROUP BY 1, 2),
         |e$i AS MATERIALIZED (
         |  SELECT e.u, e.v FROM e$p e JOIN s$i s ON s.u = e.u AND s.v = e.v
         |  WHERE s.sup >= 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS p FROM lineitem),
       |e0 AS MATERIALIZED (
       |  SELECT a.p AS u, b.p AS v
       |  FROM li a JOIN li b ON a.basket = b.basket AND a.p < b.p
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |$peels,
       |tf AS (
       |  SELECT x.u AS a, x.v AS b, y.v AS c
       |  FROM e$rounds x JOIN e$rounds y ON y.u = x.u AND x.v < y.v
       |  JOIN e$rounds z ON z.u = x.v AND z.v = y.v),
       |sf AS (SELECT u, v, count(*) AS sup FROM (
       |  SELECT a AS u, b AS v FROM tf UNION ALL SELECT a, c FROM tf
       |  UNION ALL SELECT b, c FROM tf) GROUP BY 1, 2)${
      // Same loud under-unroll guard as kcoreOracle: the fixpoint rows'
      // oracle is only right when its last peel round changed nothing.
      if (selfCheck)
        s""",
           |chk AS (SELECT CASE WHEN (SELECT count(*) FROM e$rounds) =
           |  (SELECT count(*) FROM e${rounds - 1}) THEN 1
           |  ELSE CAST(error('ktruss oracle unrolled $rounds rounds but the fixture fixpoint is deeper') AS INT) END AS ok)""".stripMargin
      else ""}
       |SELECT e.u, e.v, CAST(coalesce(sf.sup, 0) AS BIGINT) AS support
       |FROM e$rounds e LEFT JOIN sf ON sf.u = e.u AND sf.v = e.v${
      if (selfCheck) " CROSS JOIN chk WHERE chk.ok = 1" else ""}
       |ORDER BY e.u, e.v""".stripMargin
  }

  val all: Map[String, String] = Map(
    // Batch twin of the AvailableNow windowed-state drain: exact
    // centi-unit integer sums, so incremental state == batch bit-for-bit.
    "q_stream_window" ->
      s"""SELECT (epoch_us(ts) // $H) * $H AS ws, event_type,
         |       count(*) AS n,
         |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    // Batch twin of the stream-stream interval join drain.
    "q_stream_join" ->
      """SELECT c.user_id, count(*) AS n_pairs,
        |       CAST(sum(c.event_id + e.event_id) AS BIGINT) AS id_sum
        |FROM events c
        |JOIN events e
        |  ON c.user_id = e.user_id
        | AND c.event_type = 'click' AND e.event_type = 'error'
        | AND e.ts >= c.ts - INTERVAL 30 MINUTE
        | AND e.ts <= c.ts + INTERVAL 30 MINUTE
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,

    // Batch twin of the flatMapGroupsWithState sessionization drain:
    // gaps-and-islands sessions (same `diff >= gap` rule), emitted iff
    // closed by a newer session (sid < per-user max) or flushed by the
    // event-time timeout — timeout ms (end//1000 + gap_ms) strictly
    // below the final watermark ms (max event-time ms − 2 h), matching
    // FlatMapGroupsWithStateExec's `timeoutTimestamp < watermark`.
    "q_stream_sessionize" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
         |lagd AS (SELECT user_id, t,
         |                lag(t) OVER (PARTITION BY user_id ORDER BY t) AS pt
         |         FROM e),
         |marks AS (SELECT user_id, t,
         |                 CASE WHEN pt IS NULL OR t - pt >= $H THEN 1 ELSE 0 END AS ns
         |          FROM lagd),
         |sess AS (SELECT user_id, t,
         |                SUM(ns) OVER (PARTITION BY user_id ORDER BY t
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |         FROM marks),
         |agg AS (SELECT user_id, sid, min(t) AS start_us, max(t) AS end_us,
         |               count(*) AS n
         |        FROM sess GROUP BY user_id, sid),
         |wm AS (SELECT max(t) // 1000 - 7200000 AS wms FROM e)
         |SELECT a.user_id, a.start_us, a.end_us, a.n
         |FROM agg a, wm
         |WHERE a.sid < (SELECT max(b.sid) FROM agg b WHERE b.user_id = a.user_id)
         |   OR a.end_us // 1000 + 3600000 < wm.wms
         |ORDER BY a.user_id, a.start_us""".stripMargin,

    // Integer micro-unit PageRank, 3 unrolled iterations. `//` is
    // DuckDB's truncating integer division = Spark's `div`, and * / //
    // associate left on both engines, so every intermediate is the same
    // exact BIGINT.
    "q_pagerank" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |tr AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS dst
        |  FROM ev),
        |edges AS (SELECT src, dst, count(*) AS wgt FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2),
        |outw AS (SELECT src, CAST(sum(wgt) AS BIGINT) AS out_w FROM edges GROUP BY 1),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
        |pr0 AS (SELECT node, 1000000 // n AS pr FROM nodes, nn),
        |pr1 AS (
        |  SELECT nodes.node,
        |    (SELECT 150000 // n FROM nn) + (850000 * coalesce(c.in_c, 0)) // 1000000 AS pr
        |  FROM nodes LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.pr * e.wgt // o.out_w) AS BIGINT) AS in_c
        |    FROM edges e JOIN pr0 p ON e.src = p.node JOIN outw o ON e.src = o.src
        |    GROUP BY 1) c ON nodes.node = c.node),
        |pr2 AS (
        |  SELECT nodes.node,
        |    (SELECT 150000 // n FROM nn) + (850000 * coalesce(c.in_c, 0)) // 1000000 AS pr
        |  FROM nodes LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.pr * e.wgt // o.out_w) AS BIGINT) AS in_c
        |    FROM edges e JOIN pr1 p ON e.src = p.node JOIN outw o ON e.src = o.src
        |    GROUP BY 1) c ON nodes.node = c.node),
        |pr3 AS (
        |  SELECT nodes.node,
        |    (SELECT 150000 // n FROM nn) + (850000 * coalesce(c.in_c, 0)) // 1000000 AS pr
        |  FROM nodes LEFT JOIN (
        |    SELECT e.dst AS node, CAST(sum(p.pr * e.wgt // o.out_w) AS BIGINT) AS in_c
        |    FROM edges e JOIN pr2 p ON e.src = p.node JOIN outw o ON e.src = o.src
        |    GROUP BY 1) c ON nodes.node = c.node)
        |SELECT node, CAST(pr AS BIGINT) AS pr FROM pr3
        |ORDER BY pr DESC, node""".stripMargin,

    // Value-offset (RANGE) frame: bounds are integer microseconds, peers
    // group identically on both engines.
    "q_events_timerange" ->
      s"""SELECT event_id, user_id, ts_us,
         |  count(*) OVER w AS n_1h,
         |  CAST(sum(value_c) OVER w AS BIGINT) AS sum_c_1h
         |FROM (
         |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         |         CAST(round(value * 100) AS BIGINT) AS value_c
         |  FROM events)
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
         |             RANGE BETWEEN $H PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "q_events_tumbling" ->
      s"""SELECT (epoch_us(ts) // $H) * $H AS ws, event_type,
         |       count(*) AS n, round(sum(value), 2) AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "q_events_sliding" ->
      s"""WITH win AS (
         |  SELECT (epoch_us(ts) // $HH) * $HH AS ws, value FROM events
         |  UNION ALL
         |  SELECT (epoch_us(ts) // $HH) * $HH - $HH AS ws, value FROM events
         |)
         |SELECT ws, count(*) AS n, round(sum(value), 2) AS sum_value
         |FROM win GROUP BY ws ORDER BY ws""".stripMargin,

    "q_events_session" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, value,
         |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
         |                (PARTITION BY user_id ORDER BY ts) >= $H
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |), s AS (
         |  SELECT user_id, ts, value,
         |         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM g
         |)
         |SELECT user_id, min(epoch_us(ts)) AS session_start,
         |       count(*) AS n, round(sum(value), 2) AS sum_value
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,

    "q_events_interarrival" ->
      """WITH g AS (
        |  SELECT user_id,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER
        |           (PARTITION BY user_id ORDER BY ts) AS gap_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_gaps,
        |       round(avg(gap_us::DOUBLE / 1e6), 2) AS avg_gap_s,
        |       round(max(gap_us::DOUBLE / 1e6), 2) AS max_gap_s
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_events_asof" ->
      """SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |       coalesce(epoch_us(c.ts), -1) AS click_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts
        |ORDER BY e.event_id""".stripMargin,

    // SCD2: change rows via lag, validity intervals via lead over the
    // surviving change rows; identical (ts_us, event_id) sort keys on
    // both engines make the history deterministic.
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type AS attr,
        |         lag(event_type) OVER
        |           (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
        |  FROM events
        |), ch AS (
        |  SELECT user_id, event_id, ts_us, attr
        |  FROM e WHERE prev IS NULL OR prev <> attr
        |)
        |SELECT user_id,
        |       row_number() OVER
        |         (PARTITION BY user_id ORDER BY ts_us, event_id) AS version,
        |       attr, ts_us AS from_us,
        |       lead(ts_us) OVER
        |         (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_us,
        |       (lead(ts_us) OVER
        |         (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL) AS is_current
        |FROM ch ORDER BY user_id, version""".stripMargin,

    // Triangle count is orientation-independent: the oracle counts each
    // triangle x<y<z once via its id-ordered edges (x,y),(y,z),(x,z);
    // the Spark side counts the same set via degree-ordered wedges.
    "q_triangle_count" ->
      """WITH raw AS (
        |  SELECT DISTINCT
        |    CAST(least(c.c_nationkey, s.s_nationkey) AS BIGINT) AS u,
        |    CAST(greatest(c.c_nationkey, s.s_nationkey) AS BIGINT) AS v
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |), nodes AS (SELECT u AS n FROM raw UNION SELECT v FROM raw)
        |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
        |       (SELECT count(*) FROM raw) AS n_edges,
        |       (SELECT count(*)
        |        FROM raw e1 JOIN raw e2 ON e1.v = e2.u
        |                    JOIN raw e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles""".stripMargin,

    // Batch twin of the streaming-dedup drain: the doubled stream
    // collapses back to exactly the single-copy aggregate.
    "q_stream_dedup" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Dense grid via unnest(generate_series) over per-type hour-index
    // bounds — the DuckDB twin of sequence+explode.
    "q_events_resample" ->
      s"""WITH hourly AS (
         |  SELECT event_type, epoch_us(ts) // $H AS h, count(*) AS n,
         |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
         |  FROM events GROUP BY 1, 2),
         |grid AS (
         |  SELECT event_type, unnest(generate_series(min(h), max(h))) AS h
         |  FROM hourly GROUP BY event_type)
         |SELECT g.event_type, g.h * $H AS hb,
         |       coalesce(hh.n, 0) AS n, coalesce(hh.value_c, 0) AS value_c
         |FROM grid g LEFT JOIN hourly hh
         |  ON g.event_type = hh.event_type AND g.h = hh.h
         |ORDER BY g.event_type, hb""".stripMargin,

    // Exact median as the sum of the two middle order statistics (equal
    // when n is odd) — interpolation-free on both engines.
    "q_group_median" ->
      """WITH v AS (
        |  SELECT event_type, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |r AS (
        |  SELECT event_type, value_c,
        |         count(*) OVER (PARTITION BY event_type) AS n,
        |         row_number() OVER
        |           (PARTITION BY event_type ORDER BY value_c, event_id) AS rn
        |  FROM v)
        |SELECT event_type, max(n) AS n,
        |       CASE WHEN count(*) = 1 THEN CAST(sum(value_c) * 2 AS BIGINT)
        |            ELSE CAST(sum(value_c) AS BIGINT) END AS med2_c
        |FROM r
        |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Interval union per user: island detection via running max of prior
    // ends, then exact covered mass.
    "q_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_us(ts) AS s,
        |         epoch_us(ts) + 1800000000 AS e
        |  FROM events),
        |mrk AS (
        |  SELECT user_id, s, e,
        |         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |                IS NULL
        |              OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |              THEN 1 ELSE 0 END AS ns
        |  FROM iv),
        |isl AS (
        |  SELECT user_id, s, e,
        |         SUM(ns) OVER (PARTITION BY user_id ORDER BY s, e
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
        |  FROM mrk),
        |merged AS (
        |  SELECT user_id, iid, min(s) AS i_s, max(e) AS i_e
        |  FROM isl GROUP BY 1, 2)
        |SELECT count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_islands,
        |       CAST(sum(i_e - i_s) AS BIGINT) AS covered_us,
        |       (SELECT CAST(count(*) * 1800000000 AS BIGINT) FROM iv)
        |         AS raw_us
        |FROM merged""".stripMargin,

    // Multi-quantile bands: value at rank max(1, floor(n*p)) per band —
    // mirrors the Spark rn*den <= n*num OR rn=1 rule exactly.
    "q_percentile_bands" ->
      """WITH v AS (
        |  SELECT event_type, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |r AS (
        |  SELECT event_type, value_c,
        |         count(*) OVER (PARTITION BY event_type) AS n,
        |         row_number() OVER
        |           (PARTITION BY event_type ORDER BY value_c, event_id) AS rn
        |  FROM v)
        |SELECT event_type, max(n) AS n,
        |       min(value_c) AS p0,
        |       max(CASE WHEN rn * 4 <= n * 1 OR rn = 1 THEN value_c END) AS p25,
        |       max(CASE WHEN rn * 2 <= n * 1 OR rn = 1 THEN value_c END) AS p50,
        |       max(CASE WHEN rn * 4 <= n * 3 OR rn = 1 THEN value_c END) AS p75,
        |       max(CASE WHEN rn * 10 <= n * 9 OR rn = 1 THEN value_c END) AS p90,
        |       max(CASE WHEN rn * 100 <= n * 99 OR rn = 1 THEN value_c END) AS p99,
        |       max(value_c) AS p100
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Batch twin of the foreachBatch keyed-upsert drain: latest event per
    // user by (ts, event_id).
    "q_stream_upsert" ->
      """SELECT user_id, ts_us, event_id, event_type, value_c FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS value_c,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // Same final state as q_stream_upsert — the versioned sink must drain
    // to the identical latest-per-user relation whatever the batching.
    "q_stream_versioned" ->
      """SELECT user_id, ts_us, event_id, event_type, value_c FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS value_c,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_attribution" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
         |  FROM events),
         |f AS (
         |  SELECT event_type, ts_us,
         |         max(CASE WHEN event_type = 'click' THEN ts_us END) OVER
         |           (PARTITION BY user_id ORDER BY ts_us, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           AS last_click_us
         |  FROM e)
         |SELECT count(*) AS n_purchases,
         |       count(last_click_us) AS n_attr_any,
         |       count(CASE WHEN ts_us - last_click_us <= $H THEN 1 END)
         |         AS n_attr_1h,
         |       CAST(sum(CASE WHEN ts_us - last_click_us <= $H
         |                     THEN ts_us - last_click_us END) AS BIGINT)
         |         AS latency_sum_us,
         |       min(ts_us - last_click_us) AS latency_min_us
         |FROM f WHERE event_type = 'purchase'""".stripMargin,

    "q_time_weighted" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |nx AS (
        |  SELECT user_id, ts_us, value_c,
        |         lead(ts_us) OVER
        |           (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_us
        |  FROM e)
        |SELECT user_id,
        |       CAST(sum(value_c * (next_us - ts_us)) AS BIGINT) AS integral_cus,
        |       max(next_us) - min(ts_us) AS span_us,
        |       count(*) + 1 AS n_events
        |FROM nx WHERE next_us IS NOT NULL
        |GROUP BY user_id
        |ORDER BY integral_cus DESC, user_id LIMIT 10""".stripMargin,

    "q_peak_concurrency" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         |lagd AS (SELECT user_id, ts_us,
         |                lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
         |                  AS prev_us FROM e),
         |marks AS (SELECT user_id, ts_us,
         |                 CASE WHEN prev_us IS NULL OR ts_us - prev_us >= $H
         |                      THEN 1 ELSE 0 END AS ns FROM lagd),
         |sess0 AS (SELECT user_id, ts_us,
         |                 SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |                   AS sid FROM marks),
         |sessions AS (SELECT user_id, sid, min(ts_us) AS s,
         |                    max(ts_us) + $H AS e
         |             FROM sess0 GROUP BY 1, 2),
         |bounds AS (SELECT s AS t, 1 AS d FROM sessions
         |           UNION ALL SELECT e AS t, -1 AS d FROM sessions),
         |run AS (SELECT t, SUM(d) OVER (ORDER BY t, d
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
         |        FROM bounds)
         |SELECT (SELECT count(*) FROM sessions) AS n_sessions,
         |       (SELECT CAST(max(live) AS BIGINT) FROM run) AS peak,
         |       (SELECT min(t) FROM run
         |        WHERE live = (SELECT max(live) FROM run)) AS peak_ts_us""".stripMargin,

    "q_new_users_daily" ->
      """WITH first_day AS (
        |  SELECT user_id, min(epoch_us(ts) // 86400000000) AS day
        |  FROM events GROUP BY 1),
        |daily AS (SELECT day, count(*) AS new_users FROM first_day GROUP BY 1)
        |SELECT day * 86400000000 AS db, new_users,
        |       CAST(sum(new_users) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS cum_users
        |FROM daily ORDER BY db""".stripMargin,

    // Mirrors EventStream.qStreamTopk: the incremental additive count
    // store must drain to the plain batch aggregate.
    "q_stream_topk" ->
      """SELECT user_id, count(*) AS n FROM events
        |GROUP BY 1 ORDER BY n DESC, user_id LIMIT 20""".stripMargin,

    // Mirrors GraphOps.qCopurchaseCommunities: recursive closure over the
    // >=3-basket co-purchase edges; community id = min reachable part.
    "q_copurchase_communities" ->
      """WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pp AS (
        |  SELECT a.l_partkey AS p1, b.l_partkey AS p2
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3
        |),
        |e AS (SELECT p1 AS a, p2 AS b FROM pp UNION SELECT p2, p1 FROM pp),
        |r(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM r JOIN e ON e.a = r.b
        |),
        |lab AS (
        |  SELECT a AS part, least(a, min(b)) AS community_id
        |  FROM r GROUP BY a
        |)
        |SELECT community_id, count(*) AS n_parts
        |FROM lab GROUP BY 1 ORDER BY community_id""".stripMargin,

    // Mirrors EventOps.qMarkovTransitions: lead() per user in (ts,
    // event_id) order — DuckDB's ts is the raw nano value, the same
    // total order as Spark's ts_nanos.
    "q_markov_transitions" ->
      """WITH tr AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS to_type
        |  FROM events
        |), t2 AS (
        |  SELECT from_type, to_type, count(*) AS n_trans
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), t1 AS (
        |  SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
        |  FROM t2 GROUP BY 1
        |)
        |SELECT t2.from_type, t2.to_type, t2.n_trans, t1.n_from,
        |       round(t2.n_trans::DOUBLE / t1.n_from, 6) AS p_cond
        |FROM t2 JOIN t1 USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // Mirrors EventOps.qNextEventExamples: trailing-5 per-type counts +
    // lead() label off one per-user (ts, event_id) sort.
    "q_next_event_examples" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
        |), x AS (
        |  SELECT user_id, event_id, ts_us,
        |         count(CASE WHEN event_type = 'click' THEN 1 END) OVER w5 AS f_click,
        |         count(CASE WHEN event_type = 'error' THEN 1 END) OVER w5 AS f_error,
        |         count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER w5 AS f_purchase,
        |         count(CASE WHEN event_type = 'signup' THEN 1 END) OVER w5 AS f_signup,
        |         count(CASE WHEN event_type = 'view' THEN 1 END) OVER w5 AS f_view,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts_us, event_id) AS label
        |  FROM e
        |  WINDOW w5 AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |)
        |SELECT * FROM x WHERE label IS NOT NULL
        |ORDER BY user_id, ts_us, event_id""".stripMargin,

    // Mirrors GraphOps.qWalkCorpus: four argmin walk rounds unrolled as
    // chained CTEs; successor = arg_min over the identical md5 surrogate.
    "q_walk_corpus" ->
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS p FROM lineitem),
        |pp AS (
        |  SELECT a.p AS p1, b.p AS p2
        |  FROM li a JOIN li b ON a.basket = b.basket AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |),
        |e AS (SELECT p1 AS u, p2 AS v FROM pp UNION SELECT p2, p1 FROM pp),
        |n0 AS (SELECT DISTINCT u AS walk_id, u AS node FROM e),
        |s1 AS (
        |  SELECT n0.walk_id,
        |         arg_min(e.v, md5(n0.walk_id::VARCHAR || '_1_' || e.v::VARCHAR)) AS node
        |  FROM n0 JOIN e ON e.u = n0.node GROUP BY n0.walk_id),
        |s2 AS (
        |  SELECT s1.walk_id,
        |         arg_min(e.v, md5(s1.walk_id::VARCHAR || '_2_' || e.v::VARCHAR)) AS node
        |  FROM s1 JOIN e ON e.u = s1.node GROUP BY s1.walk_id),
        |s3 AS (
        |  SELECT s2.walk_id,
        |         arg_min(e.v, md5(s2.walk_id::VARCHAR || '_3_' || e.v::VARCHAR)) AS node
        |  FROM s2 JOIN e ON e.u = s2.node GROUP BY s2.walk_id),
        |s4 AS (
        |  SELECT s3.walk_id,
        |         arg_min(e.v, md5(s3.walk_id::VARCHAR || '_4_' || e.v::VARCHAR)) AS node
        |  FROM s3 JOIN e ON e.u = s3.node GROUP BY s3.walk_id)
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM n0
        |UNION ALL SELECT walk_id, CAST(1 AS BIGINT), node FROM s1
        |UNION ALL SELECT walk_id, CAST(2 AS BIGINT), node FROM s2
        |UNION ALL SELECT walk_id, CAST(3 AS BIGINT), node FROM s3
        |UNION ALL SELECT walk_id, CAST(4 AS BIGINT), node FROM s4
        |ORDER BY walk_id, step""".stripMargin,

    // Mirrors EventOps.qEwmaSmooth: α=1/2 EWMA over the trailing 8
    // purchase values per user — power-of-two weights keep num/den exact
    // BIGINTs; both engines truncate the final integer division.
    "q_ewma_smooth" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events WHERE event_type = 'purchase'
        |), l AS (
        |  SELECT user_id, event_id, ts_us, value_c,
        |         lag(value_c, 1) OVER w AS v1, lag(value_c, 2) OVER w AS v2,
        |         lag(value_c, 3) OVER w AS v3, lag(value_c, 4) OVER w AS v4,
        |         lag(value_c, 5) OVER w AS v5, lag(value_c, 6) OVER w AS v6,
        |         lag(value_c, 7) OVER w AS v7
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |), s AS (
        |  SELECT user_id, event_id, ts_us, value_c,
        |         value_c * 128 + coalesce(v1, 0) * 64 + coalesce(v2, 0) * 32 +
        |         coalesce(v3, 0) * 16 + coalesce(v4, 0) * 8 + coalesce(v5, 0) * 4 +
        |         coalesce(v6, 0) * 2 + coalesce(v7, 0) AS ewma_num,
        |         128 + CASE WHEN v1 IS NULL THEN 0 ELSE 64 END +
        |         CASE WHEN v2 IS NULL THEN 0 ELSE 32 END +
        |         CASE WHEN v3 IS NULL THEN 0 ELSE 16 END +
        |         CASE WHEN v4 IS NULL THEN 0 ELSE 8 END +
        |         CASE WHEN v5 IS NULL THEN 0 ELSE 4 END +
        |         CASE WHEN v6 IS NULL THEN 0 ELSE 2 END +
        |         CASE WHEN v7 IS NULL THEN 0 ELSE 1 END AS ewma_den
        |  FROM l
        |)
        |SELECT user_id, event_id, ts_us, value_c, ewma_num, ewma_den,
        |       ewma_num // ewma_den AS ewma_c
        |FROM s ORDER BY user_id, ts_us, event_id""".stripMargin,

    // Mirrors GraphOps.qLpaCommunities: 3 UNROLLED synchronous LPA
    // rounds (the q_pagerank unrolling precedent) over the >=2-basket
    // co-purchase graph; per round, argmax neighbor label with
    // (count DESC, lbl ASC) row_number = Spark's max_by struct
    // tie-break. adj/l3 MATERIALIZED: each round references adj and the
    // prior level, so default inlining re-derives the basket self-join
    // per level.
    "q_lpa_communities" -> {
      val steps = (1 to 3).map { i =>
        val p = i - 1
        s"""l$i AS ${if (i == 3) "MATERIALIZED " else ""}(
           |  SELECT a AS node, lbl FROM (
           |    SELECT v.a, v.lbl,
           |           row_number() OVER (PARTITION BY v.a
           |             ORDER BY v.c DESC, v.lbl ASC) AS rn
           |    FROM (SELECT adj.a, p.lbl, count(*) AS c
           |          FROM adj JOIN l$p p ON adj.b = p.node
           |          GROUP BY 1, 2) v) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS p FROM lineitem),
         |pp AS (
         |  SELECT a.p AS p1, b.p AS p2
         |  FROM li a JOIN li b ON a.basket = b.basket AND a.p < b.p
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |adj AS MATERIALIZED (SELECT p1 AS a, p2 AS b FROM pp
         |                     UNION ALL SELECT p2, p1 FROM pp),
         |l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM adj),
         |$steps,
         |sizes AS (SELECT lbl, count(*) AS community_n FROM l3 GROUP BY 1)
         |SELECT node, lbl AS community, community_n
         |FROM l3 JOIN sizes USING (lbl) ORDER BY node""".stripMargin
    },

    // Mirrors GraphOps.qKcore: 3 UNROLLED synchronous peel rounds (the
    // q_lpa_communities precedent) over the >=2-basket co-purchase
    // graph — each level keeps edges whose BOTH endpoints had degree
    // >= 2 in the previous level. e0/e1/e2/e3 MATERIALIZED: every level
    // references its predecessor 3x (two IN-subqueries + the projection),
    // so default inlining re-derives the basket self-join 3^level times.
    "q_kcore" -> kcoreOracle(3),

    // Mirrors GraphOps.qKcoreFull (peel-until-fixpoint, cap 64): the
    // oracle unrolls 8 rounds — more than any fixture's measured
    // fixpoint depth (1/4/6 at sf0.001/0.01/0.1); post-fixpoint rounds
    // are no-ops on both engines, so the adaptive schedule and ANY
    // sufficient unroll agree exactly. selfCheck asserts the last round
    // WAS a no-op, so an under-unrolled oracle errors instead of
    // pinning a wrong answer against a correct engine.
    "q_kcore_full" -> kcoreOracle(8, selfCheck = true),

    // Mirrors GraphOps.qKtruss: 2 UNROLLED support-peel rounds + a final
    // support pass. The oracle enumerates triangles id-ordered
    // (a < b < c); support counts are orientation-independent, so they
    // equal the Spark side's degree-ordered enumeration exactly.
    "q_ktruss" -> ktrussOracle(2),

    // Mirrors GraphOps.qKtrussFull (peel-until-fixpoint, cap 32): oracle
    // unrolled 3 rounds > the measured fixpoint depth of 2 at every
    // fixture SF; post-fixpoint rounds are no-ops on both engines.
    // selfCheck errors loudly if a fixture's fixpoint outgrows the unroll.
    "q_ktruss_full" -> ktrussOracle(3, selfCheck = true),

    // Mirrors GraphOps.qShortestPath: bounded-hop BFS layering as a
    // recursive CTE — UNION-dedup'd (node, dist) pairs with the hop cap,
    // min(dist) per node collapses to the BFS distance.
    "q_shortest_path" ->
      """WITH RECURSIVE li AS (
        |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS p FROM lineitem),
        |pp AS (
        |  SELECT a.p AS p1, b.p AS p2
        |  FROM li a JOIN li b ON a.basket = b.basket AND a.p < b.p
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |),
        |e AS (SELECT p1 AS u, p2 AS v FROM pp UNION SELECT p2, p1 FROM pp),
        |src AS (SELECT least(min(u), min(v)) AS node FROM e),
        |r(node, dist) AS (
        |  SELECT node, 0 FROM src
        |  UNION
        |  SELECT e.v, r.dist + 1 FROM r JOIN e ON e.u = r.node WHERE r.dist < 4
        |),
        |d AS (SELECT node, min(dist) AS dist FROM r GROUP BY node)
        |SELECT node, CAST(dist AS BIGINT) AS dist
        |FROM d ORDER BY dist, node""".stripMargin,

    // Mirrors EventOps.qM4Downsample: first/last/min/max per (type,
    // 32-bucket) with FULL lexicographic tie-breaks matching the Spark
    // side's min_by/max_by struct keys (max picks the LATER/LARGER row
    // on ties — hence the DESC chains).
    "q_m4_downsample" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS ts_us,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |x AS (SELECT min(ts_us) AS t0,
        |             max(ts_us) - min(ts_us) + 1 AS span FROM ev),
        |b AS (SELECT ev.*, (ts_us - t0) * 32 // span AS bucket FROM ev, x),
        |r AS (SELECT *,
        |  row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY ts_us, event_id) AS rf,
        |  row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY ts_us DESC, event_id DESC) AS rl,
        |  row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY value_c, ts_us, event_id) AS rmin,
        |  row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY value_c DESC, ts_us DESC, event_id DESC) AS rmax
        |  FROM b)
        |SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_points,
        |       CAST(max(CASE WHEN rf = 1 THEN ts_us END) AS BIGINT) AS t_first,
        |       CAST(max(CASE WHEN rf = 1 THEN value_c END) AS BIGINT) AS v_first,
        |       CAST(max(CASE WHEN rl = 1 THEN ts_us END) AS BIGINT) AS t_last,
        |       CAST(max(CASE WHEN rl = 1 THEN value_c END) AS BIGINT) AS v_last,
        |       CAST(max(CASE WHEN rmin = 1 THEN ts_us END) AS BIGINT) AS t_min,
        |       CAST(max(CASE WHEN rmin = 1 THEN value_c END) AS BIGINT) AS v_min,
        |       CAST(max(CASE WHEN rmax = 1 THEN ts_us END) AS BIGINT) AS t_max,
        |       CAST(max(CASE WHEN rmax = 1 THEN value_c END) AS BIGINT) AS v_max
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors EventOps.qTemporalSplit: exact 70/15/15 rank cuts over
    // (ts, event_id) — grank*100 <= n*70 integer comparisons on both
    // engines; the oracle's single global window is fine at oracle
    // scale, the Spark side ranks distributed.
    "q_temporal_split" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY ts_us, event_id) AS grank,
        |         count(*) OVER () AS n
        |  FROM ev),
        |s AS (
        |  SELECT *, CASE WHEN grank * 100 <= n * 70 THEN 'train'
        |                 WHEN grank * 100 <= n * 85 THEN 'val'
        |                 ELSE 'test' END AS split
        |  FROM r)
        |SELECT split, count(*) AS n_events,
        |       CAST(min(ts_us) AS BIGINT) AS min_ts_us,
        |       CAST(max(ts_us) AS BIGINT) AS max_ts_us,
        |       CAST(sum(value_c) AS BIGINT) AS sum_value_c
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    // Mirrors EventOps.qAnomalyZscore: exact micro-unit moments (S2 in
    // HUGEINT = Spark's DECIMAL(38,0)), one shared IEEE z expression.
    "q_anomaly_zscore" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 1000000.0) AS BIGINT) AS vm
        |  FROM events
        |), m AS (
        |  SELECT event_type, count(vm) AS n,
        |         CAST(sum(vm) AS BIGINT) AS s1,
        |         sum(vm::HUGEINT * vm) AS s2
        |  FROM ev GROUP BY 1
        |)
        |SELECT ev.event_type, ev.event_id, ev.vm,
        |       round((ev.vm::DOUBLE - s1::DOUBLE / n) /
        |             sqrt(s2::DOUBLE / n - (s1::DOUBLE / n) * (s1::DOUBLE / n)), 3) AS z
        |FROM ev JOIN m USING (event_type)
        |WHERE abs(round((ev.vm::DOUBLE - s1::DOUBLE / n) /
        |          sqrt(s2::DOUBLE / n - (s1::DOUBLE / n) * (s1::DOUBLE / n)), 3)) >= 3.0
        |ORDER BY event_id""".stripMargin,

    "q_snaive_backtest" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type, a.day, a.c, b.c AS forecast,
        |         abs(a.c - b.c) AS abs_err
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day = b.day + 7)
        |SELECT event_type, count(*) AS n_days,
        |       CAST(sum(abs_err) AS BIGINT) AS sum_abs_err,
        |       CAST(sum(abs_err) AS BIGINT) * 1000 // count(*) AS mae_milli
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Mirrors EventOps.qSessionPaths: lag+cumsum sessionization, in-row
    // struct sort before the path join — collect order never observable.
    "q_session_paths" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |                (PARTITION BY user_id
        |                 ORDER BY epoch_us(ts), event_id) >= 1800000000
        |              THEN 1 ELSE 0 END AS ns
        |  FROM events),
        |s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id
        |            ORDER BY ts_us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |p AS (
        |  SELECT user_id, sid,
        |         array_to_string(list_transform(
        |           list_sort(list(struct_pack(t := ts_us, e := event_id,
        |                                      y := event_type)))[1:3],
        |           x -> x.y), '>') AS path
        |  FROM s GROUP BY user_id, sid)
        |SELECT path, count(*) AS n_sessions FROM p
        |GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,

    // Mirrors EventOps.qFunnelLatency: funnel stage chain + floor-rank
    // percentile read-out (value at rank max(1, floor(q·n))).
    "q_funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
        |            FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts_us) AS t_click
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts_us > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts_us) AS t_purchase
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_us > c.t_click
        |      GROUP BY 1),
        |lat AS (
        |  SELECT p.user_id, p.t_purchase - v.t_view AS lat_us
        |  FROM p JOIN v ON p.user_id = v.user_id),
        |r AS (
        |  SELECT lat_us,
        |         row_number() OVER (ORDER BY lat_us, user_id) AS rk,
        |         count(*) OVER () AS n
        |  FROM lat)
        |SELECT CAST(max(n) AS BIGINT) AS n_users,
        |       max(CASE WHEN rk * 100 <= n * 25 OR rk = 1 THEN lat_us END) AS p25_us,
        |       max(CASE WHEN rk * 100 <= n * 50 OR rk = 1 THEN lat_us END) AS p50_us,
        |       max(CASE WHEN rk * 100 <= n * 75 OR rk = 1 THEN lat_us END) AS p75_us,
        |       max(CASE WHEN rk * 100 <= n * 90 OR rk = 1 THEN lat_us END) AS p90_us,
        |       max(lat_us) AS max_us
        |FROM r""".stripMargin,

    // Mirrors EventOps.qPitJoin: strict (from, to] validity — an event
    // never sees a feature version starting at its own instant.
    "q_pit_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |p AS (
        |  SELECT user_id, ts_us, event_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts_us, event_id) AS np
        |  FROM ev WHERE event_type = 'purchase'),
        |d AS (
        |  SELECT user_id,
        |         CASE WHEN np >= 8 THEN 'gold' WHEN np >= 3 THEN 'silver'
        |              ELSE 'bronze' END AS tier,
        |         ts_us AS from_us,
        |         coalesce(lead(ts_us) OVER (PARTITION BY user_id
        |                                    ORDER BY ts_us, event_id),
        |                  9223372036854775807) AS to_us
        |  FROM p)
        |SELECT e.event_id, e.user_id, e.ts_us,
        |       coalesce(d.tier, 'none') AS tier
        |FROM ev e LEFT JOIN d ON e.user_id = d.user_id
        |  AND e.ts_us > d.from_us AND e.ts_us <= d.to_us
        |ORDER BY e.event_id""".stripMargin,

    "q_cohort_ltv" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events WHERE event_type = 'purchase'),
        |f AS (
        |  SELECT user_id, min(ts_us) // 604800000000 AS cohort_week
        |  FROM p GROUP BY 1),
        |sz AS (SELECT cohort_week, count(*) AS n_users FROM f GROUP BY 1),
        |cur AS (
        |  SELECT f.cohort_week,
        |         (p.ts_us // 604800000000) - f.cohort_week AS age_weeks,
        |         CAST(sum(p.value_c) AS BIGINT) AS spend_c
        |  FROM p JOIN f ON p.user_id = f.user_id
        |  GROUP BY 1, 2),
        |run AS (
        |  SELECT cohort_week, age_weeks, spend_c,
        |         CAST(sum(spend_c) OVER (PARTITION BY cohort_week
        |                                 ORDER BY age_weeks) AS BIGINT)
        |           AS cum_spend_c
        |  FROM cur)
        |SELECT r.cohort_week, r.age_weeks, r.spend_c, r.cum_spend_c,
        |       sz.n_users, r.cum_spend_c * 1000 // sz.n_users AS ltv_mc
        |FROM run r JOIN sz ON r.cohort_week = sz.cohort_week
        |ORDER BY r.cohort_week, r.age_weeks""".stripMargin,

    // Mirrors EventOps.qPsiDrift: even/odd epoch-day split, exact counts,
    // one micro-nat rounding per bucket; one-sided buckets → NULL psi.
    "q_psi_drift" ->
      """WITH b AS (
        |  SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
        |         epoch_us(ts) // 86400000000 % 2 AS half
        |  FROM events),
        |g AS (SELECT bucket, half, count(*) AS c FROM b GROUP BY 1, 2),
        |a AS (SELECT bucket, c AS c_a FROM g WHERE half = 0),
        |bb AS (SELECT bucket, c AS c_b FROM g WHERE half = 1),
        |na AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a FROM a),
        |nb AS (SELECT CAST(sum(c_b) AS BIGINT) AS n_b FROM bb)
        |SELECT coalesce(a.bucket, bb.bucket) AS bucket,
        |       coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b,
        |       CAST(CASE WHEN coalesce(c_a, 0) > 0 AND coalesce(c_b, 0) > 0
        |            THEN round((CAST(c_a AS DOUBLE) / n_a -
        |                 CAST(c_b AS DOUBLE) / n_b) *
        |                 ln((CAST(c_a AS DOUBLE) / n_a) /
        |                    (CAST(c_b AS DOUBLE) / n_b)) * 1000000)
        |            END AS BIGINT) AS psi_micronat
        |FROM a FULL OUTER JOIN bb ON a.bucket = bb.bucket
        |CROSS JOIN na CROSS JOIN nb
        |ORDER BY bucket""".stripMargin,

    // Mirrors EventOps.qAbTest: md5-surrogate variant assignment, pooled
    // two-proportion z in milli-units.
    "q_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS converted,
        |         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |              AS BIGINT) % 2 AS variant
        |  FROM events GROUP BY user_id),
        |v AS (SELECT variant, count(*) AS n,
        |             CAST(sum(converted) AS BIGINT) AS conv
        |      FROM u GROUP BY 1),
        |w AS (
        |  SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
        |  FROM (SELECT n, conv FROM v WHERE variant = 0) a
        |  CROSS JOIN (SELECT n, conv FROM v WHERE variant = 1) b)
        |SELECT n_a, conv_a, n_b, conv_b,
        |       conv_a * 1000000 // n_a AS rate_a_ppm,
        |       conv_b * 1000000 // n_b AS rate_b_ppm,
        |       CAST(CASE WHEN conv_a + conv_b > 0
        |                  AND conv_a + conv_b < n_a + n_b
        |            THEN round((CAST(conv_a AS DOUBLE) / n_a -
        |                 CAST(conv_b AS DOUBLE) / n_b) /
        |                 sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
        |                 (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
        |                 (1.0 / n_a + 1.0 / n_b)) * 1000)
        |            END AS BIGINT) AS z_milli
        |FROM w""".stripMargin,

    // Mirrors EventOps.qBootstrapCi: Poisson(1) weights off the shared
    // md5 surrogate, replica means in exact milli-cents, floor-rank
    // order statistics (ranks 3/32/60 of 64).
    "q_bootstrap_ci" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |r AS (SELECT event_type, event_id, value_c,
        |             unnest(generate_series(0, 63)) AS b FROM ev),
        |u AS (
        |  SELECT event_type, b, value_c,
        |         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':' ||
        |              CAST(b AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 AS u
        |  FROM r),
        |w AS (
        |  SELECT event_type, b, value_c,
        |         CASE WHEN u < 368 THEN 0 WHEN u < 736 THEN 1
        |              WHEN u < 920 THEN 2 WHEN u < 981 THEN 3
        |              WHEN u < 996 THEN 4 WHEN u < 999 THEN 5
        |              ELSE 6 END AS w
        |  FROM u),
        |m AS (
        |  SELECT event_type, b,
        |         CAST(sum(w * value_c) AS BIGINT) * 1000 //
        |           CAST(sum(w) AS BIGINT) AS mean_mc
        |  FROM w GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, b, mean_mc,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY mean_mc, b) AS rn
        |  FROM m),
        |bands AS (
        |  SELECT event_type,
        |         max(CASE WHEN rn = 3 THEN mean_mc END) AS ci_lo,
        |         max(CASE WHEN rn = 32 THEN mean_mc END) AS ci_med,
        |         max(CASE WHEN rn = 60 THEN mean_mc END) AS ci_hi
        |  FROM rk GROUP BY 1),
        |pt AS (
        |  SELECT event_type, count(*) AS n_events,
        |         CAST(sum(value_c) AS BIGINT) * 1000 // count(*)
        |           AS mean_mc_point
        |  FROM ev GROUP BY 1)
        |SELECT pt.event_type, pt.n_events, pt.mean_mc_point,
        |       b.ci_lo, b.ci_med, b.ci_hi
        |FROM pt JOIN bands b ON pt.event_type = b.event_type
        |ORDER BY pt.event_type""".stripMargin,

    "q_degree_assortativity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        |            FROM lineitem),
        |e AS (
        |  SELECT a.item AS u, b.item AS v
        |  FROM li a JOIN li b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT node, count(*) AS d FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1),
        |j AS (
        |  SELECT da.d AS da, db.d AS db
        |  FROM e JOIN deg da ON e.u = da.node JOIN deg db ON e.v = db.node)
        |SELECT count(*) AS m,
        |       CAST(sum(da + db) AS BIGINT) AS s1,
        |       CAST(sum(da*da + db*db) AS BIGINT) AS s2,
        |       CAST(sum(da*db) AS BIGINT) AS s3,
        |       CAST(4*count(*)*sum(da*db) - sum(da+db)*sum(da+db)
        |            AS BIGINT) AS r_num,
        |       CAST(2*count(*)*sum(da*da+db*db) - sum(da+db)*sum(da+db)
        |            AS BIGINT) AS r_den
        |FROM j""".stripMargin,

    // Mirrors EventOps.qRollingMedian: trailing-5 frame, in-row sort,
    // med2 = the two middle order statistics summed.
    "q_rolling_median" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, event_id, ts_us, value_c,
        |         list_sort(list(value_c)
        |           OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS win
        |  FROM p)
        |SELECT user_id, event_id, ts_us, value_c,
        |       len(win) AS n_win,
        |       win[(len(win) + 1) // 2] + win[(len(win) + 2) // 2] AS med2_c
        |FROM r ORDER BY user_id, ts_us, event_id""".stripMargin,

    // Mirrors EventOps.qCusumChangepoint: dev = n_days*c - total keeps the
    // mean-deviation exact; argmax = max |cusum|, ties to earliest day.
    "q_cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS total,
        |         count(*) AS n_days
        |  FROM daily GROUP BY 1),
        |cs AS (
        |  SELECT d.event_type, d.day, t.n_days, t.total,
        |         CAST(sum(d.c * t.n_days - t.total)
        |              OVER (PARTITION BY d.event_type ORDER BY d.day)
        |              AS BIGINT) AS cusum
        |  FROM daily d JOIN tot t USING (event_type)),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |                               ORDER BY abs(cusum) DESC, day) AS rn
        |  FROM cs)
        |SELECT event_type, day AS cp_day, cusum, n_days, total
        |FROM rk WHERE rn = 1 ORDER BY event_type""".stripMargin,

    "q_dow_hour_heatmap" ->
      """SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
        |       (epoch_us(ts) // 3600000000) % 24 AS hour,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors EventOps.qMadRobust: floor-rank median rule on both passes;
    // med2 = sum of the two middle order statistics, mad4 = med2 of
    // |2x - med2|.
    "q_mad_robust" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |r1 AS (
        |  SELECT event_type, value_c,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY value_c, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev),
        |m1 AS (
        |  SELECT event_type, max(n) AS n,
        |         CAST(CASE WHEN count(*) = 1 THEN sum(value_c) * 2
        |              ELSE sum(value_c) END AS BIGINT) AS med2_c
        |  FROM r1 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1),
        |dv AS (
        |  SELECT e.event_type, e.event_id,
        |         abs(e.value_c * 2 - m.med2_c) AS adev2_c
        |  FROM ev e JOIN m1 m USING (event_type)),
        |r2 AS (
        |  SELECT event_type, adev2_c,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY adev2_c, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM dv),
        |m2 AS (
        |  SELECT event_type,
        |         CAST(CASE WHEN count(*) = 1 THEN sum(adev2_c) * 2
        |              ELSE sum(adev2_c) END AS BIGINT) AS mad4_c
        |  FROM r2 WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2 GROUP BY 1)
        |SELECT m1.event_type, m1.n, m1.med2_c, m2.mad4_c
        |FROM m1 JOIN m2 USING (event_type) ORDER BY m1.event_type""".stripMargin,
  )
}
