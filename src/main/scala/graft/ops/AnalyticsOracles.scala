package graft.ops

/** DuckDB twins for [[AnalyticsOps]]. Revenue mirrors the exact
  * 10⁻⁴-dollar integer arithmetic (`round(price·100)·(100−round(disc·100))`
  * summed as BIGINT) so the aggregate — and therefore the top-N ordering —
  * is bit-identical regardless of either engine's summation order.
  */
object AnalyticsOracles {
  private val revU =
    "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100) AS BIGINT))"

  val all: Map[String, String] = Map(
    "q_top_orders" ->
      s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  o_orderpriority, n_items, rev_u, round(rev_u / 10000.0, 2) AS revenue
        |FROM (
        |  SELECT o_orderkey, o_orderdate, o_orderpriority,
        |         CAST(SUM($revU) AS BIGINT) AS rev_u, count(*) AS n_items
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |  WHERE c.c_mktsegment = 'BUILDING'
        |    AND o.o_orderdate < TIMESTAMP '1998-06-01'
        |    AND l.l_shipdate > TIMESTAMP '1998-06-01'
        |  GROUP BY 1, 2, 3)
        |ORDER BY rev_u DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q_region_volume" ->
      s"""SELECT n_name, n_items, rev_u, round(rev_u / 10000.0, 2) AS revenue
        |FROM (
        |  SELECT n.n_name, count(*) AS n_items, CAST(SUM($revU) AS BIGINT) AS rev_u
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |                 AND c.c_nationkey = s.s_nationkey
        |  JOIN nation n ON s.s_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'ASIA'
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1)
        |ORDER BY rev_u DESC, n_name ASC""".stripMargin,

    "q_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts_us) AS t_click
        |      FROM ev e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts_us > v.t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts_us) AS t_purchase
        |      FROM ev e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts_us > c.t_click GROUP BY 1)
        |SELECT count(v.t_view) AS n_view,
        |       count(c.t_click) AS n_view_click,
        |       count(p.t_purchase) AS n_view_click_purchase
        |FROM v
        |LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,

    "q_cohort_retention" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |fw AS (
        |  SELECT user_id, min(ts_us) // 604800000000 AS cohort_week
        |  FROM ev GROUP BY 1)
        |SELECT f.cohort_week,
        |       (e.ts_us // 604800000000) - f.cohort_week AS age_weeks,
        |       count(DISTINCT e.user_id) AS n_active
        |FROM ev e JOIN fw f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_data_quality" ->
      """SELECT n_rows, n_keys, n_keys = n_rows AS key_unique,
        |  n_null_cust, n_nonpos_price, n_bad_status, n_date_oob,
        |  n_null_cust + n_nonpos_price + n_bad_status + n_date_oob = 0 AS all_pass
        |FROM (
        |  SELECT count(*) AS n_rows,
        |    count(DISTINCT o_orderkey) AS n_keys,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_cust,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpos_price,
        |    CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_status,
        |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
        |                    OR o_orderdate >= TIMESTAMP '2010-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS n_date_oob
        |  FROM orders)""".stripMargin,

    "q_value_histogram" ->
      """SELECT bucket, bucket * 10.0 AS lo, (bucket + 1) * 10.0 AS hi,
        |       n_events
        |FROM (
        |  SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
        |         count(*) AS n_events
        |  FROM events GROUP BY 1)
        |ORDER BY bucket""".stripMargin,

    "q_copurchase" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
        |FROM li a JOIN li b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2
        |ORDER BY n_orders DESC, p1, p2 LIMIT 50""".stripMargin,

    "q_spend_deciles" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS spend_c
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT spend_c,
        |         ntile(10) OVER (ORDER BY spend_c DESC, o_custkey) AS decile
        |  FROM spend)
        |SELECT decile, count(*) AS n_cust,
        |       CAST(sum(spend_c) AS BIGINT) AS tot_c,
        |       min(spend_c) AS min_c, max(spend_c) AS max_c
        |FROM ranked GROUP BY 1 ORDER BY decile""".stripMargin,

    // Independent formulation: quadratic NOT-EXISTS dominance test over
    // the customer aggregate (fine at oracle SF; the Spark side is the
    // linear window form).
    "q_skyline" ->
      """WITH agg AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS spend_c,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey, spend_c, n_orders
        |FROM agg a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM agg b
        |  WHERE b.spend_c >= a.spend_c AND b.n_orders >= a.n_orders
        |    AND (b.spend_c > a.spend_c OR b.n_orders > a.n_orders))
        |ORDER BY spend_c DESC, o_custkey""".stripMargin,

    "q_group_size_dist" ->
      """SELECT k, count(*) AS n_orders FROM (
        |  SELECT l_orderkey, count(*) AS k FROM lineitem GROUP BY 1)
        |GROUP BY k ORDER BY k""".stripMargin,

    "q_wow_change" ->
      """WITH wk AS (
        |  SELECT event_type, epoch_us(ts) // 604800000000 AS week,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, wb, n, prev_n, n - prev_n AS delta FROM (
        |  SELECT event_type, week * 604800000000 AS wb, n,
        |         lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
        |  FROM wk)
        |WHERE prev_n IS NOT NULL ORDER BY event_type, wb""".stripMargin,

    "q_mode" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, max(n) AS n_mode FROM c GROUP BY 1)
        |SELECT c.event_type, m.n_mode, min(c.user_id) AS mode_user
        |FROM c JOIN m ON c.event_type = m.event_type AND c.n = m.n_mode
        |GROUP BY c.event_type, m.n_mode ORDER BY c.event_type""".stripMargin,

    "q_string_agg" ->
      """SELECT lang,
        |       string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
        |       count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_type_bitmask" ->
      """WITH b AS (
        |  SELECT user_id,
        |         CASE event_type WHEN 'signup' THEN 1 WHEN 'view' THEN 2
        |              WHEN 'click' THEN 4 WHEN 'purchase' THEN 8
        |              ELSE 16 END AS bit
        |  FROM events),
        |m AS (SELECT user_id, bit_or(bit) AS mask FROM b GROUP BY 1)
        |SELECT mask, count(*) AS n_users FROM m
        |GROUP BY mask ORDER BY mask""".stripMargin,

    "q_trend_slope" ->
      """WITH wk AS (
        |  SELECT event_type, epoch_us(ts) // 604800000000 AS x,
        |         count(*) AS y
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_weeks,
        |       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
        |         AS slope_num,
        |       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
        |         AS slope_den
        |FROM wk GROUP BY event_type ORDER BY event_type""".stripMargin,

    // NTILE(5) windows replicate the closed-form distributed-rank
    // quintiles exactly (ties broken on custkey in both engines).
    "q_rfm_segments" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |         max(epoch_us(o_orderdate) // 86400000000) AS last_day,
        |         count(*) AS freq,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS spend_c
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT spend_c,
        |         ntile(5) OVER (ORDER BY last_day DESC, o_custkey) AS r_score,
        |         ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f_score,
        |         ntile(5) OVER (ORDER BY spend_c DESC, o_custkey) AS m_score
        |  FROM cust)
        |SELECT r_score, f_score, m_score, count(*) AS n_cust,
        |       CAST(sum(spend_c) AS BIGINT) AS tot_c
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
        |            FROM lineitem),
        |nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM li),
        |ic AS (SELECT item, count(*) AS c1 FROM li GROUP BY 1),
        |cap AS (SELECT basket, item FROM (
        |          SELECT basket, item,
        |                 row_number() OVER (PARTITION BY basket ORDER BY item) AS bn
        |          FROM li) WHERE bn <= 64),
        |pr AS (
        |  SELECT a.item AS p1, b.item AS p2, count(*) AS c12
        |  FROM cap a JOIN cap b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |d AS (SELECT p1 AS ante, p2 AS cons, c12 FROM pr
        |      UNION ALL SELECT p2, p1, c12 FROM pr)
        |SELECT ante, cons, c12, ca.c1 AS c_ante, cc.c1 AS c_cons,
        |       c12 * 1000000 // ca.c1 AS conf_ppm,
        |       (c12 * 1000000 // ca.c1) * n_baskets // cc.c1 AS lift_ppm
        |FROM d JOIN ic ca ON d.ante = ca.item
        |       JOIN ic cc ON d.cons = cc.item
        |CROSS JOIN nb
        |ORDER BY conf_ppm DESC, lift_ppm DESC, ante, cons LIMIT 100""".stripMargin,

    // Mirrors AnalyticsOps.qNegSamples: md5-surrogate candidates, kept if
    // the part exists and the customer never bought it.
    "q_neg_samples" ->
      """WITH pos AS (
        |  SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |mx AS (SELECT max(p_partkey) AS maxp FROM part),
        |u AS (SELECT DISTINCT user_id FROM pos),
        |s AS (SELECT user_id, unnest(generate_series(0, 7)) AS slot FROM u),
        |cand AS (
        |  SELECT user_id, slot,
        |         1 + CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) ||
        |             ':' || CAST(slot AS VARCHAR)), 1, 15)) AS BIGINT)
        |             % maxp AS item
        |  FROM s CROSS JOIN mx)
        |SELECT c.user_id, c.slot, c.item
        |FROM cand c
        |WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.item)
        |  AND NOT EXISTS (SELECT 1 FROM pos
        |                  WHERE pos.user_id = c.user_id AND pos.item = c.item)
        |ORDER BY c.user_id, c.slot""".stripMargin,

    "q_gini_spend" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           AS spend_c
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT spend_c,
        |         row_number() OVER (ORDER BY spend_c, o_custkey) AS rk,
        |         count(*) OVER () AS n
        |  FROM spend)
        |SELECT count(*) AS n_cust,
        |       CAST(sum(spend_c) AS BIGINT) AS tot_c,
        |       CAST(sum((2*rk - n - 1) * spend_c) AS BIGINT) AS gini_num,
        |       CAST(count(*) * sum(spend_c) AS BIGINT) AS gini_den,
        |       CAST(sum((2*rk - n - 1) * spend_c) AS BIGINT) //
        |         greatest(CAST(count(*) * sum(spend_c) AS BIGINT) // 1000000,
        |                  1) AS gini_ppm
        |FROM r""".stripMargin,

    "q_benford" ->
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |g AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
        |         count(*) AS n
        |  FROM c WHERE cents > 0 GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM g)
        |SELECT digit, n, n * 1000000 // n_tot AS ppm
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,

    // Mirrors AnalyticsOps.qKAnonymity: QI = (nation, segment), sensitive
    // = coarse acctbal bucket; exact-integer flags at k=5 / l=3.
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |       count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS l,
        |       CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS k_ok,
        |       CASE WHEN count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 3
        |            THEN 1 ELSE 0 END AS l_ok
        |FROM customer GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Mirrors AnalyticsOps.qAnonymizeSuppress: groups under k=5 get both
    // quasi-identifiers suppressed to '*', then the output re-audits.
    "q_anonymize_suppress" ->
      """WITH sizes AS (
        |  SELECT c_nationkey, c_mktsegment, count(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |s AS (
        |  SELECT c.c_custkey,
        |         CASE WHEN n >= 5 THEN c.c_nationkey::VARCHAR ELSE '*' END AS nation_out,
        |         CASE WHEN n >= 5 THEN c.c_mktsegment ELSE '*' END AS segment_out
        |  FROM customer c JOIN sizes USING (c_nationkey, c_mktsegment))
        |SELECT nation_out, segment_out, count(*) AS n_out,
        |       min(c_custkey) AS min_key
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The O(full) recompute the O(delta) incremental merge must equal.
    "q_incr_agg" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
        |       min(CAST(round(value * 100) AS BIGINT)) AS min_c,
        |       max(CAST(round(value * 100) AS BIGINT)) AS max_c
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
  )
}
