package graft.ops

/** DuckDB oracle SQL mirroring [[RelationalOps]] exactly: same column
  * names/aliases, same rounding, same deterministic ordering and
  * tie-breaks, 'ALL' sentinels instead of rollup/cube nulls.
  */
object RelationalOracles {
  val all: Map[String, String] = Map(
    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS n_items,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_join_sortmerge" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |       round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_range" ->
      """WITH bands(band_id, lo, hi) AS (
        |  VALUES (1, 0.0, 10.0), (2, 10.0, 20.0), (3, 20.0, 30.0),
        |         (4, 30.0, 40.0), (5, 40.0, 50.0))
        |SELECT band_id, count(*) AS n_items,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN bands ON l_quantity > lo AND l_quantity <= hi
        |GROUP BY band_id ORDER BY band_id""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_topk_custom" ->
      """SELECT o_custkey, o_orderkey, price FROM (
        |  SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, price DESC, o_orderkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  round(coalesce(lag(o_totalprice, 1) OVER w, -1.0), 2) AS prev_price,
        |  round(coalesce(lead(o_totalprice, 1) OVER w, -1.0), 2) AS next_price,
        |  rank() OVER wp AS price_rank,
        |  dense_rank() OVER wp AS price_dense_rank,
        |  ntile(4) OVER wp AS price_quartile,
        |  round(percent_rank() OVER wp, 6) AS price_pct_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
        |       wp AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_customers, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region, nation""".stripMargin,

    "q_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin,

    "q_set_ops" ->
      """WITH rich AS (SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000),
        |     fin AS (SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F')
        |SELECT 'union' AS op, key FROM (SELECT key FROM rich UNION SELECT key FROM fin)
        |UNION ALL
        |SELECT 'intersect' AS op, key FROM (SELECT key FROM rich INTERSECT SELECT key FROM fin)
        |UNION ALL
        |SELECT 'except' AS op, key FROM (SELECT key FROM rich EXCEPT SELECT key FROM fin)
        |ORDER BY op, key""".stripMargin,

    "q_set_ops_all" ->
      """WITH open AS (SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'),
        |     hp AS (SELECT o_custkey AS key FROM orders WHERE o_orderpriority = '1-URGENT'),
        |     tagged AS (
        |       SELECT 'except_all' AS op, key FROM (SELECT key FROM open EXCEPT ALL SELECT key FROM hp)
        |       UNION ALL
        |       SELECT 'intersect_all' AS op, key FROM (SELECT key FROM open INTERSECT ALL SELECT key FROM hp))
        |SELECT op, key, count(*) AS n FROM tagged GROUP BY op, key
        |ORDER BY op, key""".stripMargin,

    "q_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_extendedprice' AS measure, l_extendedprice AS value FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |SELECT measure, count(*) AS n, round(sum(value), 2) AS total
        |FROM m GROUP BY measure ORDER BY measure""".stripMargin,

    // Mirrors RelationalOps.qPivot: explicit-value pivot == conditional
    // aggregation over one scan; empty cells stay NULL on both engines.
    "q_pivot" ->
      """WITH o AS (
        |  SELECT o_orderpriority, o_orderstatus,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN cents END) AS BIGINT) AS f_cents,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN cents END) AS BIGINT) AS o_cents,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN cents END) AS BIGINT) AS p_cents
        |FROM o GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "q_scalar_string_math" ->
      """SELECT p_partkey,
        |  upper(p_name) AS name_upper,
        |  substr(p_name, 1, 5) AS name_prefix,
        |  length(p_name) AS name_len,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
        |  abs(p_size - 25) AS size_dist,
        |  round(sqrt(p_retailprice), 6) AS price_sqrt,
        |  round(ln(p_retailprice), 6) AS price_ln,
        |  CAST(pow(p_size, 2) AS BIGINT) AS size_sq,
        |  CASE WHEN p_size % 2 = 0 THEN 'even' ELSE 'odd' END AS size_parity
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_scalar_date" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  quarter(o_orderdate) AS q,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_before_2002,
        |  strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        |       count(*) AS n, round(sum(value), 2) AS sum_value,
        |       round(avg(value), 2) AS avg_value
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,

    "q_array_funcs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tokens,
        |  len(list_distinct(toks)) AS n_distinct,
        |  array_to_string(toks[1:3], ' ') AS first3,
        |  list_contains(toks, 'spark') AS has_spark,
        |  list_sort(toks)[1] AS min_token
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_join_outer" ->
      """SELECT coalesce(c_mktsegment, 'NO_CUSTOMER') AS segment,
        |  count(o_orderkey) AS n_orders,
        |  count(DISTINCT c_custkey) AS n_customers,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customers_no_orders
        |FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 2) AS avg_disc,
        |  count(*) AS n_items
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // Sketch-accuracy invariant: the oracle pins exact values + true
    // flags; Spark's HLL++/approx-percentile must stay within ±5%.
    "q_sketch_accuracy" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |       true AS hll_within_5pct,
        |       round(quantile_cont(value, 0.5)::DOUBLE, 2) AS median,
        |       true AS pctl_within_5pct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Three-valued-logic twin: DuckDB's IS NOT DISTINCT FROM is Spark's
    // null-safe <=>; the rest is shared ANSI semantics.
    "q_null_semantics" ->
      """WITH o AS (
        |  SELECT CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |              ELSE o_totalprice END AS nullable, o_orderstatus
        |  FROM orders)
        |SELECT count(*) AS n_rows,
        |  count(nullable) AS n_nonnull,
        |  round(sum(nullable), 2) AS sum_skipna,
        |  round(avg(nullable), 2) AS avg_skipna,
        |  round(min(nullable), 2) AS min_skipna,
        |  round(max(nullable), 2) AS max_skipna,
        |  count(DISTINCT o_orderstatus) AS n_status,
        |  CAST(sum(CASE WHEN nullable = nullable THEN 1 ELSE 0 END) AS BIGINT) AS n_eq_self,
        |  CAST(sum(CASE WHEN nullable IS NOT DISTINCT FROM nullable THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_self,
        |  CAST(sum(CASE WHEN nullable IN (1.0, 2.0) THEN 1 ELSE 0 END) AS BIGINT) AS n_in_list,
        |  CAST(sum(CASE WHEN coalesce(nullable, -1.0) = -1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesced
        |FROM o""".stripMargin,

    "q_stats_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(stddev_samp(l_quantity), 6) AS qty_stddev,
        |  round(var_samp(l_quantity), 6) AS qty_var,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_covar,
        |  round(quantile_cont(l_extendedprice, 0.5)::DOUBLE, 6) AS price_median
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_group_having" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 15
        |ORDER BY o_custkey""".stripMargin,
  )
}
