package graft.ops

/** DuckDB oracles for [[SourceSinkOps]]. The CSV/text queries are
  * round-trips on the Spark side; the oracle computes the same aggregate
  * straight from the parquet fixture — equality proves the encode/decode
  * path is lossless.
  */
object SourceSinkOracles {
  /** Must stay in sync with FlightOracles.F / the report expression. */
  private val REPORT =
    """WITH f AS (
      |  SELECT event_type AS carrier, year(ts) AS y, month(ts) AS m,
      |         value AS delay,
      |         CAST(json_extract_string(props, '$.k') AS INT) AS k
      |  FROM events
      |), s AS (
      |  SELECT * FROM f WHERE y = 2024 AND k % 7 <> 0 AND k % 11 <> 0
      |), a AS (
      |  SELECT carrier, m, CAST(FLOOR(AVG(delay)) + 1 AS INT) AS d
      |  FROM s GROUP BY carrier, m
      |), p AS (
      |  SELECT carrier, """.stripMargin +
      (1 to 12).map(m => s"COALESCE(MAX(CASE WHEN m = $m THEN d END), 0) AS m$m")
        .mkString(", ") +
      """ FROM a GROUP BY carrier
      |), lines AS (
      |  SELECT 'AIR-' || carrier || chr(9) || """.stripMargin +
      (1 to 12).map(m => s"printf(', ($m,%d)', m$m)").mkString(" || ") +
      """ AS line FROM p
      |)""".stripMargin

  val all: Map[String, String] = Map(
    // Federated CSV/JSON/parquet join: the text-format round trips are
    // lossless (integer keys, plain strings), so the oracle reads the
    // original parquet tables directly.
    // Managed-table round trip is lossless; aggregate the base directly.
    "q_managed_table" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_c
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // The SQL-text front-end twin: identical aggregate in DuckDB SQL.
    "q_sql_surface" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(CAST(round(len(list_distinct(string_split(text, ' '))) * 1000000
        |                / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS BIGINT)) AS BIGINT) AS ttr_micro
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_federated_join" ->
      """SELECT c_mktsegment, count(*) AS n_items,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |           (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_u
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_csv_ingest" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // JSON round-trip preserves values exactly → same parquet-direct oracle.
    "q_json_ingest" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Mirrors SourceSinkOps.qCsvMalformed: the corrupt set is exactly
    // the rows we made unparseable (event_id ≡ 3 mod 50), so the oracle
    // derives both sides straight from the fixture.
    "q_csv_malformed" ->
      """SELECT
        |  CAST(sum(CASE WHEN event_id % 50 <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
        |  CAST(sum(CASE WHEN event_id % 50 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
        |  CAST(sum(CASE WHEN event_id % 50 <> 3 THEN event_id END) AS BIGINT) AS good_id_sum,
        |  CAST(sum(CASE WHEN event_id % 50 <> 3
        |                THEN CAST(round(value * 100) AS BIGINT) END) AS BIGINT) AS good_value_centi,
        |  CAST(sum(CASE WHEN event_id % 50 = 3 THEN event_id END) AS BIGINT) AS corrupt_id_sum
        |FROM events""".stripMargin,

    // Mirrors SourceSinkOps.qSchemaEvolution: even ids were written
    // without `score` (the legacy half → NULL after mergeSchema), odd
    // ids carry score = value * 2.
    "q_schema_evolution" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_centi,
        |       CAST(sum(CASE WHEN event_id % 2 = 1
        |                     THEN CAST(round(value * 2 * 100) AS BIGINT)
        |                     ELSE 0 END) AS BIGINT) AS score_centi
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // ORC round-trip is lossless, so the oracle aggregates the original
    // parquet fixture directly.
    "q_orc_ingest" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(event_id) AS BIGINT) AS id_sum,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_centi,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_text_report" ->
      s"""$REPORT
         |SELECT count(*) AS n_lines, CAST(sum(length(line)) AS BIGINT) AS total_chars,
         |       min(substr(line, 1, 10)) AS first_prefix
         |FROM lines""".stripMargin,

    // Wide positional CSV path must equal the parquet-path flagship.
    "q_wide_csv_report" -> FlightOracles.all("q_flight_report"),

    "q_keyed_lookup" ->
      """SELECT md5(CAST(event_id AS VARCHAR)) AS row_key,
        |       event_id, event_type, value
        |FROM events WHERE event_id IN (10, 20, 30, 40, 50)
        |ORDER BY event_id""".stripMargin,

    // Mirrors SourceSinkOps.qKeyedSecondaryIndex: the index-served
    // equality query equals the relational filter AFTER the dual-write
    // flip of the lowest non-purchase event to 'purchase'.
    "q_keyed_secondary_index" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |m AS (SELECT min(event_id) AS mid FROM ev WHERE event_type <> 'purchase')
        |SELECT event_id,
        |       CASE WHEN event_id = mid THEN 'purchase' ELSE event_type END
        |         AS event_type,
        |       value_c
        |FROM ev, m
        |WHERE event_type = 'purchase' OR event_id = mid
        |ORDER BY event_id""".stripMargin,

    // Mirrors SourceSinkOps.qKeyedTtl: survivors at or past the midpoint
    // cutoff, plus the expired count; both engines floor the midpoint
    // (Scala Long / and DuckDB // agree on positive operands).
    "q_keyed_ttl" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS value_c
        |  FROM events),
        |c AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS cutoff FROM ev)
        |SELECT event_type, count(*) AS n_rows,
        |       CAST(min(ts_us) AS BIGINT) AS min_ts_us,
        |       CAST(sum(value_c) AS BIGINT) AS sum_value_c,
        |       (SELECT CAST(count(*) AS BIGINT) FROM ev, c WHERE ts_us < cutoff)
        |         AS n_expired
        |FROM ev, c WHERE ts_us >= cutoff
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Bloom pruning is IO-only: the GET must equal the plain IN filter
    // (absent probes match nothing).
    "q_keyed_bloom" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_orderkey IN (100, 2000, 5000, 10000100, 10002000, 10005000)
        |ORDER BY o_orderkey""".stripMargin,

    // The join-based multiGet must equal the plain modular predicate
    // (the two +10M probe keys are absent).
    "q_keyed_multiget" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderkey""".stripMargin,

    // Timestamp resolution is version-deterministic: the instant between
    // init and commit reads v1 (base), "now" reads v2 (every %3 key's
    // cents bumped by 111).
    "q_time_travel_ts" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT 1 AS version, count(*) AS n_rows,
        |       CAST(sum(cents) AS BIGINT) AS tot_c FROM base
        |UNION ALL
        |SELECT 2, count(*),
        |       CAST(sum(CASE WHEN k % 3 = 0 THEN cents + 111 ELSE cents END)
        |            AS BIGINT)
        |FROM base
        |ORDER BY version""".stripMargin,

    // The rule-pruned SQL path must equal the plain predicate over the
    // base table (pruning is value-neutral; 10000042 is absent).
    "q_sql_keyed_pushdown" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE (o_orderkey BETWEEN 2000 AND 2200)
        |   OR o_orderkey IN (42, 10000042)
        |ORDER BY o_orderkey""".stripMargin,

    // The join-rewrite-pruned SQL path must equal the plain join over
    // the base tables (the rewrite is value-neutral).
    "q_sql_keyed_join" ->
      """SELECT o.o_orderkey, o.o_orderstatus,
        |       round(o.o_totalprice, 2) AS price
        |FROM orders o
        |JOIN (SELECT DISTINCT l_orderkey FROM lineitem
        |      WHERE l_orderkey % 5 = 0 AND l_orderkey <= 1500) p
        |  ON o.o_orderkey = p.l_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    // The region-pruned range scan must equal the plain range predicate.
    "q_keyed_range" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey BETWEEN 5000 AND 6000
        |ORDER BY o_orderkey""".stripMargin,

    "q_skew_salted_agg" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // The salt is join-semantics-neutral: the oracle is the unsalted join.
    "q_skew_salted_join" ->
      """WITH dim AS (SELECT user_id, count(*) AS user_n FROM events GROUP BY user_id)
        |SELECT e.event_type, count(*) AS n_events,
        |       CAST(sum(d.user_n) AS BIGINT) AS sum_user_n
        |FROM events e JOIN dim d USING (user_id)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // The AQE skew split is plan-level only: the oracle is the plain
    // join over the same derived key.
    "q_skew_aqe_join" ->
      """WITH fact AS (
        |  SELECT event_type, value,
        |         CASE WHEN user_id % 8 <> 0 THEN 0 ELSE user_id % 1000 END AS skew_key
        |  FROM events),
        |dim AS (SELECT skew_key, count(*) AS key_n FROM fact GROUP BY skew_key)
        |SELECT f.event_type, count(*) AS n,
        |       CAST(sum(d.key_n) AS BIGINT) AS sum_key_n,
        |       CAST(sum(CAST(round(f.value * 100) AS BIGINT)) AS BIGINT) AS value_centi
        |FROM fact f JOIN dim d USING (skew_key)
        |GROUP BY f.event_type ORDER BY f.event_type""".stripMargin,

    // Bucketing is a layout optimization: the co-located SMJ must equal
    // the plain join.
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_centi
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Mirrors SourceSinkOps.qUpsert: untouched base survives, updates
    // replace, inserts append, deletes vanish.
    "q_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |chg AS (
        |  SELECT o_orderkey, 'U' AS op, o_orderstatus,
        |         o_totalprice + 50.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 100 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 100 = 7
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'I', 'N', o_totalprice
        |  FROM base WHERE o_orderkey % 100 = 13
        |)
        |SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price FROM (
        |  SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice FROM base b
        |  WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM chg)
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM chg WHERE op <> 'D'
        |) ORDER BY o_orderkey""".stripMargin,

    // Partition-pruned read equals the plain filtered aggregate (the
    // pruning is a layout optimization, not a semantic change).
    "q_partition_prune" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Compaction invariant: 64 fragments → 4 files with content preserved
    // (row count + exact integer checksums straight from the fixture).
    "q_compact" ->
      """SELECT 64 AS n_files_before, 4 AS n_files_after,
        |       count(*) AS n_rows,
        |       CAST(sum(event_id) AS BIGINT) AS id_sum,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_centi
        |FROM events WHERE event_id % 10 = 0""".stripMargin,

    // In-flight CollectMetrics must equal the batch aggregates.
    "q_observe_metrics" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_centi,
        |       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_clicks
        |FROM events""".stripMargin,

    // ANALYZE TABLE row count is exact; size stats existence is pinned.
    "q_cbo_stats" ->
      """SELECT count(*) AS row_count, true AS has_size_stats
        |FROM orders""".stripMargin,

    // The bloom filter is plan-level row pruning; the oracle is the
    // plain selective join.
    "q_bloom_prune" ->
      """SELECT o.o_orderpriority,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_centi
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 400000.0
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,

    // Size-threshold compaction: 2 right-sized + 48 fragments → only the
    // fragments rewritten (into 1 file; 10% of rows vs a 45% target), the
    // 2 untouched files carried over, content checksums unchanged.
    "q_compact_sized" ->
      """SELECT 50 AS n_files_before, 2 AS n_untouched, 3 AS n_files_after,
        |       count(*) AS n_rows,
        |       CAST(sum(event_id) AS BIGINT) AS id_sum,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_centi
        |FROM events""".stripMargin,

    // DPP is a scan optimization; the oracle is the plain join with the
    // same above-average-frequency dimension predicate (exact integer
    // compare: n_type * 5 > total).
    "q_dpp_prune" ->
      """WITH dim AS (SELECT event_type, count(*) AS n_type FROM events GROUP BY 1),
        |tot AS (SELECT count(*) AS n_total FROM events)
        |SELECT e.event_type, count(*) AS n,
        |       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_centi
        |FROM events e JOIN dim d USING (event_type) CROSS JOIN tot
        |WHERE d.n_type * 5 > tot.n_total
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // Mirrors SourceSinkOps.qZorderKey: bit interleave as a sum over bit
    // positions (both engines use arithmetic shifts on BIGINT). Both
    // dimensions get the same sign normalization as Spark's pmod, so the
    // twin holds for any fixture (negative keys included).
    "q_zorder_key" ->
      """WITH b AS (
        |  SELECT event_id, ((user_id % 1024) + 1024) % 1024 AS u,
        |         ((CAST(floor(value) AS BIGINT) % 1024) + 1024) % 1024 AS w
        |  FROM events WHERE event_id < 200
        |)
        |SELECT b.event_id, b.u, b.w,
        |       CAST(SUM((((b.u >> t.j) & 1) << (2 * t.j)) +
        |                (((b.w >> t.j) & 1) << (2 * t.j + 1))) AS BIGINT) AS z
        |FROM b, generate_series(0, 20) t(j)
        |GROUP BY b.event_id, b.u, b.w
        |ORDER BY b.event_id""".stripMargin,

    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY status, priority""".stripMargin,

    // Mirrors SourceSinkOps.qTimeTravel: v1 = the base slice; v2 = the
    // U/I/D change set applied (k%3=0 updated +111, k%3=1 deleted,
    // k%3=2 untouched plus a k+1 insert at +7).
    // File-skipped point-GET at v2 must equal the recomputed v2 filtered
    // to the probes (routing is value-neutral; 10 is deleted in v2,
    // 10000005 absent everywhere).
    "q_time_travel_get" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |v2 AS (
        |  SELECT k, cents + 111 AS cents FROM base WHERE k % 3 = 0
        |  UNION ALL SELECT k, cents FROM base WHERE k % 3 = 2
        |  UNION ALL SELECT k + 1, cents + 7 FROM base WHERE k % 3 = 2)
        |SELECT k AS o_orderkey, CAST(cents AS BIGINT) AS cents FROM v2
        |WHERE k IN (5, 6, 10, 15, 10000005)
        |ORDER BY o_orderkey, cents""".stripMargin,

    "q_time_travel" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |v2 AS (
        |  SELECT k, cents + 111 AS cents FROM base WHERE k % 3 = 0
        |  UNION ALL SELECT k, cents FROM base WHERE k % 3 = 2
        |  UNION ALL SELECT k + 1, cents + 7 FROM base WHERE k % 3 = 2)
        |SELECT 1 AS version, count(*) AS n_rows,
        |       count(DISTINCT k) AS n_keys,
        |       CAST(sum(cents) AS BIGINT) AS tot_c
        |FROM base
        |UNION ALL
        |SELECT 2, count(*), count(DISTINCT k), CAST(sum(cents) AS BIGINT)
        |FROM v2
        |ORDER BY version""".stripMargin,

    // Mirrors SourceSinkOps.qVstoreRestore: v3 = restore-to-v1, so its
    // summary row repeats v1's; version 99 is the v3-vs-v1 symmetric
    // difference, zero by construction.
    "q_vstore_restore" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |v2 AS (
        |  SELECT k, cents + 111 AS cents FROM base WHERE k % 3 = 0
        |  UNION ALL SELECT k, cents FROM base WHERE k % 3 = 2
        |  UNION ALL SELECT k + 1, cents + 7 FROM base WHERE k % 3 = 2)
        |SELECT 1 AS version, count(*) AS n_rows,
        |       count(DISTINCT k) AS n_keys, CAST(sum(cents) AS BIGINT) AS tot_c
        |FROM base
        |UNION ALL
        |SELECT 2, count(*), count(DISTINCT k), CAST(sum(cents) AS BIGINT) FROM v2
        |UNION ALL
        |SELECT 3, count(*), count(DISTINCT k), CAST(sum(cents) AS BIGINT) FROM base
        |UNION ALL
        |SELECT 99, 0, 0, 0
        |ORDER BY version""".stripMargin,

    // Mirrors SourceSinkOps.qSnapshotDiff over the same two snapshots.
    "q_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT 'added' AS change_type, count(*) AS n,
        |       CAST(sum(cents + 7) AS BIGINT) AS delta_c
        |FROM base WHERE k % 3 = 2
        |UNION ALL
        |SELECT 'removed', count(*), CAST(-sum(cents) AS BIGINT)
        |FROM base WHERE k % 3 = 1
        |UNION ALL
        |SELECT 'unchanged', count(*), 0 FROM base WHERE k % 3 = 2
        |UNION ALL
        |SELECT 'updated', count(*), CAST(count(*) * 111 AS BIGINT)
        |FROM base WHERE k % 3 = 0
        |ORDER BY change_type""".stripMargin,

    // Mirrors SourceSinkOps.qIncrViewCdc: the incrementally maintained
    // per-bucket view at v2 must equal the from-scratch v2 aggregate.
    "q_incr_view_cdc" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |v2 AS (
        |  SELECT k, cents + 111 AS cents FROM base WHERE k % 3 = 0
        |  UNION ALL SELECT k, cents FROM base WHERE k % 3 = 2
        |  UNION ALL SELECT k + 1, cents + 7 FROM base WHERE k % 3 = 2)
        |SELECT k % 10 AS bucket, count(*) AS n_orders,
        |       CAST(sum(cents) AS BIGINT) AS tot_c
        |FROM v2 GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Mirrors SourceSinkOps.qVstoreCompact: keys %5=0 minus the deleted
    // (k div 5) % 5 != 0 — the SAME summary must hold at v2 (pre-compact)
    // and v3 (post-compact), because compaction repacks files without
    // touching a single row.
    "q_vstore_compact" ->
      """WITH kept AS (
        |  SELECT o_orderkey AS k,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |  WHERE o_orderkey % 200 = 0 AND (o_orderkey // 200) % 5 = 0)
        |SELECT v.version, count(*) AS n_rows,
        |       count(DISTINCT k) AS n_keys,
        |       CAST(sum(cents) AS BIGINT) AS tot_c
        |FROM kept CROSS JOIN (VALUES (2), (3)) AS v(version)
        |GROUP BY v.version ORDER BY version""".stripMargin,
  )
}
