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
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
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

  /** Streaming deduplication: drop duplicate event_ids within the
    * watermark horizon — the streaming form of exact dedup (state store
    * keeps one key per id, expired by the watermark at scale).
    */
  def dedupedCounts(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))

  final case class Session(user_id: Long, start_us: Long, end_us: Long, n: Long)

  /** Custom sessionization via flatMapGroupsWithState: event-time sessions
    * with a 1-hour gap, emitted when the watermark passes the session end
    * (same semantics as EventOps.qEventsSession's session_window).
    */
  def userSessions(spark: SparkSession, dir: String): Dataset[Session] = {
    import spark.implicits._
    val GapUs = 3600000000L
    // The watermarked ts column must reach the stateful operator; convert
    // to micros inside the function (Instant keeps microsecond precision).
    eventsStream(spark, dir)
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as[Long], col("ts").as[java.time.Instant])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rowsI: Iterator[(Long, java.time.Instant)], state: GroupState[Session]) =>
          val rows = rowsI.map { case (u, i) =>
            (u, i.getEpochSecond * 1000000L + i.getNano / 1000L)
          }
          // A session closed by a newer one emits immediately; only the
          // open tail session waits in state (flushed by event-time
          // timeout once the watermark passes it).
          if (state.hasTimedOut) {
            val out = state.getOption.iterator
            state.remove()
            out
          } else {
            val sorted = rows.map(_._2).toList.sorted
            var open = state.getOption
            val closed = List.newBuilder[Session]
            sorted.foreach { t =>
              open match {
                case Some(s) if t < s.end_us + GapUs =>
                  open = Some(s.copy(end_us = math.max(s.end_us, t), n = s.n + 1))
                case Some(s) =>
                  closed += s
                  open = Some(Session(uid, t, t, 1L))
                case None =>
                  open = Some(Session(uid, t, t, 1L))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_us / 1000 + GapUs / 1000)
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-static join: enrich the event stream with a static per-user
    * profile (historical mean value computed batch-side). The static side
    * is broadcast into every micro-batch — the standard dimension-
    * enrichment shape of an ingest pipeline.
    */
  def enrichedCounts(spark: SparkSession, dir: String): DataFrame = {
    val profile = graft.Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(avg(col("value")).as("user_mean"))
    eventsStream(spark, dir)
      .join(broadcast(profile), Seq("user_id"))
      .withColumn("above_mean", col("value") > col("user_mean"))
      .groupBy(col("event_type"), col("above_mean"))
      .agg(count(lit(1)).as("n"))
  }

  /** Streaming corpus ingest — the text layer's hygiene stages running
    * incrementally: quality-score each arriving document, drop exact
    * duplicates by content digest (state-store keyed dedup, the streaming
    * form of DedupOps.exactDedup), aggregate per language. At scale this
    * is how a crawl feed enters the pipeline: stateless projections stay
    * stateless, and only the digest key lives in state.
    */
  def docQualityCounts(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val docs = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    docQualityCountsOf(docs)
  }

  /** Shape shared by the stream and its batch twin (StreamingSpec). */
  def docQualityCountsOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .dropDuplicates("digest")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("quality",
        size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), round(sum(col("quality")), 4).as("sum_q"))

  /** Per-language corpus-ingest statistics — the aggregate shared by the
    * stream and its batch twin (which is also the DuckDB oracle form, so
    * the streaming path is driver-correctness-checked end to end). All
    * measures are exact integers (count, micro-unit quality sum, char
    * sum) — order-independent, so the incremental computation is
    * hash-identical to the batch one.
    */
  def ingestStatsOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .dropDuplicates("digest")
      .withColumn("toks", split(col("text"), " "))
      .withColumn("quality",
        size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(expr("cast(round(quality * 1000000) as bigint)")).as("q_micro"),
           sum(col("n_chars")).as("total_chars"))

  /** Driver-checked streaming row: drain the corpus-ingest stream with
    * Trigger.AvailableNow into a memory sink, return the drained table —
    * the oracle is the batch-twin SQL, so CORRECTNESS covers streaming
    * (not just the StreamingSpec equivalence tests). Complete output
    * mode: the memory sink holds exactly the final aggregate state.
    *
    * Determinism caveat: dropDuplicates keeps the FIRST arrival per
    * digest (standard streaming dedup semantics); that choice is only
    * observable if content-identical docs carry conflicting lang labels.
    * The sf0.01 gate fixture has zero duplicate texts (500 distinct
    * digests, verified), so stream, batch twin, and oracle agree
    * exactly; at sf0.1 seven label-conflicted dup pairs exist as fixture
    * noise (bench-only, values unchecked there).
    */
  def qStreamIngest(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val docs = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    // State-store count is fixed by shuffle partitions at the stream's
    // first start: size it to the stream's volume, not the batch
    // session's width (two stateful operators × N partitions of
    // checkpoint IO per micro-batch dominate a small drain; a real
    // deployment sizes this to peak keys/sec). Restored right after the
    // drain — batch queries plan lazily and never see the override.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try runToMemory(spark, ingestStatsOf(docs), "graft_stream_ingest")
      .orderBy(col("lang"))
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Exact-integer tumbling-window stats — the shape shared by the stream
    * and its batch twin (= the DuckDB oracle). `value` is summed in
    * centi-units so the incremental aggregation is order-independent and
    * hash-identical to batch.
    */
  def windowStatsOf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(expr("cast(round(value * 100) as bigint)")).as("value_c"))
      .select(unix_micros(col("w.start")).as("ws"), col("event_type"),
              col("n"), col("value_c"))

  /** Second driver-checked streaming row: watermarked tumbling-window
    * aggregation drained with AvailableNow — the windowed-state path of
    * the streaming engine (the ingest row covers keyed-dedup state).
    * Complete mode: the sink holds the final state of every window, which
    * for a bounded drain equals the batch aggregate exactly.
    */
  def qStreamWindow(spark: SparkSession, dir: String): DataFrame = {
    val st = eventsStream(spark, dir).withWatermark("ts", "2 hours")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try runToMemory(spark, windowStatsOf(st), "graft_stream_window")
      .orderBy(col("ws"), col("event_type"))
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Third driver-checked streaming row — stream-STREAM interval join:
    * click events matched to error events of the same user within ±30
    * minutes of EVENT time. Exercises two-sided join state (each side
    * buffers rows until the other side's watermark passes the interval
    * bound — the state shape the windowed/keyed rows don't cover). The
    * drained append output is aggregated in batch with exact-integer
    * checksums; the oracle is the equivalent batch interval join.
    */
  def qStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val clicks = eventsStream(spark, dir)
      .filter(col("event_type") === "click")
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("c_id"))
    val errors = eventsStream(spark, dir)
      .filter(col("event_type") === "error")
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
              col("event_id").as("e_id"))
    val joined = clicks.join(errors, expr(
      "c_user = e_user AND " +
        "e_ts >= c_ts - interval 30 minutes AND " +
        "e_ts <= c_ts + interval 30 minutes"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try runToMemory(spark,
        joined.select(col("c_user").as("user_id"), col("c_id"), col("e_id")),
        "graft_stream_join", OutputMode.Append())
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
           sum(col("c_id") + col("e_id")).as("id_sum"))
      .orderBy(col("user_id"))
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Fourth driver-checked streaming row — custom keyed state
    * (flatMapGroupsWithState sessionization, the one stateful-operator
    * class the other three rows don't cover). The AvailableNow drain
    * emits (a) every session closed by a newer session within the data
    * batch, plus (b) open-tail sessions flushed by the event-time
    * timeout in the trailing no-data micro-batch — i.e. those whose
    * timeout timestamp (end_ms + gap_ms) is strictly below the final
    * watermark (max event-time ms − 2 h). The oracle reproduces exactly
    * that closure rule in SQL (gaps-and-islands sessions, then
    * `sid < max(sid) per user OR end flushed by watermark`), so the
    * custom-state path is driver-correctness-checked end to end.
    */
  def qStreamSessionize(spark: SparkSession, dir: String): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try runToMemory(spark, userSessions(spark, dir).toDF(),
        "graft_stream_sessionize", OutputMode.Append())
      .orderBy(col("user_id"), col("start_us"))
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Fifth driver-checked streaming row — watermarked streaming
    * deduplication: two identical copies of the event stream are unioned
    * (so every event_id arrives exactly twice), duplicates die in the
    * dropDuplicatesWithinWatermark state store, and an exact-integer
    * aggregate summarizes the survivors. The oracle is the plain batch
    * aggregate over the single-copy table — equality proves every
    * duplicate was dropped. Both copies are identical rows, so which
    * arrival survives is unobservable and the drain is deterministic.
    * At scale this is the at-least-once ingest dedup path: state holds
    * one key per event_id inside the watermark horizon and is expired
    * beyond it.
    */
  def qStreamDedup(spark: SparkSession, dir: String): DataFrame = {
    val st = eventsStream(spark, dir).unionByName(eventsStream(spark, dir))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(expr("cast(round(value * 100) as bigint)")).as("value_c"))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try runToMemory(spark, st, "graft_stream_dedup").orderBy(col("event_type"))
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Sixth driver-checked streaming row — a foreachBatch keyed-upsert sink:
    * the stream maintains a durable "latest state per user" parquet store,
    * merged batch-by-batch. The fixture is split into 4 files and drained
    * with maxFilesPerTrigger=1, so the merge genuinely runs across multiple
    * micro-batches in arbitrary file order; correctness holds because the
    * merge (per-user max over (ts, event_id)-ordered structs, store ∪
    * batch) is commutative and idempotent — the exactly-once recipe for an
    * at-least-once sink. The oracle is the batch argmax over the whole
    * table. At scale the store is a partitioned table and the merge is the
    * same copy-on-write upsert as q_upsert, driven by the stream.
    */
  private def latestPerUser(df: DataFrame): DataFrame = df
    .groupBy(col("user_id"))
    .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"),
                    col("value_c"))).as("s"))
    .select(col("user_id"), col("s.ts_us").as("ts_us"),
            col("s.event_id").as("event_id"),
            col("s.event_type").as("event_type"),
            col("s.value_c").as("value_c"))

  /** One micro-batch of the INCREMENTAL keyed-upsert sink, backed by the
    * region-partitioned catalog [[graft.ops.KeyedStore]] — HBase's region
    * model driving the streaming face of the same store the batch
    * `q_upsert` path uses. The first batch CTASes the table into
    * ~n/target key-range regions; every later batch merges its
    * latest-per-user rows through [[graft.ops.KeyedStore.mergeInto]],
    * which reads and rewrites ONLY the regions holding batch keys —
    * O(changed regions) ≈ O(changed files) per micro-batch, never
    * O(store), and region size stays bounded by the target as the table
    * grows (the fixed hash-partition layout this replaces rewrote
    * O(store/nParts) however large the store got). The merge rule stays
    * the commutative-idempotent max over (ts, event_id)-ordered structs,
    * so an out-of-order batch LOSES to newer resident rows — the
    * exactly-once recipe for an at-least-once sink. Replay audit: a
    * re-run batch merges rows the store already holds, and
    * `max(resident, x) = resident` when x was already folded in — the
    * replayed batch is a literal no-op, so this sink needs no batch-id
    * fence (contrast [[addCountsIntoStore]], where addition is not
    * idempotent and the fence rides in the row). StreamingSpec pins
    * sibling-region files byte-identical across batches.
    */
  private[graft] def upsertBatchIntoStore(spark: SparkSession, storeTable: String,
                                          batch: DataFrame,
                                          targetRowsPerRegion: Long): Unit = {
    val latest = latestPerUser(batch)
    if (!graft.ops.KeyedStore.exists(spark, storeTable))
      graft.ops.KeyedStore.create(spark, storeTable, latest, "user_id",
        targetRowsPerRegion)
    else
      graft.ops.KeyedStore.mergeInto(spark, storeTable, "user_id", latest,
        (base, b) => latestPerUser(base.unionByName(b)))
  }

  def qStreamUpsert(spark: SparkSession, dir: String): DataFrame = {
    val storeTable = "graft_stream_upsert_store"
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_upsert")
    val srcDir = tmp.resolve("src").toString
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
              col("event_type"),
              expr("cast(round(value * 100) as bigint)").as("value_c"))
    ev.repartition(4).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    graft.ops.KeyedStore.drop(spark, storeTable) // defensive: stale prior run
    try {
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
          upsertBatchIntoStore(spark, storeTable, batch.toDF(),
            targetRowsPerRegion = 64)
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException(
          "q_stream_upsert: stream did not drain within 120 s — refusing to " +
            "read a partially merged store")
      }
      // Materialize off the temp table so it can be dropped before the
      // caller consumes the result (fixture-scale store; at real scale
      // the store IS the durable output and outlives the job).
      spark.table(storeTable)
        .select(col("user_id"), col("ts_us"), col("event_id"),
                col("event_type"), col("value_c"))
        .orderBy(col("user_id"))
        .localCheckpoint()
    } finally {
      // finally, not success-path: a drain timeout must not leak the
      // temp store + checkpoint on disk.
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.ops.KeyedStore.drop(spark, storeTable)
      deleteRecursively(tmp)
    }
  }

  /** Streaming CDC into the snapshot-versioned table: each micro-batch
    * commits its latest-per-user state through
    * [[graft.ops.VersionedStore]]'s copy-on-write commit, resolving
    * against the CURRENT snapshot with the same max-(ts, event_id) rule
    * as [[qStreamUpsert]] — the merge stays commutative + idempotent, so
    * the FINAL snapshot is independent of how the source files happen to
    * batch, while every intermediate snapshot stays time-travel-readable
    * (the streaming layer and the lakehouse layer compose). Result: the
    * final snapshot read back (latest state per user).
    */
  /** One micro-batch of the versioned CDC sink: resolve the batch's
    * latest-per-user rows against the current snapshot by the
    * max-(ts, event_id) rule, then commit copy-on-write. Commutative +
    * idempotent across batch orderings (StreamingSpec pins it). Replay
    * audit: a re-run batch resolves against a snapshot that already
    * folded it in, and max is idempotent, so the replay commits a new
    * VERSION whose content is identical to the current one — the
    * serving state is exactly-once; only the version history records
    * the retry (the same observable a lakehouse MERGE retry leaves). */
  private[graft] def commitLatestBatch(spark: SparkSession, storeDir: String,
                                       batch: DataFrame): Unit = {
    val latest = latestPerUser(batch)
    val cur = graft.ops.VersionedStore.currentVersion(storeDir)
    if (cur == 0)
      graft.ops.VersionedStore.init(spark, storeDir, latest, "user_id")
    else {
      val existing = graft.ops.VersionedStore.asOf(spark, storeDir, cur)
        .join(latest.select(col("user_id")), Seq("user_id"), "left_semi")
      val resolved = latestPerUser(existing.unionByName(latest))
        .select(col("user_id"), lit("U").as("op"), col("ts_us"),
                col("event_id"), col("event_type"), col("value_c"))
      graft.ops.VersionedStore.commit(spark, storeDir, resolved, "user_id")
    }
  }

  def qStreamVersioned(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_versioned")
    val srcDir = tmp.resolve("src").toString
    val storeDir = tmp.resolve("store").toString
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
              col("event_type"),
              expr("cast(round(value * 100) as bigint)").as("value_c"))
    // TWO micro-batches (round-13 item #7 discipline: each versioned
    // commit costs ~1 s of fixed machinery, so batches beyond the
    // cross-batch-merge minimum were fixture tax). Two batches still
    // exercise resolve-against-snapshot across batch boundaries;
    // arbitrary-order commutativity and crash replay are pinned in
    // StreamingSpec, and q_stream_upsert still drains four.
    ev.repartition(2).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
          commitLatestBatch(spark, storeDir, batch.toDF())
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException(
          "q_stream_versioned: stream did not drain within 120 s — refusing " +
            "to read a partially committed store")
      }
      graft.ops.VersionedStore
        .asOf(spark, storeDir, graft.ops.VersionedStore.currentVersion(storeDir))
        .select(col("user_id"), col("ts_us"), col("event_id"),
                col("event_type"), col("value_c"))
        .orderBy(col("user_id"))
        .localCheckpoint()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      deleteRecursively(tmp)
    }
  }

  /** One micro-batch of the ADDITIVE count sink: per-user batch counts
    * summed into the same region-partitioned catalog store as
    * [[upsertBatchIntoStore]] (region copy-on-write via
    * [[graft.ops.KeyedStore.mergeInto]] — O(changed regions) per batch,
    * region size bounded by the create target).
    *
    * Replay fencing: `foreachBatch` is an AT-LEAST-ONCE contract — a
    * crash between the store merge and the checkpoint commit re-runs the
    * batch — and a bare additive merge is commutative but NOT idempotent
    * (a replayed batch would add its counts twice; the latest-wins sinks
    * dodge this because max is idempotent). The store therefore keeps,
    * per key, the last applied batch's (id, contribution) alongside the
    * running total: a batch whose id EQUALS the resident id replaces its
    * own prior contribution (`n - bn + bn' = n` for a deterministic
    * replay) instead of adding, so replaying any batch is a no-op, while
    * a NEW batch id adds normally. The fence rides IN the row, so it
    * commits atomically with the data it fences — a separate high-water
    * file could tear from the partition overwrite on exactly the crash
    * it exists to survive. Batch ids are monotonic per query; only the
    * most recent uncommitted batch can replay, so one (id, contribution)
    * slot per key suffices. StreamingSpec pins the double-apply no-op.
    */
  private[graft] def addCountsIntoStore(spark: SparkSession, storeTable: String,
                                        batch: DataFrame, batchId: Long,
                                        targetRowsPerRegion: Long): Unit =
    additiveFencedMerge(spark, storeTable, "user_id",
      batch.groupBy(col("user_id")).agg(count(lit(1)).as("bn")),
      batchId, targetRowsPerRegion)

  /** The fenced additive merge itself, generalized over the key column —
    * `counts` must hold one `(keyCol, bn)` row per key for this batch.
    * Shared by the per-user count sink above and the per-cell drift
    * histogram sink ([[VectorStream.qStreamDrift]]); the fence semantics
    * (and StreamingSpec's double-apply pin) are unchanged.
    */
  private[graft] def additiveFencedMerge(spark: SparkSession, storeTable: String,
                                         keyCol: String, counts: DataFrame,
                                         batchId: Long,
                                         targetRowsPerRegion: Long): Unit = {
    if (!graft.ops.KeyedStore.exists(spark, storeTable))
      graft.ops.KeyedStore.create(spark, storeTable,
        counts.select(col(keyCol), col("bn").as("n"),
          lit(batchId).as("bid"), col("bn")),
        keyCol, targetRowsPerRegion)
    else
      graft.ops.KeyedStore.mergeInto(spark, storeTable, keyCol, counts,
        (base, b) => {
          // UNION + one hash aggregate, not a full-outer join: both
          // sides hold at most one row per key (the store is keyed; the
          // batch is pre-aggregated), so the per-key merge is a 2-row
          // group — one shuffle with map-side partial aggregation,
          // where the full-outer form shuffled BOTH sides and ran a
          // join. Semantics identical to the fenced full-outer (r8):
          // null aggregates mark the side absent from the group.
          val tagged = base
            .select(col(keyCol), col("n"), col("bid"), col("bn"),
                    lit(null).cast("long").as("__bn"))
            .unionByName(b.select(col(keyCol),
              lit(null).cast("long").as("n"),
              lit(null).cast("long").as("bid"),
              lit(null).cast("long").as("bn"),
              col("bn").as("__bn")))
          tagged.groupBy(col(keyCol))
            .agg(max(col("n")).as("__rn"), max(col("bid")).as("__rbid"),
                 max(col("bn")).as("__rbn"), max(col("__bn")).as("__b"))
            .select(
              col(keyCol),
              when(col("__rn").isNull, col("__b"))              // key new to store
                .when(col("__b").isNull, col("__rn"))           // key absent from batch
                .when(col("__rbid") === lit(batchId),
                  col("__rn") - col("__rbn") + col("__b"))      // replayed batch
                .otherwise(col("__rn") + col("__b")).as("n"),   // fresh batch
              when(col("__b").isNull, col("__rbid"))
                .otherwise(lit(batchId)).as("bid"),
              when(col("__b").isNull, col("__rbn"))
                .otherwise(col("__b")).as("bn"))
        })
  }

  /** Seventh driver-checked streaming row — streaming running counts with
    * a top-k read-out: the serving-layer heavy-hitters pipeline (per-key
    * counts merged additively into a durable store; consumers read the
    * current top-k at any time). Exercises the aggregate-merge sink class
    * that latest-wins upsert ([[qStreamUpsert]]) doesn't: the store holds
    * PARTIAL aggregates that combine across batches, the streaming face
    * of the same partial/final split Spark applies within a batch. The
    * fixture drains 2 source files one per trigger, so the additive merge
    * genuinely runs across micro-batches; the oracle
    * is the plain batch GROUP BY count top-20 — equality proves the
    * incremental sums equal the one-shot aggregate.
    */
  def qStreamTopk(spark: SparkSession, dir: String): DataFrame = {
    val storeTable = "graft_stream_topk_store"
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_topk")
    val srcDir = tmp.resolve("src").toString
    val ev = graft.Tables.events(spark, dir).select(col("event_id"), col("user_id"))
    // TWO micro-batches (see qStreamVersioned's note): the additive
    // merge still genuinely combines partial aggregates ACROSS batches
    // — replay fencing and arbitrary-order equality are pinned in
    // StreamingSpec, and q_stream_upsert remains the 4-batch anchor.
    ev.repartition(2).write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    graft.ops.KeyedStore.drop(spark, storeTable) // defensive: stale prior run
    try {
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
          addCountsIntoStore(spark, storeTable, batch.toDF(), id,
            targetRowsPerRegion = 64)
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException(
          "q_stream_topk: stream did not drain within 120 s — refusing to " +
            "read a partially merged store")
      }
      spark.table(storeTable)
        .select(col("user_id"), col("n"))
        .orderBy(col("n").desc, col("user_id"))
        .limit(20)
        .localCheckpoint()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.ops.KeyedStore.drop(spark, storeTable)
      deleteRecursively(tmp)
    }
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally s.close()
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
    if (!q.awaitTermination(120000)) {
      q.stop()
      throw new IllegalStateException(
        s"stream $name did not drain within 120 s — result would be partial")
    }
    spark.table(name)
  }
}
