package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming document curation against FROZEN trained artifacts — the
  * online half of the train-once/serve-frozen discipline
  * ([[graft.ops.TextOps.qualityModelFor]]): a crawler feed is gated by
  * the classifier the offline pipeline trained, never by a model that
  * shifts under the stream.
  */
object DocStream {

  /** Streaming quality gate — [[graft.ops.TextOps.qQualityClassify]]'s
    * streaming twin (round-13 verdict item #3's streaming leg): the
    * model is trained/loaded ONCE before the stream starts (batches
    * must all serve the SAME weights — a per-batch train would score
    * early documents against partial corpora), then every arriving
    * micro-batch is scored against the frozen weights and upserted into
    * a keyed store.
    *
    * Exactly-once audit: each stored row is a pure function of
    * (document, frozen model), so a replayed batch rewrites
    * byte-identical rows — a content no-op, the latest-wins sink class
    * ([[EventStream.qStreamUpsert]]), no batch-id fence needed.
    * Result: per-language gate accounting read from the store — equal
    * to the batch classifier's aggregate, which is what the oracle
    * computes (StreamingSpec pins stream-vs-batch equality too).
    */
  /** STREAMING maintenance of the durable suffix index — the online
    * leg of the Lee-et-al deployment shape (round-14 verdict stretch
    * item): an offline build persists the base corpus's linked SA+LCP
    * structure, then each arriving document micro-batch merges through
    * [[graft.ops.DedupOps.suffixIndexAppend]] — delta-proportional
    * compute, covering-region writes, exactly the small-batch regime
    * where append beats rebuild (ROUND15_NOTES crossover table) — and
    * the index stays continuously serveable.
    *
    * Exactly-once audit: suffix appends are NOT pure functions of the
    * batch (key assignment depends on store state), so unlike the ANN
    * posting sinks a replay is not automatically a content no-op. The
    * fence is the store's meta fingerprint
    * ([[graft.ops.DedupOps.suffixIndexStreamAppend]]): a replayed
    * batch finds the store already at its post-state fingerprint and
    * writes nothing; a torn append (crash between upsert and
    * checkpoint) matches neither pre- nor post-state and rebuilds —
    * torn structure is never served. SuffixStreamSpec exercises both
    * through an injected crash + checkpoint restart.
    *
    * The row resolves warm-first like the batch incremental twin: a
    * store already holding the full corpus serves directly; otherwise
    * base build → 2-batch drain → serve. Output = full-corpus
    * duplication statistics, row-identical to q_suffix_dedup (the
    * oracle is the SAME stats SQL).
    */
  def qStreamSuffixIndex(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.{DedupOps, KeyedStore}
    val name = "graft_stream_suffix_index_" +
      dir.replaceAll("[^a-zA-Z0-9]", "_")
    val docs = graft.Tables.documents(spark, dir)
    val narrow = docs.select(col("doc_id"), col("text"))
    val delta = narrow.filter(col("doc_id") % 41 === 0)
    val base = narrow.filter(col("doc_id") % 41 =!= 0)
    // warm probe only — whether the stream machinery needs to run at
    // all; serve at the end re-resolves the fingerprint itself
    if (!DedupOps.suffixStoreFresh(docs, name)) {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stream_sfx")
      val srcDir = tmp.resolve("src").toString
      delta.repartition(2).write.mode("overwrite").parquet(srcDir)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        if (KeyedStore.exists(spark, name)) KeyedStore.drop(spark, name)
        DedupOps.suffixIndexBuild(base, name).collect()
        // the corpus committed so far — advanced after each batch; on a
        // crash-restart the var resets and replayed batches fall on the
        // fingerprint fence instead
        var seen = base
        val stream = spark.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
        val q = stream.writeStream
          .foreachBatch { (batch: Dataset[Row], _: Long) =>
            if (!batch.isEmpty) {
              val b = batch.toDF().select(col("doc_id"), col("text"))
                .localCheckpoint()
              DedupOps.suffixIndexStreamAppend(seen, b, name)
              seen = seen.unionByName(b)
            }
          }
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(Trigger.AvailableNow())
          .start()
        if (!q.awaitTermination(180000)) {
          q.stop()
          throw new IllegalStateException(
            "q_stream_suffix_index: stream did not drain within 180 s — " +
              "refusing to serve a partially appended index")
        }
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        EventStream.deleteRecursively(tmp)
      }
    }
    DedupOps.suffixIndexServe(docs, name)
  }

  def qStreamQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_qgate_store"
    val dbg = sys.env.contains("GRAFT_STREAM_DEBUG")
    var tDbg = System.nanoTime()
    def lap(phase: String): Unit = if (dbg) {
      println(f"QGATEDBG phase=$phase ${(System.nanoTime() - tDbg) / 1e9}%.1f s")
      tDbg = System.nanoTime()
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_qgate")
    val srcDir = tmp.resolve("src").toString
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    docs.repartition(2).write.mode("overwrite").parquet(srcDir)
    lap("src-write")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    graft.ops.KeyedStore.drop(spark, name) // defensive: stale prior run
    try {
      // Freeze (train or load) before any batch arrives.
      graft.ops.TextOps.qualityModelFor(spark, dir, 1024, 8)
      lap("train")
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[Row], bid: Long) =>
          if (!batch.isEmpty) {
            val b = batch.toDF()
            val scored = graft.ops.TextOps.classifyFrozen(spark, dir, b)
              .join(b.select(col("doc_id"), col("lang")), Seq("doc_id"))
              .select(col("doc_id"), col("lang"), col("score"),
                col("quality_pass"))
            if (!graft.ops.KeyedStore.exists(spark, name)) {
              graft.ops.KeyedStore.create(spark, name, scored, "doc_id", 512)
              lap(s"batch$bid-create")
            } else {
              // returned full-table read deliberately discarded (the
              // store's read-isolation contract); reads go through scan
              graft.ops.KeyedStore.upsert(spark, name, "doc_id",
                scored.select(col("doc_id"), lit("U").as("op"), col("lang"),
                  col("score"), col("quality_pass")))
              lap(s"batch$bid-upsert")
              ()
            }
          }
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException(
          "q_stream_quality_gate: stream did not drain within 120 s — " +
            "refusing to report a partially gated corpus")
      }
      lap("drain")
      // Materialize before the temp store drops (fixture-scale; at real
      // scale the gated store IS the durable output).
      val res = graft.ops.KeyedStore.scan(spark, name, "doc_id", 0L, Long.MaxValue)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("quality_pass"), 1L).otherwise(0L)).as("n_pass"),
          coalesce(sum(when(col("quality_pass"), col("score"))), lit(0L))
            .as("passed_score"))
        .orderBy(col("lang"))
        .localCheckpoint()
      lap("scan-agg")
      res
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.ops.KeyedStore.drop(spark, name)
      EventStream.deleteRecursively(tmp)
    }
  }
}
