package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming vector ingestion into the store-persisted ANN index — the
  * serving-side maintenance loop: an offline build freezes the codebook
  * ([[graft.ops.AnnIndexOps.buildIndex]]), then every arriving vector
  * micro-batch is assigned against that codebook and appended to the
  * posting lists ([[graft.ops.AnnIndexOps.appendBatch]]) while the
  * index stays continuously serveable. Re-clustering remains an offline
  * rebuild — the standard IVF practice; the stream never moves existing
  * postings.
  *
  * Exactly-once audit (the foreachBatch sink discipline): an append is
  * an upsert of composite `c<cell>#m<member>` keys whose VALUES are a
  * pure function of the frozen codebook and the vector — a replayed
  * batch re-inserts byte-identical rows over themselves (content
  * no-op), and batches with disjoint vectors commute, so the final
  * store is independent of how the source files happen to batch and
  * needs no batch-id fence (same class as [[EventStream]]'s
  * latest-wins merge, unlike its additive top-k sink).
  */
object VectorStream {
  import graft.ops.{AnnIndexOps, KeyedStore, SimilarityOps}

  /** Driver-checked row: build from the 90% base slice, drain the 10%
    * delta as a 2-file AvailableNow stream (one file per micro-batch)
    * through appendBatch, then serve queries over the union — the
    * result is identical to the batch [[AnnIndexOps.qAnnIndexIncremental]]
    * path, so the row shares its base-codebook oracle.
    */
  def qStreamAnnIndex(spark: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_ann_index"
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_annidx")
    val srcDir = tmp.resolve("src").toString
    val embs = graft.Tables.embeddings(spark, dir)
    val delta = embs.filter(col("vec_id") % 10 === 0)
    delta.repartition(2).write.mode("overwrite").parquet(srcDir)

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    KeyedStore.drop(spark, name) // defensive: stale prior run
    try {
      // The OFFLINE base build is the frozen victim, not the measured
      // streaming capability — resolve it from the shared content-
      // addressed cache and clone (the same base index as the batch
      // incremental/rebalance rows; AnnIndexOps.resolveCloned's note).
      KeyedStore.cloneStore(spark,
        AnnIndexOps.b90Cache(spark, dir, embs), name)
      val stream = spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          if (!batch.isEmpty)
            AnnIndexOps.appendBatch(spark, name, batch.toDF())
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException(
          "q_stream_ann_index: stream did not drain within 120 s — " +
            "refusing to serve a partially appended index")
      }
      // Materialize before the temp store is dropped (fixture-scale;
      // at real scale the index table IS durable and outlives the job).
      AnnIndexOps.serve(spark, name, embs, col("vec_id") < 5)
        .localCheckpoint()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      KeyedStore.drop(spark, name)
      EventStream.deleteRecursively(tmp)
    }
  }

  /** The true-PQ twin of [[qStreamAnnIndex]]: offline build freezes BOTH
    * codebooks (coarse cells + per-subspace PQ), each arriving batch is
    * PQ-encoded and routed against them ([[AnnIndexOps.appendPqBatch]])
    * and appended as 16-byte posting rows. The same exactly-once class:
    * posting keys and values are pure functions of the frozen codebooks
    * and the vector, so replays are content no-ops and batches commute —
    * no fence needed. Results equal the batch
    * [[AnnIndexOps.qAnnPqIncremental]], whose oracle the row shares.
    */
  def qStreamPqIndex(spark: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_pq_index"
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_pqidx")
    val srcDir = tmp.resolve("src").toString
    val embs = graft.Tables.embeddings(spark, dir)
    val delta = embs.filter(col("vec_id") % 10 === 0)
    // ONE micro-batch (round-13 verdict item #7): each append pays
    // ~2 s of fixed commit machinery, so the second batch was pure
    // fixture tax. Multi-batch commutativity + crash-replay of this
    // sink are pinned by StreamingSpec's PQ fault-injection test (two
    // batches, injected crash, checkpoint restart), and the int8 twin
    // q_stream_ann_index still drains two batches in the bench suite.
    delta.repartition(1).write.mode("overwrite").parquet(srcDir)

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    KeyedStore.drop(spark, name) // defensive: stale prior run
    try {
      // Offline base build resolved from the shared PQ cache + clone
      // (see qStreamAnnIndex's note).
      KeyedStore.cloneStore(spark,
        AnnIndexOps.pqB90Cache(spark, dir, embs), name)
      val stream = spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          if (!batch.isEmpty)
            AnnIndexOps.appendPqBatch(spark, name, batch.toDF())
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException(
          "q_stream_pq_index: stream did not drain within 120 s — " +
            "refusing to serve a partially appended index")
      }
      AnnIndexOps.servePq(spark, name, embs, col("vec_id") < 5)
        .localCheckpoint()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      KeyedStore.drop(spark, name)
      EventStream.deleteRecursively(tmp)
    }
  }

  /** Streaming drift monitor — [[graft.ops.SimilarityOps.embeddingDrift]]
    * run the way production runs it: the delta batch arrives as
    * micro-batches, each is assigned against the FROZEN base codebook
    * and its per-cell counts are merged into a durable histogram store
    * through [[EventStream.additiveFencedMerge]] (counts are additive,
    * NOT idempotent — this sink needs the in-row (bid, bn) replay fence
    * the index-append sink above doesn't). The PSI read-out over
    * base-histogram ∪ store equals the batch monitor exactly, so the
    * row shares its oracle.
    */
  def qStreamDrift(spark: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_drift_store"
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_drift")
    val srcDir = tmp.resolve("src").toString
    val embs = graft.Tables.embeddings(spark, dir)
    val basePred = col("vec_id") % 10 =!= 0
    val delta = embs.filter(!basePred)
    delta.repartition(2).write.mode("overwrite").parquet(srcDir)

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    KeyedStore.drop(spark, name) // defensive: stale prior run
    try {
      // Frozen codebook, materialized once (16 rows) so per-batch
      // closures don't re-derive it from the corpus.
      val cent = SimilarityOps.driftCodebook(embs, basePred, 16)
        .localCheckpoint()
      val stream = spark.readStream.schema(delta.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[Row], bid: Long) =>
          if (!batch.isEmpty) {
            val counts = SimilarityOps.nearestCell(batch.toDF(), cent)
              .groupBy(col("c_id")).agg(count(lit(1)).as("bn"))
            EventStream.additiveFencedMerge(spark, name, "c_id", counts,
              bid, targetRowsPerRegion = 8)
          }
        }
        .option("checkpointLocation", tmp.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      if (!q.awaitTermination(120000)) {
        q.stop()
        throw new IllegalStateException(
          "q_stream_drift: stream did not drain within 120 s — refusing " +
            "to report PSI off a partially merged histogram")
      }
      val baseHist = SimilarityOps.nearestCell(embs.filter(basePred), cent)
        .groupBy(col("c_id")).agg(count(lit(1)).as("n_base"))
      val deltaHist = spark.table(name)
        .select(col("c_id"), col("n").as("n_delta"))
      val hist = baseHist.join(deltaHist, Seq("c_id"), "full_outer")
        .select(col("c_id"),
                coalesce(col("n_base"), lit(0L)).as("n_base"),
                coalesce(col("n_delta"), lit(0L)).as("n_delta"))
      SimilarityOps.psiFromHist(hist).localCheckpoint()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      KeyedStore.drop(spark, name)
      EventStream.deleteRecursively(tmp)
    }
  }
}
