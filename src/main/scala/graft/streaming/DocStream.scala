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
  def qStreamQualityGate(spark: SparkSession, dir: String): DataFrame = {
    val name = "graft_stream_qgate_store"
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_qgate")
    val srcDir = tmp.resolve("src").toString
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    docs.repartition(2).write.mode("overwrite").parquet(srcDir)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    graft.ops.KeyedStore.drop(spark, name) // defensive: stale prior run
    try {
      // Freeze (train or load) before any batch arrives.
      graft.ops.TextOps.qualityModelFor(spark, dir, 1024, 8)
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          if (!batch.isEmpty) {
            val b = batch.toDF()
            val scored = graft.ops.TextOps.classifyFrozen(spark, dir, b)
              .join(b.select(col("doc_id"), col("lang")), Seq("doc_id"))
              .select(col("doc_id"), col("lang"), col("score"),
                col("quality_pass"))
            if (!graft.ops.KeyedStore.exists(spark, name))
              graft.ops.KeyedStore.create(spark, name, scored, "doc_id", 512)
            else {
              // returned full-table read deliberately discarded (the
              // store's read-isolation contract); reads go through scan
              graft.ops.KeyedStore.upsert(spark, name, "doc_id",
                scored.select(col("doc_id"), lit("U").as("op"), col("lang"),
                  col("score"), col("quality_pass")))
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
      // Materialize before the temp store drops (fixture-scale; at real
      // scale the gated store IS the durable output).
      graft.ops.KeyedStore.scan(spark, name, "doc_id", 0L, Long.MaxValue)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("quality_pass"), 1L).otherwise(0L)).as("n_pass"),
          coalesce(sum(when(col("quality_pass"), col("score"))), lit(0L))
            .as("passed_score"))
        .orderBy(col("lang"))
        .localCheckpoint()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.ops.KeyedStore.drop(spark, name)
      EventStream.deleteRecursively(tmp)
    }
  }
}
