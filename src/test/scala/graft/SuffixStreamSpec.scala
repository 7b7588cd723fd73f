package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming suffix-index maintenance
  * (DedupOps.suffixIndexStreamAppend / DocStream.qStreamSuffixIndex):
  * the meta-fingerprint fence must make at-least-once batch delivery
  * exactly-once — replays write nothing, torn states rebuild — and a
  * drained stream must serve statistics identical to a from-scratch
  * build of the union.
  */
class SuffixStreamSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def stats3(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def fileDigests(name: String): Map[String, Long] = {
    val loc = java.nio.file.Paths.get(
      ops.KeyedStore.location(spark, name).toUri.getPath)
    val out = scala.collection.mutable.Map.empty[String, Long]
    java.nio.file.Files.walk(loc).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val bytes = java.nio.file.Files.readAllBytes(p)
        out(loc.relativize(p).toString) =
          java.util.Arrays.hashCode(bytes).toLong
      }
    }
    out.toMap
  }

  test("fenced batch sequence equals a rebuild; a replayed batch writes " +
       "nothing; a torn meta state rebuilds instead of serving garbage") {
    val name = "graft_sfx_stream_spec_a"
    try {
      val base = Seq((1L, "a b c d e"), (2L, "c d e f g"))
        .toDF("doc_id", "text")
      val b1 = Seq((50L, "a b c x y")).toDF("doc_id", "text")
      val b2 = Seq((51L, "f g h i")).toDF("doc_id", "text")
      val full12 = base.unionByName(b1).unionByName(b2)
      ops.DedupOps.suffixIndexBuild(base, name).collect()
      ops.DedupOps.suffixIndexStreamAppend(base, b1, name)
      // at-least-once replay of the SAME (pre, batch): fence must make
      // it a content no-op — not duplicate suffixes, not rewrite files
      val afterB1 = fileDigests(name)
      ops.DedupOps.suffixIndexStreamAppend(base, b1, name)
      assert(fileDigests(name) == afterB1, "replayed batch wrote data")
      ops.DedupOps.suffixIndexStreamAppend(base.unionByName(b1), b2, name)
      assert(stats3(ops.DedupOps.suffixIndexServe(full12, name)) ==
        stats3(ops.DedupOps.suffixDedupStats(full12)))
      // torn state: stamp a fingerprint matching neither pre nor post —
      // the next batch must fall through to a full rebuild
      ops.KeyedStore.upsert(spark, name, "sp",
        Seq((-1L, 424242L, 0L, 0L)).toDF("sp", "doc_id", "p", "lcp")
          .withColumn("prev_sp", lit(null).cast("long"))
          .withColumn("prev_doc", lit(null).cast("long"))
          .withColumn("ord", lit(null).cast("long"))
          .withColumn("op", lit("U")))
      val b3 = Seq((52L, "c d e z")).toDF("doc_id", "text")
      val full13 = full12.unionByName(b3)
      ops.DedupOps.suffixIndexStreamAppend(full12, b3, name)
      assert(stats3(ops.DedupOps.suffixIndexServe(full13, name)) ==
        stats3(ops.DedupOps.suffixDedupStats(full13)))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("injected crash after a committed append, checkpoint restart — " +
       "the fingerprint fence makes the replayed batch exactly-once") {
    val name = "graft_sfx_stream_spec_b"
    val tmp = java.nio.file.Files.createTempDirectory("graft_sfx_stream")
    val srcDir = tmp.resolve("src").toString
    try {
      val docs = graft.Tables.documents(spark, Sf)
        .filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("text"))
      val delta = docs.filter(col("doc_id") % 3 === 0)
      val base = docs.filter(col("doc_id") % 3 =!= 0)
      delta.repartition(2).write.mode("overwrite").parquet(srcDir)
      ops.DedupOps.suffixIndexBuild(base, name).collect()
      val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def run(): Unit = {
        var seen = base
        val q = spark.readStream.schema(delta.schema)
          .option("maxFilesPerTrigger", "1").parquet(srcDir)
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             id: Long) =>
              if (!batch.isEmpty) {
                val b = batch.toDF().select(col("doc_id"), col("text"))
                  .localCheckpoint()
                ops.DedupOps.suffixIndexStreamAppend(seen, b, name)
                seen = seen.unionByName(b)
                // crash after the store commit, before the checkpoint
                // commit — the real at-least-once window
                if (id == 0 && crashed.compareAndSet(false, true))
                  throw new RuntimeException(
                    "injected crash after suffix append")
              }
          }
          .option("checkpointLocation", tmp.resolve("ckpt").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try {
          assert(q.awaitTermination(180000), "stream did not drain in 180 s")
        } finally if (q.isActive) q.stop()
      }
      val ex = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] { run() }
      assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .take(8).exists(t =>
          String.valueOf(t.getMessage).contains("injected crash")),
        s"failure was not the injected crash: $ex")
      assert(crashed.get(), "injection never fired")
      run() // restart: batch 0 replays onto the fence, batch 1 appends
      assert(stats3(ops.DedupOps.suffixIndexServe(docs, name)) ==
        stats3(ops.DedupOps.suffixDedupStats(docs)))
    } finally {
      ops.DedupOps.suffixIndexDrop(spark, name)
      graft.streaming.EventStream.deleteRecursively(tmp)
    }
  }

  test("a surviving in-progress marker file forces a rebuild even " +
       "when the fingerprint looks committed — the torn-commit fence") {
    val name = "graft_sfx_stream_spec_c"
    try {
      val base = Seq((1L, "a b c d e"), (2L, "c d e f g"))
        .toDF("doc_id", "text")
      val b1 = Seq((50L, "a b c x y")).toDF("doc_id", "text")
      val full = base.unionByName(b1)
      ops.DedupOps.suffixIndexBuild(base, name).collect()
      ops.DedupOps.suffixIndexStreamAppend(base, b1, name)
      // Simulate the crash window the marker exists for: the data +
      // meta upsert committed (fingerprint reads fp(post)) but the
      // protocol never reached the marker clear — KeyedStore's
      // multi-region commit is not atomic, so some data region may be
      // missing even though region 0 landed. A replay MUST NOT no-op
      // on the fingerprint alone; it must rebuild.
      val marker = java.nio.file.Paths.get(
        ops.KeyedStore.location(spark, name).toUri.getPath,
        "_sfx_inprogress")
      ops.KeyedStore.atomicWriteBytes(marker, Array[Byte]('1'))
      val digests = fileDigests(name)
      ops.DedupOps.suffixIndexStreamAppend(base, b1, name)
      assert(fileDigests(name) != digests,
        "marker state was served instead of rebuilt")
      // the rebuild cleared the marker and serves correct stats
      assert(!java.nio.file.Files.exists(marker),
        "rebuild must clear the marker")
      assert(stats3(ops.DedupOps.suffixIndexServe(full, name)) ==
        stats3(ops.DedupOps.suffixDedupStats(full)))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }
}
