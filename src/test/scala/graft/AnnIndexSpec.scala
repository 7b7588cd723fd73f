package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Store-persisted ANN index (AnnIndexOps): result parity with the
  * in-memory pipeline, incremental-append semantics, and that the
  * composite-key layout actually buys range pruning.
  */
class AnnIndexSpec extends AnyFunSuite {
  import TestSpark._
  import ops.{AnnIndexOps, KeyedStore, SimilarityOps}

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("store-served retrieval is identical to the in-memory IVF-PQ pipeline") {
    val served = rowsOf(AnnIndexOps.qAnnIndexServe(spark, Sf))
    val inMem = rowsOf(SimilarityOps.qAnnIvfPq(spark, Sf))
    assert(served == inMem)
  }

  test("incremental append equals one-shot assignment against the frozen base codebook") {
    val embs = Tables.embeddings(spark, Sf)
    val incremental = rowsOf(AnnIndexOps.qAnnIndexIncremental(spark, Sf))
    // Control: the whole corpus assigned/probed against the BASE-slice
    // codebook, composed from the shared pipeline stages in memory —
    // exactly what build(base) + append(delta) must produce.
    val eqFull = SimilarityOps.withInt8Codes(embs)
    val centBase = SimilarityOps.pqCodebookRefined(
      SimilarityOps.withInt8Codes(embs.filter(col("vec_id") % 10 =!= 0)), 16)
    val pred = col("vec_id") < 5
    val floats = embs.select(col("vec_id"), col("embedding"),
      SimilarityOps.norm2("embedding").as("nrm"))
    val control = rowsOf(SimilarityOps.pqCoarseRescore(
      SimilarityOps.pqProbes(eqFull, pred, centBase, 4),
      SimilarityOps.pqAssign(eqFull, centBase, 2),
      floats, pred, 10, 4))
    assert(incremental == control)
  }

  test("composite keys make a cell probe range-prune to a strict region subset") {
    val name = "graft_ann_idx_spec"
    AnnIndexOps.buildIndex(spark, name, Tables.embeddings(spark, Sf),
      targetRowsPerRegion = 128)
    val rm = KeyedStore.readRegions(spark, name)
    assert(rm.regions.size >= 4,
      s"fixture index should span several regions, got ${rm.regions.size}")
    // The codebook prefix scan and any single cell's posting scan each
    // touch a strict subset of regions — the serving IO bound.
    val bIdx = rm.rangeIdx("b", "bz")
    assert(bIdx.size < rm.regions.size, "codebook scan must prune")
    val someCell = KeyedStore.scan(spark, name, "row_key", "c", "cz")
      .select(col("c_id")).distinct().limit(1)
      .collect().head.getLong(0)
    val cIdx = rm.rangeIdx(f"c$someCell%012d#", f"c$someCell%012d#z")
    assert(cIdx.nonEmpty && cIdx.size < rm.regions.size,
      s"cell scan must prune: ${cIdx.size} of ${rm.regions.size}")
  }

  test("rebalance re-derives the region directory; serving is unchanged") {
    val name = "graft_ann_reb_spec"
    val embs = Tables.embeddings(spark, Sf)
    AnnIndexOps.buildIndex(spark, name, embs.filter(col("vec_id") % 10 =!= 0),
      targetRowsPerRegion = 64)
    AnnIndexOps.appendBatch(spark, name, embs.filter(col("vec_id") % 10 === 0))
    val pre = rowsOf(AnnIndexOps.serve(spark, name, embs, col("vec_id") < 5))
    val preR = KeyedStore.readRegions(spark, name).regions
    val total = preR.map(_.rows).sum
    val deltaPostings = 2 * embs.filter(col("vec_id") % 10 === 0).count()
    // Appends never add regions (fixed boundaries): the pre directory is
    // still sized for the BASE row count. Rebalance re-derives
    // ceil(current/target) regions from what's actually there.
    assert(preR.size == ((total - deltaPostings + 63) / 64).toInt,
      s"pre ${preR.size} regions for ${total - deltaPostings} base rows")
    KeyedStore.rebalance(spark, name, "row_key", targetRowsPerRegion = 64)
    val postR = KeyedStore.readRegions(spark, name).regions
    assert(postR.map(_.rows).sum == total, "rebalance must not drop rows")
    assert(postR.size == ((total + 63) / 64).toInt,
      s"post ${postR.size} regions for $total rows")
    val post = rowsOf(AnnIndexOps.serve(spark, name, embs, col("vec_id") < 5))
    assert(post == pre, "layout rewrite changed serving results")
  }

  test("streaming micro-batch appends equal the batch incremental path") {
    val streamed = rowsOf(streaming.VectorStream.qStreamAnnIndex(spark, Sf))
    val batch = rowsOf(AnnIndexOps.qAnnIndexIncremental(spark, Sf))
    assert(streamed == batch)
  }

  test("streaming drift monitor equals the batch PSI report") {
    // (c_id, n_base, n_delta, psi_micronat|null) — not the serve schema.
    def psiRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    val streamed = psiRows(streaming.VectorStream.qStreamDrift(spark, Sf))
    val batch = psiRows(ops.SimilarityOps.qEmbeddingDrift(spark, Sf))
    assert(streamed == batch)
  }

  test("deleteBatch removes exactly the slice's postings, keeps the codebook, " +
       "and re-deleting is a no-op") {
    val name = "graft_ann_del_spec"
    val embs = Tables.embeddings(spark, Sf)
    AnnIndexOps.buildIndex(spark, name, embs)
    val deletedIds = embs.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val preCodebook = KeyedStore.scan(spark, name, "row_key", "b", "bz")
      .collect().map(_.toString).sorted.toSeq
    AnnIndexOps.deleteBatch(spark, name, embs.filter(col("vec_id") % 10 === 0))
    def postings() = KeyedStore.scan(spark, name, "row_key", "c", "cz")
      .select(col("m_id")).collect().map(_.getLong(0))
    val after = postings()
    assert(after.nonEmpty && !after.exists(deletedIds), "deleted ids survive")
    assert(KeyedStore.scan(spark, name, "row_key", "b", "bz")
      .collect().map(_.toString).sorted.toSeq == preCodebook,
      "delete must not touch codebook rows")
    val once = after.sorted.toSeq
    AnnIndexOps.deleteBatch(spark, name, embs.filter(col("vec_id") % 10 === 0))
    assert(postings().sorted.toSeq == once, "re-delete changed the store")
  }

  test("filtered serve off the store equals the in-memory filtered path; " +
       "labels are stored posting columns") {
    val name = "graft_ann_fil_spec"
    val embs = Tables.embeddings(spark, Sf)
    AnnIndexOps.buildIndex(spark, name, embs, withLabels = true)
    val served = AnnIndexOps
      .serve(spark, name, embs, col("vec_id") < 5, sameLabelOnly = true)
      .collect().map(_.toString).toSeq
    val inMem = ops.SimilarityOps
      .annIvfPqFiltered(embs, col("vec_id") < 5)
      .collect().map(_.toString).toSeq
    assert(served == inMem, "store round-trip changed the filtered result")
    // The label really is a posting column (no serve-time label join).
    val postings = KeyedStore.scan(spark, name, "row_key", "c", "cz")
    assert(postings.columns.contains("m_label"))
    assert(postings.filter(col("m_label").isNull).count() == 0L,
      "every posting row must carry its member's label")
  }

  test("appendBatch replay is a content no-op (the exactly-once audit)") {
    val name = "graft_ann_idx_replay"
    val embs = Tables.embeddings(spark, Sf)
    AnnIndexOps.buildIndex(spark, name, embs.filter(col("vec_id") % 10 =!= 0))
    val delta = embs.filter(col("vec_id") % 10 === 0)
    def content() = spark.table(name).drop("kr")
      .collect().map(_.toString).sorted.toSeq
    AnnIndexOps.appendBatch(spark, name, delta)
    val once = content()
    AnnIndexOps.appendBatch(spark, name, delta)
    assert(content() == once, "replayed append changed the store")
  }

  test("true-PQ store serve equals the in-memory ADC pipeline; the size " +
       "columns prove the m-byte code beats int8×dim") {
    val out = AnnIndexOps.qAnnPq(spark, Sf)
    val served = rowsOf(out.select("q_id", "rank", "neighbor_id", "cos"))
    val inMem = rowsOf(SimilarityOps.annPqAdc(
      Tables.embeddings(spark, Sf), col("vec_id") < 5))
    assert(served == inMem, "store round-trip changed ADC results")
    val head = out.select("pq_code_bytes", "int8_code_bytes", "pq_smaller").head()
    val n = SimilarityOps.withDoubleVecs(Tables.embeddings(spark, Sf)).count()
    val m = SimilarityOps.PqM; val kSub = SimilarityOps.PqKSub
    val sd = SimilarityOps.PqDim / m
    assert(head.getLong(0) == n * (m + 8) + m * kSub * sd * 8)
    assert(head.getLong(1) == n * SimilarityOps.PqDim)
    assert(head.getBoolean(2), "PQ index must be smaller than int8 codes")
  }

  test("stored PQ postings are self-consistent: codes index the stored " +
       "sub-codebooks and rnrm_u is the exact sum of their norms") {
    val name = "graft_ann_adc_spec"
    AnnIndexOps.buildPqIndex(spark, name, Tables.embeddings(spark, Sf))
    val m = SimilarityOps.PqM; val kSub = SimilarityOps.PqKSub
    val cb = KeyedStore.scan(spark, name, "row_key", "p", "pz")
      .select("sub_id", "sub_code", "scv", "snrm_u").collect()
    assert(cb.nonEmpty, "no stored sub-codebook rows")
    val norm = cb.map(r => (r.getInt(0), r.getLong(1).toInt) -> r.getLong(3)).toMap
    cb.foreach { r =>
      assert(r.getInt(0) >= 0 && r.getInt(0) < m)
      assert(r.getLong(1) >= 0 && r.getLong(1) < kSub)
      assert(r.getSeq[Double](2).length == SimilarityOps.PqDim / m)
    }
    val postings = KeyedStore.scan(spark, name, "row_key", "c", "cz")
      .select("m_id", "pqc", "rnrm_u")
      .where(col("pqc").isNotNull).collect()
    assert(postings.nonEmpty)
    postings.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == m, s"member ${r.getLong(0)}: ${codes.length} codes")
      val expect = codes.zipWithIndex.map { case (c, s) => norm((s, c)) }.sum
      assert(r.getLong(2) == expect,
        s"member ${r.getLong(0)}: stored rnrm_u ${r.getLong(2)} != $expect")
    }
  }

  test("PQ incremental append replays as a content no-op; filtered PQ " +
       "serve returns only same-label neighbors") {
    import spark.implicits._
    val embs = Tables.embeddings(spark, Sf)
    val name = "graft_ann_adcinc_spec"
    AnnIndexOps.buildPqIndex(spark, name, embs.filter(col("vec_id") % 10 =!= 0))
    val delta = embs.filter(col("vec_id") % 10 === 0)
    def content() = KeyedStore.scan(spark, name, "row_key", "", "~")
      .select("row_key", "c_id", "m_id", "rnrm_u")
      .collect().map(_.toString).sorted.toSeq
    AnnIndexOps.appendPqBatch(spark, name, delta)
    val once = content()
    AnnIndexOps.appendPqBatch(spark, name, delta)
    assert(content() == once, "replayed PQ append changed the store")
    // Filtered serve: label constraint holds on every result row.
    val out = AnnIndexOps.qAnnPqFiltered(spark, Sf)
    val labels = embs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.collect().foreach { r =>
      assert(labels(r.getLong(2)) == labels(r.getLong(0)),
        s"q ${r.getLong(0)} got cross-label neighbor ${r.getLong(2)}")
    }
    assert(out.count() == 50)
  }

  test("id outside the %012d key layout is rejected, not silently mis-sorted") {
    import spark.implicits._
    val bad = Seq((1000000000000L, Array.fill(4)(1.0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      AnnIndexOps.buildIndex(spark, "graft_ann_idx_badkey", bad,
        numCentroids = 1, nassign = 1)
    }
    assert(ex.getMessage.contains("key-layout range") ||
      Option(ex.getCause).exists(_.getMessage.contains("key-layout range")),
      s"unexpected: $ex")
  }
}
