package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Region-count maintenance on the durable suffix index (round-16
  * ADVICE): the suffix-aware wrappers (DedupOps.suffixStoreMergeSmall-
  * Regions / suffixStoreRebalance) preserve the stored-ordinal
  * invariant across merges/rebalances, and a RAW KeyedStore merge —
  * which mixes ord write generations inside one region — is DETECTED
  * by warm search's contiguity guard and healed by rebuild instead of
  * silently mis-ranking.
  */
class SuffixMaintainSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def stats3(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  // 15 docs x 5 tokens = 75 suffixes; targetRows = 4 -> ~19 regions
  private val corpus = (1 to 15).map { i =>
    (i.toLong, s"a${i % 4} b${i % 5} c$i d${i % 3} e$i")
  }
  private val doomed = (1L to 10L)
  private val remaining = corpus.filterNot(d => doomed.contains(d._1))

  private def buildShrunk(name: String): Unit = {
    ops.DedupOps.suffixIndexBuild(corpus.toDF("doc_id", "text"), name,
      targetRows = 4).collect()
    // delete rewrites covering regions (ord restarts at 1) and shrinks
    // them well under target -> adjacent regions become mergeable, and
    // merged regions would span write generations
    ops.DedupOps.suffixIndexDelete(corpus.toDF("doc_id", "text"),
      doomed.toDF("doc_id"), name)
  }

  private def ordContiguous(name: String): Boolean = {
    val regBounds = ops.KeyedStore.readRegions(spark, name).regions
      .map(r => (r.min.asInstanceOf[Number].longValue(),
        r.max.asInstanceOf[Number].longValue()))
    val ords = ops.KeyedStore.scan(spark, name, "sp", 0L, Long.MaxValue)
      .select(col("sp"), col("ord")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    regBounds.forall { case (lo, hi) =>
      ords.filter { case (sp, _) => sp >= math.max(0L, lo) && sp <= hi }
        .sliding(2).forall {
          case Array((_, o1), (_, o2)) => o2 == o1 + 1
          case _ => true
        }
    }
  }

  test("suffix-aware merge wrapper: regions coalesce, ordinals stay " +
       "contiguous, warm search/append run with NO heal") {
    val name = "graft_sfx_maint_spec_a"
    try {
      buildShrunk(name)
      val merged = ops.DedupOps.suffixStoreMergeSmallRegions(spark, name)
      assert(merged >= 1, "fixture produced nothing to merge")
      SuffixTestUtil.assertValidIndex(spark, name, remaining)
      val h0 = ops.DedupOps.sfxOrdHeals.get()
      val res = stats3(ops.DedupOps.suffixIndexSearch(
        remaining.toDF("doc_id", "text"), name,
        Seq((1L, Seq("a1", "b1")), (2L, Seq("e11")), (3L, Seq("zz")))
          .toDF("query_id", "q_tokens")))
      assert(res.map(_._1) == Seq(1L, 2L, 3L))
      assert(res.find(_._1 == 2L).get._2 == 1L) // e11 occurs once
      assert(res.find(_._1 == 3L).get._2 == 0L)
      // append through the merged store (exercises both merged
      // sub-stores on the compare side)
      val delta = Seq((99L, "a1 b1 new99"))
      ops.DedupOps.suffixIndexAppend(remaining.toDF("doc_id", "text"),
        delta.toDF("doc_id", "text"), name)
      SuffixTestUtil.assertValidIndex(spark, name, remaining ++ delta)
      assert(ops.DedupOps.sfxOrdHeals.get() == h0,
        "wrapper-maintained store triggered a heal")
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("suffix-aware rebalance wrapper: re-derived regions keep the " +
       "ordinal invariant and serve correctly") {
    val name = "graft_sfx_maint_spec_b"
    try {
      buildShrunk(name)
      val h0 = ops.DedupOps.sfxOrdHeals.get()
      ops.DedupOps.suffixStoreRebalance(spark, name,
        targetRowsPerRegion = 8)
      SuffixTestUtil.assertValidIndex(spark, name, remaining)
      val served = stats3(ops.DedupOps.suffixIndexServe(
        remaining.toDF("doc_id", "text"), name))
      assert(served == stats3(ops.DedupOps.suffixDedupStats(
        remaining.toDF("doc_id", "text"))))
      assert(ops.DedupOps.sfxOrdHeals.get() == h0)
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("RAW KeyedStore merge breaks ord contiguity; warm search detects " +
       "it and self-heals by rebuild instead of mis-ranking") {
    val name = "graft_sfx_maint_spec_c"
    try {
      buildShrunk(name)
      // raw merge, no ordinal transform — the round-16 ADVICE hazard
      val merged = ops.KeyedStore.mergeSmallRegions(spark, name, "sp")
      assert(merged >= 1, "fixture produced nothing to merge")
      assert(!ordContiguous(name),
        "fixture did not break contiguity — the heal path is untested")
      val h0 = ops.DedupOps.sfxOrdHeals.get()
      val res = stats3(ops.DedupOps.suffixIndexSearch(
        remaining.toDF("doc_id", "text"), name,
        Seq((1L, Seq("a1", "b1")), (2L, Seq("e11"))).toDF(
          "query_id", "q_tokens")))
      assert(ops.DedupOps.sfxOrdHeals.get() == h0 + 1,
        "broken ordinals were served without a heal")
      assert(res.find(_._1 == 2L).get._2 == 1L)
      SuffixTestUtil.assertValidIndex(spark, name, remaining)
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }
}
