package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GDPR delete off the durable suffix index
  * (DedupOps.suffixIndexDelete): remove a doc-id set's rows and patch
  * the O(runs) seam links/LCPs so the stored structure is a VALID
  * index of the remaining corpus — referee-validated, serve-identical
  * to a fresh build over the survivors, replay-idempotent, and still
  * appendable/searchable afterwards (including with emptied regions).
  */
class SuffixDeleteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def stats3(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def del(docs: Seq[(Long, String)], ids: Seq[Long],
                  name: String): Unit =
    ops.DedupOps.suffixIndexDelete(docs.toDF("doc_id", "text"),
      ids.toDF("doc_id"), name)

  test("constructed multi-region corpus: delete the corpus-first doc, a " +
       "tie twin, and a mid doc — referee-valid, serve equals a fresh " +
       "build over survivors, re-delete is a byte-identical no-op") {
    val name = "graft_sfx_del_spec_a"
    try {
      val corpus = Seq(
        (1L, "aa ab ac ad"),          // owns the first SA positions
        (2L, "bb cc dd ee ff"),
        (3L, "bb cc dd ee ff"),       // exact duplicate of 2 → ties
        (4L, "cc dd ee xx yy"),
        (5L, "mm nn oo pp"),
        (6L, "zz1 zz2 zz3"))
      val doomed = Seq(1L, 3L, 5L)    // first doc + one tie twin + mid doc
      val remaining = corpus.filterNot(d => doomed.contains(d._1))
      ops.DedupOps.suffixIndexBuild(corpus.toDF("doc_id", "text"), name,
        targetRows = 5).collect()
      del(corpus, doomed, name)
      SuffixTestUtil.assertValidIndex(spark, name, remaining)
      val served = stats3(ops.DedupOps.suffixIndexServe(
        remaining.toDF("doc_id", "text"), name))
      assert(served == stats3(ops.DedupOps.suffixDedupStats(
        remaining.toDF("doc_id", "text"))))
      // replay: already at the post-delete fingerprint → nothing written
      val digests = SuffixTestUtil.fileDigests(spark, name)
      del(corpus, doomed, name)
      assert(SuffixTestUtil.fileDigests(spark, name) == digests,
        "re-delete rewrote files")
      // absent ids against the post-state: also a byte-identical no-op
      del(remaining, Seq(999L), name)
      assert(SuffixTestUtil.fileDigests(spark, name) == digests,
        "deleting absent ids rewrote files")
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("search and append keep working on the patched store — including " +
       "after a delete that empties whole regions") {
    val name = "graft_sfx_del_spec_b"
    try {
      // 'z' vocab clusters at the SA tail: deleting doc 6 empties the
      // trailing region(s) outright (targetRows = 4)
      val corpus = Seq(
        (1L, "a b c d e"),
        (2L, "a b c x y"),
        (3L, "m n o p"),
        (6L, "z1 z2 z3 z4 z5 z6 z7 z8"))
      val remaining = corpus.filterNot(_._1 == 6L)
      ops.DedupOps.suffixIndexBuild(corpus.toDF("doc_id", "text"), name,
        targetRows = 4).collect()
      del(corpus, Seq(6L), name)
      SuffixTestUtil.assertValidIndex(spark, name, remaining)
      // search over the patched (possibly region-gapped) store
      val queries = Seq((10L, Seq("a", "b", "c")), (11L, Seq("z3")),
        (12L, Seq("m", "n")))
      val res = stats3(ops.DedupOps.suffixIndexSearch(
        remaining.toDF("doc_id", "text"), name,
        queries.toDF("query_id", "q_tokens")))
      assert(res == Seq((10L, 2L, 2L), (11L, 0L, 0L), (12L, 1L, 1L)))
      // append into the post-delete store: delete → append compose
      val delta = Seq((9L, "x y z9"))
      ops.DedupOps.suffixIndexAppend(remaining.toDF("doc_id", "text"),
        delta.toDF("doc_id", "text"), name)
      val full = remaining ++ delta
      SuffixTestUtil.assertValidIndex(spark, name, full)
      assert(stats3(ops.DedupOps.suffixIndexServe(
          full.toDF("doc_id", "text"), name)) ==
        stats3(ops.DedupOps.suffixDedupStats(full.toDF("doc_id", "text"))))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("delete everything: the store serves an empty corpus and accepts " +
       "a fresh append afterwards") {
    val name = "graft_sfx_del_spec_c"
    try {
      val corpus = Seq((1L, "a b c"), (2L, "b c d"))
      ops.DedupOps.suffixIndexBuild(corpus.toDF("doc_id", "text"), name)
        .collect()
      del(corpus, Seq(1L, 2L), name)
      assert(ops.KeyedStore.scan(spark, name, "sp", 0L, Long.MaxValue)
        .collect().isEmpty, "data rows survived a delete-all")
      assert(stats3(ops.DedupOps.suffixIndexServe(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), name)).isEmpty)
      val delta = Seq((7L, "q r s"))
      ops.DedupOps.suffixIndexAppend(
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        delta.toDF("doc_id", "text"), name)
      SuffixTestUtil.assertValidIndex(spark, name, delta)
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("bulk delete (most of the corpus): referee-valid, and the patch " +
       "runs NO global window over the doomed mass (plan pin)") {
    val name = "graft_sfx_del_spec_e"
    // force the DISTRIBUTED run-detection path (the driver fast path
    // would swallow this corpus; production crosses over at 2^16 rows)
    val prop = "graft.sfx.delete.driverRuns"
    val saved = sys.props.get(prop)
    sys.props(prop) = "0"
    try {
      // 24 docs, heavy overlap → long doomed runs; delete 16 of 24
      // including the corpus-first doc and whole adjacent spans.
      val corpus = (1 to 24).map { i =>
        (i.toLong, s"w${i % 5}a w${i % 5}b w${i % 7}c mid$i w${i % 3}d")
      }
      val doomed = (1L to 16L).toSeq
      val remaining = corpus.filterNot(d => doomed.contains(d._1))
      ops.DedupOps.suffixIndexBuild(corpus.toDF("doc_id", "text"), name,
        targetRows = 8).collect()
      val plans = new scala.collection.mutable.ArrayBuffer[String]
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          plans.synchronized { plans += qe.executedPlan.toString }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        del(corpus, doomed, name)
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethods.find(m =>
            m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .foreach(_.invoke(bus))
      } finally spark.listenerManager.unregister(listener)
      SuffixTestUtil.assertValidIndex(spark, name, remaining)
      // Skew pin (round-16 verdict item #3): run detection must never
      // funnel the doomed mass through ONE sort partition. The doomed
      // relation's order column is `sp`, so a regression reappears as a
      // GLOBAL window ordered by sp — windowspecdefinition whose FIRST
      // argument is already an ordering on sp (a partitioned window
      // lists its partition columns first). The tiny base-case window
      // inside exclusiveOffsets orders by `key`, not sp, and sees
      // ≤ n/256² rows — intentionally not matched here.
      val snap = plans.synchronized(plans.toList)
      assert(snap.nonEmpty, "listener captured no plans")
      val globalSpWin = "windowspecdefinition\\(sp#\\d+L? ASC".r
      val bad = snap.filter(p => globalSpWin.findFirstIn(p).nonEmpty)
      assert(bad.isEmpty,
        "delete ran a global window over the doomed rows:\n" +
          bad.headOption.getOrElse("").take(2000))
      val served = stats3(ops.DedupOps.suffixIndexServe(
        remaining.toDF("doc_id", "text"), name))
      assert(served == stats3(ops.DedupOps.suffixDedupStats(
        remaining.toDF("doc_id", "text"))))
    } finally {
      saved match {
        case Some(v) => sys.props(prop) = v
        case None => sys.props.remove(prop)
      }
      ops.DedupOps.suffixIndexDrop(spark, name)
    }
  }

  test("fixture slice: delete a modular id set, serve equals computed " +
       "stats over the survivors") {
    val name = "graft_sfx_del_spec_d"
    try {
      val docs = graft.Tables.documents(spark, Sf)
        .filter(col("doc_id") % 3 === 0)
      val doomed = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"))
      val remaining = docs.filter(col("doc_id") % 5 =!= 0)
      ops.DedupOps.suffixIndexBuild(docs, name).collect()
      ops.DedupOps.suffixIndexDelete(docs, doomed, name)
      val served = stats3(ops.DedupOps.suffixIndexServe(remaining, name))
      val stats = stats3(ops.DedupOps.suffixDedupStats(remaining))
      assert(served == stats && served.nonEmpty)
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }
}
