package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SA range search off the durable index (DedupOps.suffixIndexSearch):
  * occurrence and distinct-document counts for query token sequences,
  * pinned against a driver-side brute force on constructed corpora
  * (multi-region, cross-region match ranges, zero-match and
  * everything-matches extremes) and against the quadratic recount on a
  * fixture slice.
  */
class SuffixSearchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def got(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def brute(corpus: Seq[(Long, String)],
                    queries: Seq[(Long, Seq[String])]) =
    queries.sortBy(_._1).map { case (qid, q) =>
      val hits = corpus.flatMap { case (d, t) =>
        val w = t.split(" ", -1).toSeq
        w.indices.collect {
          case i if w.drop(i).take(q.length) == q && w.length - i >= q.length
            => d
        }
      }
      (qid, hits.size.toLong, hits.distinct.size.toLong)
    }

  test("constructed multi-region corpus: counts match brute force, " +
       "including cross-region ranges and both extremes") {
    val name = "graft_sfx_search_spec_a"
    try {
      val corpus = Seq(
        (1L, "a b c d e f"),
        (2L, "a b c x y"),
        (3L, "x a b c d q"),
        (4L, "m n o p"),
        (5L, "a b c d e f"))
      // tiny regions force the "a b c" match range across region
      // boundaries
      ops.DedupOps.suffixIndexBuild(corpus.toDF("doc_id", "text"), name,
        targetRows = 4).collect()
      val queries = Seq(
        (10L, Seq("a", "b", "c")),       // 4 occurrences, 4 docs
        (11L, Seq("a", "b", "c", "d")),  // 3 occurrences, 3 docs
        (12L, Seq("zz")),                // zero matches
        (13L, Seq("m", "n", "o", "p")),  // exactly one whole doc
        (14L, Seq("c")))                 // single-token, many matches
      val res = got(ops.DedupOps.suffixIndexSearch(
        corpus.toDF("doc_id", "text"), name,
        queries.toDF("query_id", "q_tokens")))
      assert(res == brute(corpus, queries))
      // sanity on the hand-counted rows
      assert(res.find(_._1 == 10L).get == ((10L, 4L, 4L)))
      assert(res.find(_._1 == 12L).get == ((12L, 0L, 0L)))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("search works unchanged after an incremental append (sparse keys)") {
    val name = "graft_sfx_search_spec_b"
    try {
      val base = Seq((1L, "a b c d"), (2L, "p q r s"))
      val delta = Seq((9L, "x a b c"), (10L, "q r s t"))
      val full = base ++ delta
      ops.DedupOps.suffixIndexBuild(base.toDF("doc_id", "text"), name,
        targetRows = 4).collect()
      ops.DedupOps.suffixIndexAppend(base.toDF("doc_id", "text"),
        delta.toDF("doc_id", "text"), name)
      val queries = Seq((20L, Seq("a", "b", "c")), (21L, Seq("q", "r", "s")),
        (22L, Seq("t")))
      val res = got(ops.DedupOps.suffixIndexSearch(
        full.toDF("doc_id", "text"), name,
        queries.toDF("query_id", "q_tokens")))
      assert(res == brute(full, queries))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("fixture slice: engine counts equal the quadratic recount") {
    val name = "graft_sfx_search_spec_c"
    try {
      val docs = graft.Tables.documents(spark, Sf)
        .filter(col("doc_id") % 3 === 0)
      val queries = docs
        .filter(col("doc_id") % 12 === 0 && size(ops.TextFns.toks) >= 4)
        .select(col("doc_id").as("query_id"),
          slice(ops.TextFns.toks, 1, 4).as("q_tokens"))
      val res = got(ops.DedupOps.suffixIndexSearch(docs, name, queries))
      val corpus = docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      val qs = queries.collect()
        .map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toSeq
      assert(res == brute(corpus, qs) && res.nonEmpty)
      // every query matches at least its own source document
      assert(res.forall(_._2 >= 1))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("warm search executes NO window/ranking over store rows — the " +
       "stored in-region ordinals serve instead (plan pin)") {
    val name = "graft_sfx_search_spec_d"
    try {
      val corpus = Seq(
        (1L, "a b c d e f"), (2L, "a b c x y"),
        (3L, "x a b c d q"), (4L, "m n o p"), (5L, "a b c d e f"))
      ops.DedupOps.suffixIndexBuild(corpus.toDF("doc_id", "text"), name,
        targetRows = 4).collect()
      val queries = Seq((10L, Seq("a", "b", "c")), (11L, Seq("c")))
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
        val res = got(ops.DedupOps.suffixIndexSearch(
          corpus.toDF("doc_id", "text"), name,
          queries.toDF("query_id", "q_tokens")))
        assert(res == brute(corpus, queries))
        // drain the async listener bus (private[spark] — reflection)
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethods.find(m =>
            m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
          .foreach(_.invoke(bus))
      } finally spark.listenerManager.unregister(listener)
      val snap = plans.synchronized(plans.toList)
      // capture must have seen the search's actions, and none of them
      // may contain a Window exec — the ranking stage the stored
      // ordinals replaced (round-15 verdict item #5)
      assert(snap.size >= 3, s"listener captured only ${snap.size} plans")
      val windowed = snap.filter(_.contains("Window"))
      assert(windowed.isEmpty,
        s"search ran a window stage:\n${windowed.headOption.getOrElse("")}")
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("NESTED two-level boundary routing (fanout forced low) gives " +
       "identical search results and a valid appended store") {
    val name = "graft_sfx_search_spec_e"
    val prop = "graft.sfx.route.fanout"
    val saved = sys.props.get(prop)
    try {
      // 17 docs × ~6 tokens at targetRows = 4 → ~25 regions, far above
      // the forced fanout of 4 → the block descent actually runs
      sys.props(prop) = "4"
      val base = (1 to 15).map(i =>
        (i.toLong, s"w${i}a w${i}b w${i}c shared${i % 3} tail$i"))
      val extra = Seq((40L, "w3a w3b w3c shared0 zz"),
        (41L, "shared1 shared2 q r"))
      val full = base ++ extra
      ops.DedupOps.suffixIndexBuild(base.toDF("doc_id", "text"), name,
        targetRows = 4).collect()
      // append routes through the nested descent
      ops.DedupOps.suffixIndexAppend(base.toDF("doc_id", "text"),
        extra.toDF("doc_id", "text"), name)
      SuffixTestUtil.assertValidIndex(spark, name, full)
      // search routes through the nested descent; brute-force pinned
      val queries = Seq((100L, Seq("w3a", "w3b")), (101L, Seq("shared0")),
        (102L, Seq("zz")), (103L, Seq("nope")))
      val res = got(ops.DedupOps.suffixIndexSearch(
        full.toDF("doc_id", "text"), name,
        queries.toDF("query_id", "q_tokens")))
      assert(res == brute(full, queries))
      assert(res.find(_._1 == 101L).get._2 >= 6L) // shared0 is common
    } finally {
      saved match {
        case Some(v) => sys.props(prop) = v
        case None => sys.props.remove(prop)
      }
      ops.DedupOps.suffixIndexDrop(spark, name)
    }
  }
}
