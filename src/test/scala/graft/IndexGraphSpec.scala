package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-3 operators: degree-ordered triangle counting, SCD Type-2 history,
  * the inverted index (+ the conjunctive AND-query it exists for), exact
  * stratified sampling, and fixed-window substring duplication.
  */
class IndexGraphSpec extends AnyFunSuite {
  import TestSpark._

  test("LPA: two disjoint triangles each converge to their min label") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
                  (10L, 11L), (10L, 12L), (11L, 12L)).toDF("u", "v")
    val out = ops.GraphOps.lpaCommunities(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                      10L -> 10L, 11L -> 10L, 12L -> 10L), out.toString)
  }

  test("LPA equals a driver-side synchronous reference run") {
    val es = ops.GraphOps.copurchaseEdges(spark, Sf, minOrders = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = es.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 3).foreach { _ =>
      lbl = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lbl).view.mapValues(_.size)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val rows = ops.GraphOps.qLpaCommunities(spark, Sf).collect()
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lbl)
    val sizes = lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach(r => assert(r.getLong(2) == sizes(r.getLong(1)), r.toString))
  }

  test("k-core: triangle + pendant chain peels to the triangle in 2 rounds") {
    import spark.implicits._
    // Triangle {1,2,3} plus chain 3-4-5: round 1 drops 5 (deg 1), round 2
    // drops 4 (its degree fell to 1 when 5 left) — the cascade a
    // single-pass degree filter misses; round 3 is the no-op fixpoint.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val out = ops.GraphOps.kCore(und, k = 2, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), out.toString)
  }

  test("k-core: early stop at the fixpoint — extra rounds change nothing") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val r3 = ops.GraphOps.kCore(und, k = 2, rounds = 3).collect()
      .map(_.toString).sorted.toSeq
    val r10 = ops.GraphOps.kCore(und, k = 2, rounds = 10).collect()
      .map(_.toString).sorted.toSeq
    assert(r3 == r10)
    // Cap-independence on the real fixture graph: the adaptive row's
    // generous cap (64) and a just-sufficient round count agree exactly
    // (the q_kcore_full oracle contract).
    val full = ops.GraphOps.qKcoreFull(spark, Sf).collect()
      .map(_.toString).toSeq
    val r8 = ops.GraphOps.kCore(
        ops.GraphOps.copurchaseEdges(spark, Sf, minOrders = 2),
        k = 2, rounds = 8)
      .orderBy(org.apache.spark.sql.functions.col("node")).collect()
      .map(_.toString).toSeq
    assert(full == r8)
  }

  test("k-truss: K4 + hanging triangle — 4-truss keeps only K4; " +
       "3-truss keeps both with correct supports") {
    import spark.implicits._
    // K4 over {1,2,3,4} (each edge in 2 triangles) + triangle {4,5,6}
    // attached at node 4 (each of its edges in exactly 1 triangle).
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
                  (4L, 5L), (4L, 6L), (5L, 6L)).toDF("u", "v")
    val t4 = ops.GraphOps.kTruss(und, k = 4, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t4.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
                            (2L, 4L), (3L, 4L)), t4.toString)
    assert(t4.values.forall(_ == 2L), s"K4 edges must each sit in 2 triangles: $t4")
    val t3 = ops.GraphOps.kTruss(und, k = 3, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(t3.size == 9 && t3((4L, 5L)) == 1L && t3((1L, 2L)) == 2L, t3.toString)
  }

  test("k-truss: a triangle-free graph peels to nothing; extra rounds idle") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v") // C4
    assert(ops.GraphOps.kTruss(und, k = 3, rounds = 5).count() == 0L)
  }

  test("k-core: a tree has an empty 2-core") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(ops.GraphOps.kCore(und, k = 2, rounds = 4).count() == 0L)
  }

  test("triangle count: known graph (K4 + pendant) has exactly 4 triangles") {
    import spark.implicits._
    // K4 over {1,2,3,4} (4 triangles) plus pendant edge 4-5 (no new ones).
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
                  (4L, 5L)).toDF("u", "v")
    val r = ops.GraphOps.triangleCount(und).collect().head
    assert(r.getAs[Long]("n_nodes") == 5L)
    assert(r.getAs[Long]("n_edges") == 7L)
    assert(r.getAs[Long]("n_triangles") == 4L)
  }

  test("triangle count: fixture result matches driver-side brute force") {
    val und = graft.Tables.lineitem(spark, Sf).select("l_orderkey", "l_suppkey")
      .join(graft.Tables.orders(spark, Sf).select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(spark, Sf).select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.supplier(spark, Sf).select("s_suppkey", "s_nationkey"),
            col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).cast("long").as("u"),
              greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("v"))
      .distinct()
    val edges = und.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(e => Set(e._1, e._2))
    // nodes.iterator, not nodes: an inner Set generator would dedup the
    // yielded 1s and count edges-with-any-triangle instead of triangles.
    val brute = (for {
      (x, y) <- edges.iterator
      z <- nodes.iterator
      if z > y && edges((y, z)) && edges((x, z))
    } yield 1).size
    val r = ops.GraphOps.qTriangleCount(spark, Sf).collect().head
    assert(r.getAs[Long]("n_nodes") == nodes.size.toLong)
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    assert(r.getAs[Long]("n_triangles") == brute.toLong)
  }

  test("scd2: versions tile the timeline, one open current row per user") {
    val rows = ops.EventOps.qScd2(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
                 r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
                 r.getBoolean(5)))
    val byUser = rows.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (_, hist) =>
      val sorted = hist.sortBy(_._2)
      // Versions are 1..n consecutive.
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      // Exactly one current (open-ended) row, and it is the last version.
      assert(sorted.count(_._6) == 1 && sorted.last._6 && sorted.last._5.isEmpty)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), "to_us must equal next from_us")
          assert(a._3 != b._3, "consecutive versions must differ in attr")
        case _ =>
      }
    }
  }

  test("inverted index: conjunctive AND-query via posting join matches scan") {
    val docs = graft.Tables.documents(spark, Sf)
    val idx = ops.TextOps.qInvertedIndex(spark, Sf).collect()
    assert(idx.nonEmpty)
    // df is a true document frequency: bounded by corpus size, >= 10%.
    val n = docs.count()
    idx.foreach { r =>
      val df = r.getAs[Long]("df")
      assert(df * 10 >= n && df <= n)
    }
    // AND-query the two highest-df tokens through the posting lists.
    val Array(t1, t2) = idx.sortBy(r => (-r.getAs[Long]("df"), r.getString(0)))
      .take(2).map(_.getString(0))
    val posts = ops.TextOps.postings(docs)
    val viaIndex = posts.filter(col("token") === t1).select("doc_id")
      .join(posts.filter(col("token") === t2).select("doc_id"), Seq("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val viaScan = docs
      .filter(array_contains(split(col("text"), " "), t1) &&
              array_contains(split(col("text"), " "), t2))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaIndex == viaScan && viaIndex.nonEmpty)
  }

  test("stratified sample: exact ceil(20%) per language stratum") {
    val totals = graft.Tables.documents(spark, Sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = ops.TextOps.qStratifiedSample(spark, Sf).collect()
    val byLang = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byLang.keySet == totals.keySet)
    totals.foreach { case (lang, n) =>
      assert(byLang(lang).toLong == (n + 4) / 5, s"stratum $lang")
    }
    // Deterministic: same selection on a second run.
    val again = ops.TextOps.qStratifiedSample(spark, Sf).collect()
      .map(_.getLong(0)).toSet
    assert(again == got.map(_.getLong(0)).toSet)
  }

  test("substring dedup: planted shared span is found, unique doc is clean") {
    import spark.implicits._
    val shared = ("the quick brown fox jumps over the lazy dog again and again " +
      "until sixty chars").take(60)
    val docs = Seq(
      (1L, shared + " tail one with extra distinct words here"),
      (2L, shared + " a completely different continuation text"),
      (3L, "entirely unrelated document content with no overlap at all padded long enough")
    ).toDF("doc_id", "text")
    val r = ops.DedupOps.substrDupStats(docs).collect()
      .map(x => x.getLong(0) -> (x.getAs[Long]("n_win"), x.getAs[Long]("n_dup"))).toMap
    // Windows at 1 and 21 lie inside the shared 60-char prefix for both docs.
    assert(r(1L)._2 >= 2 && r(2L)._2 >= 2)
    assert(r(3L)._2 == 0)
    // Window count is the closed-form len/stride count.
    val lens = docs.select(length(col("text"))).collect().map(_.getInt(0))
    val expectedWins = lens.map(l => ((math.max(l - 39, 1) - 1) / 20) + 1)
    assert(r.values.map(_._1).sum == expectedWins.map(_.toLong).sum)
  }

  test("pagerank: 20 iterations with bounded lineage; tolPpm early-stop") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "a", 1L),
                    ("a", "c", 3L), ("d", "a", 1L)).toDF("src", "dst", "wgt")
    // Per-round localCheckpoint keeps the plan one round deep: 20 rounds
    // must not accumulate lineage (this hung / blew analysis budgets with
    // the unbounded chain). Bound check: the final plan mentions at most
    // one Join chain, not 20 nested ones.
    val pr20 = ops.GraphOps.pageRank(edges, iters = 20)
    val planLines = pr20.queryExecution.optimizedPlan.toString.linesIterator.size
    assert(planLines < 40, s"plan unexpectedly deep: $planLines lines")
    // Driver-side reference at 20 rounds (same integer arithmetic).
    val es = Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "a", 1L),
                 ("a", "c", 3L), ("d", "a", 1L))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val outW = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var ref = nodes.map(_ -> 1000000L / n).toMap
    (1 to 20).foreach { _ =>
      val in = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      es.foreach { case (s, d, w) => in(d) += ref(s) * w / outW(s) }
      ref = nodes.map(v => v -> (150000L / n + 850000L * in(v) / 1000000L)).toMap
    }
    assert(pr20.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == ref)
    // A huge tolerance converges after round 1: identical to iters = 1.
    val one = ops.GraphOps.pageRank(edges, iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val early = ops.GraphOps.pageRank(edges, iters = 20, tolPpm = Long.MaxValue)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(early == one)
  }
}
