package graft

import org.apache.spark.sql.functions._
import org.scalatest.concurrent.TimeLimits
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.time.{Seconds, Span}

/** Regression guards for the round-14 exponential-stats-inheritance
  * fix (GraftCheckpointBridge): every iterative checkpoint loop whose
  * round references the previous leaf ≥ 2× must survive DEEP iteration
  * counts. Before the fix, each such loop compounded its checkpoint
  * leaf's inherited sizeInBytes DIGITS by the reference count per
  * round — at the depths below the driver hung for hours in
  * BigInteger math inside JoinSelection (measured: 5.6M digits by
  * round 6 of the suffix deskew loop). The time limits are generous
  * (the healthy runs take a few seconds each); a reintroduced
  * inheritance path blows past them by orders of magnitude.
  */
class DeepIterationSpec extends AnyFunSuite with TimeLimits {
  import TestSpark._
  import spark.implicits._

  test("pageRank survives 25 iterations (2 leaf refs/round) — a cycle stays uniform") {
    // 24-node directed cycle: stationary distribution is uniform, so
    // every iterate is the exact initial vector — any depth converges
    // to the same exact-integer ranks.
    val n = 24
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong, 1L))
      .toDF("src", "dst", "wgt")
    val pr = failAfter(Span(120, Seconds)) {
      ops.GraphOps.pageRank(edges, iters = 25).collect()
    }
    assert(pr.length == n)
    val vals = pr.map(_.getLong(1)).distinct
    assert(vals.length == 1 && vals.head == 1000000L / n)
  }

  test("kCore survives a 16-round peel (5 leaf refs/round) — a path has no 2-core") {
    // A 34-node path peels one endpoint pair per round at k = 2: the
    // fixpoint needs 17 real rounds, comfortably past the depth where
    // the inheriting checkpoint hung the driver.
    val path = (0L until 33L).map(i => (i, i + 1)).toDF("u", "v")
    val out = failAfter(Span(180, Seconds)) {
      ops.GraphOps.kCore(path, k = 2, rounds = 20).collect()
    }
    assert(out.isEmpty, s"a path graph has no 2-core, got ${out.length} edges")
  }

  test("kTruss survives a 12-round peel (8 leaf refs/round) — triangle chain") {
    // A strip of triangles sharing edges: every edge of the strip sits
    // in >= 1 triangle, so the 3-truss keeps the whole strip; rounds
    // past the round-2 fixpoint are no-ops — the cap exercises DEPTH
    // (12 planning rounds of the truss tree), the assert pins content.
    val strip = (0L until 12L).flatMap { i =>
      Seq((i, i + 1), (i, i + 2))
    } :+ (12L, 13L)
    val und = strip.toDF("u", "v")
    val out = failAfter(Span(180, Seconds)) {
      ops.GraphOps.kTruss(und, k = 3, rounds = 12).collect()
    }
    // every (i, i+1)/(i, i+2) edge with both triangle mates present survives
    assert(out.nonEmpty && out.forall(_.getLong(2) >= 1))
  }

  test("dedupClusters survives a deep pointer-jump chain (4 leaf refs/round)") {
    // One 2000-node dup CHAIN: min-label propagation + pointer jumping
    // needs ~log2(diameter) ≈ 11 rounds — the deep-graph depth at which
    // the inheriting checkpoint (4 leaf refs/round) used to blow up the
    // planner. Everything must land in cluster 0.
    val pairs = (0L until 1999L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = failAfter(Span(240, Seconds)) {
      ops.DedupOps.dedupClusters(pairs).collect()
    }
    assert(out.length == 2000)
    assert(out.forall(_.getLong(1) == 0L),
      "chain must collapse to one cluster rooted at the min label")
  }
}
