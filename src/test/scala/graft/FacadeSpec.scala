package graft

import org.scalatest.funsuite.AnyFunSuite

/** The parameterized Graft facade on NON-fixture relations — proves the
  * cores are generic, not coupled to the driver fixture schemas.
  */
class FacadeSpec extends AnyFunSuite {
  import TestSpark._

  test("skyline on hand-built points") {
    import spark.implicits._
    // (5,1) dominated by (5,3); (3,2) dominated by (5,3); (1,9) and (5,3)
    // and (4,4) are the frontier; (4,4) vs (5,3): neither dominates.
    val pts = Seq((1L, 5L, 1L), (2L, 5L, 3L), (3L, 3L, 2L), (4L, 1L, 9L),
                  (5L, 4L, 4L)).toDF("id", "x", "y")
    val r = Graft.skyline(pts, "id", "x", "y").collect()
      .map(x => x.getAs[Long]("id")).toSet
    assert(r == Set(2L, 4L, 5L))
  }

  test("groupMedian on hand-built groups (odd and even sizes)") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 31L),
                 ("b", 4L, 5L), ("b", 5L, 7L)).toDF("k", "tie", "v")
    val r = Graft.groupMedian(df, "k", "v", "tie").collect()
      .map(x => x.getAs[String]("k") -> x.getAs[Long]("med2_c")).toMap
    assert(r == Map("a" -> 40L, "b" -> 12L)) // 2*20 and 5+7
  }

  test("peakConcurrency on hand-built intervals") {
    import spark.implicits._
    // [0,10) [5,15) [9,12) overlap 3-deep at t=9; [20,30) alone.
    val iv = Seq((0L, 10L), (5L, 15L), (9L, 12L), (20L, 30L)).toDF("s", "e")
    val r = Graft.peakConcurrency(iv).collect().head
    assert(r.getAs[Long]("n_sessions") == 4L)
    assert(r.getAs[Long]("peak") == 3L)
    assert(r.getAs[Long]("peak_ts_us") == 9L)
  }

  test("peakConcurrency: touching intervals do not double-count") {
    import spark.implicits._
    val iv = Seq((0L, 10L), (10L, 20L)).toDF("s", "e")
    val r = Graft.peakConcurrency(iv).collect().head
    assert(r.getAs[Long]("peak") == 1L)
  }

  test("copurchasePairs on hand-built baskets") {
    import spark.implicits._
    val items = Seq((1L, 10L), (1L, 11L), (1L, 10L), (2L, 10L), (2L, 11L),
                    (3L, 10L), (3L, 12L)).toDF("b", "i")
    val r = Graft.copurchasePairs(items, "b", "i").collect()
      .map(x => (x.getAs[Long]("p1"), x.getAs[Long]("p2")) ->
        x.getAs[Long]("n_orders")).toMap
    assert(r == Map((10L, 11L) -> 2L, (10L, 12L) -> 1L))
  }

  test("quantileThresholdFilter drops the exact bottom half when asked") {
    import spark.implicits._
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 4L))
      .toDF("grp", "tie", "score")
    val kept = Graft.quantileThresholdFilter(df, "grp", "score", "tie", 1, 2)
      .collect().map(_.getAs[Long]("score")).toSet
    assert(kept == Set(3L, 4L))
  }

  test("sessionIntervals splits on the gap and pads the end") {
    import spark.implicits._
    val df = Seq((7L, 0L), (7L, 50L), (7L, 200L)).toDF("k", "t")
    val r = Graft.sessionIntervals(df, "k", "t", 100L).collect()
      .map(x => (x.getAs[Long]("s"), x.getAs[Long]("e"))).toSet
    assert(r == Set((0L, 150L), (200L, 300L)))
  }

  test("keyed-store facade: create, get, scan, upsert, normalize, drop") {
    import spark.implicits._
    val name = "graft_facade_keyed"
    Graft.keyedCreate(spark, name,
      (0L until 64L).map(i => (i, s"v$i")).toDF("k", "v"), "k",
      targetRowsPerRegion = 16)
    assert(Graft.keyedGet(spark, name, "k", Seq(7L, 9L)).count() == 2)
    assert(Graft.keyedScan(spark, name, "k", 10L, 20L).count() == 11)
    Graft.keyedUpsert(spark, name, "k",
      Seq((7L, "U", "v7b"), (100L, "I", "v100")).toDF("k", "op", "v"))
    assert(Graft.keyedGet(spark, name, "k", Seq(7L, 100L))
      .collect().map(_.getString(1)).toSet == Set("v7b", "v100"))
    Graft.keyedMergeInto(spark, name, "k",
      Seq((100L, "v100c")).toDF("k", "v"),
      (a, b) => {
        import org.apache.spark.sql.functions.{col, max}
        a.unionByName(b).groupBy(col("k")).agg(max(col("v")).as("v"))
      })
    assert(Graft.keyedGet(spark, name, "k", Seq(100L))
      .collect().map(_.getString(1)).toSeq == Seq("v100c"))
    Graft.keyedUpsert(spark, name, "k",
      (0L until 64L by 2).map(k => (k, "D", "x")).toDF("k", "op", "v"))
    Graft.keyedMergeSmallRegions(spark, name, "k")
    // 32 surviving odd keys (1..63) plus the inserted 100.
    assert(Graft.keyedScan(spark, name, "k", 0L, 200L).count() == 33)
    Graft.keyedDrop(spark, name)
  }

  test("retrieval/governance facade methods dispatch to their operators") {
    import spark.implicits._
    // LPA: the hand-traced two-triangle fixture, via the facade.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
                  (10L, 11L), (10L, 12L), (11L, 12L)).toDF("u", "v")
    val lpa = Graft.lpaCommunities(und).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                      10L -> 10L, 11L -> 10L, 12L -> 10L))
    // Drift: a verbatim-copy delta is exactly zero PSI, via the facade.
    val base = (0L until 20L).map { i =>
      (i, Array.tabulate(4)(j => (math.cos(i * 3 + j) * 10).toFloat))
    }
    val embs = (base ++ base.map { case (i, v) => (i + 100L, v) })
      .toDF("vec_id", "embedding")
    val drift = Graft.embeddingDrift(embs,
      org.apache.spark.sql.functions.col("vec_id") >= 100,
      numCentroids = 2).collect()
    assert(drift.forall(r => !r.isNullAt(3) && r.getLong(3) == 0L))
    // Feature hash: digest parity with the op (same defaults).
    val docs = Seq((1L, "x y x")).toDF("doc_id", "text")
    assert(Graft.featureHash(docs).collect().toSeq ==
      ops.TextOps.featureHash(docs).collect().toSeq)
  }

  test("keyedMergeInto surfaces the fenced-writer contract to facade callers") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    val name = "graft_facade_fenced"
    Graft.keyedCreate(spark, name,
      (0L until 32L).map(i => (i, 0L)).toDF("k", "n"), "k",
      targetRowsPerRegion = 8)
    val rm = ops.KeyedStore.readRegions(spark, name)
    val kr = rm.regions(rm.coverageIdx(0L)).kr
    val lock = ops.KeyedStore.location(spark, name)
      .resolveSibling(name + s".region-$kr.graft-lock")
    val prevBeat = ops.KeyedStore.LockHeartbeatMs
    ops.KeyedStore.LockHeartbeatMs = 100L
    try {
      // A foreign claimant usurps the region lock mid-merge: the facade
      // call must throw the documented IllegalStateException — the
      // contract Graft.keyedMergeInto's scaladoc tells callers to handle
      // — and never report a clean result.
      val ex = intercept[IllegalStateException] {
        Graft.keyedMergeInto(spark, name, "k",
          Seq((0L, 1L)).toDF("k", "n"),
          (a, b) => {
            java.nio.file.Files.write(lock, "usurper".getBytes("UTF-8"))
            Thread.sleep(600)
            a.unionByName(b).groupBy(col("k")).agg(sum(col("n")).as("n"))
          })
      }
      assert(ex.getMessage.contains("fenced"), s"wrong failure: $ex")
    } finally {
      ops.KeyedStore.LockHeartbeatMs = prevBeat
      java.nio.file.Files.deleteIfExists(lock)
      Graft.keyedDrop(spark, name)
    }
  }
}
