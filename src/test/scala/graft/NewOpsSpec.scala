package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + independent-recomputation tests for the round-5 additions
  * (EWMA smoothing, BFS shortest paths, PIVOT, sequence packing, BPE merge
  * stats, mutual information, kNN label smoothing, next-event examples).
  * Each operator is also hash-exact against its DuckDB oracle via the
  * driver gate; these tests pin the algebraic properties the oracle can't
  * see (conservation laws, frame boundaries, brute-force parity on small
  * inputs).
  */
class NewOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("ewma: den saturates at 255 after 8 events, ewma_c inside history hull") {
    val rows = ops.EventOps.qEwmaSmooth(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { es =>
      es.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(5) == (if (i >= 7) 255L else 256L - (128L >> i)),
          s"den at position $i")
        val hist = es.take(i + 1).takeRight(8).map(_.getLong(3))
        assert(r.getLong(6) >= hist.min - 1 && r.getLong(6) <= hist.max,
          "truncated weighted mean must stay inside the history hull")
      }
    }
  }

  test("shortest paths: parity with hand BFS on a two-component graph") {
    val und = spark.createDataFrame(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 6L), (7L, 8L)))
      .toDF("u", "v")
    val src = spark.createDataFrame(Seq(Tuple1(1L))).toDF("node")
    val got = ops.GraphOps.shortestPaths(und, src, maxHops = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 6L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("pivot cells sum to the per-priority total") {
    val p = ops.RelationalOps.qPivot(spark, Sf).collect()
    val direct = graft.Tables.orders(spark, Sf)
      .groupBy(col("o_orderpriority"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p.nonEmpty)
    p.foreach { r =>
      val cells = (1 to 3).map(i => if (r.isNullAt(i)) 0L else r.getLong(i)).sum
      assert(cells == direct(r.getString(0)))
    }
  }

  test("seq pack: token mass conserved, bins increasing, doc spans disjoint") {
    val bins = ops.TextOps.qSeqPack(spark, Sf).collect()
    val total = graft.Tables.documents(spark, Sf)
      .agg(sum(expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))")))
      .head.getLong(0)
    assert(bins.map(_.getLong(2)).sum == total)
    assert(bins.head.getLong(0) == 0L)
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(0) < b.getLong(0), "bins strictly increasing")
        assert(a.getLong(4) < b.getLong(3), "doc id spans must be disjoint")
      case _ =>
    }
  }

  test("bpe merges: top pair mass equals direct corpus bigram count") {
    val top = ops.TextOps.qBpeMerges(spark, Sf).collect()
    assert(top.length == 20 &&
      top.sliding(2).forall(p => p(0).getLong(1) >= p(1).getLong(1)))
    val (pair, n) = (top.head.getString(0), top.head.getLong(1))
    val direct = graft.Tables.documents(spark, Sf)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .filter(expr("substr(w, i, 2)") === pair)
      .count()
    assert(direct == n)
  }

  test("mutual info: cells sum to total; corpus MI non-negative") {
    val cells = ops.TextOps.qMutualInfo(spark, Sf).collect()
    val n = cells.head.getLong(5)
    assert(cells.map(_.getLong(2)).sum == n)
    val mi = cells.map(r => r.getLong(2).toDouble / n * r.getLong(6) / 1e6).sum
    assert(mi >= -1e-6, s"corpus MI must be non-negative up to rounding, got $mi")
  }

  test("label smooth: n_agree in [1,k], changed consistent with labels") {
    val rows = ops.SimilarityOps.qLabelSmooth(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 1 && r.getLong(3) <= 5)
      assert(r.getInt(4) == (if (r.getInt(1) != r.getInt(2)) 1 else 0))
    }
    assert(rows.exists(_.getInt(4) == 0), "some labels should be stable")
  }

  test("random walks: transitions follow edges, deterministic, full length") {
    val und = spark.createDataFrame(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
      .toDF("u", "v")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    def run() = ops.GraphOps.randomWalks(und, steps = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rows = run()
    assert(rows.length == 4 * 5, "every node starts one full-length walk")
    rows.groupBy(_._1).values.foreach { w =>
      val path = w.sortBy(_._2).map(_._3)
      assert(path.length == 5)
      assert(path.head == w.head._1, "step 0 is the start node")
      path.sliding(2).foreach {
        case Array(a, b) => assert(edges.contains((a, b)), s"$a->$b not an edge")
        case _ =>
      }
    }
    assert(run().sortBy(r => (r._1, r._2)).toSeq ==
      rows.sortBy(r => (r._1, r._2)).toSeq, "walks must be deterministic")
  }

  test("token zipf: exact num/den parity with a driver-side recomputation") {
    val row = ops.TextOps.qTokenZipf(spark, Sf).head()
    val counts = graft.Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(100)
    val xy = counts.zipWithIndex.map { case ((_, c), i) =>
      (math.round(math.log(i + 1.0) * 1e6), math.round(math.log(c.toDouble) * 1e6))
    }
    val n = xy.length.toLong
    val num = n * xy.map(p => p._1 * p._2).sum - xy.map(_._1).sum * xy.map(_._2).sum
    val den = n * xy.map(p => p._1 * p._1).sum - xy.map(_._1).sum * xy.map(_._1).sum
    assert(row.getLong(0) == n && row.getLong(1) == num && row.getLong(2) == den)
    assert(row.getDouble(3) < 0, "natural text has a negative Zipf slope")
  }

  test("next-event examples: trailing-window counts sum to window size") {
    val rows = ops.EventOps.qNextEventExamples(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { es =>
      es.zipWithIndex.foreach { case (r, i) =>
        val fsum = (3 to 7).map(r.getLong).sum
        assert(fsum == math.min(i + 1, 5),
          "per-type counts must cover exactly the trailing window")
        assert(r.getString(8) != null)
      }
    }
  }
}
