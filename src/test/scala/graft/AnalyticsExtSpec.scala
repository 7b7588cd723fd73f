package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + brute-force-parity tests for the analytics extensions added
  * after the round-4 verdict (RFM segmentation, association rules, Benford
  * audit, CUSUM changepoint, day-of-week heatmap, median/MAD). Each is
  * also hash-exact against its DuckDB oracle via the driver gate; these
  * pin the algebraic properties the oracle compare can't see.
  */
class AnalyticsExtSpec extends AnyFunSuite {
  import TestSpark._

  test("rfm: segment census partitions customers; scores in 1..5 and balanced") {
    val segs = ops.AnalyticsOps.qRfmSegments(spark, Sf).collect()
    val nCust = graft.Tables.orders(spark, Sf)
      .select(col("o_custkey")).distinct().count()
    assert(segs.map(_.getLong(3)).sum == nCust)
    segs.foreach { r =>
      (0 to 2).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 5))
    }
    // Each quintile's marginal size must be the exact NTILE share:
    // ceil(n/5) for the first n%5 buckets, floor(n/5) after.
    def marginal(i: Int) =
      segs.groupBy(_.getInt(i)).view.mapValues(_.map(_.getLong(3)).sum).toMap
    val (q, m) = (nCust / 5, nCust % 5)
    (0 to 2).foreach { dim =>
      val sizes = marginal(dim)
      (1 to 5).foreach { b =>
        assert(sizes(b) == (if (b <= m) q + 1 else q), s"dim $dim bucket $b")
      }
    }
  }

  test("assoc rules: confidence bounds, pair symmetry, support consistency") {
    val rules = ops.AnalyticsOps.qAssocRules(spark, Sf).collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      val (c12, cA, cC) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(c12 >= 2 && c12 <= math.min(cA, cC))
      assert(r.getLong(5) == c12 * 1000000L / cA)       // conf_ppm
      assert(r.getLong(5) <= 1000000L)
    }
  }

  test("benford: digits 1..9 only, counts conserve positive orders") {
    val rows = ops.AnalyticsOps.qBenford(spark, Sf).collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    val nPos = graft.Tables.orders(spark, Sf)
      .filter(round(col("o_totalprice") * 100) > 0).count()
    assert(rows.map(_.getLong(1)).sum == nPos)
    // ppm shares are truncating divisions of the same total.
    val tot = rows.map(_.getLong(1)).sum
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1) * 1000000L / tot))
  }

  test("cusum changepoint: parity with a driver-side brute force per type") {
    val got = ops.EventOps.qCusumChangepoint(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val daily = graft.Tables.events(spark, Sf)
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val total = sorted.map(_._3).sum
      val n = sorted.length.toLong
      var acc = 0L
      val cs = sorted.map { case (_, d, c) => acc += c * n - total; (d, acc) }
      t -> cs.minBy { case (d, s) => (-math.abs(s), d) }
    }
    assert(got == expected)
  }

  test("dow heatmap: buckets match Spark's calendar dayofweek/hour in UTC") {
    val n = ops.EventOps.qDowHourHeatmap(spark, Sf)
      .agg(sum("n")).head.getLong(0)
    assert(n == graft.Tables.events(spark, Sf).count())
    // Cross-check the epoch arithmetic against the calendar functions:
    // dow 0=Sunday..6=Saturday must equal dayofweek(ts)-1 in a UTC session.
    val mismatch = graft.Tables.events(spark, Sf)
      .select(expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"),
              (dayofweek(col("ts")) - 1).as("cal"),
              expr("(unix_micros(ts) div 3600000000) % 24").as("hour"),
              hour(col("ts")).as("cal_h"))
      .filter(col("dow") =!= col("cal") || col("hour") =!= col("cal_h"))
      .count()
    assert(mismatch == 0)
  }

  test("mad: parity with in-driver exact median of |x - med| per type") {
    val got = ops.EventOps.qMadRobust(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val vals = graft.Tables.events(spark, Sf)
      .select(col("event_type"), col("event_id"),
              expr("cast(round(value * 100) as bigint)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      s((n - 1) / 2) + s(n / 2)
    }
    vals.groupBy(_._1).foreach { case (t, rows) =>
      val m2 = med2(rows.sortBy(r => (r._3, r._2)).map(_._3))
      val devs = rows.map(r => math.abs(r._3 * 2 - m2))
      val mad4 = med2(devs.sortBy(identity).toIndexedSeq)
      assert(got(t) == ((rows.size.toLong, m2, mad4)), s"type $t")
    }
  }
}
