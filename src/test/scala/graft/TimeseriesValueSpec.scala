package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave-4 operators: gap-filled resample, cumulative new users, market-
  * basket co-purchase pairs, equi-depth spend deciles, and the exact
  * order-statistic quantile filter.
  */
class TimeseriesValueSpec extends AnyFunSuite {
  import TestSpark._

  test("resample: grid is dense per type, aggregates conserve event mass") {
    val r = ops.EventOps.qEventsResample(spark, Sf).collect()
    val hourUs = 3600000000L
    // Dense: per event_type the hour buckets are consecutive.
    r.groupBy(_.getAs[String]("event_type")).foreach { case (_, rows) =>
      val hbs = rows.map(_.getAs[Long]("hb")).sorted
      assert(hbs.zip(hbs.tail).forall { case (a, b) => b - a == hourUs })
    }
    // Conservation: total n equals the raw event count.
    val total = r.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, Sf).count())
    // The grid exists to add silent hours: at least one zero row.
    assert(r.exists(_.getAs[Long]("n") == 0L))
  }

  test("M4 downsample equals a driver recompute; buckets bounded; " +
       "point mass conserves") {
    val raw = ops.EventOps.qM4Downsample(spark, Sf) // materializes extent too
    val ev = Tables.events(spark, Sf)
      .selectExpr("event_type", "event_id", "unix_micros(ts) as ts_us",
        "cast(round(value * 100) as bigint) as value_c")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val t0 = ev.map(_._3).min
    val span = ev.map(_._3).max - t0 + 1
    val expected = ev.groupBy(e => (e._1, (e._3 - t0) * 32 / span)).map {
      case ((ty, b), rows) =>
        val first = rows.minBy(e => (e._3, e._2))
        val last = rows.maxBy(e => (e._3, e._2))
        val mn = rows.minBy(e => (e._4, e._3, e._2))
        val mx = rows.maxBy(e => (e._4, e._3, e._2))
        (ty, b) -> ((rows.length.toLong, first._3, first._4, last._3, last._4,
                     mn._3, mn._4, mx._3, mx._4))
    }
    val got = raw.collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10)))
    }.toMap
    assert(got == expected,
      s"diff=${(expected.toSet -- got.toSet).take(2)}")
    assert(got.keys.map(_._2).forall(b => b >= 0 && b < 32))
    assert(got.values.map(_._1).sum == ev.length.toLong, "point mass lost")
  }

  test("temporal split: exact 70/15/15 rank sizes, time-disjoint, conserves") {
    val rows = ops.EventOps.qTemporalSplit(spark, Sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val n = rows.values.map(_._1).sum
    val nTrain = n * 70 / 100
    val nVal = n * 85 / 100 - nTrain
    assert(rows("train")._1 == nTrain && rows("val")._1 == nVal &&
           rows("test")._1 == n - nTrain - nVal, rows.toString)
    // Time-disjoint: duplicate timestamps can straddle a boundary (the
    // event_id tie-break splits them deterministically), hence <=.
    assert(rows("train")._3 <= rows("val")._2, "train leaks past val start")
    assert(rows("val")._3 <= rows("test")._2, "val leaks past test start")
  }

  test("new users daily: cumulative total equals distinct-user count") {
    val r = ops.EventOps.qNewUsersDaily(spark, Sf).collect()
    val dbs = r.map(_.getAs[Long]("db"))
    assert(dbs.sorted.sameElements(dbs))
    assert(r.last.getAs[Long]("cum_users") ==
      Tables.events(spark, Sf).select("user_id").distinct().count())
    assert(r.map(_.getAs[Long]("new_users")).sum ==
      r.last.getAs[Long]("cum_users"))
  }

  test("copurchase: ordered pairs, counts match brute force on the fixture") {
    val rows = ops.AnalyticsOps.qCopurchase(spark, Sf).collect()
    assert(rows.forall(r => r.getAs[Long]("p1") < r.getAs[Long]("p2")))
    val counts = rows.map(_.getAs[Long]("n_orders"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // Brute force the pair counts driver-side from the raw fixture.
    val li = Tables.lineitem(spark, Sf).select("l_orderkey", "l_partkey")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = li.groupBy(_._1).values.flatMap { parts =>
      val ps = parts.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (p, v) => (p, v.size.toLong) }
    rows.foreach { r =>
      assert(brute((r.getAs[Long]("p1"), r.getAs[Long]("p2"))) ==
        r.getAs[Long]("n_orders"))
    }
  }

  test("spend deciles: partition of customers, near-equal buckets, ordered") {
    val r = ops.AnalyticsOps.qSpendDeciles(spark, Sf).collect()
    val nCust = Tables.orders(spark, Sf).select("o_custkey").distinct().count()
    assert(r.map(_.getAs[Long]("n_cust")).sum == nCust)
    val sizes = r.map(_.getAs[Long]("n_cust"))
    assert(sizes.max - sizes.min <= 1)
    // Decile 1 holds the highest spenders: min of decile d >= max of d+1.
    r.zip(r.tail).foreach { case (hi, lo) =>
      assert(hi.getAs[Long]("min_c") >= lo.getAs[Long]("max_c"))
    }
  }

  test("group median: med2_c matches driver-side sorted middle values") {
    val r = ops.EventOps.qGroupMedian(spark, Sf).collect()
    val raw = Tables.events(spark, Sf)
      .selectExpr("event_type", "cast(round(value * 100) as bigint) as c")
      .collect().groupBy(_.getString(0))
    r.foreach { row =>
      val vs = raw(row.getAs[String]("event_type")).map(_.getLong(1)).sorted
      val n = vs.length
      assert(row.getAs[Long]("n") == n.toLong)
      assert(row.getAs[Long]("med2_c") == vs((n - 1) / 2) + vs(n / 2))
    }
  }

  test("skyline: window form equals brute-force dominance on the fixture") {
    val r = ops.AnalyticsOps.qSkyline(spark, Sf).collect()
      .map(x => (x.getAs[Long]("o_custkey"), x.getAs[Long]("spend_c"),
                 x.getAs[Long]("n_orders"))).toSet
    val agg = Tables.orders(spark, Sf)
      .selectExpr("o_custkey", "cast(round(o_totalprice * 100) as bigint) as c")
      .collect().groupBy(_.getLong(0))
      .map { case (k, rows) => (k, rows.map(_.getLong(1)).sum, rows.length.toLong) }
      .toSeq
    val brute = agg.filter { case (_, s, n) =>
      !agg.exists { case (_, s2, n2) =>
        s2 >= s && n2 >= n && (s2 > s || n2 > n) }
    }.toSet
    assert(r == brute)
  }

  test("incremental merge equals full recompute and base+delta partition") {
    val r = ops.AnalyticsOps.qIncrAgg(spark, Sf).collect()
    val full = Tables.events(spark, Sf)
      .selectExpr("event_type", "cast(round(value * 100) as bigint) as c")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"), min("c").as("mn"),
           max("c").as("mx"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, s, mn, mx) = full(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("n") == n && row.getAs[Long]("sum_c") == s)
      assert(row.getAs[Long]("min_c") == mn && row.getAs[Long]("max_c") == mx)
    }
  }

  test("term search: AND semantics and brute-force scores agree") {
    val r = ops.TextOps.qTermSearch(spark, Sf).collect()
    assert(r.nonEmpty)
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1).split(" "))).toMap
    val n = docs.size.toLong
    val df = Seq("spark", "join")
      .map(t => t -> docs.values.count(_.contains(t)).toLong).toMap
    r.foreach { row =>
      val toks = docs(row.getAs[Long]("doc_id"))
      assert(toks.contains("spark") && toks.contains("join"))
      val score = Seq("spark", "join").map { t =>
        toks.count(_ == t).toLong * (n * 1000000L / df(t))
      }.sum
      assert(row.getAs[Long]("score") == score)
    }
  }

  test("attribution: counts nest and latencies are positive") {
    val row = ops.EventOps.qAttribution(spark, Sf).collect().head
    val np = row.getAs[Long]("n_purchases")
    val na = row.getAs[Long]("n_attr_any")
    val n1 = row.getAs[Long]("n_attr_1h")
    assert(np > 0 && na <= np && n1 <= na && n1 > 0)
    assert(row.getAs[Long]("latency_min_us") > 0)
    assert(row.getAs[Long]("latency_sum_us") >= n1 * row.getAs[Long]("latency_min_us"))
  }

  test("time-weighted integral matches driver brute force") {
    val r = ops.EventOps.qTimeWeighted(spark, Sf).collect()
    val byUser = Tables.events(spark, Sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts) as t",
                  "cast(round(value * 100) as bigint) as c")
      .collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getLong(3))))
      .groupBy(_._1)
    r.foreach { row =>
      val evs = byUser(row.getAs[Long]("user_id")).map(_._2)
        .sortBy(e => (e._2, e._1))
      val integral = evs.zip(evs.tail).map { case (a, b) => a._3 * (b._2 - a._2) }.sum
      assert(row.getAs[Long]("integral_cus") == integral)
      assert(row.getAs[Long]("span_us") == evs.last._2 - evs.head._2)
      assert(row.getAs[Long]("n_events") == evs.length.toLong)
    }
    val ints = r.map(_.getAs[Long]("integral_cus"))
    assert(ints.zip(ints.tail).forall { case (a, b) => a >= b })
  }

  test("peak concurrency matches driver sweep line") {
    val gap = 3600000000L
    val row = ops.EventOps.qPeakConcurrency(spark, Sf).collect().head
    val byUser = Tables.events(spark, Sf)
      .selectExpr("user_id", "unix_micros(ts) as t").collect()
      .map(x => (x.getLong(0), x.getLong(1))).groupBy(_._1)
    val sessions = byUser.values.flatMap { ts =>
      val sorted = ts.map(_._2).sorted
      val breaks = sorted.head +: sorted.zip(sorted.tail).collect {
        case (a, b) if b - a >= gap => b }
      // split into islands
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var start = sorted.head; var last = sorted.head
      sorted.tail.foreach { t =>
        if (t - last >= gap) { buf += ((start, last + gap)); start = t }
        last = t
      }
      buf += ((start, last + gap))
      assert(breaks.length == buf.length) // islands == break count
      buf
    }.toSeq
    assert(row.getAs[Long]("n_sessions") == sessions.size.toLong)
    val bounds = sessions.flatMap { case (s, e) => Seq((s, 1), (e, -1)) }
      .sortBy(identity)
    var live = 0L; var peak = 0L; var peakT = 0L
    bounds.foreach { case (t, d) =>
      live += d
      if (live > peak) { peak = live; peakT = t }
    }
    assert(row.getAs[Long]("peak") == peak)
    assert(row.getAs[Long]("peak_ts_us") == peakT)
  }

  test("percentile bands: ranks match driver-side sorted order statistics") {
    val r = ops.EventOps.qPercentileBands(spark, Sf).collect()
    val raw = Tables.events(spark, Sf)
      .selectExpr("event_type", "cast(round(value * 100) as bigint) as c")
      .collect().groupBy(_.getString(0))
    r.foreach { row =>
      val vs = raw(row.getAs[String]("event_type")).map(_.getLong(1)).sorted
      val n = vs.length
      def stat(num: Int, den: Int) = vs(math.max(1, n * num / den) - 1)
      assert(row.getAs[Long]("p0") == vs.head)
      assert(row.getAs[Long]("p25") == stat(1, 4))
      assert(row.getAs[Long]("p50") == stat(1, 2))
      assert(row.getAs[Long]("p75") == stat(3, 4))
      assert(row.getAs[Long]("p90") == stat(9, 10))
      assert(row.getAs[Long]("p99") == stat(99, 100))
      assert(row.getAs[Long]("p100") == vs.last)
    }
  }

  test("mode: arg-max user per type matches driver brute force") {
    val r = ops.AnalyticsOps.qMode(spark, Sf).collect()
    val counts = Tables.events(spark, Sf).select("event_type", "user_id")
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    r.foreach { row =>
      val t = row.getAs[String]("event_type")
      val perUser = counts.collect { case ((tt, u), n) if tt == t => (u, n) }
      val best = perUser.map(_._2).max
      assert(row.getAs[Long]("n_mode") == best)
      assert(row.getAs[Long]("mode_user") ==
        perUser.filter(_._2 == best).map(_._1).min)
    }
  }

  test("trend slope: exact rational num/den against driver sums") {
    val r = ops.AnalyticsOps.qTrendSlope(spark, Sf).collect()
    val wk = Tables.events(spark, Sf)
      .selectExpr("event_type", "unix_micros(ts) div 604800000000 as x")
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    r.foreach { row =>
      val t = row.getAs[String]("event_type")
      val pts = wk.collect { case ((tt, x), y) if tt == t => (x, y) }.toSeq
      val n = pts.size.toLong
      val num = n * pts.map(p => p._1 * p._2).sum -
        pts.map(_._1).sum * pts.map(_._2).sum
      val den = n * pts.map(p => p._1 * p._1).sum -
        pts.map(_._1).sum * pts.map(_._1).sum
      assert(row.getAs[Long]("slope_num") == num)
      assert(row.getAs[Long]("slope_den") == den)
    }
  }

  test("interval merge: coverage matches driver union of blocks") {
    val blockUs = 1800000000L
    val row = ops.EventOps.qIntervalMerge(spark, Sf).collect().head
    val byUser = Tables.events(spark, Sf)
      .selectExpr("user_id", "unix_micros(ts) as t").collect()
      .map(x => (x.getLong(0), x.getLong(1))).groupBy(_._1)
    var islands = 0L; var covered = 0L
    byUser.values.foreach { ts =>
      val sorted = ts.map(_._2).sorted
      var s = sorted.head; var e = sorted.head + blockUs
      sorted.tail.foreach { t =>
        if (t > e) { islands += 1; covered += e - s; s = t }
        e = math.max(e, t + blockUs)
      }
      islands += 1; covered += e - s
    }
    assert(row.getAs[Long]("n_users") == byUser.size.toLong)
    assert(row.getAs[Long]("n_islands") == islands)
    assert(row.getAs[Long]("covered_us") == covered)
    assert(row.getAs[Long]("raw_us") ==
      byUser.values.map(_.size.toLong).sum * blockUs)
    assert(row.getAs[Long]("covered_us") <= row.getAs[Long]("raw_us"))
  }

  test("type bitmask: masks partition users and bits decode to real types") {
    val r = ops.AnalyticsOps.qTypeBitmask(spark, Sf).collect()
    assert(r.map(_.getAs[Long]("n_users")).sum ==
      Tables.events(spark, Sf).select("user_id").distinct().count())
    r.foreach { row =>
      val m = row.getAs[Int]("mask")
      assert(m >= 1 && m <= 31)
    }
  }

  test("graft_sliding generator == builtin sequence+slice composition") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf)
    val custom = docs
      .select(col("doc_id"),
              call_function("graft_sliding", split(col("text"), " "),
                            lit(5), lit(3)).as("win"))
      .select(col("doc_id"), array_join(col("win"), " ").as("ws"))
    val builtin = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"),
              explode(expr(
                "transform(sequence(0, (size(toks) - 5) div 3), " +
                "i -> slice(toks, i * 3 + 1, 5))")).as("win"))
      .select(col("doc_id"), array_join(col("win"), " ").as("ws"))
    val a = custom.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    val b = builtin.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(a == b && a.nonEmpty)
  }

  test("graft_sliding rejects non-positive size at analysis time") {
    import org.apache.spark.sql.functions._
    val err = intercept[Exception] {
      Tables.documents(spark, Sf)
        .select(call_function("graft_sliding", split(col("text"), " "),
                              lit(0), lit(3)).as("w"))
        .collect()
    }
    assert(err.getMessage.contains("positive") ||
      err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("group-size distribution conserves orders and line items") {
    val r = ops.AnalyticsOps.qGroupSizeDist(spark, Sf).collect()
    val li = Tables.lineitem(spark, Sf)
    assert(r.map(_.getAs[Long]("n_orders")).sum ==
      li.select("l_orderkey").distinct().count())
    assert(r.map(x => x.getAs[Long]("k") * x.getAs[Long]("n_orders")).sum ==
      li.count())
  }

  test("week-over-week: lag aligns with the previous week's count") {
    val r = ops.AnalyticsOps.qWowChange(spark, Sf).collect()
    val byType = r.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { rows =>
      rows.zip(rows.tail).foreach { case (a, b) =>
        if (b.getAs[Long]("wb") - a.getAs[Long]("wb") == 604800000000L)
          assert(b.getAs[Long]("prev_n") == a.getAs[Long]("n"))
      }
      rows.foreach { x =>
        assert(!x.isNullAt(x.fieldIndex("prev_n")))
        assert(x.getAs[Long]("delta") ==
          x.getAs[Long]("n") - x.getAs[Long]("prev_n"))
      }
    }
  }

  test("quantile filter: keeps exactly n - floor(n/4) per language") {
    val r = ops.TextOps.qQuantileFilter(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_total")
      assert(row.getAs[Long]("n_kept") == n - n / 4)
    }
  }
}
