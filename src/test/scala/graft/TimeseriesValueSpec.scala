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

  test("quantile filter: keeps exactly n - floor(n/4) per language") {
    val r = ops.TextOps.qQuantileFilter(spark, Sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val n = row.getAs[Long]("n_total")
      assert(row.getAs[Long]("n_kept") == n - n / 4)
    }
  }
}
