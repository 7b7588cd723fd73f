package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** VersionedStore contracts: snapshot isolation (old versions unaffected
  * by commits), copy-on-write file sharing (untouched buckets keep their
  * v1 directories — byte-identical, not re-written), and the
  * emptied-bucket manifest rule.
  */
class VersionedStoreSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("graft_vstore_spec").toString

  test("snapshot isolation: v1 readable and unchanged after two commits") {
    val dir = freshDir()
    val base = (1L to 200L).map(k => (k, k * 10)).toDF("k", "v")
    ops.VersionedStore.init(spark, dir, base, "k")
    val v1Before = ops.VersionedStore.asOf(spark, dir, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Commit 1: update evens; commit 2: delete multiples of 3.
    ops.VersionedStore.commit(spark, dir,
      (2L to 200L by 2).map(k => (k, "U", k * 100)).toDF("k", "op", "v"), "k")
    ops.VersionedStore.commit(spark, dir,
      (3L to 200L by 3).map(k => (k, "D", 0L)).toDF("k", "op", "v"), "k")
    val v1After = ops.VersionedStore.asOf(spark, dir, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(v1After == v1Before && v1Before.size == 200)
    // v3 reflects both commits: evens updated unless deleted, %3 gone.
    val v3 = ops.VersionedStore.asOf(spark, dir, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (1L to 200L).foreach { k =>
      if (k % 3 == 0) assert(!v3.contains(k))
      else if (k % 2 == 0) assert(v3(k) == k * 100)
      else assert(v3(k) == k * 10)
    }
  }

  test("copy-on-write: buckets untouched by a commit keep their v1 files") {
    val dir = freshDir()
    val base = (1L to 100L).map(k => (k, k)).toDF("k", "v")
    ops.VersionedStore.init(spark, dir, base, "k")
    // Change exactly one key → at most one bucket rewritten.
    ops.VersionedStore.commit(spark, dir,
      Seq((1L, "U", 999L)).toDF("k", "op", "v"), "k")
    val m1 = Files.readAllLines(Paths.get(dir, "manifests", "v1")).asScala
      .map(_.split(",", 2)).map(a => a(0).toInt -> a(1)).toMap
    val m2 = Files.readAllLines(Paths.get(dir, "manifests", "v2")).asScala
      .map(_.split(",", 2)).map(a => a(0).toInt -> a(1)).toMap
    val rewritten = m2.count { case (b, p) => m1.get(b) != Some(p) }
    assert(rewritten == 1, s"expected 1 rewritten bucket, got $rewritten")
    // Shared buckets point at the SAME v1 directories — nothing moved.
    m2.filter { case (b, p) => m1.get(b) == Some(p) }.values.foreach { p =>
      assert(p.startsWith("v1/"))
      assert(Files.exists(Paths.get(dir, "data", p)))
    }
  }

  test("vacuum: expired dirs removed, retained snapshot still exact") {
    val dir = freshDir()
    val base = (1L to 100L).map(k => (k, k)).toDF("k", "v")
    ops.VersionedStore.init(spark, dir, base, "k")
    ops.VersionedStore.commit(spark, dir,
      (1L to 100L).map(k => (k, "U", k * 2)).toDF("k", "op", "v"), "k")
    val before = ops.VersionedStore.asOf(spark, dir, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val removed = ops.VersionedStore.vacuum(dir, keepLast = 1)
    // Every bucket was rewritten by the commit, so all v1 dirs expire.
    assert(removed > 0)
    assert(!Files.exists(Paths.get(dir, "manifests", "v1")))
    val after = ops.VersionedStore.asOf(spark, dir, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before)
  }

  test("stream CDC commits are batch-order independent; history readable") {
    val ev = Seq(
      (1L, 10L, 100L, "view", 5L), (2L, 10L, 200L, "click", 6L),
      (3L, 20L, 150L, "view", 7L), (4L, 20L, 50L, "purchase", 8L),
      (5L, 30L, 300L, "click", 9L))
      .toDF("event_id", "user_id", "ts_us", "event_type", "value_c")
      .select(col("user_id"), col("ts_us"), col("event_id"),
              col("event_type"), col("value_c"))
    def drain(order: Seq[Seq[Long]]): Set[(Long, Long, Long)] = {
      val dir = freshDir()
      order.foreach { ids =>
        graft.streaming.EventStream.commitLatestBatch(spark, dir,
          ev.filter(col("event_id").isin(ids: _*)))
      }
      ops.VersionedStore.asOf(spark, dir,
          ops.VersionedStore.currentVersion(dir))
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("ts_us"), r.getAs[Long]("event_id"))).toSet
    }
    val a = drain(Seq(Seq(1L, 3L), Seq(2L, 4L), Seq(5L)))
    val b = drain(Seq(Seq(5L, 4L), Seq(2L), Seq(1L, 3L)))
    val expected = Set((10L, 200L, 2L), (20L, 150L, 3L), (30L, 300L, 5L))
    assert(a == expected && b == expected)
    // Intermediate snapshots stay readable: version 1 of the first order
    // holds only batch-1 state.
    val dir = freshDir()
    graft.streaming.EventStream.commitLatestBatch(spark, dir,
      ev.filter(col("event_id").isin(1L, 3L)))
    graft.streaming.EventStream.commitLatestBatch(spark, dir,
      ev.filter(col("event_id").isin(2L, 4L, 5L)))
    val v1 = ops.VersionedStore.asOf(spark, dir, 1)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(v1 == Set(1L, 3L))
  }

  test("deleting every row empties the manifest; asOf returns zero rows") {
    val dir = freshDir()
    val base = (1L to 50L).map(k => (k, k)).toDF("k", "v")
    ops.VersionedStore.init(spark, dir, base, "k")
    ops.VersionedStore.commit(spark, dir,
      (1L to 50L).map(k => (k, "D", 0L)).toDF("k", "op", "v"), "k")
    assert(ops.VersionedStore.asOf(spark, dir, 2).count() == 0)
    // And the table comes back to life on a later insert.
    ops.VersionedStore.commit(spark, dir,
      Seq((7L, "I", 70L)).toDF("k", "op", "v"), "k")
    val v3 = ops.VersionedStore.asOf(spark, dir, 3).collect()
    assert(v3.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((7L, 70L)))
  }
}
