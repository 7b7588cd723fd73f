package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The catalog-backed keyed table ([[graft.ops.KeyedStore]]): the
  * HBase-connector substitution as one surface. Pins the three scale
  * contracts — GETs prune to bucket partitions and push the key list
  * into the scan, upserts rewrite only touched buckets (byte-identical
  * untouched files), and create is idempotent across "JVMs" (stale
  * warehouse location with no catalog entry).
  */
class KeyedStoreSpec extends AnyFunSuite {
  import TestSpark._
  import ops.KeyedStore

  private def mkRows(n: Long) = {
    import spark.implicits._
    (0L until n).map(i => (i, s"v$i")).toDF("k", "v")
  }

  private def digests(name: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val root = KeyedStore.location(spark, name)
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString ->
        java.util.Arrays.toString(java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(p))))
      .toMap
    finally s.close()
  }

  test("get prunes to bucket partitions and pushes the key IN-list") {
    val name = "graft_keyed_spec_get"
    KeyedStore.create(spark, name, mkRows(200), "k")
    val got = KeyedStore.get(spark, name, "k", Seq(5L, 77L))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((5L, "v5"), (77L, "v77")))
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("kb#"), p.take(3000))
    assert(p.contains("PushedFilters: [In(k,"), p.take(3000))
  }

  test("upsert rewrites only touched buckets; untouched files byte-identical") {
    import spark.implicits._
    val name = "graft_keyed_spec_upsert"
    KeyedStore.create(spark, name, mkRows(200), "k")
    val before = digests(name)
    assert(before.nonEmpty)
    // One update, one delete, one insert — all keys chosen in a known
    // bucket set; every other bucket's files must not be rewritten.
    val changes = Seq((5L, "U", "v5b"), (7L, "D", "x"), (1000L, "I", "v1000"))
      .toDF("k", "op", "v")
    val after = KeyedStore.upsert(spark, name, "k", changes)
    val rows = after.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(rows(5L) == "v5b" && rows(1000L) == "v1000" && !rows.contains(7L))
    assert(rows.size == 200) // 200 - 1 delete + 1 insert
    val touched = Set(5L, 7L, 1000L).map(k => s"kb=${KeyedStore.bucketOf(k)}")
    val afterD = digests(name)
    val untouched = before.keySet.filterNot(p => touched.exists(p.startsWith))
    assert(untouched.nonEmpty && untouched.subsetOf(afterD.keySet))
    untouched.foreach(p => assert(afterD(p) == before(p), s"$p was rewritten"))
  }

  test("create is idempotent across JVMs (stale location, fresh metastore)") {
    val name = "graft_keyed_spec_idem"
    // Simulate the next JVM: fresh metastore (no catalog entry for the
    // name) while the warehouse LOCATION survives from a prior session —
    // a bare CTAS would fail with LOCATION_ALREADY_EXISTS.
    val loc = KeyedStore.location(spark, name)
    java.nio.file.Files.createDirectories(loc)
    java.nio.file.Files.write(loc.resolve("stale-file"), Array[Byte](1, 2, 3))
    KeyedStore.create(spark, name, mkRows(50), "k") // must not throw
    assert(spark.table(name).count() == 50)
    assert(!java.nio.file.Files.exists(loc.resolve("stale-file")))
  }
}
