package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout behaviors: partition pruning on Hive-style layouts and
  * small-files compaction — the table-maintenance side of 100 TB scans.
  */
class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("partitioned write + filtered read prunes to the selected partitions") {
    val df = ops.SourceSinkOps.partitionedRoundTrip(spark, Sf, Seq("click", "error"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
           plan.contains("event_type#") , plan.take(3000))
    // only the two requested partitions survive
    val types = df.collect().map(_.getString(0)).toSet
    assert(types == Set("click", "error"))
    // and counts match an unpartitioned aggregation
    val expect = graft.Tables.events(spark, Sf)
      .filter(col("event_type").isin("click", "error"))
      .groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  test("compaction rewrites many small files into the target file count") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val fragmented = s"$base/in"
    val compacted = s"$base/out"
    graft.Tables.events(spark, Sf)
      .repartition(32).write.mode("overwrite").parquet(fragmented)
    def parquetFiles(d: String): Int =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(fragmented) == 32)
    ops.SourceSinkOps.compact(spark, fragmented, compacted, targetFiles = 4, sortCol = "ts")
    assert(parquetFiles(compacted) == 4)
    assert(spark.read.parquet(compacted).count() ==
           spark.read.parquet(fragmented).count())
  }
}
