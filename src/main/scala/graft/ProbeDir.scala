package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 measurement for the carried region-directory item (r17
  * verdict #6): at a FINE region budget (≥4k regions), what does the
  * O(regions) driver-side control plane actually cost — sidecar parse
  * time, bytes, and the cumBase scanLeft — and does block
  * summarization pay?
  *
  * Two modes (separate JVMs so the second run's first parse is COLD):
  *   runMain graft.ProbeDir create   — build the fine store, report
  *     create time, region count, directory bytes, warm-read costs
  *   runMain graft.ProbeDir read     — cold-parse the same store,
  *     report first-parse time/bytes and the scanLeft cost
  */
object ProbeDir {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("create")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = "graft_probe_dir_fine"
    import spark.implicits._
    if (mode == "create") {
      val rows = (0L until 100000L).map(k => (k, s"v$k")).toDF("k", "v")
      val t0 = System.nanoTime()
      ops.KeyedStore.create(spark, name, rows, "k", targetRowsPerRegion = 16)
      println(f"PROBEDIR create ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val p0 = ops.KeyedStore.sidecarParses.get()
    val b0 = ops.KeyedStore.sidecarBytesRead.get()
    var t = System.nanoTime()
    val rm = ops.KeyedStore.readRegions(spark, name)
    val firstMs = (System.nanoTime() - t) / 1e6
    println(f"PROBEDIR first readRegions ${firstMs}%.1f ms " +
      s"(parses=${ops.KeyedStore.sidecarParses.get() - p0}, " +
      s"bytes=${ops.KeyedStore.sidecarBytesRead.get() - b0}) " +
      s"regions=${rm.regions.size}")
    // warm repeated reads — the per-operation cost every store op pays
    t = System.nanoTime()
    (1 to 1000).foreach(_ => ops.KeyedStore.readRegions(spark, name))
    println(f"PROBEDIR warm readRegions x1000 ${(System.nanoTime() - t) / 1e6}%.1f ms total")
    // the cumBase scanLeft (the one remaining O(regions) driver term in
    // the suffix search path) over this directory, x1000
    val dataRows = rm.regions.map(_.rows)
    t = System.nanoTime()
    var sink = 0L
    (1 to 1000).foreach { _ =>
      val cb = dataRows.scanLeft(0L)(_ + _); sink += cb.last
    }
    println(f"PROBEDIR cumBase scanLeft x1000 ${(System.nanoTime() - t) / 1e6}%.1f ms total (sink=$sink)")
    // directory footprint on disk
    val loc = java.nio.file.Paths.get(
      ops.KeyedStore.location(spark, name).toUri.getPath)
    var dirBytes = 0L
    java.nio.file.Files.walk(loc).forEach { p =>
      val f = p.getFileName.toString
      if (java.nio.file.Files.isRegularFile(p) && f.contains("graft_regions"))
        dirBytes += java.nio.file.Files.size(p)
    }
    println(s"PROBEDIR directory bytes on disk: $dirBytes")
    spark.stop()
  }
}
