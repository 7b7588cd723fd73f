package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Snapshot-versioned keyed store — time travel on plain parquet, the
  * manifest + copy-on-write shape of a lakehouse table format reduced to
  * its essentials:
  *
  *  - data lives in per-(version, bucket) parquet directories
  *    `data/v<N>/kb=<b>/`; a commit merges ONLY the buckets containing
  *    changed keys and writes new directories for those — untouched
  *    buckets' files are never rewritten and are SHARED by every later
  *    snapshot (byte-identity across versions is asserted in
  *    VersionedStoreSpec);
  *  - each version has an immutable manifest `manifests/v<N>` mapping
  *    bucket → the data directory that last wrote it. Reading "as of
  *    version v" is a union scan of v's manifest entries — old snapshots
  *    stay readable forever (no overwrite anywhere), which is exactly
  *    snapshot isolation: a reader pinned to v is unaffected by
  *    concurrent commits;
  *  - manifests are tiny (NumBuckets lines) and written last — the
  *    write-audit-publish ordering: a crashed commit leaves orphan data
  *    directories, never a corrupt table.
  *
  * Single-writer commit protocol: version numbering is
  * read-latest-then-publish, so concurrent committers need external
  * mutual exclusion (a catalog lock / conditional put at real scale —
  * the same requirement every manifest-based table format has).
  * Readers need no coordination at any concurrency.
  *
  * At 100 TB the same layout holds with more buckets: commit cost is
  * O(touched buckets), read-as-of cost is one multi-path parquet scan,
  * and the manifest stays control-plane-sized.
  */
object VersionedStore {
  val NumBuckets = 8

  private def bucketCol(key: String) =
    pmod(TextFns.hash60(col(key).cast("string")), lit(NumBuckets.toLong))

  private def manifestDir(dir: String): Path = Paths.get(dir, "manifests")

  /** Latest committed version, 0 if none. */
  def currentVersion(dir: String): Int = {
    val md = manifestDir(dir)
    if (!Files.exists(md)) 0
    else Files.list(md).iterator().asScala
      .map(_.getFileName.toString.stripPrefix("v").toInt).foldLeft(0)(math.max)
  }

  private def readManifest(dir: String, version: Int): Map[Int, String] =
    Files.readAllLines(manifestDir(dir).resolve(s"v$version")).asScala
      .map { line =>
        val Array(b, p) = line.split(",", 2); b.toInt -> p
      }.toMap

  private def writeManifest(dir: String, version: Int,
                            m: Map[Int, String]): Unit = {
    Files.createDirectories(manifestDir(dir))
    Files.write(manifestDir(dir).resolve(s"v$version"),
      m.toSeq.sorted.map { case (b, p) => s"$b,$p" }.mkString("\n")
        .getBytes("UTF-8"))
  }

  /** Version 1: write every bucket, publish manifest v1. */
  def init(spark: SparkSession, dir: String, rows: DataFrame,
           key: String): Unit = {
    rows.withColumn("kb", bucketCol(key))
      .repartitionByRange(NumBuckets, col("kb"), col(key))
      .sortWithinPartitions(col("kb"), col(key))
      .write.mode("overwrite").partitionBy("kb").parquet(s"$dir/data/v1")
    val written = (0 until NumBuckets).filter(b =>
      Files.exists(Paths.get(s"$dir/data/v1/kb=$b")))
    writeManifest(dir, 1, written.map(b => b -> s"v1/kb=$b").toMap)
  }

  /** Copy-on-write commit of a U/I/D change set
    * ([[SourceSinkOps.mergeUpsert]] semantics): merge + rewrite only the
    * buckets containing changed keys, share every other bucket's files
    * with the previous snapshot, publish manifest v(N+1). */
  def commit(spark: SparkSession, dir: String, changes: DataFrame,
             key: String): Int = {
    val v = currentVersion(dir)
    val manifest = readManifest(dir, v)
    // <= NumBuckets values driver-side: control flow, not data.
    val touched = changes.select(bucketCol(key).as("kb")).distinct()
      .collect().map(_.getLong(0).toInt).toSet
    val basePaths = manifest.filter(t => touched(t._1))
      .values.map(p => s"$dir/data/$p").toSeq
    // A touched bucket with no manifest entry was emptied by an earlier
    // commit — its base contribution is the empty payload relation.
    val base =
      if (basePaths.nonEmpty) spark.read.parquet(basePaths: _*)
      else changes.drop("op").limit(0)
    val merged = SourceSinkOps.mergeUpsert(base, changes, key)
    val nv = v + 1
    merged.withColumn("kb", bucketCol(key))
      .repartitionByRange(NumBuckets, col("kb"), col(key))
      .sortWithinPartitions(col("kb"), col(key))
      .write.mode("overwrite").partitionBy("kb").parquet(s"$dir/data/v$nv")
    // A bucket whose every row was deleted produces no kb directory —
    // it must leave the manifest, or readers would scan a missing path.
    val written = touched.filter(b =>
      Files.exists(Paths.get(s"$dir/data/v$nv/kb=$b")))
    writeManifest(dir, nv,
      (manifest -- touched) ++ written.map(b => b -> s"v$nv/kb=$b"))
    nv
  }

  /** Retention vacuum: delete every per-(version, bucket) data directory
    * not referenced by the last `keepLast` manifests, and the expired
    * manifests themselves. Returns the number of data directories
    * removed. Snapshots older than the retention window become
    * unreadable — the documented lakehouse trade of storage for history.
    * Pure driver-side file management (control plane); the data plane is
    * untouched for every retained version.
    */
  def vacuum(dir: String, keepLast: Int = 1): Int = {
    val cur = currentVersion(dir)
    val keepFrom = math.max(1, cur - keepLast + 1)
    val live = (keepFrom to cur)
      .flatMap(v => readManifest(dir, v).values).toSet
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(rm)
      Files.delete(p)
    }
    var removed = 0
    val dataRoot = Paths.get(dir, "data")
    Files.list(dataRoot).iterator().asScala.toSeq.foreach { vdir =>
      Files.list(vdir).iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.startsWith("kb="))
        .foreach { kbdir =>
          val rel = s"${vdir.getFileName}/${kbdir.getFileName}"
          if (!live(rel)) { rm(kbdir); removed += 1 }
        }
      if (!Files.list(vdir).iterator().asScala.exists(
            _.getFileName.toString.startsWith("kb=")))
        rm(vdir)
    }
    (1 until keepFrom).foreach { v =>
      val m = manifestDir(dir).resolve(s"v$v")
      if (Files.exists(m)) Files.delete(m)
    }
    removed
  }

  /** Snapshot read: the table exactly as of `version`. A fully-emptied
    * snapshot (every bucket deleted) reads as zero rows with version 1's
    * schema. */
  def asOf(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val m = readManifest(dir, version)
    if (m.nonEmpty)
      spark.read.parquet(m.values.map(p => s"$dir/data/$p").toSeq: _*)
    else
      spark.read.parquet(readManifest(dir, 1).values
        .map(p => s"$dir/data/$p").toSeq: _*).limit(0)
  }
}
