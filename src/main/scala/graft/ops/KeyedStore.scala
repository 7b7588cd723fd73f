package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog-backed keyed table — the HBase-table substitution as ONE
  * coherent surface instead of three tmp-path queries (the reference
  * creates the table, puts rows, and gets by row key:
  * `HPopulate/src/main/java/org/northeastern/Main.java:54-73,97-100`).
  * create/get/upsert share a single MANAGED parquet table partitioned by
  * a 16-way key-hash bucket `kb` (the analog of HBase's key-range
  * regions) whose files are key-sorted:
  *
  *  - point GETs statically prune to the matching `kb` partitions — the
  *    bucket of a literal key is computable driver-side from the same
  *    md5-derived hash60 the DuckDB oracle replays — and push the key
  *    IN-list into the scan, where key-sorted row groups min/max-skip
  *    everything but the matching key ranges: a batch-get touches O(1)
  *    row groups regardless of table size;
  *  - UPSERT (merge / CDC apply) is copy-on-write over ONLY the `kb`
  *    partitions containing changed keys (dynamic partition overwrite
  *    through a staging write — the write-audit-publish shape), so a
  *    merge costs O(touched partitions), never O(table), exactly like
  *    the streaming sink's incremental store;
  *  - CREATE is idempotent across JVMs: a stale warehouse LOCATION left
  *    by a previous session (fresh metastore, surviving directory) is
  *    cleared before the CTAS, the q_managed_table lesson.
  */
object KeyedStore {
  val NumBuckets = 16

  /** Key-hash bucket, Spark-side. pmod of the 60-bit md5-derived hash —
    * non-negative by construction, identical to [[bucketOf]]. */
  private[ops] def bucketCol(key: Column): Column =
    pmod(TextFns.hash60(key.cast("string")), lit(NumBuckets.toLong))

  /** Driver-side twin of [[bucketCol]] for literal keys: lets a GET
    * compute its partition list without touching the cluster (static
    * pruning is control flow, not data). */
  private[graft] def bucketOf(key: Any): Long =
    java.lang.Long.parseLong(TextFns.md5Hex(key.toString).substring(0, 15), 16) %
      NumBuckets

  private def dropWithLocation(spark: SparkSession, name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      name.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  /** Filesystem location of the table's data (test hook for the
    * byte-identity probe). */
  private[graft] def location(spark: SparkSession, name: String): java.nio.file.Path =
    new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      name.toLowerCase).toPath

  /** CTAS the keyed table: one range partition per bucket, key-sorted
    * files within each `kb` directory. */
  def create(spark: SparkSession, name: String, rows: DataFrame, key: String): Unit = {
    dropWithLocation(spark, name)
    rows.withColumn("kb", bucketCol(col(key)))
      .repartitionByRange(NumBuckets, col("kb"), col(key))
      .sortWithinPartitions(col("kb"), col(key))
      .write.mode("overwrite").format("parquet").partitionBy("kb").saveAsTable(name)
  }

  /** Batch point-GET: static `kb` pruning + key IN-list pushdown. */
  def get(spark: SparkSession, name: String, key: String, keys: Seq[Any]): DataFrame = {
    val kbs = keys.map(bucketOf).distinct
    spark.table(name)
      .filter(col("kb").isin(kbs: _*))
      .filter(col(key).isin(keys: _*))
      .drop("kb")
  }

  /** MERGE a change set (`op` ∈ U/I/D rows, [[SourceSinkOps.mergeUpsert]]
    * semantics) into the table, rewriting only the buckets that contain
    * changed keys; returns the post-merge table. */
  def upsert(spark: SparkSession, name: String, key: String,
             changes: DataFrame): DataFrame = {
    // <= NumBuckets values driver-side: control flow, not data.
    val touched = changes.select(bucketCol(col(key)).as("kb")).distinct()
      .collect().map(_.getLong(0))
    val baseTouched = spark.table(name)
      .filter(col("kb").isin(touched.toIndexedSeq: _*)).drop("kb")
    val merged = SourceSinkOps.mergeUpsert(baseTouched, changes, key)
    val staging = java.nio.file.Files.createTempDirectory("graft_keyed_staging")
    try {
      val stagingPath = staging.resolve("merged").toString
      merged.withColumn("kb", bucketCol(col(key)))
        .repartitionByRange(NumBuckets, col("kb"), col(key))
        .sortWithinPartitions(col("kb"), col(key))
        .write.mode("overwrite").parquet(stagingPath)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try
        spark.read.parquet(stagingPath)
          .select(spark.table(name).columns.toIndexedSeq.map(col): _*) // insertInto is positional
          .write.mode("overwrite").insertInto(name)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    } finally graft.streaming.EventStream.deleteRecursively(staging)
    spark.table(name).drop("kb")
  }
}
