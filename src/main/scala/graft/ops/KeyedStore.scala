package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Catalog-backed keyed table — the HBase-table substitution as ONE
  * coherent surface (the reference creates the table, puts rows, and
  * gets by row key:
  * `HPopulate/src/main/java/org/northeastern/Main.java:54-73,97-100`).
  * create/get/scan/upsert share a single MANAGED parquet table
  * partitioned by KEY-RANGE REGIONS `kr` — the literal analog of HBase's
  * region model (`Main.java:54-73` pre-splits its table into key ranges
  * for exactly this reason), where the reference's own UUID row keys
  * destroy range locality (SURVEY.md §1.4) ours preserves it:
  *
  *  - CREATE range-partitions the rows into ~n/targetRowsPerRegion
  *    regions (each region ≈ one parquet file), sorts each region file
  *    by key, and persists the region boundary map (kr, rows, min, max)
  *    as a driver-readable sidecar — the "region directory" a real HBase
  *    master keeps;
  *  - point GETs resolve their regions driver-side by binary search over
  *    the sidecar (static pruning — control flow, not data), so the scan
  *    touches O(1) region partitions regardless of table size, and the
  *    key IN-list pushes into parquet where key-sorted row groups
  *    min/max-skip everything else;
  *  - range SCANs — the HBase capability the reference forfeits with
  *    UUID keys — prune to exactly the regions intersecting [from, to]
  *    (PartitionFilters) plus a pushed range predicate (PushedFilters):
  *    cost is O(selected range), never O(table);
  *  - UPSERT (merge / CDC apply) is copy-on-write over ONLY the regions
  *    containing changed keys: region assignment for the change set is a
  *    codegen'd binary search ([[graft.functions.LongBoundaryBucket]]),
  *    base rows keep their resident region, and the merged result lands
  *    via dynamic partition overwrite — O(changed regions) ≈ O(changed
  *    files) write amplification, never O(table). The merged relation is
  *    localCheckpoint-materialized so the table can be read and
  *    rewritten in one pass (no staging round trip);
  *  - MERGEINTO generalizes upsert to a caller-supplied commutative
  *    merge (latest-wins, additive counts) — the micro-batch sink
  *    primitive the streaming stores drive;
  *  - per-region ROW BLOOMS (HBase's HFile bloom analog) ride a sidecar:
  *    a GET for an absent key touches zero partitions (the bloom rejects
  *    every range-candidate region), and merges rebuild only the touched
  *    regions' filters — see [[graft.functions.BloomAgg]];
  *  - CREATE is idempotent across JVMs: a stale warehouse LOCATION left
  *    by a previous session is cleared before the CTAS.
  *
  * Region boundaries are fixed at create (inserts beyond the edges land
  * in the boundary regions); [[rebalance]] is the major-compaction /
  * region-split maintenance pass that re-derives balanced regions from
  * the current data.
  */
object KeyedStore {
  /** Target rows per region (≈ one parquet file). Fixture queries pass a
    * smaller value so pruning is exercised with a handful of regions;
    * size to ~a row-group's worth at real scale.
    */
  val DefaultTargetRowsPerRegion: Long = 1L << 20

  /** Driver-side region directory entry: key range [min, max] resident
    * in partition `kr`.
    */
  private[graft] final case class Region(kr: Int, rows: Long, min: Any, max: Any)

  private[graft] final case class RegionMap(typ: String,
                                            regions: IndexedSeq[Region]) {
    private val ord: Ordering[Any] = typ match {
      case "long" => Ordering.by[Any, Long](_.asInstanceOf[Number].longValue())
      case _ => Ordering.by[Any, String](_.toString)
    }
    private def norm(v: Any): Any = typ match {
      case "long" => v.asInstanceOf[Number].longValue()
      case _ => v.toString
    }
    private val mins: IndexedSeq[Any] = regions.map(_.min)

    /** Index of the region that OWNS `v` for writes: greatest i with
      * mins(i) ≤ v, clamped to 0 (region 0 extends to −∞, the last to
      * +∞ — total coverage, so every insert has a home).
      */
    def coverageIdx(v: Any): Int =
      graft.functions.RangeFunctions.indexOf(mins, norm(v))(ord)

    /** All regions that may HOLD `v` (a heavily-duplicated key can
      * straddle adjacent regions at a range-partition boundary).
      */
    def holdingIdx(v: Any): Seq[Int] = {
      val i = coverageIdx(v)
      var j = i
      while (j > 0 && ord.gteq(norm(regions(j - 1).max), norm(v))) j -= 1
      j to i
    }

    /** Regions intersecting [from, to] — the range-scan prune list. */
    def rangeIdx(from: Any, to: Any): Seq[Int] =
      regions.indices.filter { i =>
        ord.lteq(norm(regions(i).min), norm(to)) &&
          ord.gteq(norm(regions(i).max), norm(from))
      }

    /** Conservative closure for upsert: the collected coverage indices
      * plus any earlier region sharing a boundary key with them.
      */
    def expandTouched(idx: Set[Int]): Seq[Int] =
      idx.flatMap { i =>
        var j = i
        while (j > 0 && ord.gteq(norm(regions(j - 1).max), norm(regions(i).min)))
          j -= 1
        j to i
      }.toSeq.sorted

    /** Coverage region id of a key COLUMN — the codegen'd binary search
      * over the boundary list, then index → kr through an array literal.
      */
    def krCol(c: Column): Column = {
      val idx = typ match {
        case "long" => graft.functions.RangeFunctions.longBoundaryBucket(
          c.cast(LongType), mins.map(_.asInstanceOf[Long]))
        case _ => graft.functions.RangeFunctions.stringBoundaryBucket(
          c.cast(StringType), mins.map(_.toString))
      }
      element_at(array(regions.map(r => lit(r.kr)): _*), idx + 1)
    }
  }

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
  private[graft] def location(spark: SparkSession, name: String): Path =
    new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      name.toLowerCase).toPath

  private def sidecar(spark: SparkSession, name: String): Path =
    location(spark, name).resolve("_graft_regions")

  // -------- per-region row blooms (HBase HFile ROW-bloom analog) --------

  /** Hash probes per key — fixed store-wide; filter SIZE lives in the
    * sidecar header (derived from the region target at create). */
  private val BloomK = 7

  private def bloomSidecar(spark: SparkSession, name: String): Path =
    location(spark, name).resolve("_graft_blooms")

  private def writeBlooms(spark: SparkSession, name: String, mBits: Int,
                          blooms: Map[Int, Array[Byte]]): Unit = {
    val lines = s"$mBits,$BloomK" +: blooms.toSeq.sortBy(_._1).map {
      case (kr, b) => s"$kr,${java.util.Base64.getEncoder.encodeToString(b)}"
    }
    atomicWrite(bloomSidecar(spark, name), lines.mkString("\n"))
  }

  private[graft] def readBlooms(spark: SparkSession,
                                name: String): Option[(Int, Map[Int, Array[Byte]])] = {
    val p = bloomSidecar(spark, name)
    if (!Files.exists(p)) None
    else {
      val lines = Files.readAllLines(p).asScala.toIndexedSeq
      val mBits = lines.head.split(",")(0).toInt
      val m = lines.tail.filter(_.nonEmpty).map { l =>
        val Array(kr, b64) = l.split(",", 2)
        kr.toInt -> java.util.Base64.getDecoder.decode(b64)
      }.toMap
      Some((mBits, m))
    }
  }

  /** ONE partial-combined aggregate pass over a (kr, key, ...) relation:
    * per-region (rows, min, max, bloom bits) — the complete sidecar
    * refresh payload in a single table read. The exchange carries one
    * stats row + m-bit array per region — control plane, never keys.
    */
  private def regionStats(rel: DataFrame, key: String,
                          mBits: Int): Map[Int, (Region, Array[Byte])] = {
    val bloom = udaf(new graft.functions.BloomAgg(mBits, BloomK),
      org.apache.spark.sql.Encoders.scalaLong)
    rel.select(col("kr"), col(key),
               TextFns.hash60(col(key).cast("string")).as("__blm_h"))
      .groupBy(col("kr"))
      .agg(count(lit(1)).as("n"), min(col(key)).as("lo"),
           max(col(key)).as("hi"), bloom(col("__blm_h")).as("b"))
      .collect()
      .map { r =>
        r.getInt(0) -> ((Region(r.getInt(0), r.getLong(1), r.get(2), r.get(3)),
          r.getAs[Array[Byte]]("b")))
      }.toMap
  }

  /** Driver-side key hash, identical to the executor-side
    * `TextFns.hash60(cast(key as string))` (md5 → first 15 hex chars →
    * base-16 long), so the probe and the build can never drift.
    */
  private def driverHash60(typ: String, v: Any): Long = {
    val s = typ match {
      case "long" => v.asInstanceOf[Number].longValue().toString
      case _ => v.toString
    }
    java.lang.Long.parseLong(TextFns.md5Hex(s).substring(0, 15), 16)
  }

  private def encKey(typ: String, v: Any): String = typ match {
    case "long" => v.asInstanceOf[Number].longValue().toString
    case _ => java.util.Base64.getEncoder
      .encodeToString(v.toString.getBytes("UTF-8"))
  }

  private def decKey(typ: String, s: String): Any = typ match {
    case "long" => s.toLong
    case _ => new String(java.util.Base64.getDecoder.decode(s), "UTF-8")
  }

  /** Atomic sidecar publish: temp file in the same directory + atomic
    * move, so a crash mid-write can never leave a truncated sidecar for
    * readRegions/readBlooms to choke on (the same discipline as the
    * versioned store's manifest publish).
    */
  private def atomicWrite(target: Path, content: String): Unit = {
    val tmp = Files.createTempFile(target.getParent, ".tmp-sidecar", "")
    try {
      Files.write(tmp, content.getBytes("UTF-8"))
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }

  private def writeRegions(spark: SparkSession, name: String,
                           rm: RegionMap, target: Long): Unit = {
    val lines = s"${rm.typ},$target" +: rm.regions.map(r =>
      s"${r.kr},${r.rows},${encKey(rm.typ, r.min)},${encKey(rm.typ, r.max)}")
    atomicWrite(sidecar(spark, name), lines.mkString("\n"))
  }

  /** Region map + the store's per-region row target (persisted in the
    * sidecar header; legacy headers without it fall back to the default).
    * Entries are sorted by MIN KEY — the binary-search invariant — not by
    * kr: after an automatic split, fresh kr ids interleave the key order.
    */
  private[graft] def readRegionsWithTarget(
      spark: SparkSession, name: String): (RegionMap, Long) = {
    val lines = Files.readAllLines(sidecar(spark, name)).asScala.toIndexedSeq
    val header = lines.head.split(",", 2)
    val typ = header(0)
    val target = header.lift(1).map(_.toLong).getOrElse(DefaultTargetRowsPerRegion)
    val regions = lines.tail.filter(_.nonEmpty).map { l =>
      val Array(kr, n, lo, hi) = l.split(",", 4)
      Region(kr.toInt, n.toLong, decKey(typ, lo), decKey(typ, hi))
    }
    val ord: Ordering[Any] = typ match {
      case "long" => Ordering.by[Any, Long](_.asInstanceOf[Number].longValue())
      case _ => Ordering.by[Any, String](_.toString)
    }
    (RegionMap(typ, regions.sortBy(_.min)(ord)), target)
  }

  private[graft] def readRegions(spark: SparkSession, name: String): RegionMap =
    readRegionsWithTarget(spark, name)._1

  private def keyTyp(df: DataFrame, key: String): String =
    df.schema(key).dataType match {
      case LongType | IntegerType => "long"
      case StringType => "string"
      case dt => throw new IllegalArgumentException(
        s"KeyedStore supports BIGINT/INT/STRING keys, got ${dt.simpleString}")
    }

  /** CTAS the keyed table: ~n/target key-range regions, key-sorted files
    * within each `kr` directory, and the region-boundary sidecar.
    */
  def create(spark: SparkSession, name: String, rows: DataFrame, key: String,
             targetRowsPerRegion: Long = DefaultTargetRowsPerRegion): Unit = {
    require(!rows.columns.contains("kr"),
      "KeyedStore payloads must not contain a column named 'kr'")
    val typ = keyTyp(rows, key)
    dropWithLocation(spark, name)
    val n = rows.count()
    val nRegions = math.max(1L,
      (n + targetRowsPerRegion - 1) / targetRowsPerRegion).toInt
    rows.repartitionByRange(nRegions, col(key))
      .withColumn("kr", spark_partition_id())
      .sortWithinPartitions(col("kr"), col(key))
      .write.mode("overwrite").format("parquet").partitionBy("kr")
      .saveAsTable(name)
    // Region directory + row blooms (~10 bits/key at the region target)
    // from the written data: ONE fused aggregate pass over (kr, key).
    val mBits = graft.functions.BloomAgg.sizeFor(targetRowsPerRegion)
    val stats = regionStats(spark.table(name), key, mBits)
    writeRegions(spark, name,
      RegionMap(typ, stats.values.map(_._1).toIndexedSeq.sortBy(_.kr)),
      targetRowsPerRegion)
    writeBlooms(spark, name, mBits, stats.view.mapValues(_._2).toMap)
  }

  /** Batch point-GET: driver-side region resolution (binary search over
    * the sidecar) → static `kr` PartitionFilters + key IN-list pushdown.
    * Touches O(keys) region partitions and, within them, O(keys) sorted
    * row groups — regardless of table size.
    */
  def get(spark: SparkSession, name: String, key: String, keys: Seq[Any]): DataFrame = {
    val rm = readRegions(spark, name)
    val blooms = readBlooms(spark, name)
    // Range-candidate regions first (binary search over the sidecar),
    // then the per-region row bloom rejects candidates that definitely
    // don't hold the key — an absent-key GET touches ZERO partitions
    // (modulo the ~1% false-positive rate), the HBase ROW-bloom fast
    // path. A region with no bloom entry is scanned (fail-open).
    val krs = keys.flatMap { kk =>
      val h = blooms.map(_ => driverHash60(rm.typ, kk))
      rm.holdingIdx(kk).map(i => rm.regions(i).kr).filter { kr =>
        blooms.forall { case (_, bl) =>
          bl.get(kr).forall(b =>
            graft.functions.BloomAgg.maybeContains(b, h.get, BloomK))
        }
      }
    }.distinct
    spark.table(name)
      .filter(col("kr").isin(krs: _*))
      .filter(col(key).isin(keys: _*))
      .drop("kr")
  }

  /** Range SCAN over [from, to] (inclusive): prunes to exactly the
    * regions whose key range intersects the scan (PartitionFilters) and
    * pushes the range predicate into the key-sorted parquet
    * (PushedFilters min/max row-group skipping). The HBase
    * `Scan(startRow, stopRow)` analog.
    */
  def scan(spark: SparkSession, name: String, key: String,
           from: Any, to: Any): DataFrame = {
    val rm = readRegions(spark, name)
    val krs = rm.rangeIdx(from, to).map(i => rm.regions(i).kr)
    spark.table(name)
      .filter(col("kr").isin(krs: _*))
      .filter(col(key) >= lit(from) && col(key) <= lit(to))
      .drop("kr")
  }

  /** MERGE a change set (`op` ∈ U/I/D rows, [[SourceSinkOps.mergeUpsert]]
    * semantics) into the table, rewriting only the regions that contain
    * changed keys; returns the post-merge table. Base rows keep their
    * resident region (no accidental row movement); changed rows land in
    * their coverage region. The merged relation is materialized with
    * localCheckpoint so the touched partitions are read and overwritten
    * in ONE pass — no staging copy (at multi-executor scale, substitute
    * a reliable checkpoint dir for the same break-the-cycle effect).
    */
  def upsert(spark: SparkSession, name: String, key: String,
             changes: DataFrame): DataFrame = {
    val (rm, target) = readRegionsWithTarget(spark, name)
    // Coverage region per change row — codegen'd binary search; only the
    // O(touched regions) distinct ids reach the driver.
    val changesK = changes.withColumn("kr", rm.krCol(col(key)))
    val coverage = changesK.select(col("kr")).distinct().collect()
      .map(_.getInt(0)).toSet
    val krToIdx = rm.regions.zipWithIndex.map { case (r, i) => r.kr -> i }.toMap
    val touchedKr = rm.expandTouched(coverage.map(krToIdx))
      .map(rm.regions(_).kr)
    val baseTouched = spark.table(name)
      .filter(col("kr").isin(touchedKr: _*))
    val merged = SourceSinkOps.mergeUpsert(baseTouched, changesK, key)
    writeTouched(spark, name, key, rm, touchedKr, merged, target)
    maybeSplit(spark, name, key)
    spark.table(name).drop("kr")
  }

  /** Merge a keyed BATCH into the table under a caller-supplied
    * commutative merge — `merge(baseTouchedRows, batch)` returns the
    * post-merge rows for every key present in either input (e.g.
    * latest-wins max-struct, additive counts). This is the micro-batch
    * sink primitive behind the streaming stores: same region
    * copy-on-write as [[upsert]] (only regions holding batch keys are
    * read and rewritten — O(changed regions), never O(table)), but the
    * conflict rule is the caller's, so an out-of-order batch can LOSE to
    * the resident row (something replace-semantics upsert can't express).
    * Base-only keys keep their resident region; keys new to the table
    * land in their coverage region.
    */
  def mergeInto(spark: SparkSession, name: String, key: String,
                batch: DataFrame,
                merge: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    require(!batch.columns.contains("kr"),
      "KeyedStore payloads must not contain a column named 'kr'")
    val (rm, target) = readRegionsWithTarget(spark, name)
    val coverage = batch.select(rm.krCol(col(key)).as("kr")).distinct()
      .collect().map(_.getInt(0)).toSet
    val krToIdx = rm.regions.zipWithIndex.map { case (r, i) => r.kr -> i }.toMap
    val touchedKr = rm.expandTouched(coverage.map(krToIdx))
      .map(rm.regions(_).kr)
    val baseTouched = spark.table(name).filter(col("kr").isin(touchedKr: _*))
    // Resident region per base key: merged rows re-join it so surviving
    // keys never move regions (a boundary-straddling key's coverage can
    // differ from its residence); only table-new keys take coverage.
    val residentKr = baseTouched
      .select(col(key).as("__mrg_k"), col("kr").as("__mrg_kr")).distinct()
    val merged = merge(baseTouched.drop("kr"), batch)
      .join(residentKr, col(key) === col("__mrg_k"), "left")
      .withColumn("kr", coalesce(col("__mrg_kr"), rm.krCol(col(key))))
      .drop("__mrg_k", "__mrg_kr")
    writeTouched(spark, name, key, rm, touchedKr, merged, target)
    maybeSplit(spark, name, key)
    spark.table(name).drop("kr")
  }

  /** Shared write path of [[upsert]]/[[mergeInto]]: land `merged` (the
    * post-merge rows of the touched regions, `kr` attached) via dynamic
    * partition overwrite, drop partitions the merge emptied (dynamic
    * overwrite only rewrites partitions PRESENT in the output — an
    * all-keys-deleted region would otherwise keep its stale files), and
    * refresh the region sidecar's (rows, min, max) for the touched
    * entries so later GET/scan pruning sees keys that moved past the old
    * recorded bounds. The merged relation is localCheckpoint-materialized
    * so the table is read and rewritten in ONE pass (no staging copy; at
    * multi-executor scale, substitute a reliable checkpoint dir).
    */
  private def writeTouched(spark: SparkSession, name: String, key: String,
                           rm: RegionMap, touchedKr: Seq[Int],
                           merged: DataFrame, target: Long): Unit = {
    val cols = spark.table(name).columns.toIndexedSeq
    val out = merged
      .repartitionByRange(math.max(1, touchedKr.size), col("kr"), col(key))
      .sortWithinPartitions(col("kr"), col(key))
      .select(cols.map(col): _*) // insertInto is positional
      .localCheckpoint()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try out.write.mode("overwrite").insertInto(name)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    // Post-merge stats AND rebuilt blooms per touched region in ONE fused
    // aggregate — off the already-materialized checkpoint blocks,
    // O(touched) not O(table). An emptied region loses its bloom entry so
    // probes reject it outright.
    val bloomSide = readBlooms(spark, name)
    val mBits = bloomSide.map(_._1).getOrElse(
      graft.functions.BloomAgg.sizeFor(DefaultTargetRowsPerRegion))
    val full = regionStats(out, key, mBits)
    val stats = full.view.mapValues(_._1).toMap
    val touched = touchedKr.toSet
    touchedKr.filterNot(stats.contains).foreach { krv =>
      spark.sql(s"ALTER TABLE $name DROP IF EXISTS PARTITION (kr=$krv)")
    }
    // Emptied regions keep their sidecar entry with rows = 0 and the old
    // bounds: pruning may still select them, reads see the dropped (empty)
    // partition — harmless — while coverage keeps routing inserts, so the
    // region map never goes empty.
    val newRegions = rm.regions.map { r =>
      if (!touched.contains(r.kr)) r
      else stats.getOrElse(r.kr, r.copy(rows = 0L))
    }
    writeRegions(spark, name, RegionMap(rm.typ, newRegions), target)
    bloomSide.foreach { case (m, existing) =>
      writeBlooms(spark, name, m,
        existing.removedAll(touchedKr) ++ full.view.mapValues(_._2).toMap)
    }
  }

  /** Automatic region SPLIT — what an HBase region server does when a
    * region outgrows its size threshold, so insert-heavy workloads
    * (boundary regions absorb every out-of-range key) stay bounded
    * without waiting for a manual [[rebalance]]. Any region whose
    * post-merge row count exceeds `SplitFactor`× the store target is
    * rewritten into ~rows/target key-range sub-regions under FRESH kr
    * ids (the region directory is min-key-sorted, so id order need not
    * match key order); every other region's files are untouched. Cost is
    * O(oversized regions), read-then-write broken by the same
    * localCheckpoint materialization as the merge path.
    */
  private val SplitFactor = 2L

  private def maybeSplit(spark: SparkSession, name: String,
                         key: String): Unit = {
    val (rm, target) = readRegionsWithTarget(spark, name)
    val oversized = rm.regions.filter(_.rows > SplitFactor * target)
    if (oversized.isEmpty) return
    val bloomSide = readBlooms(spark, name)
    val mBits = bloomSide.map(_._1).getOrElse(
      graft.functions.BloomAgg.sizeFor(target))
    var nextKr = rm.regions.map(_.kr).max + 1
    var regions = rm.regions
    var blooms = bloomSide.map(_._2).getOrElse(Map.empty[Int, Array[Byte]])
    val cols = spark.table(name).columns.toIndexedSeq
    oversized.foreach { r =>
      val k = math.max(2L, (r.rows + target - 1) / target).toInt
      val firstKr = nextKr
      nextKr += k
      val out = spark.table(name).filter(col("kr") === r.kr).drop("kr")
        .repartitionByRange(k, col(key))
        .withColumn("kr", spark_partition_id() + lit(firstKr))
        .sortWithinPartitions(col("kr"), col(key))
        .select(cols.map(col): _*)
        .localCheckpoint()
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try out.write.mode("overwrite").insertInto(name)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      spark.sql(s"ALTER TABLE $name DROP IF EXISTS PARTITION (kr=${r.kr})")
      val stats = regionStats(out, key, mBits)
      regions = regions.filterNot(_.kr == r.kr) ++ stats.values.map(_._1)
      blooms = (blooms - r.kr) ++ stats.view.mapValues(_._2).toMap
    }
    writeRegions(spark, name, RegionMap(rm.typ, regions), target)
    bloomSide.foreach { case (m, _) => writeBlooms(spark, name, m, blooms) }
  }

  /** Online region MERGE — the HBase normalizer's other half, symmetric
    * to [[maybeSplit]]: runs of ADJACENT (min-key order) regions whose
    * combined rows fit the store target collapse into one region under a
    * fresh kr id, and runs of fully-EMPTIED regions (rows = 0 after
    * deletes) drop out of the directory entirely (coverage is total by
    * construction — a key in a removed range routes to the preceding
    * region). Regions that don't pack with a neighbor keep their files
    * untouched, so cost is O(merged regions), never O(table) — the
    * delete-heavy table's answer to what [[VersionedStore.compact]] does
    * for the versioned store's leaves. Explicit maintenance (like HBase's
    * normalizer), not an auto-trigger: merging trades write cost now for
    * read locality later, a call the operator makes. Returns the number
    * of regions eliminated (0 = nothing to do).
    */
  def mergeSmallRegions(spark: SparkSession, name: String,
                        key: String): Int = {
    val (rm, target) = readRegionsWithTarget(spark, name)
    // Greedy run-coalescing over the min-key-ordered directory, same rule
    // as the versioned store's bin-packing compaction.
    val bins = scala.collection.mutable.ArrayBuffer.empty[Vector[Region]]
    var run = Vector.empty[Region]
    var runRows = 0L
    rm.regions.foreach { r =>
      if (run.nonEmpty && runRows + r.rows <= target) {
        run :+= r; runRows += r.rows
      } else {
        if (run.nonEmpty) bins += run
        run = Vector(r); runRows = r.rows
      }
    }
    if (run.nonEmpty) bins += run
    val mergeBins = bins.filter(_.size >= 2).toSeq
    if (mergeBins.isEmpty) return 0
    val kept = bins.filter(_.size < 2).map(_.head).toSeq
    var nextKr = rm.regions.map(_.kr).max + 1
    // old kr -> new kr for every non-empty bin (all-empty bins simply
    // vanish: partitions dropped, entries removed).
    val mapping: Map[Int, Int] = mergeBins.flatMap { b =>
      if (b.forall(_.rows == 0L)) Nil
      else { val nk = nextKr; nextKr += 1; b.map(_.kr -> nk) }
    }.toMap
    val bloomSide = readBlooms(spark, name)
    val mBits = bloomSide.map(_._1).getOrElse(
      graft.functions.BloomAgg.sizeFor(target))
    var stats = Map.empty[Int, (Region, Array[Byte])]
    if (mapping.nonEmpty) {
      val cols = spark.table(name).columns.toIndexedSeq
      val mapCol = map(mapping.flatMap { case (o, n) =>
        Seq(lit(o), lit(n)) }.toSeq: _*)
      val out = spark.table(name)
        .filter(col("kr").isin(mapping.keys.toSeq: _*))
        .withColumn("kr", element_at(mapCol, col("kr")))
        .repartitionByRange(math.max(1, mapping.values.toSet.size),
                            col("kr"), col(key))
        .sortWithinPartitions(col("kr"), col(key))
        .select(cols.map(col): _*)
        .localCheckpoint()
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try out.write.mode("overwrite").insertInto(name)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      stats = regionStats(out, key, mBits)
    }
    val gone = mergeBins.flatten.map(_.kr).toSet
    gone.foreach { krv =>
      spark.sql(s"ALTER TABLE $name DROP IF EXISTS PARTITION (kr=$krv)")
    }
    val regions = rm.regions.filterNot(r => gone.contains(r.kr)) ++
      stats.values.map(_._1)
    writeRegions(spark, name, RegionMap(rm.typ, regions), target)
    bloomSide.foreach { case (m, blooms) =>
      writeBlooms(spark, name, m,
        blooms.removedAll(gone) ++ stats.view.mapValues(_._2).toMap)
    }
    gone.size - stats.size
  }

  /** Drop the table and its data directory (cleanup hook for temp
    * stores). */
  def drop(spark: SparkSession, name: String): Unit =
    dropWithLocation(spark, name)

  /** Does the catalog table exist? (foreachBatch sinks create on first
    * batch.) */
  def exists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** Maintenance: re-derive balanced regions from the current table —
    * the major-compaction / region-split pass that absorbs growth after
    * many upserts (fixed boundaries make hot boundary regions grow).
    */
  def rebalance(spark: SparkSession, name: String, key: String,
                targetRowsPerRegion: Long = DefaultTargetRowsPerRegion): Unit = {
    val current = spark.table(name).drop("kr").localCheckpoint()
    create(spark, name, current, key, targetRowsPerRegion)
  }
}
