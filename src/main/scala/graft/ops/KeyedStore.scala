package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import java.nio.file.{Files, Path}
import java.util.concurrent.atomic.AtomicLong
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
  *  - per-region ROW BLOOMS live DATA-SIDE, one file per region under
  *    `_graft_blooms/kr=<id>` — exactly where HBase keeps them (in the
  *    region's HFiles, never in meta). They are WRITTEN by the executor
  *    task holding the region's fused aggregate row and READ lazily,
  *    only for the regions a GET's range candidacy selects, so driver
  *    bloom residency is O(probed regions) while the table can grow to
  *    10⁶ regions. A GET for an absent key touches zero partitions (the
  *    bloom rejects every candidate); a region with no / stale bloom
  *    file is scanned (fail open — see [[loadBloom]]);
  *  - all mutating entry points hold a per-table WRITER LOCK (a
  *    create-exclusive lock file beside the table location, with a
  *    stale-lock takeover), so two concurrent upsert/mergeInto calls
  *    serialize instead of interleaving read→merge→overwrite and
  *    silently losing a writer's regions — the single-writer-per-region
  *    discipline an HBase region server enforces by ownership;
  *  - the region directory is CACHED driver-side keyed by the sidecar's
  *    (mtime, size), so repeated GET/scan/merge calls parse it once, and
  *    a directory written by another JVM is picked up on its next
  *    change. Bloom bytes cache the same way, per region file;
  *  - CREATE is idempotent across JVMs: a stale warehouse LOCATION left
  *    by a previous session is cleared before the CTAS.
  *
  * Crash ordering: the data write (dynamic partition overwrite) is the
  * commit point. Maintenance passes that re-home rows to FRESH kr ids
  * (split / region merge) publish the updated region directory BEFORE
  * dropping the superseded partitions, so a crash can orphan an unlisted
  * partition (invisible to get/scan, reclaimed by [[repair]]) but can
  * never leave the directory pointing at dropped data. The residual
  * window — a crash between the data overwrite and the sidecar refresh
  * leaves stale (rows, min, max) bounds — only widens scans' prune
  * lists' misses for keys that moved past the recorded bounds, and heals
  * on the next write; bloom files that predate their region's data are
  * detected by mtime and ignored (fail open), so a torn write can cause
  * extra IO, never a wrong answer.
  *
  * Read isolation: GET/scan/raw-SQL reads WITH a key predicate route
  * through the region directory and are consistent at every instant of
  * a split/merge (the directory flips atomically from old to new
  * regions). A raw full-table read with NO key predicate is NOT
  * isolated against concurrent maintenance: between the new partitions
  * landing and the superseded partition's drop it can observe the
  * moving region twice (choosing the opposite order would instead make
  * rows vanish mid-flight — strictly worse). Quiesce writers around
  * full-table exports, or read through [[scan]] — the same contract as
  * reading HBase through raw HFiles instead of the client API.
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
    dirCache.remove(sidecar(spark, name).toString)
  }

  /** Filesystem location of the table's data (test hook for the
    * byte-identity probe). */
  private[graft] def location(spark: SparkSession, name: String): Path =
    new java.io.File(
      new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
      name.toLowerCase).toPath

  private def sidecar(spark: SparkSession, name: String): Path =
    location(spark, name).resolve("_graft_regions")

  // ------------------------- writer fencing -------------------------

  private val LockStaleMs = 60000L
  private val LockWaitMs = 120000L
  private val LockHeartbeatMs = 10000L

  /** Lock file lives BESIDE the table location (create wipes the
    * location itself), in the warehouse directory.
    */
  private def lockPath(spark: SparkSession, name: String): Path =
    location(spark, name).resolveSibling(name.toLowerCase + ".graft-lock")

  /** Per-table writer mutex: create-exclusive lock file, blocking
    * acquire, crash-safe takeover. Serializes every mutating entry
    * point so concurrent upsert/mergeInto calls cannot interleave
    * read-sidecar → merge → overwrite → write-sidecar and silently lose
    * one writer's regions — the fencing [[VersionedStore]] gets from
    * create-exclusive manifest publishes, adapted to a store that
    * mutates one shared table in place (where optimistic publish can't
    * roll back the data write, a mutex is the sound shape).
    *
    * Liveness vs safety, carefully:
    *  - the HOLDER runs a daemon heartbeat that refreshes the lock
    *    mtime every `LockHeartbeatMs`, so a legitimate writer running
    *    longer than the staleness horizon is never usurped — only a
    *    crashed holder (no heartbeat for `LockStaleMs`) goes stale;
    *  - takeover of a stale lock is TOKEN-VERIFIED: the claimant
    *    atomically MOVES the lock aside to a unique name (exactly one
    *    concurrent claimant can win the move; losers see
    *    NoSuchFileException and re-race createFile), then compares the
    *    moved file's token against the token it observed stale. A
    *    mismatch means the stale holder released and a NEW writer
    *    acquired between observation and move — the fresh lock is moved
    *    straight back and the claimant re-waits. This closes the
    *    delete-based race where two claimants both judge the lock stale
    *    and the second delete removes the first claimant's freshly
    *    created lock;
    *  - release deletes the lock only while its content still matches
    *    the holder's own token, so a usurped (crashed-and-reclaimed)
    *    holder resuming in finally cannot delete a successor's lock.
    */
  private def withTableLock[T](spark: SparkSession, name: String)(body: => T): T = {
    val p = lockPath(spark, name)
    Files.createDirectories(p.getParent)
    val token = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + LockWaitMs
    var acquired = false
    while (!acquired) {
      try {
        Files.write(p, token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        acquired = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val observed: Option[(String, Long)] =
            try Some((new String(Files.readAllBytes(p), "UTF-8"),
              Files.getLastModifiedTime(p).toMillis))
            catch { case _: java.io.IOException => None }
          val stale = observed.exists(_._2 + LockStaleMs <=
            System.currentTimeMillis())
          if (stale) {
            val aside = p.resolveSibling(
              p.getFileName.toString + ".takeover-" + token)
            try {
              Files.move(p, aside,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              val moved = new String(Files.readAllBytes(aside), "UTF-8")
              if (moved == observed.get._1) Files.deleteIfExists(aside)
              else // stole a successor's FRESH lock: restore it intact
                try Files.move(aside, p,
                  java.nio.file.StandardCopyOption.ATOMIC_MOVE)
                catch { case _: java.io.IOException =>
                  Files.deleteIfExists(aside) }
            } catch {
              case _: java.io.IOException => () // lost the move race; re-wait
            }
          } else if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(
              s"KeyedStore: timed out waiting for writer lock $p")
          else Thread.sleep(20)
      }
    }
    // Heartbeat while held: a long merge's Spark jobs must not let the
    // lock go stale under a live writer.
    val beat = new Thread(() => {
      try while (true) {
        Thread.sleep(LockHeartbeatMs)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis()))
      } catch { case _: InterruptedException | _: java.io.IOException => () }
    }, s"graft-lock-heartbeat-$name")
    beat.setDaemon(true)
    beat.start()
    try body finally {
      beat.interrupt()
      // Token-guarded release: only delete a lock we still own.
      try {
        if (new String(Files.readAllBytes(p), "UTF-8") == token)
          Files.deleteIfExists(p)
      } catch { case _: java.io.IOException => () }
    }
  }

  // -------- per-region row blooms (HBase HFile ROW-bloom analog) --------

  /** Hash probes per key — fixed store-wide; filter SIZE lives in the
    * bloom meta file (derived from the region target at create). */
  private[graft] val BloomK = 7

  private def bloomDir(spark: SparkSession, name: String): Path =
    location(spark, name).resolve("_graft_blooms")

  private def bloomFile(spark: SparkSession, name: String, kr: Int): Path =
    bloomDir(spark, name).resolve(s"kr=$kr")

  /** Atomic single-file publish used by both the driver-side sidecar
    * writes and the EXECUTOR-side bloom writes: temp file in the target
    * directory + atomic move, so a crash mid-write never leaves a
    * truncated file for a reader to choke on.
    */
  private[graft] def atomicWriteBytes(target: Path, content: Array[Byte]): Unit = {
    val tmp = Files.createTempFile(target.getParent, ".tmp-sidecar", "")
    try {
      Files.write(tmp, content)
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }

  private def atomicWrite(target: Path, content: String): Unit =
    atomicWriteBytes(target, content.getBytes("UTF-8"))

  /** Bloom SIZE for this store (bits), persisted once at create in
    * `_graft_blooms/_meta`; absent (legacy store) → re-derive from the
    * persisted region target, never from the global default.
    */
  private def readBloomBits(spark: SparkSession, name: String,
                            target: Long): Int = {
    val p = bloomDir(spark, name).resolve("_meta")
    if (Files.exists(p))
      Files.readAllLines(p).asScala.head.split(",")(0).toInt
    else graft.functions.BloomAgg.sizeFor(target)
  }

  /** Test hook: number of bloom FILES physically read (cache misses).
    * Pins the O(probed regions) residency contract — a GET must read
    * bloom bytes for only the regions its range candidacy selects, and
    * repeated probes must be served from cache.
    */
  private[graft] val bloomFileReads = new AtomicLong(0)

  /** path → (bloom file mtime, bytes). Validated by mtime on every hit;
    * bounded in practice by the working set of probed regions.
    */
  private val bloomCache =
    new java.util.concurrent.ConcurrentHashMap[String, (java.nio.file.attribute.FileTime, Array[Byte])]

  /** Lazily load ONE region's bloom from the table LOCATION (path-based
    * so the [[graft.plans.KeyedRegionPrune]] optimizer rule — which sees
    * a catalog location, not a session+name — shares the loader and the
    * cache). Fail-open contract: a missing bloom file — or one OLDER
    * than the region's data directory (a crash between the partition
    * overwrite and the bloom refresh) — is treated as absent, so the
    * region is scanned; a torn bloom write costs IO, never correctness.
    */
  private[graft] def loadBloomAt(loc: Path, kr: Int): Option[Array[Byte]] = {
    val f = loc.resolve("_graft_blooms").resolve(s"kr=$kr")
    if (!Files.exists(f)) None
    else {
      val bm = Files.getLastModifiedTime(f)
      val dataDir = loc.resolve(s"kr=$kr")
      val fresh = !Files.exists(dataDir) ||
        Files.getLastModifiedTime(dataDir).compareTo(bm) <= 0
      if (!fresh) None
      else {
        val key = f.toString
        val hit = bloomCache.get(key)
        if (hit != null && hit._1 == bm) Some(hit._2)
        else {
          bloomFileReads.incrementAndGet()
          val bytes = Files.readAllBytes(f)
          bloomCache.put(key, (bm, bytes))
          Some(bytes)
        }
      }
    }
  }

  private def loadBloom(spark: SparkSession, name: String,
                        kr: Int): Option[Array[Byte]] =
    loadBloomAt(location(spark, name), kr)

  /** ONE partial-combined aggregate pass over a (kr, key, ...) relation:
    * per-region (rows, min, max) comes back to the driver — one ~50-byte
    * row per region, the control plane — while each region's BLOOM BYTES
    * are written data-side by the executor task that holds the
    * aggregated row (`_graft_blooms/kr=<id>`, atomic publish). The
    * driver never materializes a bloom: residency is O(1) filters at
    * create and O(probed regions) at read, however many regions the
    * table grows (HBase keeps blooms in HFiles, not in meta, for the
    * same reason). Executors write through the table's filesystem — the
    * same shared-FS assumption the parquet write itself makes.
    */
  private def regionStats(spark: SparkSession, name: String, rel: DataFrame,
                          key: String, typ: String,
                          mBits: Int): Map[Int, Region] = {
    val bd = bloomDir(spark, name)
    // Legacy layout: the pre-7 store kept ALL blooms in one FILE at this
    // exact path. Supersede it (its content is rebuilt per-region below).
    if (Files.exists(bd) && !Files.isDirectory(bd)) Files.delete(bd)
    Files.createDirectories(bd)
    val bdStr = bd.toString
    val bloom = udaf(new graft.functions.BloomAgg(mBits, BloomK),
      org.apache.spark.sql.Encoders.scalaLong)
    val agg = rel.select(col("kr"), col(key),
               TextFns.hash60(col(key).cast("string")).as("__blm_h"))
      .groupBy(col("kr"))
      .agg(count(lit(1)).as("n"), min(col(key)).as("lo"),
           max(col(key)).as("hi"), bloom(col("__blm_h")).as("b"))
    implicit val enc: org.apache.spark.sql.Encoder[(Int, Long, String, String)] =
      org.apache.spark.sql.Encoders.product[(Int, Long, String, String)]
    agg.map { r =>
        val kr = r.getInt(0)
        atomicWriteBytes(java.nio.file.Paths.get(bdStr, s"kr=$kr"),
          r.getAs[Array[Byte]]("b"))
        (kr, r.getLong(1), encKey(typ, r.get(2)), encKey(typ, r.get(3)))
      }
      .collect()
      .map { case (kr, n, lo, hi) =>
        kr -> Region(kr, n, decKey(typ, lo), decKey(typ, hi))
      }.toMap
  }

  /** Driver-side key hash, identical to the executor-side
    * `TextFns.hash60(cast(key as string))` (md5 → first 15 hex chars →
    * base-16 long), so the probe and the build can never drift.
    */
  private[graft] def driverHash60(typ: String, v: Any): Long = {
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

  private def writeRegions(spark: SparkSession, name: String, rm: RegionMap,
                           target: Long, keyCol: String): Unit = {
    // Header carries the KEY COLUMN (base64 — column names are free
    // text) so SQL-plan consumers ([[graft.plans.KeyedRegionPrune]]) can
    // recognize key predicates without out-of-band metadata — the region
    // directory is the store's whole contract, like HBase meta.
    val keyB64 = java.util.Base64.getEncoder
      .encodeToString(keyCol.getBytes("UTF-8"))
    val lines = s"${rm.typ},$target,$keyB64" +: rm.regions.map(r =>
      s"${r.kr},${r.rows},${encKey(rm.typ, r.min)},${encKey(rm.typ, r.max)}")
    val p = sidecar(spark, name)
    atomicWrite(p, lines.mkString("\n"))
    // Prime the cache with the parsed value under the freshly-written
    // attributes: the writer's next read is a hit, and a second write
    // within the same mtime tick can't leave a stale in-JVM entry.
    val attrs = Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    val ord: Ordering[Any] = rm.typ match {
      case "long" => Ordering.by[Any, Long](_.asInstanceOf[Number].longValue())
      case _ => Ordering.by[Any, String](_.toString)
    }
    dirCache.put(p.toString, (attrs.lastModifiedTime(), attrs.size(),
      (RegionMap(rm.typ, rm.regions.sortBy(_.min)(ord)), target, Some(keyCol))))
  }

  /** Test hook: number of sidecar PARSES (cache misses). Pins the
    * one-parse-per-version contract — repeated GET/scan calls must not
    * re-read the region directory.
    */
  private[graft] val sidecarParses = new AtomicLong(0)

  /** path → (mtime, size, parsed). Validated by (mtime, size) on every
    * read, so a directory republished by ANOTHER JVM is picked up on
    * its next change while same-version reads are served from memory —
    * at 10⁶ regions that is the difference between ~50 MB parsed per
    * point-GET and one parse per directory version.
    */
  private val dirCache =
    new java.util.concurrent.ConcurrentHashMap[String, (java.nio.file.attribute.FileTime, Long, (RegionMap, Long, Option[String]))]

  /** Parse (through the cache) the region directory at an explicit
    * sidecar PATH: (region map, per-region row target, key column).
    * Path-based so [[graft.plans.KeyedRegionPrune]] — which resolves a
    * catalog table's location, not a session+name — shares the parse and
    * the cache. Entries are sorted by MIN KEY — the binary-search
    * invariant — not by kr: after an automatic split, fresh kr ids
    * interleave the key order. Legacy headers lacking target/key fall
    * back to (default, None).
    */
  private[graft] def parseSidecarAt(p: Path): (RegionMap, Long, Option[String]) = {
    val attrs = Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    val cached = dirCache.get(p.toString)
    if (cached != null && cached._1 == attrs.lastModifiedTime() &&
        cached._2 == attrs.size()) return cached._3
    sidecarParses.incrementAndGet()
    val lines = Files.readAllLines(p).asScala.toIndexedSeq
    val header = lines.head.split(",", 3)
    val typ = header(0)
    val target = header.lift(1).map(_.toLong).getOrElse(DefaultTargetRowsPerRegion)
    val keyCol = header.lift(2).map(b =>
      new String(java.util.Base64.getDecoder.decode(b), "UTF-8"))
    val regions = lines.tail.filter(_.nonEmpty).map { l =>
      val Array(kr, n, lo, hi) = l.split(",", 4)
      Region(kr.toInt, n.toLong, decKey(typ, lo), decKey(typ, hi))
    }
    val ord: Ordering[Any] = typ match {
      case "long" => Ordering.by[Any, Long](_.asInstanceOf[Number].longValue())
      case _ => Ordering.by[Any, String](_.toString)
    }
    val parsed = (RegionMap(typ, regions.sortBy(_.min)(ord)), target, keyCol)
    dirCache.put(p.toString, (attrs.lastModifiedTime(), attrs.size(), parsed))
    parsed
  }

  private[graft] def readRegionsWithTarget(
      spark: SparkSession, name: String): (RegionMap, Long) = {
    val (rm, target, _) = parseSidecarAt(sidecar(spark, name))
    (rm, target)
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
    * within each `kr` directory, the region-boundary sidecar, and one
    * data-side bloom file per region.
    */
  def create(spark: SparkSession, name: String, rows: DataFrame, key: String,
             targetRowsPerRegion: Long = DefaultTargetRowsPerRegion): Unit =
    withTableLock(spark, name) {
      createLocked(spark, name, rows, key, targetRowsPerRegion)
    }

  private def createLocked(spark: SparkSession, name: String, rows: DataFrame,
                           key: String, targetRowsPerRegion: Long): Unit = {
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
    // from the written data: ONE fused aggregate pass over (kr, key);
    // bloom bytes land data-side from the executors, never on the driver.
    val mBits = graft.functions.BloomAgg.sizeFor(targetRowsPerRegion)
    Files.createDirectories(bloomDir(spark, name))
    atomicWrite(bloomDir(spark, name).resolve("_meta"), s"$mBits,$BloomK")
    val stats = regionStats(spark, name, spark.table(name), key, typ, mBits)
    writeRegions(spark, name,
      RegionMap(typ, stats.values.toIndexedSeq.sortBy(_.kr)),
      targetRowsPerRegion, key)
  }

  /** Batch point-GET: driver-side region resolution (binary search over
    * the CACHED sidecar) → static `kr` PartitionFilters + key IN-list
    * pushdown. Touches O(keys) region partitions and, within them,
    * O(keys) sorted row groups — regardless of table size.
    */
  def get(spark: SparkSession, name: String, key: String, keys: Seq[Any]): DataFrame = {
    val rm = readRegions(spark, name)
    // Range-candidate regions first (binary search over the sidecar),
    // then each candidate's row bloom — loaded lazily, ONLY for the
    // candidates — rejects regions that definitely don't hold the key:
    // an absent-key GET touches ZERO partitions (modulo the ~1%
    // false-positive rate), the HBase ROW-bloom fast path. A region with
    // a missing or stale bloom file is scanned (fail open).
    val krs = keys.flatMap { kk =>
      val h = driverHash60(rm.typ, kk)
      rm.holdingIdx(kk).map(i => rm.regions(i).kr).filter { kr =>
        loadBloom(spark, name, kr).forall(b =>
          graft.functions.BloomAgg.maybeContains(b, h, BloomK))
      }
    }.distinct
    spark.table(name)
      .filter(col("kr").isin(krs: _*))
      .filter(col(key).isin(keys: _*))
      .drop("kr")
  }

  /** Batch GET for a LARGE key set supplied as a DataFrame — the HBase
    * multiGet analog, and the scalable sibling of [[get]]: an IN-list of
    * 10⁵ literals is itself a driver-side plan bomb (every literal is an
    * expression node analyzed and codegen'd), so past point-lookup size
    * the key set must stay DATA. Region assignment per key is the
    * codegen'd binary search ([[RegionMap.krCol]]); only the O(touched
    * regions) distinct kr ids reach the driver (the same control-plane
    * discipline as upsert), the scan statically prunes to those
    * partitions, and the keys join back as a broadcast-eligible semi
    * join — per-key cost is O(1) region partitions at any table or
    * batch size.
    */
  def getBatch(spark: SparkSession, name: String, key: String,
               keys: DataFrame): DataFrame = {
    require(keys.columns.contains(key),
      s"getBatch keys must carry the key column '$key'")
    val rm = readRegions(spark, name)
    val wanted = keys.select(col(key)).distinct()
    // Coverage kr per key; straddling keys expand like upsert's closure.
    val coverage = wanted.select(rm.krCol(col(key)).as("kr")).distinct()
      .collect().map(_.getInt(0)).toSet
    val krToIdx = rm.regions.zipWithIndex.map { case (r, i) => r.kr -> i }.toMap
    val krs = rm.expandTouched(coverage.map(krToIdx)).map(rm.regions(_).kr)
    spark.table(name)
      .filter(col("kr").isin(krs: _*))
      .join(wanted, Seq(key), "left_semi")
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
    * Serialized against other writers by the table lock.
    */
  def upsert(spark: SparkSession, name: String, key: String,
             changes: DataFrame): DataFrame = withTableLock(spark, name) {
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
    * land in their coverage region. Serialized against other writers by
    * the table lock.
    */
  def mergeInto(spark: SparkSession, name: String, key: String,
                batch: DataFrame,
                merge: (DataFrame, DataFrame) => DataFrame): DataFrame =
    withTableLock(spark, name) {
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

  /** Land `out` via DYNAMIC partition overwrite (only partitions present
    * in the output are rewritten), restoring the session conf either way
    * — the one write primitive every mutation path shares.
    */
  private def dynamicOverwriteInto(spark: SparkSession, name: String,
                                   out: DataFrame): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try out.write.mode("overwrite").insertInto(name)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
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
    dynamicOverwriteInto(spark, name, out)
    // Post-merge stats per touched region in ONE fused aggregate — off
    // the already-materialized checkpoint blocks, O(touched) not
    // O(table) — with each rebuilt bloom written data-side by the task
    // that holds it.
    val mBits = readBloomBits(spark, name, target)
    val stats = regionStats(spark, name, out, key, rm.typ, mBits)
    val touched = touchedKr.toSet
    touchedKr.filterNot(stats.contains).foreach { krv =>
      spark.sql(s"ALTER TABLE $name DROP IF EXISTS PARTITION (kr=$krv)")
      Files.deleteIfExists(bloomFile(spark, name, krv))
    }
    // Emptied regions keep their sidecar entry with rows = 0 and the old
    // bounds: pruning may still select them, their bloom file is deleted
    // (missing → fail open), and reads see the dropped (empty) partition
    // — harmless — while coverage keeps routing inserts, so the region
    // map never goes empty.
    val newRegions = rm.regions.map { r =>
      if (!touched.contains(r.kr)) r
      else stats.getOrElse(r.kr, r.copy(rows = 0L))
    }
    writeRegions(spark, name, RegionMap(rm.typ, newRegions), target, key)
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
    * localCheckpoint materialization as the merge path. The updated
    * directory is published BEFORE the superseded partition is dropped:
    * a crash can orphan an unlisted partition ([[repair]] reclaims it)
    * but never leaves the directory pointing at dropped data.
    */
  private val SplitFactor = 2L

  private def maybeSplit(spark: SparkSession, name: String,
                         key: String): Unit = {
    val (rm0, target) = readRegionsWithTarget(spark, name)
    val oversized = rm0.regions.filter(_.rows > SplitFactor * target)
    if (oversized.isEmpty) return
    val mBits = readBloomBits(spark, name, target)
    var nextKr = rm0.regions.map(_.kr).max + 1
    var regions = rm0.regions
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
      dynamicOverwriteInto(spark, name, out)
      val stats = regionStats(spark, name, out, key, rm0.typ, mBits)
      regions = regions.filterNot(_.kr == r.kr) ++ stats.values
      // Directory first (covers the new partitions), THEN drop the old:
      // the crash-safe order — get/scan never point at dropped data.
      writeRegions(spark, name, RegionMap(rm0.typ, regions), target, key)
      spark.sql(s"ALTER TABLE $name DROP IF EXISTS PARTITION (kr=${r.kr})")
      Files.deleteIfExists(bloomFile(spark, name, r.kr))
    }
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
    * read locality later, a call the operator makes. If EVERY region
    * would vanish (a full-table delete), one sentinel entry is retained
    * with rows = 0 so the directory never goes empty — coverage stays
    * total and later inserts still route. Returns the number of regions
    * eliminated (0 = nothing to do). Serialized by the table lock.
    */
  def mergeSmallRegions(spark: SparkSession, name: String,
                        key: String): Int = withTableLock(spark, name) {
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
    if (mergeBins.isEmpty) 0
    else mergeRuns(spark, name, key, rm, target, mergeBins)
  }

  private def mergeRuns(spark: SparkSession, name: String, key: String,
                        rm: RegionMap, target: Long,
                        mergeBins: Seq[Vector[Region]]): Int = {
    var nextKr = rm.regions.map(_.kr).max + 1
    // old kr -> new kr for every non-empty bin (all-empty bins simply
    // vanish: partitions dropped, entries removed).
    val mapping: Map[Int, Int] = mergeBins.flatMap { b =>
      if (b.forall(_.rows == 0L)) Nil
      else { val nk = nextKr; nextKr += 1; b.map(_.kr -> nk) }
    }.toMap
    val mBits = readBloomBits(spark, name, target)
    var stats = Map.empty[Int, Region]
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
      dynamicOverwriteInto(spark, name, out)
      stats = regionStats(spark, name, out, key, rm.typ, mBits)
    }
    val gone = mergeBins.flatten.map(_.kr).toSet
    val survivors = rm.regions.filterNot(r => gone.contains(r.kr)) ++
      stats.values
    // A full-table delete coalesces every region into one all-empty bin:
    // retain a rows=0 sentinel (first region, old bounds) instead of
    // persisting an empty directory — krCol/maybeSplit/coverage all
    // assume at least one entry.
    val regions =
      if (survivors.nonEmpty) survivors
      else IndexedSeq(rm.regions.head.copy(rows = 0L))
    // Directory first, THEN drop superseded partitions (crash-safe order).
    writeRegions(spark, name, RegionMap(rm.typ, regions), target, key)
    gone.foreach { krv =>
      spark.sql(s"ALTER TABLE $name DROP IF EXISTS PARTITION (kr=$krv)")
      Files.deleteIfExists(bloomFile(spark, name, krv))
    }
    // Eliminated = directory shrinkage (counts the sentinel correctly).
    rm.regions.size - regions.size
  }

  /** Crash-recovery sweep: drop any table partition whose kr is NOT in
    * the region directory (an orphan from a crash between a split/merge
    * publish and its partition drop — invisible to get/scan, but a raw
    * full-table read would double-count it) and delete bloom files with
    * no directory entry. Returns the number of orphan partitions
    * reclaimed. Safe to run any time; holds the writer lock.
    */
  def repair(spark: SparkSession, name: String): Int =
    withTableLock(spark, name) {
      val rm = readRegions(spark, name)
      val listed = rm.regions.map(_.kr).toSet
      val parts = spark.sql(s"SHOW PARTITIONS $name").collect()
        .map(_.getString(0).stripPrefix("kr=").toInt)
      val orphans = parts.filterNot(listed)
      orphans.foreach { krv =>
        spark.sql(s"ALTER TABLE $name DROP IF EXISTS PARTITION (kr=$krv)")
      }
      val bd = bloomDir(spark, name)
      if (Files.exists(bd))
        scala.util.Using.resource(Files.list(bd)) { s =>
          s.iterator().asScala.foreach { f =>
            val fn = f.getFileName.toString
            if (fn.startsWith("kr=") && !listed(fn.stripPrefix("kr=").toInt))
              Files.deleteIfExists(f)
          }
        }
      orphans.length
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
                targetRowsPerRegion: Long = DefaultTargetRowsPerRegion): Unit =
    withTableLock(spark, name) {
      val current = spark.table(name).drop("kr").localCheckpoint()
      createLocked(spark, name, current, key, targetRowsPerRegion)
    }
}
