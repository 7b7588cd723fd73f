package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Snapshot-versioned keyed store — time travel on plain parquet, the
  * manifest + copy-on-write shape of a lakehouse table format reduced to
  * its essentials, with FILE-granularity commits (the capability the
  * reference's HBase regions + HFiles provide:
  * `HPopulate/src/main/java/org/northeastern/Main.java:54-73` creates the
  * region-ranged table this store substitutes):
  *
  *  - data lives in per-commit parquet directories `data/<commit>/kf=<i>`,
  *    each leaf holding ~targetRowsPerFile rows of one contiguous range of
  *    the 60-bit key-hash space. Each manifest entry records the leaf's
  *    (minHash, maxHash, rowCount, path); entries are disjoint and cover
  *    the whole hash space, so every key maps to exactly one entry;
  *  - a commit merges and rewrites ONLY the leaves whose hash range
  *    intersects the change set — O(changed files), never O(table) and
  *    never O(table/buckets): a 1-key commit rewrites exactly one data
  *    file (VersionedStoreSpec pins it) while every other leaf is SHARED
  *    by the new snapshot. An entry whose merged range outgrows the
  *    target splits into equal-width sub-ranges, so file size stays
  *    bounded as the table grows;
  *  - manifests are TWO-LEVEL, the Iceberg manifest-list shape: entries
  *    live in immutable CHUNK files (`manifests/chunks/<id>`, ~chunkTarget
  *    entries each, disjoint hash ranges) and each version's
  *    `manifests/v<N>` is a small LIST of (chunk file, minHash, maxHash,
  *    entries). A commit reads the list, routes its change set to chunks
  *    by a hash-range binary search, opens ONLY the touched chunks,
  *    rewrites only those (untouched chunk files are shared with the
  *    previous version byte-identical), and publishes a fresh list — so
  *    per-commit metadata READ and WRITE are O(touched chunks + list),
  *    tracking data cost instead of table size. At 10⁶ leaves a 1-key
  *    commit writes one ~50 KB chunk + a ~60 KB list, not a 60 MB
  *    manifest;
  *  - each version's list file is written LAST and published atomically
  *    (temp file + create-exclusive link): a crashed commit leaves orphan
  *    data directories and chunk files (reclaimed by vacuum), never a
  *    corrupt or half-visible table. Old snapshots stay readable forever —
  *    snapshot isolation with zero reader coordination;
  *  - concurrent committers serialize OPTIMISTICALLY: both prepare
  *    against the version they read; the create-exclusive publish lets
  *    exactly one land as v(N+1), the loser re-reads the new current
  *    version and re-merges. No lock service needed — the same
  *    conditional-put protocol the manifest table formats use;
  *  - vacuum is two-phase with a read grace: an out-of-window manifest is
  *    first EXPIRED (renamed, stamped with the expiry time); its data —
  *    and any chunk file no surviving manifest references — is deleted
  *    only once the grace horizon has passed, so a reader pinned to an
  *    expiring snapshot finishes its scan (and can even re-resolve the
  *    expired manifest during grace). `graceMs = 0` reclaims immediately.
  *
  * At 100 TB the metadata is O(table / targetRowsPerFile) entries split
  * across O(entries / chunkTarget) immutable chunks — commit cost is
  * O(changed files) data + O(touched chunks) metadata; read-as-of is one
  * multi-path parquet scan of the referenced leaves.
  */
object VersionedStore {
  /** Target rows per data file. The default keeps fixture stores compact
    * (few files, few tasks); size to ~a parquet-row-group's worth of rows
    * at real scale. Fixed per store at init (persisted in `meta`).
    */
  val DefaultTargetRowsPerFile: Long = 1L << 20

  /** Manifest entries per chunk file. 1000 keeps a 10⁶-leaf table's list
    * file at ~1000 lines while a 1-key commit rewrites one ~50 KB chunk.
    * Fixed per store at init (persisted in `meta`).
    */
  val DefaultChunkTarget: Int = 1000

  private val HashSpace: Long = 1L << 60 // hash60 values lie in [0, 2^60)
  private val MaxPublishRetries = 20

  /** One manifest line: a data leaf (or a deliberately empty range —
    * kept so entries always cover the full hash space and every change
    * key finds its covering entry).
    */
  private[graft] final case class FileEntry(minH: Long, maxH: Long,
                                            rows: Long, path: String)

  /** One manifest-LIST line: an immutable chunk of `n` entries covering
    * [minH, maxH]. Chunks are disjoint and list files order them by
    * minH, so change routing is a binary search over the list alone.
    */
  private[graft] final case class ChunkRef(file: String, minH: Long,
                                           maxH: Long, n: Long)

  private def hashCol(key: String) = TextFns.hash60(col(key).cast("string"))

  private def manifestDir(dir: String): Path = Paths.get(dir, "manifests")

  private def chunksDir(dir: String): Path =
    manifestDir(dir).resolve("chunks")

  private def newCommitId(): String =
    "c" + java.util.UUID.randomUUID().toString.replace("-", "")

  private val ManifestName = "^v(\\d+)$".r
  private val ExpiredName = "^v(\\d+)\\.expired$".r
  private val ListMarker = "#list"

  /** Latest committed version, 0 if none. Fast path: a best-effort
    * VERSION HINT file (written after every successful publish) plus an
    * upward existence probe — O(commits since the hint) stat calls
    * instead of listing the whole manifests directory, which on a
    * streaming store committing every micro-batch accumulates millions
    * of entries between vacuums. The hint is advisory only: it may lag
    * (crash between publish and hint write — the probe walks forward)
    * and if it points at a vacuumed/absent version the full listing
    * fallback re-derives the truth, so a corrupt or stale hint can cost
    * a listing, never a wrong version.
    */
  def currentVersion(dir: String): Int = {
    val md = manifestDir(dir)
    if (!Files.exists(md)) return 0
    val hint = {
      val h = md.resolve("latest-hint")
      if (!Files.exists(h)) 0
      else scala.util.Try(
        new String(Files.readAllBytes(h), "UTF-8").trim.toInt).getOrElse(0)
    }
    def liveOrExpired(v: Int): Boolean =
      Files.exists(md.resolve(s"v$v")) ||
        Files.exists(md.resolve(s"v$v.expired"))
    var v =
      if (hint > 0 && liveOrExpired(hint)) hint
      else Using.resource(Files.list(md)) { s =>
        s.iterator().asScala.map(_.getFileName.toString)
          .collect { case ManifestName(n) => n.toInt }
          .foldLeft(0)(math.max)
      }
    while (liveOrExpired(v + 1)) v += 1
    v
  }

  /** Best-effort hint refresh after a successful publish (never part of
    * the commit's correctness — see [[currentVersion]]). */
  private def writeHint(dir: String, version: Int): Unit =
    try Files.write(manifestDir(dir).resolve("latest-hint"),
      version.toString.getBytes("UTF-8"))
    catch { case _: java.io.IOException => () }

  /** The manifest file for `version` — live, or expired-but-in-grace. */
  private def manifestFile(dir: String, version: Int): Path = {
    val live = manifestDir(dir).resolve(s"v$version")
    if (Files.exists(live)) live
    else manifestDir(dir).resolve(s"v$version.expired")
  }

  private def parseEntryLines(lines: Iterator[String]): IndexedSeq[FileEntry] =
    lines.filter(_.nonEmpty).map { line =>
      val Array(lo, hi, n, path) = line.split(",", 4)
      FileEntry(lo.toLong, hi.toLong, n.toLong, path)
    }.toIndexedSeq

  /** The chunk refs of a manifest file, or None for a legacy FLAT
    * manifest (pre-chunking stores remain readable; their first commit
    * converts them).
    */
  private def readListRefs(p: Path): Option[IndexedSeq[ChunkRef]] = {
    val lines = Files.readAllLines(p).asScala
    if (lines.isEmpty || !lines.head.startsWith(ListMarker)) None
    else Some(lines.iterator.drop(1).filter(_.nonEmpty).map { line =>
      val Array(f, lo, hi, n) = line.split(",", 4)
      ChunkRef(f, lo.toLong, hi.toLong, n.toLong)
    }.toIndexedSeq.sortBy(_.minH))
  }

  /** Commit wall-time of a manifest, from the list header (`#list
    * <millis>`); legacy headers/flat manifests fall back to the file
    * mtime. Recorded IN the file because vacuum restamps expired files'
    * mtimes (the grace clock) and copies don't preserve them.
    */
  private def commitTimeOf(p: Path): Long = {
    val head = Using.resource(Files.newBufferedReader(p))(_.readLine())
    Option(head).filter(_.startsWith(ListMarker + " "))
      .flatMap(h => h.stripPrefix(ListMarker + " ").toLongOption)
      .getOrElse(Files.getLastModifiedTime(p).toMillis)
  }

  private def readChunk(dir: String, ref: ChunkRef): IndexedSeq[FileEntry] =
    parseEntryLines(Files.readAllLines(chunksDir(dir).resolve(ref.file))
      .asScala.iterator).sortBy(_.minH)

  /** Every entry of `version`'s manifest (list + chunks, or legacy
    * flat). O(files) metadata read — the full-table path (asOf, compact,
    * vacuum's liveness sweep); COMMIT never calls this, it opens only
    * its touched chunks.
    */
  private[graft] def readManifest(dir: String, version: Int): IndexedSeq[FileEntry] =
    readManifestFile(dir, manifestFile(dir, version))

  private def readManifestFile(dir: String, p: Path): IndexedSeq[FileEntry] =
    readListRefs(p) match {
      case Some(refs) => refs.flatMap(readChunk(dir, _)).sortBy(_.minH)
      case None => parseEntryLines(Files.readAllLines(p).asScala.iterator)
        .sortBy(_.minH)
    }

  /** Write one immutable chunk file (temp + atomic move; uuid name, so
    * concurrent committers can never collide) and return its ref.
    */
  private def writeChunk(dir: String,
                         entries: Seq[FileEntry]): ChunkRef = {
    val cd = chunksDir(dir)
    Files.createDirectories(cd)
    val fn = "ch" + java.util.UUID.randomUUID().toString.replace("-", "")
    val tmp = Files.createTempFile(cd, ".tmp-chunk", "")
    try {
      Files.write(tmp, entries.sortBy(_.minH)
        .map(e => s"${e.minH},${e.maxH},${e.rows},${e.path}")
        .mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, cd.resolve(fn), StandardCopyOption.ATOMIC_MOVE)
    } finally Files.deleteIfExists(tmp)
    ChunkRef(fn, entries.map(_.minH).min, entries.map(_.maxH).max,
      entries.size.toLong)
  }

  /** Pack sorted entries into fresh ~chunkTarget-entry chunk files. */
  private def packChunks(dir: String, entries: Seq[FileEntry],
                         chunkTarget: Int): Seq[ChunkRef] =
    entries.sortBy(_.minH).grouped(math.max(1, chunkTarget))
      .map(writeChunk(dir, _)).toSeq

  /** Publish a manifest LIST atomically and EXCLUSIVELY: the content
    * lands via a temp file in the same directory, made visible with a
    * create-exclusive hard link (fallback: existence check + atomic
    * move). A concurrent publish of the same version throws
    * FileAlreadyExistsException — the optimistic-concurrency conflict
    * signal — and a crash mid-write can never leave a truncated file
    * under the versioned name.
    */
  private def publishList(dir: String, version: Int,
                          refs: Seq[ChunkRef]): Unit = {
    val md = manifestDir(dir)
    Files.createDirectories(md)
    val target = md.resolve(s"v$version")
    val tmp = Files.createTempFile(md, ".tmp-manifest", "")
    try {
      Files.write(tmp, (s"$ListMarker ${System.currentTimeMillis()}" +:
        refs.sortBy(_.minH).map(r => s"${r.file},${r.minH},${r.maxH},${r.n}"))
        .mkString("\n").getBytes("UTF-8"))
      try Files.createLink(target, tmp)
      catch {
        case _: UnsupportedOperationException =>
          if (Files.exists(target))
            throw new java.nio.file.FileAlreadyExistsException(target.toString)
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      }
    } finally Files.deleteIfExists(tmp)
    writeHint(dir, version)
  }

  private def metaPath(dir: String): Path = Paths.get(dir, "meta")

  /** (targetRowsPerFile, chunkTarget) from `meta`; legacy single-line
    * metas (and metaless stores) fall back to the defaults.
    */
  private def readMeta(dir: String): (Long, Int) =
    if (Files.exists(metaPath(dir))) {
      val lines = Files.readAllLines(metaPath(dir)).asScala
      (lines.headOption.map(_.toLong).getOrElse(DefaultTargetRowsPerFile),
       lines.lift(1).map(_.toInt).getOrElse(DefaultChunkTarget))
    } else (DefaultTargetRowsPerFile, DefaultChunkTarget)

  /** Equal-width sub-ranges of [lo, hi] sized so ~`estRows` split across
    * them lands under the per-file target. Hash60 is uniform, so
    * equal-width ≈ equal-rows without a quantile pass.
    */
  private def splitRange(lo: Long, hi: Long, estRows: Long,
                         target: Long): Seq[(Long, Long)] = {
    val span = hi - lo + 1
    val want = math.max(1L, (estRows + target - 1) / target)
    val parts = math.min(want, span)
    val w = span / parts + (if (span % parts == 0) 0 else 1)
    (0L until parts).map { i =>
      (lo + i * w, math.min(lo + (i + 1) * w - 1, hi))
    }.filter { case (a, b) => a <= b }
  }

  /** Write `rows` (plus a `kf` file-id column from `assign`) as the data
    * leaves of one commit; returns the published entries. Exact per-file
    * row counts come from a metadata-cheap count over the written leaves
    * (column-pruned to the partition column).
    */
  private def writeLeaves(spark: SparkSession, dir: String, commitId: String,
                          rows: DataFrame, key: String,
                          ranges: Seq[(Long, Long)]): Seq[FileEntry] = {
    require(!rows.columns.contains("kf"),
      "VersionedStore payloads must not contain a column named 'kf'")
    val bounds = ranges.map(_._1).toIndexedSeq
    val dataDir = s"$dir/data/$commitId"
    rows.withColumn("kf",
        graft.functions.RangeFunctions.longBoundaryBucket(hashCol(key), bounds))
      .repartitionByRange(math.max(1, ranges.size), col("kf"), col(key))
      .sortWithinPartitions(col("kf"), col(key))
      .write.mode("overwrite").partitionBy("kf").parquet(dataDir)
    val written = ranges.indices.filter(i =>
      Files.exists(Paths.get(s"$dataDir/kf=$i"))).toSet
    val counts: Map[Int, Long] =
      if (written.isEmpty) Map.empty
      else spark.read.parquet(dataDir).groupBy(col("kf"))
        .count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    ranges.zipWithIndex.map { case ((lo, hi), i) =>
      if (written(i)) FileEntry(lo, hi, counts.getOrElse(i, 0L), s"$commitId/kf=$i")
      else FileEntry(lo, hi, 0L, "")
    }
  }

  /** Version 1: write the whole table as ~n/target hash-range leaves,
    * persist the per-store file-size and chunk-size targets and a schema
    * sentinel (an empty parquet that survives vacuum, so a fully-emptied
    * snapshot stays readable), pack the entries into chunk files and
    * publish manifest list v1.
    */
  def init(spark: SparkSession, dir: String, rows: DataFrame, key: String,
           targetRowsPerFile: Long = DefaultTargetRowsPerFile,
           chunkTarget: Int = DefaultChunkTarget): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(metaPath(dir),
      s"$targetRowsPerFile\n$chunkTarget".getBytes("UTF-8"))
    rows.limit(0).write.mode("overwrite").parquet(s"$dir/schema")
    val n = rows.count()
    val ranges = splitRange(0L, HashSpace - 1, n, targetRowsPerFile)
    val entries = writeLeaves(spark, dir, newCommitId(), rows, key, ranges)
    publishList(dir, 1, packChunks(dir, entries, chunkTarget))
  }

  /** Copy-on-write commit of a U/I/D change set
    * ([[SourceSinkOps.mergeUpsert]] semantics): merge + rewrite ONLY the
    * data files whose hash range contains a changed key, share every
    * other file with the previous snapshot, publish manifest list
    * v(N+1) exclusively (racing committers retry against the winner's
    * version). Routing is TWO-LEVEL, both binary searches codegen'd
    * ([[graft.functions.LongBoundaryBucket]]): change hashes → touched
    * CHUNKS off the list file alone, then → touched ENTRIES off only
    * those chunks' contents — so metadata read/write per commit is
    * O(touched chunks + list), never O(table). Untouched chunk files
    * are shared with the previous version byte-identical.
    */
  def commit(spark: SparkSession, dir: String, changes: DataFrame,
             key: String): Int = {
    val (target, chunkTarget) = readMeta(dir)
    var attempt = 0
    while (true) {
      val v = currentVersion(dir)
      val mf = manifestFile(dir, v)
      // Legacy flat manifest → convert to chunks once (O(files), the
      // cost every commit used to pay); thereafter two-level.
      val refs = readListRefs(mf).getOrElse(
        packChunks(dir, readManifestFile(dir, mf), chunkTarget).toIndexedSeq)
        .sortBy(_.minH).toIndexedSeq
      // Level 1: change hashes → CANDIDATE chunks, off the list alone.
      // SMALL-MANIFEST fast path: when every entry fits one routing job
      // comfortably, skip the chunk-level job and read all chunks — a
      // streaming store committing every micro-batch at fixture scale
      // pays one routing job per commit, not two; the two-level walk
      // engages exactly when it pays (manifests too large to read
      // whole). Candidacy only widens what is READ — which chunk files
      // are REWRITTEN is decided below by which actually hold a touched
      // entry, so chunk sharing is unaffected by the fast path.
      val candChunks: Seq[Int] =
        if (refs.map(_.n).sum <= 4L * chunkTarget) refs.indices
        else {
          val chunkBounds = refs.map(_.minH)
          changes
            .select(graft.functions.RangeFunctions
              .longBoundaryBucket(hashCol(key), chunkBounds).as("cid"))
            .distinct().collect().map(_.getInt(0)).sorted.toSeq
        }
      val nv = v + 1
      val newRefs: Seq[ChunkRef] =
        if (candChunks.isEmpty) refs
        else {
          // Level 2: open ONLY the candidate chunks; route changes to
          // their entries. The concatenation of candidate chunks'
          // entries is sorted and disjoint, and every change hash landed
          // in one of these chunks, so one boundary search over the
          // combined entry list is exact.
          val entries = candChunks.toIndexedSeq
            .flatMap(i => readChunk(dir, refs(i))).sortBy(_.minH)
          val bounds = entries.map(_.minH)
          val touchedCounts: Map[Int, Long] = changes
            .select(graft.functions.RangeFunctions
              .longBoundaryBucket(hashCol(key), bounds).as("eid"))
            .groupBy(col("eid")).count().collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toMap
          if (touchedCounts.isEmpty) refs
          else {
            val touched = touchedCounts.keySet
            // A chunk is REWRITTEN iff it holds a touched entry (chunk
            // ranges are disjoint, so an entry's minH locates its chunk).
            def chunkOf(e: FileEntry): Int =
              candChunks.find(ci =>
                refs(ci).minH <= e.minH && e.minH <= refs(ci).maxH).get
            val rewrite: Set[Int] = touched.map(i => chunkOf(entries(i)))
            val newRanges = touched.toSeq.sorted.flatMap { i =>
              val e = entries(i)
              splitRange(e.minH, e.maxH, e.rows + touchedCounts(i), target)
            }
            val basePaths = touched.toSeq.map(entries(_)).filter(_.path.nonEmpty)
              .map(e => s"$dir/data/${e.path}")
            val base =
              if (basePaths.nonEmpty) spark.read.parquet(basePaths: _*)
              else changes.drop("op").limit(0)
            val merged = SourceSinkOps.mergeUpsert(base, changes, key)
            val written =
              writeLeaves(spark, dir, newCommitId(), merged, key, newRanges)
            // Untouched entries OF rewritten chunks repack alongside the
            // fresh leaves; every other chunk file is shared. Packing is
            // PER CONTIGUOUS RUN of rewritten chunk indices: a single
            // global pack would let a fresh chunk's [minH, maxH] span a
            // KEPT chunk whenever the rewrite set is non-contiguous
            // (normal for hash-routed multi-key commits), violating the
            // disjoint-sorted-chunk invariant that level-1 routing and
            // [[chunkOf]] assume — the NEXT commit would then misroute
            // change hashes and rewrite the wrong leaf while the stale
            // row survived elsewhere. Every kept-or-written entry lies
            // inside some rewritten chunk's range, so runs (whose spans
            // by construction contain no kept chunk) partition them
            // exactly, and each run packs within its own span.
            val keep = entries.indices
              .filter(i => !touched(i) && rewrite(chunkOf(entries(i))))
              .map(entries(_))
            val runs: Seq[Vector[Int]] = {
              val buf = scala.collection.mutable.ArrayBuffer.empty[Vector[Int]]
              var cur = Vector.empty[Int]
              rewrite.toSeq.sorted.foreach { ci =>
                if (cur.nonEmpty && ci == cur.last + 1) cur :+= ci
                else { if (cur.nonEmpty) buf += cur; cur = Vector(ci) }
              }
              if (cur.nonEmpty) buf += cur
              buf.toSeq
            }
            val runSpans = runs.map(r => (refs(r.head).minH, refs(r.last).maxH))
            def runOf(e: FileEntry): Int = runSpans.indexWhere {
              case (lo, hi) => lo <= e.minH && e.minH <= hi
            }
            val grouped = (keep ++ written).groupBy(runOf)
            require(!grouped.contains(-1),
              s"VersionedStore.commit: entry outside every rewritten run at $dir")
            refs.indices.filterNot(rewrite).map(refs(_)) ++
              runs.indices.flatMap(r => packChunks(dir,
                grouped.getOrElse(r, Nil).sortBy(_.minH), chunkTarget))
          }
        }
      try {
        publishList(dir, nv, newRefs)
        return nv
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // Lost the race: a concurrent commit published nv first. The
          // orphan data directory and chunk files are reclaimed by
          // vacuum; re-merge against the winner's snapshot.
          attempt += 1
          if (attempt >= MaxPublishRetries)
            throw new IllegalStateException(
              s"VersionedStore.commit: lost the publish race $attempt times at $dir")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Maintenance bin-packing — the OPTIMIZE pass of a lakehouse table:
    * publish a new version with IDENTICAL rows whose layout re-packs
    * runs of adjacent undersized leaves into single files near the
    * per-store target. File-granularity commits fragment under deletes
    * and narrow updates (a rewritten leaf keeps its original hash range
    * however few rows survive in it), and nothing re-merges those leaves
    * on the commit path — this pass does. Greedy run-coalescing over the
    * hash-ordered manifest: consecutive entries whose combined rows fit
    * the target become ONE leaf spanning their union range; any entry
    * that doesn't pack with a neighbor is SHARED with the previous
    * snapshot untouched, so compaction DATA cost is O(small files),
    * never O(table). Metadata is fully re-chunked (OPTIMIZE is the
    * maintenance pass that owns the whole layout — the same trade the
    * lakehouse formats make on rewrite). Publishes optimistically like
    * [[commit]] (a racing commit wins; compaction re-derives and
    * retries); pre-compact versions stay time-travel-readable until
    * [[vacuum]]. Returns the new version, or 0 if no run needed packing
    * (idempotent: compact-after-compact is a no-op).
    */
  def compact(spark: SparkSession, dir: String, key: String): Int = {
    val (target, chunkTarget) = readMeta(dir)
    var attempt = 0
    while (true) {
      val v = currentVersion(dir)
      if (v == 0) return 0
      val entries = readManifest(dir, v)
      val bins = scala.collection.mutable.ArrayBuffer.empty[Vector[FileEntry]]
      var run = Vector.empty[FileEntry]
      var runRows = 0L
      entries.foreach { e =>
        if (run.nonEmpty && runRows + e.rows <= target) {
          run :+= e; runRows += e.rows
        } else {
          if (run.nonEmpty) bins += run
          run = Vector(e); runRows = e.rows
        }
      }
      if (run.nonEmpty) bins += run
      val rewrite = bins.filter(_.size >= 2).toSeq
      if (rewrite.isEmpty) return 0
      val kept = bins.filter(_.size < 2).map(_.head).toSeq
      val ranges = rewrite.map(b => (b.head.minH, b.last.maxH))
      val paths = rewrite.flatten.filter(_.path.nonEmpty)
        .map(e => s"$dir/data/${e.path}")
      val nv = v + 1
      val newEntries: Seq[FileEntry] =
        if (paths.isEmpty)
          kept ++ ranges.map { case (lo, hi) => FileEntry(lo, hi, 0L, "") }
        else kept ++ writeLeaves(spark, dir, newCommitId(),
          spark.read.parquet(paths: _*), key, ranges)
      try {
        publishList(dir, nv,
          packChunks(dir, newEntries.sortBy(_.minH), chunkTarget))
        return nv
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          attempt += 1
          if (attempt >= MaxPublishRetries)
            throw new IllegalStateException(
              s"VersionedStore.compact: lost the publish race $attempt times at $dir")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Two-phase retention vacuum with a read grace. Phase 1 EXPIRES every
    * manifest older than the last `keepLast` (rename to `v<N>.expired`,
    * stamped with the expiry instant). Phase 2 deletes (a) the data
    * leaves referenced only by expired manifests whose grace has passed,
    * along with those manifests, (b) orphan leaves (crashed or
    * race-losing commits) older than the grace horizon AND the publish
    * horizon (below), and (c) chunk files no surviving manifest list
    * references (same double guard). Returns the number of data
    * directories removed.
    *
    * A reader pinned to an expiring snapshot keeps working for `graceMs`
    * past expiry — its resolved paths stay on disk and `asOf` still
    * resolves the expired manifest. `graceMs = 0` reclaims immediately
    * (the documented storage-for-history trade). Pure driver-side file
    * management; the data plane of every retained version is untouched.
    *
    * Concurrency contract: an IN-FLIGHT commit is protected by a
    * publish-horizon guard independent of `graceMs` — no unreferenced
    * data leaf or chunk file whose mtime is NEWER than the latest
    * published list is ever reclaimed. A committer writes its leaves
    * and chunks strictly after reading the version it merges against
    * (hence after that version's publish), so the only files a commit
    * could still publish into a list are exactly the ones the guard
    * keeps; files older than the latest publish are either referenced
    * (tracked by the live sets) or abandoned by a retry/crash and safe
    * to reclaim. The corollary: a CRASHED commit's orphans stay on disk
    * until the next successful publish moves the horizon past them (or
    * `graceMs` is used the classic way — a grace above the commit
    * duration, the retention rule the lakehouse formats document).
    * `graceMs = 0` is therefore safe with live writers for CORRECTNESS;
    * a non-zero grace remains the tool for pinned READERS of expiring
    * snapshots.
    */
  def vacuum(dir: String, keepLast: Int = 1, graceMs: Long = 0L): Int = {
    val md = manifestDir(dir)
    if (!Files.exists(md)) return 0
    val cur = currentVersion(dir)
    val keepFrom = math.max(1, cur - keepLast + 1)
    val now = System.currentTimeMillis()
    // Publish horizon: files newer than the latest published list may
    // belong to an in-flight commit (leaves/chunks land BEFORE the list)
    // — never reclaim them, whatever the grace (scaladoc contract).
    val publishHorizon: Long =
      if (cur == 0) Long.MinValue
      else Files.getLastModifiedTime(manifestFile(dir, cur)).toMillis
    // Phase 1: expire out-of-window manifests.
    (1 until keepFrom).foreach { v =>
      val m = md.resolve(s"v$v")
      if (Files.exists(m)) {
        val ex = md.resolve(s"v$v.expired")
        Files.move(m, ex, StandardCopyOption.ATOMIC_MOVE)
        Files.setLastModifiedTime(ex,
          java.nio.file.attribute.FileTime.fromMillis(now))
      }
    }
    // Partition manifests into surviving vs grace-elapsed expired.
    val all = Using.resource(Files.list(md))(_.iterator().asScala.toSeq)
      .filterNot(_.getFileName.toString == "chunks")
    val (deletable, surviving) = all.partition { p =>
      p.getFileName.toString match {
        case ExpiredName(_) =>
          Files.getLastModifiedTime(p).toMillis + graceMs <= now
        case _ => false
      }
    }
    val survivingManifests = surviving.filter { p =>
      p.getFileName.toString match {
        case ManifestName(_) | ExpiredName(_) => true
        case _ => false
      }
    }
    val live = survivingManifests
      .flatMap(p => readManifestFile(dir, p).map(_.path).filter(_.nonEmpty))
      .toSet
    val liveChunks = survivingManifests
      .flatMap(p => readListRefs(p).toSeq.flatten.map(_.file)).toSet
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p))
        Using.resource(Files.list(p))(_.iterator().asScala.toSeq).foreach(rm)
      Files.delete(p)
    }
    var removed = 0
    val dataRoot = Paths.get(dir, "data")
    if (Files.exists(dataRoot)) {
      Using.resource(Files.list(dataRoot))(_.iterator().asScala.toSeq)
        .foreach { cdir =>
          Using.resource(Files.list(cdir))(_.iterator().asScala.toSeq)
            .filter(_.getFileName.toString.startsWith("kf="))
            .foreach { leaf =>
              val rel = s"${cdir.getFileName}/${leaf.getFileName}"
              val mt = Files.getLastModifiedTime(leaf).toMillis
              // STRICT inequality vs the publish horizon: on coarse-mtime
              // filesystems an in-flight commit's files can land in the
              // SAME tick as the latest publish — reclaiming them would
              // let that commit publish a list referencing deleted files.
              // Abandoned same-tick files just survive until next vacuum.
              val old = mt + graceMs <= now && mt < publishHorizon
              if (!live(rel) && old) { rm(leaf); removed += 1 }
            }
          if (!Using.resource(Files.list(cdir))(_.iterator().asScala.exists(
                _.getFileName.toString.startsWith("kf="))))
            rm(cdir)
        }
    }
    deletable.foreach(Files.deleteIfExists(_))
    // Chunk GC: a chunk referenced by NO surviving list is garbage once
    // past the grace horizon AND older than the latest publish (the
    // publish-horizon guard protects an in-flight commit that has
    // written chunks but not yet linked its list).
    val cd = chunksDir(dir)
    if (Files.exists(cd))
      Using.resource(Files.list(cd))(_.iterator().asScala.toSeq)
        .foreach { ch =>
          val fn = ch.getFileName.toString
          val mt = Files.getLastModifiedTime(ch).toMillis
          val old = mt + graceMs <= now && mt < publishHorizon // strict: see leaf GC
          if (fn.startsWith("ch") && !liveChunks(fn) && old)
            Files.deleteIfExists(ch)
        }
    removed
  }

  /** The latest version committed at or before `tsMillis` — the
    * TIMESTAMP AS OF resolution of the lakehouse formats. Resolves among
    * LIVE manifests plus expired-in-grace ones (their commit time rides
    * the list header, which expiry doesn't touch); versions already
    * vacuumed are gone by design — retention bounds how far back a
    * timestamp can reach. Throws if `tsMillis` predates the oldest
    * retained version.
    */
  def versionAt(dir: String, tsMillis: Long): Int = {
    val md = manifestDir(dir)
    val candidates = Using.resource(Files.list(md))(_.iterator().asScala.toSeq)
      .flatMap { p =>
        p.getFileName.toString match {
          case ManifestName(v) => Some(v.toInt -> commitTimeOf(p))
          case ExpiredName(v) => Some(v.toInt -> commitTimeOf(p))
          case _ => None
        }
      }
    val at = candidates.filter(_._2 <= tsMillis)
    if (at.isEmpty)
      throw new IllegalArgumentException(
        s"no retained version at or before $tsMillis in $dir " +
          s"(oldest: ${candidates.map(_._2).minOption.getOrElse(-1L)})")
    at.map(_._1).max
  }

  /** RESTORE — the lakehouse rollback verb (Delta `RESTORE TABLE ...
    * VERSION AS OF`): publish a NEW version whose manifest is
    * `toVersion`'s chunk list verbatim. Zero data rewrite and O(list)
    * metadata work at any table size — the restored snapshot's leaves
    * and chunk files are SHARED, which is precisely what file-
    * granularity copy-on-write buys (an engine that restored by
    * re-writing rows would pay O(table)). Rollback-as-commit, not
    * history rewrite: every pre-restore version (including the one
    * being rolled back) stays time-travel-readable until [[vacuum]],
    * the restore shows up in CDC diffs like any commit, and [[vacuum]]
    * keeps the shared files live because liveness is derived from
    * surviving manifests, not version order. Publishes optimistically
    * like [[commit]] (a racing committer wins version N+1; restore
    * re-reads and retries — the restored CONTENT is version-pinned, so
    * retries republish the same list). Legacy flat manifests are
    * chunk-converted on the way through, exactly as [[commit]] does.
    */
  def restore(dir: String, toVersion: Int): Int = {
    val (_, chunkTarget) = readMeta(dir)
    var attempt = 0
    while (attempt < MaxPublishRetries) {
      val cur = currentVersion(dir)
      require(toVersion >= 1 && toVersion <= cur,
        s"VersionedStore.restore: version $toVersion not in [1, $cur] at $dir")
      val mf = manifestFile(dir, toVersion)
      if (!Files.exists(mf))
        throw new IllegalArgumentException(
          s"VersionedStore.restore: version $toVersion already vacuumed at $dir")
      val refs = readListRefs(mf).getOrElse(
        packChunks(dir, readManifestFile(dir, mf), chunkTarget).toIndexedSeq)
      try {
        publishList(dir, cur + 1, refs)
        return cur + 1
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"VersionedStore.restore: lost the publish race $attempt times at $dir")
  }

  /** Test hook: `version`'s chunk refs as sorted (minH, maxH, entries)
    * — None for a legacy flat manifest. Pins the disjoint-sorted-chunk
    * invariant that [[commit]]'s two-level routing assumes.
    */
  private[graft] def chunkRangesOf(dir: String,
                                   version: Int): Option[Seq[(Long, Long, Long)]] =
    readListRefs(manifestFile(dir, version)).map(_.map(r => (r.minH, r.maxH, r.n)))

  /** Snapshot read as of a WALL-CLOCK instant: [[versionAt]] then
    * [[asOf]]. */
  def asOfTimestamp(spark: SparkSession, dir: String,
                    tsMillis: Long): DataFrame =
    asOf(spark, dir, versionAt(dir, tsMillis))

  /** Snapshot read: the table exactly as of `version` (resolvable during
    * the vacuum grace window even after expiry). A fully-emptied snapshot
    * reads as zero rows with the store schema — served by the vacuum-proof
    * schema sentinel, never by reaching back into vacuumable data.
    */
  def asOf(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val paths = readManifest(dir, version).map(_.path).filter(_.nonEmpty)
    if (paths.nonEmpty)
      spark.read.parquet(paths.map(p => s"$dir/data/$p"): _*)
    else
      spark.read.parquet(s"$dir/schema")
  }

  /** Driver-side twin of [[hashCol]] (`hash60(cast(key as string))`), so
    * point-GET routing and the leaf assignment can never drift. The
    * caller's values must render like the SQL cast — integral and string
    * keys do (the store's practical key domains). Floating-point /
    * decimal values are REJECTED at runtime, not truncated: SQL renders
    * a double `3.0` as `"3.0"` while `Number.longValue` would render
    * `"3"`, so a truncated hash routes the probe to the wrong leaf and
    * the GET silently returns empty rows (the round-9 ADVICE finding).
    */
  private def driverHash(v: Any): Long = {
    val s = v match {
      case _: java.lang.Double | _: java.lang.Float | _: java.math.BigDecimal |
           _: scala.math.BigDecimal =>
        throw new IllegalArgumentException(
          s"getAsOf: fractional numeric key $v (${v.getClass.getSimpleName}) " +
            "cannot be routed by the driver-side key hash — its SQL string " +
            "rendering differs from the integral form, so the probe would " +
            "silently read the wrong leaf. Read via " +
            "asOf(dir, version).filter(col(key) === ...) instead.")
      case n: java.lang.Number => n.longValue().toString
      case other => other.toString
    }
    java.lang.Long.parseLong(TextFns.md5Hex(s).substring(0, 15), 16)
  }

  /** Point-GET at a version with FILE SKIPPING — the data-skipping read
    * the lakehouse formats derive from their manifest statistics, here
    * exact by construction: manifest entries are disjoint and cover the
    * 60-bit key-hash space, so each probed key maps to EXACTLY ONE leaf
    * (binary search over the cached manifest, driver-side control flow).
    * The scan reads O(keys) data files — at 10⁶ leaves a 3-key GET opens
    * 3 files — and the key IN-list pushes into the key-sorted leaves for
    * row-group skipping below that. Absent keys cost at most their one
    * covering leaf; keys hashing into a never-written range cost zero.
    * This is the serving-layer read [[KeyedStore.get]] provides for the
    * mutable store, at any retained VERSION of this one — [[asOf]]
    * composes with arbitrary predicates but always lists every leaf.
    */
  def getAsOf(spark: SparkSession, dir: String, version: Int, key: String,
              keys: Seq[Any]): DataFrame = {
    val entries = readManifest(dir, version) // sorted by minH, total cover
    val bounds = entries.map(_.minH)
    val paths = keys.iterator
      .map(k => entries(graft.functions.RangeFunctions
        .indexOf(bounds, driverHash(k))(Ordering.Long)).path)
      .filter(_.nonEmpty)
      .toSeq.distinct
    val base =
      if (paths.nonEmpty)
        spark.read.parquet(paths.map(p => s"$dir/data/$p"): _*)
      else spark.read.parquet(s"$dir/schema")
    base.filter(col(key).isin(keys: _*))
  }
}
