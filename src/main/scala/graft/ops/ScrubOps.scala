package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus scrubbing — the privacy / provenance stages of a training-data
  * pipeline: PII redaction, URL/domain blocklist filtering, and
  * sub-document (paragraph-level) exact dedup.
  *
  * All three are shuffle-light by construction: redaction is a pure
  * projection (regex engines run inside whole-stage codegen); the domain
  * filter is a broadcast anti-join against a tiny blocklist; paragraph
  * dedup shuffles only (digest, doc_id, pid) triples — never text.
  *
  * The fixture `documents.text` contains no PII, so the PII queries build
  * a deterministic `raw` column (text + synthetic contact strings derived
  * from `doc_id`) identically on both engines; the operator under test is
  * the extraction/redaction logic, not the synthesis. Regex patterns stay
  * in the Java-regex ∩ RE2 dialect intersection (character classes,
  * bounded repetition — no shorthand escapes, no backrefs) so Spark and
  * DuckDB match byte-for-byte.
  */
object ScrubOps {
  import graft.Tables._

  private val EmailPat = "[a-z0-9._]+@[a-z0-9.]+"
  private val PhonePat = "\\+1-[0-9]{3}-[0-9]{4}"

  /** The synthetic raw column: every doc gets one email + one phone;
    * even doc_ids get a second email, so counts vary across rows.
    */
  private def rawWithPii =
    concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      when(pmod(col("doc_id"), lit(2)) === 0,
           concat(lit(" alt z"), col("doc_id").cast("string"), lit("@alt.net")))
        .otherwise(lit("")))

  /** Library form: add `n_emails` / `n_phones` / `redacted` columns for an
    * arbitrary text column. Pure projection — embarrassingly parallel.
    */
  def redactPii(df: DataFrame, text: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("n_emails", regexp_count(text, lit(EmailPat)))
      .withColumn("n_phones", regexp_count(text, lit(PhonePat)))
      .withColumn("redacted", regexp_replace(
        regexp_replace(text, EmailPat, "<EMAIL>"), PhonePat, "<PHONE>"))

  /** PII redaction: count email/phone occurrences, then rewrite them to
    * `<EMAIL>` / `<PHONE>` placeholders; emit the digest + length of the
    * redacted text so the oracle pins the exact rewritten bytes, not just
    * the counts. Single projection — embarrassingly parallel at 100 TB.
    */
  def qPiiRedact(spark: SparkSession, dir: String): DataFrame =
    redactPii(documents(spark, dir), rawWithPii)
      .select(
        col("doc_id"), col("n_emails"), col("n_phones"),
        length(col("redacted")).as("redacted_len"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy(col("doc_id"))

  /** Domain blocklist filter: derive each document's source URL, extract
    * the domain, drop blocklisted domains via a broadcast anti-join (the
    * blocklist is tiny at any corpus size — the corpus side never
    * shuffles for the filter), then per-domain survivor stats.
    */
  def qUrlFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blocklist = Seq("src0.example.org", "src7.example.org", "src13.example.org")
      .toDF("bad_domain")
    documents(spark, dir)
      .withColumn("url",
        concat(lit("https://"), col("source"), lit(".example.org/d/"),
               col("doc_id").cast("string")))
      .withColumn("domain", regexp_extract(col("url"), "https://([a-z0-9.]+)/", 1))
      .join(broadcast(blocklist), col("domain") === col("bad_domain"), "left_anti")
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("domain"))
  }

  /** Non-overlapping `window`-token paragraphs of each document (the
    * sub-document unit for paragraph-level dedup). ceil(n/window) slices;
    * the last may be short. Shares [[TextFns.toks]] with the text layer.
    */
  def paragraphs(docs: DataFrame, window: Int = 10): DataFrame =
    docs
      .withColumn("toks", TextFns.toks)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / $window.0) as int) - 1), " +
          s"i -> concat_ws(' ', slice(toks, i * $window + 1, $window)))"))
        .as(Seq("pid", "para")))

  /** Paragraph-level exact dedup: a paragraph is a duplicate if the same
    * token sequence appeared earlier in the corpus (first occurrence by
    * (doc_id, pid) wins — the deterministic keep-first policy). The
    * ranking window partitions on the paragraph digest — high cardinality,
    * so no partition is ever larger than one paragraph's occurrence count
    * — and only (digest, doc_id, pid) triples shuffle, never text.
    * Output: per-document paragraph counts + duplicate mass.
    */
  def paragraphDedup(docs: DataFrame, window: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("para_md5")).orderBy(col("doc_id"), col("pid"))
    paragraphs(docs, window)
      .select(col("doc_id"), col("pid"), md5(col("para")).as("para_md5"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
           sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_paras"))
      .select(col("doc_id"), col("n_paras"), col("n_dup_paras"),
              round((col("n_paras") - col("n_dup_paras")).cast("double")
                      / col("n_paras"), 6).as("kept_ratio"))
      .orderBy(col("doc_id"))
  }

  def qParagraphDedup(spark: SparkSession, dir: String): DataFrame =
    paragraphDedup(documents(spark, dir))

  /** Cross-store GDPR forget: erase one id set EVERYWHERE it lives in a
    * serving stack — the KeyedStore row store (anti-join merge; only the
    * regions covering doomed keys rewrite), the VersionedStore (a DELETE
    * commit: CDC-visible, auditable), and the ANN index
    * ([[AnnIndexOps.deleteBatch]]: the doomed posting keys recomputed
    * against the frozen codebook). Idempotent by construction on every
    * leg — re-forgetting absent ids anti-joins/changes/deletes nothing.
    *
    * ERASURE BOUNDARY: the versioned leg is a soft delete until vacuum.
    * Time travel to a pre-forget version still reads the forgotten rows
    * (by design — rollback safety and audit), so GDPR-complete erasure
    * is forget + [[VersionedStore.vacuum]] once the retention window
    * allows dropping pre-forget versions. ScrubForgetSpec pins both
    * sides of that boundary.
    */
  def forgetCascade(spark: SparkSession,
                    keyedName: String, keyedKey: String,
                    vstoreDir: String, vstoreKey: String,
                    annName: String,
                    doomedIds: DataFrame,
                    doomedEmbs: DataFrame,
                    suffix: Option[(String, DataFrame)] = None): Unit = {
    // The legs mutate FOUR INDEPENDENT stores and are individually
    // idempotent, so they run CONCURRENTLY (guide-§2.6 overlap of
    // independent jobs; round-17 optimization): total leg latency is
    // the slowest leg, not the sum. Crash/replay audit unchanged from
    // the sequential order — a crash leaves an arbitrary SUBSET of
    // legs committed, and the replay re-runs every leg, no-op on the
    // committed ones (anti-join of absent ids / empty change set /
    // absent posting keys / post-delete fingerprint), exactly as a
    // crash between sequential legs always could. Store-level safety:
    // each leg takes its own store's locks; no two legs share a store.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val legs: Seq[(String, () => Unit)] = Seq(
        // Keyed leg. The returned full-table read is discarded (the
        // store's read-isolation contract); reads go through scan/get.
        "keyed" -> (() => {
          KeyedStore.mergeInto(spark, keyedName, keyedKey, doomedIds,
            (base, b) => base.join(b, Seq(keyedKey), "left_anti"))
          ()
        }),
        // Versioned leg: delete rows carry the head payload (commit's
        // change schema); absent ids join to nothing, so a replay
        // commits an empty change set — a content no-op version.
        "vstore" -> (() => {
          val head = VersionedStore.asOf(spark, vstoreDir,
            VersionedStore.currentVersion(vstoreDir))
          VersionedStore.commit(spark, vstoreDir,
            head.join(doomedIds, Seq(vstoreKey)).withColumn("op", lit("D")),
            vstoreKey)
        }),
        // ANN leg.
        "ann" -> (() => AnnIndexOps.deleteBatch(spark, annName, doomedEmbs)),
        // Suffix-index leg (round-15 verdict item #4): the doomed docs'
        // (sp, doc_id, p) rows leave the durable suffix index and its
        // sub-stores, seam links/LCPs patched
        // ([[DedupOps.suffixIndexDelete]]). `suffix` pairs the store
        // name with the corpus the index currently holds — ONE
        // parameter, so a name without its corpus is unrepresentable
        // (round-16 ADVICE: the old two-Option shape NPE'd mid-cascade
        // on Some(name)/None). Replay-idempotent like every other leg
        // (the post-delete fingerprint makes a re-delete a content
        // no-op).
        "suffix" -> (() => suffix.foreach { case (sfxName, sfxDocs) =>
          DedupOps.suffixIndexDelete(sfxDocs, doomedIds, sfxName)
        }))
      val dbg = sys.env.contains("GRAFT_SCRUB_DEBUG")
      legs.map { case (nm, body) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            val t0 = System.nanoTime()
            body()
            if (dbg) println(f"SCRUBDBG leg=$nm " +
              f"${(System.nanoTime() - t0) / 1e9}%.1f s")
          }
        })
      }.foldLeft(Option.empty[Throwable]) { (first, f) =>
        // Await EVERY leg before propagating (round-17 ADVICE #1): a
        // sequential .get() chain unwinds on the first failure while
        // later legs are still mutating the stores the caller's cleanup
        // (drops, vdir delete) is about to touch. Keep the FIRST
        // failure as the cause; later ones are usually its shadows.
        try { f.get(); first }
        catch { case t: Throwable => first.orElse(Some(t)) }
      }.foreach(throw _)
    } finally pool.shutdown()
    ()
  }

  /** The three forget legs as RENDERED physical plans over freshly
    * built (tiny) stores — what each leg computes before its store
    * action, for PLANS.md's multi-action section and PlanShapeSpec.
    * The keyed leg's relation here scans the whole table for
    * illustration; the real [[KeyedStore.mergeInto]] applies the same
    * anti-join to the TOUCHED regions only. Each leg is collect()ed
    * (so the rendered plan is the final AQE plan) BEFORE the finally
    * block drops both catalog stores and deletes the temp vstore dir —
    * earlier revisions returned lazy DataFrames and leaked a store
    * pair + temp dir per caller (round-13 ADVICE). */
  private[graft] def forgetPhasePlans(spark: SparkSession,
                                      dir: String): Seq[(String, String)] = {
    val sfx = "plans_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
    val keyedName = "graft_forget_docs_" + sfx
    val annName = "graft_forget_ann_" + sfx
    val docsRows = documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val embs = embeddings(spark, dir)
    val vdir = java.nio.file.Files.createTempDirectory("graft_forget_plans").toString
    try {
      KeyedStore.create(spark, keyedName, docsRows, "doc_id", 128)
      VersionedStore.init(spark, vdir, docsRows, "doc_id")
      AnnIndexOps.buildIndex(spark, annName, embs)
      val doomedIds = docsRows.filter(col("doc_id") % 10 === 3).select(col("doc_id"))
      val doomedEmbs = embs.filter(col("vec_id") % 10 === 3)
      Seq(
        "keyed leg: anti-join merge relation (mergeInto applies it to touched regions only)" ->
          KeyedStore.scan(spark, keyedName, "doc_id", 0L, Long.MaxValue)
            .join(doomedIds, Seq("doc_id"), "left_anti"),
        "versioned leg: DELETE change set (head rows of the doomed ids; CDC-visible commit)" ->
          VersionedStore.asOf(spark, vdir, VersionedStore.currentVersion(vdir))
            .join(doomedIds, Seq("doc_id")).withColumn("op", lit("D")),
        "ann leg: doomed posting keys (pure function of the frozen stored assignment)" ->
          AnnIndexOps.doomedPostingKeys(spark, annName, doomedEmbs)
      ).map { case (title, df) =>
        df.collect()
        title -> df.queryExecution.executedPlan.toString
      }
    } finally {
      if (KeyedStore.exists(spark, keyedName)) KeyedStore.drop(spark, keyedName)
      if (KeyedStore.exists(spark, annName)) KeyedStore.drop(spark, annName)
      graft.streaming.EventStream.deleteRecursively(
        java.nio.file.Paths.get(vdir))
    }
  }

  private def readFpFile(p: java.nio.file.Path): Option[String] =
    if (!java.nio.file.Files.exists(p)) None
    else Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))

  /** Recursive file copy (skips `_graft_cache_fp`) — shared by the
    * path-based (VersionedStore) fixture caches here and in
    * [[SourceSinkOps.twoSnapshotStore]]. */
  private[ops] def copyDir(from: java.nio.file.Path,
                           to: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.isDirectory(from)) {
      Files.createDirectories(to)
      scala.util.Using.resource(Files.list(from)) { s =>
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach(c =>
          copyDir(c, to.resolve(c.getFileName.toString)))
      }
    } else if (from.getFileName.toString != "_graft_cache_fp") {
      Files.copy(from, to,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }

  /** Driver row: stand up the five stores over documents/embeddings
    * (keyed rows, versioned rows, ANN postings, the durable suffix
    * index over a 1/21 sub-corpus), forget `id % 10 == 3`, and report
    * exact row counts per (leg, phase) — including the pre-forget
    * version read AFTER the forget, pinning that time travel still
    * serves it (the vacuum-is-erasure contract). All counts are
    * closed-form over the base tables, so the oracle recomputes them
    * without any store. REPLAY idempotence is pinned in
    * ScrubForgetSpec (a second full cascade there changes no leg).
    *
    * FIXTURE-TAX discipline (round-13 item #7; round-16 `suspect`
    * adjudication): the row must price the CASCADE — five real store
    * mutations — not the repeated construction of its victims. Every
    * store is therefore built ONCE into a content-addressed cache
    * (freshness = a fingerprint of its input relation, stored beside
    * the artifact; the suffix cache uses its own meta fingerprint)
    * and CLONED to the row's scratch name per run by file copy
    * ([[KeyedStore.cloneStore]] / dir copy): the cascade then runs
    * real deletes against real stores at snapshot-restore cost. */
  def qForgetCascade(spark: SparkSession, dir: String): DataFrame = {
    val dbg = sys.env.contains("GRAFT_SCRUB_DEBUG")
    var tDbg = System.nanoTime()
    def lap(phase: String): Unit = if (dbg) {
      println(f"SCRUBDBG phase=$phase " +
        f"${(System.nanoTime() - tDbg) / 1e9}%.1f s")
      tDbg = System.nanoTime()
    }
    val sfx = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val keyedName = "graft_forget_docs_" + sfx
    val annName = "graft_forget_ann_" + sfx
    val docsRows = documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val embs = embeddings(spark, dir)
    val vdir = java.nio.file.Files.createTempDirectory("graft_forget").toString
    try {
      val fpDocs = KeyedStore.contentFingerprint(docsRows)
      val fpEmbs = KeyedStore.contentFingerprint(embs)
      lap("fingerprints")
      // 1024 rows/region: the cascade's doomed set (every 10th id)
      // covers EVERY region whatever their size, so finer regions only
      // multiply per-region commit machinery — at real scale the id set
      // is sparse and fine regions pay off; here they were pure fixture
      // tax (region-count sweep in ROUND13_NOTES).
      KeyedStore.ensureCached(spark, "graft_forget_keyedcache_" + sfx,
        fpDocs)(
        KeyedStore.create(spark, "graft_forget_keyedcache_" + sfx,
          docsRows, "doc_id", 1024))
      KeyedStore.cloneStore(spark, "graft_forget_keyedcache_" + sfx,
        keyedName)
      lap("keyed-cache-clone")
      KeyedStore.ensureCached(spark, "graft_forget_anncache_" + sfx,
        fpEmbs)(
        AnnIndexOps.buildIndex(spark, "graft_forget_anncache_" + sfx,
          embs, targetRowsPerRegion = 2048))
      KeyedStore.cloneStore(spark, "graft_forget_anncache_" + sfx, annName)
      lap("ann-cache-clone")
      // Versioned leg: path-based store — cache dir + recursive copy.
      val vcache = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"), "graft_forget_vcache_" + sfx)
      val vfp = vcache.resolve("_graft_cache_fp")
      if (!readFpFile(vfp).contains(fpDocs.toString)) {
        graft.streaming.EventStream.deleteRecursively(vcache)
        java.nio.file.Files.createDirectories(vcache)
        VersionedStore.init(spark, vcache.toString, docsRows, "doc_id")
        KeyedStore.atomicWriteBytes(vfp, fpDocs.toString.getBytes("UTF-8"))
      }
      copyDir(vcache, java.nio.file.Paths.get(vdir))
      lap("vstore-cache-copy")
      // Suffix leg over a 1/21 sub-corpus; the doomed ids hit it at
      // doc_id ≡ 63 (mod 210) — a real, oracle-countable bite at every
      // fixture SF (3 docs at sf0.01, 24 at sf0.1). A delete row's
      // store is STALE by construction after its own delete
      // (fp(remaining) ≠ fp(sub-corpus)), so a warm store would skip
      // the delete the row exists to exercise; the cache/clone split
      // keeps the delete real without re-paying the SA build.
      val sfxName = "graft_forget_sfx_" + sfx
      val sfxCache = "graft_forget_sfxcache_" + sfx
      val sfxDocs = documents(spark, dir).filter(col("doc_id") % 21 === 0)
        .select(col("doc_id"), col("text"))
      if (!DedupOps.suffixStoreFresh(sfxDocs, sfxCache))
        DedupOps.suffixIndexBuild(sfxDocs, sfxCache).collect()
      DedupOps.suffixIndexClone(spark, sfxCache, sfxName)
      lap("suffix-cache-clone")
      val doomedIds = docsRows.filter(col("doc_id") % 10 === 3)
        .select(col("doc_id"))
      val doomedEmbs = embs.filter(col("vec_id") % 10 === 3)
      // Each phase boundary is ONE action: the per-store count
      // aggregates union into a single tiny relation and eager-
      // localCheckpoint materializes them at that instant (9 separate
      // count() jobs made this a fixture-cost outlier).
      def cnt(leg: String, phase: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_rows"))
          .select(lit(leg).as("leg"), lit(phase).as("phase"), col("n_rows"))
      def keyed() = KeyedStore.scan(spark, keyedName, "doc_id",
        0L, Long.MaxValue)
      def postings() = KeyedStore.scan(spark, annName, "row_key", "c", "cz")
      def head() = VersionedStore.asOf(spark, vdir,
        VersionedStore.currentVersion(vdir))
      def sfxRows() = KeyedStore.scan(spark, sfxName, "sp",
        0L, Long.MaxValue)
      def phase(rows: DataFrame*): DataFrame =
        rows.reduce(_.unionByName(_)).localCheckpoint()
      val before = phase(
        cnt("keyed", "before", keyed()),
        cnt("ann", "postings_before", postings()),
        cnt("suffix", "before", sfxRows()))
      lap("phase-before")
      forgetCascade(spark, keyedName, "doc_id", vdir, "doc_id", annName,
        doomedIds, doomedEmbs, Some((sfxName, sfxDocs)))
      lap("cascade-legs")
      val after = phase(
        cnt("keyed", "after", keyed()),
        cnt("ann", "postings_after", postings()),
        cnt("vstore", "head_after", head()),
        cnt("vstore", "pre_forget_version",
          VersionedStore.asOf(spark, vdir, 1)),
        cnt("suffix", "after", sfxRows()))
      before.unionByName(after)
        .orderBy(col("leg"), col("phase"))
    } finally graft.streaming.EventStream.deleteRecursively(
      java.nio.file.Paths.get(vdir))
  }
}
