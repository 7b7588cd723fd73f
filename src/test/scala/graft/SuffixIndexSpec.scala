package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The durable suffix index (DedupOps.suffixIndexBuild/Serve): the
  * stored (sp, doc_id, p, lcp) artifact must reproduce
  * suffixDedupStats exactly when served, resolve frozen-vs-stale via
  * the corpus fingerprint, and carry an order-faithful SA permutation.
  */
class SuffixIndexSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b c d e f g h i j"),
    (2L, "z z2 c d e f g h z3"),
    (3L, "m n o p q"),
    (4L, "a b c d e f g h i j"),
    (7L, "solo words only here"))

  test("serve from a fresh build equals suffixDedupStats row-for-row") {
    val docs = corpus.toDF("doc_id", "text")
    val name = "graft_sfx_spec_a"
    try {
      val served = ops.DedupOps.suffixIndexServe(docs, name)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val stats = ops.DedupOps.suffixDedupStats(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(served.toSeq == stats.toSeq)
      // second serve is a pure store read (store exists, fingerprint
      // matches) and returns the same rows
      val again = ops.DedupOps.suffixIndexServe(docs, name)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(again.toSeq == stats.toSeq)
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("build accounting: suffix count, doc count, and LCP mass match a driver recompute") {
    val docs = corpus.toDF("doc_id", "text")
    val name = "graft_sfx_spec_b"
    try {
      val acc = ops.DedupOps.suffixIndexBuild(docs, name).head()
      // driver-side SA: sort all suffixes (token-list lexicographic,
      // prefix-first), adjacent LCPs over ALL pairs
      implicit val seqOrd: Ordering[Seq[String]] =
        math.Ordering.Implicits.seqOrdering
      val sufs = corpus.flatMap { case (d, t) =>
        val w = t.split(" ")
        w.indices.map(i => (w.drop(i).toSeq, d, i + 1))
      }.sorted
      def lcp(a: Seq[String], b: Seq[String]): Long =
        a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
      val sumLcp = sufs.sliding(2).collect {
        case Seq(x, y) => lcp(x._1, y._1)
      }.sum
      assert(acc.getLong(0) == sufs.length.toLong)
      assert(acc.getLong(1) == corpus.length.toLong)
      assert(acc.getLong(2) == sumLcp)
      // stored keys are GAPPED: dense position i persists at (i+1)·2^20
      val G = 1L << 20
      val ck = sufs.zipWithIndex.map { case ((_, d, p), sp) =>
        ((sp.toLong + 1) * G * 31 + p * 7 + d) % 1000003L
      }.sum
      assert(acc.getLong(3) == ck)
      // link checksum over the (prev_sp, prev_doc) pointers
      val lck = sufs.zipWithIndex.map { case (_, sp) =>
        val (psk, pd) =
          if (sp == 0) (-1L, -1L)
          else (sp.toLong * G, sufs(sp - 1)._2)
        (psk * 13 + pd) % 1000003L
      }.sum
      assert(acc.getLong(4) == lck)
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("fingerprint staleness: a content-only mutation (counts, ids, and " +
       "char mass all preserved) still rebuilds") {
    import spark.implicits._
    val name = "graft_sfx_spec_e"
    try {
      // b swaps the TEXTS of docs 2 and 3 (equal char lengths), so doc
      // count, id sum, and total char mass — the round-14 moment-only
      // fingerprint — are identical; only content moved. The digest
      // term must trip staleness, or doc 2 serves doc 3's structure.
      val a = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "p q r s"))
        .toDF("doc_id", "text")
      ops.DedupOps.suffixIndexBuild(a, name).collect()
      val b = Seq((1L, "a b c d"), (2L, "p q r s"), (3L, "a b x y"))
        .toDF("doc_id", "text")
      val served = ops.DedupOps.suffixIndexServe(b, name)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val stats = ops.DedupOps.suffixDedupStats(b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(served.toSeq == stats.toSeq)
      assert(stats.find(_._1 == 2L).get._3 == 0L &&
        stats.find(_._1 == 3L).get._3 == 2L)
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("empty corpus: build yields a defined fingerprint and an empty " +
       "index; serve returns zero rows") {
    import spark.implicits._
    val name = "graft_sfx_spec_f"
    try {
      val none = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val acc = ops.DedupOps.suffixIndexBuild(none, name).head()
      assert(acc.getLong(0) == 0L && acc.getLong(3) == 0L)
      assert(ops.DedupOps.suffixIndexServe(none, name).count() == 0L)
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("fingerprint staleness: a regenerated corpus at the same name rebuilds") {
    val name = "graft_sfx_spec_c"
    try {
      val a = Seq((1L, "x y z x y z"), (2L, "x y z q")).toDF("doc_id", "text")
      ops.DedupOps.suffixIndexBuild(a, name).collect()
      // different corpus, same artifact name -> serve must detect the
      // stale fingerprint and rebuild, not serve corpus A's structure
      val b = Seq((1L, "p q r"), (5L, "p q r s t")).toDF("doc_id", "text")
      val served = ops.DedupOps.suffixIndexServe(b, name)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val stats = ops.DedupOps.suffixDedupStats(b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(served.toSeq == stats.toSeq)
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("suffixIndexClone: the clone serves fresh with no rebuild, a " +
       "delete on it leaves the source byte-identical, and the torn " +
       "rebuild-over-existing state reads as stale") {
    val docs = corpus.toDF("doc_id", "text")
    val src = "graft_sfx_spec_clone_src"
    val dst = "graft_sfx_spec_clone_dst"
    try {
      ops.DedupOps.suffixIndexBuild(docs, src).collect()
      ops.DedupOps.suffixIndexClone(spark, src, dst)
      // the clone carries the corpus fingerprint: fresh, no rebuild
      assert(ops.DedupOps.suffixStoreFresh(docs, dst))
      val srcDig = SuffixTestUtil.fileDigests(spark, src)
      // destructive lifecycle runs on the clone ONLY
      ops.DedupOps.suffixIndexDelete(docs, Seq(1L, 4L).toDF("doc_id"), dst)
      val remaining = corpus.filterNot(d => Set(1L, 4L)(d._1))
      SuffixTestUtil.assertValidIndex(spark, dst, remaining)
      assert(SuffixTestUtil.fileDigests(spark, src) == srcDig,
        "delete on the clone touched the source store")
      val served = ops.DedupOps.suffixIndexServe(docs, src)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val stats = ops.DedupOps.suffixDedupStats(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(served.toSeq == stats.toSeq, "source no longer serves")
      // Torn REBUILD-over-existing (round-16 ADVICE): a crash between
      // the sub-store recreate and the main-store drop leaves the old
      // main store paired with another corpus's arrays — the stamped
      // in-progress marker must make that state read stale, never
      // fresh. Simulate the crash remnant directly.
      java.nio.file.Files.write(
        ops.KeyedStore.location(spark, src).resolve("_sfx_inprogress"),
        Array[Byte]('1'))
      assert(!ops.DedupOps.suffixStoreFresh(docs, src),
        "torn rebuild state served as fresh")
      // every serve path self-heals by rebuilding
      val healed = ops.DedupOps.suffixIndexServe(docs, src)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(healed.toSeq == stats.toSeq)
      assert(ops.DedupOps.suffixStoreFresh(docs, src))
    } finally {
      ops.DedupOps.suffixIndexDrop(spark, src)
      ops.DedupOps.suffixIndexDrop(spark, dst)
    }
  }

  test("fixture slice: served stats equal computed stats") {
    val docs = graft.Tables.documents(spark, Sf)
      .filter(col("doc_id") % 5 === 0)
    val name = "graft_sfx_spec_d"
    try {
      val served = ops.DedupOps.suffixIndexServe(docs, name)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val stats = ops.DedupOps.suffixDedupStats(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(served.toSeq == stats.toSeq && served.nonEmpty)
      assert(served.exists(_._3 >= 5), "slice should contain dups")
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }
}
