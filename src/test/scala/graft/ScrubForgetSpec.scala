package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-store GDPR forget cascade (ScrubOps.forgetCascade): the serve
  * surfaces actually miss forgotten ids afterwards, time travel still
  * reads pre-forget versions (by design), and vacuum is the erasure
  * boundary that finally makes the bytes unreachable.
  */
class ScrubForgetSpec extends AnyFunSuite {
  import TestSpark._
  import ops.{AnnIndexOps, KeyedStore, ScrubOps, VersionedStore}

  test("after the cascade every serve surface misses the forgotten ids; " +
       "time travel reads them until vacuum erases") {
    val docsRows = Tables.documents(spark, Sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val embs = Tables.embeddings(spark, Sf)
    val keyedName = "graft_forget_spec_docs"
    val annName = "graft_forget_spec_ann"
    val vdir = java.nio.file.Files.createTempDirectory("graft_forget_spec").toString
    val sfxName = "graft_forget_spec_sfx"
    try {
      KeyedStore.create(spark, keyedName, docsRows, "doc_id", 128)
      VersionedStore.init(spark, vdir, docsRows, "doc_id")
      AnnIndexOps.buildIndex(spark, annName, embs)
      // Suffix leg over a sub-corpus (the qForgetCascade shape): the
      // doomed set must actually intersect it.
      val sfxDocs = Tables.documents(spark, Sf)
        .filter(col("doc_id") % 21 === 0).select(col("doc_id"), col("text"))
      ops.DedupOps.suffixIndexBuild(sfxDocs, sfxName).collect()
      val doomedIds = docsRows.filter(col("doc_id") % 10 === 3).select("doc_id")
      val doomed = doomedIds.collect().map(_.getLong(0)).toSet
      assert(doomed.nonEmpty)
      val sfxDoomed = sfxDocs.join(doomedIds, Seq("doc_id"), "left_semi")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(sfxDoomed.nonEmpty, "fixture must hit the suffix sub-corpus")

      ScrubOps.forgetCascade(spark, keyedName, "doc_id", vdir, "doc_id",
        annName, doomedIds, embs.filter(col("vec_id") % 10 === 3),
        Some((sfxName, sfxDocs)))

      // Suffix leg: the doomed docs' rows left the index AND the token
      // sub-store; the patched structure serves the surviving
      // sub-corpus exactly.
      val sfxIds = KeyedStore.scan(spark, sfxName, "sp", 0L, Long.MaxValue)
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(sfxIds.intersect(doomed).isEmpty, "doomed suffix rows served")
      val sfxRemaining = sfxDocs.join(doomedIds, Seq("doc_id"), "left_anti")
      assert(ops.DedupOps.suffixIndexServe(sfxRemaining, sfxName)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq ==
        ops.DedupOps.suffixDedupStats(sfxRemaining)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq, "patched suffix index diverges from a fresh recompute")
      val sfxDigests = SuffixTestUtil.fileDigests(spark, sfxName)

      // Keyed GET misses (probe two forgotten keys + one survivor).
      val probes = doomed.take(2).toSeq :+
        docsRows.filter(col("doc_id") % 10 =!= 3).head().getLong(0)
      val got = KeyedStore.get(spark, keyedName, "doc_id", probes)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == probes.toSet -- doomed, s"keyed get returned $got")

      // ANN serve never returns a forgotten neighbor.
      val neighbors = AnnIndexOps.serve(spark, annName, embs, col("vec_id") < 5)
        .select("neighbor_id").collect().map(_.getLong(0)).toSet
      assert(neighbors.intersect(doomed).isEmpty,
        s"forgotten ids served: ${neighbors.intersect(doomed).take(3)}")

      // REPLAY idempotence (the at-least-once contract, pinned here so
      // the sf0.1 driver row pays for one cascade, not two): re-running
      // the whole cascade changes nothing on any leg.
      ScrubOps.forgetCascade(spark, keyedName, "doc_id", vdir, "doc_id",
        annName, doomedIds, embs.filter(col("vec_id") % 10 === 3),
        Some((sfxName, sfxDocs)))
      val keyedN = KeyedStore.scan(spark, keyedName, "doc_id",
        0L, Long.MaxValue).count()
      assert(keyedN == docsRows.count() - doomed.size,
        "re-forget changed the keyed store")
      assert(SuffixTestUtil.fileDigests(spark, sfxName) == sfxDigests,
        "re-forget rewrote the suffix index")
      val postingsN = KeyedStore.scan(spark, annName, "row_key", "c", "cz").count()
      val liveEmb = embs.filter(
        expr("aggregate(embedding, cast(0 as double), " +
          "(a, x) -> greatest(a, abs(cast(x as double)))) > 0"))
      assert(postingsN ==
        2 * liveEmb.filter(col("vec_id") % 10 =!= 3).count(),
        "re-forget changed the ANN postings")

      // Versioned head misses them; version 1 STILL reads them — time
      // travel is rollback/audit surface, not an erasure hole by accident.
      val headV = VersionedStore.currentVersion(vdir)
      val headIds = VersionedStore.asOf(spark, vdir, headV)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(headIds.intersect(doomed).isEmpty)
      val v1Ids = VersionedStore.asOf(spark, vdir, 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(doomed.subsetOf(v1Ids), "pre-forget version lost rows")

      // Vacuum IS the erasure boundary: dropping pre-forget versions
      // makes version 1 unreadable; the head is untouched.
      VersionedStore.vacuum(vdir, keepLast = 1)
      intercept[Exception] {
        VersionedStore.asOf(spark, vdir, 1).collect()
      }
      assert(VersionedStore.asOf(spark, vdir, headV).count() == headIds.size)
    } finally {
      ops.DedupOps.suffixIndexDrop(spark, sfxName)
      graft.streaming.EventStream.deleteRecursively(
        java.nio.file.Paths.get(vdir))
    }
  }
}
