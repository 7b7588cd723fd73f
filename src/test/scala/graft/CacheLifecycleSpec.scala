package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.storage.StorageLevel

/** The [[GraftCache]] contract gate: every operator-internal persist is
  * tracked per-session and released in one call, without touching the
  * caller's own caches. Suites run sequentially in the one forked test
  * JVM (build.sbt forks, testForkedParallel stays false), so the
  * persistent-RDD id sets observed here are not racing another suite.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  import TestSpark._

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def resetStorage(): Unit = GraftCache.releaseAllStorage(spark)

  test("operators leave zero cache entries behind after releaseCaches; " +
       "a user cache survives") {
    import spark.implicits._
    resetStorage()

    // The user's own cache — must survive the graft release untouched.
    val userDf = spark.range(1000).toDF("id").persist(StorageLevel.MEMORY_AND_DISK)
    userDf.count()
    assert(userDf.storageLevel.useMemory)
    val baseline = persistentIds

    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang", "text")

    // A batch of cached operators spanning three ops files (TextOps,
    // DedupOps, GraphOps all persist shared derived relations), each
    // MATERIALIZED so the lazy persists actually allocate blocks.
    Graft.tfidfTopTerms(docs, k = 2).count()
    Graft.minhashLshPairs(docs).count()
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "wgt")
    Graft.pageRank(edges, iters = 2).count()

    assert(GraftCache.trackedCount(spark) > 0,
      "operators must route persists through GraftCache.cached")
    val afterOps = persistentIds
    val graftAdded = afterOps -- baseline
    assert(graftAdded.nonEmpty,
      "materialized operator persists must show as persistent RDDs")

    val released = Graft.releaseCaches(spark, blocking = true)
    assert(released > 0)
    assert(GraftCache.trackedCount(spark) == 0)
    val afterRelease = persistentIds
    // Zero SQL-cache (CacheManager) leftovers. localCheckpoint blocks
    // are a different mechanism: iterative operators free their own
    // per-round intermediates, and a block backing a RETURNED relation
    // cannot be freed by release (the truncated lineage could not
    // recompute) — the ContextCleaner reaps it once the caller drops the
    // reference, unlike SQL cache entries which leak forever.
    val leftovers = afterRelease & graftAdded
    val rdds = spark.sparkContext.getPersistentRDDs
    assert(leftovers.forall(id => rdds(id).isCheckpointed),
      s"non-localCheckpoint graft persists survived release: " +
        leftovers.filterNot(id => rdds(id).isCheckpointed))
    leftovers.foreach(id => rdds(id).unpersist(blocking = true))
    // The user's cache is untouched — entry still present and still
    // answering from storage.
    assert(userDf.storageLevel.useMemory)
    assert(afterRelease.contains(baseline.head) || baseline.subsetOf(afterRelease))
    userDf.unpersist(blocking = true)
  }

  test("the leak curve itself: ever-new inputs grow the cache without " +
       "release, stay flat with a scope per batch") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang", "text")
    resetStorage()
    val base = persistentIds.size
    // The long-lived-session pathology: each batch runs over a NEW
    // input slice (distinct canonical plans — same-plan batches would
    // be deduped by the CacheManager and mask the growth), nobody
    // releases. Storage accumulates monotonically per batch.
    val growth = (0 until 3).map { i =>
      Graft.tfidfTopTerms(docs.filter(col("doc_id") % 7 === i), k = 1).count()
      persistentIds.size
    }
    assert(growth.zip(growth.drop(1)).forall { case (a, b) => b > a } &&
           growth.head > base,
      s"unreleased batches must accumulate storage: base=$base $growth")
    resetStorage()
    // Same batches, each inside a scope: storage returns to baseline
    // after every batch — the session stays flat indefinitely.
    val flat = (0 until 3).map { i =>
      Graft.withCacheScope(spark) {
        Graft.tfidfTopTerms(docs.filter(col("doc_id") % 7 === i), k = 1).count()
      }
      // scope exit unpersists non-blocking; poll the drain
      val deadline = System.currentTimeMillis() + 10000
      while (persistentIds.size > base &&
             System.currentTimeMillis() < deadline) Thread.sleep(50)
      persistentIds.size
    }
    assert(flat.forall(_ == base),
      s"scoped batches must return to baseline: base=$base $flat")
    assert(GraftCache.trackedCount(spark) == 0)
  }

  test("releaseCaches on a session with nothing tracked is a no-op") {
    resetStorage()
    assert(GraftCache.trackedCount(spark) == 0)
    assert(Graft.releaseCaches(spark) == 0)
  }

  test("release is safe while a returned lazy DataFrame is still held: " +
       "the plan recomputes without the cache") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang", "text")
    resetStorage()
    val pairs = Graft.minhashLshPairs(docs) // NOT materialized yet
    assert(GraftCache.trackedCount(spark) > 0)
    Graft.releaseCaches(spark, blocking = true)
    assert(GraftCache.trackedCount(spark) == 0)
    // Correctness survives the early release — only the dedup is lost.
    assert(pairs.count() >= 0L)
    GraftCache.release(spark, blocking = true)
  }

  private def awaitGone(ids: Set[Int]): Unit = {
    // scope exit unpersists non-blocking; drain is prompt but async
    val deadline = System.currentTimeMillis() + 10000
    while ((persistentIds & ids).nonEmpty &&
           System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert((persistentIds & ids).isEmpty,
      s"scope entries not drained: ${persistentIds & ids}")
  }

  test("a scope releases only its own thread's caches — concurrent " +
       "scopes on one session are independent") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang", "text")
    resetStorage()
    val bReady = new java.util.concurrent.CountDownLatch(1)
    val aDone = new java.util.concurrent.CountDownLatch(1)
    @volatile var bAdded: Set[Int] = Set.empty
    @volatile var survived = false
    @volatile var err: Throwable = null
    val b = new Thread(() => {
      try Graft.withCacheScope(spark) {
        val before = persistentIds
        Graft.tfidfTopTerms(docs, k = 2).count()
        bAdded = persistentIds -- before
        bReady.countDown()
        aDone.await()
        // Thread A's scope has exited; B's in-flight caches must have
        // survived it (the pre-round-11 session-global release here
        // would have dropped them and silently re-instated the
        // N-rescans pathology).
        survived = bAdded.nonEmpty && bAdded.subsetOf(persistentIds)
      } catch { case t: Throwable => err = t; bReady.countDown() }
    })
    b.start()
    bReady.await()
    // Distinct operator AND input slice: an identical canonical plan
    // would cache-substitute into B's entries and confound the check.
    Graft.withCacheScope(spark) {
      Graft.minhashLshPairs(docs.filter(col("doc_id") % 2 === 0)).count()
    }
    aDone.countDown()
    b.join(120000)
    assert(err == null, s"scope-B thread failed: $err")
    assert(survived, "scope A's exit released scope B's in-flight caches")
    awaitGone(bAdded) // B's own exit drains its entries
    resetStorage()
  }

  test("nested scopes release innermost-first, each only its own entries") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang", "text")
    resetStorage()
    var outerAdded: Set[Int] = Set.empty
    var innerAdded: Set[Int] = Set.empty
    Graft.withCacheScope(spark) {
      val b0 = persistentIds
      Graft.tfidfTopTerms(docs, k = 1).count()
      outerAdded = persistentIds -- b0
      Graft.withCacheScope(spark) {
        val b1 = persistentIds
        Graft.minhashLshPairs(docs).count()
        innerAdded = persistentIds -- b1
      }
      awaitGone(innerAdded)
      assert(outerAdded.nonEmpty && outerAdded.subsetOf(persistentIds),
        "inner scope exit must not touch the outer scope's entries")
    }
    awaitGone(outerAdded)
    assert(GraftCache.trackedCount(spark) == 0)
  }

  test("withCacheScope releases on exit, including when the body throws") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "lang", "text")
    resetStorage()
    val n = Graft.withCacheScope(spark) {
      Graft.tfidfTopTerms(docs, k = 1).count()
    }
    assert(n > 0L)
    assert(GraftCache.trackedCount(spark) == 0)

    val boom = intercept[RuntimeException] {
      Graft.withCacheScope(spark) {
        Graft.tfidfTopTerms(docs, k = 1).count()
        throw new RuntimeException("boom")
      }
    }
    assert(boom.getMessage == "boom")
    assert(GraftCache.trackedCount(spark) == 0,
      "a throwing scope body must still release the tracked caches")
  }
}
