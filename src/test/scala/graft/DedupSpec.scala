package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dedup-layer behavior on the fixtures: the planted near-duplicate pairs
  * must be found by every near-dup method, and the sub-quadratic LSH path
  * must agree with the exact all-pairs path.
  */
class DedupSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ngramPairs =
    ops.DedupOps.qDedupNgramJaccard(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact dedup: fixture has no exact duplicates (identity)") {
    val df = ops.DedupOps.qDedupExact(spark, Sf)
    val total = graft.Tables.documents(spark, Sf).count()
    assert(df.count() == total)
    assert(df.filter("n_copies > 1").count() == 0)
  }

  /** Independent driver-side recomputation of lang-blocked 3-shingle
    * Jaccard pairs at a threshold (plain Scala, no Spark).
    */
  private def expectedPairs(minJ: Double): Set[(Long, Long)] = {
    val docs = graft.Tables.documents(spark, Sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def sh(t: String): Set[String] = {
      val w = t.split(" ")
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val byLang = docs.toSeq.groupBy(_._2)
    byLang.values.flatMap { ds =>
      for {
        (a, _, ta) <- ds
        (b, _, tb) <- ds if a < b
        sa = sh(ta); sb = sh(tb)
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= minJ
      } yield (a, b)
    }.toSet
  }

  test("ngram jaccard equals an independent driver-side recomputation") {
    assert(ngramPairs.nonEmpty, "fixtures should contain planted near-dups")
    assert(ngramPairs == expectedPairs(0.8))
  }

  test("minhash LSH candidates exactly reproduce the all-pairs jaccard result") {
    val lsh = ops.DedupOps.qDedupMinhashLsh(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == ngramPairs) // 100% recall on fixtures, verified candidates
  }

  test("simhash pairs (hamming <= 4) cover the very-near duplicates") {
    // SimHash is a coarser signal than shingle Jaccard: hamming <= 4
    // reliably captures J >= 0.95 twins; 0.8-0.95 pairs may land above it.
    val sim = ops.DedupOps.qDedupSimhash(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val veryNear = expectedPairs(0.95)
    assert(veryNear.nonEmpty)
    assert(veryNear.subsetOf(sim), s"missing: ${veryNear.diff(sim)}")
  }

  test("dedupClusters: min-label propagation finds connected components") {
    import spark.implicits._
    // chain 1-2-3 (diameter 2, needs >1 round), pair 5-6, plus 8-9 via 9-8
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 8L)).toDF("doc_a", "doc_b")
    val got = ops.DedupOps.dedupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("dedupKeepBest keeps the highest-TTR cluster member, ties to min id, " +
       "singletons untouched") {
    import spark.implicits._
    // Cluster {1,2,3}: doc 2 has the best distinct-token ratio (1.0)
    // and must win over the min-id canonical dedupApply would keep.
    // Cluster {10,11}: equal TTR — the tie goes to doc 10. Doc 9 is a
    // singleton (no pair) and is always kept.
    val docs = Seq(
      (1L, "en", 7L, "a a a a"),        // ttr 250000
      (2L, "en", 7L, "w x y z"),        // ttr 1000000
      (3L, "en", 7L, "b b c c"),        // ttr 500000
      (9L, "en", 3L, "solo doc"),
      (10L, "en", 3L, "p q"),           // ttr 1000000
      (11L, "en", 3L, "r s")            // ttr 1000000
    ).toDF("doc_id", "lang", "n_chars", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = ops.DedupOps.dedupKeepBest(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.keySet == Set(2L, 9L, 10L), out.toString)
    assert(out(2L) == 1000000L && out(10L) == 1000000L)
  }

  test("embedding cosine near-dup: pairs ordered, cos >= 0.45, within label") {
    val rows = ops.DedupOps.qDedupEmbeddingCosine(spark, Sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(2))
      assert(r.getDouble(3) >= 0.45)
    }
  }

  test("df-cap contract: mass-dup clusters are ngram-missed but caught downstream") {
    import spark.implicits._
    // 55 near-identical copies (> dfCap=50): most shared prefix shingles
    // exceed the cap, so ngram recall DEGRADES (only pairs still sharing
    // an under-cap prefix shingle survive — 1081 of 1485 here, via the
    // shingle whose prefix-df dropped to 47 by displacement). The cluster
    // regime belongs to the other stages: minhash-LSH (df-insensitive
    // signatures) finds the pairs, and exact dedup collapses fully
    // identical copies.
    val base = (1 to 25).map(i => s"tok$i").mkString(" ")
    val near = (0 until 55).map(i => (i.toLong, "en", s"$base extra$i"))
      .toDF("doc_id", "lang", "text")
    val ngramFound = ops.DedupOps.ngramJaccardPairs(near, 0.8).count()
    assert(ngramFound < 1485, "above-cap cluster must show degraded ngram recall")
    val mh = ops.DedupOps.minhashLshPairs(near, 0.8).collect()
    assert(mh.length > 1400, s"minhash found ${mh.length} of 1485 pairs")
    mh.foreach(r => assert(r.getDouble(2) == 0.92)) // J = 23/25 exactly
    val ident = (0 until 55).map(i => (i.toLong, "en", base))
      .toDF("doc_id", "lang", "text")
    val ex = ops.DedupOps.exactDedup(ident).head()
    assert(ex.getLong(1) == 55) // one digest group holding every copy
  }

  test("sorted_intersect_count equals size(array_intersect) on random sorted sets") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      def set() = Seq.fill(rnd.nextInt(60))(rnd.nextInt(40).toLong).distinct.sorted
      (set(), set())
    }
    val df = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.functions.SetFunctions.sortedIntersectCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
    // null array -> null, like the built-in
    val withNull = Seq((Seq(1L, 2L), null: Seq[Long])).toDF("a", "b")
      .select(graft.functions.SetFunctions.sortedIntersectCount(col("a"), col("b")))
    assert(withNull.head().isNullAt(0))
  }

  test("embedding cosine LSH blocking has full recall vs all-pairs on fixtures") {
    // Driver-side ground truth: all same-label pairs with 3dp-rounded
    // cosine >= 0.45 (the exact semantics of the pre-LSH round-1 query).
    // sf0.01: the sf0.001 embeddings table has no qualifying pair.
    val sf01 = "/root/testdata/sf0.01"
    val vecs = graft.Tables.embeddings(spark, sf01)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    val truth = (for {
      (ia, la, va) <- vecs
      (ib, lb, vb) <- vecs
      if la == lb && ia < ib
      cos = BigDecimal(dot(va, vb) / math.sqrt(dot(va, va) * dot(vb, vb)))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= 0.45
    } yield (ia, ib)).toSet
    val lsh = ops.DedupOps.qDedupEmbeddingCosine(spark, sf01).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(truth.nonEmpty)
    assert(lsh == truth, s"missing: ${truth.diff(lsh)}, extra: ${lsh.diff(truth)}")
  }

  test("fuzzy match finds exactly the distance-1 pairs (brute-force truth)") {
    val got = ops.DedupOps.qFuzzyMatch(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val words = graft.Tables.documents(spark, Sf).collect()
      .flatMap(_.getString(1).split(" ")).toSet
    val typos = words.filter(_.length >= 4).map(t => t.take(1) + t.drop(2))
    val vocab = (words ++ typos).toSeq.sorted
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val truth = (for { a <- vocab; b <- vocab if a < b && lev(a, b) <= 1 }
      yield (a, b)).toSet
    assert(truth.nonEmpty)
    assert(got == truth, s"missing=${truth.diff(got)} extra=${got.diff(truth)}")
  }

  test("fuzzy match2 finds exactly the distance-<=2 pairs (brute-force truth)") {
    val got = ops.DedupOps.qFuzzyMatch2(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val words = graft.Tables.documents(spark, Sf).collect()
      .flatMap(_.getString(1).split(" ")).toSet
    val typos1 = words.filter(_.length >= 4).map(t => t.take(1) + t.drop(2))
    val typos2 = words.filter(_.length >= 5).map(t => t.take(2) + t.drop(3))
    val vocab = (words ++ typos1 ++ typos2).toSeq.sorted
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val truth = (for { a <- vocab; b <- vocab if a < b; d = lev(a, b) if d <= 2 }
      yield (a, b, d)).toSet
    assert(truth.exists(_._3 == 2), "fixture must contain exact-distance-2 pairs")
    assert(got == truth, s"missing=${truth.diff(got).take(5)} extra=${got.diff(truth).take(5)}")
  }

  test("minhash estimate tracks exact jaccard within the 4-sigma tolerance") {
    val rows = ops.DedupOps.qMinhashEstimate(spark, Sf).collect()
    assert(rows.nonEmpty)
    // Independent of the oracle (which mirrors the computation): the
    // estimator must actually be close to the true Jaccard.
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_tol"),
        s"${r.getLong(0)}-${r.getLong(1)}: est=${r.getAs[Double]("est_jaccard")} " +
          s"exact=${r.getAs[Double]("exact_jaccard")}")
    }
    val mae = rows.map(r => math.abs(
      r.getAs[Double]("est_jaccard") - r.getAs[Double]("exact_jaccard"))).sum / rows.length
    assert(mae <= 0.15, s"mean abs error $mae")
  }

  test("substring-dedup apply conserves mass and matches a driver splice " +
       "on a constructed shared-span corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Every fixture row conserves: removed + surviving == original.
    val rows = ops.DedupOps.qSubstrApply(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) + r.getInt(4) == r.getInt(1),
        s"doc ${r.getLong(0)}: ${r.getLong(3)} + ${r.getInt(4)} != ${r.getInt(1)}")
    }
    assert(rows.exists(_.getLong(3) > 0), "fixture has no duplicated spans")
    assert(rows.exists(_.getLong(3) == 0), "fixture is entirely duplicated")
    // Constructed corpus: docs 1 and 2 share one exact 80-char span
    // placed at offsets EQUAL MOD STRIDE (25 and 45) — the fixed-window
    // scheme only catches stride-aligned repeats (the documented
    // approximation of the suffix-array scan); two overlapping windows
    // match -> one merged island per doc. Doc 3 is clean.
    val shared = ("the quick brown fox jumps over the lazy dog again and " +
      "again until the very day ends").take(80)
    assert(shared.length == 80)
    val d1 = "A" * 25 + shared + "B" * 17
    val d2 = "C" * 45 + shared + "D" * 3
    val d3 = "unique text that appears nowhere else in this tiny corpus"
    val tiny = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = ops.DedupOps.substrDedupApply(tiny).collect()
      .map(r => r.getLong(0) -> r).toMap
    // Driver-side splice for doc 1: duplicated windows are those 40-char
    // windows (stride 20) whose content also occurs in doc 2.
    def winsOf(t: String): Seq[(Int, String)] = {
      val starts = 1 to math.max(t.length - 39, 1) by 20
      starts.map(p => (p, t.substring(p - 1, math.min(p + 39, t.length))))
    }
    val w2 = winsOf(d2).map(_._2).toSet
    val dupIv = winsOf(d1).filter { case (_, w) => w2.contains(w) }
      .map { case (p, w) => (p, p + w.length - 1) }
    assert(dupIv.nonEmpty, "constructed span produced no duplicated window")
    // merge islands
    val merged = dupIv.sortBy(identity).foldLeft(List.empty[(Int, Int)]) {
      case (acc, (s, e)) if acc.nonEmpty && s <= acc.head._2 =>
        (acc.head._1, math.max(acc.head._2, e)) :: acc.tail
      case (acc, iv) => iv :: acc
    }.reverse
    val removed = merged.map { case (s, e) => e - s + 1 }.sum
    val keep = new StringBuilder
    var pos = 1
    merged.foreach { case (s, e) =>
      keep ++= d1.substring(pos - 1, s - 1); pos = e + 1
    }
    keep ++= d1.substring(pos - 1)
    val r1 = out(1L)
    assert(r1.getLong(3) == removed, s"removed ${r1.getLong(3)} != $removed")
    assert(r1.getInt(4) == keep.length)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(keep.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r1.getString(5) == md, "survivor splice differs from driver")
    // The clean doc survives untouched.
    assert(out(3L).getLong(3) == 0 && out(3L).getInt(4) == d3.length)

    // Stride 1 closes the alignment blind spot: the same span at
    // offsets NOT equal mod 20 is invisible to the strided pass but
    // fully removed by the alignment-free one.
    val misaligned = Seq(
      (1L, "A" * 25 + shared + "B" * 17),
      (2L, "C" * 41 + shared + "D" * 3)).toDF("doc_id", "text")
    val strided = ops.DedupOps.substrDedupApply(misaligned).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(strided.values.forall(_ == 0L), s"strided caught $strided")
    val exact = ops.DedupOps.substrDedupApply(misaligned, stride = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // Windows cover the whole 80-char span (positions 0..40 of it), so
    // the merged island is at least the span minus nothing: 80 chars.
    assert(exact.values.forall(_ >= 80L), s"exact missed: $exact")
  }
}
