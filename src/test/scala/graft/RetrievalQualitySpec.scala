package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 retrieval/quality additions: BM25 ranking, HLL cardinality,
  * perplexity filtering, SemDeDup-style semantic dedup. Each is checked
  * against an independent driver-side recomputation (the DuckDB oracle is
  * the second, cross-engine check).
  */
class RetrievalQualitySpec extends AnyFunSuite {
  import TestSpark._

  private def docTexts: Map[Long, Array[String]] =
    graft.Tables.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap

  test("BM25 matches an exact driver-side recomputation") {
    val terms = Seq("spark", "join", "data")
    val docs = docTexts
    val n = docs.size
    val avgdl = docs.values.map(_.length.toLong).sum.toDouble / n
    val df = terms.map(t => t -> docs.values.count(_.contains(t))).toMap
    val expected = docs.toSeq.flatMap { case (id, toks) =>
      val score = terms.flatMap { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log((n.toDouble - df(t) + 0.5) / (df(t) + 0.5) + 1.0)
          Some(math.round(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl)) * 1e6))
        }
      }
      if (score.isEmpty) None else Some((id, score.sum, score.size.toLong))
    }.sortBy { case (id, s, _) => (-s, id) }.take(20)
    val got = ops.TextOps.qBm25(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("HLL registers merge by per-register max (mergeable partial state)") {
    val toks = graft.Tables.documents(spark, Sf)
      .select(col("lang"), col("doc_id"), explode(ops.TextFns.toks).as("token"))
    def regs(pred: org.apache.spark.sql.Column) =
      ops.TextOps.hllRegisters(toks.filter(pred), col("lang"), col("token"))
    val merged = regs(col("doc_id") % 2 === 0).union(regs(col("doc_id") % 2 === 1))
      .groupBy(col("key"), col("reg")).agg(max(col("mrho")).as("mrho"))
    val full = ops.TextOps.hllRegisters(toks, col("lang"), col("token"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("HLL estimate is within 20% of exact on every language") {
    val rows = ops.TextOps.qHllDistinct(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"lang ${r.getString(0)}: est ${r.getLong(2)} vs exact ${r.getLong(3)}")
    }
  }

  test("perplexity filter matches a driver-side bigram-LM recomputation") {
    val docs = docTexts
    val bigrams = docs.toSeq.flatMap { case (id, w) => w.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1))) }
    val c12 = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val tot = bs.map(b => math.round(math.log(c1(b._2).toDouble / c12((b._2, b._3))) * 1e6)).sum
      id -> (tot, bs.size.toLong, tot / bs.size)
    }
    val got = ops.TextOps.qPerplexityFilter(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // The p90 threshold splits the fixture: both kept and flagged docs exist.
    val keeps = ops.TextOps.qPerplexityFilter(spark, Sf)
      .groupBy(col("keep_doc")).count().collect().map(_.getBoolean(0)).toSet
    assert(keeps == Set(true, false))
  }

  test("containment prefix filter is exact: uncapped run equals brute force") {
    // With the df-cap disabled, prefix filtering must lose NOTHING — the
    // operator's output equals the all-pairs ground truth. (The capped
    // default trades recall on corpus-common shingles; that contract is
    // DedupSpec territory.)
    val docs = docTexts.view.mapValues(_.toSeq).toMap
    val sh = docs.collect { case (id, w) if w.length >= 3 =>
      id -> w.sliding(3).map(_.mkString(" ")).toSet
    }
    val langs = graft.Tables.documents(spark, Sf).select("doc_id", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq
      if a != b && langs(a) == langs(b)
      c = BigDecimal(sa.intersect(sb).size.toDouble / sa.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if c >= 0.85
    } yield (a, b) -> c).toMap
    val got = ops.DedupOps.containmentPairs(
        graft.Tables.documents(spark, Sf), 0.85, Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("markov transitions match a driver-side sequence recomputation") {
    val ev = graft.Tables.eventsWithRawTs(spark, Sf)
      .select("user_id", "ts_nanos", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1)))
    }.toSeq
    val c2 = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = ops.EventOps.qMarkovTransitions(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == c2.map { case (k, n) => k -> (n, c1(k._1)) })
    // probabilities per from_type sum to ~1
    val psums = ops.EventOps.qMarkovTransitions(spark, Sf)
      .groupBy(col("from_type")).agg(sum(col("p_cond")).as("s")).collect()
    psums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4))
  }

  test("anomaly z-score flags exactly the driver-side >=3-sigma set") {
    val vals = graft.Tables.events(spark, Sf).select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byType = vals.groupBy(_._2)
    val expected = byType.toSeq.flatMap { case (_, es) =>
      val vm = es.map(e => (e._1, math.round(e._3 * 1e6)))
      val n = vm.size
      val s1 = vm.map(_._2).sum
      val s2 = vm.map(e => BigInt(e._2) * BigInt(e._2)).sum
      val mean = s1.toDouble / n
      val sd = math.sqrt(s2.toDouble / n - mean * mean)
      vm.flatMap { case (id, v) =>
        val z = BigDecimal((v.toDouble - mean) / sd)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (math.abs(z) >= 3.0) Some(id -> z) else None
      }
    }.toMap
    val got = ops.EventOps.qAnomalyZscore(spark, Sf).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("PMI collocations match a driver-side recomputation") {
    val bgs = docTexts.values.filter(_.length >= 2)
      .flatMap(w => w.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))).toSeq
    val c12 = bgs.groupBy(identity).view.mapValues(_.size).toMap
    val c1 = bgs.groupBy(_._1).view.mapValues(_.size).toMap
    val c2 = bgs.groupBy(_._2).view.mapValues(_.size).toMap
    val nb = bgs.size
    val expected = c12.toSeq.filter(_._2 >= 5).map { case ((w1, w2), n) =>
      val pmi = BigDecimal(math.log(n.toDouble * nb / (c1(w1).toDouble * c2(w2))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (w1, w2, n.toLong, pmi)
    }.sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }.take(20)
    val got = ops.TextOps.qPmiCollocations(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("kNN graph: reported cosines are true values; recall@5 vs brute force is usable") {
    val vecs = graft.Tables.embeddings(spark, Sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)) / (math.sqrt(dot(vecs(a), vecs(a))) * math.sqrt(dot(vecs(b), vecs(b))))
    val got = ops.SimilarityOps.qKnnGraph(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // every edge's cosine is the true cosine (graph edges are never stale)
    got.foreach { case (q, _, n, c) =>
      val truth = BigDecimal(cos(q, n)).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(c - truth) < 1e-9, s"($q,$n)")
    }
    // recall@5 against exact 5-NN, corpus mean
    val exact5 = vecs.keys.map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (-cos(q, n), n)).take(5).toSet
    }.toMap
    val byQ = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val hits = exact5.map { case (q, ex) => byQ.getOrElse(q, Set.empty).intersect(ex).size }.sum
    val recall = hits.toDouble / (exact5.size * 5)
    assert(recall >= 0.5, s"mean recall@5 = $recall")
  }

  test("semantic dedup matches driver-side within-cluster pair search") {
    val cent = ops.SimilarityOps.kmeansCentroids(graft.Tables.embeddings(spark, Sf))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val vecs = graft.Tables.embeddings(spark, Sf).select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val assign = vecs.map { case (id, v) =>
      id -> cent.toSeq.map { case (c, cv) =>
        (dot(v, v) - 2 * dot(v, cv) + dot(cv, cv), c)
      }.min._2
    }
    def cos3(a: Array[Double], b: Array[Double]): Double = {
      val c = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      BigDecimal(c).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ids = vecs.keys.toSeq.sorted
    val dropped = (for {
      i <- ids; j <- ids if i < j && assign(i) == assign(j) && cos3(vecs(i), vecs(j)) >= 0.45
    } yield j).toSet
    val expected = assign.groupBy(_._2).map { case (c, m) =>
      val nm = m.size.toLong
      val nd = m.keys.count(dropped).toLong
      c -> (nm, nd, nm - nd)
    }
    val got = ops.SimilarityOps.qSemanticDedup(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == vecs.size)
  }
}
