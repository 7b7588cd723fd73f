package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-pipeline stage behavior: shard packing, quota sampling,
  * repetition scoring, and cluster-apply dedup.
  */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("packShards: distributed two-phase prefix sum == global-window form") {
    val docs = graft.Tables.documents(spark, Sf)
    val got = ops.TextOps.packShards(docs, budgetChars = 20000L, bucketSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.select(col("doc_id"), col("n_chars"))
      .withColumn("pfx", sum(col("n_chars")).over(w))
      .selectExpr("doc_id", "(pfx - n_chars) div 20000 as shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref)
  }

  test("packShards: shards are contiguous and stay within budget + one doc") {
    val docs = graft.Tables.documents(spark, Sf)
    val rows = ops.TextOps.packShards(docs, budgetChars = 20000L, bucketSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val maxDoc = rows.map(_._2).max
    val byShard = rows.groupBy(_._3)
    val ids = byShard.keySet
    assert(ids == (0L until ids.size).toSet, "shard ids must be dense from 0")
    byShard.foreach { case (sid, ds) =>
      val tot = ds.map(_._2).sum
      assert(tot < 20000L + maxDoc, s"shard $sid overflows: $tot chars")
    }
    // doc order is preserved: each shard's doc_id range is disjoint & ordered
    val ranges = byShard.toSeq.sortBy(_._1).map { case (_, ds) =>
      (ds.map(_._1).min, ds.map(_._1).max)
    }
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) => assert(aMax < bMin)
      case _ =>
    }
  }

  test("quotaSample: per-lang counts capped at quota, equals window form") {
    val docs = graft.Tables.documents(spark, Sf)
    val got = ops.TextOps.quotaSample(docs, quota = 40)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val perLang = got.groupBy(_._2).view.mapValues(_.size)
    val langTotals = docs.groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    langTotals.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(40L, n),
        s"lang $lang: got ${perLang.getOrElse(lang, 0)} of $n")
    }
    val w = Window.partitionBy("lang").orderBy(col("rscore").desc, col("doc_id"))
    val ref = docs
      .withColumn("rscore", pmod(ops.TextFns.hash60(col("doc_id").cast("string")), lit(1000000L)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 40)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"))).toSet
    assert(got == ref)
  }

  test("repetitionScore: hand-computed ratios on crafted docs") {
    import spark.implicits._
    val docs = Seq((1L, "a a a a"), (2L, "a b c d"), (3L, "x y x y x"))
      .toDF("doc_id", "text")
    val got = ops.TextOps.repetitionScore(docs).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // doc 1: words 4→1 distinct; 2-grams 3→1; 3-grams 2→1
    assert(got(1L) == ((0.75, 0.666667, 0.5)))
    // doc 2: no repetition anywhere
    assert(got(2L) == ((0.0, 0.0, 0.0)))
    // doc 3: words 5→2; 2-grams 4→2 ("x y","y x"); 3-grams 3→2
    assert(got(3L) == ((0.6, 0.5, 0.333333)))
  }

  test("tfidfTopTerms: hand-computed scores and ranks on crafted corpus") {
    import spark.implicits._
    // N=3. "cat" in 1 doc, "dog" in 2, "the" in all 3 (idf 0 → never top)
    val docs = Seq(
      (1L, "the cat cat dog"), (2L, "the dog"), (3L, "the the the"))
      .toDF("doc_id", "text")
    val got = ops.TextOps.tfidfTopTerms(docs, k = 2).collect()
      .map(r => ((r.getLong(0), r.getInt(3)), (r.getString(1), r.getDouble(2)))).toMap
    val ln3 = math.log(3.0)
    val ln15 = math.log(1.5)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((1L, 1)) == (("cat", r6(2 * ln3))))
    assert(got((1L, 2)) == (("dog", r6(ln15))))
    assert(got((2L, 1)) == (("dog", r6(ln15))))
    // doc 2 rank 2 and doc 3 rank 1: "the" with idf ln(1) = 0
    assert(got((2L, 2)) == (("the", 0.0)))
    assert(got((3L, 1)) == (("the", 0.0)))
  }

  test("quantizeEmbeddings: int8 range, extremum hits ±127, exact on a known vector") {
    import spark.implicits._
    val embs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),   // amax 1.0 → q = (64, -127, 32)
      (2L, Array(2.0f, 1.0f, -0.5f)))    // amax 2.0 → q = (127, 64, -32)
      .toDF("vec_id", "embedding")
    val got = ops.SimilarityOps.quantizeEmbeddings(embs).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    assert(got(1L) == ((1.0, -127, 64, -31L)))
    assert(got(2L) == ((2.0, -32, 127, 159L)))
    // fixture-wide invariants: every vector's extremum quantizes to ±127
    val fix = ops.SimilarityOps.qEmbedQuantize(spark, Sf).collect()
    assert(fix.nonEmpty)
    fix.foreach { r =>
      val (qmin, qmax) = (r.getInt(2), r.getInt(3))
      assert(qmin >= -127 && qmax <= 127)
      assert(qmax == 127 || qmin == -127)
    }
  }

  test("kmeansTwoRound: bit-exact vs a driver-side reference implementation") {
    val vecs = graft.Tables.embeddings(spark, Sf)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def md5hex(s: String) = ops.TextFns.md5Hex(s)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def fold2(v: Array[Double], c: Array[Double]) = {
      val nv = v.foldLeft(0.0)((a, x) => a + x * x)
      val nc = c.foldLeft(0.0)((a, x) => a + x * x)
      val dot = v.zip(c).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      nv - 2 * dot + nc
    }
    def assign(cents: Seq[(Long, Array[Double])]) = vecs.map { case (id, v) =>
      val best = cents.map { case (cid, cv) => (fold2(v, cv), cid) }.min
      (id, best._2, v)
    }
    val seeds = vecs.sortBy { case (id, _) => md5hex(id.toString) }.take(8)
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }.toSeq
    val a1 = assign(seeds)
    val cent1 = a1.groupBy(_._2).map { case (cid, members) =>
      val n = members.length
      val cm = Array.tabulate(64) { j =>
        val s = members.map(m =>
          BigDecimal(m._3(j) * 1000000.0).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
        math.floor(s / n.toDouble + 0.5).toLong
      }
      (cid, cm.map(_ / 1000000.0), r6(cm.map(c => c * c).sum / 1e12))
    }.toSeq
    val a2 = assign(cent1.map(c => (c._1, c._2)))
    val expected = a2.groupBy(_._2).map { case (cid, ms) =>
      (cid, (ms.length.toLong, cent1.find(_._1 == cid).get._3))
    }
    val got = ops.SimilarityOps.qKmeans(spark, Sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == vecs.length)
  }

  test("dedupApply: keeps min-id member per cluster, all singletons") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", 10L), (2L, "en", 11L), (3L, "en", 12L),
      (4L, "de", 13L), (5L, "de", 14L), (6L, "de", 15L))
      .toDF("doc_id", "lang", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val kept = ops.DedupOps.dedupApply(docs, pairs).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 4L, 5L))
  }
}
