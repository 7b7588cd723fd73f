package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Suffix-array exact-span removal (DedupOps.suffixDedupApply): exact
  * hand-computed splices on constructed corpora, the per-doc
  * consistency law with suffixDedupStats (a doc is touched iff its max
  * cross-doc span reaches the threshold — both sides compute the same
  * per-suffix max, one aggregated, one spliced), and agreement with the
  * fixed-window exact apply on spans that clear both thresholds.
  */
class SuffixApplySpec extends AnyFunSuite {
  import TestSpark._

  private def byDoc(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(2), r.getLong(3), r.getInt(4))).toMap // islands, removed, surviving

  test("exact splice on a constructed corpus (full dup, partial span, untouched)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j"),     // full duplicate of 4
      (2L, "z z2 c d e f g h z3"),     // shares 6-token span with 1/4
      (3L, "m n o p q"),               // unique
      (4L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    val got = byDoc(ops.DedupOps.suffixDedupApply(docs, minTok = 5))
    // full duplicates: every suffix is shared → whole text removed
    assert(got(1L) == ((1L, 19L, 0)))
    assert(got(4L) == ((1L, 19L, 0)))
    // doc 2: token span [3,8] = "c d e f g h" = chars [6,16] (11 chars)
    assert(got(2L) == ((1L, 11L, 8)))
    assert(got(3L) == ((0L, 0L, 9))) // "m n o p q" = 9 chars, untouched
    // conservation on every row
    ops.DedupOps.suffixDedupApply(docs, minTok = 5).collect().foreach { r =>
      assert(r.getLong(3) + r.getInt(4) == r.getInt(1))
    }
  }

  test("a doc is touched iff suffixDedupStats reaches the threshold " +
       "(same per-suffix max, aggregated vs spliced) — fixture slice") {
    // %5==0 verified to contain 3 same-residue cross-doc 5-token-span
    // pairs at sf0.001 (DuckDB 5-gram probe) — %7==0 has none.
    val slice = graft.Tables.documents(spark, Sf)
      .filter(col("doc_id") % 5 === 0)
    val applied = byDoc(ops.DedupOps.suffixDedupApply(slice, minTok = 5))
    val stats = ops.DedupOps.suffixDedupStats(slice).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(applied.keySet == stats.keySet)
    stats.foreach { case (d, mx) =>
      assert((applied(d)._2 > 0) == (mx >= 5),
        s"doc $d: removed=${applied(d)._2} but max_dup_tokens=$mx")
    }
    assert(applied.values.exists(_._2 > 0), "slice should contain dups")
    assert(applied.values.exists(_._2 == 0), "slice should contain uniques")
  }

  test("driver-side per-suffix referee on a constructed skewed corpus, " +
       "and de-skewed path equality") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hot hot hot hot hot a b hot hot hot hot hot"),
      (2L, "x hot hot hot hot hot y"),
      (3L, "a b hot q r s t u v w"),
      (4L, "p1 p2 p3 p4 p5 p6 p7")
    ).toDF("doc_id", "text")
    // referee: brute-force per-suffix max cross-doc LCP → intervals →
    // merged char islands (tiny corpus, quadratic is fine)
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val toks = texts.map { case (d, t) => d -> t.split(" ", -1) }
    def lcp(a: Array[String], i: Int, b: Array[String], j: Int): Int = {
      var k = 0
      while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
      k
    }
    val minTok = 3
    val expected = toks.map { case (d, w) =>
      val spans = w.indices.flatMap { p =>
        val best = toks.filter(_._1 != d).values
          .flatMap(o => o.indices.map(q => lcp(w, p, o, q)))
          .foldLeft(0)(math.max)
        if (best >= minTok) Some((p, p + best - 1)) else None
      }
      // token → char intervals, then island-merge
      val starts = w.scanLeft(1)((acc, t) => acc + t.length + 1)
      val chars = spans.map { case (s, e) =>
        (starts(s), starts(e) + w(e).length - 1) }.sortBy(identity)
      val merged = chars.foldLeft(List.empty[(Int, Int)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: rest if s <= pe =>
            (ps, math.max(pe, e)) :: rest
          case _ => (s, e) :: acc
        }
      }.reverse
      d -> merged.map { case (s, e) => e - s + 1 }.sum.toLong
    }
    val gotWin = byDoc(ops.DedupOps.suffixDedupApply(docs, minTok = minTok))
    expected.foreach { case (d, rem) =>
      assert(gotWin(d)._2 == rem, s"doc $d: got ${gotWin(d)._2}, want $rem")
    }
    // the skewed 'hot' token trips nothing at default threshold; force
    // the de-skewed rank path and pin result equality
    val gotDsk = byDoc(ops.DedupOps.suffixDedupApply(docs, minTok = minTok,
      deskewAbove = 0L))
    assert(gotDsk == gotWin)
  }

  test("store-served apply equals the inline path: cold build, warm " +
       "serve, and staleness rebuild") {
    import spark.implicits._
    val name = "graft_sfx_apply_spec_a"
    try {
      val docs = Seq(
        (1L, "a b c d e f g h i j"),
        (2L, "z z2 c d e f g h z3"),
        (3L, "m n o p q"),
        (4L, "a b c d e f g h i j")
      ).toDF("doc_id", "text")
      val inline = byDoc(ops.DedupOps.suffixDedupApply(docs, minTok = 5))
      // cold: no store → build-and-persist, then splice from the store
      val cold = byDoc(ops.DedupOps.suffixDedupApplyServed(docs, name,
        minTok = 5))
      assert(cold == inline)
      // warm: fingerprint matches → pure store read, identical rows
      val warm = byDoc(ops.DedupOps.suffixDedupApplyServed(docs, name,
        minTok = 5))
      assert(warm == inline)
      // stale: a different corpus under the same name must rebuild,
      // never splice corpus A's spans into corpus B's text
      val docs2 = Seq(
        (1L, "q w e r t y u i o p"),
        (2L, "a a q w e r t y b b")
      ).toDF("doc_id", "text")
      val served2 = byDoc(ops.DedupOps.suffixDedupApplyServed(docs2, name,
        minTok = 5))
      assert(served2 == byDoc(ops.DedupOps.suffixDedupApply(docs2,
        minTok = 5)))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("store-served apply equals the inline path on the fixture slice") {
    val name = "graft_sfx_apply_spec_b"
    try {
      val slice = graft.Tables.documents(spark, Sf)
        .filter(col("doc_id") % 5 === 0)
      val served = byDoc(ops.DedupOps.suffixDedupApplyServed(slice, name,
        minTok = 5))
      val inline = byDoc(ops.DedupOps.suffixDedupApply(slice, minTok = 5))
      assert(served == inline && served.values.exists(_._2 > 0))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("agreement with the fixed-window exact apply when a span clears " +
       "both thresholds") {
    import spark.implicits._
    // one shared span of 9 tokens / 53 chars ≥ both 40 chars and 5 tokens;
    // distinct boundary chars so neither island can extend
    val span = "alpha beta gamma delta epsil zeta etaeta theta iotas"
    val docs = Seq(
      (1L, s"AA $span BB tail one two"),
      (2L, s"CC other lead $span DD"),
      (3L, "nothing shared in this one at all")
    ).toDF("doc_id", "text")
    val suf = byDoc(ops.DedupOps.suffixDedupApply(docs, minTok = 5))
    val win = byDoc(ops.DedupOps.substrDedupApply(docs, win = 40, stride = 1))
    // both touch exactly docs 1 and 2
    assert(suf(1L)._2 > 0 && suf(2L)._2 > 0 && suf(3L)._2 == 0)
    assert(win(1L)._2 > 0 && win(2L)._2 > 0 && win(3L)._2 == 0)
    // the token-level removal covers AT LEAST the shared span; the char
    // windows can also eat the shared boundary spaces, never more than
    // 2 chars beyond the token span
    assert(suf(1L)._2 == span.length && suf(2L)._2 == span.length)
    assert(win(1L)._2 >= span.length && win(1L)._2 <= span.length + 2)
  }
}
