package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Suffix-array substring-duplication statistics
  * (DedupOps.suffixDedupStats): exact known answers on constructed
  * corpora, a driver-side brute-force referee on the fixture, and
  * consistency with the fixed-window family.
  */
class SuffixDedupSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("exact longest shared token spans on a constructed corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),          // shares "c d e f" with 2
      (2L, "x y c d e f z"),            // and "x y" nowhere else
      (3L, "q r s"),                    // nothing shared
      (4L, "a b c d e f g h"),          // full duplicate of 1
      (5L, "h g f e d c b a")           // reversed: only 1-token overlaps
    ).toDF("doc_id", "text")
    val got = rows(ops.DedupOps.suffixDedupStats(docs, rounds = 4))
    assert(got(1L) == ((8L, 8L)))   // whole doc duplicated by 4
    assert(got(4L) == ((8L, 8L)))
    assert(got(2L) == ((7L, 4L)))   // "c d e f"
    assert(got(3L) == ((3L, 0L)))   // no token shared with any doc
    assert(got(5L) == ((8L, 1L)))   // single tokens appear elsewhere
  }

  test("fixture agrees with a driver-side sorted-suffix referee, and " +
       "window-family consistency holds") {
    val got = rows(ops.DedupOps.qSuffixDedup(spark, Sf))
    // Independent plain-Scala implementation: sort all suffix token
    // tuples, take adjacent doc-crossing pairs, credit LCP both sides.
    val docs = graft.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    implicit val ord: Ordering[Seq[String]] = Ordering.Implicits.seqOrdering
    val sufs = docs.toSeq.flatMap { case (d, w) =>
      w.indices.map(i => (w.drop(i).toSeq, d))
    }.sortBy(_._1)
    val best = scala.collection.mutable.Map.empty[Long, Long]
    sufs.zip(sufs.tail).foreach { case ((sa, da), (sb, db)) =>
      if (da != db) {
        val l = sa.zip(sb).takeWhile { case (x, y) => x == y }.size.toLong
        best(da) = math.max(best.getOrElse(da, 0L), l)
        best(db) = math.max(best.getOrElse(db, 0L), l)
      }
    }
    docs.keys.foreach { d =>
      assert(got(d)._2 == best.getOrElse(d, 0L), s"doc $d")
    }
    // Window-family consistency: a doc has a cross-doc duplicated
    // 40-char window (stride-1 exact apply removed something) ⇒ its
    // longest duplicated TOKEN span must cover ≥ that window's tokens
    // minus boundary partials — pin the weaker, always-true direction:
    // every doc the exact apply touched must have a nonzero span here.
    val touched = ops.DedupOps.qSubstrApplyExact(spark, Sf).collect()
      .filter(_.getLong(3) > 0).map(_.getLong(0)).toSet
    touched.foreach { d =>
      assert(got(d)._2 > 0, s"doc $d has a duplicated window but no span")
    }
    assert(got.values.exists(_._2 >= 20),
      "fixture should contain planted long duplicated spans")
  }
}
