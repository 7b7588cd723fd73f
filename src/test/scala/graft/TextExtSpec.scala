package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + brute-force-parity tests for the text-pipeline extensions
  * (vocabulary coverage, winnowing fingerprints, n-gram novelty, dataset
  * card). All four are hash-exact against DuckDB oracles via the driver
  * gate; these pin the scheme guarantees the row compare can't see.
  */
class TextExtSpec extends AnyFunSuite {
  import TestSpark._

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(ops.TextFns.md5Hex(s).substring(0, 15), 16)

  test("vocab coverage: token mass conserved, oov bounded") {
    val rows = ops.TextOps.qVocabCoverage(spark, Sf).collect()
    val total = graft.Tables.documents(spark, Sf)
      .agg(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 1000000L / r.getLong(1))
    }
  }

  test("winnowing: exact parity with a driver brute force; gap guarantee") {
    val w = 4
    val got = ops.TextOps.qWinnowFingerprint(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toList)
      .toMap
    val docs = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      if (toks.length >= 6) {
        val hs = (0 to toks.length - 3)
          .map(i => hash60(toks.slice(i, i + 3).mkString(" ")))
        val sel = (0 to hs.length - w).map { p =>
          val win = (p until p + w).map(i => (hs(i), (i + 1).toLong))
          win.min // leftmost min on (h, pos)
        }.map { case (h, pos) => (pos, h) }.distinct.sorted.toList
        assert(got.getOrElse(id, Nil) == sel, s"doc $id")
        // Winnowing guarantee: successive fingerprint positions ≤ w apart.
        sel.map(_._1).sliding(2).foreach {
          case List(a, b) => assert(b - a <= w)
          case _          =>
        }
      } else assert(!got.contains(id), s"short doc $id must be excluded")
    }
  }

  test("novelty: unique-gram counts match a driver recount") {
    val got = ops.TextOps.qNgramNovelty(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = graft.Tables.documents(spark, Sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val grams = docs.map { case (id, text) =>
      val t = text.split(" ", -1)
      id -> (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
    }.toMap
    val dfreq = grams.values.flatten.groupBy(identity).view.mapValues(_.size)
    grams.foreach { case (id, gs) =>
      if (gs.nonEmpty) {
        val uniq = gs.count(g => dfreq(g) == 1).toLong
        assert(got(id) == ((gs.size.toLong, uniq)), s"doc $id")
      } else assert(!got.contains(id))
    }
  }

  test("dataset card: totals conserve; top_lang is the modal language") {
    val rows = ops.TextOps.qDatasetCard(spark, Sf).collect()
    val docs = graft.Tables.documents(spark, Sf)
      .select(col("source"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_.getLong(1)).sum == docs.length)
    rows.foreach { r =>
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src)
      assert(r.getLong(1) == mine.length)
      assert(r.getLong(2) == mine.map(_._3).sum)
      assert(r.getLong(3) == mine.map(_._3).sum / mine.length)
      val byLang = mine.groupBy(_._2).view.mapValues(_.size).toMap
      assert(r.getLong(4) == byLang.size)
      val top = byLang.toSeq.minBy { case (l, n) => (-n, l) }._1
      assert(r.getString(5) == top)
    }
  }
}
