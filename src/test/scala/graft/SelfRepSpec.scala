package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Within-document repetition removal (DedupOps.selfRepApply): exact
  * keep-first semantics on constructed texts, conservation on every
  * row, and cross-op consistency with the cross-doc apply.
  */
class SelfRepSpec extends AnyFunSuite {
  import TestSpark._

  test("keep-first span removal: exact islands on constructed texts") {
    import spark.implicits._
    val b = "B" * 40
    val docs = Seq(
      // B appears twice with distinct surroundings: second copy removed.
      (1L, "aleading-x" + b + "ymiddle-zz" + b + "wtrailing-"),
      // no 40-char self-repeat: untouched
      (2L, "completely unique text with no repeated spans at all here!"),
      // pathological run: 100 As survive as the single uncovered first char
      (3L, "A" * 100),
      // three copies: second AND third removed (both islands may merge
      // if adjacent — here separated by distinct 10-char gaps)
      (4L, "0123456789" + b + "abcdefghij" + b + "qrstuvwxyz" + b + "ZY")
    ).toDF("doc_id", "text")
    val out = ops.DedupOps.selfRepApply(docs).orderBy(col("doc_id")).collect()

    // doc 1: one island of exactly the second B copy
    assert(out(0).getLong(2) == 1 && out(0).getLong(3) == 40)
    // survivor = text with the second B spliced out
    val survive1 = "aleading-x" + b + "ymiddle-zz" + "wtrailing-"
    assert(out(0).getInt(4) == survive1.length)
    assert(out(0).getString(5) == ops.TextFns.md5Hex(survive1))

    // doc 2 untouched
    assert(out(1).getLong(2) == 0 && out(1).getLong(3) == 0)

    // doc 3: positions 2..100 become one island; survivor = "A"
    assert(out(2).getLong(2) == 1 && out(2).getLong(3) == 99)
    assert(out(2).getInt(4) == 1)
    assert(out(2).getString(5) == ops.TextFns.md5Hex("A"))

    // doc 4: copies 2 and 3 removed as two islands (distinct gaps)
    assert(out(3).getLong(2) == 2 && out(3).getLong(3) == 80)
    val survive4 = "0123456789" + b + "abcdefghij" + "qrstuvwxyz" + "ZY"
    assert(out(3).getString(5) == ops.TextFns.md5Hex(survive4))

    // conservation everywhere
    out.foreach(r => assert(r.getLong(3) + r.getInt(4) == r.getInt(1)))
  }

  test("fixture: conservation holds and in-doc repeats exist beyond " +
       "what cross-doc dedup sees") {
    val self = ops.DedupOps.qSelfrepApply(spark, Sf).collect()
    assert(self.length ==
      graft.Tables.documents(spark, Sf).count())
    self.foreach(r => assert(r.getLong(3) + r.getInt(4) == r.getInt(1)))
    // the op is non-vacuous on the fixture
    assert(self.exists(_.getLong(3) > 0), "fixture has no self-repeats")
  }
}
