package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental maintenance of the durable suffix index
  * (DedupOps.suffixIndexAppend): append a delta doc batch into a
  * stored base structure and end up with a VALID full-corpus suffix
  * index — served statistics identical to a from-scratch build, link
  * columns and adjacent LCPs self-consistent under a driver referee,
  * and regions untouched by the merge byte-identical on disk.
  */
class SuffixIncrementalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def stats3(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("append equals rebuild: ties, before-first, after-last, and " +
       "mid-gap insertions on a multi-region store") {
    val name = "graft_sfx_incr_spec_a"
    try {
      val base = Seq(
        (10L, "bb cc dd ee ff gg"),
        (11L, "cc dd ee xx yy"),
        (12L, "mm nn oo pp qq rr ss"),
        (13L, "tt uu vv ww"),
        (14L, "bb cc dd ee ff gg"))
      val delta = Seq(
        (50L, "bb cc dd ee ff gg"),   // exact duplicate → equal-suffix ties
        (51L, "aa ab bb cc"),         // "aa..." sorts before everything
        (52L, "zz1 zz2 dd ee"),       // "zz..." sorts after everything
        (53L, "nn oo pp zz3"))        // mid-gap, shares a span with 12
      val full = base ++ delta
      // tiny regions so the append actually crosses region boundaries
      ops.DedupOps.suffixIndexBuild(base.toDF("doc_id", "text"), name,
        targetRows = 6).collect()
      ops.DedupOps.suffixIndexAppend(base.toDF("doc_id", "text"),
        delta.toDF("doc_id", "text"), name)
      SuffixTestUtil.assertValidIndex(spark, name, full)
      val served = stats3(ops.DedupOps.suffixIndexServe(
        full.toDF("doc_id", "text"), name))
      val stats = stats3(ops.DedupOps.suffixDedupStats(
        full.toDF("doc_id", "text")))
      assert(served == stats)
      // the serve above must NOT have rebuilt (fingerprint advanced to
      // the full corpus during append)
      val digests = SuffixTestUtil.fileDigests(spark, name)
      stats3(ops.DedupOps.suffixIndexServe(full.toDF("doc_id", "text"), name))
      assert(SuffixTestUtil.fileDigests(spark, name) == digests, "warm serve must not rewrite")
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("untouched regions stay byte-identical on the append path") {
    val name = "graft_sfx_incr_spec_b"
    try {
      // two disjoint vocabularies → disjoint key territories; the delta
      // only touches the 'a' territory, so 'z' regions must not move
      val base = Seq(
        (1L, "aa ab ac ad ae af"),
        (2L, "ab ac ad ag ah"),
        (3L, "za zb zc zd ze zf"),
        (4L, "zb zc zd zg zh"))
      val delta = Seq((9L, "ac ad ae ai"))
      val full = base ++ delta
      ops.DedupOps.suffixIndexBuild(base.toDF("doc_id", "text"), name,
        targetRows = 4).collect()
      val before = SuffixTestUtil.fileDigests(spark, name)
      ops.DedupOps.suffixIndexAppend(base.toDF("doc_id", "text"),
        delta.toDF("doc_id", "text"), name)
      val after = SuffixTestUtil.fileDigests(spark, name)
      val unchanged = before.keySet.intersect(after.keySet)
        .filter(k => before(k) == after(k))
      val regionOf = (k: String) => k.split("/").find(_.startsWith("kr="))
      val unchangedRegions = unchanged.flatMap(regionOf(_))
      val allRegions = before.keySet.flatMap(regionOf(_))
      // at least one whole region's files survived untouched, and at
      // least one region changed (the merge really happened)
      val fullyUntouched = allRegions.filter { kr =>
        val files = before.keySet.filter(k => regionOf(k).contains(kr))
        files.nonEmpty && files.forall(k =>
          after.get(k).contains(before(k)))
      }
      assert(fullyUntouched.nonEmpty,
        s"no region untouched: regions=$allRegions unchanged=$unchangedRegions")
      assert(fullyUntouched.size < allRegions.size, "nothing was written")
      SuffixTestUtil.assertValidIndex(spark, name, full)
      assert(stats3(ops.DedupOps.suffixIndexServe(
          full.toDF("doc_id", "text"), name)) ==
        stats3(ops.DedupOps.suffixDedupStats(full.toDF("doc_id", "text"))))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("append into an empty base equals a fresh build's keys exactly") {
    val name = "graft_sfx_incr_spec_c"
    try {
      val delta = Seq((1L, "q r s"), (2L, "r s t"))
      val none = Seq.empty[(Long, String)]
      ops.DedupOps.suffixIndexBuild(none.toDF("doc_id", "text"), name)
        .collect()
      ops.DedupOps.suffixIndexAppend(none.toDF("doc_id", "text"),
        delta.toDF("doc_id", "text"), name)
      SuffixTestUtil.assertValidIndex(spark, name, delta)
      // empty-base append degenerates to pristine-build key assignment
      val keys = ops.KeyedStore.scan(spark, name, "sp", 0L, Long.MaxValue)
        .orderBy(col("sp")).collect().map(_.getLong(0)).toSeq
      val G = ops.DedupOps.SuffixKeyGap
      assert(keys == (1 to keys.size).map(_ * G))
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }

  test("fixture: the incremental split serves the same stats as a " +
       "from-scratch build of the union") {
    val name = "graft_sfx_incr_spec_d"
    try {
      val docs = graft.Tables.documents(spark, Sf)
        .filter(col("doc_id") % 3 === 0)
      val delta = docs.filter(col("doc_id") % 5 === 0)
      val base = docs.filter(col("doc_id") % 5 =!= 0)
      ops.DedupOps.suffixIndexBuild(base, name).collect()
      ops.DedupOps.suffixIndexAppend(base, delta, name)
      val served = stats3(ops.DedupOps.suffixIndexServe(docs, name))
      val stats = stats3(ops.DedupOps.suffixDedupStats(docs))
      assert(served == stats && served.nonEmpty)
      assert(served.exists(_._3 >= 5), "slice should contain dups")
    } finally ops.DedupOps.suffixIndexDrop(spark, name)
  }
}
