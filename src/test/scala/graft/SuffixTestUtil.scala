package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared driver referees for the durable-suffix-index specs
  * (SuffixIncrementalSpec, SuffixDeleteSpec): the full set of
  * invariants a valid LINKED suffix index must satisfy over a given
  * corpus, independent of tie order among equal suffixes (append
  * places delta after resident ties; a fresh build orders ties by
  * (doc_id, p) — both are valid SA orders), plus a raw file-digest
  * snapshot for byte-identity assertions.
  */
object SuffixTestUtil {

  /** Referee over the STORED relation: completeness (one row per
    * (doc, position)), SA order, link integrity (every row's
    * prev_sp/prev_doc names its actual store predecessor), every
    * adjacent LCP recomputed from text, null lcp/prev exactly at the
    * first SA position, and (round-16) the stored in-region ordinal
    * invariant — within every sidecar region the data rows' `ord`
    * values are contiguous ascending in sp order, the property that
    * lets warm search/append skip the row_number ranking stage.
    */
  def assertValidIndex(spark: SparkSession, name: String,
                       corpus: Seq[(Long, String)]): Unit = {
    val toks = corpus.map { case (d, t) => d -> t.split(" ", -1) }.toMap
    val rows = ops.KeyedStore.scan(spark, name, "sp", 0L, Long.MaxValue)
      .orderBy(col("sp")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    // completeness: exactly one row per (doc, 1-based token position)
    val want = corpus.flatMap { case (d, t) =>
      t.split(" ", -1).indices.map(i => (d, i + 1L)) }.toSet
    assert(rows.map(r => (r._2, r._3)).toSet == want,
      s"stored (doc,p) cover != corpus cover for $name")
    assert(rows.length == want.size, s"duplicate (doc,p) rows in $name")
    def suf(d: Long, p: Long): Seq[String] = toks(d).drop(p.toInt - 1).toSeq
    def lcp(a: Seq[String], b: Seq[String]): Long =
      a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
    implicit val ord: Ordering[Seq[String]] =
      math.Ordering.Implicits.seqOrdering
    rows.zipWithIndex.foreach { case ((sp, d, p, l, psp, pd), i) =>
      if (i == 0) {
        assert(l == -1L && psp == -1L && pd == -1L,
          s"first row $sp must have null lcp/prev")
      } else {
        val (osp, od, op, _, _, _) = rows(i - 1)
        assert(psp == osp && pd == od,
          s"row $sp links to ($psp,$pd), expected ($osp,$od)")
        assert(ord.lteq(suf(od, op), suf(d, p)),
          s"SA order violated between $osp and $sp")
        assert(l == lcp(suf(od, op), suf(d, p)),
          s"row $sp lcp=$l, referee=${lcp(suf(od, op), suf(d, p))}")
      }
    }
    // stored in-region ordinal invariant: contiguous ascending per
    // sidecar region (bases differ across write generations — build =
    // global rank, rewrites restart at 1 — only contiguity matters)
    val regBounds = ops.KeyedStore.readRegions(spark, name).regions
      .map(r => (r.min.asInstanceOf[Number].longValue(),
        r.max.asInstanceOf[Number].longValue()))
    val ords = ops.KeyedStore.scan(spark, name, "sp", 0L, Long.MaxValue)
      .select(col("sp"), col("ord")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    regBounds.foreach { case (lo, hi) =>
      ords.filter { case (sp, _) => sp >= math.max(0L, lo) && sp <= hi }
        .sliding(2).foreach {
          case Array((_, o1), (sp2, o2)) =>
            assert(o2 == o1 + 1,
              s"in-region ord not contiguous before sp=$sp2: $o1 -> $o2")
          case _ => ()
        }
    }
  }

  /** Digest of every file under the store's location — byte-identity
    * probe for no-op / untouched-region assertions. */
  def fileDigests(spark: SparkSession, name: String): Map[String, Long] = {
    val loc = java.nio.file.Paths.get(
      ops.KeyedStore.location(spark, name).toUri.getPath)
    val out = scala.collection.mutable.Map.empty[String, Long]
    java.nio.file.Files.walk(loc).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val bytes = java.nio.file.Files.readAllBytes(p)
        out(loc.relativize(p).toString) =
          java.util.Arrays.hashCode(bytes).toLong
      }
    }
    out.toMap
  }
}
