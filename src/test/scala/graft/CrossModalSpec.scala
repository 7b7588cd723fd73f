package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-modal retrieval: stub towers, integer alignment heads, and the
  * cosine top-k — pinned against a full driver-side recompute on a
  * constructed corpus plus shape/determinism checks on the fixture.
  */
class CrossModalSpec extends AnyFunSuite {
  import TestSpark._
  import graft.ops.MultimodalOps

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(graft.ops.TextFns.md5Hex(s).take(15), 16)

  /** Independent driver-side twin of the whole retrieval path. */
  private def expectedTopK(docs: Seq[(Long, String)], k: Int)
      : Seq[(Long, Int, Long, BigDecimal)] = {
    val hI = Array.tabulate(8, 8)((j, d) => hash60(s"cmI:$j:$d") % 17 - 8)
    val hT = Array.tabulate(8, 8)((j, d) => hash60(s"cmT:$j:$d") % 17 - 8)
    def proj(v: Array[Long], h: Array[Array[Long]]): Array[Long] =
      Array.tabulate(8)(d => (0 until 8).map(j => v(j) * h(j)(d)).sum)
    val img = docs.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8").map(_ & 0xff)
      val iv = Array.tabulate(8) { j =>
        (j * 32 until (j + 1) * 32)
          .map(i => if (i < bytes.length) bytes(i).toLong else 0L).sum
      }
      val y = proj(iv, hI)
      val n2 = y.map(x => x * x).sum
      if (n2 > 0) Some((id, y, n2)) else None
    }
    val txt = docs.flatMap { case (id, text) =>
      val tv = Array.fill(8)(0L)
      text.split(" ").foreach(w => tv((hash60(s"fh:$w") % 8).toInt) += 1)
      val y = proj(tv, hT)
      val n2 = y.map(x => x * x).sum
      if (n2 > 0) Some((id, y, n2)) else None
    }
    txt.flatMap { case (q, qy, qn2) =>
      img.map { case (i, y, n2) =>
        val dp = (0 until 8).map(d => qy(d) * y(d)).sum
        val c = dp.toDouble / (math.sqrt(qn2.toDouble) * math.sqrt(n2.toDouble))
        (q, i, c)
      }.sortBy { case (_, i, c) => (-c, i) }
        .take(k).zipWithIndex.map { case ((_, i, c), r) =>
          (q, r + 1, i,
            BigDecimal(c).setScale(3, BigDecimal.RoundingMode.HALF_UP))
        }
    }.sortBy(t => (t._1, t._2))
  }

  test("cross-modal top-k matches a full driver-side recompute") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "sphinx of black quartz judge my vow"),
      (5L, "how vexingly quick daft zebras jump"),
      (6L, "a" * 300), // long payload: every band saturated
      (7L, "short"))   // < 32 bytes: only band 0 nonzero
    val df = MultimodalOps.crossModalRetrieval(
      docs.toDF("doc_id", "text"), k = 3, queryMod = 1, queryRes = 0)
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      BigDecimal(r.getDouble(3)).setScale(3, BigDecimal.RoundingMode.HALF_UP)))
      .toSeq
    assert(got == expectedTopK(docs, 3))
  }

  test("zero-norm docs drop from the side that is zero, not both") {
    import spark.implicits._
    // Empty text: image tower all-zero (no bytes) -> excluded as image;
    // its single empty token still lands a text-tower bucket count, so it
    // MAY stay a query (head-dependent). Non-empty docs appear as images.
    val docs = Seq((3L, ""), (10L, "alpha beta gamma"), (20L, "delta"))
    val df = MultimodalOps.crossModalRetrieval(
      docs.toDF("doc_id", "text"), k = 5, queryMod = 1, queryRes = 0)
    val imgs = df.select("img_doc").distinct().as[Long].collect().toSet
    assert(!imgs.contains(3L))
    assert(imgs == Set(10L, 20L))
  }

  test("fixture retrieval: every query gets exactly k ranked rows, deterministically") {
    val df = MultimodalOps.qCrossmodalRetrieval(spark, Sf)
    val rows = df.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5))
    }
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0005))
    // query slice honored
    assert(byQ.keys.forall(_ % 200 == 3))
    val again = MultimodalOps.qCrossmodalRetrieval(spark, Sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
