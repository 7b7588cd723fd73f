package graft

import graft.ops.MultimodalOps.FakeDecode
import org.scalatest.funsuite.AnyFunSuite

/** Binary-column plumbing: deterministic stub decode, feature schema, and
  * full-table coverage of the mapPartitions path.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("FakeDecode is deterministic and shape-correct") {
    val bytes = "hello world, a fake image payload".getBytes("UTF-8")
    val px1 = FakeDecode.decode(bytes)
    val px2 = FakeDecode.decode(bytes)
    assert(px1.map(_.toSeq).toSeq == px2.map(_.toSeq).toSeq)
    assert(px1.length == 16 && px1.forall(_.length == 16))
    val feats = FakeDecode.quadrantMeans(px1)
    assert(feats.length == 4)
    assert(feats.forall(f => f >= 0 && f <= 255))
    // short payloads zero-pad
    assert(FakeDecode.decode(Array.emptyByteArray).flatten.forall(_ == 0))
  }

  test("fixture text is pure ASCII — the byte-based oracle contract") {
    // The image/audio DuckDB twins index CHARACTERS over byte lengths
    // while the Spark side operates on UTF-8 bytes (encode()); they only
    // agree when text is pure ASCII. Pin that fixture invariant at both
    // gate SFs so a fixture change fails here, not as an opaque oracle
    // hash mismatch (length == octet_length iff every char is 1 byte).
    Seq(Sf, "/root/testdata/sf0.01").foreach { d =>
      val nonAscii = graft.Tables.documents(spark, d)
        .filter(org.apache.spark.sql.functions.expr(
          "length(text) != octet_length(text)")).count()
      assert(nonAscii == 0, s"$d has $nonAscii non-ASCII documents")
    }
  }

  test("qImageFeatures covers every document with features and frame samples") {
    val df = ops.MultimodalOps.qImageFeatures(spark, Sf)
    val n = graft.Tables.documents(spark, Sf).count()
    assert(df.count() == n)
    // every output column is a driver-hashable scalar (no arrays)
    assert(df.schema.fields.forall(f =>
      !f.dataType.typeName.startsWith("array")))
    val row = df.head()
    assert(row.getInt(1) == 16 && row.getInt(2) == 16)
    (4 to 7).foreach(i => assert(row.getDouble(i) >= 0 && row.getDouble(i) <= 255))
    assert(row.getInt(12) > 0)                       // sampled frame count
    assert(row.getString(13).matches("[0-9a-f]{32}")) // frame-mean digest
  }

  test("resize and frame-sample stubs behave deterministically") {
    val px = FakeDecode.decode(("x" * 300).getBytes("UTF-8"))
    val half = FakeDecode.resizeHalf(px)
    assert(half.length == 8 && half.forall(_.length == 8))
    assert(half(0)(0) == 'x'.toInt) // uniform payload -> uniform downsample
    val frames = FakeDecode.sampleFrames(("ab" * 200).getBytes("UTF-8"), 2)
    assert(frames.length == 4) // 400 bytes = 7 frames (6 full + remainder), every 2nd
  }

  test("image phash pairs equal a driver-side brute force (banding loses " +
       "nothing at hamming <= 3); constant image hashes to 0") {
    def ahash(bytes: Array[Byte]): Long = {
      val rz = FakeDecode.resizeHalf(FakeDecode.decode(bytes))
      var s = 0L
      rz.foreach(_.foreach(s += _))
      var h = 0L; var j = 0
      for (r <- rz.indices; c <- rz.indices) {
        if (rz(r)(c).toLong * 64 > s) h |= (1L << j)
        j += 1
      }
      h
    }
    // Constant payload: every cell equals the mean, no strict >, hash 0.
    assert(ahash(Array.fill[Byte](256)(65)) == 0L)
    val hs = graft.Tables.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> ahash(r.getString(1).getBytes("UTF-8")))
      .sortBy(_._1)
    val truth = (for {
      i <- hs.indices; k <- (i + 1) until hs.length
      ham = java.lang.Long.bitCount(hs(i)._2 ^ hs(k)._2)
      if ham <= 3
    } yield (hs(i)._1, hs(k)._1, ham.toLong)).toSet
    val got = graft.ops.MultimodalOps.qImagePhash(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth,
      s"missing=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
    assert(truth.nonEmpty, "fixture should contain near-dup images")

    // Band count derives from the threshold: at maxHamming=5 the join
    // runs 6 bands and recall stays complete (the old fixed-4-band
    // layout silently lost pairs with hamming in [4,5]).
    val truth5 = (for {
      i <- hs.indices; k <- (i + 1) until hs.length
      ham = java.lang.Long.bitCount(hs(i)._2 ^ hs(k)._2)
      if ham <= 5
    } yield (hs(i)._1, hs(k)._1, ham.toLong)).toSet
    val got5 = graft.ops.MultimodalOps
      .imagePhashPairs(graft.Tables.documents(spark, Sf), maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got5 == truth5,
      s"missing=${(truth5 -- got5).take(3)} extra=${(got5 -- truth5).take(3)}")
    assert(truth5.size > truth.size, "fixture should have pairs in hamming (3,5]")
    intercept[IllegalArgumentException] {
      graft.ops.MultimodalOps.imagePhashPairs(
        graft.Tables.documents(spark, Sf), maxHamming = 64)
    }
  }

  test("qMultimodalMeta digests match driver-side md5") {
    val row = ops.MultimodalOps.qMultimodalMeta(spark, Sf).head()
    val doc = graft.Tables.documents(spark, Sf)
      .filter(s"doc_id = ${row.getLong(0)}").head().getAs[String]("text")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(doc.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getAs[String]("blob_md5") == md)
    assert(row.getAs[Int]("n_bytes") == doc.getBytes("UTF-8").length)
  }
}
