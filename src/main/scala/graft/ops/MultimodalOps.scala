package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary media payload row (codegen needs a public top-level class). */
case class Blob(doc_id: Long, payload: Array[Byte])

/** Multimodal-column plumbing: media as opaque `BINARY` columns with typed
  * metadata, processed partition-parallel. The container ships no
  * image/audio codecs, so the *decode* step is a clearly-marked
  * deterministic stub ([[FakeDecode]]); everything Spark-side — binary
  * encoding, schema, partitioning, per-partition batch iteration, feature
  * schema — is real and tested (MultimodalSpec).
  */
object MultimodalOps {
  import graft.Tables._

  /** Metadata pass over binary payloads: byte length + content digests.
    * Oracle-checked (md5 over UTF-8 bytes is engine-independent).
    */
  def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("blob", encode(col("text"), "UTF-8")) // the opaque media column
      .select(
        col("doc_id"),
        length(col("blob")).as("n_bytes"),
        md5(col("blob")).as("blob_md5"),
        md5(substring(col("text"), 1, 64)).as("head_md5"))
      .orderBy(col("doc_id"))

  /** STUB — deterministic fake media decoder. A real pipeline would call
    * an image/audio library here (not installed in this environment); the
    * fake treats the first 256 payload bytes as a 16×16 grayscale "image"
    * and extracts quadrant-mean features. Deterministic in the payload, so
    * tests are stable.
    */
  object FakeDecode {
    val Side = 16
    def decode(bytes: Array[Byte]): Array[Array[Int]] = {
      val px = Array.ofDim[Int](Side, Side)
      var i = 0
      while (i < Side * Side) {
        px(i / Side)(i % Side) = if (i < bytes.length) bytes(i) & 0xff else 0
        i += 1
      }
      px
    }
    def quadrantMeans(px: Array[Array[Int]]): Array[Double] = {
      val h = Side / 2
      (for (qr <- 0 until 2; qc <- 0 until 2) yield {
        var s = 0L
        for (r <- qr * h until (qr + 1) * h; c <- qc * h until (qc + 1) * h) s += px(r)(c)
        s.toDouble / (h * h)
      }).toArray
    }
    /** 2× box-filter downsample (the resize step of a real image op). */
    def resizeHalf(px: Array[Array[Int]]): Array[Array[Int]] = {
      val half = px.length / 2
      Array.tabulate(half, half) { (r, c) =>
        (px(2 * r)(2 * c) + px(2 * r)(2 * c + 1) +
          px(2 * r + 1)(2 * c) + px(2 * r + 1)(2 * c + 1)) / 4
      }
    }
    /** Frame sampling for a fake "video": the payload split into 64-byte
      * frames, keeping every `stride`-th frame's mean byte value.
      */
    def sampleFrames(bytes: Array[Byte], stride: Int): Array[Double] =
      bytes.grouped(64).zipWithIndex.collect {
        case (frame, i) if i % stride == 0 && frame.nonEmpty =>
          frame.map(_ & 0xff).sum.toDouble / frame.length
      }.toArray
  }

  /** Feature extraction over the binary column via `mapPartitions` — the
    * per-partition batch shape a real decoder needs (amortize model/codec
    * init per partition, stream rows). Output is all scalar columns
    * (quadrant/resized means + an md5 digest of the frame-mean list) so
    * the driver's pandas compare can sort/hash every column.
    *
    * Oracle-checked byte-for-byte (PipelineOracles): fixture text is pure
    * ASCII, so the DuckDB twin reads payload bytes as codepoints. The two
    * float surfaces are safe by construction: quadrant means are integer
    * sums / 64.0 (power of two — exact in IEEE double on both engines,
    * and r6's rint is a no-op on s*15625), and the %.6f frame-mean
    * formatting cannot hit a decimal tie — a tie at 1e-7 requires the
    * double to equal odd/2^7 exactly, but a correctly-rounded s/len
    * (integer s ≤ 16320, len ≤ 64) differs from any odd/128 by at least
    * 1/(128·64) ≫ ulp, so Java's HALF_UP and C printf's half-even agree
    * on every value.
    */
  def qImageFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Blob]
      .mapPartitions { it =>
        // Per-partition init goes here (codec/model handle) — one
        // MessageDigest per partition, reset per row.
        val md = java.security.MessageDigest.getInstance("MD5")
        def r6(x: Double): Double = math.rint(x * 1e6) / 1e6
        it.map { b =>
          val px = FakeDecode.decode(b.payload)
          val q = FakeDecode.quadrantMeans(px).map(r6)
          val rz = FakeDecode.resizeHalf(px).flatten.take(4)
          val frames = FakeDecode.sampleFrames(b.payload, stride = 2)
          md.reset()
          // Locale.ROOT: executor JVMs with e.g. a comma-decimal default
          // locale must not change the digest.
          val framesMd5 = md.digest(frames
            .map(f => String.format(java.util.Locale.ROOT, "%.6f", Double.box(f)))
            .mkString(",").getBytes("UTF-8")).map("%02x".format(_)).mkString
          (b.doc_id, FakeDecode.Side, FakeDecode.Side, b.payload.length,
            q(0), q(1), q(2), q(3), rz(0), rz(1), rz(2), rz(3),
            frames.length, framesMd5)
        }
      }
      .toDF("doc_id", "width", "height", "n_bytes",
            "q1_mean", "q2_mean", "q3_mean", "q4_mean",
            "rz1", "rz2", "rz3", "rz4", "n_frames", "frames_md5")
      .orderBy(col("doc_id"))
  }

  /** Perceptual-hash image near-dup — the aHash scheme (average hash,
    * the classic of the pHash family): decode → 8×8 box-downsample →
    * threshold each cell against the image mean → 64-bit fingerprint;
    * near-duplicates are fingerprint pairs within `maxHamming`. The
    * threshold is the EXACT integer comparison `cell·64 > total` (no
    * division, no float), so the bit pattern is engine-reproducible.
    *
    * Shape: decode+hash runs per partition via `mapPartitions` (the
    * codec-init batch shape, [[qImageFeatures]]); everything after is
    * declarative — candidates from a `(maxHamming+1)`-band self-equi-
    * join over the 64 hash bits (pigeonhole: hamming ≤ maxHamming ⇒
    * at least one of maxHamming+1 bands equal, so recall is COMPLETE
    * at the requested threshold for ANY maxHamming < 64 — the band
    * count is DERIVED from the threshold, [[DedupOps.simhashPairs]]'
    * scheme), verified by one codegen'd `bit_count(xor)`. Never
    * all-pairs; at 100 TB a hot band key (e.g. the all-zero hash of
    * blank images) follows the df-cap discipline of the LSH paths —
    * cap or quarantine the bucket, the blank-image class is a dedup
    * cluster by itself.
    */
  def imagePhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    import docs.sparkSession.implicits._
    import graft.GraftCache.GraftCachedOps
    // Hash relation cached: both sides of the band self-join reference
    // it (un-persisted, the decode pipeline runs twice).
    val hashes = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Blob]
      .mapPartitions { it =>
        it.map { b =>
          val rz = FakeDecode.resizeHalf(FakeDecode.decode(b.payload))
          var s = 0L
          rz.foreach(_.foreach(s += _))
          var h = 0L
          var j = 0
          var r = 0
          while (r < rz.length) {
            var c = 0
            while (c < rz.length) {
              if (rz(r)(c).toLong * 64 > s) h |= (1L << j)
              j += 1; c += 1
            }
            r += 1
          }
          (b.doc_id, h)
        }
      }
      .toDF("doc_id", "ahash")
      .graftCached
    // Band layout derived from the threshold: maxHamming+1 contiguous
    // bit ranges partitioning the 64 bits (widths differ by ≤1 bit when
    // 64 doesn't divide evenly) — the pigeonhole completeness guarantee
    // then TRACKS maxHamming instead of silently capping at 3.
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val nBands = maxHamming + 1
    val bounds = (0 to nBands).map(i => i * 64 / nBands)
    val bandCols = (0 until nBands).map { i =>
      val lo = bounds(i)
      val w  = bounds(i + 1) - lo
      val mask = if (w == 64) -1L else (1L << w) - 1L
      struct(lit(i).as("band"),
        expr(s"shiftrightunsigned(ahash, $lo) & ${mask}L").as("key"))
    }
    val banded = hashes.select(col("doc_id"), col("ahash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
              col("x.ahash").as("ha"), col("y.ahash").as("hb"))
      .dropDuplicates("doc_a", "doc_b") // a pair can share several bands
    cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def qImagePhash(spark: SparkSession, dir: String): DataFrame =
    imagePhashPairs(documents(spark, dir))

  /** STUB — deterministic fake audio decoder: the payload bytes are
    * treated as a PCM-ish sample stream centered at 100 (the fixture is
    * ASCII text, so letters sit above and spaces/digits below the
    * center). A real pipeline would decode an audio codec here; the
    * Spark-side plumbing — per-partition batch iteration, 256-sample
    * framing, feature schema — is the real deliverable.
    *
    * Every feature is an EXACT INTEGER (energy = Σ(b−100)², mean
    * crossings, per-frame sums digested as decimal strings), so the
    * DuckDB oracle matches bit-for-bit with no float-formatting caveats
    * at all — simpler than the image twin by design.
    */
  object FakeAudio {
    val FrameLen = 256
    val Center = 100
    def centered(bytes: Array[Byte]): Array[Int] =
      bytes.map(b => (b & 0xff) - Center)
    def energy(c: Array[Int]): Long = {
      var s = 0L; var i = 0
      while (i < c.length) { s += c(i).toLong * c(i); i += 1 }
      s
    }
    def meanCrossings(c: Array[Int]): Long = {
      var n = 0L; var i = 0
      while (i < c.length - 1) { if (c(i).toLong * c(i + 1) < 0) n += 1; i += 1 }
      n
    }
    def frameSums(c: Array[Int]): Array[Long] =
      c.grouped(FrameLen).map(_.foldLeft(0L)(_ + _)).toArray
  }

  /** Audio feature extraction over the binary column — same
    * `mapPartitions` batch shape as [[qImageFeatures]] (amortized codec
    * init per partition), second modality of the multimodal surface.
    */
  def qAudioFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Blob]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { b =>
          val c = FakeAudio.centered(b.payload)
          val sums = FakeAudio.frameSums(c)
          md.reset()
          val framesMd5 = md.digest(sums.mkString(",").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (b.doc_id, b.payload.length.toLong, sums.length.toLong,
            FakeAudio.energy(c), FakeAudio.meanCrossings(c), framesMd5)
        }
      }
      .toDF("doc_id", "n_samples", "n_frames", "energy_u", "mean_cross",
            "frames_md5")
      .orderBy(col("doc_id"))
  }

  /** CROSS-MODAL RETRIEVAL (round-13 verdict stretch item): text→image
    * top-k over a SHARED embedding space — the CLIP serving shape
    * (encode each modality → project through per-modality alignment
    * heads into one space → cosine top-k), with the ENCODERS stubbed
    * (this container ships no vision/text towers; the fixture pairs the
    * two modalities by construction, both derived from the same doc) and
    * every piece of Spark-side machinery real: per-modality feature
    * extraction, integer projection heads, exact-integer projected
    * vectors, a bounded broadcast query slice, and windowed top-k.
    *
    * - Image tower (stub): the first 256 payload bytes as eight 32-byte
    *   band sums — exact integers, the byte-level twin of
    *   [[qImageFeatures]]'s decode (`ascii('') = 0` zero-pads short
    *   payloads exactly like [[FakeDecode.decode]]).
    * - Text tower (stub): 8-bucket hashed bag-of-words counts over the
    *   shared `fh:` hash family ([[TextOps]]' bowCounts scheme).
    * - Alignment heads: per-modality 8×8 INTEGER matrices with entries
    *   `hash60("cmI:j:d") % 17 − 8` (resp. `cmT:`), derived DRIVER-side
    *   via [[graft.ops.TextFns.md5Hex]] (Catalyst never constant-folds
    *   lambda expressions — the [[SimilarityOps.planeWeights]] lesson)
    *   and baked in as literals, so projection is one codegen'd integer
    *   expression per output dim and the DuckDB oracle re-derives the
    *   exact same matrix in SQL. A real pipeline swaps the literals for
    *   LEARNED head weights; nothing downstream changes.
    * - Projected values stay LONGs (|y| ≤ 8·4064·8 < 2^19), dots and
    *   norms are exact in BIGINT on both engines; only the final cosine
    *   divides — same integers → bit-identical doubles → the float
    *   round/order hazards of the ANN rows don't get worse here.
    *
    * Scale shape: the query side is a bounded slice (`doc_id % queryMod
    * == queryRes`) broadcast against the image corpus — the brute-force
    * BASELINE of the similarity family. The 100-TB path is the existing
    * IVF/PQ serving machinery unchanged: projected vectors are ordinary
    * fixed-dim embeddings, so cross-modal serving = [[AnnIndexOps]] over
    * the image-side projections with text-side queries (recorded in
    * SURVEY §6; the fixture's 8-dim space makes a separate indexed row
    * pure duplication of q_ann_index_serve).
    */
  private[graft] def cmHead(tag: String): Array[Array[Long]] =
    Array.tabulate(8, 8) { (j, d) =>
      java.lang.Long.parseLong(
        graft.ops.TextFns.md5Hex(s"cm$tag:$j:$d").take(15), 16) % 17 - 8
    }

  /** Per-PAIR integer dot (the cosine numerator): explicit 8-term
    * unroll — it runs once per (query, image) PAIR, where an
    * interpreted higher-order form measured 28 s row total at sf0.1 vs
    * ~1 s unrolled. Its inputs are join-child ATTRIBUTES
    * (CollapseProject never crosses the join), so each getItem is a
    * real O(1) array read, never an inlined tower re-computation. */
  private def dotPair(a: String, b: String): Column =
    (0 until 8).map(i => col(a).getItem(i) * col(b).getItem(i))
      .reduce(_ + _)

  def crossModalRetrieval(docs: DataFrame, k: Int = 5, queryMod: Int = 200,
                          queryRes: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // STAGE DISCIPLINE (measured, not stylistic). A pure-expression
    // image tower (256 ascii(substring) terms per band sum) gets
    // re-inlined into every head/norm consumer by CollapseProject +
    // SimplifyExtractValueOps — a 10k+-node projection that either OOMs
    // janino (array form) or falls out of whole-stage codegen behind a
    // zip_with norm (measured 18.7 s row total at sf0.1). So the band
    // sums run in the multimodal family's native shape instead — one
    // byte loop per row via mapPartitions over [[Blob]], the same
    // batch plumbing as [[qImageFeatures]] — which is also a hard
    // optimizer barrier: everything downstream reads ATTRIBUTES, and
    // the head/norm arithmetic (≤128 integer terms) codegens cleanly.
    val headI = cmHead("I"); val headT = cmHead("T")
    import docs.sparkSession.implicits._
    // Image tower: 32-byte band sums of the (zero-padded) first 256
    // payload bytes — the byte-level twin of FakeDecode.decode's
    // zero-padding.
    val bands = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[Blob]
      .mapPartitions(_.map { b =>
        val s = Array.fill(8)(0L)
        var i = 0
        val n = math.min(b.payload.length, 256)
        while (i < n) { s(i / 32) += (b.payload(i) & 0xff).toLong; i += 1 }
        (b.doc_id, s)
      })
      .toDF("doc_id", "bands")
    val iy = bands.select(
      col("doc_id") +: (0 until 8).map { d =>
        (0 until 8).map(j => col("bands").getItem(j) * lit(headI(j)(d)))
          .reduce(_ + _).as(s"y$d")
      }: _*)
    val img = iy.select(col("doc_id").as("img_doc"),
        array((0 until 8).map(d => col(s"y$d")): _*).as("y"),
        (0 until 8).map(d => col(s"y$d") * col(s"y$d")).reduce(_ + _)
          .as("n2"))
      .filter(col("n2") > 0)
    // Text tower: 8-bucket hashed BoW counts; the group-by exchange is
    // the materialization barrier, so the projection head reads
    // aggregate ATTRIBUTES.
    val tcounts = docs
      .select(col("doc_id"), explode(TextFns.toks).as("w"))
      .filter(pmod(col("doc_id"), lit(queryMod)) === queryRes)
      .select(col("doc_id"),
        (TextFns.hash60(concat(lit("fh:"), col("w"))) % 8).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    val tAggs = (0 until 8).map(j =>
      sum(when(col("b") === j, col("c")).otherwise(0L)).as(s"t$j"))
    val tv = tcounts
      .groupBy(col("doc_id"))
      .agg(tAggs.head, tAggs.tail: _*)
    val ty = tv.select(
      col("doc_id") +: (0 until 8).map { d =>
        (0 until 8).map(j => col(s"t$j") * lit(headT(j)(d))).reduce(_ + _)
          .as(s"q$d")
      }: _*)
    val txt = ty.select(col("doc_id").as("q_doc"),
        array((0 until 8).map(d => col(s"q$d")): _*).as("qy"),
        (0 until 8).map(d => col(s"q$d") * col(s"q$d")).reduce(_ + _)
          .as("qn2"))
      .filter(col("qn2") > 0)
    // Cross join is the brute-force baseline by construction: every
    // (query, image) pair is scored, with the bounded query slice on the
    // broadcast side — image rows never shuffle.
    val scored = img.crossJoin(broadcast(txt))
      .withColumn("cos",
        dotPair("qy", "y").cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))))
    val w = Window.partitionBy(col("q_doc"))
      .orderBy(col("cos").desc, col("img_doc").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_doc"), col("rank"), col("img_doc"),
        round(col("cos"), 3).as("cos"))
      .orderBy(col("q_doc"), col("rank"))
  }

  def qCrossmodalRetrieval(spark: SparkSession, dir: String): DataFrame =
    crossModalRetrieval(documents(spark, dir))
}
