package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents`/`embeddings` — the core
  * training-data-pipeline capability (exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, embedding-cosine). The reference has no dedup of any kind.
  *
  * Scale design (the whole point at 100 TB):
  *  - Exact dedup is a hash groupBy — one shuffle on a 128-bit digest.
  *  - N-gram Jaccard uses a shingle inverted-index self-join (shuffle on
  *    shingle), never an O(n²) cross join: candidate pairs are only docs
  *    sharing ≥1 shingle, intersections arrive pre-counted from the join.
  *  - MinHash signatures are computed per-row with higher-order array
  *    expressions (no explode of doc×shingle×perm), then LSH banding turns
  *    near-dup search into an equi-join on (band, signature) — the standard
  *    sub-quadratic path. 32 perms / 8 bands × 4 rows ⇒ P(candidate) >
  *    0.999 at J≥0.9; candidates are exact-verified so false positives
  *    never surface.
  *  - SimHash reduces each doc to one 60-bit fingerprint; pairing compares
  *    fingerprints with xor/popcount inside a language block.
  *  - All hashing derives from md5 (TextFns.hash60) so every stage is
  *    bit-reproducible in the DuckDB oracle.
  */
object DedupOps {
  import graft.Tables._

  private val P = 2147483647L // 2^31 - 1, Mersenne prime for perm hashes
  private val NumPerms = 32
  private val BandRows = 4 // 8 bands x 4 rows

  /** Exact dedup: group by content digest, keep the smallest doc_id. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Per-doc distinct word-3-shingle relation (doc_id, lang, shingle) —
    * the inverted index both Jaccard variants build on.
    */
  private def shingleIndex(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .withColumn("toks", TextFns.toks)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), explode(TextFns.shingles).as("s"))

  /** Near-dedup by exact n-gram (word-3-shingle) Jaccard ≥ 0.8 within a
    * language block, via inverted-index join (shuffle on shingle, then on
    * pair — no cross join).
    */
  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingleIndex(spark, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
            col("a.s") === col("b.s") && col("a.lang") === col("b.lang") &&
              col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash + LSH near-dedup: per-doc 32-perm signature computed with
    * array expressions, banded 8×4 into join keys; band-join candidates
    * are exact-Jaccard-verified at ≥ 0.8.
    */
  def qDedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // Signature columns sig1..sig32: min over shingle hashes of (a*h+b) % P,
    // a,b < P and h < P so a*h+b < 2^62 — no Long overflow. Computed as 32
    // min-aggregates over the exploded shingle-hash relation: the md5 runs
    // ONCE per (doc, shingle), partial aggregation collapses map-side, and
    // one shuffle on doc_id carries only 32 longs per doc. (The tempting
    // 32-withColumn form re-inlines the hash array into every projection —
    // Catalyst's CollapseProject would recompute all md5s 32×.)
    val hs = shingleIndex(spark, dir)
      .withColumn("h", TextFns.hash60(col("s")) % P)
    val sigAggs = (1 to NumPerms).map { j =>
      val a = (j.toLong * 1103515245L + 12345L) % P
      val b = (j.toLong * 134775813L + 1L) % P
      min(expr(s"(${a}L * h + ${b}L) % ${P}L")).as(s"sig$j")
    } :+ count(lit(1)).as("n") // set size rides along in the same pass
    val withSig = hs.groupBy(col("doc_id"), col("lang"))
      .agg(sigAggs.head, sigAggs.tail: _*)
    // One row per (doc, band) via posexplode of the 8 band keys — a single
    // pass over the signature relation, NOT 8 unioned re-aggregations.
    val bandKeys = (0 until NumPerms / BandRows).map { k =>
      concat_ws(",", (1 to BandRows).map(r => col(s"sig${k * BandRows + r}")): _*)
    }
    val bands = withSig
      .select(col("doc_id"), col("lang"), col("n"),
              posexplode(array(bandKeys: _*)).as(Seq("band_id", "band_key")))
    val cand = bands.as("a")
      .join(bands.as("b"),
            col("a.lang") === col("b.lang") && col("a.band_id") === col("b.band_id") &&
              col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    // Exact verification on shingle STRINGS (hash collisions must not be
    // able to inflate the intersection vs the string-equality oracle).
    val sh = shingleIndex(spark, dir).select(col("doc_id"), col("s"))
    cand
      .join(sh.as("x"), col("x.doc_id") === col("doc_a"))
      .join(sh.as("y"), col("y.doc_id") === col("doc_b") && col("y.s") === col("x.s"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard", round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dedup: 60-bit count-weighted fingerprints; pairs within
    * a language block at Hamming distance ≤ 4 (planted near-dups measure
    * ≤ 4; unrelated docs ≥ 5 on the fixtures).
    */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    // One aggregation pass: 60 per-bit signed sums as parallel aggregate
    // columns over the (doc, token, count) relation — no 60× bit explode.
    val tc = documents(spark, dir)
      .select(col("doc_id"), col("lang"), explode(TextFns.toks).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .withColumn("h", TextFns.hash60(col("tok")))
    val bitSums = (0 until 60).map { j =>
      sum(expr(s"CASE WHEN (shiftright(h, $j) & 1) = 1 THEN c ELSE -c END")).as(s"s$j")
    }
    val fp = tc
      .groupBy(col("doc_id"), col("lang"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), col("lang"),
              (0 until 60).map(j =>
                when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
                .reduce(_ + _).as("fp"))
    fp.as("a")
      .join(fp.as("b"), col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", expr("bit_count(a.fp ^ b.fp)"))
      .filter(col("hamming") <= 4)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding-cosine near-dup: label-blocked pairs with cosine ≥ 0.45
    * (thresholded on the 3dp-rounded value so float ulp noise cannot flip
    * membership). Dot/norm in double with sequential fold on both engines.
    */
  def qDedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
              expr("aggregate(embedding, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))").as("nrm"))
    e.as("a")
      .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"))
      .withColumn("cos", round(col("dot") / (sqrt(col("a.nrm")) * sqrt(col("b.nrm"))), 3))
      .filter(col("cos") >= 0.45)
      .select(col("a.label").as("label"), col("a.vec_id").as("vec_a"),
              col("b.vec_id").as("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
