package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators — the core training-data-pipeline capability
  * (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine). The
  * reference has no dedup of any kind. Each operator is a parameterized
  * library function over an arbitrary corpus DataFrame (`doc_id`, block
  * column, `text`); the `q*` wrappers pin the oracle-checked defaults on
  * the fixture tables.
  *
  * Scale design (the whole point at 100 TB):
  *  - Exact dedup is a hash groupBy — one shuffle on a 128-bit digest.
  *  - N-gram Jaccard uses a shingle inverted-index self-join (shuffle on
  *    shingle), never an O(n²) cross join: candidate pairs are only docs
  *    sharing ≥1 shingle, intersections arrive pre-counted from the join.
  *  - MinHash signatures are computed as numPerms parallel min-aggregates
  *    over the exploded shingle-hash relation (one md5 per shingle,
  *    map-side combine; NOT stacked projections — CollapseProject would
  *    recompute the hash array per column). LSH banding then turns
  *    near-dup search into an equi-join on (band, signature): with 32
  *    perms / 8 bands × 4 rows, P(candidate) > 0.999 at J≥0.9, and
  *    candidates are exact-verified so false positives never surface.
  *  - SimHash reduces each doc to one 60-bit fingerprint via 60 parallel
  *    aggregate columns; pairing compares fingerprints with xor/popcount
  *    inside a block.
  *  - All hashing derives from md5 (TextFns.hash60) so every stage is
  *    bit-reproducible in the DuckDB oracle.
  */
object DedupOps {
  import graft.Tables._

  private val P = 2147483647L // 2^31 - 1, Mersenne prime for perm hashes

  /** Exact dedup: group by content digest, keep the smallest id. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** Per-doc distinct word-3-shingle relation (doc_id, lang, shingle) —
    * the inverted index the Jaccard family builds on.
    */
  private def shingleIndex(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", TextFns.toks)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), explode(TextFns.shingles).as("s"))

  private def verifyJaccard(pairsWithInter: DataFrame, threshold: Double): DataFrame =
    pairsWithInter
      .withColumn("jaccard", round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Near-dedup by exact n-gram (word-3-shingle) Jaccard ≥ threshold
    * within a `lang` block, via inverted-index join.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val sh = shingleIndex(docs)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"),
            col("a.s") === col("b.s") && col("a.lang") === col("b.lang") &&
              col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    verifyJaccard(
      inter
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b"),
      threshold)
  }

  /** MinHash + LSH near-dedup: per-doc numPerms-perm signature, banded
    * into (numPerms / bandRows) join keys; band-join candidates are
    * exact-Jaccard-verified at ≥ threshold.
    */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.8,
                      numPerms: Int = 32, bandRows: Int = 4): DataFrame = {
    require(numPerms % bandRows == 0, "numPerms must be a multiple of bandRows")
    // a,b < P and h < P so a*h+b < 2^62 — no Long overflow.
    val hs = shingleIndex(docs)
      .withColumn("h", TextFns.hash60(col("s")) % P)
    val sigAggs = (1 to numPerms).map { j =>
      val a = (j.toLong * 1103515245L + 12345L) % P
      val b = (j.toLong * 134775813L + 1L) % P
      min(expr(s"(${a}L * h + ${b}L) % ${P}L")).as(s"sig$j")
    } :+ count(lit(1)).as("n") // set size rides along in the same pass
    val withSig = hs.groupBy(col("doc_id"), col("lang"))
      .agg(sigAggs.head, sigAggs.tail: _*)
    // One row per (doc, band) via posexplode of the band keys — a single
    // pass over the signature relation, NOT unioned re-aggregations.
    val bandKeys = (0 until numPerms / bandRows).map { k =>
      concat_ws(",", (1 to bandRows).map(r => col(s"sig${k * bandRows + r}")): _*)
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
    val sh = shingleIndex(docs).select(col("doc_id"), col("s"))
    verifyJaccard(
      cand
        .join(sh.as("x"), col("x.doc_id") === col("doc_a"))
        .join(sh.as("y"), col("y.doc_id") === col("doc_b") && col("y.s") === col("x.s"))
        .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("c")),
      threshold)
  }

  /** SimHash near-dedup: 60-bit count-weighted fingerprints; pairs within
    * a `lang` block at Hamming distance ≤ maxHamming.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 4): DataFrame = {
    val tc = docs
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
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding-cosine near-dup: label-blocked pairs with cosine ≥ the
    * threshold applied to the 3dp-rounded value (so float ulp noise cannot
    * flip membership). Dot/norm in double, sequential fold on both engines.
    */
  def embeddingCosinePairs(embs: DataFrame, threshold: Double = 0.45): DataFrame = {
    val e = embs
      .select(col("vec_id"), col("label"), col("embedding"),
              expr("aggregate(embedding, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))").as("nrm"))
    e.as("a")
      .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("dot", expr(
        "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)"))
      .withColumn("cos", round(col("dot") / (sqrt(col("a.nrm")) * sqrt(col("b.nrm"))), 3))
      .filter(col("cos") >= threshold)
      .select(col("a.label").as("label"), col("a.vec_id").as("vec_a"),
              col("b.vec_id").as("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // ---- driver-contract wrappers (oracle-pinned defaults) ----

  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    exactDedup(documents(spark, dir))

  def qDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(documents(spark, dir))

  def qDedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshPairs(documents(spark, dir))

  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(documents(spark, dir))

  def qDedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame =
    embeddingCosinePairs(embeddings(spark, dir))
}
