package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`ArrayType(FloatType)`, 64-dim).
  *
  * Two paths:
  *  - Brute-force cosine top-k — the exactness baseline. The (small) query
  *    set is broadcast against the full vector table, so the scan is one
  *    pass over the big side: linear, partition-parallel, no shuffle until
  *    the per-query top-k (tiny).
  *  - IVF (inverted-file) — the scale path: a deterministic strided sample
  *    of vectors acts as the centroid codebook (k ≈ n/50); every vector is
  *    assigned to its nearest centroid (one broadcast join), queries probe
  *    only the 2 nearest cells. At 100 TB the assignment becomes the
  *    partitioning key, so a probe touches ~2/k of the data.
  *
  * Cosine is computed in double with a sequential left-to-right fold
  * (`aggregate`/`zip_with`) — the exact summation order DuckDB's
  * `list_dot_product` uses on DOUBLE[], so oracle values match to the ulp;
  * output similarity is rounded to 3dp and ranking tie-breaks on vec_id.
  */
object SimilarityOps {
  import graft.Tables._

  private def norm2(v: String): Column =
    expr(s"aggregate($v, cast(0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")

  private def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0 as double), (acc, v) -> acc + v)")

  /** Brute-force cosine top-10 for query vectors vec_id < 5. */
  def qAnnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), norm2("embedding").as("nrm"))
    val q = e.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
      .filter(col("q_id") < 5)
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot("q_emb", "embedding") / (sqrt(col("q_nrm")) * sqrt(col("nrm"))))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 3).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Sign-LSH bucketed ANN: 4 deterministic hyperplanes (integer weights
    * derived from md5 of "j_i", so the oracle reproduces them exactly);
    * bucket = 4 sign bits; queries search only their own bucket. At scale
    * the bucket id becomes the partition key — a probe touches ~1/2^planes
    * of the data, trading recall for a bounded candidate set (plane count
    * scales with corpus size; 4 keeps fixture buckets populated).
    */
  def qAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    // planes[j][i] ∈ [-1000, 1000]; constant-folded once by Catalyst.
    val planes = expr(
      "transform(sequence(0, 3), j -> transform(sequence(1, 64), " +
        "i -> cast(conv(substr(md5(concat(cast(j as string), '_', cast(i as string))), 1, 15), 16, 10) as bigint) % 2001 - 1000))")
    val e = embeddings(spark, dir)
      .withColumn("planes", planes)
      .withColumn("bucket", expr(
        """aggregate(transform(sequence(0, 3), j ->
          |  CASE WHEN aggregate(zip_with(embedding, planes[j],
          |         (x, w) -> cast(x as double) * cast(w as double)),
          |       cast(0 as double), (acc, v) -> acc + v) > 0
          |  THEN shiftleft(1, j) ELSE 0 END), 0, (acc, b) -> acc + b)""".stripMargin))
      .select(col("vec_id"), col("bucket"), col("embedding"), norm2("embedding").as("nrm"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("bucket"),
              col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot("q_emb", "embedding") / (sqrt(col("q_nrm")) * sqrt(col("nrm"))))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
              round(col("cos"), 3).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF ANN: centroids = vec_id % 50 == 0; assign all vectors to the
    * nearest centroid; queries (vec_id < 5) probe their 2 nearest cells
    * and take cosine top-10 among the cells' members.
    */
  def qAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"), norm2("embedding").as("nrm"))
    val cent = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    // Nearest-centroid relation for every vector (rn = 1) and the probe
    // list for queries (rn <= 2). One broadcast join computes both.
    val vc = e.join(broadcast(cent), lit(true))
      .withColumn("c_cos", dot("embedding", "c_emb") / (sqrt(col("nrm")) * sqrt(col("c_nrm"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("c_cos").desc, col("c_id").asc)))
    val assign = vc.filter(col("rn") === 1)
      .select(col("vec_id").as("m_id"), col("embedding").as("m_emb"),
              col("nrm").as("m_nrm"), col("c_id"))
    val probes = vc.filter(col("vec_id") < 5 && col("rn") <= 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
              col("nrm").as("q_nrm"), col("c_id"))
    val scored = probes.join(assign, Seq("c_id"))
      .filter(col("m_id") =!= col("q_id"))
      .withColumn("cos", dot("q_emb", "m_emb") / (sqrt(col("q_nrm")) * sqrt(col("m_nrm"))))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("m_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("rank"), col("m_id").as("neighbor_id"),
              round(col("cos"), 3).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }
}
