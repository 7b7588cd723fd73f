package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics beyond the dedup layer's connected components: weighted
  * PageRank over an edge relation, computed with EXACT INTEGER micro-unit
  * arithmetic so every iteration is order-independent and bit-reproducible
  * on any cluster topology (the same trick as the k-means centroid
  * updates) — and therefore DuckDB-oracle-checkable, which a double-typed
  * PageRank never is.
  *
  * Scale shape: each iteration is one equi-join (ranks ⋈ edges on src,
  * both sides hash-partitioned on the join key) plus one aggregation on
  * dst — the standard distributed PageRank schedule. Ranks relations stay
  * (node, long) pairs; edges carry (src, dst, wgt). A fixed iteration
  * count keeps the lineage bounded (callers can checkpoint between calls
  * for large iteration counts; the dedup layer's pointer-jumping CC shows
  * the persisted-loop variant).
  */
object GraphOps {
  import graft.Tables._

  /** `iters` rounds of damped PageRank in 10⁻⁶ units over integer-weighted
    * edges `(src, dst, wgt)`. rank₀ = 10⁶ div n; rankₖ₊₁(v) =
    * 0.15·10⁶ div n + 0.85·Σᵤ rankₖ(u)·w(u,v) div out(u), all in integer
    * `div` arithmetic (deterministic truncation on both engines). Nodes
    * with no in-edges keep the teleport term via a left join from the node
    * set; dangling mass (nodes with no out-edges) is dropped, matching
    * the oracle's formulation.
    */
  def pageRank(edges: DataFrame, iters: Int = 3): DataFrame = {
    val out = edges.groupBy(col("src")).agg(sum(col("wgt")).as("out_w"))
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val e = edges.join(out, Seq("src"))
    var rank = nodes.crossJoin(broadcast(
        nodes.agg(count(lit(1)).as("n_nodes"))))
      .select(col("node"), expr("1000000L div n_nodes").as("pr"),
              col("n_nodes"))
    (1 to iters).foreach { _ =>
      val contrib = e.join(rank.select(col("node").as("src"), col("pr")), Seq("src"))
        .select(col("dst").as("node"),
                expr("pr * wgt div out_w").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("in_c"))
      rank = rank.select(col("node"), col("n_nodes"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
                (expr("150000L div n_nodes") +
                  expr("850000L * coalesce(in_c, 0L) div 1000000")).as("pr"),
                col("n_nodes"))
    }
    rank.select(col("node"), col("pr"))
  }

  /** Event-type transition graph: consecutive events of the same user
    * (event-time order, event_id tie-break) form weighted edges — the
    * "what happens after what" graph of a product analytics pipeline.
    * One window pass builds the edges; the aggregation collapses them to
    * |types|² rows before PageRank runs.
    */
  def transitionEdges(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
              col("event_type").as("src"))
      .withColumn("dst", lead(col("src"), 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("wgt"))
  }

  def qPagerank(spark: SparkSession, dir: String): DataFrame =
    pageRank(transitionEdges(events(spark, dir)))
      .orderBy(col("pr").desc, col("node"))
}
