package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Round-18 evidence tool: dump the POST-EXECUTION formatted plan (AQE
  * finalized) for a list of queries into `plans/r18/<query>_<tag>.txt`.
  *
  * `PLAN_UNTUNED=1` reproduces the PRE-round session behavior for the
  * `before` dumps: it pre-stamps the tune marker so
  * [[Graft.tuneExecution]] no-ops, then pins the Spark defaults the
  * round changed (parallelism-first coalescing, 64m advisory, cached
  * plans exempt from AQE) — the only deltas this round makes are
  * runtime AQE partitioning, so before/after pairs differ exactly in
  * the AQEShuffleRead / partition counts of the final plans.
  */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR18 <tag> <query> [query ...]")
    val tag = args(0)
    val names = args.drop(1).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("PLAN_UNTUNED")) {
      spark.conf.set("spark.graft.execution.tuned", "true") // block the tune
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
    }
    val out = Paths.get("plans", "r18")
    Files.createDirectories(out)
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"plandump:$name")
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // let AQE finalize the plan
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      Files.writeString(out.resolve(s"${name}_$tag.txt"), txt)
      GraftCache.releaseAllStorage(spark)
      println(s"dumped $name -> plans/r18/${name}_$tag.txt")
    }
    spark.stop()
  }
}
