package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ExplainMode, FormattedMode}
import java.nio.file.{Files, Paths}

/** Optimization-round evidence tool: dump `.explain("formatted")` for a
  * list of queries into `plans/r17/<query>_<tag>.txt`.
  *
  * Usage: `sbt "runMain graft.PlanDumpR17 <tag> q_a q_b ..."` with
  * `SPARK_GRAFT_SF_DIR` selecting the fixture (default sf0.001 — plan
  * shapes are scale-independent). Each query is EXECUTED first so AQE
  * finalizes, then the final formatted plan is written; for multi-action
  * operators (store lifecycles, iterative loops) the dump is the final
  * serve/read plan — the repeated units are documented in PLANS.md.
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpR17 <tag> <query> [query ...]")
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
    val out = Paths.get("plans", "r17")
    Files.createDirectories(out)
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"plandump:$name")
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // let AQE finalize the plan
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      Files.writeString(out.resolve(s"${name}_$tag.txt"), txt)
      GraftCache.releaseAllStorage(spark)
      println(s"dumped $name -> plans/r17/${name}_$tag.txt")
    }
    spark.stop()
  }
}
