// Dev tool: lineage-clone audit over every SparkEntry query (round 9).
//
// A DataFrame referenced from two or more plan branches re-executes its
// whole lineage per clone (Catalyst clones the subtree; exchange reuse
// does not reliably dedup), so this script counts physical scan leaves
// per source file per query and flags any query scanning one file >= 3
// times. Run it with the compiled classes on the driver classpath:
//
//   /opt/spark/bin/spark-shell --master local[16] --driver-memory 8g \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=16 \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.warehouse.dir=/tmp/graft_audit_wh \
//     --conf spark.sql.extensions=graft.plans.GraftExtensions \
//     --conf spark.driver.extraClassPath=target/scala-2.13/classes \
//     -I scripts/plan_audit.scala 2>/dev/null | grep AUDIT
//
// Notes: queries run in ONE session, so cross-query cache substitution
// (persisted relations are matched by canonical plan) can hide scans a
// per-query run would show; "CACHE" leaves are InMemoryTableScans. The
// round-9 sweep took the flagged count from 33 to 3 (the survivors are
// deliberate multi-pass designs — see ROUND9_NOTES.md §4b).

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

val dir = "/root/testdata/sf0.001"
def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = p.collect {
  case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
  case f: FileSourceScanExec =>
    Seq(f.metadata.getOrElse("Location", "?").replaceAll(".*\\[", "").take(90))
  case m: InMemoryTableScanExec => Seq("CACHE")
}.flatten

val names = graft.SparkEntry.queries.keys.toSeq.sorted
for (n <- names) {
  try {
    val df = graft.SparkEntry.queries(n)(spark, dir)
    val ls = leaves(df.queryExecution.executedPlan)
    val dup = ls.filterNot(_ == "CACHE").groupBy(identity).filter(_._2.size >= 3)
    if (dup.nonEmpty)
      println(s"AUDIT $n -> " +
        dup.map { case (k, v) => s"${v.size}x $k" }.mkString("; "))
  } catch { case t: Throwable => println(s"AUDIT_ERR $n ${t.getClass.getSimpleName}") }
}
println("AUDIT_DONE")
sys.exit(0)
