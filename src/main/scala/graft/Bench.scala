package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * emits ONE JSON line with per-query seconds. The line is printed to
  * stdout (unprefixed — build.sbt forces StdoutOutput for forked runs so
  * sbt's `[info]` logger never wraps it) AND written to `bench_out.json`,
  * so the driver can parse either.
  *
  * Each query runs twice and reports the min: a single-shot pass bills
  * GC/codegen churn from a heavy neighbor to whichever query runs next
  * (observed in round 1: q_set_ops at 45 s single-shot vs ~5 s clean).
  * Queries >2x their previous-round record re-run twice more (min of
  * all runs kept) and are flagged in "suspect" if still deviant — the
  * round-7 record carried a 16-row contention window that a min-of-2
  * could not absorb.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Deterministic name order; per-query noop action first touches the
    // session so JVM/codegen warmup is not billed to the first query.
    spark.range(1000000).selectExpr("sum(id)").collect()
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run (focused iteration);
    // unset = the full driver surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // A throwing query must be VISIBLE in the record — a silent catch
      // bills its time-to-failure and the bench line looks healthy while
      // a regression hides inside a plausible total.
      var err: Option[String] = None
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case t: Throwable =>
            err = Some(Option(t.getMessage).getOrElse(t.getClass.getName)
              .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200))
        }
        (System.nanoTime() - t0) / 1e9
      }
      // Per-query isolation: drop persisted/localCheckpoint blocks so one
      // query's storage doesn't linger in the block manager and inflate
      // queries that happen to run later in the alphabet.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      (name, times.min, err)
    }
    // Deviation guard: a min-of-2 can still record a sustained machine
    // contention window (round 7 carried 16 inflated rows into the
    // permanent record). Any query whose min exceeds 2x its value in the
    // repo's latest BENCH_r*.json (and by >0.5 s absolute) is re-run
    // twice more and the min of all runs kept; a survivor is flagged in
    // "suspect" so the record carries its own health note instead of a
    // silent regression-or-artifact ambiguity.
    val prior: Map[String, Double] = {
      val re = "BENCH_r(\\d+)\\.json".r
      val files = Option(new java.io.File(".").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .flatMap(f => f.getName match {
          case re(n) => Some((n.toInt, f.toPath))
          case _ => None
        })
      if (files.isEmpty) Map.empty
      else {
        val txt = new String(Files.readAllBytes(files.maxBy(_._1)._2), "UTF-8")
        val start = txt.indexOf("\"queries\":")
        if (start < 0) Map.empty
        else "\"(q[A-Za-z0-9_]+)\":([0-9.Ee+-]+)".r
          .findAllMatchIn(txt.substring(start))
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }
    def deviant(t: Double, pv: Double): Boolean = t > 2 * pv && t - pv > 0.5
    val guarded = results.map { case (name, t, err) =>
      if (err.nonEmpty || !prior.get(name).exists(deviant(t, _)))
        (name, t, err, false)
      else {
        // Only SUCCESSFUL re-runs may lower the recorded time: a crashed
        // re-run returns fast, and its time-to-failure must not be
        // mistaken for the query's cost (the original timed runs already
        // proved the query green).
        val retimes = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { SparkEntry.queries(name)(spark, sfDir).count(); true }
            catch { case _: Throwable => false }
          ((System.nanoTime() - t0) / 1e9, ok)
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        val good = retimes.collect { case (rt, true) => rt }
        val best = if (good.nonEmpty) math.min(t, good.min) else t
        (name, best, err, prior.get(name).exists(deviant(best, _)))
      }
    }
    val qs = guarded.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = guarded.collect { case (k, _, Some(e), _) => s"\"" + k + "\":\"" + e + "\"" }
      .mkString("{", ",", "}")
    val suspect = guarded.collect { case (k, _, _, true) => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = guarded.map(_._2).sum
    val nErr = guarded.count(_._3.nonEmpty)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_err":$nErr,"suspect":$suspect,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    spark.stop()
    // Printed LAST (after file write + session stop) so a tail-capture
    // parser always sees the complete line as the final stdout line.
    println(line)
  }
}
