package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-based lifecycle soak for [[graft.ops.KeyedStore]]: seeded
  * random sequences of create/upsert(U/I/D)/mergeSmallRegions/
  * rebalance/repair — with boundary-flooding inserts that trigger
  * automatic splits — are checked after EVERY operation against a
  * driver-side `Map[Long, String]` oracle, plus the region-directory
  * invariants the binary-search routing depends on. This cements the
  * full region-server lifecycle (split + merge + rebalance + recovery
  * interleaved with writes) the way the ScalaCheck U/I/D property pins
  * the versioned store: any sequencing bug (lost region, stale bloom
  * turning into a false negative, directory/partition divergence,
  * empty-directory wipeout) surfaces as a value diff, not a latent
  * crash.
  */
class KeyedStoreSoakSpec extends AnyFunSuite {
  import TestSpark._
  import ops.KeyedStore

  private def checkInvariants(name: String, model: Map[Long, String],
                              ctx: String): Unit = {
    // Value oracle: the table IS the model, byte for byte.
    val got = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == model,
      s"$ctx: table diverged (missing=${(model.keySet -- got.keySet).take(5)}, " +
        s"extra=${(got.keySet -- model.keySet).take(5)})")
    // Directory invariants: never empty, min-sorted (binary-search
    // precondition), row counts sum to the model, and every non-empty
    // region's recorded bounds order correctly.
    val rm = KeyedStore.readRegions(spark, name)
    assert(rm.regions.nonEmpty, s"$ctx: directory went empty")
    val mins = rm.regions.map(_.min.asInstanceOf[Long])
    assert(mins == mins.sorted, s"$ctx: directory not min-sorted: $mins")
    assert(rm.regions.map(_.rows).sum == model.size,
      s"$ctx: directory rows ${rm.regions.map(_.rows).sum} != model ${model.size}")
    rm.regions.filter(_.rows > 0).foreach(r =>
      assert(r.min.asInstanceOf[Long] <= r.max.asInstanceOf[Long],
        s"$ctx: inverted bounds $r"))
    // GET oracle on a sample of present + definitely-absent keys (blooms
    // must never false-negative a present key).
    val present = model.keySet.take(3).toSeq
    val absent = Seq(777777L, 888888L).filterNot(model.contains)
    val gets = KeyedStore.get(spark, name, "k", present ++ absent).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    present.foreach(k => assert(gets.get(k).contains(model(k)), s"$ctx: GET $k"))
    absent.foreach(k => assert(!gets.contains(k), s"$ctx: phantom GET $k"))
    // The join-based multiGet must agree with the point-GET path.
    import spark.implicits._
    val batch = KeyedStore.getBatch(spark, name, "k",
      (present ++ absent).toDF("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch == gets, s"$ctx: getBatch != get ($batch vs $gets)")
  }

  private def runSoak(seed: Long, ops: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val name = s"graft_keyed_soak_$seed"
    var model: Map[Long, String] =
      (0L until 120L).map(k => k -> s"s${seed}v$k").toMap
    KeyedStore.create(spark, name,
      model.toSeq.toDF("k", "v"), "k", targetRowsPerRegion = 16)
    checkInvariants(name, model, s"seed=$seed create")
    (1 to ops).foreach { i =>
      val ctx = s"seed=$seed op#$i"
      rnd.nextInt(10) match {
        case d if d <= 5 => // upsert: mixed U/I/D, sometimes boundary-flooding
          val far = rnd.nextBoolean()
          val batch = (0 until (1 + rnd.nextInt(40))).map { _ =>
            val k = if (far && rnd.nextInt(3) == 0)
              1000L + rnd.nextInt(400) // beyond max: boundary region, splits
            else rnd.nextInt(600).toLong
            rnd.nextInt(3) match {
              case 0 => (k, "U", s"u$i-$k")
              case 1 => (k, "I", s"i$i-$k")
              case 2 => (k, "D", "x")
            }
          }
          // Last op per key wins within a batch — mirror mergeUpsert.
          val effective = batch.groupBy(_._1).view.mapValues(_.last).values
          effective.foreach {
            case (k, "D", _) => model -= k
            case (k, _, v) => model += (k -> v)
          }
          KeyedStore.upsert(spark, name, "k",
            effective.toSeq.toDF("k", "op", "v"))
        case 6 | 7 =>
          KeyedStore.mergeSmallRegions(spark, name, "k")
        case 8 =>
          KeyedStore.rebalance(spark, name, "k",
            targetRowsPerRegion = 8 + rnd.nextInt(24))
        case 9 =>
          // FAULT INJECTION — the crash window the publish-then-drop
          // ordering explicitly tolerates: a split/merge that died after
          // publishing the new directory but before dropping the
          // superseded partition leaves an ORPHAN partition holding
          // duplicate rows. Inject exactly that (copy a live region's
          // rows into an unlisted kr), verify it is invisible to routed
          // reads but double-counts a raw full-table read, then repair.
          assert(KeyedStore.repair(spark, name) == 0,
            s"$ctx: repair found orphans before injection")
          if (model.nonEmpty) {
            val rm = KeyedStore.readRegions(spark, name)
            val src = rm.regions.maxBy(_.rows)
            val orphanKr = rm.regions.map(_.kr).max + 1000
            val cols = spark.table(name).columns
            spark.table(name).filter(col("kr") === src.kr).drop("kr")
              .withColumn("kr", lit(orphanKr))
              .select(cols.map(col).toIndexedSeq: _*)
              .write.mode("append").insertInto(name)
            assert(spark.table(name).count() == model.size + src.rows,
              s"$ctx: orphan should double-count raw reads")
            // Routed reads stay correct (the orphan is unlisted).
            val k0 = model.keysIterator.next()
            assert(KeyedStore.get(spark, name, "k", Seq(k0))
              .collect().map(_.getString(1)).toSeq == Seq(model(k0)),
              s"$ctx: routed GET disturbed by orphan")
            assert(KeyedStore.repair(spark, name) == 1,
              s"$ctx: repair must reclaim exactly the injected orphan")
          }
      }
      checkInvariants(name, model, ctx)
    }
    KeyedStore.drop(spark, name)
  }

  test("soak: random upsert/split/merge/rebalance/repair churn matches the model") {
    runSoak(seed = 41L, ops = 14)
    runSoak(seed = 1207L, ops = 14)
  }

  test("concurrent soak: contending + disjoint additive writers each land exactly once") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val name = "graft_keyed_soak_conc"
    // Additive counters: commutative merge, so ANY admission order gives
    // the same totals — the oracle is exact whatever interleaving the
    // round-9 back-off admission path produces. Writer pairs (w, w+3)
    // share a key range (region-lock contention → back-off → re-admit)
    // while the three ranges are mutually disjoint (concurrent
    // admission); a structural normalizer op runs CONCURRENTLY with
    // round 2's writers to stress the marker drain.
    KeyedStore.create(spark, name,
      (0L until 192L).map(k => (k, 0L)).toDF("k", "n"),
      "k", targetRowsPerRegion = 16)
    def add(a: org.apache.spark.sql.DataFrame,
            b: org.apache.spark.sql.DataFrame) =
      a.unionByName(b).groupBy(col("k")).agg(sum(col("n")).as("n"))
    val expected = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    (1 to 3).foreach { round =>
      val writers = (0 until 6).map { w =>
        val lo = (w % 3) * 64L
        val keys = (lo until lo + 40L).toSeq
        keys.foreach(k => expected(k) += 1L)
        // The RETURNED relation is a raw full-table read — evaluating
        // it while peers overwrite their regions is exactly the
        // non-isolated read the scaladoc excludes (file listing races a
        // peer's replace → FAILED_READ_FILE; this soak's first run
        // proved it). Real sinks discard the return value; totals are
        // checked after the round drains.
        () => { KeyedStore.mergeInto(spark, name, "k",
          keys.map(k => (k, 1L)).toDF("k", "n"), add); () }
      }
      val fs = writers.map(f => Future(f()))
      val structural =
        if (round == 2) Some(Future(KeyedStore.mergeSmallRegions(spark, name, "k")))
        else None
      fs.foreach(Await.result(_, 600.seconds))
      structural.foreach(Await.result(_, 600.seconds))
    }
    val byK = spark.table(name).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byK.size == 192, s"key count drifted: ${byK.size}")
    (0L until 192L).foreach { k =>
      assert(byK(k) == expected(k),
        s"k=$k got ${byK(k)} want ${expected(k)} — a batch was lost or doubled")
    }
    // Directory still consistent after the churn.
    val rm = KeyedStore.readRegions(spark, name)
    assert(rm.regions.map(_.rows).sum == 192)
    val mins = rm.regions.map(_.min.asInstanceOf[Long])
    assert(mins == mins.sorted)
    KeyedStore.drop(spark, name)
  }
}
