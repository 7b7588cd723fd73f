package graft.plans

import graft.ops.KeyedStore
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Path, Paths}

/** Optimizer rule: REGION PRUNING for [[KeyedStore]] tables reached
  * through plain SQL — the "Spark DataFrame + HBase connector" seam the
  * reference's north star names (its HBase client prunes GETs/Scans to
  * the owning regions via hbase:meta;
  * `HPopulate/src/main/java/org/northeastern/Main.java:54-73,97-100`
  * creates and probes that table), minus HBase.
  *
  * [[KeyedStore.get]]/[[KeyedStore.scan]] prune driver-side, but they
  * are API calls: a user writing `spark.sql("SELECT ... FROM store
  * WHERE key BETWEEN a AND b")` — or composing the store into an
  * arbitrary query — used to scan every region, because Spark cannot
  * know the key↔kr mapping the sidecar records. This rule closes that
  * gap on BOTH keyed-read shapes SQL can take:
  *
  *  - LITERAL predicates: any Filter directly over a keyed table's
  *    relation whose conjuncts constrain the KEY column (=, IN, <, <=,
  *    >, >=, BETWEEN) gains a `kr IN (…)` conjunct derived from the
  *    region directory — which Spark's own FileSourceStrategy then
  *    splits out as a PartitionFilter (static partition pruning) while
  *    the original key predicate pushes into the key-sorted parquet as
  *    a PushedFilter. Equality/IN probes additionally consult the
  *    per-region row blooms (lazily, O(probed regions) —
  *    [[KeyedStore.loadBloomAt]]), so an absent-key SQL lookup scans
  *    ZERO partitions, the HBase ROW-bloom fast path from SQL text;
  *  - JOIN shapes (`store JOIN probe_keys USING (key)` — the multiGet
  *    from raw SQL, where the probe keys are DATA): the join condition
  *    is extended with an equi-conjunct on the store's partition
  *    column, computed probe-side by the codegen'd boundary bucket
  *    search, which hands the prune to Spark's own DYNAMIC partition
  *    pruning — see [[rewriteJoin]] below.
  *
  * Deliberately NOT a custom DataSource V2 relation: the store's data
  * plane IS parquet, and rewriting the logical plan above the existing
  * relation composes with Spark's vectorized parquet reader, row-group
  * min/max skipping, and whole-stage codegen — all of which a
  * hand-rolled DSv2 `PartitionReader` (row-by-row record
  * materialization) would forfeit. The directory/bloom consultation is
  * control-plane-sized and cached ([[KeyedStore.parseSidecarAt]]).
  *
  * Correctness never depends on this rule firing (the injected conjunct
  * only ever REMOVES regions the directory proves cannot hold matching
  * keys — strict inequalities are widened to inclusive bounds, unknown
  * predicate shapes contribute nothing); if the sidecar is missing or
  * legacy (no key column recorded) the plan is left untouched.
  */
object KeyedRegionPrune extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, rel: LogicalRelation) =>
      pruneConjunct(cond, rel)
        .map(extra => Filter(And(cond, extra), rel))
        .getOrElse(f)
    case j: Join => rewriteJoin(j).getOrElse(j)
  }

  // ------------------- JOIN-shape region pruning -------------------
  //
  // `SELECT … FROM store JOIN probe_keys USING (k)` — the multiGet shape
  // from raw SQL — carries no literal the Filter case can prune on: the
  // probe keys are DATA. [[KeyedStore.getBatch]] solves this API-side by
  // collecting the touched kr ids; from SQL the equivalent must be a
  // RUNTIME prune, and Spark already owns that machinery: dynamic
  // partition pruning fires on any equi-join whose key lineage reaches a
  // partition column. So the rewrite makes the region mapping VISIBLE to
  // DPP instead of re-implementing it:
  //
  //   Join(store, probe, Inner, store.k = probe.k)
  //   ⇒ Project(origOutput,
  //       Join(store(+kr),
  //            Generate(explode(closures[bucket(probe.k)]) AS __graft_kr,
  //                     probe),
  //            Inner, store.k = probe.k AND store.kr = __graft_kr))
  //
  // where `bucket` is the codegen'd boundary binary search and
  // `closures` is ONE nested-array literal mapping each coverage index
  // to every kr that may HOLD such a key (boundary-straddling keys — a
  // duplicated key split across adjacent regions by the range partition
  // — explode to each candidate, so no resident row is ever missed; see
  // [[KeyedStore.RegionMap.holdingClosures]]). Spark's PartitionPruning
  // batch (which runs AFTER the operator-optimization batch this rule is
  // injected into) then sees an equi-condition on the store's partition
  // column `kr` and inserts its DynamicPruningSubquery: with the typical
  // small probe side the broadcast is REUSED, so region pruning costs
  // nothing beyond the join's own build.
  //
  // Semantics: for every store row with key v resident in region r, the
  // directory bounds give min_r ≤ v ≤ max_r, hence r ∈ closures[bucket
  // (v)] — each (store row, probe row) match survives exactly once (the
  // exploded copies carry distinct kr ids, and the row's kr equals one
  // of them). Shapes are restricted to those where the probe side is NOT
  // duplicate-sensitive and the store side is DPP-prunable: INNER (store
  // on either side) and LEFT SEMI (store on the left). Outer joins
  // preserving the probe side would emit one null-padded row per
  // exploded copy; LEFT ANTI would narrow the reject set — both
  // excluded. The rewrite declines past [[MaxJoinClosureRegions]]
  // regions (the closure literal is one expression node but its payload
  // ships with every task binary) and when the directory has a single
  // region (nothing to prune).

  private def rewriteJoin(j: Join): Option[LogicalPlan] = {
    if (j.condition.isEmpty) return None
    val candidates: Seq[(LogicalPlan, LogicalPlan, Boolean)] = j.joinType match {
      case Inner => Seq((j.left, j.right, true), (j.right, j.left, false))
      case LeftSemi => Seq((j.left, j.right, true))
      case _ => Nil
    }
    candidates.view
      .flatMap { case (store, probe, storeIsLeft) =>
        tryRewriteJoin(j, store, probe, storeIsLeft)
      }
      .headOption
  }

  /** Store-side recognition: a Project/Filter chain over a keyed table's
    * [[LogicalRelation]] whose sidecar records the key column, with the
    * key attribute surviving (un-aliased) to the side's output.
    */
  private def storeSide(plan: LogicalPlan)
      : Option[(LogicalRelation, Attribute, KeyedStore.RegionMap, Attribute)] = {
    def baseRel(p: LogicalPlan): Option[LogicalRelation] = p match {
      case r: LogicalRelation => Some(r)
      case Project(_, c) => baseRel(c)
      case Filter(_, c) => baseRel(c)
      case _ => None
    }
    for {
      rel <- baseRel(plan)
      krAttr <- rel.output.find(a => a.name == "kr" && a.dataType == IntegerType)
      loc <- tableLocation(rel)
      sidecar = loc.resolve("_graft_regions")
      if Files.exists(sidecar)
      (rm, _, keyColOpt) = KeyedStore.parseSidecarAt(sidecar)
      keyCol <- keyColOpt
      keyAttr <- rel.output.find(_.name == keyCol)
      if plan.outputSet.contains(keyAttr)
    } yield (rel, krAttr, rm, keyAttr)
  }

  /** Re-thread `krAttr` through the store side's Project chain so the
    * new join conjunct can reference it (ColumnPruning may already have
    * dropped it; the restoring Project above the join drops it again).
    */
  private def withKr(plan: LogicalPlan, krAttr: Attribute): Option[LogicalPlan] =
    plan match {
      case r: LogicalRelation => Some(r)
      case p @ Project(pl, child) =>
        withKr(child, krAttr).map { c =>
          if (pl.exists(_.exprId == krAttr.exprId)) p.copy(child = c)
          else Project(pl :+ krAttr, c)
        }
      case f @ Filter(_, child) =>
        withKr(child, krAttr).map(c => f.copy(child = c))
      case _ => None
    }

  private def tryRewriteJoin(j: Join, store: LogicalPlan, probe: LogicalPlan,
                             storeIsLeft: Boolean): Option[LogicalPlan] = {
    val cond = j.condition.get
    for {
      (_, krAttr, rm, keyAttr) <- storeSide(store)
      if rm.regions.size > 1 && rm.regions.size <= MaxJoinClosureRegions
      // Idempotence / user intent: a condition already constraining kr
      // (a prior firing, or an explicit kr equi-join) is left alone.
      if !cond.references.contains(krAttr)
      // The probe expression must genuinely come from the probe side —
      // references.nonEmpty excludes key = <literal> (a foldable "probe"
      // is the Filter case's business, where blooms also apply).
      probeKey <- splitConjunctivePredicates(cond).collectFirst {
        case EqualTo(a: Attribute, b)
            if a.semanticEquals(keyAttr) && b.deterministic &&
              b.references.nonEmpty &&
              b.references.subsetOf(probe.outputSet) => b
        case EqualTo(b, a: Attribute)
            if a.semanticEquals(keyAttr) && b.deterministic &&
              b.references.nonEmpty &&
              b.references.subsetOf(probe.outputSet) => b
      }
      storeK <- withKr(store, krAttr)
    } yield {
      val closures = rm.holdingClosures
      val closLit = Literal.create(closures,
        ArrayType(ArrayType(IntegerType, containsNull = false),
          containsNull = false))
      // bucket ∈ [0, n) always (total coverage), so element_at's 1-based
      // index is in range; a NULL probe key yields a NULL array and the
      // non-outer Generate drops the row — an equi-join on a null key
      // matches nothing anyway.
      val krsForKey = ElementAt(closLit,
        Add(rm.idxExpr(probeKey), Literal(1)))
      val krOut = AttributeReference("__graft_kr", IntegerType,
        nullable = false)()
      val probeK = Generate(Explode(krsForKey), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(krOut),
        child = probe)
      val newCond = And(cond, EqualTo(krAttr, krOut))
      val newJoin =
        if (storeIsLeft) j.copy(left = storeK, right = probeK,
          condition = Some(newCond))
        else j.copy(left = probeK, right = storeK,
          condition = Some(newCond))
      Project(j.output, newJoin)
    }
  }

  /** Widest directory the join rewrite ships as a closure literal: one
    * expression node, but its ~8 B/region payload rides in every task
    * binary of the probe side — at 64 Ki regions that is ~0.5 MB, past
    * which parquet row-group skipping has to carry the read bound alone
    * (the same decline-past-benefit rule as [[MaxInjectedRegions]]).
    */
  private val MaxJoinClosureRegions = 65536

  private def tableLocation(rel: LogicalRelation): Option[Path] =
    rel.catalogTable.flatMap { ct =>
      scala.util.Try(Paths.get(ct.location)).toOption
    }

  private def pruneConjunct(cond: Expression,
                            rel: LogicalRelation): Option[Expression] = {
    for {
      krAttr <- rel.output.find(a => a.name == "kr" && a.dataType == IntegerType)
      loc <- tableLocation(rel)
      sidecar = loc.resolve("_graft_regions")
      if Files.exists(sidecar)
      (rm, _, keyColOpt) = KeyedStore.parseSidecarAt(sidecar)
      keyCol <- keyColOpt
      keyAttr <- rel.output.find(_.name == keyCol)
      conjuncts = splitConjunctivePredicates(cond)
      // Idempotence + user intent: if kr is already constrained (by a
      // prior firing of this rule, or by the GET/scan API's explicit
      // prune), leave the plan alone.
      if !conjuncts.exists(_.references.contains(krAttr))
      extra <- derive(conjuncts, rm, loc, krAttr, keyAttr)
    } yield extra
  }

  /** Literal key value in the directory's domain, or None if the
    * literal's type doesn't match the key type (a cast-wrapped key never
    * reaches here — we only match bare attribute comparisons).
    */
  private def keyValue(rm: KeyedStore.RegionMap, l: Literal): Option[Any] =
    (rm.typ, l.value) match {
      case (_, null) => None
      case ("long", v: java.lang.Number) => Some(v.longValue())
      case ("string", v: UTF8String) => Some(v.toString)
      case _ => None
    }

  private def derive(conjuncts: Seq[Expression], rm: KeyedStore.RegionMap,
                     loc: Path, krAttr: Attribute,
                     keyAttr: Attribute): Option[Expression] = {
    def isKey(e: Expression): Boolean = e match {
      case a: Attribute => a.semanticEquals(keyAttr)
      case _ => false
    }
    /** Regions the PROBE VALUE may live in: range candidacy, then the
      * region's row bloom (lazy, cached, O(probed regions)) rejects
      * definite misses — missing/stale bloom files fail open.
      */
    def probe(v: Any): Set[Int] = {
      val h = KeyedStore.driverHash60(rm.typ, v)
      rm.holdingIdx(v).filter { i =>
        KeyedStore.loadBloomAt(loc, rm.regions(i).kr).forall(b =>
          graft.functions.BloomAgg.maybeContains(b, h, KeyedStore.BloomK))
      }.toSet
    }
    def range(lo: Option[Any], hi: Option[Any]): Set[Int] =
      rm.rangeIdx(lo.getOrElse(rm.regions.head.min),
                  hi.getOrElse(rm.regions.last.max)).toSet
    /** Region-set abstract interpretation of the predicate tree —
      * Some(s) = "matching rows live only in s"; None = unconstrained.
      * AND intersects (an unconstrained side contributes nothing), OR
      * unions (and is only constrained when BOTH sides are — HBase's
      * MultiRowRangeFilter shape). Exact at region granularity for
      * single intervals: [a,b] meets [lo,∞) and (−∞,hi] iff it meets
      * [lo,hi]. Strict bounds widen to inclusive — pruning may KEEP a
      * region the predicate later empties, never drop a live one; the
      * original predicate always re-applies in full.
      */
    def regionsFor(e: Expression): Option[Set[Int]] = e match {
      case And(a, b) => (regionsFor(a), regionsFor(b)) match {
        case (Some(ra), Some(rb)) => Some(ra.intersect(rb))
        case (ra, rb) => ra.orElse(rb)
      }
      case Or(a, b) =>
        for { ra <- regionsFor(a); rb <- regionsFor(b) } yield ra.union(rb)
      case EqualTo(k, l: Literal) if isKey(k) => keyValue(rm, l).map(probe)
      case EqualTo(l: Literal, k) if isKey(k) => keyValue(rm, l).map(probe)
      // k <=> lit: for a non-null literal, row-matching implies k = lit
      // (null keys match only a null literal, which keyValue rejects).
      case EqualNullSafe(k, l: Literal) if isKey(k) => keyValue(rm, l).map(probe)
      case EqualNullSafe(l: Literal, k) if isKey(k) => keyValue(rm, l).map(probe)
      case In(k, list) if isKey(k) && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.flatMap(l => keyValue(rm, l.asInstanceOf[Literal]))
        if (vs.size == list.size) Some(vs.map(probe).foldLeft(Set.empty[Int])(_ ++ _))
        else None
      case GreaterThanOrEqual(k, l: Literal) if isKey(k) =>
        keyValue(rm, l).map(v => range(Some(v), None))
      case GreaterThan(k, l: Literal) if isKey(k) =>
        keyValue(rm, l).map(v => range(Some(v), None))
      case LessThanOrEqual(k, l: Literal) if isKey(k) =>
        keyValue(rm, l).map(v => range(None, Some(v)))
      case LessThan(k, l: Literal) if isKey(k) =>
        keyValue(rm, l).map(v => range(None, Some(v)))
      // Literal-first spellings (5000 <= key means key >= 5000 → lo).
      case GreaterThanOrEqual(l: Literal, k) if isKey(k) =>
        keyValue(rm, l).map(v => range(None, Some(v)))
      case GreaterThan(l: Literal, k) if isKey(k) =>
        keyValue(rm, l).map(v => range(None, Some(v)))
      case LessThanOrEqual(l: Literal, k) if isKey(k) =>
        keyValue(rm, l).map(v => range(Some(v), None))
      case LessThan(l: Literal, k) if isKey(k) =>
        keyValue(rm, l).map(v => range(Some(v), None))
      case _ => None
    }
    val combined = conjuncts.map(regionsFor).foldLeft(Option.empty[Set[Int]]) {
      case (Some(a), Some(b)) => Some(a.intersect(b))
      case (a, b) => a.orElse(b)
    }
    combined.flatMap { idxs =>
      if (idxs.size >= rm.regions.size) None // nothing pruned; keep the plan clean
      else if (idxs.isEmpty) Some(Literal.FalseLiteral)
      // Prune-list cap: each injected kr is a literal expression node the
      // analyzer/optimizer walks — at 10⁶ regions a half-keyspace range
      // would inject ~5·10⁵ literals and the plan bookkeeping costs more
      // than the skipped IO (the IN-list plan bomb getBatch's scaladoc
      // warns about, on the rule's own side). Past the cap, decline:
      // parquet row-group min/max skipping still bounds the actual read.
      else if (idxs.size > MaxInjectedRegions) None
      else Some(In(krAttr, idxs.toSeq.sorted.map(i => Literal(rm.regions(i).kr))))
    }
  }

  /** Widest kr IN-list the rule will inject. */
  private val MaxInjectedRegions = 1024
}
