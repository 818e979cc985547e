package graft.plans

import graft.core.Intervals
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/**
 * Marker node for transparent rollup routing in SQL (A14 lifted into the
 * optimizer). `child` is the LWW-deduped points plan a temp view exposes;
 * `rollup` is the analyzed plan of the stored composite rollup
 * ([[graft.rollup.Rollup.build]] schema: series_id, metric, tags,
 * bucket_ts, sum, cnt, min, max, last, sumsq) covering `child`'s ENTIRE
 * time domain at `rollupSeconds` granularity — the registration contract,
 * exactly the completeness the engine-path router assumes
 * ([[graft.rollup.Rollup.downsampleRouted]]).
 *
 * The node is a pure pass-through: unrewritten it plans as its child (the
 * [[RollupRouting]] rule strips every marker it does not serve, in the
 * same pass), so a query that cannot be served is simply the raw query.
 * `rollup` rides as a FIELD, not a child, so optimizer transforms do not
 * descend into the store plan until it is actually substituted.
 *
 * `rollupUntil` is the flush frontier for an ingest-MAINTAINED store
 * whose close-gated flush has not covered the open tail yet
 * ([[graft.streaming.IngestJob.rollupFrontier]]): the rule serves only
 * queries whose upper bound sits at or below it — the engine router's
 * closed-segments-from-rollup / open-tail-from-raw discipline
 * ([[graft.rollup.Rollup.downsampleHybrid]]), collapsed to serve-or-raw
 * at the SQL layer. `Long.MaxValue` = complete store.
 */
case class RollupServable(
    child: LogicalPlan,
    rollup: LogicalPlan,
    rollupSeconds: Long,
    rollupUntil: Long = Long.MaxValue) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): RollupServable =
    copy(child = newChild)
}

/**
 * The reference's serve-from-rollup decision
 * (opentsdb/.../storage/AerospikeBatchQueryNode.java:196-226: stored
 * aggregator + exact interval divisibility) re-expressed as a Catalyst
 * rewrite, so plain `spark.sql` over the facade view gets A14 routing
 * transparently — the engine-path router ([[graft.rollup.Rollup]]) serves
 * programmatic queries; this rule serves the SQL front end from the SAME
 * stored composite.
 *
 * A downsample-shaped aggregate
 *
 * {{{
 * SELECT metric, tags['user'], ts - ts % N, sum(nan-cleaned value)
 * FROM graft_points_lww WHERE ts >= a AND ts < b GROUP BY 1, 2, 3
 * }}}
 *
 * over a [[RollupServable]]-marked view is rewritten to scan ONLY the
 * rollup store when every condition for an exact answer holds:
 *
 *  - every grouping expression references only series identity columns
 *    (metric / tags / series_id) or is the epoch floor `ts - ts % N`
 *    with `N` a positive multiple of the rollup interval;
 *  - every aggregate is sum/min/max/count/avg of the NaN-cleaned value
 *    (`CASE WHEN isnan(value) THEN NULL ELSE value END`, or
 *    `nanvl(value, NULL)`) — the exact event space the stored composite
 *    was built over. sum→Σsum, min→min(min), max→max(max),
 *    count→Σcnt, avg→Σsum/Σcnt (the reference's avg-as-sum/count
 *    rewrite, core/downsample/AggregatorType.java);
 *  - every ts range bound is rollup-aligned (`a % rSec == 0`), so stored
 *    rows clip exactly like raw points — an unaligned bound would let an
 *    edge composite row smuggle out-of-range points into the first or
 *    last bucket;
 *  - all other conjuncts reference only series identity columns (they
 *    carry over to the store scan: the composite holds per-series rows).
 *
 * Anything else — count(*) (row count ≠ value count), plain sum(value)
 * (NaN-poisoning semantics the composite cannot reproduce), predicates
 * on value/seq, unaligned bounds — falls back by stripping the marker:
 * the query runs raw and stays correct, it just does not route. The
 * output schema (names, exprIds, types) is preserved exactly, so parent
 * operators never notice the substitution.
 *
 * A MAINTAINED store (`rollupUntil` < ∞) additionally splits a
 * frontier-straddling range hybrid: closed query buckets from the store
 * UNION the open tail raw, the engine router's discipline
 * ([[graft.rollup.Rollup.downsampleHybrid]]) at the SQL layer — a
 * dashboard's trailing window never forfeits the store for its closed
 * days. Results equal the raw computation up to floating-point summation
 * ORDER (the same nondeterminism any Spark aggregation has across
 * partitionings); the oracle rows pin equality at the engine's
 * round-4 contract.
 *
 * Scale: this is the difference between a SQL dashboard aggregating a
 * 100 TB fact table and the same dashboard reading a composite that is
 * ~1/3600th of it — with filter pushdown and column pruning then applying
 * to the STORE scan for free.
 */
object RollupRouting extends Rule[LogicalPlan] with PredicateHelper {

  /** Register `viewName` as the LWW-deduped points view with the rollup
   *  store attached for transparent serving. `rollupStore` must be the
   *  exact composite of `points` over its whole time domain at
   *  `rollupInterval` (the [[graft.rollup.Rollup.build]] output, e.g.
   *  the ingest-maintained store). */
  def registerView(spark: SparkSession, points: DataFrame, rollupStore: DataFrame,
      rollupInterval: String, viewName: String,
      rollupUntil: Long = Long.MaxValue): Unit = {
    val deduped = graft.query.QueryEngine.dedupeConfigured(points)
    val marker = RollupServable(
      deduped.queryExecution.analyzed,
      rollupStore.queryExecution.analyzed,
      Intervals.toSeconds(rollupInterval),
      rollupUntil)
    GraftSqlBridge.ofRows(spark, marker).createOrReplaceTempView(viewName)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate if unwrap(agg.child).isDefined =>
      tryServe(agg).getOrElse(agg.transform { case m: RollupServable => m.child })
    // marker in any non-servable position (SELECT *, joins, limits…):
    // plain pass-through
    case m: RollupServable => m.child
  }

  /** Peel filters and projects off the path from an aggregate to the
   *  marker, collecting filter conjuncts and every alias definition
   *  (temp-view resolution inserts an alias-compensation Project with
   *  fresh exprIds; PullOutGroupingExpressions extracts complex group
   *  exprs into `_groupingexpression` aliases; column pruning inserts
   *  attribute-only Projects). Conjuncts are returned raw — inline their
   *  attrs through the alias map before matching. Non-deterministic
   *  aliases cannot be inlined, so they fail the peel (→ raw fallback). */
  private def unwrap(plan: LogicalPlan)
      : Option[(Seq[Expression], Map[ExprId, Expression], RollupServable)] =
    plan match {
      case m: RollupServable => Some((Nil, Map.empty, m))
      case Filter(cond, c) =>
        unwrap(c).map { case (cs, sub, m) =>
          (splitConjunctivePredicates(cond) ++ cs, sub, m)
        }
      case Project(list, c) =>
        val defs = list.map {
          case _: AttributeReference => Some(Nil)
          case al @ Alias(child, _) if child.deterministic => Some(Seq(al.exprId -> child))
          case _ => None
        }
        if (defs.contains(None)) None
        else unwrap(c).map { case (cs, sub, m) =>
          (cs, sub ++ defs.flatten.flatten, m)
        }
      case _ => None
    }

  private object IntegralLiteral {
    // the rule can run before ConstantFolding reaches the expression, so
    // evaluate foldable casts (`cast(86400 as bigint)`) instead of
    // requiring a bare literal
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case c: Cast if c.foldable && (c.dataType == LongType || c.dataType == IntegerType) =>
        c.eval() match {
          case v: java.lang.Long => Some(v)
          case v: java.lang.Integer => Some(v.toLong)
          case _ => None
        }
      case _ => None
    }
  }

  private def isNullLiteral(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case c: Cast => isNullLiteral(c.child)
    case _ => false
  }

  private def tryServe(agg: Aggregate): Option[LogicalPlan] = {
    val (rawConjuncts, renames, marker) = unwrap(agg.child).get
    val rSec = marker.rollupSeconds

    /** Inline view-compensation / pulled-out-grouping aliases down to the
     *  marker's own attributes, so all pattern matching below sees one id
     *  space over one expression shape. Alias chains are short; iterate
     *  to a bounded fixpoint. */
    def normalize(e: Expression): Expression = {
      var cur = e
      var i = 0
      while (i < 8 && cur.references.exists(a => renames.contains(a.exprId))) {
        cur = cur.transformUp {
          case a: AttributeReference if renames.contains(a.exprId) => renames(a.exprId)
        }
        i += 1
      }
      cur
    }
    val conjuncts = rawConjuncts.map(normalize)
    // ColumnPruning's generic case prunes the marker's CHILD down to what
    // the query references (a count() wrapper needs no `value`; a
    // groups-only distinct may not need `ts`), so these are looked up
    // lazily — each is required only by the patterns that mention it
    val base = marker.child.output
    def baseAttr(n: String) = base.find(_.name == n)
    val tsA = baseAttr("ts")
    val valueA = baseAttr("value")

    // fresh attribute ids per substitution when the store is a leaf
    // relation — two rewrites in one query must not share exprIds
    val rollup = marker.rollup match {
      case r: MultiInstanceRelation with LeafNode => r.newInstance()
      case other => other
    }
    val rollupSet = AttributeSet(rollup.output)
    def rAttr(n: String) = rollup.output.find(_.name == n)
    val (btsA, sumA, cntA, minA, maxA, sumsqA) =
      (rAttr("bucket_ts").getOrElse(return None), rAttr("sum").getOrElse(return None),
        rAttr("cnt").getOrElse(return None), rAttr("min").getOrElse(return None),
        rAttr("max").getOrElse(return None), rAttr("sumsq").getOrElse(return None))

    val dimSubst: Map[ExprId, Attribute] = Seq("metric", "tags", "series_id")
      .flatMap(n => baseAttr(n).zip(rAttr(n)))
      .map { case (a, b) => a.exprId -> b }.toMap

    def isTs(a: AttributeReference) = tsA.exists(_.exprId == a.exprId)
    def isValue(a: AttributeReference) = valueA.exists(_.exprId == a.exprId)

    /** `value` only in its NaN-cleaned form — the composite's event space. */
    def cleanValue(e: Expression): Boolean = e match {
      case CaseWhen(Seq((IsNaN(v: AttributeReference), nl)), Some(el: AttributeReference))
        if isValue(v) && el.exprId == v.exprId && isNullLiteral(nl) => true
      case NaNvl(v: AttributeReference, nl)
        if isValue(v) && isNullLiteral(nl) => true
      case _ => false
    }

    def rewriteAgg(ae: AggregateExpression): Option[Expression] = ae match {
      case AggregateExpression(fn, Complete, false, None, _) =>
        def fresh(f: AggregateFunction) = AggregateExpression(f, Complete, isDistinct = false)
        fn match {
          case s: Sum if cleanValue(s.child) => Some(fresh(Sum(sumA)))
          case m: Min if cleanValue(m.child) => Some(fresh(Min(minA)))
          case m: Max if cleanValue(m.child) => Some(fresh(Max(maxA)))
          case a: Average if cleanValue(a.child) =>
            Some(Divide(fresh(Sum(sumA)), Cast(fresh(Sum(cntA)), DoubleType)))
          case c: Count if c.children.size == 1 && cleanValue(c.children.head) =>
            // count(clean) is non-null; Σcnt over ≥1 store row never null
            // either, but keep the type contract explicit
            Some(Coalesce(Seq(fresh(Sum(cntA)), Literal(0L))))
          case sd: StddevSamp if cleanValue(sd.child) =>
            // sample stddev from the stored moments — the reason the
            // reference's composite carries sumofsquare at all
            // (core/downsample/SumOfSquareAggregator.java:24); the same
            // reconstruction Rollup.serve uses, with greatest(0, ·)
            // clamping the tiny negative variance FP can produce when
            // all values are equal
            val n = Cast(fresh(Sum(cntA)), DoubleType)
            val s = fresh(Sum(sumA))
            val sq = fresh(Sum(sumsqA))
            val variance = Divide(Subtract(sq, Divide(Multiply(s, s), n)),
              Subtract(n, Literal(1.0)))
            Some(CaseWhen(
              Seq((GreaterThan(n, Literal(1.0)),
                Sqrt(Greatest(Seq(Literal(0.0), variance))))),
              Some(Literal(null, DoubleType))))
          case _ => None
        }
      case _ => None
    }

    /** Substitute base→store attrs; None when anything non-servable
     *  remains (raw ts/value/seq outside the recognized patterns). The
     *  aggregate replacements are resolved FIRST, by node identity, so
     *  the traversal never re-inspects a replacement's own store-side
     *  AggregateExpressions (a reference-based "already done" test would
     *  wrongly wave through reference-FREE aggregates like count(*)). */
    def rewriteExpr(e: Expression): Option[Expression] = {
      val aggMap = new java.util.IdentityHashMap[AggregateExpression, Expression]
      e.foreach {
        case ae: AggregateExpression =>
          rewriteAgg(ae) match {
            case Some(x) => aggMap.put(ae, x)
            case None => return None
          }
        case _ => ()
      }
      var ok = true
      val out = e.transformDown {
        case ae: AggregateExpression if aggMap.containsKey(ae) => aggMap.get(ae)
        case sub @ Subtract(t1: AttributeReference,
            Remainder(t2: AttributeReference, IntegralLiteral(n), _), _)
            if isTs(t1) && isTs(t2) =>
          if (n <= 0 || n % rSec != 0) { ok = false; sub }
          // bucket_ts is already ts-floored to rSec | N, so the same
          // floor over bucket_ts lands every store row in its raw bucket
          else sub.transform { case a: AttributeReference if isTs(a) => btsA }
        case a: AttributeReference if dimSubst.contains(a.exprId) => dimSubst(a.exprId)
      }
      if (ok && out.references.subsetOf(rollupSet)) Some(out) else None
    }

    // --- filter: ts bounds must be rollup-aligned; the rest must be
    // series-identity predicates that carry over to the store scan.
    // `kept` holds the normalized ORIGINAL forms too — the hybrid raw
    // branch below needs them in base-attribute space.
    var lo = Option.empty[Long]
    var hi = Option.empty[Long]
    val carried = Seq.newBuilder[Expression]
    val kept = Seq.newBuilder[Expression]
    conjuncts.foreach {
      case GreaterThanOrEqual(t: AttributeReference, IntegralLiteral(v)) if isTs(t) =>
        lo = Some(lo.fold(v)(math.max(_, v)))
      case GreaterThan(t: AttributeReference, IntegralLiteral(v)) if isTs(t) && v < Long.MaxValue =>
        lo = Some(lo.fold(v + 1)(math.max(_, v + 1)))
      case LessThan(t: AttributeReference, IntegralLiteral(v)) if isTs(t) =>
        hi = Some(hi.fold(v)(math.min(_, v)))
      case LessThanOrEqual(t: AttributeReference, IntegralLiteral(v)) if isTs(t) && v < Long.MaxValue =>
        hi = Some(hi.fold(v + 1)(math.min(_, v + 1)))
      // null ts ⟺ null bucket_ts (the floor is null-preserving)
      case IsNotNull(t: AttributeReference) if isTs(t) =>
        carried += IsNotNull(btsA)
        kept += IsNotNull(t)
      case other =>
        carried += rewriteExpr(other).getOrElse(return None)
        kept += other
    }
    // pre-1970 instants: the store buckets with Spark's TRUNCATED `%`
    // (bucket_ts = -3600 holds ts ∈ (-7200, -3600]), so range clipping
    // by bucket_ts would admit out-of-range points — refuse and run raw,
    // the same v >= 0 assumption SegmentPruning makes
    if (lo.exists(_ < 0) || hi.exists(_ < 0)) return None
    if (lo.exists(v => Math.floorMod(v, rSec) != 0L)) return None
    if (hi.exists(v => Math.floorMod(v, rSec) != 0L)) return None

    // --- grouping: identity columns, or exactly the ts floor pattern
    val floorNs = scala.collection.mutable.Set.empty[Long]
    val normGroups = agg.groupingExpressions.map(normalize)
    val newGroups = normGroups.map { g =>
      val refsTs = g.references.exists {
        case a: AttributeReference => isTs(a)
        case _ => false
      }
      val exactFloor = g match {
        case Subtract(t1: AttributeReference,
            Remainder(t2: AttributeReference, IntegralLiteral(n), _), _)
            if isTs(t1) && isTs(t2) =>
          floorNs += n; true
        case _ => false
      }
      if (refsTs && !exactFloor) return None
      rewriteExpr(g).getOrElse(return None)
    }

    // --- aggregate output: preserve every name and exprId
    val normResult = agg.aggregateExpressions.map(normalize)
    val newResult = agg.aggregateExpressions.zip(normResult).map { case (ne, norm) =>
      rewriteExpr(norm).getOrElse(return None) match {
        case n: NamedExpression if n.exprId == ne.exprId => n
        case other => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }

    // --- the flush frontier of a MAINTAINED store: a range wholly below
    // it serves outright; a straddling range SPLITS on the largest query
    // bucket boundary at or below it — closed buckets from the store,
    // the open tail from raw ([[graft.rollup.Rollup.downsampleHybrid]]'s
    // no-partial-merge discipline at the SQL layer). The split needs the
    // bucket floor ON the grouping key (exactly one floor interval), so
    // no group's rows land on both sides.
    val frontierSplit: Option[Long] =
      if (marker.rollupUntil == Long.MaxValue || hi.exists(_ <= marker.rollupUntil)) None
      else if (floorNs.size != 1) return None // no or ambiguous bucket axis
      else {
        val n = floorNs.head
        val f = marker.rollupUntil - Math.floorMod(marker.rollupUntil, n)
        if (lo.exists(_ >= f) || f <= 0) return None // nothing closed: all raw
        Some(f)
      }
    val servedHi = frontierSplit.orElse(hi)

    val bounds =
      lo.map(v => GreaterThanOrEqual(btsA, Literal(v)).asInstanceOf[Expression]).toSeq ++
        servedHi.map(v => LessThan(btsA, Literal(v)))
    val newCond = (bounds ++ carried.result()).reduceOption(And)
    val newChild = newCond.fold(rollup)(Filter(_, rollup))
    val served = agg.copy(groupingExpressions = newGroups,
      aggregateExpressions = newResult, child = newChild)
    // the substitution must be invisible to parents: same schema exactly
    val sameSchema = served.output.size == agg.output.size &&
      served.output.zip(agg.output).forall { case (a, b) =>
        a.name == b.name && a.dataType == b.dataType && a.exprId == b.exprId
      }
    if (!sameSchema) return None

    frontierSplit match {
      case None => Some(served)
      case Some(f) =>
        // raw tail [f, hi): the original aggregate, normalized to the
        // marker's own attribute space, over the unrouted child. Result
        // aliases get FRESH ids — Union takes its output from the served
        // branch, and sibling branches must not share defining ids.
        val ts = tsA.getOrElse(return None)
        val rawCond = (Seq[Expression](GreaterThanOrEqual(ts, Literal(f))) ++
          hi.map(v => LessThan(ts, Literal(v))) ++ kept.result()).reduce(And)
        // normalize() can turn a bare view attribute into a non-named
        // expression (a derived-table alias inlines to GetMapValue /
        // the floor arithmetic) — re-alias those under the original
        // output name rather than relying on the input being named
        val rawResult = agg.aggregateExpressions.zip(normResult).map {
          case (_, a: Alias) => Alias(a.child, a.name)()
          case (_, n: NamedExpression) => n
          case (ne, other) => Alias(other, ne.name)()
        }
        val rawAgg = Aggregate(normGroups, rawResult, Filter(rawCond, marker.child))
        val typesMatch = rawAgg.output.zip(served.output).forall { case (a, b) =>
          a.dataType == b.dataType
        }
        if (typesMatch) Some(Union(Seq(served, rawAgg))) else None
    }
  }
}
