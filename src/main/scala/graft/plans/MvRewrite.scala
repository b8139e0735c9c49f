package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, sum}

/** Automatic materialized-view query rewrite — the optimizer half of the
  * materialized-aggregate service ([[graft.operators.MaterializedAgg]]
  * maintains the view; this rule makes queries USE it without being
  * told): a registered SUM/COUNT group-by view over a base parquet path
  * answers any aggregate whose
  *
  *  - grouping keys are a SUBSET of the view's keys (the distributive
  *    roll-up: sum of sums, sum of counts),
  *  - aggregates are `sum(valueCol)` / `count(1)` / `count(*)`,
  *  - filters (if any) touch only grouping-key columns — anything the
  *    view has already collapsed away disqualifies the plan.
  *
  * A matching Aggregate over the base scan is swapped for the same
  * Aggregate over the (group-cardinality-sized) view scan — at 100 TB
  * that is the difference between re-scanning the fact table and
  * reading a few thousand pre-aggregated rows, which is the entire
  * point of maintaining the view. Correctness is structural: SUM and
  * COUNT are distributive, so the rewrite is value-identical by
  * algebra, asserted bit-for-bit in MvRewriteSpec, and `q_mv_rewrite`
  * puts the rewritten plan behind the DuckDB oracle every round (the
  * oracle aggregates the BASE table — a wrong rewrite hash-mismatches).
  *
  * Mechanics: installed through `spark.experimental.extraOptimizations`
  * (the public user-rule batch at the end of the optimizer, after
  * pruning/pushdown have settled the plan into
  * Aggregate ← Project* ← Filter? ← Project* ← LogicalRelation). The
  * replacement sub-plan is rebuilt over the view's relation and aliased
  * back to the ORIGINAL output exprIds, so parent operators resolve
  * unchanged; result types that widen under re-aggregation (decimal
  * sum-of-sums) cast back to the original type. Views register per
  * (session, canonical base path); deregistration makes the rule a
  * no-op, so a scoped user (or `q_mv_rewrite` itself) can clean up. */
object MvRewrite {

  /** A registered view: `mvPath` holds parquet with columns
    * `groupCols :+ sum_value :+ n_rows`. `castTo` pins the value column
    * to an exact type before summing — MANDATORY for float/double value
    * columns, where a raw distributed sum is addition-order-dependent
    * and "view ≡ base" would only hold to rounding error; with a
    * decimal cast the identity is bit-exact (the lake's money
    * discipline). The rewrite then matches `sum(cast(value AS t))`
    * rather than the bare column. */
  case class MvDef(name: String, basePath: String, groupCols: Seq[String],
                   valueCol: String,
                   castTo: Option[org.apache.spark.sql.types.DataType],
                   mvPath: String)

  // keyed by (session UUID, canonical base path) — one view per base
  // path per session; TrieMap because Verify drives one session from
  // several threads
  private val registry = TrieMap.empty[(String, String), MvDef]

  private def canon(p: String): String = new Path(p).toUri.getPath

  private def sessionKey(spark: SparkSession): String =
    java.lang.System.identityHashCode(spark).toString

  private def key(spark: SparkSession, basePath: String): (String, String) =
    (sessionKey(spark), canon(basePath))

  /** Build the view parquet from the base table and register it for
    * rewriting in this session. Idempotent per (session, basePath).
    *
    * Re-registration safety: the prior registration (if any) is removed
    * BEFORE the build runs. Otherwise the live rule would rewrite the
    * rebuild's own aggregate to scan `mvPath` while `overwrite` is
    * deleting that very directory — the job dies mid-scan, the view dir
    * is destroyed, and the stale registry entry then throws inside the
    * optimizer for every later query on the base. A failed rebuild now
    * leaves the base UNREGISTERED (plans fall back to scanning the
    * base — slower, never wrong) rather than registered-and-broken. */
  def register(spark: SparkSession, name: String, basePath: String,
               groupCols: Seq[String], valueCol: String,
               castTo: Option[String], mvPath: String): MvDef = {
    require(groupCols.nonEmpty, "an aggregate view needs grouping keys")
    registry.remove(key(spark, basePath))
    val value = castTo.map(col(valueCol).cast).getOrElse(col(valueCol))
    val df = spark.read.parquet(basePath)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(value).as("sum_value"), count(lit(1)).as("n_rows"))
    df.write.mode("overwrite").parquet(mvPath)
    val d = MvDef(name, basePath, groupCols, valueCol,
      castTo.map(org.apache.spark.sql.types.DataType.fromDDL), mvPath)
    registry.put(key(spark, basePath), d)
    installRule(spark)
    d
  }

  def deregister(spark: SparkSession, basePath: String): Unit =
    registry.remove(key(spark, basePath))

  /** Idempotently append the rewrite rule to the session's user-rule
    * optimizer batch. */
  def installRule(spark: SparkSession): Unit = synchronized {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[RewriteRule]))
      spark.experimental.extraOptimizations =
        existing :+ new RewriteRule(spark)
  }

  /** The optimizer rule. One instance per session (captures it to read
    * the view parquet while rewriting). */
  final class RewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      plan.transformUp {
        case agg @ Aggregate(grouping, aggExprs, child, _) =>
          rewrite(agg, grouping, aggExprs, child).getOrElse(agg)
      }
    }

    /** Unwrap attribute-only Projects and at most the filters above the
      * scan; returns (scan, conjunctive filter conditions). */
    private def unwrap(plan: LogicalPlan,
                       conds: Seq[Expression] = Nil)
        : Option[(LogicalRelation, Seq[Expression])] = plan match {
      case p: Project
          if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(p.child, conds)
      case f: Filter => unwrap(f.child, conds :+ f.condition)
      case lr: LogicalRelation => Some((lr, conds))
      case _ => None
    }

    /** Match ONLY a single-path scan whose one root equals the
      * registered base: `spark.read.parquet(base, other)` scans two
      * roots through one relation, and rewriting on a head-path match
      * would silently drop `other`'s rows. */
    private def scanDef(lr: LogicalRelation): Option[MvDef] =
      lr.relation match {
        case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
          registry.get((sessionKey(spark),
            fs.location.rootPaths.head.toUri.getPath))
        case _ => None
      }

    private def isCountStar(c: Count): Boolean =
      c.children.forall(e => e.foldable && e.eval() != null)

    private def rewrite(agg: Aggregate, grouping: Seq[Expression],
                        aggExprs: Seq[NamedExpression],
                        child: LogicalPlan): Option[LogicalPlan] = {
      val (lr, conds) = unwrap(child) match {
        case Some(x) => x
        case None => return None
      }
      val d = scanDef(lr) match {
        case Some(x) => x
        case None => return None
      }
      // never rewrite the view's own (re)build: the registrar bypasses
      // by building BEFORE registering; a re-registration overwrite
      // also must read the base, so bail while the target scan's
      // aggregate matches the definition exactly AND the caller asked
      // us not to (conf gate, default on)
      if (!spark.conf.get("spark.graft.mv.rewrite.enabled", "true")
        .toBoolean) return None
      val groupAttrs = grouping.map {
        case a: AttributeReference => a
        case _ => return None
      }
      if (!groupAttrs.forall(a => d.groupCols.contains(a.name))) return None
      if (!conds.forall(c => c.deterministic &&
        c.references.forall(r => d.groupCols.contains(r.name)))) return None
      // every aggregate FUNCTION anywhere in the outputs must be a
      // rewritable sum(value) or count(*); scalar post-processing
      // around them (round/cast — the house output convention) and
      // grouping-attr passthroughs rewrite by substitution below
      def valueMatches(e: Expression): Boolean = e match {
        case a: AttributeReference =>
          d.castTo.isEmpty && a.name == d.valueCol
        case Cast(a: AttributeReference, dt, _, _) =>
          d.castTo.contains(dt) && a.name == d.valueCol
        case _ => false
      }
      val innerAggs = aggExprs.flatMap(_.collect {
        case ae: AggregateExpression => ae })
      val allRewritable = innerAggs.nonEmpty && innerAggs.forall {
        case AggregateExpression(s: Sum, Complete, false, None, _) =>
          valueMatches(s.child)
        case AggregateExpression(c: Count, Complete, false, None, _) =>
          isCountStar(c)
        case _ => false
      }
      if (!allRewritable) return None
      // the replacement: the same aggregate over the view relation
      val mvRel = spark.read.parquet(d.mvPath).queryExecution.analyzed
      val byName = mvRel.output.map(a => a.name -> a).toMap
      if (!(d.groupCols :+ "sum_value" :+ "n_rows")
        .forall(byName.contains)) return None
      val remapped = conds.map(_.transform {
        case a: AttributeReference => byName(a.name)
      })
      val filtered = remapped.foldLeft(mvRel: LogicalPlan)(
        (p, c) => Filter(c, p))
      val newGrouping = groupAttrs.map(a => byName(a.name))
      def reAgg(src: Attribute, orig: Expression): Expression = {
        val s = AggregateExpression(Sum(src), Complete, isDistinct = false)
        if (s.dataType == orig.dataType) s else Cast(s, orig.dataType)
      }
      val newAggExprs: Seq[NamedExpression] = aggExprs.map { ne =>
        val sub = ne.transform {
          case ae @ AggregateExpression(_: Sum, Complete, false, None, _) =>
            reAgg(byName("sum_value"), ae)
          case ae @ AggregateExpression(_: Count, Complete, false, None, _) =>
            reAgg(byName("n_rows"), ae)
          case a: AttributeReference if byName.contains(a.name) =>
            byName(a.name)
        }
        sub match {
          case al: Alias => al // transform preserved name + exprId
          case e => Alias(e, ne.name)(exprId = ne.exprId,
            qualifier = ne.qualifier)
        }
      }
      Some(Aggregate(newGrouping, newAggExprs, filtered))
    }
  }

  /** Registered-query form: builds a small view over `orders`, answers
    * the priority revenue rollup THROUGH the rewrite (the optimized
    * plan scans the view — asserted in MvRewriteSpec), and cleans up
    * its registration so the shared Verify session is unaffected. The
    * DuckDB oracle aggregates the BASE table, so a wrong rewrite
    * hash-mismatches in the driver's compare. */
  def rewriteQuery(spark: SparkSession, dir: String): DataFrame = {
    val base = s"$dir/orders.parquet"
    val mvPath = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_mv"),
      s"orders_prio_${Math.floorMod(canon(dir).hashCode.toLong, 1L << 20)}")
      .getAbsolutePath
    register(spark, "orders_by_priority", base,
      Seq("o_orderpriority", "o_orderstatus"), "o_totalprice",
      Some("decimal(18,2)"), mvPath)
    try {
      // roll-up: the view keys are (priority, status); the query groups
      // by priority alone and filters on the other view key. The value
      // column is decimal-pinned (castTo) so base-sum ≡ sum-of-partial-
      // sums holds bit-exactly — over the raw double it would only hold
      // to addition-order rounding.
      spark.read.parquet(base)
        .filter(col("o_orderstatus").isin("F", "O"))
        .groupBy(col("o_orderpriority"))
        .agg(org.apache.spark.sql.functions.round(
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
          .as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
        .localCheckpoint(true) // execute (through the rewrite) NOW,
                               // inside the registration window
    } finally deregister(spark, base)
  }
}
