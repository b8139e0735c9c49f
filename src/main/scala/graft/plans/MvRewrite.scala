package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
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

  /** A registered JOIN view: `mvPath` holds the parquet of
    * `A ⋈ B ON A.keyA = B.keyB` — ALL columns of both sides, so any
    * column-pruned query over the same join resolves in the view by
    * name. Column names must be globally disjoint across the two sides
    * (the TPC-H prefix convention), or the view's columns would be
    * ambiguous; [[registerJoin]] enforces it. */
  case class JoinDef(name: String, pathA: String, keyA: String,
                     pathB: String, keyB: String, mvPath: String)

  // keyed by (session UUID, canonical pathA, canonical pathB) — the
  // rule also probes the swapped order (inner join commutes)
  private val joinRegistry = TrieMap.empty[(String, String, String), JoinDef]

  /** Build the join-view parquet and register it: any later
    * `scan(pathA) ⋈ scan(pathB) ON keyA = keyB` inner join in this
    * session — in either order, column-pruned or side-filtered — is
    * answered from the view instead of re-joining the bases. Same
    * re-registration discipline as [[register]]: the prior entry is
    * removed BEFORE the rebuild so the build itself cannot be rewritten
    * onto the directory it is overwriting, and a failed rebuild leaves
    * the pair unregistered (fall back to the real join, never wrong). */
  def registerJoin(spark: SparkSession, name: String,
                   pathA: String, keyA: String,
                   pathB: String, keyB: String, mvPath: String): JoinDef = {
    joinRegistry.remove((sessionKey(spark), canon(pathA), canon(pathB)))
    val a = spark.read.parquet(pathA)
    val b = spark.read.parquet(pathB)
    require(a.columns.contains(keyA), s"'$keyA' is not a column of $pathA")
    require(b.columns.contains(keyB), s"'$keyB' is not a column of $pathB")
    val clash = a.columns.toSet & b.columns.toSet
    require(clash.isEmpty,
      s"join-view sides must have disjoint column names; shared: $clash")
    a.join(b, a(keyA) === b(keyB), "inner")
      .write.mode("overwrite").parquet(mvPath)
    val d = JoinDef(name, pathA, keyA, pathB, keyB, mvPath)
    joinRegistry.put((sessionKey(spark), canon(pathA), canon(pathB)), d)
    installRule(spark)
    d
  }

  def deregisterJoin(spark: SparkSession, pathA: String,
                     pathB: String): Unit =
    joinRegistry.remove((sessionKey(spark), canon(pathA), canon(pathB)))

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
      if (registry.isEmpty && joinRegistry.isEmpty) return plan
      plan.transformUp {
        case agg @ Aggregate(grouping, aggExprs, child, _)
            if registry.nonEmpty =>
          rewrite(agg, grouping, aggExprs, child).getOrElse(agg)
        case j: Join if joinRegistry.nonEmpty =>
          rewriteJoin(j).getOrElse(j)
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

    /** Single-root scan path of a relation, or None (multi-root scans
      * must never match — same hazard as the aggregate rewrite). */
    private def scanRoot(lr: LogicalRelation): Option[String] =
      lr.relation match {
        case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
          Some(fs.location.rootPaths.head.toUri.getPath)
        case _ => None
      }

    /** Swap a matching `scan(A) ⋈ scan(B) ON keyA = keyB` inner join —
      * in either side order, through attribute-only Projects and
      * side-local Filters — for a Project over the view scan, aliased
      * back to the ORIGINAL output exprIds so parents resolve unchanged.
      * Side filters replay above the view (every side column exists in
      * the view by name), where parquet pushdown re-plans them against
      * the (join-cardinality-sized) view scan. */
    private def rewriteJoin(j: Join): Option[LogicalPlan] = {
      if (!spark.conf.get("spark.graft.mv.rewrite.enabled", "true")
        .toBoolean) return None
      if (j.joinType != Inner) return None
      val cond = j.condition match {
        case Some(c) => c
        case None => return None
      }
      val (lrL, condsL) = unwrap(j.left) match {
        case Some(x) => x
        case None => return None
      }
      val (lrR, condsR) = unwrap(j.right) match {
        case Some(x) => x
        case None => return None
      }
      val pL = scanRoot(lrL) match {
        case Some(p) => p
        case None => return None
      }
      val pR = scanRoot(lrR) match {
        case Some(p) => p
        case None => return None
      }
      val sk = sessionKey(spark)
      val d = joinRegistry.get((sk, pL, pR))
        .orElse(joinRegistry.get((sk, pR, pL))) match {
        case Some(x) => x
        case None => return None
      }
      // which physical side is the registered A?
      val aSide = if (canon(d.pathA) == pL) lrL else lrR
      val bSide = if (aSide eq lrL) lrR else lrL
      if (canon(d.pathA) != scanRoot(aSide).get ||
          canon(d.pathB) != scanRoot(bSide).get) return None
      // the condition must be exactly the registered key equality,
      // each attr anchored to its own side's scan
      val keyOk = cond match {
        case EqualTo(x: AttributeReference, y: AttributeReference) =>
          (x.name == d.keyA && y.name == d.keyB &&
            aSide.outputSet.contains(x) && bSide.outputSet.contains(y)) ||
          (x.name == d.keyB && y.name == d.keyA &&
            bSide.outputSet.contains(x) && aSide.outputSet.contains(y))
        case _ => false
      }
      if (!keyOk) return None
      val conds = condsL ++ condsR
      if (!conds.forall(_.deterministic)) return None
      val mvRel = spark.read.parquet(d.mvPath).queryExecution.analyzed
      val byName = mvRel.output.map(a => a.name -> a).toMap
      // a duplicated output name cannot map unambiguously (self-join or
      // drifted side schemas) — bail; so does any output or filter
      // column the view lacks, or a dtype drift since the view build
      val outNames = j.output.map(_.name)
      if (outNames.distinct.size != outNames.size) return None
      if (!j.output.forall(a => byName.get(a.name)
        .exists(_.dataType == a.dataType))) return None
      if (!conds.forall(_.references.forall(r => byName.contains(r.name))))
        return None
      val remapped = conds.map(_.transform {
        case a: AttributeReference => byName(a.name)
      })
      val filtered = remapped.foldLeft(mvRel: LogicalPlan)(
        (p, c) => Filter(c, p))
      val outExprs: Seq[NamedExpression] = j.output.map { a =>
        Alias(byName(a.name), a.name)(exprId = a.exprId,
          qualifier = a.qualifier)
      }
      Some(Project(outExprs, filtered))
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

  /** Registered-query form of the JOIN rewrite: builds the
    * orders ⋈ customer view, answers a side-filtered priority report
    * THROUGH the rewrite (the optimized plan scans the view — asserted
    * in MvRewriteSpec), and cleans up. The DuckDB oracle recomputes the
    * real join, so a wrong rewrite (lost rows, broken fan-out,
    * mis-replayed side filter) hash-mismatches every round. */
  def joinRewriteQuery(spark: SparkSession, dir: String): DataFrame = {
    val ordersP = s"$dir/orders.parquet"
    val custP = s"$dir/customer.parquet"
    val mvPath = new java.io.File(
      new java.io.File(sys.props("java.io.tmpdir"), "graft_mv"),
      s"orders_cust_${Math.floorMod(canon(dir).hashCode.toLong, 1L << 20)}")
      .getAbsolutePath
    registerJoin(spark, "orders_x_customer",
      ordersP, "o_custkey", custP, "c_custkey", mvPath)
    try {
      import org.apache.spark.sql.functions.round
      spark.read.parquet(ordersP)
        .join(spark.read.parquet(custP),
          col("o_custkey") === col("c_custkey"), "inner")
        .filter(col("c_mktsegment") === "BUILDING")
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
        .localCheckpoint(true) // execute through the rewrite NOW
    } finally deregisterJoin(spark, ordersP, custP)
  }
}
