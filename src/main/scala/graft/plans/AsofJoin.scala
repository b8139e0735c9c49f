package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge

/** A native AS-OF JOIN — the whole-operator custom plan path
  * (LogicalPlan → Strategy → SparkPlan): for every left row, attach the
  * LAST right row with the same key whose time is ≤ the left row's time.
  *
  * Spark has no as-of join; the composable workaround (union + window,
  * see EventOps.asofLastView) works but carries the union through a
  * window sort and cannot attach more than one right column without
  * carrying them all through the window. This operator is the real
  * thing: each side shuffles ONCE on its key and sorts by (key, time) —
  * exactly a sort-merge join's distribution — then a single forward
  * merge pass per partition attaches the match. O(left + right) per
  * partition, no window state wider than one buffered right row.
  *
  * Semantics: right rows with NULL key or time never match; left rows
  * with NULL key or time (or no qualifying right row) get NULL right
  * columns. Time can be any orderable type — pass a struct to break
  * ties, e.g. struct(ts, event_id). Not whole-stage-codegen'd: the merge
  * is a single tight iterator per partition and the children's
  * scans/sorts still codegen normally.
  */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // both sides cluster by key (EnsureRequirements co-partitions the two
  // ClusteredDistributions) and sort by (key, time) — the sort-merge
  // join shape, one shuffle per side
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = BindReferences.bindReference(leftKey, lOut)
    val lt = BindReferences.bindReference(leftTime, lOut)
    val rk = BindReferences.bindReference(rightKey, rOut)
    val rt = BindReferences.bindReference(rightTime, rOut)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rBuf = rIter.buffered
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // bind against the NULLABLE right attrs (outAttrs), not the child's
      // non-nullable originals — else codegen skips null checks and NPEs
      // on the null-filled unmatched row
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      var lastMatch: InternalRow = null
      var matchKey: Any = null
      lIter.map { lRow =>
        val k = lk.eval(lRow)
        val t = lt.eval(lRow)
        var matched: InternalRow = null
        if (k != null && t != null) {
          // new left key invalidates the buffered match
          if (matchKey == null || keyOrd.compare(matchKey, k) != 0) {
            lastMatch = null; matchKey = null
          }
          // advance the right side: discard earlier keys and null
          // keys/times, absorb same-key rows with time <= t
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hk = rk.eval(head)
            if (hk == null) { rBuf.next(); () }
            else {
              val c = keyOrd.compare(hk.asInstanceOf[AnyRef], k.asInstanceOf[AnyRef])
              if (c < 0) { rBuf.next(); () }
              else if (c == 0) {
                val ht = rt.eval(head)
                if (ht == null) { rBuf.next(); () }
                else if (timeOrd.compare(ht.asInstanceOf[AnyRef], t.asInstanceOf[AnyRef]) <= 0) {
                  lastMatch = rBuf.next().copy()
                  // struct keys are nested views into the iterator's
                  // reused row buffer — copy before holding across rows
                  matchKey = k match {
                    case r: InternalRow => r.copy()
                    case other => other
                  }
                } else advancing = false
              } else advancing = false
            }
          }
          if (matchKey != null && keyOrd.compare(matchKey, k) == 0) matched = lastMatch
        }
        proj(joined(lRow, if (matched != null) matched else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User API: `AsofJoin(purchases, views, key = "user_id", time = "tkey")`.
  * Column names resolve against each side; the right side is re-aliased
  * with fresh expression ids so self-derived inputs (both sides from the
  * same table — the common case) never collide. */
object AsofJoin {
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    Bridge.addStrategy(spark, AsofJoinStrategy)
    val lPlan = Bridge.analyzed(left)
    // fresh exprIds on the right: both sides may derive from one table
    val rAliased = Project(
      Bridge.analyzed(right).output.map(a => Alias(a, a.name)()), Bridge.analyzed(right))
    def find(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found among ${out.map(_.name).mkString(", ")}"))
    val rOut = rAliased.output
    require(find(lPlan.output, leftKey).dataType == find(rOut, rightKey).dataType,
      "as-of join key types must match")
    require(find(lPlan.output, leftTime).dataType == find(rOut, rightTime).dataType,
      "as-of join time types must match")
    Bridge.ofRows(spark, AsofJoinPlan(lPlan, rAliased,
      find(lPlan.output, leftKey), find(rOut, rightKey),
      find(lPlan.output, leftTime), find(rOut, rightTime)))
  }

  def apply(left: DataFrame, right: DataFrame, key: String, time: String): DataFrame =
    apply(left, right, key, key, time, time)
}
