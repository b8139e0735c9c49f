package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Algebraic incremental maintenance of a SUM/COUNT group-by view — the
  * materialized-aggregate service a lake API pairs with its change-data
  * feed: instead of re-aggregating the whole table on every commit, the
  * stored view absorbs a delta computed from the CHANGED rows only
  * ([[graft.sources.SnapshotTable.rowDiff]]), so refresh cost is
  * proportional to the commit, not the table.
  *
  * Classic delta rules for distributive aggregates: an added row
  * contributes (+value, +1) under its group, a removed row (−value, −1),
  * and an update contributes BOTH — under the old group and the new one,
  * which is exactly what makes group-moving updates correct. Groups whose
  * maintained count reaches zero are dropped (they no longer exist in the
  * base table). SUM and COUNT are self-maintainable; AVG derives as
  * sum/count downstream. MIN/MAX are deliberately absent — they are not
  * self-maintainable under deletes (a removed max forces a rescan of its
  * group) and belong to the stats-sidecar rescan path instead.
  *
  * Exactness: the delta is summed in the value column's own type — pass
  * an integral or decimal column (the lake's money discipline) for
  * bit-exact maintenance; [[MaterializedAggSpec]] asserts refresh ≡
  * full recompute.
  */
object MaterializedAgg {

  /** The view definition: per-group exact sum + row count. */
  def define(table: DataFrame, groupCol: String, valueCol: String): DataFrame =
    table.groupBy(col(groupCol))
      .agg(sum(col(valueCol)).as("sum_value"), count(lit(1)).as("n_rows"))

  /** Fold one commit's change rows into the stored view. `changes` is
    * [[graft.sources.SnapshotTable.rowDiff]] output whose structs carry
    * `groupCol` and `valueCol`. One aggregate over the (commit-sized)
    * change set + one outer join against the (group-count-sized) view —
    * the base table is never read. */
  def refresh(mv: DataFrame, changes: DataFrame,
              groupCol: String, valueCol: String): DataFrame = {
    val minus = changes.filter(col("change_type").isin("removed", "updated"))
      .select(col(s"old_row.$groupCol").as(groupCol),
        (-col(s"old_row.$valueCol")).as("dv"), lit(-1L).as("dn"))
    val plus = changes.filter(col("change_type").isin("added", "updated"))
      .select(col(s"new_row.$groupCol").as(groupCol),
        col(s"new_row.$valueCol").as("dv"), lit(1L).as("dn"))
    val delta = minus.union(plus)
      .groupBy(col(groupCol))
      .agg(sum(col("dv")).as("dv"), sum(col("dn")).as("dn"))
    mv.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("sum_value"), lit(0)) + coalesce(col("dv"), lit(0)))
          .as("sum_value"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_rows"))
      .filter(col("n_rows") > 0)
  }
}
