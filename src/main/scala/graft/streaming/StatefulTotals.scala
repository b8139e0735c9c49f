package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/output rows for [[StatefulTotals]] — plain case classes so the
  * processor's encoders are product-derived. */
case class UserActivity(user_id: Long, event_type: String)
case class UserTotals(user_id: Long, n_events: Long, n_purchases: Long)

/** Lifetime per-user totals on Spark 4's `transformWithState` — the
  * successor API to mapGroupsWithState: typed per-key [[ValueState]]
  * slots allocated from the processor handle, per-state TTL, timers, and
  * initial-state support, running on the RocksDB state store. This is
  * the arbitrary-stateful-processing surface a production pipeline
  * standardizes on going forward; the repo keeps both generations
  * (sessionization/dedup on mapGroupsWithState, this on
  * transformWithState) because migrations live with both.
  *
  * The processor itself is the canonical running-aggregate shape: read
  * the key's state, fold the batch's rows, write back, emit the updated
  * row (update output mode — one row per touched key per batch). State
  * is two longs per user; TTL is configurable so abandoned keys age out
  * of RocksDB instead of accumulating forever. */
class UserTotalsProcessor extends StatefulProcessor[Long, UserActivity, UserTotals] {
  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserActivity],
                               timerValues: TimerValues): Iterator[UserTotals] = {
    var (n, p) = if (totals.exists()) totals.get() else (0L, 0L)
    rows.foreach { e =>
      n += 1
      if (e.event_type == "purchase") p += 1
    }
    totals.update((n, p))
    Iterator.single(UserTotals(key, n, p))
  }
}

object StatefulTotals {

  /** Streaming lifetime totals per user: every micro-batch emits the
    * updated (user, n_events, n_purchases) row for each touched user.
    * Requires the RocksDB state-store provider (the transformWithState
    * contract) — see GraftSession.RocksDbProvider. */
  def userTotals(events: Dataset[UserActivity]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
