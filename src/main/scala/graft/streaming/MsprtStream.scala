package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/output rows for [[MsprtStream]]. */
case class ArmMetric(arm: String, value: Double)
case class ArmMoments(arm: String, n: Long, s: Double, q: Double)

/** Per-arm lifetime moment accumulation on `transformWithState`: state is
  * (n, Σx, Σx²) per arm — three numbers, however long the experiment
  * runs. Each micro-batch folds its rows into the arm's state and emits
  * the updated cumulative moments (update mode). */
class ArmMomentsProcessor extends StatefulProcessor[String, ArmMetric, ArmMoments] {
  @transient private var mom: ValueState[(Long, Double, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    mom = getHandle.getValueState[(Long, Double, Double)]("moments",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
        Encoders.scalaDouble), TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[ArmMetric],
                               timerValues: TimerValues): Iterator[ArmMoments] = {
    var (n, s, q) = if (mom.exists()) mom.get() else (0L, 0.0, 0.0)
    rows.foreach { m =>
      n += 1; s += m.value; q += m.value * m.value
    }
    mom.update((n, s, q))
    Iterator.single(ArmMoments(key, n, s, q))
  }
}

/** Streaming mSPRT monitor — the live form of
  * [[graft.operators.EventOps.msprtReadout]]: per-arm cumulative metric
  * moments accumulate in keyed state (TWO keys — the arms — so the heavy
  * fold distributes with the metric stream; nothing funnels through a
  * single task), and [[MsprtStream.pValue]] turns any (A, B) moment pair
  * into the same mixture likelihood ratio and always-valid p the batch
  * readout computes. The dashboard combine is driver-side scalar work on
  * six numbers per read; the anytime-valid guarantee holds because the
  * p-process any consumer tracks is the running min of these per-batch
  * values — the batch operator's exact-decimal oracle-checked form
  * remains the artifact of record.
  *
  * Moments ride doubles here (monitor-grade; RocksDB state is three
  * numbers per arm) — the spec pins exact agreement with the batch
  * readout on binary-exact planted values. */
object MsprtStream {

  def armMoments(metrics: Dataset[ArmMetric]): Dataset[ArmMoments] = {
    import metrics.sparkSession.implicits._
    metrics.groupByKey(_.arm)
      .transformWithState(new ArmMomentsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** (lift, ln Λ, p) from one (A, B) cumulative moment pair — the
    * identical scalar tree as the batch readout's per-day row (log
    * space, like the batch readout: the raw ratio overflows repr
    * stability and eventually double range as n grows). Returns NaN
    * ln Λ and p = 1 when a side is degenerate (empty arm or zero
    * variance). */
  def pValue(a: ArmMoments, b: ArmMoments, tau: Double = 5.0)
      : (Double, Double, Double) = {
    if (a.n < 2 || b.n < 2) return (Double.NaN, Double.NaN, 1.0)
    val ma = a.s / a.n
    val mb = b.s / b.n
    val s2 = ((a.q - a.n * ma * ma) + (b.q - b.n * mb * mb)) /
      (a.n + b.n - 2).toDouble
    val vn = s2 * (1.0 / a.n + 1.0 / b.n)
    if (!(vn > 0)) return (mb - ma, Double.NaN, 1.0)
    val tau2 = tau * tau
    val delta = mb - ma
    val loglam = 0.5 * math.log(vn / (vn + tau2)) +
      delta * delta * tau2 / (2.0 * vn * (vn + tau2))
    (delta, loglam, math.min(1.0, math.exp(-loglam)))
  }
}
