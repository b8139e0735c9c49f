package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming distribution-drift monitor: the windowed-PSI pairing of
  * [[AnomalyStream]] (continuous windowed aggregation into a sink) with
  * [[graft.operators.CatalogOps.distributionDrift]]'s PSI machinery — the
  * check a production corpus monitor actually runs: "did this hour's/day's
  * VALUE DISTRIBUTION drift from the reference?", not just "did the count
  * spike?".
  *
  * Same lambda-free split as the anomaly pipeline: the stream maintains
  * per-window per-bin counts continuously (bounded state: one open window
  * per bin), emitted append-mode exactly once per closed window; PSI
  * scoring stays a cheap batch pass over the bounded sink — report size is
  * O(windows × bins) regardless of stream volume, and every share derives
  * from exact integer counts (driftCore's determinism discipline, with the
  * per-bucket sum decimal-routed like surprisal so the PSI total is
  * aggregation-order-independent). */
object DriftStream {

  /** Streaming: per-window per-bin counts of `valueCol` over event-time
    * `ts` — the histogram stream feeding [[windowedPsi]]. Append mode:
    * each (window, bin) row is emitted exactly once when the watermark
    * passes the window end. */
  def binnedCounts(stream: DataFrame, valueCol: String, binWidth: Double,
                   windowDur: String = "1 hour",
                   watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur),
        floor(col(valueCol) / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("bin"), col("n"))

  /** Batch over any (bucket, bin, n) frame (the [[binnedCounts]] sink, or
    * a plain windowed group-by): one PSI per bucket against the
    * `reference` (bin, n) distribution, alarming at `alarmAt` (0.25 is
    * the conventional "significant shift" PSI threshold).
    *
    * Bin universe per bucket = reference bins ∪ the bucket's observed
    * bins (a bin missing from either side still contributes — mass
    * appearing in NEW bins is exactly what drift looks like); shares are
    * Laplace-smoothed like driftCore so empty bins stay finite. Each
    * per-bin term is rounded to 6 decimals and summed as decimal, so the
    * per-bucket PSI is engine-exact and partitioning-independent. */
  def windowedPsi(windows: DataFrame, reference: DataFrame,
                  alarmAt: Double = 0.25): DataFrame = {
    val w = windows.select(col("bucket"), col("bin"),
      col("n").cast("long").as("n_w"))
    val r = reference.select(col("bin"), col("n").cast("long").as("n_r"))
    // buckets × reference bins: both sides bounded (time windows / bins)
    val grid = w.select(col("bucket")).distinct().crossJoin(broadcast(r))
    val base = grid.join(w, Seq("bucket", "bin"), "full_outer")
      .select(col("bucket"), col("bin"),
        coalesce(col("n_w"), lit(0L)).as("n_w"),
        coalesce(col("n_r"), lit(0L)).as("n_r"))
    val tot = base.groupBy(col("bucket"))
      .agg(sum(col("n_w")).as("tw"), sum(col("n_r")).as("tr"),
        count(lit(1)).as("nbins"))
    val pw = (col("n_w") + lit(0.5)) / (col("tw") + lit(0.5) * col("nbins"))
    val pr = (col("n_r") + lit(0.5)) / (col("tr") + lit(0.5) * col("nbins"))
    base.join(broadcast(tot), "bucket")
      .select(col("bucket"), col("n_w"),
        round((pw - pr) * log(pw / pr), 6)
          .cast(DecimalType(18, 6)).as("term"))
      .groupBy(col("bucket"))
      .agg(sum(col("n_w")).as("n_events"), sum(col("term")).as("psi_sum"))
      .select(col("bucket"), col("n_events"),
        round(col("psi_sum").cast("double"), 6).as("psi"),
        (col("psi_sum").cast("double") >= alarmAt).as("alarm"))
      .orderBy(col("bucket"))
  }

  /** ROLLING-reference PSI: each bucket scored against the aggregate
    * distribution of its own TRAILING `refWindows` buckets (excluding
    * itself) — the self-healing form of [[windowedPsi]]: a fixed
    * reference flags honest seasonal change forever, a rolling one alarms
    * AT an abrupt shift and then adapts once the reference window rolls
    * past it (asserted in DriftStreamSpec). Buckets whose trailing
    * reference is empty report `alarm = false` (nothing to compare
    * against — the monitor's warm-up period).
    *
    * The trailing sums are one RANGE-frame window per bin over the dense
    * bucket × bin grid (both bounded), then the identical smoothed
    * decimal-summed PSI math as the fixed-reference form. */
  def rollingPsi(windows: DataFrame, refWindows: Int, windowSeconds: Long,
                 alarmAt: Double = 0.25): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val w = windows.select(col("bucket"), col("bin"),
      col("n").cast("long").as("n"))
    val grid = w.select(col("bucket")).distinct()
      .crossJoin(w.select(col("bin")).distinct())
      .join(w, Seq("bucket", "bin"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("sec", col("bucket").cast("long"))
    val trail = W.partitionBy(col("bin")).orderBy(col("sec"))
      .rangeBetween(-refWindows.toLong * windowSeconds, -windowSeconds)
    val base = grid
      .withColumn("n_ref", coalesce(sum(col("n")).over(trail), lit(0L)))
      .filter(col("n") > 0 || col("n_ref") > 0)
    val tot = base.groupBy(col("bucket"))
      .agg(sum(col("n")).as("tw"), sum(col("n_ref")).as("trt"),
        count(lit(1)).as("nbins"))
    val pw = (col("n") + lit(0.5)) / (col("tw") + lit(0.5) * col("nbins"))
    val pr = (col("n_ref") + lit(0.5)) / (col("trt") + lit(0.5) * col("nbins"))
    base.join(broadcast(tot), "bucket")
      .select(col("bucket"), col("n"), col("trt"),
        round((pw - pr) * log(pw / pr), 6)
          .cast(DecimalType(18, 6)).as("term"))
      .groupBy(col("bucket"))
      .agg(sum(col("n")).as("n_events"),
        max(col("trt")).as("ref_events"),
        sum(col("term")).as("psi_sum"))
      .select(col("bucket"), col("n_events"), col("ref_events"),
        round(col("psi_sum").cast("double"), 6).as("psi"),
        (col("ref_events") > 0 &&
          col("psi_sum").cast("double") >= alarmAt).as("alarm"))
      .orderBy(col("bucket"))
  }

  /** Lake-bound registered form of [[rollingPsi]]: daily events `value`
    * distribution vs its trailing week. */
  def rollingPsiQuery(spark: SparkSession, dir: String,
                      binWidth: Double = 20.0): DataFrame = {
    val ev = graft.Lake.table(spark, dir, "events")
    val windows = ev
      .select(date_trunc("day", col("ts")).as("bucket"),
        floor(col("value") / binWidth).cast("long").as("bin"))
      .groupBy(col("bucket"), col("bin"))
      .agg(count(lit(1)).as("n"))
    rollingPsi(windows, refWindows = 7, windowSeconds = 86400L)
  }

  /** Lake-bound registered query: daily `value`-distribution PSI of the
    * events table against the first week's reference distribution — the
    * batch twin of the streaming monitor (same [[windowedPsi]] scorer the
    * sink feeds), so the scoring path is oracle-verified. */
  def windowedPsiQuery(spark: SparkSession, dir: String,
                       binWidth: Double = 20.0): DataFrame = {
    val ev = graft.Lake.table(spark, dir, "events")
    val windows = ev
      .select(date_trunc("day", col("ts")).as("bucket"),
        floor(col("value") / binWidth).cast("long").as("bin"))
      .groupBy(col("bucket"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val ref = ev
      .filter(col("ts") < lit("2024-01-08").cast("timestamp"))
      .select(floor(col("value") / binWidth).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
    windowedPsi(windows, ref)
  }
}
