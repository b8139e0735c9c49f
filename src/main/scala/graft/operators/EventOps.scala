package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Lake

/** Event-stream analytics over the `events` table (SURVEY.md §2 items
  * 13–14): time-bucketed aggregation, gap-based sessionization, funnel
  * analysis, and JSON property extraction.
  *
  * Scale notes: everything partitions by `user_id` (high cardinality — no
  * skew hot-spot) or by time bucket. Sessionization is the classic
  * lag + cumulative-sum formulation: exactly two window passes over one
  * user-partitioned shuffle, no self-join. The streaming twin
  * (graft.streaming.SessionizeStream) shares the same gap semantics for
  * unbounded input.
  */
object EventOps {

  private val dec2 = DecimalType(18, 2)
  val SessionGapSeconds = 1800L

  /** Hourly time buckets × event type: count + exact value sums. */
  def hourly(spark: SparkSession, dir: String): DataFrame =
    Lake.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(dec2)).cast("double"), 2).as("sum_value"))
      .orderBy(col("bucket"), col("event_type"))

  /** Trailing moving average over event-TIME (a RANGE frame, not a ROWS
    * frame): each hourly bucket averages the counts of the last `hours`
    * hours that actually exist — hour gaps shrink the frame, which a
    * ROWS frame would silently paper over. Spark range frames need a
    * numeric ordering key, so the frame runs over epoch seconds; one
    * shuffle keyed by event_type (the series count), then a linear
    * window pass. */
  def movingAverage(spark: SparkSession, dir: String, hours: Int = 3): DataFrame = {
    val hourly = Lake.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(unix_timestamp(col("bucket")))
      .rangeBetween(-(hours - 1) * 3600L, 0L)
    hourly
      .withColumn("moving_avg", round(avg(col("n_events")).over(w), 4))
      .orderBy(col("bucket"), col("event_type"))
  }

  /** Gap-filled hourly series: every hour between the corpus min and max
    * gets a row per event type, zero-filled where nothing happened — the
    * resample step charting and anomaly detection need (a missing bucket
    * and a zero bucket are different signals). The dense (hour × type)
    * spine is `sequence()` over the global time bounds (one tiny
    * aggregate) cross-joined with the distinct types — both sides
    * broadcast-sized by nature (hours in a retention window × event
    * types), never corpus-sized; the real aggregate left-joins onto the
    * spine. */
  def hourlyGapFilled(spark: SparkSession, dir: String): DataFrame = {
    val agg = Lake.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val bounds = Lake.events(spark, dir)
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
    val hours = bounds.select(
      explode(expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
    val types = Lake.events(spark, dir).select(col("event_type")).distinct()
    hours.crossJoin(broadcast(types))
      .join(agg, Seq("bucket", "event_type"), "left")
      .select(col("bucket"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n_events"))
      .orderBy(col("bucket"), col("event_type"))
  }

  /** Rolling z-score anomaly screen over the gap-filled hourly series:
    * each (hour, type) bucket is scored against the TRAILING `baseline`
    * hours (current excluded — a spike must not inflate its own
    * baseline); |z| ≥ `zThreshold` rows are the anomalies. Runs on the
    * dense spine, so a silent outage hour scores as a zero, not a
    * missing row — exactly the case an anomaly screen exists to catch.
    *
    * Determinism discipline: the window carries only EXACT integer sums
    * (Σx, Σx², w); mean/variance/z are then derived in one fixed double
    * expression per row, so any engine computing the same formula over
    * the same integers agrees bit-for-bit — windowed stddev_samp would
    * not (its accumulation order is engine-dependent). One shuffle keyed
    * by event_type, then a linear pass; scales with series count. */
  def anomalies(spark: SparkSession, dir: String,
                baseline: Int = 24, zThreshold: Double = 3.0): DataFrame =
    anomaliesOn(hourlyGapFilled(spark, dir), baseline, zThreshold)

  /** The scorer over ANY dense (bucket, event_type, n_events) series —
    * the batch [[anomalies]] feeds it the gap-filled lake aggregate, the
    * streaming pipeline feeds it the watermarked hourly sink
    * ([[graft.streaming.AnomalyStream]]). */
  def anomaliesOn(dense: DataFrame, baseline: Int,
                  zThreshold: Double): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("bucket"))
      .rowsBetween(-baseline, -1)
    val mean = col("s1").cast("double") / col("w")
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / col("w")) /
      (col("w") - lit(1))
    dense
      .withColumn("s1", sum(col("n_events")).over(w))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(w))
      .withColumn("w", count(lit(1)).over(w))
      .filter(col("w") === baseline && variance > 0)
      .withColumn("z", (col("n_events").cast("double") - mean) / sqrt(variance))
      .filter(abs(col("z")) >= zThreshold)
      .select(col("bucket"), col("event_type"), col("n_events"),
        round(col("z"), 4).as("z_score"))
      .orderBy(col("bucket"), col("event_type"))
  }

  /** Seasonal (hour-of-day) anomaly screen — the calendar-profile
    * complement of the trailing-window [[anomalies]]: each (hour, type)
    * bucket is scored against the population of SAME-hour-of-day buckets
    * across all days, so a 3 am spike is judged against 3 am traffic, not
    * against the preceding evening (which the trailing screen would).
    * The baseline is a bounded aggregate (types × 24 rows, exact integer
    * sums) broadcast back over the dense series; mean/variance/z derive
    * in one fixed double order on identical integers in any engine. A
    * degenerate cell (variance 0) is never divided by. */
  def seasonalAnomaliesOn(dense: DataFrame, zThreshold: Double): DataFrame = {
    val mean = col("s1").cast("double") / col("w")
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / col("w")) /
      (col("w") - lit(1))
    val d = dense.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val base = d.groupBy(col("event_type"), hour(col("bucket")).as("hod"))
      .agg(count(lit(1)).as("w"), sum(col("n_events")).as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))
    val out = d.withColumn("hod", hour(col("bucket")))
      .join(broadcast(base), Seq("event_type", "hod"))
      .filter(col("w") > 1 && variance > 0)
      .withColumn("z", (col("n_events").cast("double") - mean) / sqrt(variance))
      .filter(abs(col("z")) >= zThreshold)
      .select(col("bucket"), col("event_type"), col("n_events"),
        round(col("z"), 4).as("z_score"))
      .orderBy(col("bucket"), col("event_type"))
      .localCheckpoint(true)
    d.unpersist(false)
    out
  }

  def seasonalAnomalies(spark: SparkSession, dir: String,
                        zThreshold: Double = 3.0): DataFrame =
    seasonalAnomaliesOn(hourlyGapFilled(spark, dir), zThreshold)

  /** Time-to-convert distribution: per user, hours from the FIRST `from`
    * event to the first `to` event AFTER it, summarized as count /
    * median / p90 (exact percentile — approx_percentile at 100 TB, same
    * plan shape). Two user-keyed aggregates + one user-keyed join; the
    * deltas derive from exact epoch micros, so every quantile input is
    * the identical double in any engine. */
  def timeToConvert(spark: SparkSession, dir: String,
                    from: String = "view", to: String = "purchase"): DataFrame = {
    val ev = Lake.events(spark, dir)
    val firstFrom = ev.filter(col("event_type") === from)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_from"))
    val firstTo = ev.filter(col("event_type") === to)
      .join(firstFrom, Seq("user_id"))
      .filter(col("ts") > col("t_from"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_to"))
    firstFrom.join(firstTo, Seq("user_id"))
      .select(((unix_micros(col("t_to")) - unix_micros(col("t_from")))
        .cast("double") / 3600000000.0).as("h"))
      .agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(h, 0.5)"), 4).as("median_hours"),
        round(expr("percentile(h, 0.9)"), 4).as("p90_hours"))
  }

  /** SCD2 (slowly-changing-dimension type 2) history build from a change
    * stream: consecutive equal values of `attrCol` per key collapse (a
    * change-detection lag), and each surviving change opens a validity
    * interval — `[valid_from, valid_to)` via lead(), the latest left
    * open with `is_current` — the classic warehouse dimension-history
    * shape, built here instead of hand-maintained MERGE logic. Two
    * window stages, both keyed by the entity (high-cardinality), sharing
    * one shuffle; ties on the timestamp break on `idCol` so the history
    * is total-ordered and engine-reproducible. */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
           tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val changes = events
      .select(col(keyCol), col(attrCol), col(tsCol), col(idCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select(col(keyCol), col(attrCol).as("attr"),
        col(tsCol).as("valid_from"), col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col(keyCol), col("version"))
  }

  /** Driver binding: each user's event-type change history. */
  def scd2Query(spark: SparkSession, dir: String): DataFrame =
    scd2(Lake.events(spark, dir), "user_id", "event_type")

  /** Events with a session id assigned per user: a new session starts when
    * the gap since the previous event exceeds `SessionGapSeconds`. */
  def withSessionIds(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gap = col("ts").cast("double") - lag(col("ts").cast("double"), 1).over(byUser)
    Lake.events(spark, dir)
      .withColumn("new_session",
        when(gap.isNull || gap > SessionGapSeconds, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-(user, session) rollup: event count and purchase count. */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    withSessionIds(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .orderBy(col("user_id"), col("session_id"))

  /** Session-depth histogram: sessions by event count, with share and
    * cumulative share — the engagement-depth count-of-counts the
    * duration-centric [[sessionStats]] summary hides (a median-2-minute
    * corpus can be one-pagers or deep crawls; the depth histogram tells
    * them apart). Shares by exact integer half-up; the depth frame is
    * bounded by the longest session. */
  def sessionDepths(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.orderBy(col("depth"))
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    withSessionIds(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("depth"))
      .groupBy(col("depth")).agg(count(lit(1)).as("n_sessions"))
      .withColumn("total", sum(col("n_sessions")).over(wAll))
      .withColumn("cum", sum(col("n_sessions")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("depth"), col("n_sessions"),
        (ExactRound.halfUpPos("1000000 * n_sessions", "total")
          .cast("double") / 1e6).as("share"),
        (ExactRound.halfUpPos("1000000 * cum", "total")
          .cast("double") / 1e6).as("cum_share"))
      .orderBy(col("depth"))
  }

  /** Forward retention by lifecycle state: for each user-day, the
    * growth-accounting state (new / retained / resurrected) and whether
    * the user returns the NEXT calendar day — P(active tomorrow | state
    * today), the conditional rates the [[dailyUsers]] decomposition
    * cannot answer (is a resurrected user stickier than a new one?).
    * One distinct user-day frame, one user-keyed window for the
    * previous-active-day lag, one self-equi-join for tomorrow; rates by
    * exact integer half-up over the 3-state frame. */
  def stateRetention(spark: SparkSession, dir: String): DataFrame = {
    val ud = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val labeled = ud
      .withColumn("prev_day", lag(col("day"), 1).over(wU))
      .withColumn("state",
        when(col("prev_day").isNull, "new")
          .when(datediff(col("day"), col("prev_day")) === 1, "retained")
          .otherwise("resurrected"))
    val out = labeled
      .join(ud.select(col("user_id").as("u2"), col("day").as("next_day")),
        labeled("user_id") === col("u2") &&
          datediff(col("next_day"), labeled("day")) === 1, "left")
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n_user_days"),
        sum(when(col("next_day").isNotNull, 1L).otherwise(0L))
          .as("n_return"))
      .select(col("state"), col("n_user_days"), col("n_return"),
        (ExactRound.halfUpPos("10000 * n_return", "n_user_days")
          .cast("double") / 1e4).as("next_day_return_rate"))
      .orderBy(col("state"))
      .localCheckpoint(true)
    ud.unpersist(false)
    out
  }

  /** Funnel: users whose first view precedes their first click precedes
    * their first purchase. One aggregation pass, no self-joins. */
  def funnel(spark: SparkSession, dir: String): DataFrame =
    Lake.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      .filter(col("t_view") < col("t_click") && col("t_click") < col("t_purchase"))
      .select(col("user_id"))
      .orderBy(col("user_id"))

  /** SEQUENCED, TIME-BOUNDED funnel: users with some view → click →
    * purchase chain where each step follows the previous within
    * `horizonHours` — the product-analytics conversion window the
    * min-per-step [[funnel]] cannot express (min-based ordering also
    * misses valid chains when an earlier out-of-order step exists; this
    * form finds ANY qualifying chain). Two chained window passes over ONE
    * user-partitioned sort — no self-join, no range explosion: pass 1
    * carries the latest preceding view time, pass 2 the latest preceding
    * QUALIFIED click (a click within horizon of a strictly earlier view);
    * a purchase within horizon of a qualified click converts. O(events)
    * work after one shuffle, at any horizon. */
  def funnelWithin(spark: SparkSession, dir: String,
                   horizonHours: Int = 24): DataFrame =
    funnelWithin(Lake.events(spark, dir), horizonHours)

  def funnelWithin(events: DataFrame, horizonHours: Int): DataFrame = {
    val horizonUs = horizonHours * 3600L * 1000000L
    // RANGE frame on `us`, not ROWS: "strictly earlier" must exclude
    // same-microsecond events entirely, or a tied view/click (us' == us)
    // would win the max, fail the strict `<` filter, and mask a genuinely
    // earlier qualifying event.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("last_view_us",
        max(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("q_click_us",
        max(when(col("event_type") === "click" &&
          col("last_view_us") < col("us") &&
          col("us") - col("last_view_us") <= horizonUs, col("us"))).over(w))
      .filter(col("event_type") === "purchase" &&
        col("q_click_us") < col("us") &&
        col("us") - col("q_click_us") <= horizonUs)
      .select(col("user_id")).distinct()
      .orderBy(col("user_id"))
  }

  /** As-of join (time-travel lookup) expressed as a bounded window — for
    * every purchase, the most recent strictly-preceding view by the same
    * user. One user-partitioned shuffle; no self-join, no range explosion. */
  def asofLastView(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Lake.events(spark, dir)
      .withColumn("last_view_ts",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"), col("ts"), col("last_view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("last_view_ts")))
          .as("micros_since_view"))
      .orderBy(col("event_id"))
  }

  /** The same as-of semantics through the NATIVE sort-merge as-of join
    * ([[graft.plans.AsofJoin]]): purchases as-of-joined to the latest
    * preceding view per user. Time key is struct(ts, event_id), so ties
    * on ts break exactly like the window formulation's (ts, event_id)
    * ordering. One shuffle per side, one merge pass — at scale this
    * replaces carrying every payload column through a window sort. */
  def asofLastViewNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Lake.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        struct(col("ts"), col("event_id")).as("tkey"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        struct(col("ts"), col("event_id")).as("v_tkey"))
    graft.plans.AsofJoin(purchases, views, "user_id", "v_user", "tkey", "v_tkey")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("view_ts").as("last_view_ts"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts")))
          .as("micros_since_view"))
      .orderBy(col("event_id"))
  }

  /** Full outer join of two per-user aggregates (viewers vs purchasers):
    * genuine outer semantics — users appearing on either side only —
    * with null-coalesced counts. */
  /** Session path analysis: the most common event-type sequences across
    * sessions — the funnel generalized to arbitrary paths. Events gather
    * per session via sort_array(collect_list(struct(ts, event_id, type)))
    * (bare collect_list order is partition-dependent — the classic
    * nondeterminism bug), then paths aggregate with a bounded top-k.
    * Two shuffles: sessionize by user, then count by path. */
  def sessionPaths(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    withSessionIds(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(concat_ws(">", transform(col("evs"), e => e("event_type"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)

  /** Cohort retention: users grouped by first-seen day, counted on every
    * day they return, by offset from their cohort day. Both aggregations
    * key on `user_id`, so the two shuffles co-partition; the per-(user,
    * day) distinct partial-aggregates map-side, so the join input is
    * bounded by users × active days, not raw events. */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Lake.events(spark, dir)
    val cohorts = ev.groupBy(col("user_id"))
      .agg(date_trunc("day", min(col("ts"))).as("cohort_day"))
    val active = ev
      .select(col("user_id"), date_trunc("day", col("ts")).as("activity_day"))
      .distinct()
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("activity_day"), col("cohort_day")).cast("long")
          .as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Session-quality summary: session counts, bounce rate (one-event
    * sessions), and the duration distribution (median / p90 minutes from
    * exact epoch-µs spans) — the health metrics read next to the raw
    * sessionization. One user-keyed session pass + one bounded global
    * aggregate; durations are integer-µs-derived doubles, identical in
    * any engine. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    withSessionIds(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .cast("double") / 60000000.0).as("minutes"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        expr("percentile(minutes, 0.5)").as("med_m"),
        expr("percentile(minutes, 0.9)").as("p90_m"),
        sum(col("n_events")).as("se"))
      // count ratios → exact integer half-up; the duration percentiles
      // stay in double (interpolated, identical tree both engines)
      .select(col("n_sessions"),
        (ExactRound.halfUpPos("1000000 * n_bounce", "n_sessions")
          .cast("double") / 1e6).as("bounce_rate"),
        round(col("med_m"), 4).as("median_minutes"),
        round(col("p90_m"), 4).as("p90_minutes"),
        (ExactRound.halfUpPos("10000 * se", "n_sessions")
          .cast("double") / 1e4).as("avg_events"))

  /** Cohort lifetime-value curve: cumulative per-user purchase value by
    * weeks since ACQUISITION (first purchase — the standard LTV cohort;
    * visitors who never buy have no lifetime value to curve) — the
    * money companion of the retention matrix (retained ≠ monetized).
    * Purchase values route through decimal(18,2); the cumulative window
    * runs over the bounded cohort × offset grid. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Lake.events(spark, dir)
    val cohorts = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val wCum = Window.partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type") === "purchase")
      .join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(date_trunc("week", col("ts")), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(sum(col("value").cast(dec2)).as("wk_value"))
      .withColumn("cum_value",
        round(sum(col("wk_value")).over(wCum).cast("double"), 2))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"),
        round(col("wk_value").cast("double"), 2).as("week_value"),
        col("cum_value"),
        // exact 2-dp cumulative value / count → exact integer half-up
        (ExactRound.halfUpPos(
          "100 * CAST(round(cum_value * 100) AS BIGINT)", "cohort_size")
          .cast("double") / 1e4).as("ltv_per_user"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Weekly cohort retention MATRIX — the rate form of [[retention]]:
    * users bucketed by ACQUISITION week (first purchase — the cohort an
    * LTV/retention review pairs; first-touch weeks all collapse into the
    * launch week on any always-on product), each later week's active
    * share of the cohort reported as a rate (counts alone mislead when
    * cohort sizes differ). Two user-keyed aggregates + a broadcast of
    * the bounded cohort-size frame; week truncation is Monday-start in
    * both engines. */
  def retentionWeekly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Lake.events(spark, dir)
    val cohorts = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = ev
      .select(col("user_id"), date_trunc("week", col("ts")).as("activity_week"))
      .distinct()
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("activity_week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      // pre-acquisition activity (views before the first purchase) would
      // surface as negative offsets — meaningless in a retention matrix
      .filter(col("week_offset") >= 0)
      .join(broadcast(sizes), "cohort_week")
      // count/count → exact integer half-up ([[ExactRound]])
      .withColumn("retention",
        ExactRound.halfUpPos("10000 * n_users", "cohort_size")
          .cast("double") / 1e4)
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        col("cohort_size"), col("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  def viewsVsPurchases(spark: SparkSession, dir: String): DataFrame = {
    // high-value events only: the rarity makes the two sides genuinely
    // asymmetric (users on one side but not the other), so the outer join
    // actually exercises both null branches
    val ev = Lake.events(spark, dir).filter(col("value") > 200)
    def perUser(t: String, as: String) =
      ev.filter(col("event_type") === t)
        .groupBy(col("user_id")).agg(count(lit(1)).as(as))
    val v = perUser("view", "n_views")
    val p = perUser("purchase", "n_purchases")
      .withColumnRenamed("user_id", "p_user_id")
    v.join(p, col("user_id") === col("p_user_id"), "full_outer")
      .select(
        coalesce(col("user_id"), col("p_user_id")).as("uid"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .orderBy(col("uid"))
  }

  /** Latest-state-per-key (the upsert/compaction read pattern): each
    * user's most recent event wins. One user-partitioned shuffle + rank —
    * the standard merge-on-read dedup at lake scale. */
  def latestState(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Lake.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  /** Pivot: per-user event-type counts as columns (fixed value list — the
    * scale-safe form: no driver-side distinct scan to discover columns). */
  def pivotCounts(spark: SparkSession, dir: String): DataFrame =
    Lake.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("view", "click", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** JSON property extraction from `props` (semi-structured column):
    * average of $.k per event type. get_json_object is codegen'd. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    Lake.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sk"))
      // long sum / count → exact integer half-up ([[ExactRound]])
      .select(col("event_type"), col("n"),
        (ExactRound.halfUpPos("10000 * sk", "n")
          .cast("double") / 1e4).as("avg_k"))
      .orderBy(col("event_type"))

  /** Positional (U-shaped) multi-touch attribution: every non-purchase
    * touch is assigned to the NEXT purchase of the same user (a
    * backward-counting window sum of the purchase flag — touches after
    * the user's last purchase never convert and are dropped), then
    * credit for each conversion is split 40/20/40: sole touch 1.0, two
    * touches 0.5 each, otherwise 0.4 to first and last and 0.2 shared
    * evenly by the middles. Per-row credits are one fixed double
    * division rounded to 10 decimals and summed as decimals, so the
    * per-channel totals are order-independent and engine-exact.
    *
    * Two window passes over one user-partitioned shuffle (conversion
    * grouping, then position within the conversion) + one
    * map-side-combinable aggregate — the sessionization plan shape, no
    * self-join, no skew hot-spot (user_id is high-cardinality). */
  def attribution(events: DataFrame): DataFrame = {
    val isP = when(col("event_type") === "purchase", 1L).otherwise(0L)
    // #purchases at-or-after each row: purchases count themselves, so a
    // touch shares the value of exactly the purchase it precedes.
    // Computed as (per-user total − #purchases strictly before): the
    // whole-partition frame is evaluated once per partition and the
    // growing unboundedPreceding frame incrementally — both O(n) —
    // while a direct currentRow→unboundedFollowing sum re-scans the
    // shrinking frame per row, O(n²) in a user's event count (the
    // psmAtt lesson; a single bot/test user with 10⁶ events would
    // serialize the stage at scale). Same exchange, same sort, exact
    // long arithmetic — identical conv_grp on every row.
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wAllU = byUser.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val wBefore = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val touches = events
      .withColumn("conv_grp", sum(isP).over(wAllU) -
        coalesce(sum(isP).over(wBefore), lit(0L)))
      .filter(col("conv_grp") > 0 && col("event_type") =!= "purchase")
    val wConv = Window.partitionBy(col("user_id"), col("conv_grp"))
    val wPos = wConv.orderBy(col("ts"), col("event_id"))
    val n = col("n_touch")
    val credit = when(n === 1, lit(1.0))
      .when(n === 2, lit(0.5))
      .when(col("pos") === 1 || col("pos") === n, lit(0.4))
      .otherwise(lit(0.2) / (n - lit(2)).cast("double"))
    touches
      .withColumn("n_touch", count(lit(1)).over(wConv))
      .withColumn("pos", row_number().over(wPos))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("touches"),
        round(sum(round(credit, 10).cast(DecimalType(38, 10)))
          .cast("double"), 4).as("credit"))
      .orderBy(col("event_type"))
  }

  /** EXACT Shapley-value channel attribution — the game-theoretic
    * upgrade of the heuristic U-shaped [[attribution]] weights: each
    * channel's credit is its average marginal contribution over every
    * coalition, with the cumulative characteristic function
    * v(S) = converted users whose touched-channel set ⊆ S (so v is
    * monotone, every φ is nonnegative, and efficiency reads
    * Σφ = all conversions − untouched conversions). The corpus
    * collapses in ONE user-keyed aggregation to a ≤2ⁿ-row
    * touchset-mask frame; v, the coalition lattice, the n·2ⁿ⁻¹
    * marginal terms (weights s!(n−1−s)! kept as exact integers — the
    * division by n! is the single final divide), and the per-channel
    * reach tallies are all broadcast joins over that bounded frame.
    * n is the FIXED channel list (4 here) — the 2ⁿ lattice is a design
    * constant, not data-driven, so the plan is corpus-size-free after
    * the first aggregate. */
  def shapleyAttribution(events: DataFrame): DataFrame = {
    val channels = Seq("click", "error", "signup", "view")
    val n = channels.length
    val spark = events.sparkSession
    def fact(x: Int): Long = (1 to x).foldLeft(1L)(_ * _)
    val bitLits = array(channels.indices.map(i => lit(1L << i)): _*)
    val w24Lits = array((0 until n).map(s =>
      lit(fact(s) * fact(n - 1 - s))): _*)
    val aggCols = channels.zipWithIndex.map { case (c, i) =>
      max(when(col("event_type") === c, 1L << i).otherwise(0L)).as(s"b$i")
    } :+ max(when(col("event_type") === "purchase", 1L).otherwise(0L))
      .as("conv")
    val users = events.groupBy(col("user_id"))
      .agg(aggCols.head, aggCols.tail: _*)
    val userMasks = users.select(
      channels.indices.map(i => col(s"b$i")).reduce(_ + _).as("mask"),
      col("conv"))
    val e = userMasks.groupBy(col("mask"))
      .agg(sum(col("conv")).as("conv"), count(lit(1)).as("users"))
    val masks = spark.range(1L << n).select(col("id").as("m"))
    val v = masks.join(broadcast(e),
        col("mask").bitwiseAND(col("m")) === col("mask"), "left")
      .groupBy(col("m"))
      .agg(coalesce(sum(col("conv")), lit(0L)).as("v"))
    val chan = spark.range(n).select(col("id").cast("int").as("ci"))
      .withColumn("channel",
        element_at(array(channels.map(lit(_)): _*), col("ci") + 1))
      .withColumn("bit", element_at(bitLits, col("ci") + 1))
    val terms = chan
      .join(broadcast(v.select(col("m").as("s"), col("v").as("v_s"))),
        col("s").bitwiseAND(col("bit")) === 0)
      .withColumn("si", col("s") + col("bit"))
      .join(broadcast(v.select(col("m").as("si"), col("v").as("v_si"))),
        "si")
      .withColumn("w24", element_at(w24Lits, bit_count(col("s")) + 1))
      .groupBy(col("channel"), col("ci"))
      .agg(sum(col("w24") * (col("v_si") - col("v_s"))).as("phi24"))
    val touch = chan
      .join(broadcast(e), col("mask").bitwiseAND(col("bit")) =!= 0, "left")
      .groupBy(col("channel"), col("ci"))
      .agg(coalesce(sum(col("users")), lit(0L)).as("touched_users"),
        coalesce(sum(col("conv")), lit(0L)).as("converted_touched"))
    terms.join(touch, Seq("channel", "ci"))
      // signed long / factorial constant → exact integer half-up
      .withColumn("fct", lit(fact(n).toLong))
      .select(col("channel"),
        (ExactRound.halfUp("1000000 * phi24", "fct")
          .cast("double") / 1e6).as("phi"),
        col("touched_users"), col("converted_touched"))
      .orderBy(col("channel"))
  }

  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame =
    shapleyAttribution(Lake.events(spark, dir))

  def attribution(spark: SparkSession, dir: String): DataFrame =
    attribution(Lake.events(spark, dir))

  /** Exponential time-decay engagement score: per user,
    * Σ value · 2^(−Δt / halfLife) against a FIXED anchor instant (a
    * constant, not max(ts) — retry-stable and identical across engines;
    * events past the anchor amplify, by formula). Δt in exact
    * microseconds (`unix_micros`), the decay a single pow(2, x) per
    * row; per-row terms rounded to 8 decimals and decimal-summed so the
    * per-user total is addition-order-independent. One
    * map-side-combinable aggregate over one scan — nothing else. */
  def decayedEngagement(events: DataFrame, halfLifeDays: Double = 7.0,
                        anchor: String = "2024-02-01"): DataFrame = {
    val anchorUs = unix_micros(to_timestamp(lit(anchor)))
    val decay = pow(lit(2.0),
      -(anchorUs - unix_micros(col("ts"))).cast("double") /
        lit(halfLifeDays * 86400e6))
    events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(round(col("value") * decay, 8).cast(DecimalType(38, 8)))
          .cast("double"), 4).as("decayed_value"))
      .orderBy(col("user_id"))
  }

  def decayedEngagement(spark: SparkSession, dir: String): DataFrame =
    decayedEngagement(Lake.events(spark, dir))

  /** One-sided CUSUM change-point screen over the daily per-type count
    * series: standardize each day against the series' own mean/variance
    * (derived from EXACT integer sums — the [[anomaliesOn]] determinism
    * discipline), then the classic recursion S_i = max(0, S_{i−1} + z_i
    * − slack), alarming where S_i ≥ `threshold`. A rolling z-score
    * ([[anomalies]]) flags isolated spikes; CUSUM accumulates evidence,
    * catching small SUSTAINED level shifts a per-point screen misses.
    *
    * The recursion is not a window prefix-sum (max(0,·) at every step),
    * so each series is packed into a sorted array and scanned with the
    * higher-order `aggregate` — per-group state is one series (bounded
    * by the time span, never by corpus size), and the scan itself is a
    * single codegen'd expression. Same scan order on the oracle side
    * (a recursive CTE) → bit-identical doubles. */
  def cusum(events: DataFrame, slack: Double = 0.5,
            threshold: Double = 4.0): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy(col("event_type"))
      .agg(sum(col("n")).as("s1"), sum(col("n") * col("n")).as("s2"),
        count(lit(1)).as("w"))
    val mean = col("s1").cast("double") / col("w")
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / col("w")) /
      (col("w") - lit(1))
    val z = daily.join(broadcast(stats), "event_type")
      .filter(col("w") > 1 && variance > 0)
      .withColumn("z", (col("n").cast("double") - mean) / sqrt(variance))
    z.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("z")))).as("seq"))
      .withColumn("s_arr", expr(
        s"""aggregate(seq,
           |  struct(cast(0.0 AS double) AS s, cast(array() AS array<double>) AS out),
           |  (acc, x) -> struct(
           |    greatest(cast(0.0 AS double), acc.s + x.z - $slack) AS s,
           |    array_append(acc.out,
           |      greatest(cast(0.0 AS double), acc.s + x.z - $slack)) AS out),
           |  acc -> acc.out)""".stripMargin))
      .select(col("event_type"),
        explode(arrays_zip(col("seq"), col("s_arr"))).as("r"))
      .select(col("event_type"), col("r.seq.day").as("day"),
        round(col("r.seq.z"), 4).as("z"),
        round(col("r.s_arr"), 4).as("cusum"),
        (col("r.s_arr") >= threshold).as("alarm"))
      .orderBy(col("event_type"), col("day"))
  }

  def cusum(spark: SparkSession, dir: String): DataFrame =
    cusum(Lake.events(spark, dir))

  /** Finite-window EWMA (α = ½) smoothing of the per-type daily count
    * series: `ewma_t = Σ_k n_{t−k}·2^(W−1−k) / Σ_k 2^(W−1−k)` over the
    * trailing `windowDays` PRESENT days (missing days are skipped by the
    * normalization, the standard NA-skipping adjusted form).
    *
    * α = ½ is chosen deliberately: the weights are exact powers of two,
    * so numerator and denominator are exact BIGINT sums — no pow()
    * library variance between engines — and the one double division is
    * bit-identical anywhere. Distance-dependent weights don't fit a
    * built-in window frame, so each source day EXPLODES to the ≤W target
    * days it contributes to (bounded ×W fan-out of the tiny daily
    * aggregate — never of raw events) and one equi-keyed shuffle
    * re-aggregates; smoothing always runs aggregate-first at any scale. */
  def ewma(events: DataFrame, windowDays: Int = 14): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = windowDays - 1
    val contrib = daily
      .select(col("event_type"), col("day"), col("n"),
        explode(sequence(lit(0), lit(w))).as("k"))
      .select(col("event_type"),
        expr("day + make_interval(0, 0, 0, k)").as("t"),
        (col("n") * expr(s"shiftleft(cast(1 AS bigint), $w - k)")).as("c"),
        expr(s"shiftleft(cast(1 AS bigint), $w - k)").as("wt"))
    val smoothed = contrib.groupBy(col("event_type"), col("t").as("day"))
      .agg(sum(col("c")).as("num"), sum(col("wt")).as("den"))
    daily.join(smoothed, Seq("event_type", "day"))
      // long/long ratio → exact integer half-up ([[ExactRound]])
      .select(col("event_type"), col("day"), col("n"),
        (ExactRound.halfUpPos("10000 * num", "den")
          .cast("double") / 1e4).as("ewma"))
      .orderBy(col("event_type"), col("day"))
  }

  def ewma(spark: SparkSession, dir: String): DataFrame =
    ewma(Lake.events(spark, dir))

  /** Per-type linear trend of the daily count series: ordinary
    * least-squares slope/intercept from the five classical sums
    * (n, Σx, Σy, Σx², Σxy) with x = days since a fixed epoch — ALL exact
    * BIGINT accumulations (order-free, map-side combinable, one shuffle
    * keyed by type), then the two closed-form double divisions at the
    * end. The fixed epoch avoids a second per-group min-day pass; it
    * shifts the intercept's reference point, not the slope. */
  def trendLines(events: DataFrame, epoch: String = "1995-01-01"): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("y"))
      .select(col("event_type"),
        datediff(col("day"), lit(epoch).cast("date")).cast("long").as("x"),
        col("y"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .filter(col("n_days") > 1)
      .select(col("event_type"), col("n_days"),
        round((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double"),
          6).as("slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
              (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double"),
          6).as("intercept"))
      .orderBy(col("event_type"))
  }

  def trendLines(spark: SparkSession, dir: String): DataFrame =
    trendLines(Lake.events(spark, dir))

  /** Sessionized Markov transition matrix: P(next event type | current)
    * over consecutive same-session event pairs ([[withSessionIds]]'s gap
    * semantics — a transition never crosses a session boundary, which is
    * what makes the matrix a behavioral model rather than an artifact of
    * idle time). [[sessionPaths]] ranks whole journeys; this is the
    * one-step model that generalizes — next-action prediction,
    * anomaly-against-the-matrix scoring, and synthetic-journey
    * generation all read from it.
    *
    * One lead() on the session window (the sessionization shuffle,
    * reused), then a type-pair aggregate bounded by |types|² — the
    * probability division is a single long/long per pair. */
  /** Frequent behavioral event trigrams — sequential-pattern mining one
    * order above the Markov [[transitions]] matrix: a transition matrix
    * cannot distinguish view→click→purchase from view→click→error (both
    * share the view→click edge), but the common k-gram inventory can,
    * and "which 3-step paths recur across many users" is the behavioral
    * question funnels are usually built from. The unit is the USER's
    * full time-ordered history (session-contiguous trigrams are
    * vanishingly rare under short-session traffic — measured: 16 in the
    * whole sf0.01 corpus — while cross-session motifs are the
    * long-horizon signal); support = distinct users exhibiting the
    * trigram (a loop within one user counts once) beside raw
    * occurrences, floored at `minUsers`.
    *
    * Shape: one user-partitioned (ts, event_id)-ordered window + two
    * leads, then a group-by over the ≤|types|³ k-gram key space —
    * map-side combinable into a bounded frame. */
  def eventNgrams(spark: SparkSession, dir: String,
                  minUsers: Long = 5): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Lake.events(spark, dir)
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("t2").as("e2"),
        col("t3").as("e3"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("user_id")).as("n_users"))
      .filter(col("n_users") >= minUsers)
      .orderBy(col("n_users").desc, col("n_occurrences").desc,
        col("e1"), col("e2"), col("e3"))
  }

  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = withSessionIds(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("p",
        round(col("n") / sum(col("n")).over(Window.partitionBy(col("from_type"))), 4))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Daily audience decomposition: active users split into new (first-ever
    * activity that day) vs returning, plus the cumulative user count — the
    * growth-accounting view every product dashboard opens with. Two
    * user-keyed aggregates (distinct activity days, first day) feed
    * day-keyed counts; the cumulative sum windows over the BOUNDED day
    * grid, never the event table. Integer counts only. */
  def dailyUsers(spark: SparkSession, dir: String): DataFrame = {
    // the distinct (user, day) frame feeds both day-keyed aggregates —
    // persist it, materialize the bounded day report, release eagerly
    val ev = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    val active = ev.groupBy(col("day")).agg(count(lit(1)).as("n_active"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = active.join(firstDay, Seq("day"), "left")
      .na.fill(0L, Seq("n_new"))
      .select(col("day"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"))
      .withColumn("cum_users", sum(col("n_new")).over(wCum))
      .orderBy(col("day"))
      .localCheckpoint(true)
    ev.unpersist(false)
    out
  }

  /** Rolling 7-day active users (WAU) per day: for each observed day, the
    * distinct users active in [day−6, day]. The scale shape is the
    * equi-join form, NOT a range join: the distinct (user, day) frame —
    * orders of magnitude below the event table — fans out exactly 7× via
    * `explode(sequence(0,6))` onto the days it contributes to, then one
    * day-keyed distinct count. No nested-loop join, no per-day rescans;
    * a day with no events of its own reports no row (semi-join to the
    * observed-day grid), matching the "per observed day" contract. */
  def rollingActives(spark: SparkSession, dir: String,
                     windowDays: Int = 7): DataFrame = {
    val ud = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = ud.select(col("day")).distinct()
    val out = ud
      .select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"),
        col("day"))
      .select(col("user_id"), date_add(col("day"), col("off")).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .orderBy(col("day"))
      .localCheckpoint(true)
    ud.unpersist(false)
    out
  }

  /** Week-over-week growth report: weekly event counts and exact decimal
    * value sums with the previous week's delta as a ratio — the
    * first-page growth dashboard. One shuffle to the bounded week frame;
    * the lag window runs over weeks (bounded by calendar), and each
    * growth ratio is one double division of exact inputs. The first week
    * reports NULL growth rather than a fake zero. */
  def weeklyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val wk = Lake.events(spark, dir)
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(dec2)).as("wk_value"))
    val w = Window.orderBy(col("week"))
    wk
      .withColumn("prev_n", lag(col("n_events"), 1).over(w))
      .withColumn("prev_v", lag(col("wk_value"), 1).over(w))
      // SIGNED terminating ratios → exact integer half-up
      .withColumn("v2d", ((col("wk_value") - col("prev_v")) * 100)
        .cast("long"))
      .withColumn("p2", (col("prev_v") * 100).cast("long"))
      .select(col("week"), col("n_events"),
        round(col("wk_value"), 2).cast("double").as("week_value"),
        (ExactRound.halfUp("1000000 * (n_events - prev_n)", "prev_n")
          .cast("double") / 1e6).as("events_wow"),
        (ExactRound.halfUp("1000000 * v2d", "p2")
          .cast("double") / 1e6).as("value_wow"))
      .orderBy(col("week"))
  }

  /** Seasonal-naive forecast backtest: train on days before `cutoff`
    * (per hour-of-day × event-type mean count, zeros included via the
    * train-day denominator), forecast every test cell with its seasonal
    * mean, and score MAE per event type over the DENSE test grid
    * (test days × 24 hours × the type universe — absent cells are real
    * zero-actuals, not missing rows). This is the eval loop behind any
    * capacity/demand forecast: the seasonal-naive baseline is the
    * number a fancier model must beat.
    *
    * Exactness: train totals and test counts are exact integers; the
    * forecast is one division; each |actual − forecast| term is rounded
    * once and decimal-summed per type (the surprisal discipline), so the
    * MAE is aggregation-order-free. Grid sides are bounded (days × 24 ×
    * types), so the spine cross-join is the q_gap_fill pattern. */
  def forecastBacktest(spark: SparkSession, dir: String,
                       cutoff: String = "2024-01-22"): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val ev = Lake.events(spark, dir)
      .select(col("ts"), col("event_type"),
        to_date(col("ts")).as("day"), hour(col("ts")).as("hod"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val train = ev.filter(col("ts") < cut)
    val test = ev.filter(col("ts") >= cut)
    // one distinct pass each for the bounded grid sides
    val nTrainDays = train.select(col("day")).distinct().count()
    require(nTrainDays > 0, "cutoff leaves no training days")
    val trainMean = train.groupBy(col("hod"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("forecast", col("n").cast("double") / nTrainDays)
      .select(col("hod"), col("event_type"), col("forecast"))
    val testDays = test.select(col("day")).distinct()
    val types = ev.select(col("event_type")).distinct()
    val hods = spark.range(0, 24).select(col("id").cast("int").as("hod"))
    val grid = testDays.crossJoin(broadcast(types)).crossJoin(broadcast(hods))
    val actual = test.groupBy(col("day"), col("hod"), col("event_type"))
      .agg(count(lit(1)).as("actual"))
    val out = grid
      .join(actual, Seq("day", "hod", "event_type"), "left")
      .na.fill(0L, Seq("actual"))
      .join(broadcast(trainMean), Seq("hod", "event_type"), "left")
      .na.fill(0.0, Seq("forecast"))
      .withColumn("term",
        round(abs(col("actual") - col("forecast")), 6).cast("decimal(18,6)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cells"),
        sum(col("actual")).as("n_actual"),
        sum(col("term")).as("st"))
      // 6-dp decimal sum / count at 4 dp → exact integer half-up
      .withColumn("st6", (col("st") * 1000000).cast("long"))
      .select(col("event_type"), col("n_cells"), col("n_actual"),
        (ExactRound.halfUpPos("st6", "100 * n_cells")
          .cast("double") / 1e4).as("mae"))
      .orderBy(col("event_type"))
      .localCheckpoint(true)
    ev.unpersist(false)
    out
  }

  /** Engagement (L28-style) histogram: how many users were active on
    * exactly N distinct days — the power-user curve every growth team
    * reads (a right-shifted hump = habitual product, a wall at 1 =
    * drive-by traffic). Two shuffles over the BOUNDED distinct
    * (user, day) frame, integer counts only. */
  def engagementHist(spark: SparkSession, dir: String): DataFrame =
    Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("active_days"))
      .groupBy(col("active_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("active_days"))

  /** Stickiness (DAU/MAU-style) per day: daily actives over trailing
    * 28-day actives — the habit-strength ratio. Both numerator and
    * denominator derive from ONE persisted distinct (user, day) frame:
    * the denominator via the [[rollingActives]] equi-join shape
    * (bounded ×28 explode), the numerator as a plain day count; released
    * once the bounded day report materializes. */
  def stickiness(spark: SparkSession, dir: String,
                 windowDays: Int = 28): DataFrame = {
    val ud = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = ud.select(col("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val mau = ud
      .select(col("user_id"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"),
        col("day"))
      .select(col("user_id"), date_add(col("day"), col("off")).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("mau"))
    val out = dau.join(mau, Seq("day"))
      .select(col("day"), col("dau"), col("mau"),
        // count/count → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("1000000 * dau", "mau")
          .cast("double") / 1e6).as("stickiness"))
      .orderBy(col("day"))
      .localCheckpoint(true)
    ud.unpersist(false)
    out
  }

  /** Deterministic A/B experiment readout: users are assigned to arms by
    * a THIRD Lehmer/MINSTD step of the stable user id (16807 multiplier —
    * decorrelated from the 48271-based split and sampling hashes, same
    * portability argument: plain 63-bit-safe integer arithmetic any
    * engine reproduces, so assignment is retry-stable and
    * oracle-verifiable, never rand()). Conversion = heavy purchaser
    * (≥ `convertAt` purchase events — on this always-on synthetic corpus
    * EVERY user has a purchase, so presence-of-purchase is saturated and
    * a z test would be 0/0; a count threshold is the metric with real
    * between-user variance). One user-keyed aggregate → one 2-row arm
    * aggregate → a single readout row with the two-proportion z statistic
    * computed from exact integer counts (the pooled-variance form), so
    * the handful of double ops evaluate the identical scalar tree in
    * both engines. Degenerate pooled rates (0 or 1 — zero variance)
    * yield a NULL z, not a division error. */
  def abReadout(spark: SparkSession, dir: String,
                convertAt: Long = 15): DataFrame = {
    val perUser = Lake.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          >= convertAt, 1L).otherwise(0L)
        .as("converted"))
      .withColumn("arm",
        when(pmod(col("user_id") * lit(16807L), lit(2147483647L)) % 2 === 0,
          "A").otherwise("B"))
    // ONE aggregate straight to the readout row — filtering a per-arm
    // frame twice and cross-joining the halves would re-execute the
    // event scan + user aggregate per arm (the double-scan trap)
    perUser.agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "A", col("converted")).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === "B", col("converted")).otherwise(0L)).as("conv_b"))
      .withColumn("rate_a", col("conv_a").cast("double") / col("n_a"))
      .withColumn("rate_b", col("conv_b").cast("double") / col("n_b"))
      .withColumn("pooled",
        (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(col("rate_a"), 6).as("rate_a"),
        round(col("rate_b"), 6).as("rate_b"),
        round(col("rate_b") - col("rate_a"), 6).as("lift"),
        when(col("pooled") > 0 && col("pooled") < 1,
          round((col("rate_b") - col("rate_a")) /
            sqrt(col("pooled") * (lit(1.0) - col("pooled")) *
              (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4))
          .as("z_stat"))
  }

  /** Experiment power planner — the question to answer BEFORE the
    * [[abReadout]]/[[welch]]/mSPRT battery runs: per event type, the
    * minimum detectable effect of an equal-split two-sample test on the
    * per-user event count at α=0.05 (two-sided) and 80% power, plus the
    * per-arm sample size a 5%-relative lift would need. Every user
    * enters every type's frame (absent users contribute zero events:
    * the one-row distinct-user broadcast is the denominator, so sums
    * skip them but N doesn't — the classic silent-inflation trap in
    * per-type variance). Exact BIGINT moments; (z_{0.975} + z_{0.8})
    * enters as the single literal 2.801585 and its square as the
    * literal product, so both engines evaluate the identical scalar
    * tree. MDE = 2.8016·σ·2/√N for the equal split; n_req per arm =
    * ⌈2·(z-sum)²σ²/(0.05·μ)²⌉. */
  def mdePlanner(spark: SparkSession, dir: String): DataFrame = {
    val events = Lake.events(spark, dir)
    val totals = events.agg(countDistinct(col("user_id")).as("n_users"))
    val moments = events.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_present"),
        sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
    moments.crossJoin(broadcast(totals))
      .withColumn("mean", col("sx").cast("double") / col("n_users"))
      .withColumn("variance",
        (col("sxx").cast("double") -
          col("sx").cast("double") * col("sx") / col("n_users")) /
          col("n_users"))
      .withColumn("mde",
        lit(2.801585) * sqrt(lit(4.0) * col("variance") / col("n_users")))
      .select(col("event_type"), col("n_users"), col("n_present"),
        round(col("mean"), 4).as("mean_per_user"),
        round(col("variance"), 4).as("var_per_user"),
        round(col("mde"), 6).as("mde_abs"),
        round(col("mde") / col("mean"), 6).as("mde_rel"),
        ceil(lit(2.0) * (lit(2.801585) * lit(2.801585)) * col("variance") /
          ((lit(0.05) * col("mean")) * (lit(0.05) * col("mean"))))
          .cast("long").as("n_per_arm_5pct"))
      .orderBy(col("event_type"))
  }

  /** Difference-in-differences readout — the OBSERVATIONAL causal
    * complement of the randomized readouts: when assignment is NOT
    * randomized (a rollout, a policy change), the raw post-period gap
    * confounds group composition with the effect; DiD nets out the
    * time-invariant gap via δ = (B_post − B_pre) − (A_post − A_pre),
    * valid under parallel trends — and the pre-period gap is reported
    * beside δ exactly so the reader can judge that assumption. SE from
    * the four cell variances (independent-samples form), z = δ/SE.
    *
    * Shape: one events scan → ONE 2×2-cell moment row (every n/Σx/Σx²
    * folds into the same aggregate — the [[abReadout]] no-double-scan
    * discipline), exact DECIMAL(18,2) sums, scalar tree on top. */
  def didReadout(spark: SparkSession, dir: String): DataFrame =
    didReadout(Lake.events(spark, dir))

  def didReadout(events: DataFrame,
                 cutoff: String = "2024-01-11"): DataFrame = {
    val x = col("value").cast(dec2)
    val isB = pmod(col("user_id") * lit(16807L), lit(2147483647L)) % 2 =!= 0
    val isPost = col("ts") >= lit(cutoff).cast("timestamp")
    def cell(p: Column) = (
      sum(when(p, 1L).otherwise(0L)),
      sum(when(p, x).otherwise(null)),
      sum(when(p, x * x).otherwise(null)))
    val cells = Seq(
      ("a_pre", !isB && !isPost), ("a_post", !isB && isPost),
      ("b_pre", isB && !isPost), ("b_post", isB && isPost))
    val aggs = cells.flatMap { case (nm, p) =>
      val (n, s, q) = cell(p)
      Seq(n.as(s"n_$nm"), s.as(s"s_$nm"), q.as(s"q_$nm"))
    }
    var m = events.agg(aggs.head, aggs.tail: _*)
    for ((nm, _) <- cells) {
      m = m.withColumn(s"m_$nm",
          col(s"s_$nm").cast("double") / col(s"n_$nm"))
        .withColumn(s"v_$nm",
          (col(s"q_$nm").cast("double") - col(s"n_$nm").cast("double") *
            col(s"m_$nm") * col(s"m_$nm")) /
            (col(s"n_$nm") - 1).cast("double"))
    }
    m.withColumn("did",
        (col("m_b_post") - col("m_b_pre")) -
          (col("m_a_post") - col("m_a_pre")))
      .withColumn("se2", cells.map { case (nm, _) =>
        col(s"v_$nm") / col(s"n_$nm") }.reduce(_ + _))
      .select(
        col("n_a_pre"), col("n_a_post"), col("n_b_pre"), col("n_b_post"),
        round(col("m_a_pre"), 4).as("mean_a_pre"),
        round(col("m_a_post"), 4).as("mean_a_post"),
        round(col("m_b_pre"), 4).as("mean_b_pre"),
        round(col("m_b_post"), 4).as("mean_b_post"),
        round(col("m_b_pre") - col("m_a_pre"), 4).as("pre_gap"),
        round(col("did"), 4).as("did"),
        when(col("se2") > 0, round(col("did") / sqrt(col("se2")), 4))
          .as("z_did"))
  }

  /** mSPRT anytime-valid experiment monitor — the fix for the peeking
    * problem: a fixed-horizon z test read daily inflates false positives,
    * while the mixture sequential probability ratio
    * Λ_n = √(V/(V+τ²))·exp(δ̂²τ²/(2V(V+τ²))) admits the always-valid
    * p-process p_n = min_{d≤n} min(1, 1/Λ_d) — valid at EVERY
    * interim look, so "stop the experiment the day it clears α" is
    * statistically sound. τ is the mixture scale (≈ the effect size
    * worth detecting); day-by-day cumulative moments give one readout
    * row per elapsed day.
    *
    * Shape: one events scan → per-(day, arm) exact decimal moment sums →
    * cumulative windows over the bounded day frame (the daily-series
    * frame argument — calendar-sized, never corpus-sized) → scalar tree
    * per row and a running min for the p-process. Degenerate early days
    * (an arm empty or zero variance) yield NULL Λ and are skipped by the
    * running min in both engines. */
  def msprtReadout(spark: SparkSession, dir: String): DataFrame =
    msprtReadout(Lake.events(spark, dir))

  def msprtReadout(events: DataFrame, tau: Double = 5.0,
                   alpha: Double = 0.05): DataFrame = {
    val x = col("value").cast(dec2)
    val isA = pmod(col("user_id") * lit(16807L), lit(2147483647L)) % 2 === 0
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("na_d"),
        sum(when(!isA, 1L).otherwise(0L)).as("nb_d"),
        sum(when(isA, x).otherwise(lit(0).cast(dec2))).as("sa_d"),
        sum(when(!isA, x).otherwise(lit(0).cast(dec2))).as("sb_d"),
        sum(when(isA, x * x).otherwise(lit(0).cast(dec2))).as("qa_d"),
        sum(when(!isA, x * x).otherwise(lit(0).cast(dec2))).as("qb_d"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tau2 = tau * tau
    val cum = daily
      .withColumn("n_a", sum(col("na_d")).over(wCum))
      .withColumn("n_b", sum(col("nb_d")).over(wCum))
      .withColumn("sa", sum(col("sa_d")).over(wCum))
      .withColumn("sb", sum(col("sb_d")).over(wCum))
      .withColumn("qa", sum(col("qa_d")).over(wCum))
      .withColumn("qb", sum(col("qb_d")).over(wCum))
      .withColumn("m_a", col("sa").cast("double") / col("n_a"))
      .withColumn("m_b", col("sb").cast("double") / col("n_b"))
      .withColumn("s2", when(col("n_a") + col("n_b") > 2,
        ((col("qa").cast("double") - col("n_a") * col("m_a") * col("m_a")) +
         (col("qb").cast("double") - col("n_b") * col("m_b") * col("m_b"))) /
          (col("n_a") + col("n_b") - 2).cast("double")))
      .withColumn("vn", when(col("n_a") > 0 && col("n_b") > 0,
        col("s2") * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      .withColumn("delta", col("m_b") - col("m_a"))
      // Λ is reported in LOG space: at sf10 the raw mixture ratio
      // reaches ~8·10¹² and the engines' libm exp() implementations
      // split at the last repr digit (the decade sweep's catch; a
      // double overflow to Inf waits a decade later). ln Λ =
      // ½·ln(V/(V+τ²)) + δ²τ²/(2V(V+τ²)) never overflows, stays ~O(30),
      // and rounds stably at 6 dp; the p-process uses exp(−lnΛ), which
      // lives in [0,1] where 6-dp rounding absorbs any ulp split.
      .withColumn("loglam", when(col("vn") > 0,
        lit(0.5) * log(col("vn") / (col("vn") + lit(tau2))) +
          col("delta") * col("delta") * lit(tau2) /
            (lit(2.0) * col("vn") * (col("vn") + lit(tau2)))))
      .withColumn("p_raw", when(col("loglam").isNotNull,
        least(lit(1.0), exp(-col("loglam")))))
      .withColumn("p_always", min(col("p_raw")).over(wCum))
    cum.select(col("day"), col("n_a"), col("n_b"),
        round(col("delta"), 4).as("lift"),
        round(col("loglam"), 6).as("log_lambda"),
        round(col("p_always"), 6).as("p_always"),
        (col("p_always") <= alpha).as("significant"))
      .orderBy(col("day"))
  }

  /** CUPED variance-reduced A/B readout — the standard trick for making
    * experiments readable sooner: a user's PRE-period activity predicts
    * their post-period metric regardless of arm, so regressing it out
    * (θ = cov(pre, post)/var(pre), y′ = y − θ(x − x̄)) shrinks metric
    * variance without touching the expected lift (arms share x̄ by
    * randomization). Reports the raw and adjusted lifts, θ, and the
    * variance-reduction ratio 1 − var(y′)/var(y) = ρ² — how much
    * experiment duration the covariate just saved.
    *
    * Shape: one events scan → user-keyed (pre, post) sums (exact
    * DECIMAL(18,2), re-capped at 18,2 so the second-moment products stay
    * inside DECIMAL(38,4) in BOTH engines — never the >38-precision
    * multiply whose capping rules differ) → ONE moment row (n/Σx/Σy/Σxy/
    * Σx²/Σy² per arm where needed) → a pure scalar tree. Lehmer arms as
    * everywhere. Degenerate var(pre) = 0 yields NULL θ and the raw
    * readout unadjusted. */
  def cupedReadout(spark: SparkSession, dir: String): DataFrame =
    cupedReadout(Lake.events(spark, dir))

  def cupedReadout(events: DataFrame,
                   cutoff: String = "2024-01-11"): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < lit(cutoff).cast("timestamp"),
          col("value").cast(dec2)).otherwise(lit(0).cast(dec2)))
          .cast(dec2).as("x"),
        sum(when(col("ts") >= lit(cutoff).cast("timestamp"),
          col("value").cast(dec2)).otherwise(lit(0).cast(dec2)))
          .cast(dec2).as("y"))
      .withColumn("a",
        when(pmod(col("user_id") * lit(16807L), lit(2147483647L)) % 2 === 0,
          1L).otherwise(0L))
    val m = perUser.agg(
      sum(col("a")).as("n_a"),
      sum(lit(1L) - col("a")).as("n_b"),
      sum(when(col("a") === 1, col("x")).otherwise(null)).as("sxa"),
      sum(when(col("a") === 0, col("x")).otherwise(null)).as("sxb"),
      sum(when(col("a") === 1, col("y")).otherwise(null)).as("sya"),
      sum(when(col("a") === 0, col("y")).otherwise(null)).as("syb"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("mx",
        (col("sxa") + col("sxb")).cast("double") / col("n"))
      .withColumn("my",
        (col("sya") + col("syb")).cast("double") / col("n"))
      .withColumn("vx", col("sxx").cast("double") / col("n") -
        col("mx") * col("mx"))
      .withColumn("vy", col("syy").cast("double") / col("n") -
        col("my") * col("my"))
      .withColumn("cxy", col("sxy").cast("double") / col("n") -
        col("mx") * col("my"))
      .withColumn("theta", when(col("vx") > 0, col("cxy") / col("vx")))
      .withColumn("mya", col("sya").cast("double") / col("n_a"))
      .withColumn("myb", col("syb").cast("double") / col("n_b"))
      .withColumn("mxa", col("sxa").cast("double") / col("n_a"))
      .withColumn("mxb", col("sxb").cast("double") / col("n_b"))
    m.select(col("n_a"), col("n_b"),
        round(col("mya"), 4).as("mean_post_a"),
        round(col("myb"), 4).as("mean_post_b"),
        round(col("myb") - col("mya"), 4).as("lift_raw"),
        round(col("theta"), 6).as("theta"),
        round((col("myb") - coalesce(col("theta"), lit(0.0)) *
            (col("mxb") - col("mx"))) -
          (col("mya") - coalesce(col("theta"), lit(0.0)) *
            (col("mxa") - col("mx"))), 4)
          .as("lift_adj"),
        when(col("vy") > 0 && col("theta").isNotNull,
          round(col("cxy") * col("cxy") / (col("vx") * col("vy")), 6))
          .as("var_reduction"))
  }

  /** Funnel conversion report with Wilson 95% intervals: per step, how
    * many users who reached the PREVIOUS step converted, as a rate with
    * the score-interval bounds — the uncertainty-aware version of the
    * raw funnel (a 60% step on 10 users and on 10,000 users are very
    * different facts; the CI is what makes that visible on the
    * dashboard). Wilson rather than the normal approximation because
    * step tails are exactly where p̂ sits near 0 or 1 and Wald collapses.
    *
    * One user aggregate (min event time per step, the [[funnel]] shape)
    * → ONE global count row → three stacked step rows, each evaluating
    * the identical closed-form scalar tree (z = 1.96 literal). */
  def funnelCi(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Lake.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      .select(
        when(col("t_view").isNotNull, 1L).otherwise(0L).as("s1"),
        when(col("t_view") < col("t_click"), 1L).otherwise(0L).as("s2"),
        when(col("t_view") < col("t_click") &&
          col("t_click") < col("t_purchase"), 1L).otherwise(0L).as("s3"))
    val totals = perUser.agg(
      count(lit(1)).as("n_users"),
      sum(col("s1")).as("n1"), sum(col("s2")).as("n2"),
      sum(col("s3")).as("n3"))
    val stacked = totals.select(expr(
      """stack(3,
        |  'view',           n_users, n1,
        |  'view>click',     n1,      n2,
        |  'view>click>buy', n2,      n3)
        |AS (step, n_prev, n_conv)""".stripMargin))
    val z = lit(1.96)
    val n = col("n_prev").cast("double")
    val p = col("n_conv").cast("double") / n
    val denom = lit(1.0) + z * z / n
    val center = (p + z * z / (lit(2.0) * n)) / denom
    val half = z * sqrt(p * (lit(1.0) - p) / n +
      z * z / (lit(4.0) * n * n)) / denom
    stacked.select(
      col("step"), col("n_prev"), col("n_conv"),
      round(p, 4).as("rate"),
      round(center - half, 4).as("lo95"),
      round(center + half, 4).as("hi95"))
  }

  /** Daily percentile bands of the event value (p50 / p90 / p99) — the
    * latency-dashboard shape: one exact multi-probability `percentile`
    * aggregate per day (bounded groups; swap `approx_percentile` at
    * 100 TB, same plan). */
  def dailyPercentiles(spark: SparkSession, dir: String): DataFrame =
    Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        expr("percentile(value, array(0.5D, 0.9D, 0.99D))").as("q"))
      .select(col("day"), col("n_events"),
        round(col("q").getItem(0), 4).as("p50"),
        round(col("q").getItem(1), 4).as("p90"),
        round(col("q").getItem(2), 4).as("p99"))
      .orderBy(col("day"))

  /** STL-style additive decomposition of the daily event-count series:
    * trend = centered 7-day moving average (edge days average their
    * in-window neighbors — no fabricated padding), seasonal = per
    * weekday mean of the detrended series, residual = the rest. The
    * classic first cut any time-series triage runs before picking a
    * model; the anomaly screens upstream flag spikes, this explains the
    * structure they sit on.
    *
    * Exactness: trend is Σx/n of BIGINT window sums (one double
    * division); each detrended term is rounded once and decimal-summed
    * per weekday (the surprisal discipline — aggregation-order-free, so
    * the weekday means are engine-identical), seasonal is one double
    * division of that exact sum. One events scan → bounded daily frame
    * (persisted: the weekday aggregate and the final join both consume
    * it); the 7-row seasonal frame broadcasts back. */
  def stlDecompose(spark: SparkSession, dir: String): DataFrame =
    withStlFrame(spark, dir) { df =>
      df.select(col("day"), col("x").as("n_events"),
        round(col("trend"), 4).as("trend"),
        round(col("seasonal"), 4).as("seasonal"),
        round(col("x") - col("trend") - col("seasonal"), 4).as("residual"))
        .orderBy(col("day"))
    }

  /** Shared STL pipeline: hands `body` the unrounded
    * (day, x, trend, seasonal) frame, managing the persist/release of
    * the bounded daily frame around it. */
  private def withStlFrame(spark: SparkSession, dir: String)
                          (body: DataFrame => DataFrame): DataFrame = {
    val wMa = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val daily = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("trend",
        sum(col("x")).over(wMa).cast("double") / count(lit(1)).over(wMa))
      .withColumn("dow", weekday(col("day")))
      .withColumn("det",
        round(col("x") - col("trend"), 6).cast(DecimalType(18, 6)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seasonal = daily.groupBy(col("dow"))
      .agg((sum(col("det")).cast("double") / count(lit(1))).as("seasonal"))
    val out = body(daily.join(broadcast(seasonal), Seq("dow")))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Strength-of-seasonality (Hyndman's F_s = max(0, 1 − Var(R)/Var(S+R))
    * over the STL decomposition) — the one-number answer to "is there a
    * weekly cycle worth modeling". Variances come from decimal sums of
    * round-once residual/detrended terms (Σv, Σv² exact → one variance
    * expression per side), so the unordered aggregation cannot move a
    * bit; detrended = x − trend IS seasonal + residual by construction. */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame =
    withStlFrame(spark, dir) { df =>
      val dec6 = DecimalType(18, 6)
      val r6 = round(col("x") - col("trend") - col("seasonal"), 6).cast(dec6)
      val d6 = round(col("x") - col("trend"), 6).cast(dec6)
      df.select(r6.as("r"), d6.as("d"))
        .agg(count(lit(1)).as("n"),
          sum(col("r")).as("sr"), sum(col("r") * col("r")).as("srr"),
          sum(col("d")).as("sd"), sum(col("d") * col("d")).as("sdd"))
        .select(col("n").as("n_days"),
          round((col("srr").cast("double") -
            col("sr").cast("double") * col("sr").cast("double") / col("n")) /
            col("n"), 6).as("var_resid"),
          round((col("sdd").cast("double") -
            col("sd").cast("double") * col("sd").cast("double") / col("n")) /
            col("n"), 6).as("var_detrended"),
          round(greatest(lit(0.0), lit(1.0) -
            ((col("srr").cast("double") -
              col("sr").cast("double") * col("sr").cast("double") / col("n")) /
              col("n")) /
            ((col("sdd").cast("double") -
              col("sd").cast("double") * col("sd").cast("double") / col("n")) /
              col("n"))), 4).as("strength"))
    }

  /** Split-conformal prediction intervals for the seasonal-naive
    * forecast — the distribution-free finite-sample guarantee on top of
    * [[forecastBacktest]]'s point forecasts: train means come from days
    * before `trainEnd`, the per-type conformal radius `qhat` is the
    * ⌈(n+1)(1−α)⌉-th smallest CALIBRATION residual (an ORDER STATISTIC,
    * never an interpolated quantile — that is what makes the ≥ 1−α
    * coverage guarantee exact and the value engine-identical), and the
    * report measures empirical coverage of forecast ± qhat on the
    * disjoint TEST days.
    *
    * Shape: one events scan (persisted — three day-range consumers),
    * bounded dense grids (days × 24 × types, the q_gap_fill pattern),
    * the rank window partitioned per type over bounded calibration
    * cells. Bounded driver probes: the three distinct-day counts
    * (calendar-bounded, the forecastBacktest discipline). */
  def conformalForecast(spark: SparkSession, dir: String,
                        trainEnd: String = "2024-01-15",
                        calEnd: String = "2024-01-22",
                        alpha: Double = 0.1): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha in (0,1)")
    val ev = Lake.events(spark, dir)
      .select(col("ts"), col("event_type"),
        to_date(col("ts")).as("day"), hour(col("ts")).as("hod"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainCut = lit(trainEnd).cast("timestamp")
    val calCut = lit(calEnd).cast("timestamp")
    val train = ev.filter(col("ts") < trainCut)
    val nTrainDays = train.select(col("day")).distinct().count()
    require(nTrainDays > 0, "trainEnd leaves no training days")
    val trainMean = train.groupBy(col("hod"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("forecast", col("n").cast("double") / nTrainDays)
      .select(col("hod"), col("event_type"), col("forecast"))
    val types = ev.select(col("event_type")).distinct()
    val hods = spark.range(0, 24).select(col("id").cast("int").as("hod"))
    def residualGrid(lo: Column, hi: Option[Column]): DataFrame = {
      val slice = hi.fold(ev.filter(col("ts") >= lo))(h =>
        ev.filter(col("ts") >= lo && col("ts") < h))
      val days = slice.select(col("day")).distinct()
      days.crossJoin(broadcast(types)).crossJoin(broadcast(hods))
        .join(slice.groupBy(col("day"), col("hod"), col("event_type"))
          .agg(count(lit(1)).as("actual")),
          Seq("day", "hod", "event_type"), "left")
        .na.fill(0L, Seq("actual"))
        .join(broadcast(trainMean), Seq("hod", "event_type"), "left")
        .na.fill(0.0, Seq("forecast"))
        .withColumn("residual", abs(col("actual") - col("forecast")))
    }
    val cal = residualGrid(trainCut, Some(calCut))
    val wRank = Window.partitionBy(col("event_type")).orderBy(col("residual"))
    val qhat = cal
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("n_cal",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") ===
        least(col("n_cal"),
          ceil((col("n_cal") + lit(1)) * lit(1.0 - alpha)).cast("long")))
      .select(col("event_type"), col("n_cal"), col("residual").as("qhat"))
    val out = residualGrid(calCut, None)
      .join(broadcast(qhat), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        max(col("n_cal")).as("n_cal"),
        round(max(col("qhat")), 6).as("qhat"),
        count(lit(1)).as("n_test"),
        sum(when(col("residual") <= col("qhat"), 1L).otherwise(0L))
          .as("n_covered"))
      // count/count → exact integer half-up ([[ExactRound]])
      .withColumn("coverage",
        ExactRound.halfUpPos("10000 * n_covered", "n_test")
          .cast("double") / 1e4)
      .orderBy(col("event_type"))
      .localCheckpoint(true)
    ev.unpersist(false)
    out
  }

  /** Next-event prediction eval for the Markov (transition-count) model:
    * train the per-type argmax successor on transitions whose TARGET
    * lands before `cutoff`, score accuracy@1 on the transitions after it
    * — the held-out harness that turns the q_transitions matrix into a
    * measured predictor (a majority-successor baseline any sequence
    * model must beat). Ties break to the lexicographically first
    * successor via one partial-aggregable min(struct(−count, type)) —
    * no rank window over the transition matrix.
    *
    * Shape: one events scan → one user-partitioned lead window (the
    * sessionization shuffle), persisted because the train and test
    * slices both consume it; train aggregate is bounded (type²), its
    * argmax rides a broadcast join onto the test slice. */
  def markovEval(spark: SparkSession, dir: String,
                 cutoff: String = "2024-01-22"): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = Lake.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("event_type"), col("next_type"), col("next_ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pred = trans.filter(col("next_ts") < cut)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(min(struct((-col("c")).as("nc"), col("next_type").as("t")))
        .as("s"))
      .select(col("event_type"), col("s.t").as("predicted"))
    val out = trans.filter(col("next_ts") >= cut)
      .join(broadcast(pred), Seq("event_type"))
      .groupBy(col("event_type"), col("predicted"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("next_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      // count/count → exact integer half-up ([[ExactRound]])
      .withColumn("accuracy",
        ExactRound.halfUpPos("10000 * n_correct", "n_test")
          .cast("double") / 1e4)
      .orderBy(col("event_type"))
      .localCheckpoint(true)
    trans.unpersist(false)
    out
  }

  /** Growth accounting — the DAU identity every growth team reports:
    * per day, actives decomposed into NEW (first-ever day), RETAINED
    * (also active yesterday) and RESURRECTED (active before, but not
    * yesterday), plus CHURNED (active yesterday, gone today) — so
    * active_t = new_t + retained_t + resurrected_t and
    * active_t − active_{t−1} = new_t + resurrected_t − churned_t holds
    * row by row. One events scan → bounded distinct user-day frame →
    * ONE user-partitioned window pass computes every flag (min/lag/lead
    * over the user's day sequence); churn contributions shift to day+1
    * and the two bounded daily aggregates join on day (the frame
    * persists for its two consumers). */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val ud = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("first_day", min(col("day")).over(
        Window.partitionBy(col("user_id"))))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .withColumn("next_day", lead(col("day"), 1).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val daily = ud.groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(datediff(col("day"), col("prev_day")) === 1, 1L)
          .otherwise(0L)).as("n_retained"),
        sum(when(col("day") =!= col("first_day") &&
          (col("prev_day").isNull ||
            datediff(col("day"), col("prev_day")) > 1), 1L)
          .otherwise(0L)).as("n_resurrected"))
    val churn = ud
      .filter(col("next_day").isNull ||
        datediff(col("next_day"), col("day")) > 1)
      .select(date_add(col("day"), 1).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_churned"))
    val out = daily
      .join(churn, Seq("day"), "left")
      .na.fill(0L, Seq("n_churned"))
      .orderBy(col("day"))
      .localCheckpoint(true)
    ud.unpersist(false)
    out
  }

  /** Top weekly movers: the event types whose week-over-week count
    * swing is largest — the "what changed" screen above the WoW report.
    * Per (type, week) counts, a lag window per type (bounded series),
    * global rank by absolute relative swing over the bounded
    * type×week frame; top `k` with deterministic tie-breaks. */
  def topMovers(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val wLag = Window.partitionBy(col("event_type")).orderBy(col("week"))
    Lake.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("week", col("ts")).as("week"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("prev_n", lag(col("n_events"), 1).over(wLag))
      .filter(col("prev_n").isNotNull)
      // SIGNED int ratio → exact integer half-up ([[ExactRound]])
      .withColumn("wow",
        ExactRound.halfUp("1000000 * (n_events - prev_n)", "prev_n")
          .cast("double") / 1e6)
      .select(col("event_type"), col("week"), col("n_events"),
        col("prev_n"), col("wow"))
      .orderBy(abs(col("wow")).desc, col("event_type"), col("week"))
      .limit(k)
  }

  /** Sample-ratio-mismatch (SRM) check for the A/B assignment — the
    * first thing to audit before reading ANY experiment result: under a
    * 50/50 split the arm sizes should differ only by chance, and
    * χ² = (n_a − n_b)²/(n_a + n_b) against the 3.841 critical value
    * (95%, 1 df — a literal, so no CDF library can disagree) flags a
    * broken randomizer / lossy logging pipeline. Same Lehmer arm hash
    * as [[abReadout]]; one user aggregate → one readout row of exact
    * integer counts + one division. */
  def srmCheck(spark: SparkSession, dir: String): DataFrame =
    Lake.events(spark, dir)
      .select(col("user_id")).distinct()
      .withColumn("arm",
        when(pmod(col("user_id") * lit(16807L), lit(2147483647L)) % 2 === 0,
          "A").otherwise("B"))
      .agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        round((col("n_a") - col("n_b")).cast("double") *
          (col("n_a") - col("n_b")) / (col("n_a") + col("n_b")), 4)
          .as("chi2"),
        ((col("n_a") - col("n_b")).cast("double") *
          (col("n_a") - col("n_b")) / (col("n_a") + col("n_b")) >
          lit(3.841)).as("srm_detected"))

  /** Lag-k autocorrelation (sample ACF) of the daily event-count series,
    * k = 1..`maxLag` — the first diagnostic any seasonality / forecast
    * work runs (a weekly cycle shows up as a positive spike at lag 7).
    *
    * Shape: one events scan → bounded daily frame (calendar days); pairs
    * at lag k come from an EQUI self-join on `day + k` (never a windowed
    * shift per lag — one join covers every lag via a 7-way explode of the
    * probe side). All accumulated sums are BIGINT (counts, products of
    * counts), so aggregation order cannot move a bit; the mean, the
    * centered cross-moment expansion Σxy − m·Σx − m·Σy + c·m², and the
    * variance denominator are evaluated as one deterministic scalar tree
    * per lag row on the bounded lag frame, rounded to 6. */
  def acfQuery(spark: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    val daily = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = daily.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val pairs = daily
      .withColumn("k", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("tday", date_add(col("day"), col("k")))
      .select(col("k"), col("tday"), col("x").as("xa"))
      .join(daily.select(col("day").as("tday"), col("x").as("xb")), "tday")
    val out = pairs
      .groupBy(col("k"))
      .agg(count(lit(1)).as("c"), sum(col("xa")).as("sa"),
        sum(col("xb")).as("sb"), sum(col("xa") * col("xb")).as("sab"))
      .crossJoin(broadcast(stats))
      .withColumn("m", col("sx").cast("double") / col("n"))
      .select(
        col("k").cast("int").as("lag"),
        col("c").cast("long").as("n_pairs"),
        round(
          (col("sab").cast("double") - col("m") * col("sa") -
            col("m") * col("sb") + col("c") * col("m") * col("m")) /
            (col("sxx").cast("double") -
              col("sx").cast("double") * col("sx") / col("n")), 6)
          .as("acf"))
      .orderBy(col("lag"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** AR(2) fit by Yule–Walker plus a one-step in-sample backtest — the
    * modeling step the [[acfQuery]] diagnostic feeds: from the lag-1/2
    * sample autocorrelations, φ₁ = r₁(1−r₂)/(1−r₁²) and
    * φ₂ = (r₂−r₁²)/(1−r₁²) in closed form (no iterative optimizer —
    * the method-of-moments solve distributed AR fitting reduces to),
    * then every day with both lag days present is scored
    * x̂ₜ = m + φ₁(xₜ₋₁−m) + φ₂(xₜ₋₂−m) against the lag-1 naive
    * baseline, reporting both RMSEs and the skill 1 − rmse_ar/rmse_nv.
    *
    * Shape: one events scan → bounded daily frame; lag pairs and the
    * backtest triples come from calendar EQUI self-joins (the acf
    * discipline — never an unpartitioned window). Determinism: r₁, r₂
    * from BIGINT sums via one scalar tree, rounded once to 6 dp; φ and
    * the mean rounded once to 6 dp BEFORE broadcast, so each day's
    * squared AR error is the same double in both engines and enters the
    * sum rounded to 6 dp in decimal (order-free); the naive squared
    * error is an exact BIGINT. */
  def ar2Forecast(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val daily = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = daily.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val pairs = daily
      .withColumn("k", explode(sequence(lit(1), lit(2))))
      .withColumn("tday", date_add(col("day"), col("k")))
      .select(col("k"), col("tday"), col("x").as("xa"))
      .join(daily.select(col("day").as("tday"), col("x").as("xb")), "tday")
    val ac = pairs.groupBy(col("k"))
      .agg(count(lit(1)).as("c"), sum(col("xa")).as("sa"),
        sum(col("xb")).as("sb"), sum(col("xa") * col("xb")).as("sab"))
      .crossJoin(broadcast(stats))
      .withColumn("m", col("sx").cast("double") / col("n"))
      .select(col("k"),
        round(
          (col("sab").cast("double") - col("m") * col("sa") -
            col("m") * col("sb") + col("c") * col("m") * col("m")) /
            (col("sxx").cast("double") -
              col("sx").cast("double") * col("sx") / col("n")), 6)
          .as("a"))
    val coef = ac.agg(
        max(when(col("k") === 1, col("a"))).as("r1"),
        max(when(col("k") === 2, col("a"))).as("r2"))
      .select(col("r1"), col("r2"),
        round(col("r1") * (lit(1.0) - col("r2")) /
          (lit(1.0) - col("r1") * col("r1")), 6).as("phi1"),
        round((col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1")), 6).as("phi2"))
    val mrow = stats.select(col("n"),
      // integer mean → exact integer half-up ([[ExactRound]])
      (ExactRound.halfUpPos("1000000 * sx", "n")
        .cast("double") / 1e6).as("m"))
    val tri = daily
      .join(daily.select(date_add(col("day"), 1).as("day"),
        col("x").as("x1")), "day")
      .join(daily.select(date_add(col("day"), 2).as("day"),
        col("x").as("x2")), "day")
    val bt = tri.crossJoin(broadcast(coef)).crossJoin(broadcast(mrow))
      .withColumn("pred",
        col("m") + col("phi1") * (col("x1") - col("m")) +
          col("phi2") * (col("x2") - col("m")))
      .agg(count(lit(1)).as("ns"),
        sum(round(pow(col("x") - col("pred"), 2), 6).cast(d6)).as("ssa"),
        sum((col("x") - col("x1")) * (col("x") - col("x1"))).as("ssn"))
    val out = bt.crossJoin(broadcast(coef)).crossJoin(broadcast(mrow))
      .select(col("n").as("n_days"), col("m").as("mean_daily"),
        col("r1"), col("r2"), col("phi1"), col("phi2"),
        col("ns").as("n_scored"),
        round(sqrt(col("ssa").cast("double") / col("ns")), 4)
          .as("rmse_ar2"),
        round(sqrt(col("ssn").cast("double") / col("ns")), 4)
          .as("rmse_naive"),
        round(lit(1.0) - sqrt(col("ssa").cast("double") / col("ns")) /
          sqrt(col("ssn").cast("double") / col("ns")), 4).as("skill"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Stratified (coarsened-exact-matching-style) observational
    * treatment-effect readout — the causal estimator for NON-randomized
    * exposure that the randomized [[abReadout]]/[[cupedReadout]] family
    * cannot cover: treatment Tᵤ = "user hit an `error` event on their
    * FIRST active day", outcome Yᵤ = post-first-day purchase count.
    * Activity confounds both (busier users see more first-day events
    * AND buy more), so the naive treated-minus-control gap overstates
    * the effect; stratifying on fixed-width activity buckets
    * (stratum = n_events DIV 20 — fixed edges, never an ntile over the
    * user population) and reweighting within-stratum gaps by the
    * treated share gives the classic ATT estimator
    * Σ_s (n_t,s/N_t)·(ȳ_t,s − ȳ_c,s) over strata with BOTH groups
    * present (off-support strata are reported, not silently dropped).
    *
    * Shape: one events scan with a per-user (key-partitioned) window
    * for the first active day, one user-level reduce, then everything
    * lives on the bounded stratum frame. Integer sums throughout;
    * each stratum's contribution is rounded once to 6 dp into decimal
    * so the ATT sum is order-free. */
  def attStratified(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val wU = Window.partitionBy(col("user_id"))
    val users = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type"))
      .withColumn("d0", min(col("d")).over(wU))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("d") === col("d0") &&
          col("event_type") === "error", 1L).otherwise(0L)).as("treated"),
        sum(when(col("d") > col("d0") &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("y"),
        count(lit(1)).as("n_events"))
      .withColumn("stratum", expr("n_events DIV 20"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val overall = users.agg(
      count(lit(1)).as("n_users"),
      sum(col("treated")).as("n_treated"),
      sum(when(col("treated") === 1L, col("y"))).as("yt"),
      sum(when(col("treated") === 0L, col("y"))).as("yc"))
    val strata = users.groupBy(col("stratum")).agg(
      sum(when(col("treated") === 1L, 1L).otherwise(0L)).as("n_t"),
      sum(when(col("treated") === 0L, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("treated") === 1L, col("y")).otherwise(0L)).as("y_t"),
      sum(when(col("treated") === 0L, col("y")).otherwise(0L)).as("y_c"))
    val used = strata.filter(col("n_t") > 0 && col("n_c") > 0)
    val ntu = used.agg(sum(col("n_t")).as("nt_used"),
      count(lit(1)).as("n_strata_used"))
    val att = used.crossJoin(broadcast(ntu))
      // (n_t/N)·(ȳ_t − ȳ_c) clears to (y_t·n_c − y_c·n_t)/(N·n_c) —
      // a SIGNED integer ratio → exact integer half-up
      .withColumn("contrib",
        (ExactRound.halfUp("1000000 * (y_t * n_c - y_c * n_t)",
          "nt_used * n_c").cast("double") / 1e6).cast(d6))
      .agg(sum(col("contrib")).as("att_d"),
        max(col("nt_used")).as("nt_used"),
        max(col("n_strata_used")).as("n_strata_used"))
    val nStrata = strata.agg(count(lit(1)).as("n_strata"))
    val out = overall.crossJoin(broadcast(att))
      .crossJoin(broadcast(nStrata))
      .select(col("n_users"), col("n_treated"),
        (col("n_users") - col("n_treated")).as("n_control"),
        // ȳ_t − ȳ_c clears to (yt·n_c − yc·n_t)/(n_t·n_c), SIGNED →
        // exact integer half-up
        (ExactRound.halfUp(
          "10000 * (yt * (n_users - n_treated) - yc * n_treated)",
          "n_treated * (n_users - n_treated)")
          .cast("double") / 1e4).as("naive_diff"),
        round(col("att_d"), 4).cast("double").as("att"),
        col("n_strata"), col("n_strata_used"),
        col("nt_used").as("n_treated_on_support"))
      .localCheckpoint(true)
    users.unpersist(false)
    out
  }

  /** Two-group log-rank test over the [[survivalCurve]] lifetimes — the
    * inferential step the KM curve itself stops short of: does the
    * "rough start" cohort (an `error` event on the user's FIRST active
    * day, the [[attStratified]] exposure) churn measurably faster? Per
    * lifetime week t and group g, the at-risk counts n_g,t and observed
    * deaths d_g,t yield O₁ = Σd₁,t, E₁ = Σ dₜ·n₁,t/nₜ and the
    * hypergeometric variance Vₜ = dₜ(n₁/n)(n₀/n)(n−d)/(n−1); the
    * statistic is χ² = (O₁−E₁)²/V on 1 df, with the two-sided p from
    * the repo's logistic normal-CDF approximation at z = √χ² (the
    * Welch-test constant pair 0.07056/1.5976).
    *
    * Shape: one events scan → per-user frame (one key-partitioned
    * window for the first-day flag) → everything after lives on the
    * bounded lifetime-week frame; per-week E/V terms are rounded once
    * to 6 dp into decimal so the sums are order-free; O and the risk
    * counts stay exact BIGINTs. Right censoring follows
    * [[survivalCurve]]: a last event within `censorDays` of corpus end
    * is censored, not a death. */
  def logrank(spark: SparkSession, dir: String,
              censorDays: Int = 14): DataFrame = {
    val d6 = DecimalType(18, 6)
    val wU = Window.partitionBy(col("user_id"))
    val users = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .withColumn("d0", min(col("d")).over(wU))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("d") === col("d0") &&
          col("event_type") === "error", 1L).otherwise(0L)).as("grp"),
        min(col("d")).as("first_day"), max(col("d")).as("last_day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val end = users.agg(max(col("last_day")).as("corpus_end"))
    val byWeek = users.crossJoin(broadcast(end))
      .select(col("grp"),
        floor(datediff(col("last_day"), col("first_day")) / 7)
          .cast("int").as("week"),
        when(datediff(col("corpus_end"), col("last_day")) > censorDays, 1L)
          .otherwise(0L).as("observed"))
      .groupBy(col("week"))
      .agg(
        sum(when(col("grp") === 1L, col("observed")).otherwise(0L)).as("d1"),
        sum(when(col("grp") === 0L, col("observed")).otherwise(0L)).as("d0"),
        sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("l1"),
        sum(when(col("grp") === 0L, 1L).otherwise(0L)).as("l0"))
    val wOrd = Window.orderBy(col("week"))
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val terms = byWeek
      .withColumn("n1", sum(col("l1")).over(wAll) - coalesce(
        sum(col("l1")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n0", sum(col("l0")).over(wAll) - coalesce(
        sum(col("l0")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("n", col("n1") + col("n0"))
      .withColumn("d", col("d1") + col("d0"))
      .withColumn("e1_t", round(
        col("d").cast("double") * col("n1") / col("n"), 6).cast(d6))
      .withColumn("v_t", when(col("n") > 1L, round(
        col("d").cast("double") * (col("n1").cast("double") / col("n")) *
          (col("n0").cast("double") / col("n")) *
          (col("n") - col("d")).cast("double") / (col("n") - 1L), 6))
        .otherwise(lit(0.0)).cast(d6))
    val agg = terms.agg(
      sum(col("l1")).as("n_treated"), sum(col("l0")).as("n_control"),
      sum(col("d1")).as("o1"), sum(col("d0")).as("o0"),
      sum(col("e1_t")).as("e1"), sum(col("v_t")).as("v"))
    val out = agg
      .withColumn("z", when(col("v").cast("double") > 0.0,
        (col("o1").cast("double") - col("e1").cast("double")) /
          sqrt(col("v").cast("double"))))
      .select(col("n_treated"), col("n_control"), col("o1"), col("o0"),
        round(col("e1"), 4).cast("double").as("e1"),
        round(col("o1") + col("o0") - col("e1"), 4).cast("double").as("e0"),
        round(col("z") * col("z"), 4).as("chi2"),
        round(lit(2.0) / (lit(1.0) +
          exp(lit(0.07056) * pow(abs(col("z")), 3.0) +
            lit(1.5976) * abs(col("z")))), 6).as("p_value"))
      .localCheckpoint(true)
    users.unpersist(false)
    out
  }

  /** Discrete-frequency periodogram of the daily event counts — the
    * spectral twin of the [[acfQuery]]/[[seasonalStrength]] pair: for
    * each candidate period p in 2..14 days (a DESIGN-constant grid, the
    * bounded-grid discipline), the squared projection of the demeaned
    * series onto (cos, sin) at frequency 1/p, normalized by the total
    * sum of squares — so a pure p-periodic signal concentrates its
    * variance at p and the weekly cycle surfaces as the p = 7 peak.
    *
    * Cross-engine determinism: the angle is 2·acos(−1)·(idx mod p)/p
    * with idx = days since epoch (integer mod keeps the argument in
    * [0, 2π)); cos/sin are rounded once to 6 dp (a 1-ulp libm
    * disagreement cannot cross a 6-dp boundary), the mean is rounded
    * once to 6 dp, and each projection term rounds once to 6 dp into
    * decimal so both sums are exact in any order. One events scan;
    * the grid frame is 13 × days — bounded. */
  def periodogram(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val daily = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .select(datediff(col("day"), to_date(lit("1970-01-01"))).as("idx"),
        col("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = daily.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val pi2 = lit(2.0) * acos(lit(-1.0))
    val terms = daily
      .withColumn("p", explode(sequence(lit(2), lit(14))))
      .crossJoin(broadcast(stats.select(
        // integer mean → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("1000000 * sx", "n")
          .cast("double") / 1e6).as("m"))))
      .withColumn("ang", pi2 * (col("idx") % col("p")) / col("p"))
      .withColumn("ct", round(cos(col("ang")), 6))
      .withColumn("st", round(sin(col("ang")), 6))
      .groupBy(col("p"))
      .agg(
        sum(round((col("x") - col("m")) * col("ct"), 6).cast(d6)).as("sc"),
        sum(round((col("x") - col("m")) * col("st"), 6).cast(d6)).as("ss"))
    val out = terms
      .crossJoin(broadcast(stats))
      .withColumn("sstot", col("sxx").cast("double") -
        col("sx").cast("double") * col("sx") / col("n"))
      .withColumn("power",
        (col("sc").cast("double") * col("sc").cast("double") +
          col("ss").cast("double") * col("ss").cast("double")) /
          (col("n").cast("double") * col("sstot")))
      .withColumn("is_peak",
        col("power") === max(col("power")).over(
          Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .select(col("p").as("period_days"), round(col("power"), 4).as("power"),
        col("is_peak"))
      .orderBy(col("period_days"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Cochran–Mantel–Haenszel test + Mantel–Haenszel common odds ratio
    * across activity strata — the 2×2 TEST the [[attStratified]]
    * estimator reports no inference for: exposure = rough first day
    * (error on day 0), outcome = converted (any post-first-day
    * purchase), stratified on the same fixed-width activity buckets so
    * the activity confounder is held within-stratum. Per stratum s the
    * 2×2 cell aₛ (exposed ∧ converted) has expectation r₁c₁/n and
    * hypergeometric variance r₁r₀c₁c₀/(n²(n−1)); χ²_CMH =
    * (Σa − ΣE)²/ΣV on 1 df (no continuity correction — documented),
    * and OR_MH = Σ(a·d/n)/Σ(b·c/n) is the classic pooled odds ratio
    * that never needs a per-stratum OR to exist.
    *
    * Shape: the [[attStratified]] user reduce, then everything on the
    * bounded stratum frame; all cells exact BIGINTs, each E/V/OR term
    * rounded once to 6 dp into decimal so sums are order-free. */
  def cmhTest(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val wU = Window.partitionBy(col("user_id"))
    val users = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type"))
      .withColumn("d0", min(col("d")).over(wU))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("d") === col("d0") &&
          col("event_type") === "error", 1L).otherwise(0L)).as("t"),
        max(when(col("d") > col("d0") &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("y"),
        count(lit(1)).as("n_events"))
      .withColumn("stratum", expr("n_events DIV 20"))
    val cells = users.groupBy(col("stratum")).agg(
      sum(when(col("t") === 1L && col("y") === 1L, 1L).otherwise(0L))
        .as("a"),
      sum(when(col("t") === 1L && col("y") === 0L, 1L).otherwise(0L))
        .as("b"),
      sum(when(col("t") === 0L && col("y") === 1L, 1L).otherwise(0L))
        .as("c"),
      sum(when(col("t") === 0L && col("y") === 0L, 1L).otherwise(0L))
        .as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
      .withColumn("r1", col("a") + col("b"))
      .withColumn("c1", col("a") + col("c"))
    val terms = cells
      // r1·c1/n is a terminating integer ratio → exact integer half-up
      .withColumn("e_t",
        (ExactRound.halfUpPos("1000000 * r1 * c1", "n")
          .cast("double") / 1e6).cast(d6))
      // the hypergeometric variance term is a terminating integer ratio
      // whose ×10⁶ numerator exceeds int64 — staged through
      // decimal(38,0); the a·d/n and b·c/n odds terms fit in longs
      .withColumn("vn", (col("r1").cast(DecimalType(38, 0)) *
        (col("n") - col("r1")) * col("c1") * (col("n") - col("c1")) *
        1000000L).cast(DecimalType(38, 0)))
      .withColumn("vd", (col("n").cast(DecimalType(38, 0)) * col("n") *
        (col("n") - lit(1L))).cast(DecimalType(38, 0)))
      .withColumn("v_t", when(col("n") > 1L,
        ExactRound.halfUpPos("vn", "vd").cast("double") / 1e6)
        .otherwise(lit(0.0)).cast(d6))
      .withColumn("orn_t",
        (ExactRound.halfUpPos("1000000 * a * d", "n")
          .cast("double") / 1e6).cast(d6))
      .withColumn("ord_t",
        (ExactRound.halfUpPos("1000000 * b * c", "n")
          .cast("double") / 1e6).cast(d6))
    val agg = terms.agg(
      sum(col("n")).as("n_users"), count(lit(1)).as("n_strata"),
      sum(col("a")).as("sa"), sum(col("e_t")).as("se"),
      sum(col("v_t")).as("sv"),
      sum(col("orn_t")).as("sorn"), sum(col("ord_t")).as("sord"))
    agg
      .withColumn("z", when(col("sv").cast("double") > 0.0,
        (col("sa").cast("double") - col("se").cast("double")) /
          sqrt(col("sv").cast("double"))))
      .select(col("n_users"), col("n_strata"), col("sa").as("a_total"),
        round(col("se"), 4).cast("double").as("e_total"),
        round(col("z") * col("z"), 4).as("chi2"),
        round(lit(2.0) / (lit(1.0) +
          exp(lit(0.07056) * pow(abs(col("z")), 3.0) +
            lit(1.5976) * abs(col("z")))), 6).as("p_value"),
        // ratio of 6-dp decimal sums (terminating) → exact integer
        // half-up; guard unchanged
        when(col("sord").cast("double") > 0.0,
          ExactRound.halfUpPos(
            "10000 * CAST(sorn * 1000000 AS BIGINT)",
            "CAST(sord * 1000000 AS BIGINT)").cast("double") / 1e4)
          .as("or_mh"))
  }

  /** Partial autocorrelation at lags 1..3 by Durbin–Levinson — the
    * AR-order diagnostic the [[acfQuery]]/[[ar2Forecast]] pair needs
    * (an AR(p) process cuts its PACF off after lag p, so pacf3 ≈ 0
    * endorses the AR(2) choice): from the 6-dp lag-1/2/3 sample
    * autocorrelations, the recursion a₁₁ = r₁, a₂₂ = (r₂−r₁²)/(1−r₁²),
    * a₃₃ = (r₃−a₂₁r₂−a₂₂r₁)/v₂ runs as ONE closed-form scalar tree on
    * the one-row frame — identical in both engines. Calendar equi-join
    * lag pairs (the [[ar2Forecast]] shape), BIGINT sums throughout. */
  def pacfQuery(spark: SparkSession, dir: String): DataFrame = {
    val daily = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = daily.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    val pairs = daily
      .withColumn("k", explode(sequence(lit(1), lit(3))))
      .withColumn("tday", date_add(col("day"), col("k")))
      .select(col("k"), col("tday"), col("x").as("xa"))
      .join(daily.select(col("day").as("tday"), col("x").as("xb")), "tday")
    val ac = pairs.groupBy(col("k"))
      .agg(count(lit(1)).as("c"), sum(col("xa")).as("sa"),
        sum(col("xb")).as("sb"), sum(col("xa") * col("xb")).as("sab"))
      .crossJoin(broadcast(stats))
      .withColumn("m", col("sx").cast("double") / col("n"))
      .select(col("k"),
        round(
          (col("sab").cast("double") - col("m") * col("sa") -
            col("m") * col("sb") + col("c") * col("m") * col("m")) /
            (col("sxx").cast("double") -
              col("sx").cast("double") * col("sx") / col("n")), 6)
          .as("a"))
    val out = ac.agg(
        max(when(col("k") === 1, col("a"))).as("r1"),
        max(when(col("k") === 2, col("a"))).as("r2"),
        max(when(col("k") === 3, col("a"))).as("r3"))
      .crossJoin(broadcast(stats.select(col("n"))))
      .withColumn("v1", lit(1.0) - col("r1") * col("r1"))
      .withColumn("a22", (col("r2") - col("r1") * col("r1")) / col("v1"))
      .withColumn("a21", col("r1") - col("a22") * col("r1"))
      .withColumn("v2", col("v1") * (lit(1.0) - col("a22") * col("a22")))
      .withColumn("a33",
        (col("r3") - col("a21") * col("r2") - col("a22") * col("r1")) /
          col("v2"))
      .select(col("n").as("n_days"), col("r1"), col("r2"), col("r3"),
        round(col("r1"), 6).as("pacf1"),
        round(col("a22"), 6).as("pacf2"),
        round(col("a33"), 6).as("pacf3"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Mann–Whitney U rank-sum test between the daily count series of two
    * event types — the nonparametric twin of the Welch t-test (no
    * normality assumption; a heavy-tailed day can't dominate): both
    * series live on the bounded day frame, so the global rank step —
    * the operation that makes a corpus-wide U test a scale-killer —
    * here runs over ≤ 2·days rows. Average ranks come CLOSED-FORM from
    * the value-grouped frame (rank block = [c_lt+1, c_lt+cnt], avg =
    * c_lt + (cnt+1)/2 — no per-row rank window), the tie correction
    * Σ(t³−t) is an exact BIGINT, and the normal approximation
    * z = (U − n₁n₂/2)/√V uses the repo's logistic CDF for p. Each
    * rank-sum term is rounded once to 6 dp into decimal (terms are
    * exact halves — the rounding is an idempotent determinism pin). */
  def mannWhitney(spark: SparkSession, dir: String,
                  typeA: String = "view",
                  typeB: String = "purchase"): DataFrame = {
    val d6 = DecimalType(18, 6)
    val vals = Lake.events(spark, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("x"))
      .select(col("x"), (col("event_type") === typeA).as("is_a"))
    val byVal = vals.groupBy(col("x"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("is_a"), 1L).otherwise(0L)).as("cnt_a"))
    val wOrd = Window.orderBy(col("x"))
    val ranked = byVal
      .withColumn("c_lt", coalesce(sum(col("cnt")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("avg_rank",
        col("c_lt") + (col("cnt") + 1L) / lit(2.0))
    val agg = ranked.agg(
      sum(when(col("cnt_a") > 0L,
        round(col("cnt_a") * col("avg_rank"), 6).cast(d6))
        .otherwise(lit(0.0).cast(d6))).as("ra"),
      sum(col("cnt_a")).as("na"),
      sum(col("cnt") - col("cnt_a")).as("nb"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
    agg
      .withColumn("n", col("na") + col("nb"))
      .withColumn("u", col("ra").cast("double") -
        col("na").cast("double") * (col("na") + 1L) / 2.0)
      .withColumn("mu",
        col("na").cast("double") * col("nb") / 2.0)
      .withColumn("v",
        (col("na").cast("double") * col("nb") / 12.0) *
          ((col("n") + 1L).cast("double") -
            col("ties").cast("double") /
              (col("n").cast("double") * (col("n") - 1L))))
      .withColumn("z", when(col("v") > 0.0,
        (col("u") - col("mu")) / sqrt(col("v"))))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round(col("u"), 4).as("u_stat"), round(col("mu"), 4).as("u_mean"),
        round(col("z"), 4).as("z_stat"),
        round(lit(2.0) / (lit(1.0) +
          exp(lit(0.07056) * pow(abs(col("z")), 3.0) +
            lit(1.5976) * abs(col("z")))), 6).as("p_value"))
  }

  /** Markov entropy rate of the sessionized event stream — the
    * information-theoretic rollup of the [[transitions]] matrix: the
    * empirical conditional entropy H(next|current) =
    * −Σᵢⱼ (nᵢⱼ/N)·log₂(nᵢⱼ/nᵢ) against the marginal next-event entropy
    * H(next) = −Σⱼ (n_j/N)·log₂(n_j/N); their gap is the mutual
    * information the current state carries, and 1 − H_cond/H_marg is
    * the predictability share a next-event model can hope to capture
    * (the [[markovEval]] accuracy's information-theoretic ceiling).
    *
    * Shape: the [[transitions]] pair build (two key-partitioned window
    * passes), then everything on the event-type²-bounded cell frame;
    * counts exact BIGINTs, each entropy term rounded once to 6 dp into
    * decimal so the sums are order-free. */
  def entropyRate(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val w = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    val cells = withSessionIds(spark, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowTot = cells.groupBy(col("from_type"))
      .agg(sum(col("n")).as("n_from"))
    val colTot = cells.groupBy(col("to_type"))
      .agg(sum(col("n")).as("n_to"))
    val tot = cells.agg(sum(col("n")).as("nn"),
      countDistinct(col("from_type")).as("n_states"))
    val hCond = cells.join(broadcast(rowTot), "from_type")
      .crossJoin(broadcast(tot))
      .select(round(
        (col("n").cast("double") / col("nn")) *
          log(col("n_from").cast("double") / col("n")) / log(lit(2.0)),
        6).cast(d6).as("term"))
      .agg(sum(col("term")).as("h_cond"))
    val hMarg = colTot.crossJoin(broadcast(tot))
      .select(round(
        (col("n_to").cast("double") / col("nn")) *
          log(col("nn").cast("double") / col("n_to")) / log(lit(2.0)),
        6).cast(d6).as("term"))
      .agg(sum(col("term")).as("h_marg"))
    val out = tot.crossJoin(broadcast(hCond)).crossJoin(broadcast(hMarg))
      .select(col("nn").as("n_transitions"), col("n_states"),
        round(col("h_marg"), 4).cast("double").as("h_marginal"),
        round(col("h_cond"), 4).cast("double").as("h_conditional"),
        round(lit(1.0) -
          col("h_cond").cast("double") / col("h_marg").cast("double"), 4)
          .as("predictability"))
      .localCheckpoint(true)
    cells.unpersist(false)
    out
  }

  /** Inverse-propensity-weighted ATE with stratum propensities — the
    * estimand the [[attStratified]]/[[cmhTest]] pair stops short of:
    * reweighting by the EMPIRICAL stratum propensity eₛ = n_t,s/nₛ
    * targets the average effect over the WHOLE on-support population
    * (ATE), not just the treated (ATT), and the sums collapse closed-
    * form on the stratum frame: Σ y_t,s·nₛ/n_t,s and Σ y_c,s·nₛ/n_c,s
    * over strata with both arms present, divided by the on-support
    * population. The effective sample sizes ESS = (Σw)²/Σw² — the
    * diagnostic every IPW analysis must publish (exploding weights
    * show up as ESS collapse) — also reduce per arm to
    * N_sup²/Σ nₛ²/n_arm,s.
    *
    * Shape: the [[attStratified]] user reduce, then everything on the
    * bounded stratum frame; integer counts exact, each weighted term
    * rounded once to 6 dp into decimal so sums are order-free. */
  def ipwAte(spark: SparkSession, dir: String): DataFrame = {
    val d6 = DecimalType(18, 6)
    val wU = Window.partitionBy(col("user_id"))
    val users = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type"))
      .withColumn("d0", min(col("d")).over(wU))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("d") === col("d0") &&
          col("event_type") === "error", 1L).otherwise(0L)).as("t"),
        sum(when(col("d") > col("d0") &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("y"),
        count(lit(1)).as("n_events"))
      .withColumn("stratum", expr("n_events DIV 20"))
    val strata = users.groupBy(col("stratum")).agg(
      sum(when(col("t") === 1L, 1L).otherwise(0L)).as("n_t"),
      sum(when(col("t") === 0L, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("t") === 1L, col("y")).otherwise(0L)).as("y_t"),
      sum(when(col("t") === 0L, col("y")).otherwise(0L)).as("y_c"))
      .withColumn("n_s", col("n_t") + col("n_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = strata.agg(sum(col("n_s")).as("n_users"),
      count(lit(1)).as("n_strata"))
    val used = strata.filter(col("n_t") > 0L && col("n_c") > 0L)
    // every per-stratum weight term and every readout is a terminating
    // integer/decimal ratio → exact integer half-up ([[ExactRound]])
    val agg = used
      .withColumn("wt_t", (ExactRound.halfUpPos("1000000 * y_t * n_s",
        "n_t").cast("double") / 1e6).cast(d6))
      .withColumn("wc_t", (ExactRound.halfUpPos("1000000 * y_c * n_s",
        "n_c").cast("double") / 1e6).cast(d6))
      .withColumn("w2t_t", (ExactRound.halfUpPos("1000000 * n_s * n_s",
        "n_t").cast("double") / 1e6).cast(d6))
      .withColumn("w2c_t", (ExactRound.halfUpPos("1000000 * n_s * n_s",
        "n_c").cast("double") / 1e6).cast(d6))
      .agg(
        sum(col("n_s")).as("n_sup"), count(lit(1)).as("n_strata_used"),
        sum(col("wt_t")).as("wt"), sum(col("wc_t")).as("wc"),
        sum(col("w2t_t")).as("w2t"), sum(col("w2c_t")).as("w2c"))
    val out = tot.crossJoin(broadcast(agg))
      .withColumn("d6diff", ((col("wt") - col("wc")) * 1000000)
        .cast("long"))
      .withColumn("w2t6", (col("w2t") * 1000000).cast("long"))
      .withColumn("w2c6", (col("w2c") * 1000000).cast("long"))
      .select(col("n_users"), col("n_strata"), col("n_sup"),
        col("n_strata_used"),
        (ExactRound.halfUp("d6diff", "100 * n_sup")
          .cast("double") / 1e4).as("ate_ipw"),
        (ExactRound.halfUpPos("100000000 * n_sup * n_sup", "w2t6")
          .cast("double") / 1e2).as("ess_treated"),
        (ExactRound.halfUpPos("100000000 * n_sup * n_sup", "w2c6")
          .cast("double") / 1e2).as("ess_control"))
      .localCheckpoint(true)
    strata.unpersist(false)
    out
  }

  /** Inter-arrival spectrum: within-user gaps between consecutive
    * events, binned into power-of-two MICROSECOND buckets (bucket =
    * bit length of the gap — an exact integer operation, never a
    * floor(log2(double)) whose boundary cases diverge across engines) —
    * the burstiness profile at the user-timeline level that the daily
    * Fano factor ([[dispersionQuery]]) is blind to: human sessions pile
    * mass in the seconds-to-minutes bands, bot replay collapses into
    * one narrow band, and pipeline replays surface as a zero-gap
    * bucket. One user-keyed window pass for the lag; the report frame
    * is ≤ 45 buckets; all counts exact, shares one divide each. */
  def interarrival(spark: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Lake.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(wU))
      .filter(col("gap").isNotNull)
      .select(when(col("gap") === 0L, 0)
        .otherwise(length(bin(col("gap")))).as("bucket"))
    val byB = gaps.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"))
    val wOrd = Window.orderBy(col("bucket"))
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    byB
      .withColumn("total", sum(col("n_gaps")).over(wAll))
      .withColumn("cum", sum(col("n_gaps")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // count/count → exact integer half-up ([[ExactRound]])
      .select(col("bucket"), col("n_gaps"),
        (ExactRound.halfUpPos("1000000 * n_gaps", "total")
          .cast("double") / 1e6).as("share"),
        (ExactRound.halfUpPos("1000000 * cum", "total")
          .cast("double") / 1e6).as("cum_share"))
      .orderBy(col("bucket"))
  }

  /** Peak concurrent sessions per day — the capacity-planning number:
    * a sweep-line over session intervals (+1 at each session start, −1
    * at each end) whose running maximum is the day's peak concurrency.
    * Sessions come from the standing gap-based sessionization; intervals
    * are clamped to day bounds (a cross-midnight session counts in both
    * days — the on-call view of "how many were online"). Intervals are
    * CLOSED: ties order starts before ends, so a session ending exactly
    * when another starts overlaps it for that instant, and a
    * single-event session still counts as one concurrent user (the
    * ends-first convention would sweep it to zero); (user, session) is
    * the final deterministic tie-break. The sweep window partitions per
    * day — bounded by that day's session count, never a global sort. */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val sess = withSessionIds(spark, dir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val spanned = sess
      .withColumn("day", explode(sequence(
        to_date(col("t0")), to_date(col("t1")))))
      .select(col("user_id"), col("session_id"), col("day"),
        greatest(col("t0"), col("day").cast("timestamp")).as("s"),
        least(col("t1"),
          date_add(col("day"), 1).cast("timestamp") - expr("INTERVAL 1 microsecond"))
          .as("e"))
    val points = spanned
      .select(col("day"), col("s").as("ts"), lit(1).as("delta"),
        col("user_id"), col("session_id"))
      .unionByName(spanned.select(col("day"), col("e").as("ts"),
        lit(-1).as("delta"), col("user_id"), col("session_id")))
    val wSweep = Window.partitionBy(col("day"))
      .orderBy(col("ts"), col("delta").desc, col("user_id"), col("session_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    points
      .withColumn("load", sum(col("delta")).over(wSweep))
      .groupBy(col("day"))
      .agg((count(lit(1)) / 2).cast("long").as("n_sessions"),
        max(col("load")).cast("long").as("peak_concurrency"))
      .orderBy(col("day"))
  }

  /** Lead–lag cross-correlation between two event types' daily series
    * (here view vs purchase), k = −maxLag..maxLag: a positive spike at
    * k > 0 means views LEAD purchases by k days — the first causality
    * screen before any attribution modeling. Same machinery as the ACF:
    * bounded daily frames per type, every lag from ONE equi self-join
    * via an explode, BIGINT moment sums, full-series means/variances in
    * the normalizer (the standard CCF convention), one deterministic
    * scalar tree per lag row. */
  def crossCorrelation(spark: SparkSession, dir: String,
                       typeA: String = "view", typeB: String = "purchase",
                       maxLag: Int = 7): DataFrame = {
    val daily = Lake.events(spark, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = daily.filter(col("event_type") === typeA)
      .select(col("day"), col("x").as("xa"))
    val b = daily.filter(col("event_type") === typeB)
      .select(col("day"), col("x").as("xb"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val sa = stats.filter(col("event_type") === typeA)
      .select(col("n").as("na"), col("sx").as("sxa"), col("sxx").as("sxxa"))
    val sb = stats.filter(col("event_type") === typeB)
      .select(col("n").as("nb"), col("sx").as("sxb"), col("sxx").as("sxxb"))
    val pairs = a
      .withColumn("k", explode(sequence(lit(-maxLag), lit(maxLag))))
      .withColumn("tday", date_add(col("day"), col("k")))
      .select(col("k"), col("tday"), col("xa"))
      .join(b.withColumnRenamed("day", "tday"), "tday")
    val out = pairs
      .groupBy(col("k"))
      .agg(count(lit(1)).as("c"), sum(col("xa")).as("pa"),
        sum(col("xb")).as("pb"), sum(col("xa") * col("xb")).as("pab"))
      .crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .withColumn("ma", col("sxa").cast("double") / col("na"))
      .withColumn("mb", col("sxb").cast("double") / col("nb"))
      .select(
        col("k").cast("int").as("lag"),
        col("c").cast("long").as("n_pairs"),
        round(
          (col("pab").cast("double") - col("mb") * col("pa") -
            col("ma") * col("pb") + col("c") * col("ma") * col("mb")) /
            sqrt((col("sxxa").cast("double") -
              col("sxa").cast("double") * col("sxa") / col("na")) *
              (col("sxxb").cast("double") -
                col("sxb").cast("double") * col("sxb") / col("nb"))), 6)
          .as("xcorr"))
      .orderBy(col("lag"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Changepoint LOCALIZATION by binary segmentation — the argmax the
    * CUSUM screen (which only flags that a shift exists) stops short
    * of: the split of the daily series minimizing total within-segment
    * SSE, i.e. the first step of the classic binary-segmentation /
    * PELT family. Same cumulative-histogram shape as the decision
    * stump, on the calendar frame: per candidate day, left/right
    * segment SSE from exact BIGINT (Σc, Σc²) prefix sums —
    * SSE = Σc² − (Σc)²/n — and the argmax of the variance-explained
    * reduction under the deterministic (reduction DESC, day) order.
    * One events scan; every window and the totals broadcast live on
    * the bounded day frame. */
  def changepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily
      .withColumn("k", sum(lit(1L)).over(wCum))
      .withColumn("s1", sum(col("c")).over(wCum))
      .withColumn("s2", sum(col("c") * col("c")).over(wCum))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("c")).as("t1"),
      sum(col("c") * col("c")).as("t2"))
    val cand = cum.crossJoin(broadcast(tot))
      .filter(col("k") < col("n")) // right segment must be non-empty
      .withColumn("sse_l", col("s2").cast("double") -
        col("s1").cast("double") * col("s1") / col("k"))
      .withColumn("sse_r",
        (col("t2") - col("s2")).cast("double") -
          (col("t1") - col("s1")).cast("double") * (col("t1") - col("s1"))
            / (col("n") - col("k")))
      .withColumn("sse_p", col("t2").cast("double") -
        col("t1").cast("double") * col("t1") / col("n"))
      .withColumn("reduction",
        round(col("sse_p") - (col("sse_l") + col("sse_r")), 6))
    val wBest = Window.orderBy(col("reduction").desc, col("day"))
    cand.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(
        col("day").as("last_day_before"),
        col("n").as("n_days"), col("k").as("n_before"),
        // integer means → exact integer half-up; the SSE terms stay in
        // double (identical scalar tree both engines)
        (ExactRound.halfUpPos("10000 * s1", "k")
          .cast("double") / 1e4).as("mean_before"),
        (ExactRound.halfUpPos("10000 * (t1 - s1)", "n - k")
          .cast("double") / 1e4).as("mean_after"),
        round(col("reduction") / col("sse_p"), 6).as("var_explained"),
        round(col("reduction"), 4).as("sse_reduction"))
  }

  def changepoint(spark: SparkSession, dir: String): DataFrame =
    changepoint(Lake.events(spark, dir))

  /** Rank correlation between two event types' daily series — the
    * robust companions to the Pearson [[crossCorrelation]] at lag 0
    * (a single viral day dominates product-moment correlation; ranks
    * don't care): Spearman ρ on tie-averaged ranks and Kendall τ-b on
    * pairwise concordance. Determinism: average ranks enter as the
    * INTEGER 2·avg_rank = 2·rank + ties − 1, so every Spearman moment
    * is BIGINT (the doubling cancels in the correlation); Kendall's
    * C − D is one integer sum of sign products over the triangular day
    * pairs, with tie terms n1/n2 from per-value group counts and the
    * τ-b normalizer the only double. All windows and the pairs join run
    * on the calendar-bounded joined-day frame. */
  def rankCorrelation(spark: SparkSession, dir: String): DataFrame =
    rankCorrelation(Lake.events(spark, dir))

  def rankCorrelation(events: DataFrame,
                      typeA: String = "view",
                      typeB: String = "purchase"): DataFrame = {
    val daily = events
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val j = daily.filter(col("event_type") === typeA)
      .select(col("day"), col("x").as("xa"))
      .join(daily.filter(col("event_type") === typeB)
        .select(col("day"), col("x").as("xb")), "day")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranks = j
      .withColumn("ra2", lit(2L) * rank().over(Window.orderBy(col("xa"))) +
        count(lit(1)).over(Window.partitionBy(col("xa"))) - 1)
      .withColumn("rb2", lit(2L) * rank().over(Window.orderBy(col("xb"))) +
        count(lit(1)).over(Window.partitionBy(col("xb"))) - 1)
    val sp = ranks.agg(
      count(lit(1)).as("n"),
      sum(col("ra2")).as("sa"), sum(col("rb2")).as("sb"),
      sum(col("ra2") * col("ra2")).as("saa"),
      sum(col("rb2") * col("rb2")).as("sbb"),
      sum(col("ra2") * col("rb2")).as("sab"))
    val pairs = j.select(col("day").as("d1"), col("xa").as("a1"),
        col("xb").as("b1"))
      .join(broadcast(j.select(col("day").as("d2"), col("xa").as("a2"),
        col("xb").as("b2"))), col("d1") < col("d2"))
      .agg(sum(signum((col("a2") - col("a1")).cast("double")).cast("long") *
        signum((col("b2") - col("b1")).cast("double")).cast("long"))
        .as("cd"))
    val tiesA = j.groupBy(col("xa")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1)), lit(0L)).as("n1_2"))
    val tiesB = j.groupBy(col("xb")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1)), lit(0L)).as("n2_2"))
    val out = sp.crossJoin(broadcast(pairs))
      .crossJoin(broadcast(tiesA)).crossJoin(broadcast(tiesB))
      .withColumn("n0_2", col("n") * (col("n") - 1))
      .select(
        col("n").as("n_days"),
        round((col("n").cast("double") * col("sab") -
          col("sa").cast("double") * col("sb")) /
          sqrt((col("n").cast("double") * col("saa") -
            col("sa").cast("double") * col("sa")) *
            (col("n").cast("double") * col("sbb") -
              col("sb").cast("double") * col("sb"))), 6).as("spearman"),
        round(col("cd").cast("double") /
          sqrt((col("n0_2") - col("n1_2")).cast("double") / 2.0 *
            ((col("n0_2") - col("n2_2")).cast("double") / 2.0)), 6)
          .as("kendall"))
      .localCheckpoint(true)
    j.unpersist(false)
    out
  }

  /** Theil–Sen robust trend + Mann–Kendall monotonic-trend test over
    * the daily event-count series — the outlier-proof complement of the
    * per-group OLS line (one corrupted day moves the LS slope, not the
    * median-of-slopes): slope = lower median of all pairwise slopes
    * (c_j−c_i)/(d_j−d_i), intercept = lower median of c_i − slope·d_i,
    * S = Σ sign(c_j−c_i) with the tie-corrected variance
    * (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18 and the ±1 continuity-corrected
    * z. Every frame is calendar-bounded: the triangular self-join is
    * (#days choose 2) pairs, medians are row_number picks at
    * floor((n+1)/2) under the deterministic (value, day) order, and all
    * counts/signs stay BIGINT until the final z divide. Slopes enter
    * DECIMAL(18,9) by one double divide rounded once (the proven
    * primitive), so DuckDB replays the median selection element-for-
    * element. */
  def theilSen(spark: SparkSession, dir: String): DataFrame =
    theilSen(Lake.events(spark, dir))

  def theilSen(events: DataFrame): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(18, 9)
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .select(datediff(col("day"), lit("1970-01-01")).cast("long").as("d"),
        col("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = daily.select(col("d").as("di"), col("c").as("ci"))
      .join(broadcast(daily.select(col("d").as("dj"), col("c").as("cj"))),
        col("di") < col("dj"))
      .select(col("di"), col("dj"),
        round((col("cj") - col("ci")).cast("double") /
          (col("dj") - col("di")), 9).cast(dec9).as("slope"),
        signum((col("cj") - col("ci")).cast("double")).cast("long").as("sgn"))
    val tot = pairs.agg(count(lit(1)).as("n_pairs"),
      sum(col("sgn")).as("mk_s"))
    val wSlope = Window.orderBy(col("slope"), col("di"), col("dj"))
    val med = pairs.withColumn("rn", row_number().over(wSlope))
      .crossJoin(broadcast(tot))
      .filter(col("rn") ===
        floor((col("n_pairs") + 1) / lit(2.0)).cast("long"))
      .select(col("slope"), col("n_pairs"), col("mk_s"))
    val resid = daily.crossJoin(broadcast(med))
      .select(col("d"),
        round(col("c").cast("double") -
          col("slope").cast("double") * col("d"), 9).cast(dec9).as("b"),
        col("slope"), col("n_pairs"), col("mk_s"))
    val stats = daily.agg(count(lit(1)).as("n_days"))
    val ties = daily.groupBy(col("c")).agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * (col("t") - 1) *
        (lit(2L) * col("t") + 5)), lit(0L)).as("tie_term"))
    val wB = Window.orderBy(col("b"), col("d"))
    val out = resid.withColumn("rn", row_number().over(wB))
      .crossJoin(broadcast(stats))
      .filter(col("rn") ===
        floor((col("n_days") + 1) / lit(2.0)).cast("long"))
      .crossJoin(broadcast(ties))
      .withColumn("var_s",
        (col("n_days") * (col("n_days") - 1) *
          (lit(2L) * col("n_days") + 5) - col("tie_term"))
          .cast("double") / 18.0)
      .select(
        col("n_days"), col("n_pairs"),
        round(col("slope").cast("double"), 6).as("slope"),
        round(col("b").cast("double"), 6).as("intercept"),
        col("mk_s"),
        round(
          when(col("mk_s") > 0,
            (col("mk_s") - 1).cast("double") / sqrt(col("var_s")))
            .when(col("mk_s") < 0,
              (col("mk_s") + 1).cast("double") / sqrt(col("var_s")))
            .otherwise(lit(0.0)), 4).as("mk_z"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Burstiness screen: the Fano factor (index of dispersion,
    * Var/Mean of daily counts) per event type — 1 under a Poisson
    * arrival process, ≫1 for bursty traffic, <1 for rate-limited flows;
    * the one-number check before fitting any arrival model. Exact
    * BIGINT moment sums per bounded type group, population variance,
    * one scalar tree per row. */
  def dispersionQuery(spark: SparkSession, dir: String): DataFrame =
    Lake.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      // all three are integer ratios (terminating) → exact integer
      // half-up: mean = sx/n, var = (n·sxx − sx²)/n², fano = var/mean =
      // (n·sxx − sx²)/(n·sx); n·sxx ≥ sx² (Cauchy–Schwarz) keeps the
      // numerators non-negative
      .select(col("event_type"), col("n_days"),
        (ExactRound.halfUpPos("10000 * sx", "n_days")
          .cast("double") / 1e4).as("mean_daily"),
        (ExactRound.halfUpPos("10000 * (n_days * sxx - sx * sx)",
          "n_days * n_days").cast("double") / 1e4).as("var_daily"),
        (ExactRound.halfUpPos("10000 * (n_days * sxx - sx * sx)",
          "n_days * sx").cast("double") / 1e4).as("fano"))
      .orderBy(col("event_type"))

  /** Bot / automation screen: per-user inter-event-gap regularity. Human
    * traffic has heavy-tailed inter-arrival times; scripted traffic fires
    * on a timer, so its gap distribution is NARROW — the coefficient of
    * variation (sd/mean of the gaps) is the unit-free one-number signal
    * (cv ≈ 0 metronome, cv ≈ 1 Poisson, cv ≫ 1 bursty human). Flags
    * `bot_like` when cv < `cvThreshold` with at least `minGaps` gaps (a
    * regular-looking 3-event user is noise, not a bot).
    *
    * Shape: ONE user-partitioned ordered window (ts, event_id — the
    * tie-break makes lag deterministic under equal timestamps) feeds a
    * user-keyed aggregate, and Spark reuses the window's hash
    * partitioning for the groupBy — one shuffle total, same as
    * sessionize. Gaps are exact epoch-µs longs; the square sums ride in
    * DECIMAL(38,0) (a week-scale gap is ~6e11 µs, whose square overflows
    * BIGINT — both engines do the identical exact-decimal multiply), and
    * the variance/cv scalar tree on top is the repo's standard
    * double-on-exact-sums form. Output is bounded by user cardinality. */
  def botScreen(spark: SparkSession, dir: String): DataFrame =
    botScreen(Lake.events(spark, dir))

  def botScreen(events: DataFrame, minGaps: Long = 30,
                cvThreshold: Double = 0.5): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val g = events
      .select(col("user_id"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id")))).as("g"))
      .filter(col("g").isNotNull)
    g.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sx"),
        sum(col("g").cast(dec38) * col("g").cast(dec38)).as("sxx"))
      .filter(col("n_gaps") >= minGaps)
      .withColumn("mean_us", col("sx").cast("double") / col("n_gaps"))
      .withColumn("var_us",
        (col("sxx").cast("double") -
          col("sx").cast("double") * col("sx") / col("n_gaps")) /
          (col("n_gaps") - 1).cast("double"))
      .select(col("user_id"), col("n_gaps"),
        round(col("mean_us") / 1e6, 4).as("mean_gap_s"),
        round(sqrt(col("var_us")) / 1e6, 4).as("sd_gap_s"),
        round(sqrt(col("var_us")) / col("mean_us"), 4).as("cv_gap"),
        (sqrt(col("var_us")) / col("mean_us") < cvThreshold).as("bot_like"))
      .orderBy(col("user_id"))
  }

  /** Benjamini–Hochberg FDR correction over the per-segment A/B readout —
    * the missing piece between "one z test" ([[abReadout]]) and "a z test
    * per segment": testing every event type inflates false positives, and
    * BH is the standard step-up control. Arms reuse the 16807-Lehmer
    * assignment (decorrelated from the split/sampling hashes, same
    * portability argument). Per segment, a large-sample Welch z on the
    * event `value` (exact DECIMAL(18,2) moment sums, the [[CatalogOps
    * .welch]] discipline); the two-sided p comes from the logistic
    * normal-CDF approximation 2/(1+exp(0.07056|z|³+1.5976|z|)) (|err| <
    * 1.4e-4 — ample for a screen, and evaluated as the SAME elementary
    * expression tree in both engines, so the oracle checks the
    * computation rather than anyone's erf library). Step-up: rank p
    * ascending (segment name tie-break; NULL p — degenerate variance —
    * ordered via coalesce-to-2 in BOTH engines and never rejected),
    * reject ranks ≤ argmax{i : p_i ≤ iα/m}, and report the monotone
    * q-value min_{j≥i}(m·p_j/j) capped at 1.
    *
    * Shape: one events scan → segment-keyed aggregate (map-side
    * combinable; every arm moment folds into the one row) → windows over
    * the #segments frame (domain-constant cardinality, like the mix-plan
    * and Benford frames — never corpus-sized). */
  def fdrBh(spark: SparkSession, dir: String): DataFrame =
    fdrBh(Lake.events(spark, dir))

  def fdrBh(events: DataFrame, alpha: Double = 0.05): DataFrame = {
    val x = col("value").cast(dec2)
    val isA = pmod(col("user_id") * lit(16807L), lit(2147483647L)) % 2 === 0
    val seg = events
      .groupBy(col("event_type"))
      .agg(
        sum(when(isA, 1L).otherwise(0L)).as("n_a"),
        sum(when(!isA, 1L).otherwise(0L)).as("n_b"),
        sum(when(isA, x).otherwise(null)).as("sa"),
        sum(when(!isA, x).otherwise(null)).as("sb"),
        sum(when(isA, x * x).otherwise(null)).as("qa"),
        sum(when(!isA, x * x).otherwise(null)).as("qb"))
      .withColumn("m_a", col("sa").cast("double") / col("n_a"))
      .withColumn("m_b", col("sb").cast("double") / col("n_b"))
      .withColumn("v_a",
        (col("qa").cast("double") - col("n_a").cast("double") *
          col("m_a") * col("m_a")) / (col("n_a") - 1).cast("double"))
      .withColumn("v_b",
        (col("qb").cast("double") - col("n_b").cast("double") *
          col("m_b") * col("m_b")) / (col("n_b") - 1).cast("double"))
      .withColumn("se2", col("v_a") / col("n_a") + col("v_b") / col("n_b"))
      .withColumn("z", when(col("se2") > 0,
        (col("m_b") - col("m_a")) / sqrt(col("se2"))))
      .withColumn("p", lit(2.0) / (lit(1.0) +
        exp(lit(0.07056) * pow(abs(col("z")), 3.0) +
          lit(1.5976) * abs(col("z")))))
      .withColumn("p_ord", coalesce(col("p"), lit(2.0)))
    val wOrd = Window.orderBy(col("p_ord"), col("event_type"))
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    seg
      .withColumn("i", row_number().over(wOrd))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("kmax", max(when(
          col("p") <= col("i") * alpha / col("m"), col("i")).otherwise(0))
        .over(wAll))
      .withColumn("qv", least(lit(1.0), min(col("p_ord") * col("m") / col("i"))
        .over(wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing))))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("m_a"), 4).as("mean_a"), round(col("m_b"), 4).as("mean_b"),
        round(col("z"), 4).as("z_stat"),
        round(col("p"), 6).as("p_value"),
        when(col("p").isNotNull, round(col("qv"), 6)).as("q_value"),
        (col("i") <= col("kmax")).as("rejected"))
      .orderBy(col("event_type"))
  }

  /** Kaplan–Meier survival curve over user lifetimes with right
    * censoring — the churn analysis done properly: a user whose last
    * event sits within `censorDays` of the corpus end is CENSORED (still
    * alive as far as the data can tell), not a churn event, so naive
    * "lifetime histogram" bias never enters. Lifetime = weeks from first
    * to last event day.
    *
    * Shape: one events scan → per-user (first, last) frame (persisted —
    * it feeds both the corpus-end probe and the lifetime rows, the
    * standing multi-consumer discipline) → bounded week frame. The risk
    * set n_t = total − everyone who left before t comes from a running
    * sum over the bounded week frame; S(t) is the KM product
    * Π (1 − d/n) evaluated as exp(Σ ln(…)) over the same bounded ordered
    * window — sequential and identical in both engines, rounded to 4
    * (the sqrt/ln rounding scale used across the repo). */
  def survivalCurve(spark: SparkSession, dir: String,
                    censorDays: Int = 14): DataFrame = {
    val users = Lake.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val end = users.agg(max(col("last_day")).as("corpus_end"))
    val byWeek = users
      .crossJoin(broadcast(end))
      .select(
        floor(datediff(col("last_day"), col("first_day")) / 7)
          .cast("int").as("week"),
        when(datediff(col("corpus_end"), col("last_day")) > censorDays, 1L)
          .otherwise(0L).as("observed"))
      .groupBy(col("week"))
      .agg(sum(col("observed")).as("deaths"),
        sum(lit(1L) - col("observed")).as("censored"),
        count(lit(1)).as("leaving"))
    val wOrd = Window.orderBy(col("week"))
    val out = byWeek
      .withColumn("total", sum(col("leaving")).over(
        Window.orderBy(col("week"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("left_before", coalesce(
        sum(col("leaving")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_at_risk", col("total") - col("left_before"))
      .withColumn("haz",
        col("deaths").cast("double") / col("n_at_risk"))
      // Terminal-week guard: haz = 1 (a week's whole risk set dies —
      // e.g. every max-lifetime user observed) makes log(0) NULL, and
      // the window sum would silently SKIP it, freezing S(t) at the
      // prior week instead of dropping to 0. A KM product with any
      // zero factor is 0 forever: carry an explicit extinct flag.
      .withColumn("extinct",
        max(when(col("haz") >= 1.0, 1).otherwise(0)).over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(
        col("week"), col("n_at_risk"), col("deaths"), col("censored"),
        round(col("haz"), 6).as("hazard"),
        when(col("extinct") === 1, lit(0.0)).otherwise(
          round(exp(sum(log(lit(1.0) - col("haz"))).over(wOrd)), 4))
          .as("survival"))
      .orderBy(col("week"))
      .localCheckpoint(true)
    users.unpersist(false)
    out
  }

  /** Kendall τ-b between the daily event-count and daily total-value
    * series — the CONCORDANCE twin of the Spearman rank correlation
    * (rank_corr): does a busier day mean a higher-value day, measured
    * by pair agreement rather than rank covariance, with the τ-b tie
    * corrections that make the statistic honest on plateaued series.
    * Counts are exact BIGINTs and values exact decimal(18,2), so every
    * pair comparison is an exact compare — concordant/discordant/tie
    * classes are INTEGER counts and DuckDB replays them verbatim; τ-b
    * and the normal-approximation z take one rounded divide each.
    *
    * Scale: the corpus reduces to the per-DAY frame first (calendar-
    * bounded at any data scale), so the pair self-join is bounded-frame
    * work (~days²/2 rows), never a corpus-sized product. */
  def kendallDaily(spark: SparkSession, dir: String): DataFrame = {
    val d2 = DecimalType(18, 2)
    val days = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(d2)).as("v"))
      .localCheckpoint(true) // bounded day frame feeds both join sides
    val a = days.select(col("d").as("da"), col("cnt").as("ca"),
      col("v").as("va"))
    val b = days.select(col("d").as("db"), col("cnt").as("cb"),
      col("v").as("vb"))
    val pairs = a.join(b, col("da") < col("db"))
      .select(
        when(col("ca") === col("cb") && col("va") === col("vb"), "txy")
          .when(col("ca") === col("cb"), "tx")
          .when(col("va") === col("vb"), "ty")
          .when((col("ca") < col("cb")) === (col("va") < col("vb")), "c")
          .otherwise("d").as("cls"))
      .groupBy(col("cls")).agg(count(lit(1)).as("n"))
    val cls = pairs.groupBy()
      .pivot(col("cls"), Seq("c", "d", "tx", "ty", "txy"))
      .agg(first(col("n")))
      .select(coalesce(col("c"), lit(0L)).as("nc"),
        coalesce(col("d"), lit(0L)).as("nd"),
        coalesce(col("tx"), lit(0L)).as("ntx"),
        coalesce(col("ty"), lit(0L)).as("nty"),
        coalesce(col("txy"), lit(0L)).as("ntxy"))
    val tot = days.agg(count(lit(1)).as("n_days"))
    tot.crossJoin(broadcast(cls))
      .withColumn("n0",
        col("n_days") * (col("n_days") - 1) / 2)
      .select(col("n_days"), col("nc").as("concordant"),
        col("nd").as("discordant"),
        round((col("nc") - col("nd")).cast("double") /
          sqrt((col("n0") - col("ntx") - col("ntxy")).cast("double") *
            (col("n0") - col("nty") - col("ntxy")).cast("double")), 6)
          .as("tau_b"),
        round(lit(3.0) * (col("nc") - col("nd")).cast("double") /
          sqrt(col("n_days").cast("double") * (col("n_days") - 1) *
            (lit(2) * col("n_days") + 5) / 2.0), 4).as("z"))
  }

  /** EXACT audience-overlap matrix between event types — Jaccard and
    * overlap (Szymkiewicz–Simpson) coefficients over distinct-user sets,
    * the value-checked twin of the theta-sketch q_set_overlap path (the
    * sketch scales to arbitrary cardinalities; this one is exact and
    * oracle-checkable, the right tool while audiences fit a shuffle).
    * Shape: distinct (type,user) once → per-user self-pairing (≤ types²
    * rows PER USER — bounded fan-out, shuffled on user_id, never a
    * global product) → pair grid from the bounded per-type size frame so
    * zero-intersection pairs still appear. The terminating ratios round
    * by exact integer half-up ((2·num·10⁶ + den) div (2·den)) — an
    * integer/integer quotient is where a .5 rounding tie is reachable. */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val aud = Lake.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = aud.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val inter = aud.select(col("event_type").as("type_a"), col("user_id"))
      .join(aud.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_common"))
    val grid = sizes.select(col("event_type").as("type_a"), col("n").as("n_a"))
      .crossJoin(broadcast(
        sizes.select(col("event_type").as("type_b"), col("n").as("n_b"))))
      .filter(col("type_a") < col("type_b"))
    val out = grid.join(inter, Seq("type_a", "type_b"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_common"))
      .withColumn("n_min", least(col("n_a"), col("n_b")))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_common"), col("n_union"),
        (expr("(2 * n_common * 1000000 + n_union) div (2 * n_union)")
          .cast("double") / 1000000.0).as("jaccard"),
        (expr("(2 * n_common * 1000000 + n_min) div (2 * n_min)")
          .cast("double") / 1000000.0).as("overlap_coef"))
      .orderBy(col("type_a"), col("type_b"))
      .localCheckpoint(true)
    aud.unpersist(false)
    out
  }

  /** Gumbel extreme-value fit over weekly block maxima of the daily
    * event counts, per event type — the capacity-planning readout (what
    * daily peak should week T expect?): method-of-moments β̂ = s·√6/π,
    * μ̂ = m − γβ̂ over the block maxima, plus the T-week return levels
    * x_T = μ̂ − β̂·ln(−ln(1 − 1/T)) for T = 26 and 52. Every input to
    * the closed forms is an exact BIGINT (daily counts → weekly max →
    * Σ, Σx²); the moments and return levels are one scalar double tree
    * (γ as the shared literal 0.5772156649015329 — both engines parse
    * the identical double). Calendar-bounded frames at every step. */
  def gumbelExtremes(spark: SparkSession, dir: String): DataFrame = {
    val gamma = 0.5772156649015329
    val maxima = Lake.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"), date_trunc("week", col("day")).as("wk"))
      .agg(max(col("x")).as("mx"))
    def rl(t: Double): Column =
      col("mu") - col("beta") * log(-log(lit(1.0) - lit(1.0) / t))
    maxima.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_weeks"), sum(col("mx")).as("s"),
        sum(col("mx") * col("mx")).as("q"))
      .withColumn("m", col("s").cast("double") / col("n_weeks"))
      .withColumn("v",
        (col("q").cast("double") - col("n_weeks") * col("m") * col("m")) /
          (col("n_weeks") - 1).cast("double"))
      .withColumn("beta", sqrt(col("v")) * sqrt(lit(6.0)) / lit(math.Pi))
      .withColumn("mu", col("m") - lit(gamma) * col("beta"))
      .select(col("event_type"), col("n_weeks"),
        round(col("m"), 4).as("mean_max"),
        round(sqrt(col("v")), 4).as("sd_max"),
        round(col("beta"), 4).as("beta"),
        round(col("mu"), 4).as("mu"),
        round(rl(26.0), 4).as("rl_26w"),
        round(rl(52.0), 4).as("rl_52w"))
      .orderBy(col("event_type"))
  }

  /** Lo–MacKinlay variance-ratio test of the daily count series per
    * event type — the random-walk diagnostic (VR(q) ≈ 1 under i.i.d.
    * increments; VR > 1 means positive autocorrelation/momentum, < 1
    * mean reversion), the hypothesis-test complement to the ACF readout:
    * VR(q) = Var(x_t − x_{t−q}) / (q·Var(x_t − x_{t−1})) with the
    * homoskedastic z = (VR−1)·√(n·3q / (2(2q−1)(q−1))). Differences are
    * exact BIGINTs off ONE day-ordered window pass (day is unique per
    * type, so lag is deterministic); each variance is the standard
    * double tree over exact Σ, Σd² sums. Calendar-bounded frame. */
  def varianceRatio(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val daily = Lake.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val diffs = daily
      .withColumn("d1", col("x") - lag(col("x"), 1).over(w))
      .withColumn("d2", col("x") - lag(col("x"), 2).over(w))
      .withColumn("d5", col("x") - lag(col("x"), 5).over(w))
      .withColumn("d7", col("x") - lag(col("x"), 7).over(w))
    def variance(q: String): Column =
      (sum(col(q) * col(q)).cast("double") -
        count(col(q)).cast("double") *
          (sum(col(q)).cast("double") / count(col(q))) *
          (sum(col(q)).cast("double") / count(col(q)))) /
        (count(col(q)) - 1).cast("double")
    val agg = diffs.groupBy(col("event_type"))
      .agg(count(col("d1")).as("n_diffs"),
        variance("d1").as("v1"), variance("d2").as("v2"),
        variance("d5").as("v5"), variance("d7").as("v7"))
    def vr(q: Int): Column = col(s"v$q") / (lit(q.toDouble) * col("v1"))
    def zOut(q: Int): Column =
      (vr(q) - lit(1.0)) * sqrt(col("n_diffs").cast("double") *
        (3.0 * q) / (2.0 * (2 * q - 1) * (q - 1)))
    agg.select(col("event_type"), col("n_diffs"),
      round(col("v1"), 4).as("var_1"),
      round(vr(2), 4).as("vr_2"), round(zOut(2), 4).as("z_2"),
      round(vr(5), 4).as("vr_5"), round(zOut(5), 4).as("z_5"),
      round(vr(7), 4).as("vr_7"), round(zOut(7), 4).as("z_7"))
      .orderBy(col("event_type"))
  }

  /** Partial correlation between the daily view and purchase series
    * CONTROLLING for the error series — does traffic still predict
    * conversions once incident days are held fixed? r_xy·z =
    * (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)), the one-number answer the
    * raw cross-correlation can't give when a confounder moves both
    * series. Day frame from ALL events (a type's missing day is a true
    * zero, not a dropped row); all ten moment sums are exact BIGINTs off
    * ONE calendar-bounded aggregate; the three Pearson r's and the
    * partial are one scalar double tree. */
  def partialCorr(spark: SparkSession, dir: String): DataFrame = {
    def cnt(t: String): Column =
      sum(when(col("event_type") === t, 1L).otherwise(0L))
    val daily = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(cnt("view").as("x"), cnt("purchase").as("y"),
        cnt("error").as("z"))
    val one = daily.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("z")).as("sxz"),
      sum(col("y") * col("z")).as("syz"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("z") * col("z")).as("szz"))
    def r(sab: Column, sa: Column, sb: Column,
          saa: Column, sbb: Column): Column =
      (col("n") * sab - sa * sb).cast("double") /
        sqrt((col("n") * saa - sa * sa).cast("double") *
          (col("n") * sbb - sb * sb).cast("double"))
    one
      .withColumn("r_xy",
        r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy")))
      .withColumn("r_xz",
        r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz")))
      .withColumn("r_yz",
        r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz")))
      .select(col("n").as("n_days"),
        round(col("r_xy"), 6).as("r_xy"),
        round(col("r_xz"), 6).as("r_xz"),
        round(col("r_yz"), 6).as("r_yz"),
        round((col("r_xy") - col("r_xz") * col("r_yz")) /
          sqrt((lit(1.0) - col("r_xz") * col("r_xz")) *
            (lit(1.0) - col("r_yz") * col("r_yz"))), 6)
          .as("partial_r_xy_given_z"))
  }

  /** Cronbach's alpha over the per-user event-type count "items" — the
    * internal-consistency readout (do the activity dimensions measure
    * one engagement trait?): α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total) with
    * POPULATION variances over all users. No pivot and no per-user
    * zero-fill materialization: a user missing an item contributes a
    * true zero, which exact Σc/Σc² sums over the SPARSE (user,type)
    * count frame already encode (the zero terms add nothing) — item
    * variances need only the global user count. One fact scan → sparse
    * count frame; item frame is type-bounded; total-score frame is
    * user-keyed. Every variance input an exact BIGINT. */
  def cronbachAlpha(spark: SparkSession, dir: String): DataFrame = {
    val cnts = Lake.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nu = cnts.agg(countDistinct(col("user_id")).as("nu"))
    // per-item variance (nu·q − s²)/nu² is a terminating integer ratio
    // → exact integer half-up at 6 dp (decimal(38,0)-staged numerator)
    val items = cnts.groupBy(col("event_type"))
      .agg(sum(col("c")).as("s"), sum(col("c") * col("c")).as("q"))
      .crossJoin(broadcast(nu))
      .withColumn("vin",
        ((col("nu").cast(DecimalType(38, 0)) * col("q")
          - col("s").cast(DecimalType(38, 0)) * col("s")) * 1000000L)
          .cast(DecimalType(38, 0)))
      .select(col("nu"),
        (ExactRound.halfUpPos("vin", "nu * nu")
          .cast("double") / 1e6).as("v_i"))
    val sumItemVar = items.groupBy(col("nu"))
      .agg(count(lit(1)).as("k"),
        sum(round(col("v_i"), 6).cast(DecimalType(18, 6))).as("sum_v"))
    val totals = cnts.groupBy(col("user_id"))
      .agg(sum(col("c")).as("t"))
      .agg(sum(col("t")).as("st"), sum(col("t") * col("t")).as("qt"))
      .crossJoin(broadcast(nu.select(col("nu").as("nu_t"))))
      .select(col("st"), col("qt"), col("nu_t"))
    // total_var = (nu·qt − st²)/nu² and alpha = k·(D·10⁶ − S6·nu²) /
    // ((k−1)·D·10⁶) are terminating integer/decimal ratios → exact
    // integer half-up; D·10⁶ and the alpha numerator exceed int64, so
    // they stage through decimal(38,0). alpha is SIGNED.
    val out = sumItemVar.crossJoin(broadcast(totals))
      .withColumn("dd", col("nu_t") * col("qt") - col("st") * col("st"))
      .withColumn("s6", (col("sum_v") * 1000000).cast("long"))
      .withColumn("tn",
        (col("dd").cast(DecimalType(38, 0)) * 10000L)
          .cast(DecimalType(38, 0)))
      .withColumn("an",
        ((col("dd").cast(DecimalType(38, 0)) * 1000000L
          - col("s6").cast(DecimalType(38, 0)) * col("nu_t") * col("nu_t"))
          * col("k")).cast(DecimalType(38, 0)))
      .withColumn("ad", (col("k") - 1) * col("dd"))
      .select(col("nu").as("n_users"), col("k").as("k_items"),
        round(col("sum_v"), 4).cast("double").as("sum_item_var"),
        (ExactRound.halfUpPos("tn", "nu_t * nu_t")
          .cast("double") / 1e4).as("total_var"),
        (ExactRound.halfUp("an", "ad").cast("double") / 1e6).as("alpha"))
      .localCheckpoint(true)
    cnts.unpersist(false)
    out
  }

  /** Negative-binomial moment fit of the daily count distribution per
    * event type — the distributional follow-through on the Fano
    * dispersion screen (Fano says Var/Mean > 1; the NB fit says WHICH
    * overdispersed law: r̂ = m²/(v−m), p̂ = m/v, with smaller r̂ =
    * burstier): both moments from exact BIGINT Σ, Σx² over the
    * calendar-bounded day frame, the two closed forms one scalar double
    * tree; r̂/p̂ are null when v ≤ m (no overdispersion to fit — the
    * Poisson boundary), flagged by the exact-integer compare
    * n·Σx² − (Σx)² > (n−1)·Σx. */
  def negBinFit(spark: SparkSession, dir: String): DataFrame = {
    val daily = Lake.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val agg = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("m", col("sx").cast("double") / col("n"))
      .withColumn("v",
        (col("sxx").cast("double") - col("n") * col("m") * col("m")) /
          (col("n") - 1).cast("double"))
      // overdispersion decided by the EXACT integer form of v > m:
      // (n·Σx² − (Σx)²)/(n(n−1)) > Σx/n  ⟺  n·Σx² − (Σx)² > (n−1)·Σx
      .withColumn("overdispersed",
        col("n") * col("sxx") - col("sx") * col("sx") >
          (col("n") - 1) * col("sx"))
    // every readout is a terminating integer ratio over the exact
    // power sums → exact integer half-up ([[ExactRound]]):
    // m = sx/n, v = (n·sxx − sx²)/(n(n−1)),
    // p̂ = m/v = sx(n−1)/(n·sxx − sx²),
    // r̂ = m²/(v−m) = sx²(n−1)/(n(n·sxx − sx² − (n−1)sx))
    agg.select(col("event_type"), col("n").as("n_days"),
      (ExactRound.halfUpPos("10000 * sx", "n")
        .cast("double") / 1e4).as("mean_daily"),
      (ExactRound.halfUpPos("10000 * (n * sxx - sx * sx)",
        "n * (n - 1)").cast("double") / 1e4).as("var_daily"),
      col("overdispersed"),
      when(col("overdispersed"),
        ExactRound.halfUpPos("10000 * sx * sx * (n - 1)",
          "n * (n * sxx - sx * sx - (n - 1) * sx)")
          .cast("double") / 1e4).as("r_hat"),
      when(col("overdispersed"),
        ExactRound.halfUpPos("1000000 * sx * (n - 1)",
          "n * sxx - sx * sx").cast("double") / 1e6).as("p_hat"))
      .orderBy(col("event_type"))
  }

  /** Friedman rank test across event types with days as blocks — the
    * nonparametric repeated-measures ANOVA (do the activity levels of
    * the types keep a consistent ORDERING day after day, or is the
    * daily ranking noise?): each day ranks its k type counts (missing
    * type-days are true zeros via the bounded day×type grid; ties break
    * deterministically by type name, documented — the classic
    * average-rank correction is deliberately traded for an exact
    * integer replay), χ² = [12ΣR_j² − 3n²k(k+1)²]/(nk(k+1)) with df =
    * k−1, everything an exact BIGINT into one terminating quotient
    * rounded by exact integer half-up. Calendar×type-bounded frames
    * throughout. */
  def friedman(spark: SparkSession, dir: String): DataFrame = {
    val daily = Lake.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = daily.select(col("day")).distinct()
      .crossJoin(broadcast(daily.select(col("event_type")).distinct()))
      .join(daily, Seq("day", "event_type"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val wDay = Window.partitionBy(col("day"))
      .orderBy(col("x"), col("event_type"))
    val ranks = grid
      .withColumn("r", row_number().over(wDay).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("r")).as("rank_sum"))
    val wAll = Window.partitionBy()
    val out = ranks
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("rank_sum") * col("rank_sum")).over(wAll))
      .withColumn("num",
        lit(12L) * col("s") - lit(3L) * col("n_days") * col("n_days") *
          col("k") * (col("k") + 1L) * (col("k") + 1L))
      .withColumn("den", col("n_days") * col("k") * (col("k") + 1L))
      .select(col("event_type"), col("n_days"), col("rank_sum"),
        (expr("(2 * rank_sum * 10000 + n_days) div (2 * n_days)")
          .cast("double") / 10000.0).as("mean_rank"),
        (col("k") - 1L).as("df"),
        (expr("(2 * num * 10000 + den) div (2 * den)")
          .cast("double") / 10000.0).as("friedman_chi2"))
      .orderBy(col("event_type"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Deterministic permutation (randomization) test for the A/B
    * conversion lift — the assumption-free complement to the z-test in
    * [[abReadout]] (no normality, no pooled-variance approximation: the
    * null is "labels don't matter", simulated by re-assigning arms):
    * nPerms pseudorandom reassignments arm_p(u) = (u·(16807+1000p) mod
    * 2147483647) mod 2 — the same LCG family as the experiment's own
    * assignment but decorrelated multipliers, so BOTH engines replay the
    * identical permutations with pure integer arithmetic — and the
    * one-sided-count p-value (1 + #{|Δ_p| ≥ |Δ_obs|})/(nPerms+1) with
    * the add-one convention (the observed split is itself a permutation).
    * Every per-permutation diff is one double tree over exact BIGINT
    * counts; the terminating p-value rounds by exact integer half-up.
    *
    * Shape: ONE user aggregate, then a broadcast fan-out of the
    * (nPerms)-row grid — 64× map-side rows into a 64-group partial
    * aggregate, no shuffle growth with data size; pick nPerms to budget
    * the fan-out at corpus scale. */
  def permutationTest(spark: SparkSession, dir: String,
                      convertAt: Long = 15, nPerms: Int = 64): DataFrame = {
    val perUser = Lake.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          >= convertAt, 1L).otherwise(0L)
        .as("converted"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def rate(conv: Column, n: Column): Column =
      conv.cast("double") / n
    val obs = perUser
      .withColumn("arm",
        pmod(col("user_id") * lit(16807L), lit(2147483647L)) % 2)
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("c1"))
      .select((rate(col("c1"), col("n1")) - rate(col("c0"), col("n0")))
        .as("diff_obs"))
    val perms = spark.range(1, nPerms + 1).select(col("id").as("p"))
    val diffs = perUser.crossJoin(broadcast(perms))
      .withColumn("arm",
        pmod(col("user_id") * (lit(16807L) + col("p") * 1000L),
          lit(2147483647L)) % 2)
      .groupBy(col("p"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("c0"),
        sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("c1"))
      .select(col("p"),
        when(col("n0") > 0 && col("n1") > 0,
          rate(col("c1"), col("n1")) - rate(col("c0"), col("n0")))
          .as("diff_p"))
    val out = diffs.crossJoin(broadcast(obs))
      .agg(count(lit(1)).as("n_perms"),
        sum(when(abs(col("diff_p")) >= abs(col("diff_obs")), 1L)
          .otherwise(0L)).as("n_extreme"),
        max(col("diff_obs")).as("diff_obs"))
      .select(col("n_perms"), round(col("diff_obs"), 6).as("diff_observed"),
        col("n_extreme"),
        (expr("(2 * (1 + n_extreme) * 1000000 + (n_perms + 1)) div " +
          "(2 * (n_perms + 1))").cast("double") / 1000000.0).as("p_value"))
      .localCheckpoint(true)
    perUser.unpersist(false)
    out
  }

  /** Circular (directional) statistics of the time-of-day distribution
    * per event type — hour-of-day is an angle, not a line, so naive
    * mean/variance are WRONG at midnight wraparound (events at 23:30 and
    * 00:30 average to noon linearly, to midnight circularly): each event
    * maps to θ = 2π·(µs-of-day)/86400e6, the resultant R̄ = √(C̄²+S̄²)
    * measures concentration (1 = all at one instant, 0 = uniform),
    * circular variance = 1−R̄, and the mean direction atan2(S,C) maps
    * back to the peak hour. µs-of-day is an exact epoch-µs remainder;
    * per-event cos/sin terms are 8-rounded into decimal so the two sums
    * are aggregation-order-free (map-side combinable at any scale); the
    * trig tail is one scalar tree on the bounded type frame. */
  def circadian(spark: SparkSession, dir: String): DataFrame = {
    val theta = lit(2 * math.Pi) *
      (unix_micros(col("ts")) % lit(86400000000L)).cast("double") /
      lit(86400000000L).cast("double")
    val dec8 = DecimalType(28, 8)
    val v = col("ang") / lit(2 * math.Pi) * lit(24.0)
    Lake.events(spark, dir)
      .select(col("event_type"), round(cos(theta), 8).cast(dec8).as("ct"),
        round(sin(theta), 8).cast(dec8).as("st"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("ct")).as("c"),
        sum(col("st")).as("s"))
      // squares in DOUBLE: a decimal(28,8)² would overflow precision 38,
      // where the two engines' scale-reduction rules differ
      .withColumn("r_bar",
        sqrt(col("c").cast("double") * col("c").cast("double") +
          col("s").cast("double") * col("s").cast("double")) / col("n"))
      .withColumn("ang", atan2(col("s").cast("double"), col("c").cast("double")))
      .select(col("event_type"), col("n").as("n_events"),
        round(col("r_bar"), 6).as("r_bar"),
        round(lit(1.0) - col("r_bar"), 6).as("circ_var"),
        round(v - floor(v / 24) * 24, 4).as("mean_hour"))
      .orderBy(col("event_type"))
  }

  /** Wald–Wolfowitz runs test on each event type's daily series against
    * its OWN mean — is the above/below pattern random, trending (too few
    * runs) or oscillating (too many)? The side of each day is the EXACT
    * integer compare x·n > Σx (never a double mean at the boundary);
    * runs count off one day-ordered window; μ_R = 1 + 2n₁n₂/n and
    * σ²_R = 2n₁n₂(2n₁n₂−n)/(n²(n−1)) from exact integer counts into one
    * scalar tree. Calendar-bounded frames throughout. */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAgg = Window.partitionBy(col("event_type"))
    val daily = Lake.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("n", count(lit(1)).over(wAgg))
      .withColumn("sx", sum(col("x")).over(wAgg))
      .withColumn("above", (col("x") * col("n") > col("sx")).cast("long"))
      .withColumn("flip",
        when(lag(col("above"), 1).over(w).isNull, 1L)
          .when(col("above") =!= lag(col("above"), 1).over(w), 1L)
          .otherwise(0L))
    daily.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_days"),
        sum(col("above")).as("n_above"),
        sum(col("flip")).as("runs"))
      .withColumn("n_below", col("n_days") - col("n_above"))
      .withColumn("p2", lit(2L) * col("n_above") * col("n_below"))
      .withColumn("mu",
        lit(1.0) + col("p2").cast("double") / col("n_days"))
      .withColumn("s2",
        col("p2").cast("double") * (col("p2") - col("n_days")).cast("double") /
          (col("n_days").cast("double") * col("n_days") *
            (col("n_days") - 1).cast("double")))
      .select(col("event_type"), col("n_days"), col("n_above"),
        col("n_below"), col("runs"),
        round(col("mu"), 4).as("expected_runs"),
        round((col("runs").cast("double") - col("mu")) / sqrt(col("s2")), 4)
          .as("z"))
      .orderBy(col("event_type"))
  }

  /** Durbin–Watson autocorrelation screen on the residuals of each
    * event type's daily linear trend — is the trend-line fit leaving
    * serially-correlated structure behind (DW ≈ 2 none, → 0 positive,
    * → 4 negative)? The closed-form OLS on the day index comes from
    * exact BIGINT sums; residuals are 6-rounded into decimal so BOTH
    * quadratic forms Σ(eₜ−eₜ₋₁)² and Σeₜ² are exact decimal sums
    * (order-free); the single final divide rounds as a double. One
    * day-ordered window pass per type over the calendar-bounded frame. */
  def durbinWatson(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    // two consumers (the fit sums, the residual pass) — persist the
    // calendar-bounded day frame so the corpus is scanned once
    val daily = Lake.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("t", row_number().over(w).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fit = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("x")).as("sx"), sum(col("t") * col("x")).as("stx"),
        sum(col("t") * col("t")).as("stt"))
      .withColumn("b",
        (col("n") * col("stx") - col("st") * col("sx")).cast("double") /
          (col("n") * col("stt") - col("st") * col("st")).cast("double"))
      .withColumn("a",
        col("sx").cast("double") / col("n") -
          col("b") * (col("st").cast("double") / col("n")))
      .select(col("event_type"), col("n"), col("a"), col("b"))
    val resid = daily.join(broadcast(fit), Seq("event_type"))
      .withColumn("e",
        round(col("x").cast("double") - (col("a") + col("b") * col("t")), 6)
          .cast(DecimalType(18, 6)))
      .withColumn("de", col("e") - lag(col("e"), 1).over(w))
    val out = resid.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_days"),
        sum(col("e") * col("e")).as("see"),
        sum(col("de") * col("de")).as("sdd"))
      // ratio of exact scale-12 decimal sums (terminating) → exact
      // integer half-up, staged through decimal(38,0) for the ×10¹⁶
      // combined rescale
      .withColumn("dwn", ((col("sdd") * lit(1000000000000L))
        .cast(DecimalType(38, 0)) * 10000L).cast(DecimalType(38, 0)))
      .withColumn("dwd", (col("see") * lit(1000000000000L))
        .cast(DecimalType(38, 0)))
      .select(col("event_type"), col("n_days"),
        (ExactRound.halfUpPos("dwn", "dwd").cast("double") / 1e4)
          .as("dw"))
      .orderBy(col("event_type"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Hurst exponent of the daily event-count series by the
    * aggregated-variance method — the long-range-dependence screen the
    * short-lag diagnostics ([[acfQuery]], [[dispersionQuery]]'s Fano
    * factor) cannot see: for block sizes m, the variance of m-block
    * means of a self-similar series scales as m^(2H−2), so H falls out
    * of the log-log slope. H ≈ ½ is memoryless; H → 1 means shocks
    * persist (capacity planning must size for runs, not i.i.d. noise).
    *
    * Exactness: block means stay rational by carrying block SUMS
    * (exact BIGINTs; squares staged through decimal(38,0) — a block sum
    * can reach 10⁸ at 1000× this corpus, its square 10¹⁶·#blocks past
    * int64) and deferring the /m² to the one double tree; the ln-space
    * regression is transcendental, so each ln is pinned at 9 dp into
    * decimal(18,9) — addition-order-independent sums — and the slope is
    * one double expression of those exact sums, replayed verbatim by
    * the oracle. Degenerate zero-variance points (constant series)
    * drop out of the regression in both engines.
    *
    * Shape: one events scan → bounded calendar frame; the day index is
    * a window on it, the m-grid is a map-side explode, and every later
    * frame is ≤ #days rows. */
  def hurst(spark: SparkSession, dir: String,
            blockSizes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    require(blockSizes.nonEmpty, "hurst needs at least one block size")
    val daily = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx = daily.withColumn("i",
      row_number().over(Window.orderBy(col("day"))))
    val perM = idx
      .withColumn("m", explode(array(blockSizes.map(lit(_)): _*)))
      .withColumn("blk", expr("(i - 1) div m"))
      .groupBy(col("m"), col("blk"))
      .agg(count(lit(1)).as("cnt"), sum(col("x")).as("s"))
      .filter(col("cnt") === col("m")) // complete blocks only
      .groupBy(col("m"))
      .agg(count(lit(1)).as("b"), sum(col("s")).as("ss"),
        sum((col("s").cast(DecimalType(38, 0)) * col("s"))
          .cast(DecimalType(38, 0))).as("sss"))
      // population variance of block means: (B·Σs² − (Σs)²)/(B²·m²)
      .withColumn("var_mean",
        (col("b").cast("double") * col("sss").cast("double")
          - col("ss").cast("double") * col("ss").cast("double"))
          / (col("b").cast("double") * col("b").cast("double")
            * col("m").cast("double") * col("m").cast("double")))
    val pts = perM.select(col("m"), col("b"), col("var_mean"),
        expr("cast(round(ln(cast(m AS double)), 9) AS decimal(18,9))")
          .as("lx"),
        expr("cast(round(ln(var_mean), 9) AS decimal(18,9))").as("ly"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reg = pts.filter(col("var_mean") > 0)
      .agg(count(lit(1)).as("k"), sum(col("lx")).as("sx"),
        sum(col("ly")).as("sy"),
        sum(col("lx") * col("lx")).as("sxx"),
        sum(col("lx") * col("ly")).as("sxy"))
      .select(((col("k").cast("double") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double"))
        / (col("k").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double")))
        .as("slope"))
    val out = pts.crossJoin(broadcast(reg))
      .select(col("m").cast("long").as("block_size"),
        col("b").as("n_blocks"),
        round(col("var_mean"), 6).as("var_of_means"),
        round(lit(1.0) + col("slope") / lit(2.0), 4).as("hurst"))
      .orderBy(col("block_size"))
      .localCheckpoint(true)
    pts.unpersist(false)
    daily.unpersist(false)
    out
  }

  /** Ljung–Box portmanteau whiteness test of each event type's daily
    * series — the OMNIBUS complement of the lag-wise [[acfQuery]] and
    * the residual-level [[durbinWatson]]: Q = n(n+2)·Σ_k r_k²/c_k over
    * lags 1..`maxLag`, compared to the χ²₇ 95% critical value 14.067 (a
    * literal, so no CDF library can disagree). c_k is the ACTUAL lag-k
    * pair count from the calendar equi-join (equal to n−k on a gapless
    * calendar; using the real count keeps the statistic honest when a
    * type skips days).
    *
    * Determinism: r_k is the acf double tree pinned at 6 dp; each
    * summand r_k²/c_k is then EXACT — R = r_k·10⁶ is an integer, the
    * term is halfUpPos(R², c_k) at scale 12 ([[ExactRound]] — the
    * quotient CAN terminate when c_k is 2^a5^b, so the double route is
    * not tie-safe here) — and Q pins at 4 dp from the exact scale-12
    * sum staged through decimal(38,0). The reject flag compares pinned
    * integers, never doubles.
    *
    * Shape: one events scan → bounded per-type calendar frame; lag
    * pairs via one 7-way explode + equi-join (the acf discipline); all
    * later frames are type×lag-bounded. */
  def ljungBox(spark: SparkSession, dir: String,
               maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "ljungBox needs at least one lag")
    val daily = Lake.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
    val pairs = daily
      .withColumn("k", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("tday", date_add(col("day"), col("k")))
      .select(col("event_type"), col("k"), col("tday"), col("x").as("xa"))
      .join(daily.select(col("event_type"), col("day").as("tday"),
        col("x").as("xb")), Seq("event_type", "tday"))
    val rk = pairs
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("c"), sum(col("xa")).as("sa"),
        sum(col("xb")).as("sb"), sum(col("xa") * col("xb")).as("sab"))
      .join(stats, Seq("event_type"))
      .withColumn("m", col("sx").cast("double") / col("n"))
      .withColumn("r6", round(
        (col("sab").cast("double") - col("m") * col("sa") -
          col("m") * col("sb") + col("c") * col("m") * col("m")) /
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx") / col("n")), 6))
      // double → decimal(18,6) → exact integer (the surprisal-family
      // routing: a direct double×10⁶→long cast truncates in Spark but
      // ROUNDS in DuckDB — the decimal hop makes both engines round)
      .withColumn("rr",
        (col("r6").cast(DecimalType(18, 6)) * 1000000).cast("long"))
      // r²/c at scale 12, exact (R² ≤ 10¹² fits long)
      .withColumn("t12", ExactRound.halfUpPos("rr * rr", "c"))
    val out = rk.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_days"), count(lit(1)).as("n_lags"),
        sum(col("t12")).as("s12"))
      .withColumn("qn",
        ((col("s12").cast(DecimalType(38, 0)) * col("n_days")
          * (col("n_days") + 2)) * 10000).cast(DecimalType(38, 0)))
      .withColumn("q4", ExactRound.halfUpPos("qn", "1000000000000"))
      .select(col("event_type"), col("n_days"), col("n_lags"),
        (col("q4").cast("double") / 1e4).as("q_stat"),
        // χ²(7, 0.95) = 14.067: compare PINNED integers
        when(col("q4") > 140670L, 1L).otherwise(0L).as("lb_reject"))
      .orderBy(col("event_type"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Uplift (Qini) readout of the A/B experiment by targeting score —
    * the policy question behind [[abReadout]]'s single average effect:
    * if only the top-scored users were treated, how much conversion
    * lift would the treatment actually buy? Users rank by a pre-metric
    * engagement score (view count — correlated with but distinct from
    * the purchase-threshold conversion), split into score quintiles by
    * the distinct-value cumulative rule (every user with the same score
    * lands in the same bucket — no per-user global window), and each
    * bucket reports its arm sizes, per-arm conversion, the within-
    * bucket uplift, and the cumulative Qini statistic
    * convT − convC·nT/nC down the ranking.
    *
    * Exactness: uplift = (convT·nC − convC·nT)/(nT·nC) and Qini's
    * correction are single integer ratios pinned by signed exact
    * integer half-up ([[ExactRound]]); cross products stage through
    * decimal(38,0) (user counts square past int64 at corpus scale);
    * empty arms clamp the denominator to 1 in both engines.
    *
    * Shape: one events scan → one user aggregate; the quintile map is
    * a window over the bounded distinct-score frame; the readout is a
    * 5-row frame with a bounded cumulative window. Same Lehmer arm
    * hash as [[abReadout]] (oracle-replayable, never rand()). */
  def upliftQuintiles(spark: SparkSession, dir: String,
                      convertAt: Long = 15): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val perUser = Lake.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          >= convertAt, 1L).otherwise(0L).as("converted"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("score"))
      .withColumn("treated",
        when(pmod(col("user_id") * lit(16807L), lit(2147483647L)) % 2 === 0,
          1L).otherwise(0L))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val byScore = perUser.groupBy(col("score"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byScore.agg(sum(col("c")).as("n"))
    val qmap = byScore
      .withColumn("cum", sum(col("c")).over(wCum))
      .crossJoin(broadcast(tot))
      .select(col("score"),
        least(lit(5L), lit(1L) + expr("(5 * (cum - 1)) div n")).as("q"))
    val buckets = perUser.join(qmap, Seq("score"))
      .groupBy(col("q"))
      .agg(sum(col("treated")).as("n_t"),
        sum(col("treated") * col("converted")).as("conv_t"),
        sum(lit(1L) - col("treated")).as("n_c"),
        sum((lit(1L) - col("treated")) * col("converted")).as("conv_c"))
    val wQ = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = buckets
      .withColumn("ct", sum(col("conv_t")).over(wQ))
      .withColumn("cc", sum(col("conv_c")).over(wQ))
      .withColumn("nt", sum(col("n_t")).over(wQ))
      .withColumn("nc", sum(col("n_c")).over(wQ))
      .withColumn("un",
        ((col("conv_t").cast(dec38) * col("n_c")
          - col("conv_c").cast(dec38) * col("n_t")) * 1000000).cast(dec38))
      .withColumn("ud",
        (col("n_t").cast(dec38) * col("n_c")).cast(dec38))
      .withColumn("qn",
        ((col("ct").cast(dec38) * col("nc")
          - col("cc").cast(dec38) * col("nt")) * 10000).cast(dec38))
      .select(col("q").as("quintile"),
        col("n_t"), col("conv_t"), col("n_c"), col("conv_c"),
        (ExactRound.halfUp("un", "greatest(ud, 1)").cast("double") / 1e6)
          .as("uplift"),
        (ExactRound.halfUp("qn", "greatest(nc, 1)").cast("double") / 1e4)
          .as("qini"))
      .orderBy(col("quintile"))
      .localCheckpoint(true)
    perUser.unpersist(false)
    out
  }
}
