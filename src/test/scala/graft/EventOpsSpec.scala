package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Batch event-op semantics on planted data — cases the synthetic corpus
  * does not exercise (exact microsecond ties). */
class EventOpsSpec extends SparkSpecBase {

  test("funnelWithin: microsecond ties never mask an earlier qualifying event") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a view TIED with the click (us=200) must not shadow the
      // qualifying view at 100 — the oracle's strict v.ts < c.ts counts it
      (1L, "view", 1L, 100L), (1L, "view", 2L, 200L),
      (1L, "click", 3L, 200L), (1L, "purchase", 4L, 300L),
      // user 2: the ONLY view is tied with the click → no strictly earlier
      // view → must not convert
      (2L, "view", 5L, 200L), (2L, "click", 6L, 200L),
      (2L, "purchase", 7L, 300L),
      // user 3: a click TIED with the purchase must not shadow the
      // qualified click at 200
      (3L, "view", 8L, 100L), (3L, "click", 9L, 200L),
      (3L, "click", 10L, 300L), (3L, "purchase", 11L, 300L))
      .toDF("user_id", "event_type", "event_id", "us_raw")
      .select(col("user_id"), col("event_type"), col("event_id"),
        timestamp_micros(col("us_raw")).as("ts"))
    val out = EventOps.funnelWithin(ev, horizonHours = 24)
      .as[Long].collect().toSeq
    assert(out == Seq(1L, 3L))
  }

  test("attribution: 40/20/40 split, post-purchase touches dropped, multi-conversion paths separate") {
    import spark.implicits._
    val ev = Seq(
      // user 1, conversion 1: view → click → view → purchase
      //   first (view) 0.4, middle (click) 0.2, last (view) 0.4
      (1L, "view", 1L, 100L), (1L, "click", 2L, 200L),
      (1L, "view", 3L, 300L), (1L, "purchase", 4L, 400L),
      // user 1, conversion 2 (separate path): sole click → purchase = 1.0
      (1L, "click", 5L, 500L), (1L, "purchase", 6L, 600L),
      // user 1: a trailing view with no later purchase — no credit at all
      (1L, "view", 7L, 700L),
      // user 2: two touches → 0.5 each
      (2L, "view", 8L, 100L), (2L, "click", 9L, 200L),
      (2L, "purchase", 10L, 300L))
      .toDF("user_id", "event_type", "event_id", "us_raw")
      .select(col("user_id"), col("event_type"), col("event_id"),
        timestamp_micros(col("us_raw")).as("ts"))
    val out = EventOps.attribution(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // views: 0.4 + 0.4 + 0.5 = 1.3 over 4 touches (one uncredited but
    // counted? no — dropped rows never reach the aggregate: 3 touches)
    assert(out("view") == (3L, 1.3), s"views: ${out("view")}")
    // clicks: 0.2 (middle) + 1.0 (sole) + 0.5 = 1.7 over 3 touches
    assert(out("click") == (3L, 1.7), s"clicks: ${out("click")}")
    // total credit distributed = one unit per conversion (3 conversions)
    assert(math.abs(out.values.map(_._2).sum - 3.0) < 1e-9)
    assert(!out.contains("purchase"))
  }

  test("cusum accumulates a sustained small shift past the alarm that a 3-sigma point screen misses") {
    import spark.implicits._
    // 20 days at 10/day, then 10 days at 14/day: each shifted day is a
    // mild ~+1.7σ point (never 3σ), but CUSUM piles them up
    val rows = for {
      day <- 0 until 30
      n = if (day < 20) 10 else 14
      i <- 0 until n
    } yield (day.toLong * 1000 + i, "click",
      day.toLong * 86400000000L + i * 1000000L)
    val ev = rows.toDF("event_id", "event_type", "us_raw")
      .select(col("event_id"), col("event_type"),
        timestamp_micros(col("us_raw")).as("ts"),
        lit(1L).as("user_id"), lit(0.0).as("value"), lit("{}").as("props"))
    val out = EventOps.cusum(ev).collect()
      .map(r => (r.getTimestamp(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.length == 30)
    // no single day is a 3-sigma outlier…
    assert(out.forall { case (_, z, _, _) => math.abs(z) < 3.0 })
    // …but the cumulative screen alarms inside the shifted regime
    val alarms = out.filter(_._4)
    assert(alarms.nonEmpty, "sustained shift must trip the CUSUM alarm")
    val firstAlarmDay = out.indexWhere(_._4)
    assert(firstAlarmDay >= 20, s"alarm must not fire before the shift (day $firstAlarmDay)")
    // pre-shift the statistic stays small (max(0,·) clamps drift)
    assert(out.take(20).forall(_._3 < 4.0))
  }

  test("transitions: session gaps break chains, rows are conditional probabilities") {
    import spark.implicits._
    val halfHour = 1800L * 1000000L
    val ev = Seq(
      // session 1: view → click → view (transitions view→click, click→view)
      (1L, "view", 1L, 0L), (1L, "click", 2L, 1000000L),
      (1L, "view", 3L, 2000000L),
      // >30 min gap: view ↛ purchase must NOT count as a transition
      (1L, "purchase", 4L, 2000000L + halfHour + 1000000L),
      // second user: view → view
      (2L, "view", 5L, 0L), (2L, "view", 6L, 1000000L))
      .toDF("user_id", "event_type", "event_id", "us_raw")
      // the lake stores events.ts as INT64 nanoseconds (TESTDATA shape) —
      // Lake.events reads that raw-long schema and truncates to micros
      .select(col("event_id"), (col("us_raw") * 1000L).as("ts"),
        col("user_id"), col("event_type"),
        lit(0.0).as("value"), lit("{}").as("props"))
    // write a tiny lake so the (spark, dir) overload path is exercised
    val dir = java.nio.file.Files.createTempDirectory("graft_trans").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      ("view", "click") -> (1L, 0.5),
      ("view", "view") -> (1L, 0.5),
      ("click", "view") -> (1L, 1.0)), s"got $out")
  }

  test("decayed engagement: halving per half-life, exact at the anchor") {
    import spark.implicits._
    val anchor = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    val week = 7L * 86400000000L
    val ev = Seq(
      // user 1: 8.0 AT the anchor (weight 1) + 8.0 one half-life earlier
      // (weight 0.5) = 12.0
      (1L, 0L, 8.0), (2L, -week, 8.0))
      .map { case (id, off, v) => (id, 1L, "view", v,
        java.time.Instant.ofEpochMilli(anchor.getTime).plusNanos(off * 1000)) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val out = EventOps.decayedEngagement(ev).collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L)
    assert(math.abs(out.head.getDouble(2) - 12.0) < 1e-6,
      s"got ${out.head.getDouble(2)}")
  }

  test("daily users: new/returning split and cumulative count on real data") {
    val out = EventOps.dailyUsers(spark, Sf).collect()
    assert(out.nonEmpty, "has days")
    var cum = 0L
    for (r <- out) {
      val (active, nNew, ret, c) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(active == nNew + ret, "active always splits exactly")
      assert(nNew >= 0 && ret >= 0)
      cum += nNew
      assert(c == cum, "cumulative is the running sum of new users")
    }
    assert(out.head.getLong(3) == 0, "day one has no returning users")
    val totalUsers = graft.Lake.events(spark, Sf)
      .select(org.apache.spark.sql.functions.col("user_id")).distinct().count()
    assert(cum == totalUsers, "every user is new exactly once")
  }

  test("scd2: consecutive equals collapse, intervals chain, latest row open") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 7L, "trial"),
      (2L, "2024-01-02 00:00:00", 7L, "trial"),   // no change — collapses
      (3L, "2024-01-03 00:00:00", 7L, "paid"),
      (4L, "2024-01-04 00:00:00", 7L, "churned"),
      (5L, "2024-01-01 00:00:00", 9L, "paid")
    ).toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    val out = EventOps.scd2(ev, "user_id", "event_type").collect()
    val u7 = out.filter(_.getLong(0) == 7L)
    assert(u7.map(_.getString(1)).toSeq == Seq("trial", "paid", "churned"),
      "consecutive equal values collapse into one interval")
    // intervals chain: each valid_to equals the next valid_from
    for (i <- 0 until u7.length - 1)
      assert(u7(i).getTimestamp(3) == u7(i + 1).getTimestamp(2),
        "history has no gaps or overlaps")
    assert(u7.last.isNullAt(3) && u7.last.getBoolean(5), "latest row open")
    assert(u7.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L), "versions dense")
    val u9 = out.filter(_.getLong(0) == 9L)
    assert(u9.length == 1 && u9.head.getBoolean(5))
  }

  test("seasonal screen: a spike day flags against its hour-of-day peers; a flat hour never does") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 25 days at 05:00 — 24 quiet (10 events) + one spike (100);
    // 25 days at 09:00 — perfectly flat (variance 0, never scored)
    val rows =
      (0 until 25).map(d => (f"2024-01-${d + 1}%02d 05:00:00",
        if (d == 12) 100L else 10L, "click")) ++
      (0 until 25).map(d => (f"2024-01-${d + 1}%02d 09:00:00", 7L, "click"))
    val dense = rows.toDF("bucket_s", "n_events", "event_type")
      .select(col("bucket_s").cast("timestamp").as("bucket"),
        col("event_type"), col("n_events"))
    val out = EventOps.seasonalAnomaliesOn(dense, zThreshold = 3.0).collect()
    assert(out.length == 1, s"exactly the spike flags, got ${out.length}")
    assert(out.head.getTimestamp(0).toString.startsWith("2024-01-13 05"))
    assert(out.head.getDouble(3) > 3.0, "spike z-score above threshold")
  }

  test("bot screen: metronome user flags, irregular user doesn't, thin user is excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: 31 events exactly 60 s apart (cv = 0 — scripted);
    // user 2: 31 events with gaps swinging 10 s / 600 s (cv ≈ 1 — human);
    // user 3: 5 events (below minGaps — never scored, however regular)
    val rows =
      (0 until 31).map(i => (i.toLong, 1000L + 60L * i, 1L)) ++
      (0 until 31).map(i => (100L + i,
        2000L + (0 until i).map(j => if (j % 2 == 0) 10L else 600L).sum, 2L)) ++
      (0 until 5).map(i => (200L + i, 3000L + 60L * i, 3L))
    val ev = rows.toDF("event_id", "sec", "user_id")
      .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
        col("user_id"))
    val out = EventOps.botScreen(ev).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(4), r.getBoolean(5))).toMap
    assert(out.keySet == Set(1L, 2L), s"scored users: ${out.keySet}")
    assert(out(1L) == ((30L, 60.0, 0.0, true)), s"metronome: ${out(1L)}")
    val (n2, mean2, cv2, bot2) = out(2L)
    assert(n2 == 30L && math.abs(mean2 - 305.0) < 1e-9, s"human gaps: ${out(2L)}")
    assert(cv2 > 0.9 && !bot2, s"irregular user must not flag: ${out(2L)}")
  }

  test("event trigrams: support counts users once per pattern, occurrences count repeats") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1 loops a→b→c twice (abc occurs twice, but one user);
    // user 2 runs it once; user 3 is unrelated → at minUsers=2 only the
    // shared pattern survives, with 3 occurrences over 2 users
    val types = Map(1L -> Seq("a", "b", "c", "a", "b", "c"),
      2L -> Seq("a", "b", "c"), 3L -> Seq("x", "y", "z"))
    val ev = types.toSeq.flatMap { case (uid, seq) =>
      seq.zipWithIndex.map { case (t, i) =>
        (uid * 100 + i, f"2024-01-01 00:${i}%02d:00", uid, t)
      }
    }.toDF("event_id", "ts_s", "user_id", "event_type")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_ngram").toString
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = EventOps.eventNgrams(spark, tmp, minUsers = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(("a", "b", "c", 3L, 2L)), s"got: ${out.toSeq}")
  }

  test("mSPRT p-process is monotone, hits significance on a planted effect, and reports the lift") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // uid 0 → arm A around 10.5, uid 1 → arm B around 30.5; ten days of
    // ten events per arm per day — a 20-point lift the mixture test must
    // catch, with p never allowed to rebound (always-valid running min)
    val ev = (1 to 10).flatMap { d =>
      (0 until 10).flatMap { i =>
        Seq((0L, f"2024-01-$d%02d 0$i:00:00", 10.0 + (i % 2)),
            (1L, f"2024-01-$d%02d 0$i:00:00", 30.0 + (i % 2)))
      }
    }.toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("value"))
    val rows = EventOps.msprtReadout(ev).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(3), r.getDouble(5),
        r.getBoolean(6)))
    val ps = rows.map(_._3)
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a },
      s"p-process must be nonincreasing: ${ps.toSeq}")
    assert(rows.last._4, s"planted 20-point lift never significant: $rows")
    assert(rows.forall(_._2 == 20.0), s"lift: ${rows.map(_._2).toSeq}")
  }

  test("DiD nets out the planted time-invariant gap and reports it for the trends check") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // arm A (uid 0): pre 10.5, post 12.5 (trend +2); arm B (uid 1):
    // pre 20.5, post 27.5 (trend +7) → DiD 5, pre-existing gap 10
    def cell(uid: Long, ts: String, base: Double) =
      (0 until 20).map(i => (uid, ts, base + (i % 2)))
    val ev = (cell(0L, "2024-01-05 00:00:00", 10.0) ++
      cell(0L, "2024-01-20 00:00:00", 12.0) ++
      cell(1L, "2024-01-05 00:00:00", 20.0) ++
      cell(1L, "2024-01-20 00:00:00", 27.0))
      .toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("value"))
    val r = EventOps.didReadout(ev).collect().head
    assert((0 to 3).forall(i => r.getLong(i) == 20L), s"cells: $r")
    assert(r.getDouble(8) == 10.0, s"pre gap: $r")
    assert(r.getDouble(9) == 5.0, s"did: $r")
    assert(r.getDouble(10) > 10.0, s"planted effect must be decisive: $r")
  }

  test("CUPED recovers the planted theta and preserves the lift while cutting variance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Lehmer parity for small uids is uid parity: even uid → arm A.
    // Pairs (2k, 2k+1) share pre-activity x = k; post y = 2x, arm B +5.
    // x ⟂ arm ⇒ θ = cov/var = 2 exactly, both lifts = 5, 0 < ρ² < 1.
    val ev = (0 until 40).flatMap { uid =>
      val k = uid / 2
      val eff = if (uid % 2 == 1) 5.0 else 0.0
      Seq((uid.toLong, "2024-01-05 12:00:00", k.toDouble),
          (uid.toLong, "2024-01-20 12:00:00", 2.0 * k + eff))
    }.toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("value"))
    val r = EventOps.cupedReadout(ev).collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 20L, s"arms: $r")
    assert(r.getDouble(4) == 5.0, s"raw lift: $r")
    assert(r.getDouble(5) == 2.0, s"theta: $r")
    assert(r.getDouble(6) == 5.0, s"adjusted lift: $r")
    val vr = r.getDouble(7)
    assert(vr > 0.0 && vr < 1.0, s"variance reduction: $r")
  }

  test("BH step-up rejects exactly the planted-effect segment and q-values are monotone") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // uid 2 is arm A (2·16807 even), uid 1 is arm B. Segment s_eff: A
    // around 10, B around 30 — an enormous z; s_null1/s_null2: identical
    // {10, 11} alternation in both arms — z exactly 0, p ≈ 1.
    def seg(name: String, bBase: Long) =
      (0 until 40).map(i => (name, 2L, 10.0 + (i % 2))) ++
      (0 until 40).map(i => (name, 1L, bBase.toDouble + (i % 2)))
    val ev = (seg("s_eff", 30L) ++ seg("s_null1", 10L) ++ seg("s_null2", 10L))
      .toDF("event_type", "user_id", "value")
    val out = EventOps.fdrBh(ev).collect()
      .map(r => r.getString(0) -> (r.getDouble(6), r.getDouble(7), r.getBoolean(8)))
      .toMap
    assert(out("s_eff")._3, "planted effect must be rejected")
    assert(out("s_eff")._1 < 1e-6, s"effect p: ${out("s_eff")}")
    assert(!out("s_null1")._3 && !out("s_null2")._3, "nulls never rejected")
    // BH q-value: monotone along the p ordering, capped at 1
    val qs = out.values.toSeq.sortBy(_._1).map(_._2)
    assert(qs == qs.sorted && qs.forall(_ <= 1.0), s"q-values: $qs")
    // the null segments' z is exactly 0 → p = 2/(1+e^0) = 1
    assert(out("s_null1")._1 == 1.0, s"null p: ${out("s_null1")}")
  }
}
