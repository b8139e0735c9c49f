package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.streaming.SessionAlign

/** Session-window stream–stream alignment: conversions attach to the
  * gap-session that contains them, early conversions park in pending until
  * their session closes, and state stays bounded on both halves. */
class SessionAlignSpec extends SparkSpecBase {

  private def ts(min: Long): Timestamp =
    Timestamp.from(Instant.ofEpochSecond(min * 60))

  test("a re-delivered batch never aligns the same probe row twice") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_align_replay").toString
    // one closed session on disk
    Seq((1L, ts(0), ts(15), 3L))
      .toDF("user_id", "session_start", "session_end", "n_events")
      .write.parquet(s"$tmp/sessions")
    val batch = Seq((1L, 101L, ts(4)), (1L, 102L, ts(30)))
      .toDF("user_id", "conv_id", "ts")
    val run = SessionAlign.alignBatch(spark, s"$tmp/sessions",
      s"$tmp/aligned", s"$tmp/pending") _
    run(batch, 0L)
    run(batch, 0L) // crash-replay: the SAME batch delivered again
    val aligned = spark.read.parquet(s"$tmp/aligned")
      .select("conv_id").as[Long].collect().toSeq
    assert(aligned == Seq(101L),
      s"replay must not duplicate or misalign: $aligned")
    val pending = spark.read.parquet(s"$tmp/pending")
      .select("conv_id").as[Long].collect().toSeq
    assert(pending == Seq(102L), s"sessionless row stays pending once: $pending")
  }

  test("two planted streams align on gap-sessions with bounded state and a pending re-probe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val tmp = Files.createTempDirectory("graft_session_align").toString
    val sessionsPath = s"$tmp/sessions"
    val alignedPath = s"$tmp/aligned"
    val pendingPath = s"$tmp/pending"

    // activity: user 1 has two sessions (minutes 0–5 and 60–62);
    // user 2 has one (minutes 10–11). Gap 10 min.
    val activity = MemoryStream[(Long, Timestamp)]
    val actQuery = SessionAlign.sessionize(
        activity.toDF().toDF("user_id", "ts"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", sessionsPath)
      .option("checkpointLocation", s"$tmp/act_ckpt")
      .start()

    val probe = MemoryStream[(Long, Long, Timestamp)]
    val probeQuery = SessionAlign.alignedQuery(
      probe.toDF().toDF("user_id", "conv_id", "ts"),
      spark, sessionsPath, alignedPath, pendingPath, s"$tmp/probe_ckpt")

    try {
      // phase 1: first sessions' activity, then sentinels far enough to
      // close them (watermark 45−20=25 > both session ends 15 and 21) but
      // NOT past the phase-2 events at minute 60 — those must not be late
      activity.addData(Seq(
        (1L, ts(0)), (1L, ts(3)), (1L, ts(5)),
        (2L, ts(10)), (2L, ts(11))))
      actQuery.processAllAvailable()
      activity.addData(Seq((99L, ts(45))))
      actQuery.processAllAvailable()
      activity.addData(Seq((99L, ts(50))))
      actQuery.processAllAvailable()

      // conversions: inside user-1 session 1, inside user-2's session,
      // inside user-1 session 2 (NOT CLOSED YET → must park in pending),
      // and one that matches no session ever
      probe.addData(Seq(
        (1L, 101L, ts(4)), (2L, 102L, ts(10)),
        (1L, 103L, ts(61)), (3L, 104L, ts(7))))
      probeQuery.processAllAvailable()

      val alignedPhase1 = spark.read.parquet(alignedPath)
        .select("conv_id").as[Long].collect().toSet
      assert(alignedPhase1 == Set(101L, 102L),
        s"only conversions of CLOSED sessions align in phase 1: $alignedPhase1")
      val pendingPhase1 = spark.read.parquet(pendingPath)
        .select("conv_id").as[Long].collect().toSet
      assert(pendingPhase1 == Set(103L, 104L),
        s"unclosed/no-session conversions must park in pending: $pendingPhase1")

      // phase 2: user 1's second session happens and closes (watermark
      // 100−20=80 ≥ its end 72)
      activity.addData(Seq((1L, ts(60)), (1L, ts(62))))
      actQuery.processAllAvailable()
      activity.addData(Seq((99L, ts(100))))
      actQuery.processAllAvailable()
      activity.addData(Seq((99L, ts(110))))
      actQuery.processAllAvailable()

      // any new probe data triggers the re-probe of pending
      probe.addData(Seq((2L, 105L, ts(10))))
      probeQuery.processAllAvailable()

      val aligned = spark.read.parquet(alignedPath).collect()
        .map(r => r.getAs[Long]("conv_id") ->
          (r.getAs[Long]("user_id"),
            r.getAs[Timestamp]("session_start").toInstant.getEpochSecond / 60,
            r.getAs[Long]("n_events")))
        .toMap
      assert(aligned.keySet == Set(101L, 102L, 103L, 105L),
        s"the parked conversion must align after its session closes: ${aligned.keySet}")
      assert(aligned(101L) == ((1L, 0L, 3L)), s"wrong session for 101: ${aligned(101L)}")
      assert(aligned(103L) == ((1L, 60L, 2L)), s"wrong session for 103: ${aligned(103L)}")
      // nothing aligned twice
      val raw = spark.read.parquet(alignedPath).select("conv_id").as[Long].collect()
      assert(raw.length == raw.distinct.length, "a conversion aligned twice")
      // the never-matching conversion stays pending (bounded by unmatched volume)
      val pendingFinal = spark.read.parquet(pendingPath)
        .select("conv_id").as[Long].collect().toSet
      assert(pendingFinal == Set(104L), s"only the sessionless row stays pending: $pendingFinal")
      // bounded state: the activity side holds session-window state only;
      // the probe side is stateless (foreachBatch, no state operators)
      val probeState = graft.streaming.StreamJoin.stateMetrics(spark, probeQuery)
      assert(probeState.filter(col("state_rows_total") > 0).count() == 0,
        "probe side must hold no streaming state")
    } finally { actQuery.stop(); probeQuery.stop() }
  }
}
