package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.streaming.DriftStream

/** The streaming drift monitor: windowed per-bin counts land in a sink
  * exactly once per closed window, and the PSI scorer over the sink alarms
  * for exactly the windows after a planted distribution shift. */
class DriftStreamSpec extends SparkSpecBase {

  test("rolling-reference PSI alarms at the shift, then adapts once the reference rolls past it") {
    import spark.implicits._
    // hours 0–19: bins 0–4 uniform; hours 20–29: bins 20–24 uniform.
    // Trailing 6-hour reference: alarm at hours 20–24 (reference mostly
    // the old regime; by hour 25 it is 5/6 new and PSI drops under the
    // threshold), silent from 25 on — the self-healing property a FIXED
    // reference cannot have. Warm-up hour 0 has no reference → alarm
    // false by flag.
    val rows = for {
      h <- 0 until 30
      b <- 0 until 5
    } yield (Timestamp.from(Instant.ofEpochSecond(h * 3600L)),
      (if (h < 20) b else 20 + b).toLong, 4L)
    val windows = rows.toDF("bucket", "bin", "n")
    val scored = graft.streaming.DriftStream
      .rollingPsi(windows, refWindows = 6, windowSeconds = 3600L)
      .collect()
      .map(r => ((r.getTimestamp(0).toInstant.getEpochSecond / 3600L).toInt,
        r.getLong(2), r.getBoolean(4)))
      .sortBy(_._1)
    assert(scored.map(_._1).toSeq == (0 until 30).toSeq)
    assert(scored.head._2 == 0L, "hour 0 has an empty trailing reference")
    assert(!scored.head._3, "empty reference must never alarm")
    val alarmed = scored.filter(_._3).map(_._1).toSeq
    assert(alarmed == (20 until 25).toSeq,
      s"alarm must span exactly the reference-contaminated window: $alarmed")
  }

  test("windowed PSI over the streamed sink crosses the 0.25 alarm exactly at the planted shift") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    // hours 0–19: values cycle {5, 15, 25, 35, 45} (bins 0–4 at width 10);
    // hours 20–29: the distribution JUMPS to {205, ..., 245} (bins 20–24)
    def valueAt(h: Int, i: Int): Double =
      (if (h < 20) 5 else 205) + (i % 5) * 10.0
    val events = for {
      h <- 0 until 30
      i <- 0 until 20
    } yield (Timestamp.from(Instant.ofEpochSecond(h * 3600L + i)), valueAt(h, i))

    val input = MemoryStream[(Timestamp, Double)]
    val tmp = Files.createTempDirectory("graft_drift_stream").toString
    val sink = s"$tmp/binned"
    val query = DriftStream.binnedCounts(
        input.toDF().toDF("ts", "value"), "value", binWidth = 10.0)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      input.addData(events)
      query.processAllAvailable()
      // sentinels past the data advance the watermark so every window closes
      input.addData(Seq((Timestamp.from(Instant.ofEpochSecond(40 * 3600L)), 5.0)))
      query.processAllAvailable()
      input.addData(Seq((Timestamp.from(Instant.ofEpochSecond(41 * 3600L)), 5.0)))
      query.processAllAvailable()

      val sinkDf = spark.read.parquet(sink)
        .filter(org.apache.spark.sql.functions.col("bucket") <
          Timestamp.from(Instant.ofEpochSecond(30 * 3600L)))
      // reference = the pre-shift regime's distribution (what a monitor
      // trains on): bins 0–4, 4 events each per 20
      val ref = Seq((0L, 80L), (1L, 80L), (2L, 80L), (3L, 80L), (4L, 80L))
        .toDF("bin", "n")
      val scored = DriftStream.windowedPsi(sinkDf, ref).collect()
        .map(r => ((r.getTimestamp(0).toInstant.getEpochSecond / 3600L).toInt,
          r.getDouble(2), r.getBoolean(3)))
        .sortBy(_._1)
      assert(scored.map(_._1).toSeq == (0 until 30).toSeq,
        "every closed hour must score exactly once")
      val alarmed = scored.filter(_._3).map(_._1).toSeq
      assert(alarmed == (20 until 30).toSeq,
        s"exactly the post-shift hours must alarm, got $alarmed")
      // the false→true transition happens exactly once, at the shift
      val flips = scored.map(_._3).sliding(2).count(p => p(0) != p(1))
      assert(flips == 1, s"alarm must flip exactly once, got $flips in ${scored.map(_._3).toSeq}")
      // pre-shift windows match the reference almost exactly → PSI ≈ 0
      assert(scored.filter(_._1 < 20).forall(_._2 < 0.05),
        s"pre-shift PSI must be near zero: ${scored.take(20).map(_._2).toSeq}")
    } finally query.stop()
  }
}
