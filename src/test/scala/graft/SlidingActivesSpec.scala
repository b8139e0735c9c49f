package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.streaming.SlidingActives

/** Streaming sliding-window distinct actives: every closed sliding window
  * is emitted exactly once, and the HLL estimate tracks the exact batch
  * count within sketch error — the scale-honest WAU the batch
  * [[graft.operators.EventOps.rollingActives]] twin computes exactly. */
class SlidingActivesSpec extends SparkSpecBase {

  test("sliding 3d/1d windows emit once, cover every day, and track exact distinct within 5%") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val day = 86400L
    // 10 days; day d has users [d*37 .. d*37+200) — overlapping cohorts so
    // the sliding union is a real distinct, not a sum
    val events = for {
      d <- 0 until 10
      u <- 0 until 200
    } yield (Timestamp.from(Instant.ofEpochSecond(d * day + (u % 24) * 3600L)),
      (d * 37 + u).toLong)

    val input = MemoryStream[(Timestamp, Long)]
    val tmp = Files.createTempDirectory("graft_sliding").toString
    val query = SlidingActives.rollingDistinct(
        input.toDF().toDF("ts", "user_id"),
        windowDur = "3 days", slide = "1 day", watermark = "1 day")
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$tmp/sink")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      input.addData(events)
      query.processAllAvailable()
      input.addData(Seq((Timestamp.from(Instant.ofEpochSecond(20 * day)), 1L)))
      query.processAllAvailable()
      input.addData(Seq((Timestamp.from(Instant.ofEpochSecond(25 * day)), 1L)))
      query.processAllAvailable()

      val got = spark.read.parquet(s"$tmp/sink")
        .filter(org.apache.spark.sql.functions.col("win_end") <=
          Timestamp.from(Instant.ofEpochSecond(12 * day)))
        .collect()
        .map(r => (r.getTimestamp(0).toInstant.getEpochSecond / day,
          r.getLong(2)))
      // exactly one row per closed window, no duplicates
      assert(got.map(_._1).distinct.length == got.length)
      // each event lands in 3 windows: starts d-2..d → window starts
      // -2..9 all present among closed ones
      val expectStarts = (-2L until 10L).toSet
      assert(got.map(_._1).toSet == expectStarts,
        s"closed window starts: ${got.map(_._1).sorted.mkString(",")}")
      val exact = (s: Long) => events.filter { case (ts, _) =>
        val t = ts.toInstant.getEpochSecond
        t >= s * day && t < (s + 3) * day
      }.map(_._2).distinct.size
      for ((s, n) <- got) {
        val e = exact(s)
        assert(math.abs(n - e) <= math.max(2.0, 0.05 * e),
          s"window $s: approx $n vs exact $e")
      }
    } finally query.stop()
  }
}
