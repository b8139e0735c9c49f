package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.streaming.ExperimentStream

/** Streaming experiment monitor: per-window per-arm counts land exactly
  * once, arms match the batch readout's Lehmer hash user-for-user, and
  * counts reconcile with a batch recompute of the same data. */
class ExperimentStreamSpec extends SparkSpecBase {

  test("per-window arm counts emit once and reconcile with the batch hash") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    def arm(u: Long): String =
      if (((u * 16807L) % 2147483647L) % 2 == 0) "A" else "B"
    // 3 hours × 40 users; every 5th event is a purchase
    val events = for {
      h <- 0 until 3
      u <- 0 until 40
    } yield (Timestamp.from(Instant.ofEpochSecond(h * 3600L + u)),
      u.toLong, if (u % 5 == 0) "purchase" else "view")

    val input = MemoryStream[(Timestamp, Long, String)]
    val tmp = Files.createTempDirectory("graft_exp_stream").toString
    val query = ExperimentStream.armWindows(
        input.toDF().toDF("ts", "user_id", "event_type"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$tmp/sink")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      input.addData(events)
      query.processAllAvailable()
      input.addData(Seq((Timestamp.from(Instant.ofEpochSecond(10 * 3600L)), 1L, "view")))
      query.processAllAvailable()
      input.addData(Seq((Timestamp.from(Instant.ofEpochSecond(11 * 3600L)), 1L, "view")))
      query.processAllAvailable()

      val got = spark.read.parquet(s"$tmp/sink")
        .filter(org.apache.spark.sql.functions.col("bucket") <
          Timestamp.from(Instant.ofEpochSecond(3 * 3600L)))
        .collect()
        .map(r => ((r.getTimestamp(0).toInstant.getEpochSecond / 3600L,
          r.getString(1)), (r.getLong(2), r.getLong(3))))
      assert(got.map(_._1).distinct.length == got.length,
        "each (window, arm) must emit exactly once")
      val expected = events.groupBy { case (ts, u, _) =>
        (ts.toInstant.getEpochSecond / 3600L, arm(u))
      }.view.mapValues { rows =>
        (rows.size.toLong, rows.count(_._3 == "purchase").toLong)
      }.toMap
      assert(got.toMap == expected)
      assert(got.map(_._1._2).toSet == Set("A", "B"),
        "the hash must split this user population into both arms")
    } finally query.stop()
  }
}
