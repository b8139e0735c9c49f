package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.streaming.AnomalyStream

/** The streaming anomaly pipeline: watermarked hourly counts land in a
  * sink exactly once per closed window, and the batch scorer over the
  * sink flags exactly the planted spike. */
class AnomalyStreamSpec extends SparkSpecBase {

  test("streamed hourly counts + batch scorer flag exactly the planted spike") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    // 30 dense hours of "click": 3 + (h % 3) events per hour, except a
    // 50-event spike at hour 27 (its trailing-24 baseline is spike-free)
    def countAt(h: Int): Int = if (h == 27) 50 else 3 + (h % 3)
    val events = for {
      h <- 0 until 30
      i <- 0 until countAt(h)
    } yield (Timestamp.from(Instant.ofEpochSecond(h * 3600L + i)), "click")

    val input = MemoryStream[(Timestamp, String)]
    val tmp = Files.createTempDirectory("graft_anomaly_stream").toString
    val sink = s"$tmp/hourly"
    val query = AnomalyStream.hourlyCounts(
        input.toDF().toDF("ts", "event_type"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      input.addData(events)
      query.processAllAvailable()
      // sentinel far past the data advances the watermark so every real
      // window closes and emits
      input.addData(Seq((Timestamp.from(Instant.ofEpochSecond(40 * 3600L)), "click")))
      query.processAllAvailable()
      input.addData(Seq((Timestamp.from(Instant.ofEpochSecond(41 * 3600L)), "click")))
      query.processAllAvailable()

      val sinkDf = spark.read.parquet(sink)
      val counts = sinkDf.collect()
        .map(r => (r.getTimestamp(0).toInstant.getEpochSecond / 3600L).toInt -> r.getLong(2))
        .toMap
      assert((0 until 30).forall(h => counts.get(h).contains(countAt(h).toLong)),
        s"every closed hour must emit exactly once with the true count: $counts")

      val flagged = EventOps.anomaliesOn(sinkDf, baseline = 24, zThreshold = 3.0)
        .collect()
        .map(r => (r.getTimestamp(0).toInstant.getEpochSecond / 3600L).toInt)
      assert(flagged.toSeq == Seq(27),
        s"exactly the planted spike hour must flag, got ${flagged.toSeq}")
    } finally query.stop()
  }
}
