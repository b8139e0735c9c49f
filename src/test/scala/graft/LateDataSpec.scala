package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.streaming.StreamJoin

/** Late-data observability: watermark drops are silent by design — the
  * [[StreamJoin.lateDataMetrics]] surface makes them countable. A row
  * arriving behind the watermark must (a) not appear in the sink and
  * (b) show up in `rows_dropped_late`, attributed to its batch. */
class LateDataSpec extends SparkSpecBase {

  test("a behind-the-watermark row is dropped AND counted in lateDataMetrics") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, Long)]
    val tmp = Files.createTempDirectory("graft_late").toString
    val counts = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("n"))
    val query = counts.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", s"$tmp/sink")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      def at(h: Double) = Timestamp.from(Instant.ofEpochSecond((h * 3600).toLong))
      input.addData(Seq((at(0.1), 1L), (at(0.2), 2L), (at(1.5), 3L)))
      query.processAllAvailable()
      // advance the watermark far past hour 0, closing its window
      input.addData(Seq((at(10), 4L)))
      query.processAllAvailable()
      // this row is hours behind the watermark → silently dropped
      input.addData(Seq((at(0.5), 99L)))
      query.processAllAvailable()
      input.addData(Seq((at(11), 5L)))
      query.processAllAvailable()

      val sunk = spark.read.parquet(s"$tmp/sink").collect()
        .map(r => r.getTimestamp(0).toInstant.getEpochSecond / 3600 -> r.getLong(1))
        .toMap
      assert(sunk.get(0).contains(2L),
        s"hour-0 window must hold only the on-time rows, got $sunk")
      val dropped = StreamJoin.lateDataMetrics(spark, query)
        .collect().map(_.getLong(2)).sum
      assert(dropped >= 1, "the late row must be counted as dropped")

      // watermark-lag dashboard: per batch, lag = max event time seen −
      // watermark. After the at(11) batch the watermark trails by the
      // 1-hour delay (3600 s): the lag signal a freshness alert fires on
      val lag = StreamJoin.watermarkLag(spark, query).collect()
      assert(lag.nonEmpty, "watermarked batches must produce lag rows")
      val byBatch = lag.map(r => r.getLong(0) -> r.getDouble(3)).toMap
      // the all-late batch reads NEGATIVE (its newest row was already
      // behind the watermark) — the signature that pairs with a
      // rows_dropped_late spike
      assert(byBatch.values.exists(_ < 0.0),
        s"the all-late batch must show negative lag: $byBatch")
      // the progress's watermark is the PRE-batch one, so a data batch's
      // lag floors at the configured delay (1 h) and grows with the
      // event-time gap since the previous batch
      val lastLag = lag.maxBy(_.getLong(0)).getDouble(3)
      assert(lastLag >= 3599.0,
        s"lag can never undercut the watermark delay, got $lastLag")
    } finally query.stop()
  }
}
