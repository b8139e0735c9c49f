package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.streaming.TopKStream

/** Streaming heavy-hitters: per-window sketches land exactly once, stay
  * window-scoped, and merge into the true top-k at read time. */
class TopKStreamSpec extends SparkSpecBase {

  test("windowed sketches emit once per closed window and merge to the true heavy hitters") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    // hour 0: "hot" 40×, "warm" 10×, singles a..e; hour 1: "hot2" 25×,
    // "warm" 5× — distinct counts far under the sketch map, so estimates
    // are exact
    def at(h: Int, i: Int) = Timestamp.from(Instant.ofEpochSecond(h * 3600L + i))
    val rows =
      (0 until 40).map(i => (at(0, i), "hot")) ++
      (0 until 10).map(i => (at(0, 100 + i), "warm")) ++
      Seq("a", "b", "c", "d", "e").zipWithIndex.map { case (v, i) => (at(0, 200 + i), v) } ++
      (0 until 25).map(i => (at(1, i), "hot2")) ++
      (0 until 5).map(i => (at(1, 100 + i), "warm"))

    val input = MemoryStream[(Timestamp, String)]
    val tmp = Files.createTempDirectory("graft_topk_stream").toString
    val sink = s"$tmp/sketches"
    val query = TopKStream.windowedSketches(input.toDF().toDF("ts", "value"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      input.addData(rows)
      query.processAllAvailable()
      // sentinels push the watermark past both real windows
      input.addData(Seq((at(10, 0), "late")))
      query.processAllAvailable()
      input.addData(Seq((at(11, 0), "late")))
      query.processAllAvailable()

      val sinkDf = spark.read.parquet(sink)
      val byBucket = sinkDf.collect()
        .map(r => (r.getTimestamp(0).toInstant.getEpochSecond / 3600L).toInt -> r.getLong(2))
        .toMap
      assert(byBucket.get(0).contains(55L) && byBucket.get(1).contains(30L),
        s"each closed window must emit exactly one sketch row: $byBucket")

      // merged top-k over both windows: exact counts, rank order
      val top = TopKStream.topK(sinkDf.filter("bucket < timestamp '1970-01-01 02:00:00'"), k = 3)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      assert(top == Seq("hot" -> 40L, "hot2" -> 25L, "warm" -> 15L),
        s"merged heavy hitters wrong: $top")

      // window scoping: hour 0's sketch alone knows nothing of hot2
      val h0 = TopKStream.topK(
        sinkDf.filter("bucket = timestamp '1970-01-01 00:00:00'"), k = 10)
        .collect().map(_.getString(0)).toSet
      assert(h0.contains("hot") && !h0.contains("hot2"),
        s"hour-0 sketch must be window-scoped: $h0")
    } finally query.stop()
  }
}
