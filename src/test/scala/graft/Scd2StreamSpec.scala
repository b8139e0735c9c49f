package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.sources.SnapshotTable
import graft.streaming.Scd2Stream

class Scd2StreamSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming SCD2: history stays current across batches, untouched keys never rewritten") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext

    val tmp = Files.createTempDirectory("graft_scd2_stream").toString
    val (logDir, histDir) = (s"$tmp/log", s"$tmp/hist")

    val input = MemoryStream[(Long, Long, Timestamp, String)]
    val query = Scd2Stream.start(
      input.toDF().toDF("event_id", "user_id", "ts", "event_type"),
      logDir, histDir)
    try {
      // batch 1: user 7 trial → trial (collapses) → paid; user 9 paid
      input.addData(Seq(
        (1L, 7L, ts("2024-01-01 00:00:00"), "trial"),
        (2L, 7L, ts("2024-01-02 00:00:00"), "trial"),
        (3L, 7L, ts("2024-01-03 00:00:00"), "paid"),
        (4L, 9L, ts("2024-01-01 00:00:00"), "paid")))
      query.processAllAvailable()
      val h1 = SnapshotTable.read(spark, histDir)
        .orderBy(col("user_id"), col("version")).collect()
      assert(h1.map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((7L, "trial"), (7L, "paid"), (9L, "paid")))
      assert(h1.count(_.getBoolean(5)) == 2, "one open row per key")

      // batch 2: user 7 churns — only user 7's history is rebuilt
      input.addData(Seq((5L, 7L, ts("2024-01-05 00:00:00"), "churned")))
      query.processAllAvailable()
      val h2 = SnapshotTable.read(spark, histDir)
        .orderBy(col("user_id"), col("version")).collect()
      val u7 = h2.filter(_.getLong(0) == 7L)
      assert(u7.map(_.getString(1)).toSeq == Seq("trial", "paid", "churned"))
      assert(u7(1).getTimestamp(3) == ts("2024-01-05 00:00:00"),
        "the previously-open 'paid' row closed at the churn instant")
      assert(!u7(1).getBoolean(5) && u7(2).getBoolean(5))
      // untouched key: identical rows, still current
      val u9 = h2.filter(_.getLong(0) == 9L)
      assert(u9.length == 1 && u9.head.getBoolean(5) &&
        u9.head.getString(1) == "paid")

      // the merge commit preserved snapshot isolation: the pre-churn
      // version still shows 'paid' open for user 7
      val versions = SnapshotTable.versions(spark, histDir)
      assert(versions.size == 2)
      val old = SnapshotTable.read(spark, histDir, Some(versions.min))
        .filter(col("user_id") === 7L)
        .orderBy(col("version")).collect()
      assert(old.last.getString(1) == "paid" && old.last.getBoolean(5))

      // the change log is hash-bucket-partitioned so a batch's rebuild
      // prunes to the touched buckets instead of scanning the whole log
      val bucketDirs = new java.io.File(logDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("kbucket="))
      assert(bucketDirs.nonEmpty, "log partitioned by key bucket")
    } finally query.stop()
  }
}
