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

  test("log compaction bounds files per bucket and rebuilds identically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = Files.createTempDirectory("graft_scd2_compact").toString
    val logDir = s"$tmp/log"
    // simulate a long-lived stream: many tiny appends to ONE bucket
    // (single key → deterministic bucket), a few to another
    for (i <- 1 to 12)
      Seq((i.toLong, 7L, ts(f"2024-01-${i}%02d 00:00:00"), s"state$i"))
        .toDF("event_id", "user_id", "ts", "event_type")
        .withColumn("kbucket", pmod(hash(col("user_id")), lit(64)))
        .write.mode("append").partitionBy("kbucket").parquet(logDir)
    Seq((100L, 9L, ts("2024-01-01 00:00:00"), "paid"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("kbucket", pmod(hash(col("user_id")), lit(64)))
      .write.mode("append").partitionBy("kbucket").parquet(logDir)
    def filesPerBucket: Map[String, Int] =
      new java.io.File(logDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("kbucket="))
        .map(d => d.getName -> d.listFiles()
          .count(f => f.isFile && f.getName.endsWith(".parquet"))).toMap
    val before = spark.read.parquet(logDir)
      .orderBy(col("event_id")).collect().toSeq
    assert(filesPerBucket.values.max >= 12, "pre-compaction fragmentation")
    val compacted = Scd2Stream.compactLog(spark, logDir, maxFilesPerBucket = 4)
    assert(compacted.size == 1 && compacted.head._2 >= 12,
      s"exactly the fragmented bucket compacts: $compacted")
    assert(filesPerBucket.values.max == 1,
      s"compacted bucket must hold one file: $filesPerBucket")
    // byte-faithful: the full log reads identically (kbucket included)
    val after = spark.read.parquet(logDir)
      .orderBy(col("event_id")).collect().toSeq
    assert(after == before, "compaction must not change log contents")
    // appends after compaction still land and read back
    Seq((200L, 7L, ts("2024-02-01 00:00:00"), "late"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("kbucket", pmod(hash(col("user_id")), lit(64)))
      .write.mode("append").partitionBy("kbucket").parquet(logDir)
    assert(spark.read.parquet(logDir).count() == before.size + 1)
  }

  test("interrupted compaction swaps recover without data loss") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fsRoot = Files.createTempDirectory("graft_scd2_recover").toString
    def mkLog(dir: String): Unit =
      for (i <- 1 to 3)
        Seq((i.toLong, 7L, ts(f"2024-01-0$i 00:00:00"), s"s$i"))
          .toDF("event_id", "user_id", "ts", "event_type")
          .withColumn("kbucket", pmod(hash(col("user_id")), lit(64)))
          .write.mode("append").partitionBy("kbucket").parquet(dir)
    // state A: crash after parking, staging COMPLETE → roll forward
    val logA = s"$fsRoot/a"; mkLog(logA)
    val bucket = new java.io.File(logA).listFiles()
      .filter(_.getName.startsWith("kbucket=")).head.getName
    val rowsA = spark.read.parquet(logA).orderBy(col("event_id")).collect().toSeq
    spark.read.parquet(s"$logA/$bucket").coalesce(1)
      .write.parquet(s"$logA/_compacting/$bucket")
    assert(new java.io.File(s"$logA/_compacting/$bucket/_SUCCESS").exists())
    assert(new java.io.File(s"$logA/$bucket")
      .renameTo(new java.io.File(s"$logA/_precompact_tmp")))
    new java.io.File(s"$logA/_precompact").mkdirs()
    assert(new java.io.File(s"$logA/_precompact_tmp")
      .renameTo(new java.io.File(s"$logA/_precompact/$bucket")))
    Scd2Stream.recoverCompaction(spark, logA)
    assert(spark.read.parquet(logA).orderBy(col("event_id")).collect().toSeq
      == rowsA, "roll-forward recovery must serve the compacted bucket")
    assert(!new java.io.File(s"$logA/_precompact/$bucket").exists())
    // state B: crash after parking with INCOMPLETE staging → roll back
    val logB = s"$fsRoot/b"; mkLog(logB)
    val rowsB = spark.read.parquet(logB).orderBy(col("event_id")).collect().toSeq
    new java.io.File(s"$logB/_compacting/$bucket").mkdirs() // no _SUCCESS
    new java.io.File(s"$logB/_precompact").mkdirs()
    assert(new java.io.File(s"$logB/$bucket")
      .renameTo(new java.io.File(s"$logB/_precompact/$bucket")))
    Scd2Stream.recoverCompaction(spark, logB)
    assert(spark.read.parquet(logB).orderBy(col("event_id")).collect().toSeq
      == rowsB, "roll-back recovery must restore the original bucket")
    // state C: staging leftover while the live dir is intact → discarded
    val logC = s"$fsRoot/c"; mkLog(logC)
    spark.read.parquet(s"$logC/$bucket").coalesce(1)
      .write.parquet(s"$logC/_compacting/$bucket")
    val rowsC = spark.read.parquet(logC).orderBy(col("event_id")).collect().toSeq
    Scd2Stream.recoverCompaction(spark, logC)
    assert(!new java.io.File(s"$logC/_compacting/$bucket").exists())
    assert(spark.read.parquet(logC).orderBy(col("event_id")).collect().toSeq
      == rowsC)
  }
}
