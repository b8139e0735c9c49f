package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{StatefulTotals, UserActivity}

/** transformWithState on RocksDB: per-user lifetime totals accumulate
  * across micro-batches (state round-trips through the store), update
  * mode emits one row per touched key per batch, and state survives a
  * checkpointed query restart. */
class StatefulTotalsSpec extends SparkSpecBase {

  test("user totals accumulate across batches and survive a restart") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      GraftSession.RocksDbProvider)
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val tmp = Files.createTempDirectory("graft_tws").toString
      val input = MemoryStream[UserActivity]
      val out = StatefulTotals.userTotals(input.toDS())
      // update-mode operator + file persistence: foreachBatch appends
      // each batch's updated rows (file sinks alone are append-only)
      def start() = out.writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.UserTotals], _: Long) =>
          df.write.mode("append").parquet(s"$tmp/out"); ()
        }
        .option("checkpointLocation", s"$tmp/ckpt").start()

      val q1 = start()
      try {
        input.addData(UserActivity(1L, "view"), UserActivity(1L, "purchase"),
          UserActivity(2L, "view"))
        q1.processAllAvailable()
        input.addData(UserActivity(1L, "purchase"))
        q1.processAllAvailable()
      } finally q1.stop()

      // restart from the checkpoint: user 1's two purchases must be
      // restored from RocksDB, not recounted from zero
      val q2 = start()
      try {
        input.addData(UserActivity(1L, "view"), UserActivity(3L, "purchase"))
        q2.processAllAvailable()
      } finally q2.stop()

      val rows = spark.read.parquet(s"$tmp/out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // latest emission per user = the lifetime totals
      val latest = rows.groupBy(_._1).view
        .mapValues(_.maxBy(_._2)).toMap
      assert(latest(1L) == (1L, 4L, 2L), s"user 1: ${latest(1L)}")
      assert(latest(2L) == (2L, 1L, 0L))
      assert(latest(3L) == (3L, 1L, 1L))
      // batch 1 emitted user 1's intermediate (2, 1) row too — update
      // mode emits per touched batch, accumulating monotonically
      assert(rows.contains((1L, 2L, 1L)))
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
