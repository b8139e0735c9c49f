package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{IngestStream, SEvent, SessionizeStream}

/** Streaming on the production state-store configuration: RocksDB provider
  * + checkpointed restart. The in-memory HashMap provider (test default
  * elsewhere) holds state on the executor heap; these tests prove the same
  * operators recover their state from a RocksDB checkpoint across a query
  * restart — the contract that makes "exact dedup forever" and long-lived
  * session state production-safe. (The memory sink cannot recover from a
  * checkpoint, so these tests use the parquet file sink.) */
class RocksDbStreamingSpec extends SparkSpecBase {

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private def withRocksDb[A](body: => A): A = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      GraftSession.RocksDbProvider)
    try body
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("session state survives a query restart from a RocksDB checkpoint") {
    withRocksDb {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val tmp = Files.createTempDirectory("graft_rocks_sess").toString
      val input = MemoryStream[SEvent]
      val out = SessionizeStream.sessionize(input.toDS(), gapSec = 1800)
      def start() = out.writeStream
        .format("parquet").option("path", s"$tmp/out")
        .outputMode("append").option("checkpointLocation", s"$tmp/ckpt").start()

      val q1 = start()
      try {
        input.addData(
          SEvent(1L, 1L, ts(100), "view"),
          SEvent(1L, 2L, ts(110), "purchase"))
        q1.processAllAvailable()
      } finally q1.stop()

      // restart from the same checkpoint: the open session (2 events, one
      // purchase) must be restored from RocksDB, not restarted empty
      val q2 = start()
      try {
        input.addData(SEvent(1L, 3L, ts(150), "click")) // 40 min > gap
        q2.processAllAvailable()
        assert(q2.lastProgress.json.toLowerCase.contains("rocksdb"),
          "query progress must report RocksDB state-store metrics")
        val rows = spark.read.parquet(s"$tmp/out").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        assert(rows.contains((1L, 1L, 2L, 1L)),
          s"session closed after restart must roll up PRE-restart events; got ${rows.toSeq}")
      } finally q2.stop()
    }
  }

  test("ingest dedup state survives a query restart from a RocksDB checkpoint") {
    withRocksDb {
      val tmp = Files.createTempDirectory("graft_rocks_ingest").toString
      val landing = s"$tmp/landing"
      val docs = Lake.documents(spark, Sf)
      docs.filter("doc_id < 300").write.parquet(landing)
      val stream = IngestStream.dedupedDocs(spark, landing, docs.schema)
      def start() = stream.writeStream
        .format("parquet").option("path", s"$tmp/out")
        .outputMode("append").option("checkpointLocation", s"$tmp/ckpt").start()

      val q1 = start()
      try {
        q1.processAllAvailable()
        assert(spark.read.parquet(s"$tmp/out").count() == 300)
      } finally q1.stop()

      // restart, then re-land the full corpus: the 300 already-seen hashes
      // must still be in (recovered) state — only the 200 new docs pass
      val q2 = start()
      try {
        docs.write.mode("append").parquet(landing)
        q2.processAllAvailable()
        val out = spark.read.parquet(s"$tmp/out")
        assert(out.count() == 500,
          s"restart must recover the dedup hash set: expected 500 total, got ${out.count()}")
        assert(out.select("content_hash").distinct().count() == 500,
          "every surviving row must carry a unique content hash")
      } finally q2.stop()
    }
  }
}
