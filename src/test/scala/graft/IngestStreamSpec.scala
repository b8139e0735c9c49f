package graft

import java.nio.file.Files

import graft.streaming.IngestStream

/** Streaming ingest dedup: files landing across triggers, duplicate
  * content dropped on arrival. */
class IngestStreamSpec extends SparkSpecBase {

  test("file-stream ingest drops duplicate content across batches") {
    val tmp = Files.createTempDirectory("graft_ingest").toString
    val landing = s"$tmp/landing"
    val docs = Lake.documents(spark, Sf)
    // batch 1: first 300 docs land
    docs.filter("doc_id < 300").write.parquet(landing)
    val stream = IngestStream.dedupedDocs(spark, landing, docs.schema)
    val query = stream.writeStream
      .format("memory").queryName("ingest_out")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .start()
    try {
      query.processAllAvailable()
      val n1 = spark.sql("SELECT count(*) FROM ingest_out").collect()(0).getLong(0)
      assert(n1 == 300, s"first batch should land 300 docs, got $n1")
      // batch 2: full corpus lands again — 300 dups + 200 new
      docs.write.mode("append").parquet(landing)
      query.processAllAvailable()
      val rows = spark.sql(
        "SELECT count(*), count(DISTINCT content_hash) FROM ingest_out").collect()(0)
      assert(rows.getLong(0) == 500, s"expected 500 unique docs, got ${rows.getLong(0)}")
      assert(rows.getLong(1) == 500, "every surviving row must carry a unique hash")
    } finally query.stop()
  }

  test("watermark-bounded dedup collapses in-window duplicates and evicts old state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val stream = IngestStream.dedupedDocsWithTtl(
      input.toDF().toDF("ts", "text"), "ts", ttl = "10 minutes")
    val query = stream.writeStream
      .format("memory").queryName("ttl_out").outputMode("append").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      // two copies of A within the window -> one survives; B distinct
      input.addData((ts(0), "doc A"), (ts(1), "doc A"), (ts(2), "doc B"))
      query.processAllAvailable()
      // advance event time far past the watermark, then replay A: its
      // state has been evicted, so the replayed copy is ACCEPTED — the
      // documented trade of bounded state
      input.addData((ts(40), "doc C"))
      query.processAllAvailable()
      input.addData((ts(41), "doc A"))
      query.processAllAvailable()
      val texts = spark.sql("SELECT text FROM ttl_out").collect().map(_.getString(0))
      assert(texts.count(_ == "doc A") == 2,
        s"one in-window copy plus one post-eviction replay, got ${texts.toSeq}")
      assert(texts.count(_ == "doc B") == 1 && texts.count(_ == "doc C") == 1)
    } finally query.stop()
  }
}
