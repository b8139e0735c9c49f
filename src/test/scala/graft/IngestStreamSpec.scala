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
}
