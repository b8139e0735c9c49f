package graft

import java.nio.file.Files

import graft.operators.Maintenance
import graft.streaming.IngestStream

/** End-to-end streaming lake pipeline: landing dir → streaming dedup →
  * foreachBatch upsert into a curated parquet table via ingestDedup.
  * The full write path a training-data lake runs continuously. */
class StreamingIngestPipelineSpec extends SparkSpecBase {

  test("landing files stream into a curated table exactly once") {
    val tmp = Files.createTempDirectory("graft_pipe").toString
    val landing = s"$tmp/landing"
    val curated = s"$tmp/curated"
    val docs = Lake.documents(spark, Sf)
    docs.filter("doc_id < 200").write.parquet(landing)

    val stream = IngestStream.dedupedDocs(spark, landing, docs.schema)
      .drop("content_hash")
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Maintenance.ingestDedup(spark, curated, batch): Unit
      }
      .start()
    try {
      query.processAllAvailable()
      assert(spark.read.parquet(curated).count() == 200)
      // second wave: overlapping + new docs land
      docs.write.mode("append").parquet(landing)
      query.processAllAvailable()
      val out = spark.read.parquet(curated)
      assert(out.count() == 500, s"curated table should hold 500 docs, got ${out.count()}")
      assert(out.select("doc_id").distinct().count() == 500, "no doc duplicated")
    } finally query.stop()
  }
}
