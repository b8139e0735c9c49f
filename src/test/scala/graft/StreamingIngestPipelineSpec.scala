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

  test("streaming near-dup screen drops corpus collisions, keeps novel docs") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_neardup_stream").toString
    // reference corpus: the first 100 lake docs
    val reference = Lake.documents(spark, Sf).filter("doc_id < 100")
    val refBuckets = IngestStream.referenceBuckets(reference)
      .persist() // reused every micro-batch — build once
    refBuckets.count()

    // arriving docs: 5 exact copies of reference docs (ids shifted),
    // 5 near-dups (one token changed), and 5 genuinely novel docs
    val refTexts = reference.filter("doc_id < 5")
      .select("doc_id", "text").as[(Long, String)].collect()
    val arriving =
      refTexts.map { case (id, t) => (10000L + id, t) } ++
      refTexts.map { case (id, t) =>
        (20000L + id, t.replaceFirst("^\\S+", "zzznovel")) } ++
      (0 until 5).map(i => (30000L + i,
        s"entirely fresh document number $i with unrepeated novel words w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    val landing = s"$tmp/landing"
    arriving.toSeq.toDF("doc_id", "text").write.parquet(landing)

    val outDir = s"$tmp/screened"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val query = spark.readStream.schema(schema).parquet(landing)
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        IngestStream.screenNearDups(batch, refBuckets)
          .write.mode("append").parquet(outDir): Unit
      }
      .start()
    try {
      query.processAllAvailable()
      val kept = spark.read.parquet(outDir).select("doc_id")
        .as[Long].collect().toSet
      assert(kept.forall(_ >= 30000L),
        s"exact copies and near-dups must be screened out, kept: $kept")
      assert((0 until 5).forall(i => kept(30000L + i)),
        s"novel docs must pass the screen, kept: $kept")
    } finally { query.stop(); refBuckets.unpersist() }
  }
}
