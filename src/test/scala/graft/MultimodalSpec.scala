package graft

import graft.operators.MultimodalOps

/** Multimodal plumbing: binary payloads, typed metadata, and the batched
  * decode path (stubbed kernel, real Spark mechanics). */
class MultimodalSpec extends SparkSpecBase {

  test("payloads carry the exact UTF-8 bytes and typed metadata") {
    val rows = MultimodalOps.payloads(spark, Sf)
      .limit(20).collect()
    for (r <- rows) {
      val payload = r.getAs[Array[Byte]]("payload")
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getString(0) == "text/plain")
      assert(meta.getLong(1) == payload.length, "metadata byte count must match payload")
    }
  }

  test("decode runs in bounded batches and is deterministic") {
    val a = MultimodalOps.decodeFeatures(spark, Sf, batchSize = 64).collect()
    val b = MultimodalOps.decodeFeatures(spark, Sf, batchSize = 64).collect()
    assert(a.length == Lake.documents(spark, Sf).count())
    for (r <- a) {
      assert(r.getInt(2) <= 64 && r.getInt(2) >= 1, "decoder batch out of bounds")
      assert(r.getSeq[Float](3).length == 8, "feature vector arity")
    }
    val fa = a.map(r => (r.getLong(0), r.getSeq[Float](3))).toMap
    val fb = b.map(r => (r.getLong(0), r.getSeq[Float](3))).toMap
    assert(fa == fb, "stub decode must be deterministic")
  }

  test("batched decode throughput is reported and clears a sanity floor") {
    // informational bench for the round report: bytes through the
    // mapPartitions decode path per second at sf0.01 (stub kernel, so
    // this measures the Spark-side plumbing cost, not codec work). The
    // floor only guards against a pathological regression (e.g. per-row
    // decoder invocation re-entering the JVM boundary per element).
    val sf = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions._
    val totalBytes = MultimodalOps.payloads(spark, sf)
      .agg(sum(length(col("payload")))).head().getLong(0)
    MultimodalOps.decodeFeatures(spark, sf).count() // warm
    val t0 = System.nanoTime()
    val n = MultimodalOps.decodeFeatures(spark, sf).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val mbps = totalBytes / 1e6 / secs
    info(f"decode plumbing: $n rows, ${totalBytes / 1e6}%.2f MB in $secs%.3f s = $mbps%.1f MB/s")
    assert(mbps > 0.5, f"decode throughput collapsed: $mbps%.2f MB/s")
  }
}
