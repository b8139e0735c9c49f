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
}
