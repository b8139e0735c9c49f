package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable
import graft.streaming.CdcRefreshStream

/** Streaming incremental view maintenance from the snapshot CDC feed:
  * define-on-first-touch, fold-new-commits-only, crash-safe tagging,
  * and the foreachBatch ticker attachment. */
class CdcRefreshStreamSpec extends SparkSpecBase {

  private def directAgg(dir: String, v: Long) =
    SnapshotTable.read(spark, dir, Some(v))
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("sum_value"), count(lit(1)).as("n_rows"))
      .orderBy(col("source"))

  private def mvRows(mvDir: String) =
    SnapshotTable.read(spark, mvDir)
      .select(col("source"), col("sum_value").cast("long"), col("n_rows"))
      .orderBy(col("source")).collect().toSeq

  private def wantRows(dir: String, v: Long) =
    directAgg(dir, v)
      .select(col("source"), col("sum_value").cast("long"), col("n_rows"))
      .collect().toSeq

  test("catchUp defines once, then folds ONLY the CDC feed of new commits") {
    val root = Files.createTempDirectory("graft_cdcmv").toString
    val (src, mv) = (s"$root/src", s"$root/mv")
    val docs = Lake.documents(spark, Sf)
    SnapshotTable.write(spark, src, docs.filter("doc_id < 100"))
    assert(CdcRefreshStream.catchUp(spark, src, "doc_id", "source",
      "n_chars", mv).contains((0L, 0L)))
    assert(mvRows(mv) == wantRows(src, 0L))
    assert(CdcRefreshStream.cursor(spark, mv).contains(0L))
    // two more commits with removes, updates AND adds in the span
    SnapshotTable.write(spark, src, docs.filter("doc_id >= 50 AND doc_id < 300")
      .withColumn("n_chars", col("n_chars") + 1000L))
    SnapshotTable.write(spark, src, docs)
    assert(CdcRefreshStream.catchUp(spark, src, "doc_id", "source",
      "n_chars", mv).contains((0L, 2L)))
    assert(mvRows(mv) == wantRows(src, 2L),
      "delta-rule fold must land exactly on the direct v2 aggregate")
    // already current → no-op, no new view version
    val head = SnapshotTable.latestVersion(spark, mv)
    assert(CdcRefreshStream.catchUp(spark, src, "doc_id", "source",
      "n_chars", mv).isEmpty)
    assert(SnapshotTable.latestVersion(spark, mv) == head)
  }

  test("a crash between view commit and tag can never double-apply") {
    val root = Files.createTempDirectory("graft_cdcmv_crash").toString
    val (src, mv) = (s"$root/src", s"$root/mv")
    val docs = Lake.documents(spark, Sf)
    SnapshotTable.write(spark, src, docs.filter("doc_id < 200"))
    CdcRefreshStream.catchUp(spark, src, "doc_id", "source", "n_chars", mv)
    SnapshotTable.write(spark, src, docs)
    CdcRefreshStream.catchUp(spark, src, "doc_id", "source", "n_chars", mv)
    // simulate the crash window: the refresh COMMIT survived, its tag
    // did not — the cursor falls back to the previous tagged version
    java.nio.file.Files.delete(java.nio.file.Paths.get(mv, "_tag_src-v1"))
    assert(CdcRefreshStream.cursor(spark, mv).contains(0L))
    val r = CdcRefreshStream.catchUp(spark, src, "doc_id", "source",
      "n_chars", mv)
    assert(r.contains((0L, 1L)))
    // the re-run folded from the TAGGED base, not the orphan head:
    // values equal the direct aggregate (a double-apply would inflate
    // every delta-touched group)
    assert(mvRows(mv) == wantRows(src, 1L))
  }

  test("attach: the source's own changelog stream keeps the view fresh") {
    val root = Files.createTempDirectory("graft_cdcmv_stream").toString
    val (src, mv) = (s"$root/src", s"$root/mv")
    val docs = Lake.documents(spark, Sf)
    SnapshotTable.write(spark, src, docs.filter("doc_id < 150"))
    // plain readStream → foreachBatch over the snapshot changelog
    // source: commits themselves are the triggers, no side ticker
    val query = CdcRefreshStream.attach(spark, src, "doc_id", "source",
      "n_chars", mv, s"$root/ckpt")
    try {
      query.processAllAvailable()
      assert(mvRows(mv) == wantRows(src, 0L))
      // a new source commit alone advances the view
      SnapshotTable.write(spark, src, docs)
      query.processAllAvailable()
      assert(mvRows(mv) == wantRows(src, 1L))
      assert(CdcRefreshStream.cursor(spark, mv).contains(1L))
    } finally query.stop()
  }
}
