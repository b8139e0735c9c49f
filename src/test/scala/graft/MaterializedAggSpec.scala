package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.MaterializedAgg
import graft.sources.SnapshotTable

/** Incremental view maintenance: a sum/count group-by refreshed from the
  * snapshot change-data-feed must equal a full recompute — including
  * adds, removes, in-place updates, group-moving updates, and groups
  * that appear or vanish entirely. */
class MaterializedAggSpec extends SparkSpecBase {

  test("CDF-driven refresh equals full recompute across all change kinds") {
    val tmp = Files.createTempDirectory("graft_mv").toString
    val docs = Lake.documents(spark, Sf)

    // v0: docs 0–299, with a synthetic extra group that will vanish
    val v0data = docs.filter(col("doc_id") < 300)
      .withColumn("source",
        when(col("doc_id") < 3, lit("doomed_group")).otherwise(col("source")))
    SnapshotTable.write(spark, tmp, v0data)
    val mv0 = MaterializedAgg.define(v0data, "source", "n_chars")

    // v1: removes (incl. ALL of doomed_group), in-place updates, a
    // group-moving update, adds (incl. a brand-new group)
    val v1data = docs.filter(col("doc_id") >= 3 && col("doc_id") < 350)
      .withColumn("n_chars",
        when(col("doc_id") < 60, col("n_chars") + 1000L).otherwise(col("n_chars")))
      .withColumn("source",
        when(col("doc_id").between(60, 70), lit("moved_group"))
          .when(col("doc_id") >= 340, lit("fresh_group"))
          .otherwise(col("source")))
    SnapshotTable.write(spark, tmp, v1data)

    val changes = SnapshotTable.rowDiff(spark, tmp, 0L, 1L, "doc_id")
    val refreshed = MaterializedAgg.refresh(mv0, changes, "source", "n_chars")
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val recomputed = MaterializedAgg
      .define(SnapshotTable.read(spark, tmp, Some(1L)), "source", "n_chars")
      .orderBy(col("source")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(refreshed.sameElements(recomputed),
      s"refresh drift:\n${refreshed.toSeq}\nvs\n${recomputed.toSeq}")
    assert(!refreshed.exists(_._1 == "doomed_group"),
      "fully-deleted groups must drop out of the view")
    assert(refreshed.exists(_._1 == "fresh_group") &&
      refreshed.exists(_._1 == "moved_group"),
      "appearing and move-target groups must enter the view")
  }
}
