package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.MaterializedAgg
import graft.sources.SnapshotTable

/** Streaming incremental view maintenance from the snapshot CDC feed —
  * the continuous form of [[graft.operators.MaterializedAgg]]: a
  * sum/count view over a snapshot table stays fresh by consuming
  * `format("graft-snapshot").option("changes", "a..b")` for every new
  * commit, never re-reading the base table. The view itself is a
  * snapshot table, so consumers get versioned, time-travelable
  * aggregates with the same read API as any other lake table.
  *
  * Exactly-once without a journal: each refresh commit of the view is
  * TAGGED `src-v<N>` with the source version it folds through, and the
  * next refresh always starts from the LATEST TAGGED view version —
  * never the view head. A crash between the view commit and its tag
  * leaves an orphan commit that is simply ignored (the re-run folds the
  * same immutable diffs from the same tagged base and produces
  * identical rows; the orphan is vacuumable dead data). Double-apply is
  * structurally impossible.
  *
  * Scale: per refresh, work is proportional to the CHANGE — one
  * materialized-once CDC scan per new version plus a group-sized
  * full-outer merge — while the base table is touched only by the
  * one-time define. [[attach]] is a plain readStream → foreachBatch
  * over the snapshot CHANGELOG SOURCE itself
  * (`format("graft-snapshot").option("changes", "stream")` —
  * [[graft.sources.CdcStreamTable]]): new commits ARE the triggers, so
  * the view refreshes exactly when the source moves, with no side
  * ticker to provision. The fold still goes through [[catchUp]]'s
  * tag-cursor (not the batch rows), so the exactly-once guarantee is
  * the view's own regardless of Spark's checkpoint state. */
object CdcRefreshStream {

  private def srcTag(v: Long) = s"src-v$v"

  /** Source version the view is refreshed through: the max over its
    * `src-v<N>` tags (None for an undefined view). */
  def cursor(spark: SparkSession, mvDir: String): Option[Long] =
    SnapshotTable.tags(spark, mvDir).keys
      .collect { case n if n.startsWith("src-v") &&
        n.stripPrefix("src-v").forall(_.isDigit) =>
        n.stripPrefix("src-v").toLong }
      .maxOption

  /** Fold every source commit past the cursor into the view: first call
    * DEFINES the view from the source's latest version; later calls
    * consume only the CDC feed of the new commits. Returns the
    * (fromVersion, toVersion) span refreshed, or None when already
    * current (or the source has no commits). */
  def catchUp(spark: SparkSession, srcDir: String, key: String,
              groupCol: String, valueCol: String, mvDir: String)
      : Option[(Long, Long)] = {
    val committed = SnapshotTable.versions(spark, srcDir)
    if (committed.isEmpty) return None
    val latest = committed.last
    cursor(spark, mvDir) match {
      case None =>
        val mv0 = MaterializedAgg.define(
          SnapshotTable.read(spark, srcDir, Some(latest)),
          groupCol, valueCol)
        val v = SnapshotTable.write(spark, mvDir, mv0)
        SnapshotTable.tag(spark, mvDir, srcTag(latest), v)
        Some((latest, latest))
      case Some(cur) if cur >= latest => None
      case Some(cur) =>
        val steps = committed.dropWhile(_ < cur)
        require(steps.headOption.contains(cur),
          s"view cursor v$cur was vacuumed from $srcDir — " +
            "drop the view dir and let catchUp redefine it")
        // crash-safe base: the tagged version, never the view head
        var mv = SnapshotTable.readTag(spark, mvDir, srcTag(cur))
        for (pair <- steps.sliding(2) if pair.size == 2) {
          val feed = spark.read.format("graft-snapshot")
            .option("changes", s"${pair.head}..${pair.last}")
            .option("key", key).load(srcDir)
          mv = MaterializedAgg.refresh(mv, feed, groupCol, valueCol)
        }
        val v = SnapshotTable.write(spark, mvDir, mv)
        SnapshotTable.tag(spark, mvDir, srcTag(latest), v)
        Some((cur, latest))
    }
  }

  /** Keep the view continuously fresh: subscribe to the source table's
    * own changelog stream and [[catchUp]] on every micro-batch. The
    * batch ROWS are deliberately ignored (so they are never even read
    * off the sidecars here) — offsets advancing is the signal; catchUp
    * re-derives its span from the view's tags, which makes the poll
    * idempotent under ANY trigger cadence or checkpoint replay. The
    * source table needs at least one commit before attaching (the
    * changelog stream pins its schema at start). */
  def attach(spark: SparkSession, srcDir: String, key: String,
             groupCol: String, valueCol: String, mvDir: String,
             checkpointDir: String): StreamingQuery =
    spark.readStream.format("graft-snapshot")
      .option("changes", "stream").option("key", key)
      .option("startingVersion", -1L)
      .load(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        catchUp(batch.sparkSession, srcDir, key, groupCol, valueCol,
          mvDir): Unit
      }
      .start()
}
