package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.FreqFunctions

/** Streaming heavy-hitters monitor: per tumbling window, ONE Misra-Gries
  * sketch of the value stream — state and sink bytes are bounded by the
  * sketch map size regardless of stream volume (a naive per-value count
  * would hold the full value universe per window). Windows emit
  * append-mode exactly once on close (the [[AnomalyStream]] contract), so
  * sink sketches never change retroactively; any bucket range merges into
  * one top-k report at read time — the sketches are the SAME mergeable
  * binaries the batch catalog stats commit ([[graft.operators.CatalogOps
  * .freqSketches]]), so streaming and batch heavy-hitters share one
  * estimator and one error model. */
object TopKStream {

  /** Tumbling per-window value sketches over a streaming frame with an
    * event-time `ts` and a string `value` column. */
  def windowedSketches(values: DataFrame, windowDur: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame =
    values
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(FreqFunctions.freqSketchAgg(col("value")).as("freq_sketch"),
        count(lit(1)).as("n_rows"))
      .select(col("window.start").as("bucket"), col("freq_sketch"),
        col("n_rows"))

  /** Batch read side: merge the sink's windowed sketches (optionally
    * pre-filtered to a bucket range by the caller) into one top-k table.
    * Exact while every window's distinct-value count fits the sketch map;
    * bounded-error estimates beyond. */
  def topK(sink: DataFrame, k: Int = 10): DataFrame =
    sink.agg(FreqFunctions.freqMergeAgg(col("freq_sketch")).as("sk"))
      .select(explode(FreqFunctions.freqTopItems(col("sk"))).as("f"))
      .select(col("f.item").as("value"), col("f.est").as("est_count"))
      .orderBy(col("est_count").desc, col("value"))
      .limit(k)
}
