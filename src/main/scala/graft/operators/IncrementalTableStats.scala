package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FreqFunctions, KllFunctions}
import graft.sources.SnapshotTable

/** The incremental-statistics contract wired to the snapshot table: a
  * stats SIDECAR holding one sketch row per committed version —
  * (n_rows, HLL NDV sketch, KLL quantile sketch, frequent-items sketch).
  *
  * [[refresh]] sketches ONLY versions without a sidecar row yet, so the
  * cost of keeping a 100 TB table's profile current is proportional to
  * the data committed since the last refresh, never to history.
  * [[profile]] merges all sidecar rows into the table's current profile
  * (row count exact; NDV / quantiles / top values within each sketch's
  * documented error) without touching the table at all.
  *
  * Sidecar layout mirrors the table: `<statsDir>/v=N` parquet, so a
  * plain partitioned read discovers the `v` column and vacuumed table
  * versions keep their (still-valid) sketch history.
  */
object IncrementalTableStats {

  /** Versions that already have a COMPLETE sidecar row: the `v=N` dir
    * must carry parquet's `_SUCCESS` commit marker, so a refresh that
    * crashed mid-write is redone (mode Overwrite), never skipped. */
  def sketchedVersions(spark: SparkSession, statsDir: String): Set[Long] = {
    val p = new Path(statsDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return Set.empty
    f.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v="))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong)
      .filter(v => f.exists(new Path(p, s"v=$v/_SUCCESS")))
      .toSet
  }

  /** Sketch every committed table version not yet in the sidecar; one
    * aggregate pass per NEW version only. `stringCol` feeds the NDV and
    * frequent-items sketches, `numCol` the quantile sketch. Returns the
    * versions sketched by this call. */
  def refresh(spark: SparkSession, tableDir: String, statsDir: String,
              stringCol: String, numCol: String): Seq[Long] = {
    val done = sketchedVersions(spark, statsDir)
    val todo = SnapshotTable.versions(spark, tableDir).filterNot(done)
    todo.foreach { v =>
      SnapshotTable.read(spark, tableDir, Some(v))
        .agg(
          count(lit(1)).as("n_rows"),
          hll_sketch_agg(col(stringCol)).as("ndv_sketch"),
          KllFunctions.kllSketchAgg(col(numCol)).as("q_sketch"),
          FreqFunctions.freqSketchAgg(col(stringCol)).as("freq_sketch"))
        .write.mode("overwrite").parquet(s"$statsDir/v=$v")
    }
    todo
  }

  /** The table's current profile from sidecar sketches alone: exact total
    * rows, merged-HLL NDV, merged-KLL quantiles, merged top values. */
  def profile(spark: SparkSession, statsDir: String,
              ranks: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame =
    spark.read.parquet(statsDir)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        hll_sketch_estimate(hll_union_agg(col("ndv_sketch"))).as("ndv_estimate"),
        KllFunctions.kllQuantiles(
          KllFunctions.kllMergeAgg(col("q_sketch")), ranks).as("quantiles"),
        FreqFunctions.freqTopItems(
          FreqFunctions.freqMergeAgg(col("freq_sketch"))).as("top_values"))
}
