package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned ("time travel") parquet tables: every write lands in a
  * `v=N` directory and is published by atomically CREATING a `_commit_N`
  * marker file — the latest version is the highest marker present.
  * There is no delete-then-rename window: markers are only ever created
  * (and removed by vacuum), so a crash at any point leaves every already-
  * committed version readable and the table writable.
  *
  * Crash analysis:
  *  - crash before the data write finishes → no marker; the orphan
  *    `v=N` data is clobbered by the next writer (mode Overwrite) because
  *    it was never committed;
  *  - crash after marker creation → the commit is complete.
  *
  * This is the minimal snapshot-isolation layout (the idea behind
  * Delta/Iceberg manifests reduced to marker files). Single-writer;
  * concurrent writers need a coordinating lock or conditional-put.
  */
object SnapshotTable {

  private val MarkerPrefix = "_commit_"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed version, or None for an empty table. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return None
    // only all-digit suffixes count — a stray `_commit_foo.tmp` must not
    // make the whole table unreadable with NumberFormatException
    val versions = f.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong)
    if (versions.isEmpty) None else Some(versions.max)
  }

  /** Commit `df` as the next version; returns the new version number. */
  def write(spark: SparkSession, dir: String, df: DataFrame): Long = {
    val next = latestVersion(spark, dir).fold(0L)(_ + 1L)
    // Overwrite clobbers only ever-uncommitted orphans (no marker exists
    // for `next`), so committed versions stay immutable
    df.write.mode("overwrite").parquet(s"$dir/v=$next")
    val f = fs(spark, dir)
    val out = f.create(new Path(dir, s"$MarkerPrefix$next"), false)
    out.close()
    next
  }

  /** Read the latest version (or a specific one for time travel). */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $dir has no committed version"))
    version.foreach { req =>
      if (!fs(spark, dir).exists(new Path(dir, s"$MarkerPrefix$req")))
        throw new IllegalArgumentException(
          s"snapshot table $dir has no committed version $req (vacuumed or never written)")
    }
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Drop all versions older than the `keepLast` most recent (never the
    * current one — `keepLast` must be ≥ 1). */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least the current version")
    val latest = latestVersion(spark, dir).getOrElse(return Seq.empty)
    val f = fs(spark, dir)
    val dropBelow = latest - (keepLast - 1)
    (0L until dropBelow).filter { v =>
      val marker = new Path(dir, s"$MarkerPrefix$v")
      if (f.exists(marker)) {
        // remove the marker FIRST so a crash mid-vacuum never leaves a
        // committed pointer at missing data
        f.delete(marker, false)
        f.delete(new Path(dir, s"v=$v"), true)
        true
      } else false
    }
  }
}
