package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned ("time travel") parquet tables: every write lands in an
  * immutable `v=N` directory and atomically advances a tiny `_latest`
  * pointer file. Readers resolve either the pointer (latest) or an
  * explicit version — concurrent readers of older versions are never
  * disturbed by new writes, and a crashed write leaves the pointer (and
  * therefore every reader) on the last complete version.
  *
  * This is the minimal snapshot-isolation layout (the idea behind
  * Delta/Iceberg manifests, reduced to a pointer file): data files are
  * immutable, commits are a single pointer rename, history is retained
  * until `vacuum`.
  */
object SnapshotTable {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(dir, "_latest")

  /** Highest committed version, or None for an empty table. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] = {
    val f = fs(spark, dir)
    if (!f.exists(pointer(dir))) None
    else {
      val in = f.open(pointer(dir))
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Commit `df` as the next version; returns the new version number. */
  def write(spark: SparkSession, dir: String, df: DataFrame): Long = {
    val next = latestVersion(spark, dir).fold(0L)(_ + 1L)
    df.write.parquet(s"$dir/v=$next")
    // single-file pointer swap: write aside, rename over (atomic on HDFS
    // and local; object stores need a conditional-put variant)
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"_latest.tmp.$next")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    if (f.exists(pointer(dir))) f.delete(pointer(dir), false)
    f.rename(tmp, pointer(dir))
    next
  }

  /** Read the latest version (or a specific one for time travel). */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $dir has no committed version"))
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Drop all versions older than `keepLast` (never the current one). */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Seq[Long] = {
    val latest = latestVersion(spark, dir).getOrElse(return Seq.empty)
    val f = fs(spark, dir)
    val dropBelow = latest - (keepLast - 1)
    val dropped = (0L until dropBelow).filter { v =>
      val p = new Path(dir, s"v=$v")
      f.exists(p) && f.delete(p, true)
    }
    dropped
  }
}
