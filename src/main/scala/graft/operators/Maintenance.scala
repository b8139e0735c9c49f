package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Lake

/** Lake maintenance — the write-side half of a data-lake API: small-file
  * compaction, sort-clustering for scan pruning, dedup-on-ingest, and the
  * per-file statistics index that makes file skipping work.
  *
  * Scale notes: compaction and clustering are one repartition(ByRange) +
  * write — a single shuffle sized by `targetFileCount`, no driver
  * materialization. Ingest dedup is a broadcast-able left-anti join on the
  * content hash (the existing-hash side is hashes only, never payloads).
  * File stats aggregate by `input_file_name()` — O(files) output rows.
  */
object Maintenance {

  /** Compact a fragmented table directory into `targetFileCount` files.
    * Round-robin repartition balances sizes regardless of input skew. */
  def compact(spark: SparkSession, tableDir: String, outDir: String,
              targetFileCount: Int): Unit =
    spark.read.parquet(tableDir)
      .repartition(targetFileCount)
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  /** Cluster a table by range on `sortCols`: each output file owns a
    * narrow, disjoint key range, so min/max file stats prune reads on
    * those keys (the poor man's Z-order for a single sort dimension). */
  def clusterBy(spark: SparkSession, tableDir: String, outDir: String,
                sortCols: Seq[String], targetFileCount: Int): Unit = {
    val df = spark.read.parquet(tableDir)
    df.repartitionByRange(targetFileCount, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Z-order clustering over MULTIPLE columns: each column is normalized
    * to a `bitsPerDim`-bit integer rank (linear min/max scaling — switch
    * to quantile ranks for heavily skewed keys), the bits are interleaved
    * into a single Z-value, and the table is range-partitioned + sorted on
    * it. Every output file then covers a small hyper-rectangle of the key
    * space, so min/max file stats prune on ANY of the clustered columns —
    * which single-column range clustering cannot do for the others. */
  def clusterByZorder(spark: SparkSession, tableDir: String, outDir: String,
                      zCols: Seq[String], targetFileCount: Int,
                      bitsPerDim: Int = 16): Unit = {
    require(zCols.nonEmpty && zCols.length * bitsPerDim <= 63,
      "z-value must fit in a long")
    val df = spark.read.parquet(tableDir)
    zCols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"z-order column $c must be numeric, got ${df.schema(c).dataType}")
    }
    val bounds = df.agg(
      lit(1).as("__one"),
      zCols.flatMap(c => Seq(
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))): _*).collect()(0)
    val maxRank = (1L << bitsPerDim) - 1
    val ranks = zCols.map { c =>
      require(!bounds.isNullAt(bounds.fieldIndex(s"${c}__min")),
        s"z-order column $c has no non-null values (or the table is empty)")
      val lo = bounds.getAs[Double](s"${c}__min")
      val hi = bounds.getAs[Double](s"${c}__max")
      val span = if (hi > lo) hi - lo else 1.0
      least(lit(maxRank), greatest(lit(0L),
        ((col(c).cast("double") - lit(lo)) / lit(span) * maxRank).cast("long")))
    }
    val n = zCols.length
    val zval = (0 until bitsPerDim).flatMap { i =>
      ranks.zipWithIndex.map { case (r, d) =>
        shiftleft(shiftright(r, i).bitwiseAND(1), i * n + d)
      }
    }.reduce(_.bitwiseOR(_))
    df.withColumn("__z", zval)
      .repartitionByRange(targetFileCount, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Append only the rows of `batch` whose content hash is not already in
    * the target — exact-dedup-on-ingest. The probe side carries hashes
    * only; at a 100 TB target the hash set still broadcasts or shuffles as
    * a narrow column. */
  def ingestDedup(spark: SparkSession, targetDir: String, batch: DataFrame,
                  hashCol: String = "text"): Long = {
    val existing =
      if (exists(spark, targetDir))
        spark.read.parquet(targetDir)
          .select(sha2(col(hashCol), 256).as("__h")).distinct()
      else spark.emptyDataFrame.withColumn("__h", lit(""))
    val fresh = batch
      // null content can never be keyed by hash — drop it, don't loop it
      // through every re-ingest (sha2(NULL) never equi-matches)
      .filter(col(hashCol).isNotNull)
      .withColumn("__h", sha2(col(hashCol), 256))
      // dedup WITHIN the batch too: two copies landing in one wave must
      // not both reach the curated table
      .dropDuplicates("__h")
      .join(existing, Seq("__h"), "left_anti")
      .drop("__h")
    // persist so the count and the write are ONE execution of the
    // hash-join pipeline, not two (the count gate exists because an
    // all-duplicate batch must not append an empty-but-present dir)
    fresh.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = fresh.count()
      if (n > 0) fresh.write.mode(SaveMode.Append).parquet(targetDir)
      n
    } finally fresh.unpersist()
  }

  /** Dynamic partition overwrite: rewrite ONLY the hive-style partitions
    * present in `batch`, leaving every other partition's files untouched
    * — the standard idempotent backfill/restatement write (a static
    * overwrite would wipe the whole table; an append would duplicate the
    * restated day). Scoped via the session conf for this one write, so
    * callers' global settings are preserved. */
  def overwritePartitions(spark: SparkSession, tableDir: String,
                          batch: DataFrame, partitionCol: String): Unit = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try batch.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(tableDir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Save a DataFrame as a bucketed+sorted managed table: both sides of a
    * recurring fact⨝fact join bucketed on the join key hash-partition
    * identically on disk, so the join plans with ZERO shuffle exchanges
    * (asserted in MaintenanceSpec) — at 100 TB this converts every
    * repeated lineitem⨝orders-style join from a full network shuffle into
    * local stitching of co-located buckets. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    nBuckets: Int): Unit = {
    val spark = df.sparkSession
    // Overwrite semantics even when a previous process left the managed
    // location behind without a catalog entry (in-memory catalogs forget
    // tables across restarts; the warehouse dir persists)
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new Path(warehouse, tableName.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName) // managed table under spark.sql.warehouse.dir
  }

  /** Per-file statistics index for one column: row count + min/max — the
    * information a catalog needs to skip files on a range predicate. */
  def fileStats(spark: SparkSession, tableDir: String,
                statCol: String): DataFrame =
    spark.read.parquet(tableDir)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(statCol)).as("min_val"),
        max(col(statCol)).as("max_val"))
      .orderBy(col("file"))

  /** Driver-visible consistency summary of the file-stats index:
    * re-aggregating the per-file stats must reproduce the stats a direct
    * table scan yields — the invariant that makes file skipping sound. */
  def fileStatsSummary(spark: SparkSession, tableDir: String,
                       statCol: String): DataFrame =
    fileStats(spark, tableDir, statCol)
      .agg(
        sum(col("n_rows")).as("total_rows"),
        min(col("min_val")).cast("double").as("min_val"),
        max(col("max_val")).cast("double").as("max_val"))

  /** Fraction of files a range predicate `[lo, hi]` on a numeric `statCol`
    * could skip, judged from the file-stats index (driver-side over
    * O(files)). Files with NULL stats (all-null column chunk) or
    * non-numeric stats are conservatively counted non-skippable. */
  def skipRatio(stats: DataFrame, lo: Double, hi: Double): Double = {
    val rows = stats.collect()
    val skippable = rows.count { r =>
      (r.get(2), r.get(3)) match {
        case (mn: Number, mx: Number) =>
          mx.doubleValue() < lo || mn.doubleValue() > hi
        case _ => false
      }
    }
    if (rows.isEmpty) 0.0 else skippable.toDouble / rows.length
  }

  /** Point-lookup file index — the bloom-filter complement of [[fileStats]]
    * for columns min/max cannot help with (high-cardinality keys written
    * unsorted: every file spans the whole range). Per file: the SET of
    * occupied hash buckets (xxhash64 mod `buckets`), distinct-aggregated
    * then array-packed — at most `buckets` ints per file, one scan, no
    * false negatives. A key whose bucket is absent from a file's set is
    * PROVABLY not in that file (hash-collision false positives only read
    * an extra file — same contract as a bloom filter at m bits / k=1). */
  def pointIndex(spark: SparkSession, tableDir: String, keyCol: String,
                 buckets: Int = 8192): DataFrame = {
    require(buckets > 0, "bucket count must be positive")
    spark.read.parquet(tableDir)
      .groupBy(input_file_name().as("file"),
        // cast to long so probe-side literals hash identically (xxhash64
        // is type-sensitive: int and bigint encodings differ)
        pmod(xxhash64(col(keyCol).cast("long")), lit(buckets.toLong)).as("__b"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("__b"))).as("occupied"))
  }

  /** Files that may contain `key`, per the [[pointIndex]] — the scan list
    * for a point lookup. The index is O(files) rows; the probe is a
    * driver-free filter on it. */
  def candidateFiles(index: DataFrame, keyCol: String, key: Long,
                     buckets: Int = 8192): DataFrame = {
    val b = index.sparkSession.range(1).select(
      pmod(xxhash64(lit(key).cast("long")), lit(buckets.toLong)).as("__kb"))
    index.crossJoin(broadcast(b))
      .filter(array_contains(col("occupied"), col("__kb")))
      .select(col("file"))
  }
}
