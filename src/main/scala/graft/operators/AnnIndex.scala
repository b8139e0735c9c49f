package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index artifacts: the trained pieces of a similarity
  * search — IVF quantizer centroids and LSH layout parameters — stored as
  * a versioned sidecar so queries REUSE them instead of re-training per
  * call (a real lake API ships the index with the table; per-query
  * k-means both wastes a training job and silently changes the cell
  * layout between calls).
  *
  * Layout mirrors [[IncrementalTableStats]]: `<indexDir>/v=N/` holding
  * `centroids` (c_id, c_emb) and a one-row `params` parquet, with
  * parquet's `_SUCCESS` marker gating completeness — a build that crashed
  * mid-write is redone, never trusted. [[refresh]] appends version N+1
  * from current data (e.g. after new embeddings land); readers default to
  * the LATEST complete version, and old versions stay readable for
  * reproducing past query results.
  */
object AnnIndex {

  /** Complete (both artifacts committed) versions, ascending. */
  def versions(spark: SparkSession, indexDir: String): Seq[Long] = {
    val p = new Path(indexDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return Seq.empty
    f.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v="))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong)
      .filter(v => f.exists(new Path(p, s"v=$v/centroids/_SUCCESS")) &&
        f.exists(new Path(p, s"v=$v/params/_SUCCESS")))
      .toSeq.sorted
  }

  /** Train on the CURRENT corpus and commit the next index version:
    * k-means centroids (bounded driver-side sample — the standard IVF
    * quantizer recipe) plus the LSH layout sized to the corpus via
    * [[AnnOps.bitsForCorpus]]. `sourceVersion` records the committed
    * version of the source table the index was trained on (e.g. a
    * [[graft.sources.SnapshotTable]] version) so [[refresh]] can detect
    * in-place updates a row count cannot. Returns the committed version. */
  def build(spark: SparkSession, indexDir: String, emb: DataFrame,
            dim: Int = 64, nCentroids: Int = 16,
            tables: Int = AnnOps.DefaultTables,
            sampleN: Int = 2048, iters: Int = 5,
            sourceVersion: Option[Long] = None): Long = {
    import spark.implicits._
    val v = versions(spark, indexDir).lastOption.map(_ + 1).getOrElse(0L)
    val cents = AnnOps.kmeansCentroids(emb, nCentroids, sampleN, iters)
    require(cents.nonEmpty, "cannot build an ANN index over an empty corpus")
    val n = emb.count()
    val bits = AnnOps.bitsForCorpus(n)
    cents.toDF("c_id", "c_emb")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/v=$v/centroids")
    Seq((dim, nCentroids, tables, bits, sampleN, iters, n,
        sourceVersion.getOrElse(-1L)))
      .toDF("dim", "n_centroids", "tables", "bits", "sample_n", "iters",
        "n_vectors", "source_version")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/v=$v/params")
    v
  }

  /** Commit an index version from PRE-TRAINED centroids (`c_id`, `c_emb`)
    * — the build path when training is separated from indexing (a stride
    * quantizer, or centroids trained by an external job). Same layout and
    * `_SUCCESS` gating as [[build]]. */
  def buildFromCentroids(spark: SparkSession, indexDir: String,
                         centroids: DataFrame, nVectors: Long,
                         dim: Int = 64, tables: Int = AnnOps.DefaultTables,
                         sourceVersion: Option[Long] = None): Long = {
    import spark.implicits._
    val v = versions(spark, indexDir).lastOption.map(_ + 1).getOrElse(0L)
    val n = centroids.count()
    require(n > 0, "cannot build an ANN index with zero centroids")
    centroids.select(col("c_id"), col("c_emb"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/v=$v/centroids")
    Seq((dim, n.toInt, tables, AnnOps.bitsForCorpus(nVectors), 0, 0,
        nVectors, sourceVersion.getOrElse(-1L)))
      .toDF("dim", "n_centroids", "tables", "bits", "sample_n", "iters",
        "n_vectors", "source_version")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/v=$v/params")
    v
  }

  /** Registered-query form: commit a stride-centroid index version into a
    * fresh sidecar, then answer ONLY through the stored artifacts. The
    * result is definitionally identical to the inline [[AnnOps.ivf]] path
    * (same centroids, same probing), so the persist→load→search path gets
    * the same DuckDB oracle — the storage layer itself is value-verified,
    * not just test-asserted. */
  def ivfIndexedQuery(spark: SparkSession, dir: String,
                      k: Int = 5, nQueries: Int = 8,
                      nCentroids: Int = 16, nProbes: Int = 6): DataFrame = {
    val emb = graft.Lake.embeddings(spark, dir)
    // ONE scratch sidecar PER SESSION (app-id-keyed, rebuilt per call;
    // same discipline as SnapshotTable.diffQuery) — a fresh temp dir per
    // invocation would accumulate artifacts across repeated calls, and a
    // fixed per-JVM name would race concurrent sessions on one machine
    val idxDir = new Path(sys.props("java.io.tmpdir"),
      s"graft_ann_indexed_scratch_${spark.sparkContext.applicationId}").toString
    val f = new Path(idxDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(idxDir), true)
    buildFromCentroids(spark, idxDir,
      AnnOps.strideCentroids(emb, nCentroids), emb.count())
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // eagerly materialize: the lazy plan reads scratch files the NEXT call
    // deletes, so a frame returned earlier must not depend on them
    searchIvf(spark, idxDir, emb, queries, k, nProbes).localCheckpoint(true)
  }

  /** Rebuild iff the corpus changed since the latest build. Staleness is
    * keyed on the source table's committed version when BOTH the caller
    * and the stored params carry one — a row count misses in-place
    * updates (same cardinality, new vectors) — and falls back to the
    * row-count probe otherwise. Returns the new version, or None when the
    * index is already current. */
  def refresh(spark: SparkSession, indexDir: String, emb: DataFrame,
              dim: Int = 64, nCentroids: Int = 16,
              sourceVersion: Option[Long] = None): Option[Long] = {
    versions(spark, indexDir).lastOption match {
      case Some(v) =>
        val p = params(spark, indexDir, Some(v))
        val builtSource =
          if (p.schema.fieldNames.contains("source_version"))
            p.getAs[Long]("source_version")
          else -1L
        val current = (sourceVersion, builtSource) match {
          case (Some(sv), bs) if bs >= 0L => sv == bs
          case _ => emb.count() == p.getAs[Long]("n_vectors")
        }
        if (current) None
        else Some(build(spark, indexDir, emb, dim, nCentroids,
          sourceVersion = sourceVersion))
      case None => Some(build(spark, indexDir, emb, dim, nCentroids,
        sourceVersion = sourceVersion))
    }
  }

  /** Delete all but the newest `keepLast` COMPLETE versions (and any
    * incomplete directories older than the kept set) — the retention
    * sweep that pairs with [[refresh]]'s version growth, mirroring
    * SnapshotTable.vacuum: old versions stay readable until vacuumed,
    * then their storage is reclaimed. Returns the versions removed. */
  def vacuum(spark: SparkSession, indexDir: String,
             keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest version")
    val kept = versions(spark, indexDir).takeRight(keepLast).toSet
    val f = new Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // sweep v=* directories from the FILESYSTEM, not versions() — that
    // list filters to complete builds, so crashed (incomplete) version
    // dirs would otherwise leak storage forever
    val onDisk = f.listStatus(new Path(indexDir)).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("v=") => s.stripPrefix("v=").toLong }
      .sorted
    val drop = onDisk.filterNot(kept)
    drop.foreach(v => f.delete(new Path(indexDir, s"v=$v"), true))
    drop
  }

  /** Stored centroids of `version` (default: latest). */
  def centroids(spark: SparkSession, indexDir: String,
                version: Option[Long] = None): DataFrame = {
    val v = version.orElse(versions(spark, indexDir).lastOption)
      .getOrElse(sys.error(s"no complete ANN index at $indexDir"))
    spark.read.parquet(s"$indexDir/v=$v/centroids")
  }

  /** Commit the int8 ADC calibration (per-dim lo/hi/scale from
    * [[AnnOps.quantParams]]) into an existing index version — the third
    * artifact slot next to centroids and params. Stored per version so a
    * time-traveled search dequantizes with the calibration its codes were
    * built under (mixing versions silently corrupts every distance). */
  def writeQuantCalibration(spark: SparkSession, indexDir: String,
                            emb: DataFrame,
                            version: Option[Long] = None): Long = {
    val v = version.orElse(versions(spark, indexDir).lastOption)
      .getOrElse(sys.error(s"no complete ANN index at $indexDir"))
    AnnOps.quantParams(emb)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/v=$v/quant")
    v
  }

  /** Stored ADC calibration of `version` (default: latest). */
  def quantCalibration(spark: SparkSession, indexDir: String,
                       version: Option[Long] = None): DataFrame = {
    val v = version.orElse(versions(spark, indexDir).lastOption)
      .getOrElse(sys.error(s"no complete ANN index at $indexDir"))
    spark.read.parquet(s"$indexDir/v=$v/quant")
  }

  /** ADC search against the STORED quantizer AND stored calibration:
    * identical results to [[AnnOps.ivfAdc]] with the same parameters —
    * the corpus is re-coded with the persisted per-dim lo/scale, so the
    * serving path needs no calibration scan. */
  def searchIvfAdc(spark: SparkSession, indexDir: String,
                   emb: DataFrame, queries: DataFrame,
                   k: Int, nProbes: Int, rerank: Int = 20,
                   version: Option[Long] = None): DataFrame = {
    val cal = quantCalibration(spark, indexDir, version)
      .agg(sort_array(collect_list(struct(col("dim"), col("lo"), col("scale"))))
        .as("qp"))
    val coded = emb.join(broadcast(cal))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("qp"), (x, p) =>
          when(p.getField("scale") === 0d, lit(0))
            .otherwise(round((x.cast("double") - p.getField("lo"))
              / p.getField("scale")).cast("int"))).as("codes"),
        col("qp"))
    AnnOps.ivfAdcWithArtifacts(emb, coded, queries,
      centroids(spark, indexDir, version), k, nProbes, rerank)
  }

  /** Commit the per-cell RESIDUAL calibration ([[AnnOps.residualQuantParams]]
    * against this version's stored centroids) — the fourth artifact slot,
    * for the IVF-PQ-shaped [[searchIvfAdcResidual]]. Per version for the
    * same reason as [[writeQuantCalibration]]: codes decode only under the
    * calibration (and centroids) they were built with. */
  def writeResidualCalibration(spark: SparkSession, indexDir: String,
                               emb: DataFrame,
                               version: Option[Long] = None): Long = {
    val v = version.orElse(versions(spark, indexDir).lastOption)
      .getOrElse(sys.error(s"no complete ANN index at $indexDir"))
    AnnOps.residualQuantParams(emb, centroids(spark, indexDir, Some(v)))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/v=$v/rquant")
    v
  }

  /** Stored residual calibration of `version` (default: latest). */
  def residualCalibration(spark: SparkSession, indexDir: String,
                          version: Option[Long] = None): DataFrame = {
    val v = version.orElse(versions(spark, indexDir).lastOption)
      .getOrElse(sys.error(s"no complete ANN index at $indexDir"))
    spark.read.parquet(s"$indexDir/v=$v/rquant")
  }

  /** Residual-ADC search against the STORED centroids and stored per-cell
    * calibration: identical results to [[AnnOps.ivfAdcResidual]] built on
    * the same centroids — the serving path re-codes the corpus under the
    * persisted calibration and never re-calibrates. */
  def searchIvfAdcResidual(spark: SparkSession, indexDir: String,
                           emb: DataFrame, queries: DataFrame,
                           k: Int, nProbes: Int, rerank: Int = 20,
                           version: Option[Long] = None): DataFrame =
    AnnOps.ivfAdcResidualWithArtifacts(emb, queries,
      centroids(spark, indexDir, version),
      residualCalibration(spark, indexDir, version), k, nProbes, rerank)

  private def params(spark: SparkSession, indexDir: String,
                     version: Option[Long]): org.apache.spark.sql.Row = {
    val v = version.orElse(versions(spark, indexDir).lastOption)
      .getOrElse(sys.error(s"no complete ANN index at $indexDir"))
    spark.read.parquet(s"$indexDir/v=$v/params").head()
  }

  /** IVF search against the STORED quantizer: identical results to
    * [[AnnOps.ivfKmeans]] with the same parameters, with zero training
    * work at query time. */
  def searchIvf(spark: SparkSession, indexDir: String,
                emb: DataFrame, queries: DataFrame,
                k: Int, nProbes: Int,
                version: Option[Long] = None): DataFrame =
    AnnOps.ivfWithCentroids(emb, queries, centroids(spark, indexDir, version),
      k, nProbes)

  /** LSH search with the STORED layout (tables/bits sized at build time),
    * so every caller probes the same buckets. */
  def searchLsh(spark: SparkSession, indexDir: String,
                emb: DataFrame, queries: DataFrame,
                k: Int, version: Option[Long] = None): DataFrame = {
    val p = params(spark, indexDir, version)
    AnnOps.lsh(emb, queries, k,
      dim = p.getAs[Int]("dim"),
      tables = p.getAs[Int]("tables"),
      bits = p.getAs[Int]("bits"))
  }
}
