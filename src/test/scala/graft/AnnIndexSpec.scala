package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, AnnOps}

/** Persisted ANN index artifacts: stored-quantizer search must equal the
  * inline-trained path, versions advance on refresh-with-change only, and
  * incomplete builds are never trusted. */
class AnnIndexSpec extends SparkSpecBase {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def queries(emb: org.apache.spark.sql.DataFrame, n: Int = 8) =
    emb.filter(col("vec_id") < n)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  test("stored-centroid IVF search equals inline k-means with zero retraining") {
    val emb = Lake.embeddings(spark, Sf)
    val dir = tmpDir("ann_index")
    val v = AnnIndex.build(spark, dir, emb, nCentroids = 8)
    assert(v == 0L)
    assert(AnnIndex.versions(spark, dir) == Seq(0L))

    val stored = AnnIndex.searchIvf(spark, dir, emb, queries(emb), k = 5, nProbes = 4)
      .collect().toSeq
    val inline = AnnOps.ivfKmeans(emb, queries(emb), k = 5,
      nCentroids = 8, nProbes = 4).collect().toSeq
    assert(stored == inline,
      "stored-quantizer search must reproduce the inline-trained results")

    // repeat searches against the artifact are identical (no retraining
    // drift between calls)
    val again = AnnIndex.searchIvf(spark, dir, emb, queries(emb), k = 5, nProbes = 4)
      .collect().toSeq
    assert(again == stored)
  }

  test("stored ADC calibration reproduces the inline ADC search with zero rescan") {
    val emb = Lake.embeddings(spark, Sf)
    val dir = tmpDir("ann_index_adc")
    AnnIndex.buildFromCentroids(spark, dir,
      AnnOps.strideCentroids(emb, 16), emb.count())
    AnnIndex.writeQuantCalibration(spark, dir, emb)
    // the calibration artifact holds one row per dimension
    assert(AnnIndex.quantCalibration(spark, dir).count() == 64)
    val stored = AnnIndex.searchIvfAdc(spark, dir, emb, queries(emb),
      k = 5, nProbes = 6).collect().toSeq
    val inline = AnnOps.ivfAdc(emb, queries(emb), k = 5,
      nCentroids = 16, nProbes = 6, rerank = 20).collect().toSeq
    assert(stored == inline,
      "stored-calibration ADC search must reproduce the inline path")
  }

  test("stored residual calibration reproduces the inline residual-ADC search") {
    val emb = Lake.embeddings(spark, Sf)
    val dir = tmpDir("ann_index_rq")
    AnnIndex.buildFromCentroids(spark, dir,
      AnnOps.strideCentroids(emb, 16), emb.count())
    AnnIndex.writeResidualCalibration(spark, dir, emb)
    // one row per (cell, dim); every corpus vector's cell is calibrated
    assert(AnnIndex.residualCalibration(spark, dir).count() % 64 == 0)
    assert(AnnIndex.residualCalibration(spark, dir).count() > 0)
    val stored = AnnIndex.searchIvfAdcResidual(spark, dir, emb, queries(emb),
      k = 5, nProbes = 6).collect().toSeq
    val inline = AnnOps.ivfAdcResidual(emb, queries(emb), k = 5,
      nCentroids = 16, nProbes = 6, rerank = 20).collect().toSeq
    assert(stored == inline,
      "stored residual calibration must reproduce the inline IVF-PQ path")
  }

  test("stored LSH layout reproduces the parameterized search") {
    val emb = Lake.embeddings(spark, Sf)
    val dir = tmpDir("ann_index_lsh")
    AnnIndex.build(spark, dir, emb)
    val bits = AnnOps.bitsForCorpus(emb.count())
    val stored = AnnIndex.searchLsh(spark, dir, emb, queries(emb), k = 5)
      .collect().toSeq
    val direct = AnnOps.lsh(emb, queries(emb), k = 5, dim = 64,
      tables = AnnOps.DefaultTables, bits = bits).collect().toSeq
    assert(stored == direct)
  }

  test("refresh is a no-op on unchanged data and re-versions on change") {
    val emb = Lake.embeddings(spark, Sf)
    val dir = tmpDir("ann_index_refresh")
    assert(AnnIndex.refresh(spark, dir, emb).contains(0L), "first refresh builds v0")
    assert(AnnIndex.refresh(spark, dir, emb).isEmpty, "unchanged corpus → no rebuild")
    val grown = emb.union(emb.limit(3)
      .withColumn("vec_id", col("vec_id") + 1000000L))
    assert(AnnIndex.refresh(spark, dir, grown).contains(1L), "grown corpus → v1")
    assert(AnnIndex.versions(spark, dir) == Seq(0L, 1L))
    // old version stays readable for reproducing past results
    assert(AnnIndex.centroids(spark, dir, Some(0L)).count() == 16L)
  }

  test("version-keyed refresh catches in-place updates a row count misses") {
    val emb = Lake.embeddings(spark, Sf)
    val dir = tmpDir("ann_index_src_version")
    assert(AnnIndex.refresh(spark, dir, emb, sourceVersion = Some(3L))
      .contains(0L), "first refresh builds v0 stamped with source v3")
    assert(AnnIndex.refresh(spark, dir, emb, sourceVersion = Some(3L)).isEmpty,
      "same source version → current")
    // vectors replaced IN PLACE: same count, new source version — the
    // count probe would wrongly report current, the version probe must not
    val replaced = emb.withColumn("embedding",
      transform(col("embedding"), x => -x))
    assert(replaced.count() == emb.count())
    assert(AnnIndex.refresh(spark, dir, replaced, sourceVersion = Some(4L))
      .contains(1L), "new source version → rebuild even at equal count")
    // callers without a version signal still get the count fallback
    assert(AnnIndex.refresh(spark, dir, replaced).isEmpty,
      "no version signal + equal count → count fallback reports current")
  }

  test("vacuum keeps the newest versions and reclaims the rest") {
    val emb = Lake.embeddings(spark, Sf)
    val dir = tmpDir("ann_index_vacuum")
    AnnIndex.build(spark, dir, emb, nCentroids = 4)
    AnnIndex.build(spark, dir, emb, nCentroids = 4)
    AnnIndex.build(spark, dir, emb, nCentroids = 4)
    assert(AnnIndex.versions(spark, dir) == Seq(0L, 1L, 2L))
    assert(AnnIndex.vacuum(spark, dir, keepLast = 2) == Seq(0L))
    assert(AnnIndex.versions(spark, dir) == Seq(1L, 2L))
    // kept versions still serve searches
    assert(AnnIndex.searchIvf(spark, dir, emb, queries(emb), k = 3, nProbes = 2)
      .count() > 0)
  }

  test("an incomplete build (missing _SUCCESS) is not a usable version") {
    val emb = Lake.embeddings(spark, Sf)
    val dir = tmpDir("ann_index_crash")
    AnnIndex.build(spark, dir, emb)
    // simulate a crashed build of v1: centroids written, params missing
    AnnIndex.centroids(spark, dir).write.parquet(s"$dir/v=1/centroids")
    assert(AnnIndex.versions(spark, dir) == Seq(0L),
      "half-written version must not be listed")
    // latest-complete resolution still serves v0
    assert(AnnIndex.searchIvf(spark, dir, emb, queries(emb), k = 3, nProbes = 2)
      .count() > 0)
  }
}
