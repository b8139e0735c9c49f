package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Lake

/** Shared text near-dup pairs artifact: the verified MinHash-LSH pair
  * frame (`doc_a`, `doc_b`, `jaccard`) of the raw document corpus,
  * materialized ONCE per (session, lake dir, threshold) and read back by
  * every consumer — the pair report, the connected-component clusters,
  * the leakage-safe split, and the sampled recall audit's found side.
  * The signature + banding + exact-verify pipeline is the family's
  * expensive piece; rebuilding it inline per query is the cost the
  * [[KnnGraphArtifact]] / [[BasketArtifact]] discipline exists to
  * remove. At 100 TB the verified pair frame is computed once per corpus
  * version and stored next to the lake; here it lands in an
  * app-id-keyed, threshold-keyed scratch sidecar, `_SUCCESS`-gated so a
  * crashed partial write is rebuilt, never trusted.
  *
  * NOTE: consumers that dedup a DERIVED corpus (e.g. cleanCorpus, which
  * near-dedups the exact-deduped subset) keep their inline pipeline —
  * pairs over a subset are not the raw-corpus pairs restricted. */
object NearDupArtifact {

  def sharedPairs(spark: SparkSession, lakeDir: String,
                  threshold: Double = 0.6): DataFrame = {
    val dir = sharedDir(spark, lakeDir, threshold)
    this.synchronized {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(p, "_SUCCESS")))
        DedupOps.nearDupPairs(Lake.documents(spark, lakeDir), threshold)
          .write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir)
  }

  private[graft] def sharedDir(spark: SparkSession, lakeDir: String,
                               threshold: Double): String = {
    val key = java.lang.Integer.toHexString(lakeDir.hashCode)
    val t = java.lang.Long.toHexString(
      java.lang.Double.doubleToLongBits(threshold))
    new Path(sys.props("java.io.tmpdir"),
      s"graft_neardup_${spark.sparkContext.applicationId}_${key}_$t").toString
  }
}
