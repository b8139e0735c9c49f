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
  * remove. Served through the [[ArtifactStore]] versioned slot
  * discipline (threshold-keyed family dir): built once per corpus
  * fingerprint, cross-JVM reusable under a persistent artifact root,
  * staleness-probed on every resolve.
  *
  * NOTE: consumers that dedup a DERIVED corpus (e.g. cleanCorpus, which
  * near-dedups the exact-deduped subset) keep their inline pipeline —
  * pairs over a subset are not the raw-corpus pairs restricted. */
object NearDupArtifact {

  def sharedPairs(spark: SparkSession, lakeDir: String,
                  threshold: Double = 0.6): DataFrame = {
    val t = java.lang.Long.toHexString(
      java.lang.Double.doubleToLongBits(threshold))
    val dir = ArtifactStore.familyDir(spark, lakeDir, "neardup", t)
    val fp = ArtifactStore.corpusFingerprint(spark, lakeDir, Seq("documents"))
    val dataDir = ArtifactStore.resolve(spark, dir, fp) { out =>
      ArtifactStore.refreshSources(spark, lakeDir, Seq("documents"))
      DedupOps.nearDupPairs(Lake.documents(spark, lakeDir), threshold)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(dataDir)
  }
}
