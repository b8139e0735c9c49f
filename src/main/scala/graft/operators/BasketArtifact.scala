package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Lake

/** Shared market-basket artifact: the per-order item-set frame
  * (`l_orderkey`, sorted distinct `items`) materialized ONCE per
  * (session, lake dir) and read back by every basket consumer —
  * co-purchase counts, item–item cosine, association rules. The basket
  * build is the family's expensive piece (a fact-table shuffle keyed by
  * order); rebuilding it inline per query tripled the family's cost in
  * the sweep, exactly the pattern the [[KnnGraphArtifact]] closed for
  * the graph family. Served through the [[ArtifactStore]] versioned
  * slot discipline: built once per corpus FINGERPRINT, reusable across
  * JVMs when `SPARK_GRAFT_ARTIFACT_ROOT` names a persistent sidecar
  * root, staleness-probed on every resolve. */
object BasketArtifact {

  def sharedBaskets(spark: SparkSession, lakeDir: String): DataFrame = {
    val dir = ArtifactStore.familyDir(spark, lakeDir, "baskets")
    val fp = ArtifactStore.corpusFingerprint(spark, lakeDir, Seq("lineitem"))
    val dataDir = ArtifactStore.resolve(spark, dir, fp) { out =>
      ArtifactStore.refreshSources(spark, lakeDir, Seq("lineitem"))
      Lake.lineitem(spark, lakeDir)
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("l_partkey"))).as("items"))
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(dataDir)
  }
}
