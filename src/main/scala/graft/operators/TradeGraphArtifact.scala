package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared trade-graph artifact: the degree-attached customer↔supplier
  * edge frame ([[GraphOps.tradeEdgesWithDeg]]) materialized ONCE per
  * (session, lake dir). The edge build (fact⋈fact join + distinct + two
  * degree windows) is the dominant cost of every iterative consumer —
  * profiled at ~3 s of PageRank's ~4.5 s — while the iterations
  * themselves are cheap joins over this frame. At 100 TB the graph is
  * extracted once per corpus version and every analysis reads it — the
  * shared [[ArtifactStore]] versioned slot discipline, keyed by the
  * (lineitem, orders) corpus fingerprint. */
object TradeGraphArtifact {

  def sharedEdges(spark: SparkSession, lakeDir: String): DataFrame = {
    val dir = ArtifactStore.familyDir(spark, lakeDir, "trade")
    val fp = ArtifactStore.corpusFingerprint(spark, lakeDir,
      Seq("lineitem", "orders"))
    val dataDir = ArtifactStore.resolve(spark, dir, fp) { out =>
      ArtifactStore.refreshSources(spark, lakeDir, Seq("lineitem", "orders"))
      GraphOps.tradeEdgesWithDeg(spark, lakeDir)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(dataDir)
  }
}
