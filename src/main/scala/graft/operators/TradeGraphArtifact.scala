package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared trade-graph artifact: the degree-attached customer↔supplier
  * edge frame ([[GraphOps.tradeEdgesWithDeg]]) materialized ONCE per
  * (session, lake dir). The edge build (fact⋈fact join + distinct + two
  * degree windows) is the dominant cost of every iterative consumer —
  * profiled at ~3 s of PageRank's ~4.5 s — while the iterations
  * themselves are cheap joins over this frame. At 100 TB the graph is
  * extracted once per corpus version and every analysis reads it; the
  * same `_SUCCESS`-gated app-id-keyed scratch discipline as
  * [[KnnGraphArtifact]] / [[BasketArtifact]] / [[NearDupArtifact]]. */
object TradeGraphArtifact {

  def sharedEdges(spark: SparkSession, lakeDir: String): DataFrame = {
    val dir = sharedDir(spark, lakeDir)
    this.synchronized {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(p, "_SUCCESS")))
        GraphOps.tradeEdgesWithDeg(spark, lakeDir)
          .write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir)
  }

  private[graft] def sharedDir(spark: SparkSession, lakeDir: String): String = {
    val key = java.lang.Integer.toHexString(lakeDir.hashCode)
    new Path(sys.props("java.io.tmpdir"),
      s"graft_trade_${spark.sparkContext.applicationId}_$key").toString
  }
}
