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
  * the graph family. At 100 TB the basket frame is built once per corpus
  * version next to the lake; here it lands in an app-id-keyed scratch
  * sidecar (no cross-JVM races on a shared machine), `_SUCCESS`-gated so
  * a crashed partial write is rebuilt, never trusted. JVM-synchronized:
  * sbt runs suites concurrently in one JVM, and two racing builders
  * would double-write the directory. */
object BasketArtifact {

  def sharedBaskets(spark: SparkSession, lakeDir: String): DataFrame = {
    val dir = sharedDir(spark, lakeDir)
    this.synchronized {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new Path(p, "_SUCCESS")))
        Lake.lineitem(spark, lakeDir)
          .groupBy(col("l_orderkey"))
          .agg(array_sort(collect_set(col("l_partkey"))).as("items"))
          .write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir)
  }

  private[graft] def sharedDir(spark: SparkSession, lakeDir: String): String = {
    val key = java.lang.Integer.toHexString(lakeDir.hashCode)
    new Path(sys.props("java.io.tmpdir"),
      s"graft_baskets_${spark.sparkContext.applicationId}_$key").toString
  }
}
