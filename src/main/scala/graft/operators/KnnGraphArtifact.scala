package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted kNN-graph artifact: the bucketed candidate PAIRS frame
  * (`vec_a < vec_b`, exact cosine) stored once and shared by every
  * graph-family consumer — kNN graph, triangle counting, link
  * prediction, hard-negative mining.
  *
  * The pairs frame is the right artifact, not the ranked graph: it is
  * the expensive piece (one corpus shuffle keyed by LSH bucket + exact
  * cosine over candidates), and it is the LOWEST shared form — the 5-NN
  * graph is a cheap bounded window over it, while hard negatives need
  * the label filter BEFORE ranking, so the ranked graph would be lossy
  * for them. Rebuilding these candidates inline per query tripled the
  * graph family's cost (three full builds per sweep); at 100 TB the
  * graph is built once per corpus version and every consumer reads the
  * sidecar.
  *
  * Layout mirrors [[AnnIndex]]: `<artifactDir>/v=N/pairs` parquet plus a
  * one-row `params` parquet, `_SUCCESS`-gated so a build that crashed
  * mid-write is redone, never trusted. Old versions stay readable for
  * reproducing past results; [[vacuum]] reclaims them.
  */
object KnnGraphArtifact {

  /** Complete (both artifacts committed) versions, ascending. */
  def versions(spark: SparkSession, artifactDir: String): Seq[Long] = {
    val p = new Path(artifactDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return Seq.empty
    f.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v="))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong)
      .filter(v => f.exists(new Path(p, s"v=$v/pairs/_SUCCESS")) &&
        f.exists(new Path(p, s"v=$v/params/_SUCCESS")))
      .toSeq.sorted
  }

  /** Materialize the bucketed candidate pairs of `emb` as the next
    * committed version. Definitionally identical to the inline
    * [[AnnOps.bucketedPairs]] under the same layout parameters, so every
    * consumer keeps its oracle. Returns the committed version. */
  def build(spark: SparkSession, artifactDir: String, emb: DataFrame,
            dim: Int = 64, tables: Int = AnnOps.DefaultTables,
            bits: Int = AnnOps.DefaultBitsPerTable,
            maxBucketSize: Int = 4096): Long = {
    import spark.implicits._
    val v = versions(spark, artifactDir).lastOption.map(_ + 1).getOrElse(0L)
    AnnOps.bucketedPairs(emb.select(col("vec_id"), col("embedding")),
        dim, tables, bits, maxBucketSize)
      .write.mode("overwrite").parquet(s"$artifactDir/v=$v/pairs")
    Seq((dim, tables, bits, maxBucketSize))
      .toDF("dim", "tables", "bits", "max_bucket_size")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$artifactDir/v=$v/params")
    v
  }

  /** Candidate pairs of the given (default: latest complete) version. */
  def pairs(spark: SparkSession, artifactDir: String,
            version: Option[Long] = None): DataFrame = {
    val v = version.orElse(versions(spark, artifactDir).lastOption)
      .getOrElse(throw new IllegalStateException(
        s"no complete kNN-graph artifact under $artifactDir"))
    spark.read.parquet(s"$artifactDir/v=$v/pairs")
  }

  /** Stored layout parameters of the given (default latest) version. */
  def params(spark: SparkSession, artifactDir: String,
             version: Option[Long] = None): DataFrame = {
    val v = version.orElse(versions(spark, artifactDir).lastOption)
      .getOrElse(throw new IllegalStateException(
        s"no complete kNN-graph artifact under $artifactDir"))
    spark.read.parquet(s"$artifactDir/v=$v/params")
  }

  /** Drop all but the newest `keepLast` complete versions. */
  def vacuum(spark: SparkSession, artifactDir: String,
             keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "must keep at least one version")
    val kept = versions(spark, artifactDir).takeRight(keepLast).toSet
    val p = new Path(artifactDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return Seq.empty
    val dropped = f.listStatus(p).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .filter { q =>
        val s = q.getName.stripPrefix("v=")
        // incomplete (crashed) builds are swept too
        !(s.nonEmpty && s.forall(_.isDigit) && kept(s.toLong))
      }
    dropped.foreach(f.delete(_, true))
    dropped.map(_.getName.stripPrefix("v="))
      .filter(s => s.nonEmpty && s.forall(_.isDigit)).map(_.toLong).sorted
  }

  /** Build-once-per-CORPUS-VERSION shared handle for the lake-bound
    * registered queries: resolved through the [[ArtifactStore]] slot
    * discipline — the newest committed version whose corpus fingerprint
    * (the embeddings table's file inventory) matches is read back; a
    * stale or absent artifact is rebuilt as the next version. With
    * `SPARK_GRAFT_ARTIFACT_ROOT` set, the sidecar outlives the JVM and
    * Verify / Bench / user sessions all reuse one build; unset, it
    * falls back to the app-scoped scratch (hermetic, read-only lakes
    * untouched). */
  def sharedPairs(spark: SparkSession, lakeDir: String): DataFrame = {
    val dir = ArtifactStore.familyDir(spark, lakeDir, "knn_pairs")
    val fp = ArtifactStore.corpusFingerprint(spark, lakeDir, Seq("embeddings"))
    val dataDir = ArtifactStore.resolve(spark, dir, fp) { out =>
      ArtifactStore.refreshSources(spark, lakeDir, Seq("embeddings"))
      AnnOps.bucketedPairs(
          graft.Lake.embeddings(spark, lakeDir)
            .select(col("vec_id"), col("embedding")),
          dim = 64, tables = AnnOps.DefaultTables,
          bits = AnnOps.DefaultBitsPerTable, maxBucketSize = 4096)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(dataDir)
  }

  /** The RANKED k-NN graph as its own shared artifact, derived from
    * [[sharedPairs]]. The scaladoc above argues pairs is the lowest
    * shared form — true, but "the 5-NN graph is a cheap bounded window
    * over it" was refuted by measurement (r15, sf1 ×10 lake): the
    * symmetrize + per-source top-k window over the pairs frame was ONE
    * ~10.7 s / 96.9 MB-shuffle job repeated IDENTICALLY by every
    * graph-family consumer (two-hop, label propagation, modularity,
    * clustering coefficient, link prediction, k-core, PageRank, HITS,
    * hubness, triangles, graph-ANN, label eval) — the family's
    * dominant cost at scale. So the ranked graph is materialized once
    * per (corpus fingerprint, k) and consumers read the bounded
    * k·N-edge list. Consumers that need the pre-ranking candidates
    * (hard negatives: label filter BEFORE ranking) keep reading
    * [[sharedPairs]]; `q_knn_graph` — whose declared RESULT is this
    * graph — keeps computing it from the pairs on every invocation. */
  def sharedGraph(spark: SparkSession, lakeDir: String,
                  k: Int = 5): DataFrame = {
    val dir = ArtifactStore.familyDir(spark, lakeDir, "knn_graph", s"k$k")
    val fp = ArtifactStore.corpusFingerprint(spark, lakeDir, Seq("embeddings"))
    val dataDir = ArtifactStore.resolve(spark, dir, fp) { out =>
      ArtifactStore.refreshSources(spark, lakeDir, Seq("embeddings"))
      AnnOps.knnFromPairs(sharedPairs(spark, lakeDir), k)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(dataDir)
  }
}
