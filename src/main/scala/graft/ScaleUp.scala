package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic lake scale-up: replicate every table of a source lake
  * `factor`× with FK-consistent key shifting, producing a larger lake
  * for overflow/stress sweeps (the int64-crossing class has fired at
  * EVERY scale-factor increase so far — q_cox's information sum only
  * crossed int64 at sf0.1; the next crossings wait above it, and the
  * provided testdata stops at sf0.1).
  *
  * Replica r (0 ≤ r < factor) shifts each entity key by
  * r × (max(key)+1) and every FK by the SAME base of the referenced
  * entity, so joins, join cardinalities per key, and group sizes scale
  * exactly ×factor while distributions are preserved. Dimension-like
  * tables (region, nation) are copied unchanged — the TPC-H convention
  * (nation count is fixed at every SF). Timestamps are kept, so daily
  * series keep their span and per-day masses scale ×factor.
  *
  * Embeddings get dimension-0 nudged by r·0.001 per replica: an exact
  * 10-way duplication of every vector would turn each LSH bucket into a
  * clone clique and measure candidate-pair blowup instead of scale; the
  * nudge keeps geometry (norms shift < 0.1 %) while breaking exact
  * duplication. Documents keep their text verbatim — the near-dup
  * family then sees genuine ×factor duplication mass, which is exactly
  * the stress a dedup pipeline meets on real crawl snapshots.
  *
  * One distributed pass per table (input ⨯ broadcast(factor-row replica
  * frame)); no driver loops, no unions. Usage:
  * `runMain graft.ScaleUp [srcDir] [dstDir] [factor]`. */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession
      .builder("graft-scaleup", Some(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, factor)
    spark.stop()
  }

  /** max(key)+1 — the per-replica shift base for one entity. The read is
    * defensive: an empty source table yields a NULL max and a non-bigint
    * key would ClassCastException — both would otherwise surface as
    * opaque errors mid-scale-up, so cast in the aggregate and fail with
    * the key's name instead. */
  private def base(df: DataFrame, key: String): Long =
    Option(df.agg(max(col(key).cast("long"))).head.getAs[java.lang.Long](0))
      .map(_.longValue + 1L)
      .getOrElse(throw new IllegalArgumentException(
        s"cannot derive a shift base for '$key': source table is empty " +
          "(or the key column is all NULL)"))

  def scale(spark: SparkSession, src: String, dst: String,
            factor: Int): Unit = {
    require(factor >= 1, "factor must be >= 1")
    def in(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def out(df: DataFrame, t: String, files: Int): Unit =
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    val reps = broadcast(spark.range(factor).toDF("__r"))
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val crossed = df.crossJoin(reps)
      val shifted = shifts.foldLeft(crossed) { case (d, (c, b)) =>
        d.withColumn(c, col(c) + col("__r") * lit(b))
      }
      shifted.drop("__r")
    }

    // dimensions: fixed at every SF
    out(in("region"), "region", 1)
    out(in("nation"), "nation", 1)

    val custB = base(in("customer"), "c_custkey")
    val suppB = base(in("supplier"), "s_suppkey")
    val partB = base(in("part"), "p_partkey")
    val ordB = base(in("orders"), "o_orderkey")
    val evB = base(in("events"), "event_id")
    val userB = base(in("events"), "user_id")
    val docB = base(in("documents"), "doc_id")
    val vecB = base(in("embeddings"), "vec_id")

    out(replicate(in("customer"), "c_custkey" -> custB), "customer", 4)
    out(replicate(in("supplier"), "s_suppkey" -> suppB), "supplier", 1)
    out(replicate(in("part"), "p_partkey" -> partB), "part", 4)
    out(replicate(in("orders"),
      "o_orderkey" -> ordB, "o_custkey" -> custB), "orders", 8)
    out(replicate(in("lineitem"),
      "l_orderkey" -> ordB, "l_partkey" -> partB, "l_suppkey" -> suppB),
      "lineitem", 16)
    out(replicate(in("events"),
      "event_id" -> evB, "user_id" -> userB), "events", 8)
    out(replicate(in("documents"), "doc_id" -> docB), "documents", 4)
    val emb = in("embeddings").crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("__r") * lit(vecB))
      .withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(i === 0 && col("__r") =!= 0L,
            x + col("__r").cast("float") * lit(0.001f)).otherwise(x)))
      .drop("__r")
    out(emb, "embeddings", 2)
  }
}
