package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession builder for the graft engine: the settings
  * every deployment should start from, sized by an explicit parallelism
  * hint instead of Spark's legacy defaults.
  *
  *  - shuffle partitions ≈ 2× total cores (AQE coalesces down at runtime;
  *    the legacy fixed 200 is wrong in both directions at most scales)
  *  - AQE on with skew-join splitting (fact⨝fact skew handled at runtime)
  *  - broadcast threshold left at default 10 MB — dimension tables
  *    broadcast, fact tables never accidentally do
  *  - UTC session timezone (lake timestamps are zone-less instants)
  *  - graft's SQL functions registered on create
  */
object GraftSession {

  /** Production streaming state-store provider: RocksDB keeps per-key
    * streaming state (session maps, dedup hash sets) on local disk instead
    * of the executor heap — the difference between "exact dedup-forever"
    * being a guarantee and being an OOM. Changelog checkpointing uploads
    * only per-batch deltas, not full snapshots. */
  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def builder(appName: String = "graft",
              master: Option[String] = None,
              cores: Int = Runtime.getRuntime.availableProcessors(),
              rocksDbStreamingState: Boolean = false): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", math.max(2 * cores, 4).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val withState = if (rocksDbStreamingState)
      b.config("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    else b
    master.fold(withState)(withState.master)
  }

  /** Build (or reuse) the session and register graft's SQL functions. */
  def create(appName: String = "graft",
             master: Option[String] = None,
             cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = builder(appName, master, cores).getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
