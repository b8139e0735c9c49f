package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted equi-join for the case where one join key is
  * hot enough that a single shuffle partition would drown (AQE's skew-join
  * split handles sort-merge skew at runtime; salting is the explicit,
  * planner-independent fallback and also works for hash joins).
  *
  * The big (skewed) side gets a per-row salt in [0, buckets); the small
  * side is replicated `buckets` times. The join key becomes (key, salt),
  * spreading each hot key over `buckets` shuffle partitions. Correctness
  * is salt-independent (verified in SkewSpec against the plain join).
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0)
    // deterministic per-row salt: hash of the FULL row content, so a task
    // retry after a fetch failure re-salts every row identically (a salt
    // from monotonically_increasing_id or rand can move rows between
    // buckets across retries — the classic silent dup/loss hazard of
    // nondeterministic repartitioning). Fully identical rows share a salt;
    // they are indistinguishable anyway, and hot KEYS still spread because
    // their payloads differ.
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets.toLong)))
      .alias("__gbig")
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
      .alias("__gsmall")
    salted.join(replicated,
        col("__gbig.__salt") === col("__gsmall.__salt") &&
        col(s"__gbig.$bigKey") === col(s"__gsmall.$smallKey"))
      .drop("__salt")
  }

  /** Top-N heaviest keys of a column — the diagnostic used to decide
    * whether a join needs salting (one cheap aggregate pass). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).count()
      .orderBy(col("count").desc, col(key))
      .limit(topN)

  /** Stats-driven join: measure the big side's hottest key (the
    * [[keyHistogram]] probe, one map-combinable aggregate), salt only
    * when it exceeds `saltThreshold` rows, else plain equi-join — the
    * decision the engine should make so callers don't hand-tune.
    * Bucket count scales with how far past the threshold the hot key is
    * (capped at `maxBuckets` — the small side is replicated per bucket,
    * so buckets are not free). Returns the join plus which path ran and
    * the measured hot-key mass, so pipelines can log the decision. */
  def autoJoin(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String,
               saltThreshold: Long = 1000000L,
               maxBuckets: Int = 32): (DataFrame, Boolean, Long) = {
    require(saltThreshold > 0 && maxBuckets > 0)
    // coalesce: max over an EMPTY big side is null, not zero
    val hot = big.groupBy(col(bigKey)).count()
      .agg(coalesce(max(col("count")), lit(0L))).head().getLong(0)
    if (hot <= saltThreshold)
      (big.join(small, big(bigKey) === small(smallKey)), false, hot)
    else {
      val buckets = math.min(maxBuckets.toLong,
        (hot + saltThreshold - 1) / saltThreshold).toInt
      (saltedJoin(big, small, bigKey, smallKey, buckets), true, hot)
    }
  }
}
