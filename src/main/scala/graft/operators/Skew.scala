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
    // deterministic per-row salt: hash of the key and a disambiguator that
    // exists on every row (partition id ⊕ local row position via
    // monotonically_increasing_id is stable within one execution)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(bigKey), monotonically_increasing_id()), lit(buckets.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted("__salt") === replicated("__salt") &&
        big(bigKey) === small(smallKey))
      .drop("__salt")
  }

  /** Top-N heaviest keys of a column — the diagnostic used to decide
    * whether a join needs salting (one cheap aggregate pass). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).count()
      .orderBy(col("count").desc, col(key))
      .limit(topN)
}
