package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism repair for per-row-HEAVY pipelines whose input arrives in
  * fewer partitions than the session has cores.
  *
  * Why this exists (measured, r14 optimization round): a parquet table
  * written as one file with one row group scans as ONE task no matter
  * what `spark.sql.files.maxPartitionBytes` says (row groups are the
  * split floor), so every expensive map-side pass that follows — pair
  * explodes, n-gram shingling, O(d²) Gram terms, decimal partial
  * aggregation — runs on one core of the whole machine. `q_pca_top`'s
  * Gram pass was a single 3.9 s task at local[32]; fanned out it is
  * 32 × ~0.1 s.
  *
  * [[fanOut]] is a conditional, SCALE-ADAPTIVE redistribute: it adds a
  * round-robin exchange of the (narrow, pre-explosion) input ONLY when
  * the planned partition count is below the session's default
  * parallelism. At production scale a fact scan carries hundreds of
  * partitions, the condition is false, and the call is identity — no
  * exchange, no plan change. The partition probe is planning-time only
  * (no job runs).
  *
  * Use it between the cheap row-level projection and the expensive
  * fan-out/aggregate, never on a payload-heavy frame (the exchange
  * copies every byte it moves — project first, guide §2.3).
  */
object Par {

  /** Target parallelism: every core of the session. */
  private def want(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Planned partition count of the frame — physical planning only,
    * nothing executes. */
  private def planned(df: DataFrame): Int =
    df.queryExecution.toRdd.getNumPartitions

  /** Redistribute `df` to core parallelism IF it is planned narrower;
    * identity otherwise. Round-robin (no key) keeps every partition
    * balanced regardless of key skew; Spark's sort-before-repartition
    * (on by default) makes the row→partition assignment deterministic
    * under task retry. */
  def fanOut(df: DataFrame): DataFrame = {
    val w = want(df)
    if (planned(df) >= w) df else df.repartition(w)
  }

  /** Keyed variant for pipelines whose next stage aggregates or joins by
    * `key`: the exchange doubles as the stage's required distribution,
    * so a following groupBy on the same key reuses it (guide §2.4) and
    * the shuffle is not paid twice. Prefer [[fanOut]] when the key is
    * low-cardinality or skewed. */
  def fanOutBy(df: DataFrame, key: Column*): DataFrame = {
    val w = want(df)
    if (planned(df) >= w) df else df.repartition(w, key: _*)
  }
}
