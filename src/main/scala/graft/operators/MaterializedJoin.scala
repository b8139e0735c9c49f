package graft.operators

import org.apache.spark.sql.DataFrame

/** Algebraic incremental maintenance of an equi-JOIN view — the join
  * companion of [[MaterializedAgg]]: keep `A ⋈ B` materialized under
  * APPEND-ONLY commits to either side without ever re-executing the full
  * join.
  *
  * Insert-only delta rule, in its two-join form:
  * {{{
  *   ΔV = (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB)        // B_new = B_old ∪ ΔB
  *   V_new = V ∪ ΔV
  * }}}
  * (The textbook three-term ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB collapses to
  * this because ΔA⋈B_new = ΔA⋈B_old ∪ ΔA⋈ΔB.)
  *
  * Cost honesty: the deltas are commit-sized, so both joins broadcast
  * the delta side and push its key set toward the base scan — refresh
  * cost is Δ × matching base rows (key-filtered reads), never the
  * |A ⋈ B| recompute. Fan-out is preserved exactly: duplicate join keys
  * on either side multiply in the delta joins just as they do in the
  * full join (property-checked on generated tables).
  *
  * Deliberately INSERT-ONLY: under deletes/updates a join view needs the
  * counting algorithm (per-row multiplicities) to know when a derived
  * row disappears; append-only fact tables — the overwhelmingly common
  * lake case — never need it. Deletes route to the snapshot
  * change-data-feed + recompute path instead. */
object MaterializedJoin {

  /** The view definition: plain equi join on `key`. */
  def define(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.join(b, Seq(key))

  /** Fold append-only commits into the stored view. `aOld` is A BEFORE
    * this commit, `bNew` is B AFTER it (asymmetry per the delta rule
    * above); `deltaA` / `deltaB` are the appended rows (either may be
    * empty). */
  def refresh(view: DataFrame, aOld: DataFrame, deltaA: DataFrame,
              bNew: DataFrame, deltaB: DataFrame, key: String): DataFrame =
    view
      .unionByName(define(deltaA, bNew, key))
      .unionByName(define(aOld, deltaB, key))

  /** Driver query: the orders ⋈ customer view maintained through one
    * append to EACH side, then aggregated to a bounded per-segment
    * report. The oracle recomputes the final join from scratch — the
    * hash match IS the refresh ≡ recompute theorem on lake data (the
    * ScalaCheck property proves it on generated shapes). */
  def joinRefreshQuery(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    val orders = graft.Lake.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val cust = graft.Lake.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val aOld = orders.filter(pmod(col("o_orderkey"), lit(10)) < 7)
    val dA = orders.filter(pmod(col("o_orderkey"), lit(10)).isin(7, 8))
    val bOld = cust.filter(pmod(col("o_custkey"), lit(5)) =!= 0)
    val dB = cust.filter(pmod(col("o_custkey"), lit(5)) === 0)
    refresh(define(aOld, bOld, "o_custkey"), aOld, dA,
        bOld.unionByName(dB), dB, "o_custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double"), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }
}
