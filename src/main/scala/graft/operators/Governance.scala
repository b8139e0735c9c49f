package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Lake

/** Data-governance surface: deterministic pseudonymization of identifier
  * columns — the GDPR-style "keyed tokenization" a lake applies before
  * data leaves a trust boundary. (Deletion lives in SnapshotTable.delete;
  * free-text scrubbing in TextOps.redact.)
  *
  * Pseudonyms are `sha256(salt ‖ value)`: deterministic (the same value
  * maps to the same token everywhere, so joins and group-bys still work
  * across pseudonymized tables sharing a salt) and one-way (recovery
  * requires the salt and a dictionary attack). Pure codegen'd map stage —
  * no shuffle, no UDF; at 100 TB this rides the scan.
  */
object Governance {

  /** `sha256(salt ‖ value)` as lowercase hex; NULL stays NULL (a
    * pseudonym for "unknown" would silently merge all unknowns). */
  def pseudonym(c: Column, salt: String): Column =
    when(c.isNotNull, sha2(concat(lit(salt), c.cast("string")), 256))

  /** Replace each listed column with its pseudonym, preserving schema
    * positions and all other columns. */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "need at least one column to pseudonymize")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"no such columns: $bad")
    cols.foldLeft(df)((d, c) => d.withColumn(c, pseudonym(col(c), salt)))
  }

  /** Driver query: customer with name and phone-analog (acctbal) intact
    * but c_name pseudonymized under a fixed salt — joinability preserved
    * (distinct count unchanged), raw names gone. */
  def pseudonymizeQuery(spark: SparkSession, dir: String): DataFrame =
    pseudonymize(Lake.customer(spark, dir), Seq("c_name"), salt = "graft-salt")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** k-anonymity audit over a quasi-identifier column set: the release
    * gate a governance pipeline runs before data leaves the boundary —
    * every combination of quasi-identifiers must describe at least `k`
    * rows, or those rows re-identify individuals. One group-by to the
    * quasi-identifier cardinality (map-side partial agg), one tiny
    * re-aggregate; reports the floor, the violating-group count, and the
    * at-risk row mass so the caller knows whether to generalize columns
    * or suppress rows. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty && k > 1, "need quasi-identifier columns and k > 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .agg(
        lit(k.toLong).as("k"),
        count(lit(1)).as("n_groups"),
        min(col("n")).as("min_group_size"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_risky_rows"),
        (min(col("n")) >= k).as("is_k_anonymous"))
  }

  /** Driver query: is (nation, segment) 10-anonymous over customers? */
  def kAnonymityQuery(spark: SparkSession, dir: String): DataFrame =
    kAnonymity(Lake.customer(spark, dir),
      Seq("c_nationkey", "c_mktsegment"), k = 10)

  /** l-diversity audit — k-anonymity's complement: a group can be large
    * (k-anonymous) yet still leak if every member SHARES the sensitive
    * value (the homogeneity attack). Each quasi-identifier group must
    * contain at least `l` DISTINCT sensitive values. Same two-aggregate
    * shape as [[kAnonymity]]: group-by to per-group distinct-sensitive
    * cardinality, then one tiny re-aggregate reporting the floor, the
    * violating groups, and the row mass at risk. */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame = {
    require(quasiCols.nonEmpty && l > 1, "need quasi-identifier columns and l > 1")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("nd"))
      .agg(
        lit(l.toLong).as("l"),
        count(lit(1)).as("n_groups"),
        min(col("nd")).as("min_diversity"),
        sum(when(col("nd") < l, 1L).otherwise(0L)).as("n_violating_groups"),
        sum(when(col("nd") < l, col("n")).otherwise(0L)).as("n_risky_rows"),
        (min(col("nd")) >= l).as("is_l_diverse"))
  }

  /** Driver query: does every (status, priority) order group span at
    * least 10 distinct customers, or would a release pinpoint buyers? */
  def lDiversityQuery(spark: SparkSession, dir: String): DataFrame =
    lDiversity(Lake.orders(spark, dir),
      Seq("o_orderstatus", "o_orderpriority"), "o_custkey", l = 10)
}
