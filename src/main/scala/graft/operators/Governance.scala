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

  /** t-closeness audit — the distribution-distance completion of the
    * [[kAnonymity]]/[[lDiversity]] pair: a group can be large AND diverse
    * yet still leak when its sensitive-value DISTRIBUTION deviates from
    * the table's (a group that is 90% one diagnosis reveals plenty even
    * with l distinct values present). Each quasi-identifier group's
    * sensitive distribution must sit within total-variation distance `t`
    * of the global distribution (TVD = ½·Σ|p_g(v) − p(v)| — the standard
    * categorical t-closeness metric; the skew analogue of the PSI drift
    * monitor, with the same per-group-vs-global shape).
    *
    * Determinism: TVD numerators stay in EXACT integer space
    * (Σ|n_gv·n − n_v·n_g|, decimal-summed) — one final double division
    * per group, identical in any engine. Null sensitive values are
    * excluded from both distributions. Report is O(groups); the grid
    * stage is O(groups × sensitive-NDV), both bounded by nature. */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double): DataFrame = {
    require(quasiCols.nonEmpty && t > 0 && t < 1,
      "need quasi-identifier columns and 0 < t < 1")
    import org.apache.spark.sql.types.DecimalType
    val base = df.filter(col(sensitiveCol).isNotNull)
    val gv = base.groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("n_gv"))
      .withColumnRenamed(sensitiveCol, "__v")
    val g = gv.groupBy(quasiCols.map(col): _*).agg(sum(col("n_gv")).as("n_g"))
    val vals = base.groupBy(col(sensitiveCol).as("__v"))
      .agg(count(lit(1)).as("n_v"))
    val total = base.agg(count(lit(1)).as("n_total"))
    // groups × the full sensitive-value universe (a value ABSENT from a
    // group still contributes |0 − p(v)| — that absence IS the skew)
    val grid = g.crossJoin(broadcast(vals))
    val full = grid.join(gv, quasiCols :+ "__v", "left")
      .withColumn("n_gv", coalesce(col("n_gv"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("num", abs(
        col("n_gv").cast(DecimalType(38, 0)) * col("n_total") -
          col("n_v").cast(DecimalType(38, 0)) * col("n_g")))
    val tvd = full
      .groupBy((quasiCols.map(col) :+ col("n_g") :+ col("n_total")): _*)
      .agg(sum(col("num")).as("num_sum"))
      .withColumn("tvd", col("num_sum").cast("double") /
        (lit(2.0) * col("n_g").cast("double") * col("n_total").cast("double")))
    tvd.agg(
      lit(t).as("t"),
      count(lit(1)).as("n_groups"),
      round(max(col("tvd")), 6).as("max_tvd"),
      sum(when(col("tvd") > t, 1L).otherwise(0L)).as("n_violating_groups"),
      sum(when(col("tvd") > t, col("n_g")).otherwise(0L)).as("n_risky_rows"),
      (max(col("tvd")) <= t).as("is_t_close"))
  }

  /** Driver query: is each nation's market-segment mix within TVD 0.05 of
    * the global mix, or does nationality predict segment? */
  def tClosenessQuery(spark: SparkSession, dir: String): DataFrame =
    tCloseness(Lake.customer(spark, dir),
      Seq("c_nationkey"), "c_mktsegment", t = 0.05)

  /** Differentially-private-style noisy count release: each group count is
    * published with Laplace(1/eps) noise — the ε-DP mechanism for counting
    * queries — so a release reveals aggregate shape, not exact membership
    * (an adversary diffing two releases cannot pin a single row's
    * presence). The draw is a DETERMINISTIC per-(salt, group) inverse-CDF
    * transform of the portable 60-bit hash: u = h/2⁶⁰ − ½ ∈ [−½, ½), noise
    * = −(1/ε)·sign(u)·ln(1 − 2|u|) — exactly Laplace-distributed over the
    * hash's uniformity, reproducible in any engine (the q_split_counts
    * portability argument), and retry-stable. Formal DP additionally needs
    * the salt kept secret and rotated per release — with a public salt
    * this is reproducible noise, not a privacy proof; the trade is
    * documented, not hidden. One group-by (map-side combinable) + a
    * per-group map stage; output is O(groups). */
  def dpCounts(df: DataFrame, groupCols: Seq[String], eps: Double,
               salt: String = "graft-dp"): DataFrame = {
    require(groupCols.nonEmpty && eps > 0, "need group columns and eps > 0")
    val key = concat_ws("|",
      (lit(salt) +: groupCols.map(c => col(c).cast("string"))): _*)
    val u = TextOps.portableHash60(key).cast("double") /
      lit((1L << 60).toDouble) - lit(0.5)
    // 1 − 2|u| can reach 0 only at the single hash value 0; the clamp
    // keeps ln() finite and is identical in both engines
    val noise = -(lit(1.0) / eps) * signum(u) *
      log(greatest(lit(1e-15), lit(1.0) - lit(2.0) * abs(u)))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select((groupCols.map(col) :+
        round(col("__n") + noise, 4).as("noisy_n") :+
        lit(eps).as("eps")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Driver query: order counts per priority released under ε = 1. */
  def dpCountsQuery(spark: SparkSession, dir: String): DataFrame =
    dpCounts(Lake.orders(spark, dir), Seq("o_orderpriority"), eps = 1.0)

  /** DP noisy SUM release — the aggregate companion of [[dpCounts]]:
    * per-group sum of `valueCol` CLIPPED to [0, clip], plus
    * Laplace(clip/ε) noise from the same deterministic inverse-CDF
    * transform of the portable hash (salt rotation = a fresh draw).
    * PRIVACY ACCOUNTING: the ε guarantee is PER SALT. Noise is a pure
    * function of (salt, group key), so re-releasing under the same salt
    * is free (byte-identical, no new information), but each DISTINCT
    * salt released is an independent draw and privacy loss composes:
    * k rotated salts published together cost k·ε total (an analyst can
    * average them and shrink the noise √k-fold). Budget accordingly —
    * rotate salts to re-randomize, not to re-publish. Same caveat
    * applies to [[dpCounts]].
    * Clipping is what makes the release ε-DP — one row moves the sum by
    * at most `clip`, so clip/ε noise suffices at any group size. The
    * clipped values route through decimal(18,2) before summing (money
    * semantics), so the released base sum is aggregation-order-exact and
    * engine-identical; only then does the one noise term land. */
  def dpSums(df: DataFrame, groupCols: Seq[String], valueCol: String,
             clip: Double, eps: Double,
             salt: String = "graft-dp-sum"): DataFrame = {
    require(groupCols.nonEmpty && eps > 0 && clip > 0,
      "need group columns, eps > 0, clip > 0")
    val key = concat_ws("|",
      (lit(salt) +: groupCols.map(c => col(c).cast("string"))): _*)
    val u = TextOps.portableHash60(key).cast("double") /
      lit((1L << 60).toDouble) - lit(0.5)
    val noise = -(lit(clip) / eps) * signum(u) *
      log(greatest(lit(1e-15), lit(1.0) - lit(2.0) * abs(u)))
    val clipped = least(lit(clip), greatest(lit(0.0), col(valueCol)))
    df.groupBy(groupCols.map(col): _*)
      .agg(sum(clipped.cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("__s"))
      .select((groupCols.map(col) :+
        round(col("__s") + noise, 4).as("noisy_sum") :+
        lit(eps).as("eps") :+ lit(clip).as("clip")): _*)
      .orderBy(groupCols.map(col): _*)
  }

  /** Driver query: order-value totals per priority, clip 50k, ε = 1. */
  def dpSumsQuery(spark: SparkSession, dir: String): DataFrame =
    dpSums(Lake.orders(spark, dir), Seq("o_orderpriority"), "o_totalprice",
      clip = 50000.0, eps = 1.0)

  /** Partial masking: every character except the last `keep` becomes '*'
    * — the display-safe form of an identifier (receipts, support tools)
    * where [[pseudonym]] would destroy human recognizability. Values at
    * or under `keep` chars pass through unchanged (there is nothing left
    * to hide that the length doesn't already reveal); NULL stays NULL.
    * Pure codegen'd string expression, rides the scan. */
  def maskColumn(c: Column, keep: Int): Column = {
    require(keep >= 0, "keep must be non-negative")
    when(c.isNotNull,
      when(length(c) <= keep, c)
        .otherwise(concat(
          repeat(lit("*"), (length(c) - keep).cast("int")),
          c.substr(length(c) - keep + 1, lit(keep)))))
  }

  /** Replace each listed column with its masked form. */
  def mask(df: DataFrame, cols: Seq[String], keep: Int = 4): DataFrame = {
    require(cols.nonEmpty, "need at least one column to mask")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"no such columns: $bad")
    cols.foldLeft(df)((d, c) => d.withColumn(c, maskColumn(col(c), keep)))
  }

  /** Driver query: customer names masked to their last 4 characters. */
  def maskQuery(spark: SparkSession, dir: String): DataFrame =
    mask(Lake.customer(spark, dir), Seq("c_name"), keep = 4)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** Reversible field-level encryption (AES-128/192/256 via Spark's
    * builtin aes_encrypt): the third leg of the column-protection surface
    * — [[pseudonymize]] is one-way, [[mask]] is display-only, this one
    * round-trips for holders of the key. ECB mode is chosen DELIBERATELY:
    * it is deterministic, so equal plaintexts encrypt equally and joins /
    * group-bys keep working across tables sharing a key — the same trade
    * every deterministic-encryption scheme (e.g. AEAD-SIV deployments)
    * makes, at the documented cost that equality of ciphertexts leaks
    * equality of plaintexts. Output is base64 text; NULL stays NULL. */
  def encryptColumns(df: DataFrame, cols: Seq[String], key: String): DataFrame = {
    require(Set(16, 24, 32).contains(key.length),
      "AES key must be 16, 24, or 32 bytes")
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"no such columns: $bad")
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      base64(aes_encrypt(col(c).cast("string").cast("binary"),
        lit(key).cast("binary"), lit("ECB")))))
  }

  /** Inverse of [[encryptColumns]] (same key, same columns). */
  def decryptColumns(df: DataFrame, cols: Seq[String], key: String): DataFrame = {
    val bad = cols.filterNot(df.columns.contains)
    require(bad.isEmpty, s"no such columns: $bad")
    cols.foldLeft(df)((d, c) => d.withColumn(c,
      aes_decrypt(unbase64(col(c)), lit(key).cast("binary"), lit("ECB"))
        .cast("string")))
  }

  /** Right-to-be-forgotten cascade: erase every row matching `subjectIds`
    * from EACH listed snapshot table (table dir → key column), as one
    * copy-on-write delete commit per table. Returns (table dir, key
    * column, rows erased) — the audit record an erasure request needs.
    *
    * Deliberately snapshot-table-based: plain parquet dirs cannot delete
    * rows atomically; the snapshot commit gives isolation (concurrent
    * readers keep their version) and the erasure becomes DURABLE only
    * after [[graft.sources.SnapshotTable.vacuum]] reclaims the prior
    * versions — both halves asserted in the spec. Per table the cost is
    * one filtered rewrite; the subject set rides as a local `isin` for
    * the typical single-digit request (swap in a broadcast anti-join for
    * bulk erasure lists). */
  def forget(spark: SparkSession, tables: Seq[(String, String)],
             subjectIds: Seq[Any]): Seq[(String, String, Long)] = {
    require(subjectIds.nonEmpty, "no subjects to forget")
    tables.map { case (dir, keyCol) =>
      val before = graft.sources.SnapshotTable.read(spark, dir)
        .filter(col(keyCol).isin(subjectIds: _*)).count()
      if (before > 0)
        graft.sources.SnapshotTable.delete(spark, dir,
          col(keyCol).isin(subjectIds: _*))
      (dir, keyCol, before)
    }
  }
}
