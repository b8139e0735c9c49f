package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Lake

/** Catalog / metadata extraction (SURVEY.md §2 items 9–12) — the data-lake
  * API surface: list datasets, extract schemas, profile columns, and report
  * file-level metadata.
  *
  * Scale notes: table listing and schema extraction are O(#tables) driver
  * metadata operations. Column profiling is ONE aggregate pass per table
  * computing every column's stats in a single job (struct-per-column, then
  * unpivoted) — never a job per column. Exact NDV is used at test SF for
  * oracle parity; at 100 TB flip `exactNdv=false` for
  * approx_count_distinct (same plan shape, HLL sketch, no extra shuffle).
  */
object CatalogOps {

  /** Dataset listing with row counts. Counts run as one tiny parquet
    * metadata-only job per table (count(*) reads footers, not data). */
  def catalogTables(spark: SparkSession, dir: String): DataFrame =
    Lake.tableNames.map { name =>
      Lake.table(spark, dir, name)
        .agg(count(lit(1)).as("row_count"))
        .select(lit(name).as("table_name"), col("row_count"))
    }.reduce(_.union(_)).orderBy(col("table_name"))

  /** Spark SQL type → portable (DuckDB-style) type name, so the schema
    * catalog is comparable across engines. */
  private def portableType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    // parquet timestamps with isAdjustedToUTC=false surface as NTZ
    case TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case BinaryType => "BLOB"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case ArrayType(e, _) => portableType(e) + "[]"
    case other => other.sql
  }

  /** Schema extraction: (table_name, column_name, ordinal, data_type) for
    * every table in the lake. Pure metadata — no data read. */
  def catalogSchema(spark: SparkSession, dir: String): DataFrame = {
    val rows = Lake.tableNames.flatMap { name =>
      Lake.table(spark, dir, name).schema.fields.zipWithIndex.map {
        case (f, i) => Row(name, f.name, (i + 1).toLong, portableType(f.dataType))
      }
    }
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("column_name", StringType, nullable = false),
      StructField("ordinal", LongType, nullable = false),
      StructField("data_type", StringType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy(col("table_name"), col("ordinal"))
  }

  /** Column profile for a set of orderable columns of one table, in a
    * single aggregate pass: min/max (as double), null count, NDV.
    * Output: one row per column, unpivoted via stack(). */
  def profile(spark: SparkSession, dir: String, table: String,
              columns: Seq[String], exactNdv: Boolean = true): DataFrame = {
    // project to the profiled columns, then fan out to core parallelism:
    // a one-file table scans as ONE task, which serialized the whole
    // distinct-expand partial aggregation (2.6 s single-task at
    // local[32], r14 profile). Identity at scale (Par scaladoc).
    val df = Par.fanOut(
      Lake.table(spark, dir, table).select(columns.map(col): _*))
    val aggs = columns.flatMap { c =>
      Seq(
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exactNdv) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"${c}__ndv"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = columns.map { c =>
      s"'$c', `${c}__min`, `${c}__max`, `${c}__nulls`, `${c}__ndv`"
    }.mkString(s"stack(${columns.size}, ", ", ", ")")
    wide.select(expr(
      s"$stackExpr as (column_name, min_val, max_val, null_count, ndv)"))
      .orderBy(col("column_name"))
  }

  /** Exact quartiles per numeric column in one aggregate pass (unpivoted
    * like the other profiles). Exact `percentile` is the oracle-parity
    * path; at 100 TB flip to `approx_percentile` — same plan shape, t-digest
    * sketch, no buffered sort. */
  def quantiles(spark: SparkSession, dir: String, table: String,
                columns: Seq[String], exact: Boolean = true,
                accuracy: Int = 10000): DataFrame = {
    // projected + fanned out like [[profile]]: parallel partial
    // percentile buffers instead of one single-task scan building all
    // of them serially. The percentile input is cast to DOUBLE up
    // front: money columns are decimal(12,2) whose values convert
    // exactly-ordered, the aggregate's output was already read out as
    // double, and a primitive-double buffer map replaces boxed-Decimal
    // keys in the hot merge path (the r14 profile's 1.7 s single-task
    // final merge).
    val df = Par.fanOut(
      Lake.table(spark, dir, table).select(columns.map(col): _*))
    // ONE percentile buffer per column (array of probabilities), not one
    // per (column, probability) — 3× less aggregation state and row work.
    // exact=false → approx_percentile (t-digest): the 100 TB path, same
    // plan shape, bounded sketch memory instead of a buffered sort.
    // `accuracy` bounds the sketch's rank error at n/accuracy: at
    // accuracy = 1e6 the returned element is PROVABLY the exact rank
    // statistic for any input below 1M rows (rank error < 1) while the
    // sketch stays memory-bounded at any corpus size — the
    // oracle-checkable sketch twin (q_quantiles_tdigest).
    val aggs = columns.map { c =>
      val call =
        if (exact) s"percentile(cast($c as double), array(0.25D, 0.5D, 0.75D))"
        else s"approx_percentile($c, array(0.25D, 0.5D, 0.75D), $accuracy)"
      expr(call).as(s"${c}__qs")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // cast-to-double BEFORE round: approx_percentile returns the input
    // type (decimal for money columns), and a decimal round would drift
    // from the oracle's DOUBLE
    val stackExpr = columns.map { c =>
      s"'$c', round(cast(`${c}__qs`[0] AS double), 4), " +
        s"round(cast(`${c}__qs`[1] AS double), 4), " +
        s"round(cast(`${c}__qs`[2] AS double), 4)"
    }.mkString(s"stack(${columns.size}, ", ", ", ")")
    wide.select(expr(s"$stackExpr as (column_name, q25, q50, q75)"))
      .orderBy(col("column_name"))
  }

  /** Equi-depth (quantile) binning: rows ranked into `nBins` equal-count
    * bins with per-bin bounds — the feature-transform twin of the
    * equi-width histogram. Readout-equivalent to
    * `ntile(nBins) OVER (ORDER BY l_extendedprice, l_orderkey,
    * l_linenumber)` + per-bin (count, min, max), but computed WITHOUT
    * the global single-partition sort that form pays (281 s at sf10 —
    * one task sorts every row):
    *
    *  - ntile's bin sizes are pure arithmetic in N: with base = N/n and
    *    r = N mod n, bin k holds ranks (R₍ₖ₋₁₎, Rₖ] where
    *    Rₖ = k·base + min(k, r) — so `n_rows` needs only the count;
    *  - the total order is keyed by PRICE FIRST and the tie-break
    *    (orderkey, linenumber) only permutes rows of EQUAL price, so
    *    the sequence of prices along the global order is exactly the
    *    sorted price multiset — bin k's `lo`/`hi` are the order
    *    statistics at ranks R₍ₖ₋₁₎+1 and Rₖ of the price column alone;
    *  - those order statistics come from a (price, frequency)
    *    aggregation: a price group covering cumulative ranks
    *    [cum−f+1, cum] contributes rows to every bin its rank interval
    *    touches, and bin(r) is the CLOSED-FORM inverse of Rₖ
    *    (bin(r) = ⌈r/(base+1)⌉ while r ≤ (base+1)·ŕ, else
    *    ŕ + ⌈(r − (base+1)·ŕ)/base⌉) — so each group explodes into
    *    its [bin(cum_lo), bin(cum_hi)] span (≤ nBins entries) and the
    *    per-bin min/max price falls out of one more aggregate, no join.
    *
    * Plan: one map-combinable frequency aggregate (NDV-bounded — the
    * price domain, not the row count; the same boundedness the
    * [[quantileBinsApprox]] percentile buffer relies on), one running
    * cumulative window over the NDV-sized frame, one bounded explode +
    * re-aggregate. The row scan prunes to ONE column (the ntile form
    * carried the tie-break keys through the global sort). N is
    * collected to the driver like the approx form's cut points — a
    * bounded scalar.
    *
    * Below `freqPathMinRows` the original ntile window runs instead:
    * on a small table the frequency form's two extra jobs (count +
    * exchange) cost more than the one-task sort they avoid (measured at
    * sf0.1/local[32]: ntile 0.90 s vs frequency 1.54 s isolated, while
    * at sf10 the ntile sort alone was 281 s) — the guarded-probe
    * pattern ([[graft.operators.Relational.bradleyTerry]]'s broadcast
    * guard): both branches compute identical rows, the bounded N probe
    * picks the cheaper plan for the size at hand. */
  def quantileBins(spark: SparkSession, dir: String, nBins: Int = 10,
                   freqPathMinRows: Long = 2000000L): DataFrame = {
    val li = Lake.table(spark, dir, "lineitem")
    // N from the bare row count — Spark serves an unfiltered count from
    // parquet row-group metadata (no column decode), so the frequency
    // frame is consumed exactly once and needs no persist
    val n = li.count()
    if (n < freqPathMinRows) {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      return li
        .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .withColumn("bin", ntile(nBins).over(w))
        .groupBy(col("bin"))
        .agg(
          count(lit(1)).as("n_rows"),
          round(min(col("l_extendedprice")), 2).as("lo"),
          round(max(col("l_extendedprice")), 2).as("hi"))
        .orderBy(col("bin"))
    }
    val freq = li
      .select(col("l_extendedprice"))
      .groupBy(col("l_extendedprice")).agg(count(lit(1)).as("f"))
    val base = n / nBins
    val rem = n % nBins
    // ranks 1..(base+1)·rem live in the first rem (size base+1) bins;
    // the rest in size-base bins. div is integer, operands positive;
    // when base = 0 every rank satisfies the first branch (cut = N), so
    // the max(base,1) guard only keeps the dead branch well-defined.
    val cut = (base + 1) * rem
    val safeBase = math.max(base, 1L)
    def binOf(rc: String): Column =
      when(col(rc) <= lit(cut), expr(s"($rc + $base) div ${base + 1}"))
        .otherwise(lit(rem) +
          expr(s"($rc - $cut + $safeBase - 1) div $safeBase"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("l_extendedprice"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out = freq
      .withColumn("cum_hi", sum(col("f")).over(wCum))
      .withColumn("cum_lo", col("cum_hi") - col("f") + 1)
      .withColumn("bin", explode(sequence(binOf("cum_lo"), binOf("cum_hi"))))
      .groupBy(col("bin"))
      .agg(
        round(min(col("l_extendedprice")), 2).as("lo"),
        round(max(col("l_extendedprice")), 2).as("hi"))
      .select(col("bin").cast("int").as("bin"),
        (lit(base) + when(col("bin") <= lit(rem), lit(1L))
          .otherwise(lit(0L))).as("n_rows"),
        col("lo"), col("hi"))
      .orderBy(col("bin"))
    out
  }

  /** Equi-depth binning, the PARALLEL form: quantile cut points from ONE
    * aggregate pass (exact `percentile` here for oracle reproducibility;
    * `exact=false` swaps in `approx_percentile` — identical plan shape,
    * bounded sketch memory, the 100 TB default), then a codegen'd
    * comparison chain assigns bins map-side. No window, no global sort —
    * the serial single-partition ntile of [[quantileBins]] never appears.
    * The nBins−1 cut points are collected to the driver (bounded by
    * construction, like the IVF quantizer sample); rounded to 4 dp, the
    * scale at which Spark `percentile` and DuckDB `quantile_cont` agree.
    * Bin k = 1 + |{cuts strictly below the value}| — rows equal to a cut
    * point land in the lower bin on both engines. Counts are equal only
    * up to ties at the cut points (the price of parallelism); bounds are
    * exact. */
  def quantileBinsApprox(spark: SparkSession, dir: String, nBins: Int = 10,
                         exact: Boolean = true): DataFrame = {
    val li = Lake.table(spark, dir, "lineitem").select(col("l_extendedprice"))
    val probs = (1 until nBins).map(i => i.toDouble / nBins)
    val probsSql = probs.map(_ + "D").mkString(",")
    // exact path: pre-aggregate to (value, frequency) so the percentile
    // buffer merges NDV-sized maps, not row streams (identical cut points,
    // measured ~25% faster); approx_percentile has no frequency form
    val cutsDf =
      if (exact)
        li.groupBy(col("l_extendedprice")).agg(count(lit(1)).as("__f"))
          .agg(expr(s"percentile(l_extendedprice, array($probsSql), __f)").as("cuts"))
      else
        li.agg(expr(s"approx_percentile(l_extendedprice, array($probsSql))").as("cuts"))
    val cuts: Seq[Double] = cutsDf.head().getSeq[Double](0)
      .map(c => BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val v = col("l_extendedprice").cast("double")
    val bin = cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(v > lit(c), 1).otherwise(0)
    }
    li.withColumn("bin", bin.cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(min(col("l_extendedprice")), 2).as("lo"),
        round(max(col("l_extendedprice")), 2).as("hi"))
      .orderBy(col("bin"))
  }

  /** Distribution drift between two row slices of one table — the
    * monitor a training-data lake runs when a new crawl/batch lands: does
    * `valueCol`'s distribution in slice B still look like slice A? Emits
    * per-bin counts, smoothed shares, and PSI terms over a fixed-width
    * binning (Σ psi_term is the population-stability index; > 0.25 is
    * the conventional "investigate" line). Laplace-smoothed shares
    * ((n + 0.5) / (total + 0.5·bins)) keep empty bins finite on both
    * engines.
    *
    * One scan (both slice memberships evaluated per row), one bounded
    * group-by on bin id, one one-row totals broadcast — the histogram's
    * scale shape, at any table size. All shares derive from exact integer
    * counts through one fixed double expression, so engines agree. */
  def distributionDrift(spark: SparkSession, dir: String, table: String,
                        valueCol: String, sliceA: Column, sliceB: Column,
                        binWidth: Double): DataFrame =
    distributionDrift(spark, dir, table, valueCol, sliceA, sliceB, binWidth,
      materialize = true)

  private[graft] def distributionDrift(spark: SparkSession, dir: String,
                                       table: String, valueCol: String,
                                       sliceA: Column, sliceB: Column,
                                       binWidth: Double,
                                       materialize: Boolean): DataFrame =
    driftCore(Lake.table(spark, dir, table).filter(sliceA || sliceB)
      .select(floor(col(valueCol) / binWidth).cast("long").as("bin"),
        when(sliceA, 1L).otherwise(0L).as("ina"),
        when(sliceB, 1L).otherwise(0L).as("inb")), binWidth, materialize)

  /** Drift between two separate frames (e.g. two snapshot-table versions
    * via [[graft.sources.SnapshotTable.read]], or last month's corpus vs
    * this crawl): same per-bin PSI report, populations tagged by side. */
  def distributionDrift(a: DataFrame, b: DataFrame, valueCol: String,
                        binWidth: Double): DataFrame =
    driftCore(
      a.select(floor(col(valueCol) / binWidth).cast("long").as("bin"),
          lit(1L).as("ina"), lit(0L).as("inb"))
        .unionByName(
          b.select(floor(col(valueCol) / binWidth).cast("long").as("bin"),
            lit(0L).as("ina"), lit(1L).as("inb"))), binWidth)

  private def driftCore(src: DataFrame, binWidth: Double): DataFrame =
    driftCore(src, binWidth, materialize = true)

  /** `materialize = true` (every public path): persist the BOUNDED
    * bin-count frame so the source scan + group-by runs once for its two
    * consumers ("one scan" as documented; same discipline as
    * supplierShare's rev cache), then localCheckpoint the O(bins) report
    * and release the cache immediately. `materialize = false` exists for
    * plan inspection only (PlanShapeSpec reads the scan shape, which a
    * checkpoint would hide). */
  private[graft] def driftCore(src: DataFrame, binWidth: Double,
                               materialize: Boolean): DataFrame = {
    val gBase = src.groupBy(col("bin"))
      .agg(sum(col("ina")).as("n_a"), sum(col("inb")).as("n_b"))
    val g = if (materialize)
      gBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else gBase
    val t = g.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"),
      count(lit(1)).as("nbins"))
    val pa = (col("n_a") + lit(0.5)) / (col("ta") + lit(0.5) * col("nbins"))
    val pb = (col("n_b") + lit(0.5)) / (col("tb") + lit(0.5) * col("nbins"))
    val out = g.crossJoin(broadcast(t))
      .select(col("bin"), (col("bin") * binWidth).cast("double").as("bin_lo"),
        col("n_a"), col("n_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        round((pa - pb) * log(pa / pb), 6).as("psi_term"))
      .orderBy(col("bin"))
    if (materialize) {
      val cp = out.localCheckpoint(true)
      g.unpersist(false)
      cp
    } else out
  }

  /** [[driftQuery]] without persist/checkpoint — plan inspection only. */
  private[graft] def driftQueryLazy(spark: SparkSession, dir: String): DataFrame =
    distributionDrift(spark, dir, "orders", "o_totalprice",
      col("o_orderdate") < lit("1997-01-01").cast("timestamp"),
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp"),
      binWidth = 50000.0, materialize = false)

  /** Driver binding: order-value drift, 1996 cohort vs 1997+ cohort. */
  def driftQuery(spark: SparkSession, dir: String): DataFrame =
    distributionDrift(spark, dir, "orders", "o_totalprice",
      col("o_orderdate") < lit("1997-01-01").cast("timestamp"),
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp"),
      binWidth = 50000.0)

  /** Pairwise Pearson correlations for a list of numeric column pairs —
    * the relationship half of profiling (is discount coupled to quantity?
    * does price predict tax?). ALL pairs ride ONE aggregate pass over the
    * table (each `corr` keeps its own co-moment buffer; map-side partial
    * agg merges them associatively), then unpivot to long format. Rounded
    * to 4: co-moment merge order varies with partitioning and the last
    * float bits with it. */
  def correlations(spark: SparkSession, dir: String, table: String,
                   pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one column pair")
    val df = Lake.table(spark, dir, table)
    val aggs = pairs.zipWithIndex.map { case ((a, b), i) =>
      corr(col(a), col(b)).as(s"__c$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = pairs.zipWithIndex.map { case ((a, b), i) =>
      s"'$a', '$b', round(__c$i, 4)"
    }.mkString(s"stack(${pairs.size}, ", ", ", ")")
    wide.select(expr(s"$stackExpr as (col_a, col_b, pearson_r)"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** IQR outlier screen per group: Tukey fences (k·IQR beyond the
    * quartiles) over a value column — the data-quality scan that flags
    * anomalous rows before they poison downstream stats. Two passes by
    * necessity (fences are an order statistic of the WHOLE group): one
    * per-group quantile aggregate (group cardinality, tiny), broadcast
    * back onto the table, one counting pass. `percentile` here mirrors
    * [[quantiles]]; swap to approx_percentile at 100 TB — same plan. */
  def iqrOutliers(spark: SparkSession, dir: String, table: String,
                  valueCol: String, groupCol: String,
                  k: Double = 1.5): DataFrame = {
    val df = Lake.table(spark, dir, table)
    val fences = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, array(0.25D, 0.75D))").as("qs"))
      .select(col(groupCol),
        element_at(col("qs"), 1).as("q1"), element_at(col("qs"), 2).as("q3"))
      .withColumn("lo", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(k) * (col("q3") - col("q1")))
    df.join(broadcast(fences), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(valueCol) < col("lo") || col(valueCol) > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(first(col("q1")), 4).as("q1"),
        round(first(col("q3")), 4).as("q3"))
      .orderBy(col(groupCol))
  }

  /** Winsorization (percentile clipping): values below p_lo / above p_hi
    * are clipped to the fences — the standard outlier-robust
    * feature-prep transform ([[iqrOutliers]] DETECTS, this one REPAIRS).
    * One exact-percentile aggregate broadcast back over the table (the
    * quantileBins twin: swap `percentile` for `approx_percentile` at
    * 100 TB, same plan shape); emits per-row original and clipped value
    * plus a flag, so downstream can audit exactly what moved. */
  def winsorize(spark: SparkSession, dir: String, table: String,
                keyCol: String, valueCol: String,
                pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val df = Lake.table(spark, dir, table)
    val fences = df.agg(
      expr(s"percentile($valueCol, array(${pLo}D, ${pHi}D))").as("qs"))
      .select(element_at(col("qs"), 1).as("lo"),
        element_at(col("qs"), 2).as("hi"))
    df.crossJoin(broadcast(fences))
      .select(
        col(keyCol),
        round(col(valueCol), 2).as("value"),
        round(greatest(col("lo"), least(col("hi"), col(valueCol))), 2)
          .as("clipped"),
        (col(valueCol) < col("lo") || col(valueCol) > col("hi"))
          .as("was_clipped"))
      .orderBy(col(keyCol))
  }

  /** Driver query: order totals winsorized at [p01, p99]. */
  def winsorizeQuery(spark: SparkSession, dir: String): DataFrame =
    winsorize(spark, dir, "orders", "o_orderkey", "o_totalprice")

  /** String-column profile (lexicographic min/max, null count, NDV, mean
    * length) — same single-pass / unpivot shape as the numeric profile. */
  def profileStrings(spark: SparkSession, dir: String, table: String,
                     columns: Seq[String], exactNdv: Boolean = true): DataFrame = {
    val df = Lake.table(spark, dir, table)
    val aggs = columns.flatMap { c =>
      Seq(
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exactNdv) countDistinct(col(c))
         else approx_count_distinct(col(c), 0.02)).as(s"${c}__ndv"),
        sum(length(col(c)).cast("long")).as(s"${c}__lensum"),
        count(col(c)).as(s"${c}__cnt"))
    }
    // avg_len = Σlen/count is a terminating quotient → exact integer
    // half-up ([[ExactRound]]) computed on the one-row wide frame
    val wide = columns.foldLeft(df.agg(aggs.head, aggs.tail: _*)) {
      (acc, c) =>
        acc.withColumn(s"${c}__avglen",
          ExactRound.halfUpPos(s"10000 * `${c}__lensum`", s"`${c}__cnt`")
            .cast("double") / 1e4)
    }
    val stackExpr = columns.map { c =>
      s"'$c', `${c}__min`, `${c}__max`, `${c}__nulls`, `${c}__ndv`, `${c}__avglen`"
    }.mkString(s"stack(${columns.size}, ", ", ", ")")
    wide.select(expr(
      s"$stackExpr as (column_name, min_val, max_val, null_count, ndv, avg_len)"))
      .orderBy(col("column_name"))
  }

  /** Mergeable NDV statistics: one HLL sketch binary per group. Sketches
    * union WITHOUT rescanning the rows that produced them — the building
    * block for incremental catalog stats: sketch each new ingest batch (or
    * snapshot version), union with the stored sketches, never re-read
    * history. */
  def ndvSketches(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        hll_sketch_agg(col(valueCol)).as("ndv_sketch"),
        // count(*): the row total a catalog reports (count(valueCol)
        // would silently skip nulls)
        count(lit(1)).as("n_rows"))

  /** Union a set of sketch rows into a single NDV estimate. */
  def mergeNdv(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("ndv_sketch"))).as("ndv_estimate"),
      sum(col("n_rows")).as("n_rows"))

  /** Mergeable quantile statistics: one KLL sketch binary per group — the
    * quantile half of incremental catalog stats (HLL covers NDV). Sketch
    * each ingest batch / snapshot version once, persist the bytes, and
    * refresh the table profile by merging sketches: history is never
    * re-read, and a merged sketch carries the same error bounds as one
    * built over all the rows. */
  def quantileSketches(df: DataFrame, groupCol: String, valueCol: String,
                       k: Int = graft.functions.KllFunctions.DefaultK): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        graft.functions.KllFunctions.kllSketchAgg(col(valueCol), k).as("q_sketch"),
        count(lit(1)).as("n_rows"))

  /** Union a set of quantile-sketch rows into one estimated profile. */
  def mergeQuantiles(sketches: DataFrame,
                     ranks: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame =
    sketches.agg(
      graft.functions.KllFunctions.kllQuantiles(
        graft.functions.KllFunctions.kllMergeAgg(col("q_sketch")), ranks)
        .as("quantiles"),
      sum(col("n_rows")).as("n_rows"))

  /** Driver-visible incremental-stats query: sketch the documents table in
    * 4 independent batches (as ingest would), merge the sketches, and
    * check the merged estimate against the exact NDV of a full rescan —
    * the "union of batch sketches ≡ rescan" contract incremental catalog
    * stats depend on. `ndv_ok` is deterministic: HLL sketches are
    * order-independent and their estimate is a pure function of the value
    * set (well within the 5% tolerance at any test SF). */
  def incrementalNdv(spark: SparkSession, dir: String): DataFrame = {
    val docs = Lake.documents(spark, dir)
    val sketches = ndvSketches(
      docs.withColumn("batch", pmod(col("doc_id"), lit(4L))), "batch", "text")
    val merged = mergeNdv(sketches)
    val exact = docs.agg(countDistinct(col("text")).as("ndv_exact"))
    merged.crossJoin(exact).select(
      col("n_rows"),
      col("ndv_exact"),
      (abs(col("ndv_estimate") - col("ndv_exact")) <=
        col("ndv_exact") * lit(0.05)).as("ndv_ok"))
  }

  /** Mergeable frequent-items statistics: one Misra-Gries sketch binary
    * per group — the "top values" third leg of incremental catalog stats
    * (HLL counts distinct, KLL ranks, this one names the heavy hitters).
    * Same contract: sketch each batch once, merge forever. */
  def freqSketches(df: DataFrame, groupCol: String, valueCol: String,
                   maxMapSize: Int = graft.functions.FreqFunctions.DefaultMapSize): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        graft.functions.FreqFunctions.freqSketchAgg(col(valueCol), maxMapSize).as("freq_sketch"),
        count(lit(1)).as("n_rows"))

  /** Driver-visible set-expression NDV query (Theta sketches): the
    * distinct customers ordering in status F, in status O, and their
    * union / intersection / difference — computed from TWO per-segment
    * sketches plus set operations, never a re-scan. This is the question
    * class HLL cannot answer (HLL unions but never intersects). Emitted
    * counts are the EXACT ones (one co-partitioned group-by pass);
    * `theta_ok` reports every sketch estimate within 5% of them — below
    * the sketch's nominal entries the estimates are exactly equal, and at
    * 100 TB the same plan degrades to published error bounds. */
  def setOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ThetaFunctions._
    val o = Lake.orders(spark, dir)
    val sk = o.agg(
      thetaSketchAgg(when(col("o_orderstatus") === "F",
        col("o_custkey").cast("string"))).as("sk_a"),
      thetaSketchAgg(when(col("o_orderstatus") === "O",
        col("o_custkey").cast("string"))).as("sk_b"))
    val est = sk.select(
      thetaEstimate(col("sk_a")).as("e_a"),
      thetaEstimate(col("sk_b")).as("e_b"),
      thetaEstimate(thetaUnion(col("sk_a"), col("sk_b"))).as("e_union"),
      thetaEstimate(thetaIntersect(col("sk_a"), col("sk_b"))).as("e_inter"),
      thetaEstimate(thetaAnotB(col("sk_a"), col("sk_b"))).as("e_anotb"))
    val exact = o.groupBy(col("o_custkey"))
      .agg(
        max(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("in_a"),
        max(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("in_b"))
      .agg(
        sum(col("in_a")).as("n_a"),
        sum(col("in_b")).as("n_b"),
        sum(greatest(col("in_a"), col("in_b"))).as("n_union"),
        sum(col("in_a") * col("in_b")).as("n_inter"),
        sum(col("in_a") * (lit(1L) - col("in_b"))).as("n_anotb"))
    def ok(e: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =
      abs(e - x) <= x * lit(0.05)
    exact.crossJoin(broadcast(est)).select(
      col("n_a"), col("n_b"), col("n_union"), col("n_inter"), col("n_anotb"),
      (ok(col("e_a"), col("n_a")) && ok(col("e_b"), col("n_b")) &&
       ok(col("e_union"), col("n_union")) && ok(col("e_inter"), col("n_inter")) &&
       ok(col("e_anotb"), col("n_anotb"))).as("theta_ok"))
  }

  /** Driver-visible heavy-hitters query: sketch the token stream in 4
    * batches, merge, and report the top `k` tokens with their estimated
    * counts. While the value domain fits the sketch map (any categorical
    * column; this corpus's vocabulary) the estimates are EXACT, so the
    * DuckDB oracle is plain GROUP BY / ORDER BY / LIMIT; at 100 TB the
    * same plan yields bounded-error heavy hitters. */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val toks = Lake.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(pmod(col("doc_id"), lit(4L)).as("batch"),
        explode(split(col("text"), " ")).as("token"))
    val merged = freqSketches(toks, "batch", "token")
      .agg(graft.functions.FreqFunctions.freqMergeAgg(col("freq_sketch")).as("sk"))
    merged
      .select(explode(graft.functions.FreqFunctions.freqTopItems(col("sk"))).as("f"))
      .select(col("f.item").as("token"), col("f.est").as("est_count"))
      .orderBy(col("est_count").desc, col("token"))
      .limit(k)
  }

  /** Driver-visible incremental-quantiles query, the KLL twin of
    * [[incrementalNdv]]: sketch lineitem's l_extendedprice in 4
    * independent batches (as ingest would), merge the per-batch sketches,
    * and verify the merged estimates land within rank tolerance of the
    * exact distribution — the "union of batch sketches ≡ rescan" contract
    * for the quantile half of incremental catalog stats. The emitted
    * quartiles are the EXACT ones (deterministic, oracle-comparable);
    * `qs_ok` reports whether each sketch estimate's true rank (one extra
    * CDF pass) is within ±0.05 of its target — 3× KLL's ≈1.65% rank error
    * at k=200, so the flag is stable despite KLL's internal randomness. */
  def incrementalQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Lake.lineitem(spark, dir)
    val sketches = quantileSketches(
      li.withColumn("batch", pmod(col("l_orderkey"), lit(4L))),
      "batch", "l_extendedprice")
    val est = mergeQuantiles(sketches).select(
      col("n_rows"),
      element_at(col("quantiles"), 1).as("e25"),
      element_at(col("quantiles"), 2).as("e50"),
      element_at(col("quantiles"), 3).as("e75"))
    li.select(col("l_extendedprice").as("v"))
      .crossJoin(broadcast(est))
      .agg(
        first(col("n_rows")).as("n_rows"),
        expr("percentile(v, array(0.25D, 0.5D, 0.75D))").as("qs"),
        avg(when(col("v") <= col("e25"), 1.0d).otherwise(0.0d)).as("r25"),
        avg(when(col("v") <= col("e50"), 1.0d).otherwise(0.0d)).as("r50"),
        avg(when(col("v") <= col("e75"), 1.0d).otherwise(0.0d)).as("r75"))
      .select(
        col("n_rows"),
        round(element_at(col("qs"), 1), 4).as("q25"),
        round(element_at(col("qs"), 2), 4).as("q50"),
        round(element_at(col("qs"), 3), 4).as("q75"),
        (abs(col("r25") - 0.25) <= 0.05 &&
         abs(col("r50") - 0.50) <= 0.05 &&
         abs(col("r75") - 0.75) <= 0.05).as("qs_ok"))
  }

  /** Data-quality constraint checks — the "expectations" surface of a
    * lake API: named rules over a table, each reporting its violation
    * count. Scalar rules (null / unique / range) share ONE aggregate
    * pass; the referential rule is a broadcast-probe anti-join count.
    * Zero is a PASS, not an absence — every rule always reports. */
  def constraintChecks(spark: SparkSession, dir: String): DataFrame = {
    val o = Lake.orders(spark, dir)
    val scalarChecks = o.agg(
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("orderkey_null"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("orderkey_dup"),
      sum(when(col("o_totalprice") <= 0 || col("o_totalprice") > 300000, 1L)
        .otherwise(0L)).as("totalprice_range"),
      sum(when(col("o_orderdate") < to_timestamp(lit("1992-01-01")) ||
               col("o_orderdate") >= to_timestamp(lit("1999-01-01")), 1L)
        .otherwise(0L)).as("orderdate_range"))
    val fkOrphans = o.join(
      broadcast(Lake.customer(spark, dir).select(col("c_custkey").as("o_custkey"))),
      Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("custkey_fk_exists").as("rule"), col("n_violations"))
    scalarChecks
      .select(expr(
        """stack(4,
          |  'orderdate_in_range', orderdate_range,
          |  'orderkey_not_null', orderkey_null,
          |  'orderkey_unique', orderkey_dup,
          |  'totalprice_in_range', totalprice_range
          |) as (rule, n_violations)""".stripMargin))
      .unionByName(fkOrphans)
      .orderBy(col("rule"))
  }

  /** Inclusion-dependency (FK-candidate) discovery: for each candidate
    * (child.col → parent.col) pair, the fraction of distinct child values
    * present in the parent — containment 1.0 marks a foreign-key
    * candidate, fractional containment measures partial coverage (e.g.
    * customers who never ordered). Scale shape: both sides reduce to
    * DISTINCT key sets first (map-side partial agg, cardinality of the
    * KEY not the table), then one left join per pair. No forced broadcast:
    * a dimension-sized parent key set auto-broadcasts under the planner
    * threshold, while a fact-sized parent (orders→lineitem below) must be
    * free to sort-merge at scale. Candidates are explicit: schema-wide
    * pair mining is O(columns²) scans and belongs in an offline profiler,
    * not here. */
  def inclusionDependencies(spark: SparkSession, dir: String,
      candidates: Seq[((String, String), (String, String))]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate pair")
    val results = candidates.map { case ((ct, cc), (pt, pc)) =>
      val child = Lake.table(spark, dir, ct).select(col(cc).as("k"))
        .filter(col("k").isNotNull).distinct()
      val parent = Lake.table(spark, dir, pt).select(col(pc).as("pk"))
        .filter(col("pk").isNotNull).distinct()
      child.join(parent, col("k") === col("pk"), "left")
        .agg(
          count(lit(1)).as("n_child_distinct"),
          sum(when(col("pk").isNotNull, 1L).otherwise(0L)).as("n_contained"))
        .select(
          lit(ct).as("child_table"), lit(cc).as("child_col"),
          lit(pt).as("parent_table"), lit(pc).as("parent_col"),
          col("n_child_distinct"), col("n_contained"),
          // count/count → exact integer half-up ([[ExactRound]])
          (ExactRound.halfUpPos("10000 * n_contained", "n_child_distinct")
            .cast("double") / 1e4).as("containment"))
    }
    results.reduce(_ unionByName _)
      .orderBy(col("child_table"), col("child_col"), col("parent_table"))
  }

  /** SKETCHED inclusion-dependency discovery — the 100 TB twin of
    * [[inclusionDependencies]]: containment estimated from Theta sketches
    * as 1 − est(child \ parent)/est(child), so each (table, column) is
    * scanned ONCE into a mergeable sketch (map-side combined, bounded
    * bytes) and every candidate pair is then answered by sketch set
    * algebra — no distinct sets, no join, no second scan per pair. Below
    * the sketch's nominal entries the estimates are exact and this agrees
    * with the exact path to the digit (asserted in IncrementalStatsSpec);
    * above, it degrades to published Theta error bounds — which is the
    * right trade for schema-wide FK mining over fact tables. */
  def inclusionDependenciesSketched(spark: SparkSession, dir: String,
      candidates: Seq[((String, String), (String, String))]): DataFrame = {
    import graft.functions.ThetaFunctions._
    require(candidates.nonEmpty, "need at least one candidate pair")
    // one sketch per DISTINCT column across all candidates, MATERIALIZED
    // (a one-row frame) — a lazily-shared plan would re-scan the table
    // each time the column appears in another candidate pair
    val cols = candidates.flatMap { case (c, p) => Seq(c, p) }.distinct
    val sketches: Map[(String, String), DataFrame] = cols.map { case (t, c) =>
      (t, c) -> Lake.table(spark, dir, t)
        .agg(thetaSketchAgg(col(c).cast("string")).as("sk"))
        .localCheckpoint(true)
    }.toMap
    val results = candidates.map { case ((ct, cc), (pt, pc)) =>
      val cs = sketches((ct, cc)).select(col("sk").as("sk_c"))
      val ps = sketches((pt, pc)).select(col("sk").as("sk_p"))
      cs.crossJoin(ps).select(
        lit(ct).as("child_table"), lit(cc).as("child_col"),
        lit(pt).as("parent_table"), lit(pc).as("parent_col"),
        round(thetaEstimate(col("sk_c")), 1).as("est_child_distinct"),
        round(thetaEstimate(thetaAnotB(col("sk_c"), col("sk_p"))), 1)
          .as("est_missing"),
        round(lit(1.0) - thetaEstimate(thetaAnotB(col("sk_c"), col("sk_p")))
          / thetaEstimate(col("sk_c")), 4).as("containment_est"))
    }
    results.reduce(_ unionByName _)
      .orderBy(col("child_table"), col("child_col"), col("parent_table"))
  }

  /** Driver binding of [[inclusionDependencies]] over the lake's real FK
    * edges plus one deliberately partial pair (orders→lineitem: orders
    * with no lineitems keep containment < 1 in this lake). */
  def fkDiscovery(spark: SparkSession, dir: String): DataFrame =
    inclusionDependencies(spark, dir, Seq(
      ("nation", "n_regionkey") -> ("region", "r_regionkey"),
      ("orders", "o_custkey") -> ("customer", "c_custkey"),
      ("lineitem", "l_orderkey") -> ("orders", "o_orderkey"),
      ("orders", "o_orderkey") -> ("lineitem", "l_orderkey")))

  /** Exact functional-dependency check over explicit candidates: A → B
    * holds iff |distinct A| = |distinct (A, B)| — the catalog signal that
    * reveals keys, denormalized copies, and derivable columns. One
    * distinct-aggregate pass per candidate (map-side partial agg to the
    * determinant's cardinality, never the table's); the struct count uses
    * tuple distinctness so null dependents count like any other value,
    * matching the oracle's DISTINCT-subquery semantics. Candidates are
    * explicit for the same reason as [[inclusionDependencies]]: schema-wide
    * mining is O(columns²) scans and belongs in an offline profiler. */
  def functionalDependencies(spark: SparkSession, dir: String,
      candidates: Seq[(String, String, String)]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate")
    val results = candidates.map { case (t, det, dep) =>
      Lake.table(spark, dir, t)
        .agg(
          countDistinct(col(det)).as("n_determinant"),
          countDistinct(struct(col(det), col(dep))).as("n_pairs"))
        .select(
          lit(t).as("tbl"), lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_determinant"), col("n_pairs"),
          (col("n_determinant") === col("n_pairs")).as("holds"))
    }
    results.reduce(_ unionByName _)
      .orderBy(col("tbl"), col("determinant"), col("dependent"))
  }

  /** [[fdDiscovery]] candidates — shared with the oracle generator so
    * engine and oracle can never drift. */
  val FdCandidates: Seq[(String, String, String)] = Seq(
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_mktsegment", "c_nationkey"),
    ("orders", "o_orderkey", "o_custkey"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("events", "user_id", "event_type"),
    ("documents", "doc_id", "source"))

  /** Driver binding of [[functionalDependencies]]: keys that must hold,
    * plus deliberately failing candidates (a part has several suppliers;
    * a user emits several event types). */
  def fdDiscovery(spark: SparkSession, dir: String): DataFrame =
    functionalDependencies(spark, dir, FdCandidates)

  /** Shannon-entropy profile of listed categorical columns — the
    * information-density member of the profiling family (NDV says how
    * many values exist; entropy says how evenly they're used, the
    * number that actually predicts dictionary-encoding win and join-key
    * skew): H = −Σ p·ln p with each share p pinned at 8 dp by exact
    * integer half-up BEFORE the ln (the surprisal discipline — the ln
    * terms 8-dp-decimal-sum order-free), plus the evenness ratio
    * H/ln(NDV). One distinct-value reduce per column; the per-column
    * frames are NDV-bounded. */
  def columnEntropy(spark: SparkSession, dir: String,
                    targets: Seq[(String, String)]): DataFrame = {
    val d8 = DecimalType(18, 8)
    val parts = targets.map { case (t, c) =>
      val counts = Lake.table(spark, dir, t)
        .filter(col(c).isNotNull)
        .groupBy(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val tot = counts.agg(sum(col("cnt")).as("n"),
        count(lit(1)).as("ndv"))
      counts.crossJoin(broadcast(tot))
        .withColumn("p",
          (ExactRound.halfUpPos("100000000 * cnt", "n")
            .cast("double") / 1e8))
        .agg(max(col("n")).as("n"), max(col("ndv")).as("ndv"),
          sum(round(-col("p") * log(col("p")), 8).cast(d8)).as("hsum"))
        .select(lit(t).as("tbl"), lit(c).as("column_name"),
          col("n").as("n_values"), col("ndv"),
          round(col("hsum"), 6).cast("double").as("entropy_nats"),
          round(col("hsum").cast("double") /
            log(col("ndv").cast("double")), 6).as("evenness"))
    }
    parts.reduce(_ unionByName _)
      .orderBy(col("tbl"), col("column_name"))
  }

  /** Enum / dictionary-column detection: columns whose exact NDV is at
    * most `maxCard` are enumerable — the catalog then stores the full
    * dictionary (driving UI filters, dictionary encodings, and constraint
    * suggestions). Scale shape: each column first reduces to its DISTINCT
    * value set (map-side partial agg; shuffle cardinality = NDV, not
    * rows); the dictionary is collected only from a `maxCard + 1`-row
    * ordered head of that set, so a high-cardinality column can never
    * materialize an unbounded array — its head is discarded by the
    * `is_enum` guard, never grown. */
  def enumColumns(spark: SparkSession, dir: String,
                  candidates: Seq[(String, String)],
                  maxCard: Int = 32): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate column")
    val results = candidates.map { case (t, c) =>
      val d = Lake.table(spark, dir, t)
        .select(col(c).cast("string").as("v"))
        .filter(col("v").isNotNull).distinct()
      val ndv = d.agg(count(lit(1)).as("ndv"))
      val head = d.orderBy(col("v")).limit(maxCard + 1)
        .agg(sort_array(collect_list(col("v"))).as("head_vals"))
      // Dictionary is emitted as one comma-joined scalar (not array<string>):
      // scalar columns hash/sort portably in any downstream engine.
      ndv.crossJoin(head).select(
        lit(t).as("tbl"), lit(c).as("column_name"), col("ndv"),
        (col("ndv") <= maxCard).as("is_enum"),
        when(col("ndv") <= maxCard, concat_ws(",", col("head_vals")))
          .otherwise(lit("")).as("dictionary"))
    }
    results.reduce(_ unionByName _)
      .orderBy(col("tbl"), col("column_name"))
  }

  /** [[enumDiscovery]] candidates — shared with the oracle generator. */
  val EnumCandidates: Seq[(String, String)] = Seq(
    ("lineitem", "l_returnflag"), ("lineitem", "l_linestatus"),
    ("orders", "o_orderstatus"), ("orders", "o_orderpriority"),
    ("events", "event_type"), ("documents", "lang"),
    ("documents", "source"), ("customer", "c_mktsegment"),
    ("customer", "c_name"), ("orders", "o_orderkey"))

  /** Driver binding of [[enumColumns]]: the lake's flag/status/segment
    * columns plus two that must NOT be enums (a key, a name). */
  def enumDiscovery(spark: SparkSession, dir: String): DataFrame =
    enumColumns(spark, dir, EnumCandidates)

  /** [[joinCardinalities]] candidates — shared with the oracle. */
  val JoinCardCandidates: Seq[((String, String), (String, String))] = Seq(
    ("orders", "o_custkey") -> ("customer", "c_custkey"),
    ("lineitem", "l_orderkey") -> ("orders", "o_orderkey"),
    ("lineitem", "l_partkey") -> ("part", "p_partkey"),
    ("events", "user_id") -> ("customer", "c_custkey"))

  /** EXACT equi-join cardinality without materializing the join — the
    * optimizer-stats service a catalog exposes for join planning:
    * |A ⋈ B| = Σ_k cA(k)·cB(k). Each side reduces to per-key counts
    * first (map-side partial agg to KEY cardinality, not table size),
    * then a key-count join and one sum — the join that would produce N
    * rows is costed by touching only its distinct keys. Also emits both
    * sides' max key multiplicity, the skew signal that decides whether
    * the real join needs salting ([[Skew]]). */
  def joinCardinalities(spark: SparkSession, dir: String,
      candidates: Seq[((String, String), (String, String))]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate join")
    val results = candidates.map { case ((lt, lk), (rt, rk)) =>
      val l = Lake.table(spark, dir, lt).filter(col(lk).isNotNull)
        .groupBy(col(lk).as("k")).agg(count(lit(1)).as("lc"))
      val r = Lake.table(spark, dir, rt).filter(col(rk).isNotNull)
        .groupBy(col(rk).as("k")).agg(count(lit(1)).as("rc"))
      l.join(r, "k")
        .agg(
          coalesce(sum(col("lc") * col("rc")), lit(0L)).as("join_rows"),
          coalesce(max(col("lc")), lit(0L)).as("max_left_multiplicity"),
          coalesce(max(col("rc")), lit(0L)).as("max_right_multiplicity"))
        .select(
          lit(lt).as("left_table"), lit(lk).as("left_key"),
          lit(rt).as("right_table"), lit(rk).as("right_key"),
          col("join_rows"), col("max_left_multiplicity"),
          col("max_right_multiplicity"))
    }
    results.reduce(_ unionByName _)
      .orderBy(col("left_table"), col("left_key"), col("right_table"))
  }

  /** Driver binding of [[joinCardinalities]] over the lake's join edges
    * (events→customer is the deliberately partial one). */
  def joinCardDiscovery(spark: SparkSession, dir: String): DataFrame =
    joinCardinalities(spark, dir, JoinCardCandidates)

  /** Semantic-type classes for [[semanticTypes]]: (label, anchored regex),
    * checked in priority order. Shared with the oracle generator. */
  val SemanticClasses: Seq[(String, String)] = Seq(
    "json"        -> "^\\{.*\\}$",
    "prefixed_id" -> "^[A-Za-z]+#[0-9]+$",
    "upper_code"  -> "^[A-Z_0-9]+$",
    "code"        -> "^[a-z]{2,8}$",
    "phrase"      -> "^.* .*$")

  /** [[semanticTypeDiscovery]] candidates — shared with the oracle. */
  val SemanticCandidates: Seq[(String, String)] = Seq(
    ("events", "props"), ("customer", "c_name"), ("supplier", "s_name"),
    ("documents", "lang"), ("events", "event_type"), ("part", "p_type"),
    ("part", "p_name"), ("region", "r_name"), ("nation", "n_name"))

  /** Semantic typing of string columns — the catalog step above physical
    * types: what a column MEANS (JSON payload, prefixed id, enum-ish
    * code, free phrase), inferred from anchored-regex match shares over
    * non-null values. One aggregate pass per candidate (codegen'd rlike,
    * map-side partial agg — no shuffle beyond the one-row result); the
    * inferred label is the first class in priority order matching ≥ 90%
    * of values, else 'text'. Match shares ride along so a catalog UI can
    * show WHY (and how confidently) a column was typed. */
  def semanticTypes(spark: SparkSession, dir: String,
                    candidates: Seq[(String, String)],
                    threshold: Double = 0.9): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate column")
    val results = candidates.map { case (t, c) =>
      val v = col(c).cast("string")
      val matchSums = SemanticClasses.map { case (label, re) =>
        sum(when(v.rlike(re), 1L).otherwise(0L)).as(s"__m_$label")
      }
      val agged = Lake.table(spark, dir, t)
        .filter(v.isNotNull)
        .agg(count(lit(1)).as("n_values"), matchSums: _*)
      val shares = SemanticClasses.map { case (label, _) =>
        // count/count → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos(s"10000 * `__m_$label`", "n_values")
          .cast("double") / 1e4).as(s"pct_$label")
      }
      val inferred = SemanticClasses.foldRight(lit("text")) {
        case ((label, _), other) =>
          when(col(s"__m_$label").cast("double") / col("n_values") >= threshold,
            label).otherwise(other)
      }
      agged.select(
        (lit(t).as("tbl") +: lit(c).as("column_name") +: col("n_values") +:
          shares :+ inferred.as("inferred_type")): _*)
    }
    results.reduce(_ unionByName _)
      .orderBy(col("tbl"), col("column_name"))
  }

  /** Driver binding of [[semanticTypes]] over the lake's string columns:
    * JSON props, two prefixed ids, language/event codes, two upper-case
    * enum codes, and free phrases. */
  def semanticTypeDiscovery(spark: SparkSession, dir: String): DataFrame =
    semanticTypes(spark, dir, SemanticCandidates)

  /** File-level metadata: per table, number of files and total bytes, from
    * the filesystem (driver-side listing, O(#files) — at 100 TB this is the
    * catalog's manifest scan, not a data read). */
  def fileMetadata(spark: SparkSession, dir: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rows = Lake.tableNames.map { name =>
      val p = new Path(s"$dir/$name.parquet")
      val fs = p.getFileSystem(conf)
      val summary = fs.getContentSummary(p)
      Row(name, summary.getFileCount, summary.getLength)
    }
    val schema = StructType(Seq(
      StructField("table_name", StringType, nullable = false),
      StructField("n_files", LongType, nullable = false),
      StructField("total_bytes", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy(col("table_name"))
  }

  /** The corpus data card: the headline numbers a dataset release ships
    * with, as (metric, value) rows — docs, tokens, source/language
    * breadth, mean length, exact-duplicate rate. ONE corpus scan into a
    * one-row aggregate (count-distincts expand internally, all partial-
    * aggregable), then a map-only explode into the card rows. */
  def dataCard(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val agg = docs.filter(col("text").isNotNull).agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("text")).as("n_uniq_texts"))
    agg.select(explode(array(
      struct(lit("n_docs").as("metric"),
        col("n_docs").cast("double").as("value")),
      struct(lit("n_tokens").as("metric"),
        col("n_tokens").cast("double").as("value")),
      struct(lit("n_sources").as("metric"),
        col("n_sources").cast("double").as("value")),
      struct(lit("n_langs").as("metric"),
        col("n_langs").cast("double").as("value")),
      struct(lit("mean_doc_tokens").as("metric"),
        (ExactRound.halfUpPos("10000 * n_tokens", "n_docs")
          .cast("double") / 1e4).as("value")),
      struct(lit("exact_dup_rate").as("metric"),
        (ExactRound.halfUpPos("10000 * (n_docs - n_uniq_texts)", "n_docs")
          .cast("double") / 1e4).as("value")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
      .orderBy(col("metric"))
  }

  def dataCard(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    dataCard(graft.Lake.documents(spark, dir))

  /** Two-sample Kolmogorov–Smirnov screen over binned distributions: the
    * per-bin cumulative shares of two cohorts and their absolute gap; the
    * KS statistic is the max gap, flagged on its bin. Complements PSI
    * ([[distributionDrift]]): PSI weights per-bin ratio shifts, KS catches
    * location shifts that PSI's symmetric terms smooth away. Bin counts
    * and their running sums are exact integers; the only doubles are the
    * two final divisions on identical integers in any engine. Both
    * windows run over the BOUNDED bin grid, never the table. */
  def ksDrift(spark: SparkSession, dir: String, table: String,
              valueCol: String, sliceA: Column, sliceB: Column,
              binWidth: Double): DataFrame = {
    val g = Lake.table(spark, dir, table).filter(sliceA || sliceB)
      .select(floor(col(valueCol) / binWidth).cast("long").as("bin"),
        when(sliceA, 1L).otherwise(0L).as("ina"),
        when(sliceB, 1L).otherwise(0L).as("inb"))
      .groupBy(col("bin"))
      .agg(sum(col("ina")).as("n_a"), sum(col("inb")).as("n_b"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cdfA = sum(col("n_a")).over(wCum).cast("double") /
      sum(col("n_a")).over(wAll)
    val cdfB = sum(col("n_b")).over(wCum).cast("double") /
      sum(col("n_b")).over(wAll)
    g.select(col("bin"), (col("bin") * binWidth).cast("double").as("bin_lo"),
        col("n_a"), col("n_b"),
        round(cdfA, 6).as("cdf_a"), round(cdfB, 6).as("cdf_b"),
        round(abs(cdfA - cdfB), 6).as("d"))
      .withColumn("is_ks", col("d") === max(col("d")).over(wAll))
      .orderBy(col("bin"))
  }

  /** Driver binding: order-value KS, 1996 cohort vs 1997+ (q_drift's
    * cohorts on q_drift's bins, so the two monitors read side-by-side). */
  def ksDriftQuery(spark: SparkSession, dir: String): DataFrame =
    ksDrift(spark, dir, "orders", "o_totalprice",
      col("o_orderdate") < lit("1997-01-01").cast("timestamp"),
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp"),
      binWidth = 50000.0)

  /** 1-D earth mover's (Wasserstein-1) distance between two cohorts of
    * a binned numeric column — the INTEGRAL drift magnitude beside
    * [[ksDrift]]'s maximum (KS sees the single worst gap; EMD charges
    * every unit of probability mass by how FAR it moved, so a broad
    * small shift and a narrow large one separate): on a 1-D histogram,
    * W₁ = Σ_bins |CDF_a − CDF_b| · binWidth. Same one-scan bin frame as
    * the KS screen; each per-bin |ΔCDF| term is a double over exact
    * integer cumulative counts, 8-rounded into decimal so the bin sum is
    * order-free; the final scaling by binWidth is one multiply. */
  def emdDrift(spark: SparkSession, dir: String, table: String,
               valueCol: String, sliceA: Column, sliceB: Column,
               binWidth: Double): DataFrame = {
    val g = Lake.table(spark, dir, table).filter(sliceA || sliceB)
      .select(floor(col(valueCol) / binWidth).cast("long").as("bin"),
        when(sliceA, 1L).otherwise(0L).as("ina"),
        when(sliceB, 1L).otherwise(0L).as("inb"))
      .groupBy(col("bin"))
      .agg(sum(col("ina")).as("n_a"), sum(col("inb")).as("n_b"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cdfA = sum(col("n_a")).over(wCum).cast("double") /
      sum(col("n_a")).over(wAll)
    val cdfB = sum(col("n_b")).over(wCum).cast("double") /
      sum(col("n_b")).over(wAll)
    g.select(round(abs(cdfA - cdfB), 8).cast(DecimalType(18, 8)).as("t"),
        col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_a")).as("n_rows_a"), sum(col("n_b")).as("n_rows_b"),
        sum(col("t")).as("s"))
      .select(col("n_bins"), col("n_rows_a"), col("n_rows_b"),
        round(col("s"), 6).cast("double").as("emd_bins"),
        // decimal-space multiply + round: s·binWidth is an exact decimal
        // that CAN land on a 2-dp tie (the scale-reduction class)
        round(col("s") * lit(binWidth).cast(DecimalType(18, 2)), 2)
          .cast("double").as("emd_value"))
  }

  /** Driver binding: order-value EMD on the ksDrift cohorts and bins so
    * the maximum-gap and integral-drift readouts sit side-by-side. */
  def emdDriftQuery(spark: SparkSession, dir: String): DataFrame =
    emdDrift(spark, dir, "orders", "o_totalprice",
      col("o_orderdate") < lit("1997-01-01").cast("timestamp"),
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp"),
      binWidth = 50000.0)

  /** Chi-square independence screen between two categorical columns (the
    * association complement to the numeric drift monitors): the
    * contingency table with expected counts under independence and each
    * cell's chi-square contribution, plus the table-wide statistic. One
    * grouped count; row totals, column totals, the grand total and the
    * final χ² all come from windows over the BOUNDED cell frame (r×c
    * rows) — never a second fact scan. Expected counts and cell terms
    * are doubles from exact integers; the χ² total decimal-sums
    * 6-rounded terms (the surprisal discipline) so it is
    * aggregation-order-free. */
  def chi2Independence(rows: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = rows.groupBy(col(colA), col(colB))
      .agg(count(lit(1)).as("n"))
    val wA = Window.partitionBy(col(colA))
    val wB = Window.partitionBy(col(colB))
    val wAll = Window.partitionBy()
    val e = (sum(col("n")).over(wA) * sum(col("n")).over(wB)) /
      sum(col("n")).over(wAll)
    cells
      .withColumn("expected", e)
      .withColumn("term",
        (col("n") - col("expected")) * (col("n") - col("expected")) /
          col("expected"))
      .withColumn("chi2",
        sum(round(col("term"), 6).cast("decimal(18,6)")).over(wAll)
          .cast("double"))
      .select(col(colA), col(colB), col("n"),
        round(col("expected"), 4).as("expected"),
        round(col("term"), 6).as("chi2_term"),
        round(col("chi2"), 4).as("chi2"))
      .orderBy(col(colA), col(colB))
  }

  def chi2Query(spark: SparkSession, dir: String): DataFrame =
    chi2Independence(
      Lake.orders(spark, dir).join(
        broadcast(Lake.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey")),
      "c_mktsegment", "o_orderstatus")

  /** Welch two-sample t-test between two cohorts of a numeric column —
    * the mean-shift complement to the KS (shape) and PSI (share) drift
    * screens. ONE fact scan: per-cohort n, Σx and Σx² both accumulate in
    * exact decimal (a double Σx² would be aggregation-order-dependent),
    * then the means, variances, Welch's t and the Satterthwaite degrees
    * of freedom are pure scalar arithmetic on the one-row frame —
    * identical expression trees in any engine. */
  def welch(rows: DataFrame, valueCol: String,
            cohortA: Column, cohortB: Column): DataFrame = {
    val x = col(valueCol).cast(DecimalType(18, 2))
    val one = rows.agg(
      sum(when(cohortA, 1L).otherwise(0L)).as("n_a"),
      sum(when(cohortB, 1L).otherwise(0L)).as("n_b"),
      sum(when(cohortA, x).otherwise(null)).as("sa"),
      sum(when(cohortB, x).otherwise(null)).as("sb"),
      sum(when(cohortA, x * x).otherwise(null)).as("qa"),
      sum(when(cohortB, x * x).otherwise(null)).as("qb"))
    def variance(q: Column, m: Column, n: Column): Column =
      (q.cast("double") - n.cast("double") * m * m) /
        (n - 1).cast("double")
    one
      .withColumn("m_a", col("sa").cast("double") / col("n_a"))
      .withColumn("m_b", col("sb").cast("double") / col("n_b"))
      .withColumn("v_a", variance(col("qa"), col("m_a"), col("n_a")))
      .withColumn("v_b", variance(col("qb"), col("m_b"), col("n_b")))
      .withColumn("se2",
        col("v_a") / col("n_a") + col("v_b") / col("n_b"))
      .select(col("n_a"), col("n_b"),
        round(col("m_a"), 4).as("mean_a"), round(col("m_b"), 4).as("mean_b"),
        round((col("m_b") - col("m_a")) / sqrt(col("se2")), 4).as("t_stat"),
        round(col("se2") * col("se2") /
          ((col("v_a") / col("n_a")) * (col("v_a") / col("n_a")) /
            (col("n_a") - 1).cast("double") +
           (col("v_b") / col("n_b")) * (col("v_b") / col("n_b")) /
            (col("n_b") - 1).cast("double")), 2).as("welch_df"))
  }

  def welchQuery(spark: SparkSession, dir: String): DataFrame =
    welch(Lake.orders(spark, dir), "o_totalprice",
      col("o_orderdate") < lit("1997-01-01").cast("timestamp"),
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))

  /** One-way ANOVA F across the groups of a categorical column — the
    * k-group member of the comparison family ([[welch]] stops at two
    * cohorts; eta² adds the variance-explained effect size): per-group
    * exact decimal moments (n, Σx, Σx²) off ONE scan, SSB = Σ S_g²/n_g −
    * S²/N and SSW = Σ(Q_g − S_g²/n_g) assembled on the bounded group
    * frame with per-group terms 6-rounded into decimal (an unordered
    * double sum over even five rows is order-dependent), F and eta² one
    * scalar tree. Emits the per-group means with the table-wide
    * F/df/eta² on every row, chi2-screen style. */
  def anovaF(rows: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast(DecimalType(18, 2))
    val g = rows.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_g"), sum(x).as("s_g"),
        sum(x * x).as("q_g"))
    val wAll = Window.partitionBy()
    // per-group between/within contributions as doubles over exact
    // decimals, 6-rounded into decimal before the cross-group sums
    val bTerm = col("s_g").cast("double") * col("s_g").cast("double") /
      col("n_g")
    val wTerm = col("q_g").cast("double") - bTerm
    g
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("n", sum(col("n_g")).over(wAll))
      .withColumn("s", sum(col("s_g")).over(wAll))
      .withColumn("sb",
        sum(round(bTerm, 6).cast(DecimalType(28, 6))).over(wAll))
      .withColumn("sw",
        sum(round(wTerm, 6).cast(DecimalType(28, 6))).over(wAll))
      .withColumn("ssb",
        col("sb").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n"))
      .withColumn("ssw", col("sw").cast("double"))
      .withColumn("f",
        (col("ssb") / (col("k") - 1).cast("double")) /
          (col("ssw") / (col("n") - col("k")).cast("double")))
      // mean_g by exact integer half-up (the theilIndex (2S+n) div (2n)
      // law): a decimal-2 sum over a count can land on an exact .00005
      // where rounding through a double splits the engines; s_g ≥ 0
      // (order totals are positive) so the positive-operand form holds
      .withColumn("sg2", (col("s_g") * 100).cast("long"))
      .select(col(groupCol), col("n_g"),
        (expr("(200 * sg2 + n_g) div (2 * n_g)").cast("double") / 1e4)
          .as("mean_g"),
        (col("k") - 1).as("df_between"),
        (col("n") - col("k")).as("df_within"),
        round(col("f"), 4).as("f_stat"),
        round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta_sq"))
      .orderBy(col(groupCol))
  }

  /** Driver binding: order value across the five market segments. */
  def anovaFQuery(spark: SparkSession, dir: String): DataFrame =
    anovaF(Lake.orders(spark, dir)
      .join(broadcast(Lake.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey")),
      "c_mktsegment", "o_totalprice")

  /** Cohen's d effect-size panel between two cohorts of a numeric
    * column — the magnitude readout the [[welch]] t-test deliberately
    * omits (t grows with √n; d = (m_b−m_a)/s_pooled is sample-size-free
    * and is what a reviewer actually asks for), with Hedges' g
    * small-sample correction g = d·(1 − 3/(4(n_a+n_b)−9)) and the
    * standard normal-approximation CI half-width 1.96·√((nₐ+n_b)/(nₐn_b)
    * + d²/(2(nₐ+n_b))). Identical one-scan exact-decimal moment shape as
    * [[welch]]; everything after is a scalar tree on the one-row frame. */
  def cohensD(rows: DataFrame, valueCol: String,
              cohortA: Column, cohortB: Column): DataFrame = {
    val x = col(valueCol).cast(DecimalType(18, 2))
    val one = rows.agg(
      sum(when(cohortA, 1L).otherwise(0L)).as("n_a"),
      sum(when(cohortB, 1L).otherwise(0L)).as("n_b"),
      sum(when(cohortA, x).otherwise(null)).as("sa"),
      sum(when(cohortB, x).otherwise(null)).as("sb"),
      sum(when(cohortA, x * x).otherwise(null)).as("qa"),
      sum(when(cohortB, x * x).otherwise(null)).as("qb"))
    def variance(q: Column, m: Column, n: Column): Column =
      (q.cast("double") - n.cast("double") * m * m) /
        (n - 1).cast("double")
    val n = col("n_a") + col("n_b")
    one
      .withColumn("m_a", col("sa").cast("double") / col("n_a"))
      .withColumn("m_b", col("sb").cast("double") / col("n_b"))
      .withColumn("v_a", variance(col("qa"), col("m_a"), col("n_a")))
      .withColumn("v_b", variance(col("qb"), col("m_b"), col("n_b")))
      .withColumn("s_pool", sqrt(
        ((col("n_a") - 1).cast("double") * col("v_a") +
          (col("n_b") - 1).cast("double") * col("v_b")) /
          (n - 2).cast("double")))
      .withColumn("d", (col("m_b") - col("m_a")) / col("s_pool"))
      .withColumn("se_d", sqrt(
        n.cast("double") / (col("n_a") * col("n_b")).cast("double") +
          col("d") * col("d") / (lit(2.0) * n.cast("double"))))
      .select(col("n_a"), col("n_b"),
        round(col("m_a"), 4).as("mean_a"), round(col("m_b"), 4).as("mean_b"),
        round(col("s_pool"), 4).as("sd_pooled"),
        round(col("d"), 6).as("cohens_d"),
        round(col("d") * (lit(1.0) -
          lit(3.0) / (lit(4.0) * n.cast("double") - 9)), 6).as("hedges_g"),
        round(col("d") - lit(1.96) * col("se_d"), 6).as("ci_lo"),
        round(col("d") + lit(1.96) * col("se_d"), 6).as("ci_hi"))
  }

  /** Driver binding: the welch cohorts (order value, pre-1997 vs
    * 1997+) so the t-test and its effect size read side-by-side. */
  def cohensDQuery(spark: SparkSession, dir: String): DataFrame =
    cohensD(Lake.orders(spark, dir), "o_totalprice",
      col("o_orderdate") < lit("1997-01-01").cast("timestamp"),
      col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))

  /** Cramér's V — the [0,1]-normalized effect size for the association
    * [[chi2Independence]] only tests: V = √(χ²/(n·(min(r,c)−1))), so a
    * screen can rank column PAIRS across tables on one scale regardless
    * of cell counts. Same one-scan discipline as the χ² screen (cell
    * counts exact, per-cell terms 6-rounded then decimal-summed); the
    * level counts r and c and n are exact integers on the bounded cell
    * frame, and the single √ rounds as a double (tie measure zero). */
  def cramersV(rows: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = rows.groupBy(col(colA), col(colB))
      .agg(count(lit(1)).as("n"))
    val wA = Window.partitionBy(col(colA))
    val wB = Window.partitionBy(col(colB))
    val wAll = Window.partitionBy()
    val e = (sum(col("n")).over(wA) * sum(col("n")).over(wB)) /
      sum(col("n")).over(wAll)
    cells
      .withColumn("expected", e)
      .withColumn("term",
        (col("n") - col("expected")) * (col("n") - col("expected")) /
          col("expected"))
      .withColumn("chi2",
        sum(round(col("term"), 6).cast("decimal(18,6)")).over(wAll)
          .cast("double"))
      .withColumn("n_total", sum(col("n")).over(wAll))
      .withColumn("r_levels",
        size(collect_set(col(colA)).over(wAll)).cast("long"))
      .withColumn("c_levels",
        size(collect_set(col(colB)).over(wAll)).cast("long"))
      .select(col("n_total").as("n"), col("r_levels"), col("c_levels"),
        round(col("chi2"), 4).as("chi2"),
        round(sqrt(col("chi2") /
          (col("n_total") *
            (least(col("r_levels"), col("c_levels")) - 1L)).cast("double")),
          6).as("cramers_v"))
      .limit(1)
  }

  /** Driver binding: order priority × order status — a 5×3 table whose
    * association strength the χ² screen alone can't compare against
    * other pairs. */
  def cramersVQuery(spark: SparkSession, dir: String): DataFrame =
    cramersV(Lake.orders(spark, dir), "o_orderpriority", "o_orderstatus")

  /** Mutual information between two categorical columns, in nats, with
    * both marginal entropies and the normalized MI = I/√(H_a·H_b) — the
    * information-theoretic association screen ([[chi2Independence]]
    * answers "is there dependence"; MI answers "how many nats does one
    * column reveal about the other", comparable across pairs like
    * [[cramersV]] but sensitive to the full joint, not just the largest
    * deviations). One scan → r×c cell frame; every probability is a
    * ratio of exact BIGINTs inside the ln; per-cell and per-marginal
    * terms are 6-rounded then decimal-summed (aggregation-order-free);
    * the final normalization is scalar double arithmetic. Emits the cell
    * frame (joint count + MI contribution per cell) with the table-wide
    * H_a / H_b / MI / NMI on every row, chi2-screen style. */
  def mutualInfo(rows: DataFrame, colA: String, colB: String): DataFrame = {
    val cells = rows.groupBy(col(colA), col(colB))
      .agg(count(lit(1)).as("n"))
    val wA = Window.partitionBy(col(colA))
    val wB = Window.partitionBy(col(colB))
    val wAll = Window.partitionBy()
    val nA = sum(col("n")).over(wA)
    val nB = sum(col("n")).over(wB)
    val nT = sum(col("n")).over(wAll)
    // per-cell MI term (n_ij/n)·ln(n·n_ij/(n_i·n_j)); marginal entropy
    // terms divide each cell's −(n_i/n)ln(n_i/n) evenly-by-construction:
    // summing (term_i / cells-in-row-i) over the row's cells recovers the
    // marginal term exactly once — windows only, no second scan
    val miTerm = col("n").cast("double") / col("nt") *
      log(col("nt").cast("double") * col("n") / (col("na") * col("nb")))
    val haTerm = -(col("na").cast("double") / col("nt")) *
      log(col("na").cast("double") / col("nt")) / col("row_cells")
    val hbTerm = -(col("nb").cast("double") / col("nt")) *
      log(col("nb").cast("double") / col("nt")) / col("col_cells")
    cells
      .withColumn("na", nA).withColumn("nb", nB).withColumn("nt", nT)
      .withColumn("row_cells", count(lit(1)).over(wA))
      .withColumn("col_cells", count(lit(1)).over(wB))
      .withColumn("mi",
        sum(round(miTerm, 6).cast("decimal(18,6)")).over(wAll)
          .cast("double"))
      .withColumn("h_a",
        sum(round(haTerm, 8).cast("decimal(18,8)")).over(wAll)
          .cast("double"))
      .withColumn("h_b",
        sum(round(hbTerm, 8).cast("decimal(18,8)")).over(wAll)
          .cast("double"))
      .select(col(colA), col(colB), col("n"),
        round(miTerm, 6).as("mi_term"),
        round(col("h_a"), 6).as("h_a"),
        round(col("h_b"), 6).as("h_b"),
        round(col("mi"), 6).as("mi"),
        round(col("mi") / sqrt(col("h_a") * col("h_b")), 6).as("nmi"))
      .orderBy(col(colA), col(colB))
  }

  /** Driver binding: language × source over the documents table — how
    * much does knowing the source reveal about the language mix. */
  def mutualInfoQuery(spark: SparkSession, dir: String): DataFrame =
    mutualInfo(Lake.documents(spark, dir), "lang", "source")

  /** Benford first-digit screen — the classic fabricated-/degenerate-data
    * detector for positive amount columns: the observed leading-digit
    * distribution vs Benford's law p(d) = ln(1+1/d)/ln(10), with each
    * digit's chi-square contribution. The leading digit is taken from the
    * INTEGER cent value's decimal string (exact; never floor(log10(x)) on
    * a double, whose correctly-rounded-ness neither engine guarantees at
    * boundaries like 999.9999…). One map + 9-row aggregate — map-side
    * combinable at any scale. The expected shares are evaluated as the
    * same ln-expression in both engines over exact integer counts. */
  def benford(spark: SparkSession, dir: String, table: String,
              valueCol: String): DataFrame = {
    val cents = round(col(valueCol) * 100).cast("long")
    val digits = Lake.table(spark, dir, table)
      .filter(col(valueCol) > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    // total via an unpartitioned window over the ≤9-row digit frame — a
    // separate .agg() subplan would re-run the table scan + group-by
    digits
      .withColumn("n_total", sum(col("n")).over(Window.partitionBy()))
      .withColumn("share", col("n").cast("double") / col("n_total"))
      .withColumn("expected",
        log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
      .select(col("digit"), col("n"),
        round(col("share"), 6).as("share"),
        round(col("expected"), 6).as("expected"),
        round(col("n_total") * (col("share") - col("expected")) *
          (col("share") - col("expected")) / col("expected"), 4).as("chi2_term"))
      .orderBy(col("digit"))
  }

  /** MAD (median-absolute-deviation) robust outlier screen per group —
    * the heavy-tail-safe complement to the Tukey IQR fence: flag rows
    * with |x − median| > k · 1.4826 · MAD (1.4826 scales MAD to σ under
    * normality; k=3 ≈ a robust 3-sigma rule). Two grouped exact-percentile
    * passes (median, then median of absolute deviations) with the
    * bounded per-group constants broadcast back — the same two-pass
    * shape as the Tukey screen; at 100 TB swap `percentile` for
    * `approx_percentile` (same plan, t-digest). */
  def madOutliers(spark: SparkSession, dir: String, table: String,
                  valueCol: String, groupCol: String,
                  k: Double = 3.0): DataFrame = {
    val rows = Lake.table(spark, dir, table)
      .select(col(groupCol), col(valueCol).as("v"))
    val med = rows.groupBy(col(groupCol))
      .agg(expr("percentile(v, 0.5D)").as("med"))
    val mad = rows.join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(expr("percentile(abs(v - med), 0.5D)").as("mad"),
        first(col("med")).as("med"))
    rows.join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        // one pre-computed double literal so the oracle can render the
        // identical constant (k*1.4826 folded differently would move
        // borderline rows)
        sum(when(abs(col("v") - col("med")) > lit(k * 1.4826) * col("mad"),
          1L).otherwise(0L)).as("n_outliers"),
        round(first(col("med")), 4).as("median"),
        round(first(col("mad")), 4).as("mad"))
      .orderBy(col(groupCol))
  }

  /** JSON property-schema inventory over a semi-structured string
    * column — the catalog answer to "what's actually inside `props`":
    * one row per JSON key with its event coverage, numeric-value share,
    * and numeric range. ONE scan: `explode_outer` keeps every event row
    * (malformed/null JSON becomes a null-key row), so the coverage
    * denominator is a window total over the BOUNDED key frame — no
    * second scan for the row count. At 100 TB the key universe is the
    * bounded side (schemas have dozens of keys, not millions). */
  def jsonSchema(spark: SparkSession, dir: String): DataFrame = {
    val parsed = Lake.events(spark, dir)
      .select(posexplode_outer(from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)))
        .as(Seq("pos", "key", "value")))
    val numeric = col("value").rlike("^-?[0-9]+(\\.[0-9]+)?$")
    // n_first counts each EVENT once (its pos-0 key, or its single
    // null-key row when the JSON is null/empty), so the window total
    // over the bounded key frame is the true event count — a multi-key
    // object never inflates the coverage denominator
    val keyed = parsed
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_present"),
        sum(when(coalesce(col("pos"), lit(0)) === 0, 1L).otherwise(0L))
          .as("n_first"),
        sum(when(numeric, 1L).otherwise(0L)).as("n_numeric"),
        round(min(when(numeric, col("value").cast("double"))), 4)
          .as("min_num"),
        round(max(when(numeric, col("value").cast("double"))), 4)
          .as("max_num"))
    keyed
      .withColumn("n_total",
        sum(col("n_first")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("key").isNotNull)
      .select(col("key"), col("n_present"),
        // count/count → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * n_present", "n_total")
          .cast("double") / 1e4).as("coverage"),
        (ExactRound.halfUpPos("10000 * n_numeric", "n_present")
          .cast("double") / 1e4).as("numeric_share"),
        col("min_num"), col("max_num"))
      .orderBy(col("key"))
  }

  /** Poisson(1) cumulative probabilities, P(X ≤ k) for k = 0..7, as
    * fixed 10-digit literals: BOTH engines compare the same uniform
    * against the same constants, so replica weights are deterministic
    * everywhere (a library pdf evaluated at run time could differ in the
    * last ulp and flip a draw). Mass above k = 7 (~1e-5) maps to 8. */
  private val PoissonCum = Seq(
    0.3678794412, 0.7357588823, 0.9196986029, 0.9810118431,
    0.9963401532, 0.9994058152, 0.9999167589, 0.9999897508)

  /** Poisson-bootstrap confidence interval for the mean order value —
    * uncertainty quantification that actually scales: the classic
    * multinomial bootstrap needs a global resample per replica, but
    * giving every row an INDEPENDENT Poisson(1) weight per replica is
    * statistically equivalent at large n and embarrassingly parallel
    * (the streaming-bootstrap construction used for massive data). Each
    * of `reps` replicas draws its weights deterministically: uniform =
    * portable 60-bit hash of (salt, row id, replica) / 2^60, weight =
    * inverse CDF via [[PoissonCum]] — retry-stable, oracle-verifiable,
    * never rand().
    *
    * ONE fact scan: the explode fans each row into `reps` weighted
    * copies, the replica aggregate is map-side combinable (64 output
    * rows), and the unweighted point-estimate sums ride the SAME
    * aggregate (identical per replica, collapsed by max) — no second
    * pass. Replica means are single double divisions of exact decimal /
    * BIGINT sums; the 2.5 / 97.5 percentile interpolates over the
    * bounded replica frame. */
  def bootstrapCi(spark: SparkSession, dir: String,
                  reps: Int = 64): DataFrame = {
    require(reps >= 2, "need at least 2 replicas")
    val rows = Lake.orders(spark, dir)
      .select(col("o_orderkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("x"))
      .withColumn("b", explode(sequence(lit(0), lit(reps - 1))))
    val u = TextOps.portableHash60(concat_ws("|",
      lit("graft-boot"), col("o_orderkey").cast("string"),
      col("b").cast("string"))).cast("double") / lit((1L << 60).toDouble)
    val w = PoissonCum.zipWithIndex
      .foldLeft(when(lit(false), 0)) { case (acc, (t, k)) =>
        acc.when(u < lit(t), k)
      }
      .otherwise(PoissonCum.size)
    val g = rows
      .withColumn("w", w)
      .groupBy(col("b"))
      .agg(sum(col("x") * col("w")).as("sw"),
        sum(col("w").cast("long")).as("nw"),
        sum(col("x")).as("sx"), count(lit(1)).as("c"))
      .withColumn("mean_b", col("sw").cast("double") / col("nw"))
    g.agg(
        count(lit(1)).as("n_replicas"),
        max(col("c")).as("n_orders"),
        max(col("sx")).as("sx"),
        expr("percentile(mean_b, array(0.025D, 0.975D))").as("q"))
      // decimal-2 sum / count → exact integer half-up ([[ExactRound]])
      .withColumn("sx2", (col("sx") * 100).cast("long"))
      .select(
        col("n_replicas"), col("n_orders"),
        (ExactRound.halfUpPos("100 * sx2", "n_orders")
          .cast("double") / 1e4).as("point_mean"),
        round(col("q").getItem(0), 4).as("lo95"),
        round(col("q").getItem(1), 4).as("hi95"))
  }

  /** The default candidate set for [[approxFds]]: one plausibly-exact
    * dependency per shape (constant-valued dependents) and several
    * deliberately-violated ones, so the report exercises both ends of
    * the g₃ range on the synthetic lake. */
  val DefaultAfdCandidates: Seq[(String, String, String)] = Seq(
    ("documents", "source", "lang"),
    ("documents", "lang", "source"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("orders", "o_orderdate", "o_orderstatus"),
    ("lineitem", "l_returnflag", "l_linestatus"))

  /** Approximate functional-dependency discovery — the g₃ error of
    * Kivinen–Mannila: for each candidate X→Y, the minimum fraction of
    * rows whose deletion makes the FD exact, 1 − Σ_x max_y n(x,y) / N.
    * The approximate complement of the exact [[fdReport]]-style screen:
    * a NEAR-dependency (g₃ ≤ a few %) is a data-quality signal an exact
    * test throws away entirely. Reports per candidate the row/group
    * counts, the violating row mass, and g₃ pinned at 6 dp by exact
    * integer half-up ([[ExactRound]] — count/count); `holds_exact`
    * rides as a 0/1 long for cross-engine hash parity.
    *
    * Scale: one (X,Y) aggregate + one X reduce per candidate — fully
    * map-side-combinable, no windows, output one row per candidate. */
  /** The default [[keyDiscovery]] candidates: every table's expected
    * primary key, the lineitem composite, and two deliberate NON-keys
    * so the report exercises both verdicts. */
  val DefaultKeyCandidates: Seq[(String, Seq[String])] = Seq(
    ("region", Seq("r_regionkey")), ("nation", Seq("n_nationkey")),
    ("customer", Seq("c_custkey")), ("supplier", Seq("s_suppkey")),
    ("part", Seq("p_partkey")), ("orders", Seq("o_orderkey")),
    ("orders", Seq("o_custkey")),
    ("lineitem", Seq("l_orderkey", "l_linenumber")),
    ("lineitem", Seq("l_orderkey")),
    ("events", Seq("event_id")), ("documents", Seq("doc_id")),
    ("embeddings", Seq("vec_id")))

  /** Key-candidate discovery — the catalog primitive behind PK
    * inference, join planning, and upsert-key validation: for each
    * candidate column set, is (NDV == row count AND no nulls)? Exact
    * distinct counts (one aggregate per candidate — at 100 TB the HLL
    * twin [[profile]]'s `exactNdv = false` path screens first and this
    * confirms survivors); a composite candidate counts distinct TUPLES
    * with the all-columns-non-null convention both engines share.
    * `is_key` rides as a 0/1 long for cross-engine hash parity. */
  def keyDiscovery(spark: SparkSession, dir: String,
                   candidates: Seq[(String, Seq[String])] =
                     DefaultKeyCandidates): DataFrame = {
    require(candidates.nonEmpty, "keyDiscovery needs candidates")
    candidates.map { case (tbl, cols) =>
      val t = Lake.table(spark, dir, tbl)
      val nonNull = cols.map(c => col(c).isNotNull).reduce(_ && _)
      t.agg(count(lit(1)).as("n_rows"),
          countDistinct(cols.head, cols.tail: _*).as("ndv"),
          sum(when(nonNull, 1L).otherwise(0L)).as("n_nonnull"))
        .select(lit(tbl).as("tbl"),
          lit(cols.mkString(",")).as("columns"),
          col("n_rows"), col("ndv"), col("n_nonnull"),
          when(col("ndv") === col("n_rows") &&
            col("n_nonnull") === col("n_rows"), 1L).otherwise(0L)
            .as("is_key"))
    }.reduce(_ unionByName _)
      .orderBy(col("tbl"), col("columns"))
  }

  def approxFds(spark: SparkSession, dir: String,
                candidates: Seq[(String, String, String)] =
                  DefaultAfdCandidates): DataFrame = {
    require(candidates.nonEmpty, "approxFds needs at least one candidate")
    candidates.map { case (tbl, det, dep) =>
      Lake.table(spark, dir, tbl)
        .groupBy(col(det).as("x"), col(dep).as("y"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("x"))
        .agg(max(col("c")).as("keep"), sum(col("c")).as("tot"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("keep")).as("kept"), sum(col("tot")).as("n_rows"))
        .select(lit(tbl).as("tbl"), lit(det).as("determinant"),
          lit(dep).as("dependent"), col("n_rows"), col("n_groups"),
          (col("n_rows") - col("kept")).as("violations"),
          (ExactRound.halfUpPos("1000000 * (n_rows - kept)", "n_rows")
            .cast("double") / 1e6).as("g3_err"),
          when(col("n_rows") === col("kept"), 1L).otherwise(0L)
            .as("holds_exact"))
    }.reduce(_ unionByName _)
      .orderBy(col("tbl"), col("determinant"), col("dependent"))
  }
}
