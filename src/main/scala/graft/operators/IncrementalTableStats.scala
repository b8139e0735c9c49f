package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{FreqFunctions, KllFunctions}
import graft.sources.SnapshotTable

/** The incremental-statistics contract wired to the snapshot table: a
  * stats SIDECAR holding one sketch row per committed version —
  * (n_rows, HLL NDV sketch, KLL quantile sketch, frequent-items sketch).
  *
  * [[refresh]] sketches ONLY versions without a sidecar row yet, so the
  * cost of keeping a 100 TB table's profile current is proportional to
  * the data committed since the last refresh, never to history.
  * [[profile]] merges all sidecar rows into the table's current profile
  * (row count exact; NDV / quantiles / top values within each sketch's
  * documented error) without touching the table at all.
  *
  * Sidecar layout mirrors the table: `<statsDir>/v=N` parquet, so a
  * plain partitioned read discovers the `v` column and vacuumed table
  * versions keep their (still-valid) sketch history.
  */
object IncrementalTableStats {

  /** Versions that already have a COMPLETE sidecar row: the `v=N` dir
    * must carry parquet's `_SUCCESS` commit marker, so a refresh that
    * crashed mid-write is redone (mode Overwrite), never skipped. */
  def sketchedVersions(spark: SparkSession, statsDir: String): Set[Long] = {
    val p = new Path(statsDir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return Set.empty
    f.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v="))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong)
      .filter(v => f.exists(new Path(p, s"v=$v/_SUCCESS")))
      .toSet
  }

  /** Sketch every committed table version not yet in the sidecar; one
    * aggregate pass per NEW version only. `stringCol` feeds the NDV and
    * frequent-items sketches, `numCol` the quantile sketch. Returns the
    * versions sketched by this call. */
  def refresh(spark: SparkSession, tableDir: String, statsDir: String,
              stringCol: String, numCol: String): Seq[Long] = {
    val done = sketchedVersions(spark, statsDir)
    val todo = SnapshotTable.versions(spark, tableDir).filterNot(done)
    todo.foreach { v =>
      SnapshotTable.read(spark, tableDir, Some(v))
        .agg(
          count(lit(1)).as("n_rows"),
          hll_sketch_agg(col(stringCol)).as("ndv_sketch"),
          KllFunctions.kllSketchAgg(col(numCol)).as("q_sketch"),
          FreqFunctions.freqSketchAgg(col(stringCol)).as("freq_sketch"))
        .write.mode("overwrite").parquet(s"$statsDir/v=$v")
    }
    todo
  }

  /** The table's current profile from sidecar sketches alone: exact total
    * rows, merged-HLL NDV, merged-KLL quantiles, merged top values. */
  def profile(spark: SparkSession, statsDir: String,
              ranks: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame =
    spark.read.parquet(statsDir)
      .agg(
        sum(col("n_rows")).as("n_rows"),
        hll_sketch_estimate(hll_union_agg(col("ndv_sketch"))).as("ndv_estimate"),
        KllFunctions.kllQuantiles(
          KllFunctions.kllMergeAgg(col("q_sketch")), ranks).as("quantiles"),
        FreqFunctions.freqTopItems(
          FreqFunctions.freqMergeAgg(col("freq_sketch"))).as("top_values"))

  /** HLL bucket-count exponent for [[hllNdv]]: m = 2^6 = 64 registers. */
  val HllB: Int = 6
  /** Register cap: the portable hash leaves 60−b suffix bits. */
  val HllCap: Int = 54

  /** Hand-rolled HyperLogLog NDV per group, built ONLY from
    * cross-engine-portable pieces so the whole sketch — every register,
    * the harmonic sum, the bias/linear-counting branch — is value-checked
    * against the oracle, not "within error, trust me" (the [[profile]]
    * sidecar uses Spark's binary HLL sketches, which no other engine can
    * replay; this is the auditable twin). Distinct users per event type:
    *
    *  - register j = low-b bits of the portable md5 hash; rho = position
    *    of the lowest set suffix bit (geometric(1/2), Flajolet–Martin
    *    style), capped at 54.
    *  - the harmonic sum Σ2^(−Mⱼ) is computed EXACTLY as the integer
    *    Σ2^(54−Mⱼ) in a long (≤ 2^60) — no float accumulation order to
    *    disagree on — and converted to double once.
    *  - raw estimate α·m²/S with linear counting below 2.5m when empty
    *    registers remain (both engines branch on identical doubles).
    *
    * Scale: one shuffle to (group × m) registers (map-side max-combine),
    * then a groups-bounded reduce; the exact-NDV column beside it is the
    * audit — at 100 TB you'd drop it and keep the sketch. */
  def hllNdv(events: DataFrame): DataFrame = {
    val m = 1 << HllB
    val h = TextOps.portableHash60(col("user_id").cast("string"))
    val sfx = shiftright(h, HllB)
    val rho = (1 until HllCap).foldRight(lit(HllCap): org.apache.spark.sql.Column) {
      (r, els) =>
        when(shiftright(col("sfx"), r - 1).bitwiseAND(lit(1L)) === 1L, lit(r))
          .otherwise(els)
    }
    val regs = events
      .select(col("event_type"), h.bitwiseAND(lit((m - 1).toLong)).as("bucket"),
        sfx.as("sfx"))
      .withColumn("rho", rho)
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(col("rho")).as("mj"))
    val buckets = events.sparkSession.range(1)
      .select(explode(sequence(lit(0L), lit((m - 1).toLong))).as("bucket"))
    val grid = events.select(col("event_type")).distinct()
      .crossJoin(broadcast(buckets))
      .join(regs, Seq("event_type", "bucket"), "left")
      .withColumn("mj", coalesce(col("mj"), lit(0)))
    val agg = grid.groupBy(col("event_type"))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($HllCap - mj AS INT))"))
          .as("t_sum"),
        sum(when(col("mj") === 0, 1L).otherwise(0L)).as("n_zero_regs"))
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("ndv_exact"))
    val am2 = 0.709 * (m.toDouble * m.toDouble) // 2904.064
    val pow2cap = math.pow(2.0, HllCap)         // exact double
    val eRaw = lit(am2) / (col("t_sum").cast("double") / lit(pow2cap))
    agg.join(exact, "event_type")
      .withColumn("e_raw", eRaw)
      .select(col("event_type"), col("ndv_exact"), col("n_zero_regs"),
        round(
          when(col("e_raw") <= lit(2.5 * m) && col("n_zero_regs") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero_regs")))
            .otherwise(col("e_raw")), 4).as("ndv_hll"))
      // |round(est,4) − exact|/exact is terminating once the estimate
      // is pinned at 4 dp → exact integer half-up ([[ExactRound]])
      .withColumn("n4", round(col("ndv_hll") * 10000).cast("long"))
      .withColumn("rel_err",
        ExactRound.halfUpPos("10000 * abs(n4 - 10000 * ndv_exact)",
          "10000 * ndv_exact").cast("double") / 1e4)
      .drop("n4")
      .orderBy(col("event_type"))
  }

  def hllNdv(spark: SparkSession, dir: String): DataFrame =
    hllNdv(graft.Lake.events(spark, dir))
}
