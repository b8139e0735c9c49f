package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at the env-selected
  * scale factor and prints ONE JSON line. A small warmup query absorbs
  * one-time JVM/codegen cost so per-query numbers reflect steady state.
  * Each query runs `SPARK_GRAFT_REPEATS` times (default 3) and reports the
  * MEDIAN — single-shot numbers on a shared host have shown up to 2×
  * run-to-run contention noise, which medians mostly cancel; failures
  * surface per-query as negative time + stderr detail.
  *
  * Comparability metadata (the round-7 lesson — a silent testdata
  * regeneration and an ambient-load window both moved per-query
  * baselines with no record):
  *  - `tables`: row counts of the benched tables, so a regenerated
  *    corpus can never silently shift baselines again;
  *  - `loadavg_start`/`loadavg_end`: the host's 1-min load average
  *    around the sweep — read per-query numbers against it;
  *  - `sentinels`: the designated shuffle-light contention gauges.
  *    Before reading ANY per-query delta vs a previous round, compare
  *    the sentinel medians first: broad sentinel inflation means the
  *    HOST moved, not the code. */
object Bench {
  /** Shuffle-light, scan-shaped queries whose medians have historically
    * tracked ambient host load, not code changes. */
  val Sentinels: Seq[String] =
    Seq("q_scan_filter", "q_string_funcs", "q_lang_quality", "q_moving_avg")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt)
    val spark = GraftSession.builder("graft-bench", Some(s"local[$cpus]"), cpus.toInt)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // warmup: one tiny end-to-end job (scan + agg + shuffle + codegen)
    try Lake.region(spark, sfDir).groupBy("r_name").count().count()
    catch { case _: Throwable => }
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = Seq.fill(reps)(timeOnce(name, fn))
      val ok = times.filter(_ >= 0).sorted
      // median of the successful runs (even count → lower middle, so the
      // reported value is always an observed time)
      name -> (if (ok.isEmpty) -1.0 else ok((ok.size - 1) / 2))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadEnd = loadAvg
    val cards = Seq("lineitem", "orders", "events", "documents", "embeddings")
      .map { t =>
        val n = try Lake.table(spark, sfDir, t).count() catch { case _: Exception => -1L }
        "\"" + t + "\":" + n
      }.mkString("{", ",", "}")
    val sent = Sentinels.map { s =>
      "\"" + s + "\":" + results.toMap.getOrElse(s, -1.0)
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","repeats":$reps,"tables":$cards,"sentinels":$sent,"loadavg_start":$loadStart,"loadavg_end":$loadEnd}""")
    spark.stop()
  }
}
