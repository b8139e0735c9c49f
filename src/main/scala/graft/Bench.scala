package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at the env-selected
  * scale factor and prints ONE JSON line. A small warmup query absorbs
  * one-time JVM/codegen cost so per-query numbers reflect steady state.
  * Each query runs `SPARK_GRAFT_REPEATS` times (default 3) and reports the
  * MEDIAN — single-shot numbers on a shared host have shown up to 2×
  * run-to-run contention noise, which medians mostly cancel; failures
  * surface per-query as negative time + stderr detail. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt)
    val spark = GraftSession.builder("graft-bench", Some(s"local[$cpus]"), cpus.toInt)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","repeats":$reps}""")
    spark.stop()
  }
}
