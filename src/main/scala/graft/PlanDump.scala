package graft

/** Dump `.explain("formatted")` for the NAMED queries to files — the
  * plan-evidence artifact of the optimization rounds (plans/rNN/): each
  * query's formatted physical plan is written to `<outDir>/<query>_<tag>.txt`
  * without executing the query (planning only, so a dump never perturbs a
  * concurrent bench). Usage:
  * `runMain graft.PlanDump <sfDir> <outDir> <tag> <query> [<query> ...]`.
  * Session shape matches Bench (shuffle partitions = threads, stable
  * artifact root) so the dumped plan is the one the bench executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val threads = sys.env.getOrElse("GRAFT_BENCH_THREADS", "8").toInt
    val spark = GraftSession.builder("plan-dump", Some(s"local[$threads]"), threads)
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.artifactRoot",
      new java.io.File(sys.props("java.io.tmpdir"), "graft_artifacts").getAbsolutePath)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- args.drop(3)) {
      val fn = SparkEntry.queries(name)
      val plan = try {
        val df = fn(spark, sfDir)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => s"PLAN FAILED: ${e}" }
      val p = java.nio.file.Paths.get(outDir, s"${name}_${tag}.txt")
      java.nio.file.Files.write(p, plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $p (${plan.length} chars)")
    }
    spark.stop()
  }
}
