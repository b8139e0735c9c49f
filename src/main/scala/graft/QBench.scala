package graft

/** Ad-hoc single-query timer for local iteration: times just the queries
  * named on the command line (default SF dir sf0.1), printing per-run
  * seconds. `Bench` stays the driver-facing full sweep; this exists so a
  * perf fix to one query doesn't cost a full-sweep run to measure. */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val spark = GraftSession.builder("graft-qbench", Some(s"local[$cpus]"), cpus.toInt)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try Lake.region(spark, sfDir).groupBy("r_name").count().count()
    catch { case _: Throwable => }
    for (name <- args; r <- 1 to reps) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[qbench] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
