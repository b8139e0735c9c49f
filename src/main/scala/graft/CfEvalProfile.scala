package graft

/** Reproducible pass-by-pass breakdown of `q_cf_eval`
  * ([[graft.operators.Relational.cfHitRate]]) — the harness behind the
  * floor analysis in that operator's scaladoc. Each internal stage is
  * force-materialized in dependency order and timed through the
  * operator's own timing sink, so the printed numbers ARE the
  * operator's stages, not proxy queries. Usage:
  * {{{
  *   GRAFT_BENCH_THREADS=32 tools/run.sh graft.CfEvalProfile /root/testdata/sf0.1
  * }}}
  * Shares BenchOne's session shape (same local[k], same
  * shuffle.partitions, warmup scan) so the total is comparable to a
  * BenchOne median modulo ambient load. Profile mode adds eager
  * `count()`s the production path does not run (it materializes the
  * same frames lazily through their consumers), so the stage SUM can
  * slightly exceed a production run — it never understates a stage. */
object CfEvalProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "3").toIntOption.getOrElse(3)
    val threads = sys.env.getOrElse("GRAFT_BENCH_THREADS", "8").toInt
    val spark = GraftSession.builder("cf-eval-profile", Some(s"local[$threads]"), threads)
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try Lake.region(spark, sfDir).groupBy("r_name").count().count()
    catch { case _: Throwable => }
    for (rep <- 1 to reps) {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      val t0 = System.nanoTime()
      graft.operators.Relational.cfHitRate(spark, sfDir, 2L, 5, Some(buf))
        .count()
      val total = (System.nanoTime() - t0) / 1e9
      val lines = buf.map { case (n, s) => f"$n=$s%.2fs" }.mkString(" ")
      println(f"CFEVAL rep=$rep total=$total%.2fs $lines")
    }
    spark.stop()
  }
}
