package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{ArmMetric, ArmMoments, MsprtStream}

/** Streaming mSPRT monitor: per-arm moments accumulate exactly across
  * micro-batches, and the pValue combiner agrees with the batch
  * msprtReadout's oracle-checked scalar tree on binary-exact values. */
class MsprtStreamSpec extends SparkSpecBase {

  test("arm moments accumulate and the streaming p matches the batch readout") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      GraftSession.RocksDbProvider)
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val tmp = Files.createTempDirectory("graft_msprt_stream").toString
      val input = MemoryStream[ArmMetric]
      val q = MsprtStream.armMoments(input.toDS()).writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[ArmMoments], _: Long) =>
          df.write.mode("append").parquet(s"$tmp/out"); ()
        }
        .option("checkpointLocation", s"$tmp/ckpt").start()
      def batch(): Seq[ArmMetric] =
        (0 until 10).flatMap(i => Seq(ArmMetric("A", 10.0 + (i % 2)),
          ArmMetric("B", 30.0 + (i % 2))))
      try {
        input.addData(batch()); q.processAllAvailable()
        input.addData(batch()); q.processAllAvailable()
      } finally q.stop()

      val rows = spark.read.parquet(s"$tmp/out").collect()
        .map(r => ArmMoments(r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3)))
      val latest = rows.groupBy(_.arm).view.mapValues(_.maxBy(_.n)).toMap
      // 20 values per arm per batch, alternating ±0 / ±1 — exact doubles
      assert(latest("A") == ArmMoments("A", 20L, 210.0, 2210.0), latest("A"))
      assert(latest("B") == ArmMoments("B", 20L, 610.0, 18610.0), latest("B"))

      // the streaming combine must equal the batch readout on the same data
      val (lift, loglam, p) = MsprtStream.pValue(latest("A"), latest("B"))
      val ev = (0 until 10).flatMap(i => Seq(
          (0L, "2024-01-05 00:00:00", 10.0 + (i % 2)),
          (1L, "2024-01-05 00:00:00", 30.0 + (i % 2)),
          (0L, "2024-01-05 01:00:00", 10.0 + (i % 2)),
          (1L, "2024-01-05 01:00:00", 30.0 + (i % 2))))
        .toDF("user_id", "ts_s", "value")
        .select($"user_id", $"ts_s".cast("timestamp").as("ts"), $"value")
      val b = graft.operators.EventOps.msprtReadout(ev).collect().last
      def r6(x: Double) = BigDecimal(x).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r6(lift) == b.getDouble(3), s"lift $lift vs $b")
      // log space never saturates: the planted effect's ln Λ is a big
      // FINITE number in both forms (the raw ratio would be Infinity)
      assert(loglam.isFinite && b.getDouble(4).isFinite,
        s"log_lambda must be finite: $loglam vs $b")
      assert(r6(loglam) == b.getDouble(4), s"log_lambda $loglam vs $b")
      assert(r6(p) == b.getDouble(5), s"p $p vs $b")
      assert(p < 0.05, "the planted 20-point lift must be significant")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
