package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps

/** Batch event-op semantics on planted data — cases the synthetic corpus
  * does not exercise (exact microsecond ties). */
class EventOpsSpec extends SparkSpecBase {

  test("funnelWithin: microsecond ties never mask an earlier qualifying event") {
    import spark.implicits._
    val ev = Seq(
      // user 1: a view TIED with the click (us=200) must not shadow the
      // qualifying view at 100 — the oracle's strict v.ts < c.ts counts it
      (1L, "view", 1L, 100L), (1L, "view", 2L, 200L),
      (1L, "click", 3L, 200L), (1L, "purchase", 4L, 300L),
      // user 2: the ONLY view is tied with the click → no strictly earlier
      // view → must not convert
      (2L, "view", 5L, 200L), (2L, "click", 6L, 200L),
      (2L, "purchase", 7L, 300L),
      // user 3: a click TIED with the purchase must not shadow the
      // qualified click at 200
      (3L, "view", 8L, 100L), (3L, "click", 9L, 200L),
      (3L, "click", 10L, 300L), (3L, "purchase", 11L, 300L))
      .toDF("user_id", "event_type", "event_id", "us_raw")
      .select(col("user_id"), col("event_type"), col("event_id"),
        timestamp_micros(col("us_raw")).as("ts"))
    val out = EventOps.funnelWithin(ev, horizonHours = 24)
      .as[Long].collect().toSeq
    assert(out == Seq(1L, 3L))
  }
}
