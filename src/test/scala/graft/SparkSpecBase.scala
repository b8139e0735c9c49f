package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (getOrCreate — one JVM, one
  * session) over the smallest driver-provisioned test data. */
trait SparkSpecBase extends AnyFunSuite {
  val Sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val capturedPlans = new scala.collection.mutable.ArrayBuffer[String]
  private lazy val planCaptureListener =
    new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        capturedPlans.synchronized { capturedPlans += qe.executedPlan.toString }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }

  /** Every executed plan fired while `build` constructs its frame, plus the
    * final frame's (possibly lazy) plan. Operators that eagerly
    * localCheckpoint (the cache-release discipline) return an RDD-scan
    * plan, so the final plan alone makes shape assertions vacuous — their
    * REAL plans surface here through the listener, because checkpoint
    * materialization runs as a tracked Dataset action. */
  def allPlansOf(build: => org.apache.spark.sql.DataFrame): Seq[String] = {
    spark.listenerManager.register(planCaptureListener)
    try {
      capturedPlans.synchronized(capturedPlans.clear())
      val df = build
      org.apache.spark.sql.graft.Bridge.flushListenerBus(spark)
      capturedPlans.synchronized(capturedPlans.toSeq) :+
        df.queryExecution.executedPlan.toString
    } finally spark.listenerManager.unregister(planCaptureListener)
  }
}
