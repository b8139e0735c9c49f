package graft

import org.apache.spark.sql.functions._

import graft.operators.EventOps
import graft.plans.AsofJoin

/** The native sort-merge as-of join: semantics against hand-built edges,
  * equivalence with the window formulation, and the plan shape (one
  * exchange per side, the custom exec node present). */
class AsofJoinSpec extends SparkSpecBase {

  test("as-of semantics: latest same-key right row at or before each left time") {
    import spark.implicits._
    val quotes = Seq( // (key, time, price)
      ("A", 1L, 1.0), ("A", 5L, 5.0), ("A", 9L, 9.0),
      ("B", 4L, 40.0)).toDF("sym", "qt", "price")
    val trades = Seq(
      ("A", 0L), ("A", 5L), ("A", 7L), ("A", 100L),
      ("B", 3L), ("B", 4L), ("C", 2L)).toDF("sym", "tt")
      .withColumnRenamed("sym", "t_sym")
    val out = AsofJoin(trades, quotes, "t_sym", "sym", "tt", "qt")
      .select(col("t_sym"), col("tt"), col("price"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out == Map(
      ("A", 0L) -> None,        // before any quote
      ("A", 5L) -> Some(5.0),   // exact-time match included
      ("A", 7L) -> Some(5.0),   // latest preceding
      ("A", 100L) -> Some(9.0), // far future -> last quote
      ("B", 3L) -> None,        // other key's quotes invisible
      ("B", 4L) -> Some(40.0),
      ("C", 2L) -> None))       // key with no quotes at all
  }

  test("null right keys/times never match; null left keys get null columns") {
    import spark.implicits._
    val right = Seq((Some("A"), Some(1L), 1.0), (None, Some(2L), 2.0),
      (Some("A"), None, 3.0)).toDF("sym", "qt", "price")
    val left = Seq((Some("A"), 5L), (None, 5L)).toDF("t_sym", "tt")
    val out = AsofJoin(left, right, "t_sym", "sym", "tt", "qt")
      .select(col("t_sym"), col("price")).collect()
      .map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out == Map(Some("A") -> Some(1.0), None -> None))
  }

  test("native as-of matches the window formulation on the events table") {
    val window = EventOps.asofLastView(spark, Sf).collect()
    val native = EventOps.asofLastViewNative(spark, Sf).collect()
    assert(window.length == native.length)
    for ((w, n) <- window.zip(native)) assert(w == n, s"\n$w\nvs\n$n")
  }

  test("plan: custom exec node, one exchange per side, sorted by (key, time)") {
    val plan = EventOps.asofLastViewNative(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom operator missing:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected one hash exchange per side, got $exchanges:\n$plan")
    assert(!plan.contains("Window"), "native path must not fall back to a window")
  }
}
