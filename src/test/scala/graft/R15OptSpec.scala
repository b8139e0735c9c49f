package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{CatalogOps, DedupOps, EventOps, Relational}

/** Round-15 optimization equivalence guards: every operator whose
  * internals were restructured for scale is pinned, row-for-row, to the
  * formulation it replaced (computed inline here, on the fixture lake,
  * exactly as the operator used to). A plan probe additionally keeps the
  * O(n²) shrinking window frames from re-entering the two rewritten
  * sites. */
class R15OptSpec extends SparkSpecBase {

  test("quantileBins (frequency form) matches the global-sort ntile form row-for-row") {
    // the pre-r15 formulation, verbatim: global ntile over the
    // (price, orderkey, linenumber) total order, then per-bin readout
    val w = Window.orderBy(col("l_extendedprice"), col("l_orderkey"),
      col("l_linenumber"))
    val old = Lake.table(spark, Sf, "lineitem")
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("bin", ntile(10).over(w))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col("l_extendedprice")), 2).as("lo"),
        round(max(col("l_extendedprice")), 2).as("hi"))
      .orderBy(col("bin"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.get(2), r.get(3)))
    // freqPathMinRows = 0 forces the frequency form (the default guard
    // would route sf0.001 through the ntile branch and make this vacuous)
    val got = CatalogOps.quantileBins(spark, Sf, freqPathMinRows = 0L).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.get(2), r.get(3)))
    assert(got.toSeq == old.toSeq)
  }

  test("quantileBins bin sizes stay exact when N is not divisible by nBins") {
    // nBins=7: sf0.001 lineitem count is not a multiple of 7, so the
    // first (N mod 7) bins must carry exactly one extra row
    val n = Lake.table(spark, Sf, "lineitem").count()
    val rows = CatalogOps.quantileBins(spark, Sf, nBins = 7,
      freqPathMinRows = 0L).collect()
    assert(rows.map(_.getLong(1)).sum == n)
    val base = n / 7
    rows.foreach { r =>
      val k = r.getInt(0)
      val expect = base + (if (k <= n % 7) 1L else 0L)
      assert(r.getLong(1) == expect, s"bin $k size")
    }
  }

  test("attribution conv_grp rewrite (total − running) equals the shrinking-frame sum") {
    val ev = Lake.events(spark, Sf)
    val isP = when(col("event_type") === "purchase", 1L).otherwise(0L)
    val wBack = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val old = ev.withColumn("conv_grp", sum(isP).over(wBack))
      .select(col("event_id"), col("conv_grp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val neu = ev.withColumn("conv_grp",
        sum(isP).over(byUser.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)) -
        coalesce(sum(isP).over(byUser.rowsBetween(Window.unboundedPreceding,
          -1)), lit(0L)))
      .select(col("event_id"), col("conv_grp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(neu == old)
  }

  test("psmAtt executes with no shrinking (n-to-unboundedFollowing) window frame") {
    // whole-partition frames print as (unboundedpreceding, unboundedfollowing)
    // and are evaluated once per partition; the quadratic shape is a frame
    // whose LOWER bound moves while the upper stays unboundedfollowing.
    val plans = allPlansOf(Relational.psmAtt(spark, Sf))
    val bad = plans.exists(p =>
      p.toLowerCase.replaceAll("\\s+", "")
        .matches("(?s).*specifiedwindowframe\\(rowframe,(?!unboundedpreceding)[^,]*,unboundedfollowing.*"))
    assert(!bad, "psmAtt still evaluates a shrinking unboundedFollowing frame")
  }

  test("simhashPairs output is unchanged by the filter-before-distinct reorder") {
    // the pre-r15 formulation: distinct over ALL candidates, filter after
    val docs = Lake.documents(spark, Sf)
    val sigs = DedupOps.simhash(docs)
    val bandBits = DedupOps.SimhashBandBits
    val bandMask = (1L << bandBits) - 1
    val nBands = DedupOps.SimhashBands
    val bands = sigs.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until nBands).map(b =>
        shiftright(col("simhash"), b * bandBits).bitwiseAND(bandMask)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val old = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
        col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val got = DedupOps.simhashPairs(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == old)
  }
}
