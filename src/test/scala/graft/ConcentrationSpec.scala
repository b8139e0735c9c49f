package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Brute-force value checks for the concentration/econometrics wave:
  * HHI/CR4, price elasticity, Poisson overdispersion. */
class ConcentrationSpec extends SparkSpecBase {

  test("hhi/cr4 match a direct share recompute per nation") {
    val rev = Lake.lineitem(spark, Sf)
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("r"))
      .join(Lake.supplier(spark, Sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(Lake.nation(spark, Sf),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("l_suppkey"), col("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val got = Relational.hhiSuppliers(spark, Sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val byNation = rev.groupBy(_._1)
    assert(got.keySet == byNation.keySet)
    for ((nation, rows) <- byNation) {
      val bySupp = rows.groupBy(_._2)
        .map { case (k, v) => k -> v.map(_._3).reduce(_ add _) }
      val tot = bySupp.values.reduce(_ add _).doubleValue
      val shares = bySupp.map { case (k, v) => k -> v.doubleValue / tot }
      val hhi = shares.values.map(s => s * s).sum
      val cr4 = shares.toSeq.sortBy(t => (-t._2, t._1)).take(4)
        .map(_._2).sum
      val (n, _, gHhi, gCr4) = got(nation)
      assert(n == bySupp.size)
      assert(math.abs(gHhi - hhi) < 1e-5, s"$nation hhi $gHhi vs $hhi")
      assert(math.abs(gCr4 - cr4) < 1e-5, s"$nation cr4 $gCr4 vs $cr4")
      // HHI bounds: 1/n (uniform) .. 1 (monopoly); CR4 within (0,1]
      assert(gHhi >= 1.0 / bySupp.size - 1e-6 && gHhi <= 1.0)
      assert(gCr4 > 0.0 && gCr4 <= 1.0 + 1e-9)
    }
  }

  test("elasticity equals the closed-form log-log OLS slope") {
    val rows = Lake.lineitem(spark, Sf)
      .filter(col("l_quantity") > 0 && col("l_extendedprice") > 0)
      .select(col("l_extendedprice").cast("decimal(18,2)"),
        col("l_quantity").cast("decimal(18,2)"))
      .collect()
      .map(r => (math.log(r.getDecimal(0).doubleValue /
        r.getDecimal(1).doubleValue),
        math.log(r.getDecimal(1).doubleValue)))
    val n = rows.size.toDouble
    val sp = rows.map(_._1).sum; val sq = rows.map(_._2).sum
    val spp = rows.map(t => t._1 * t._1).sum
    val spq = rows.map(t => t._1 * t._2).sum
    val sqq = rows.map(t => t._2 * t._2).sum
    val slope = (spq - sp * sq / n) / (spp - sp * sp / n)
    val r2 = math.pow(spq - sp * sq / n, 2) /
      ((spp - sp * sp / n) * (sqq - sq * sq / n))
    val got = Relational.priceElasticity(spark, Sf).collect().head
    assert(got.getLong(0) == rows.size)
    assert(math.abs(got.getDouble(1) - slope) < 1e-4,
      s"slope ${got.getDouble(1)} vs $slope")
    assert(math.abs(got.getDouble(3) - r2) < 1e-4)
    assert(got.getDouble(3) >= 0.0 && got.getDouble(3) <= 1.0)
  }

  test("poisson dispersion reconciles with the fitted means") {
    val fit = Relational.poissonOrders(spark, Sf).collect().head
    val disp = Relational.poissonDispersion(spark, Sf).collect().head
    assert(disp.getLong(0) == fit.getLong(0))
    assert(disp.getDouble(1) > 0.0) // phi
    // mean mu must sit near mean y (IRLS fits the mean structure)
    val counts = Lake.orders(spark, Sf).groupBy(col("o_custkey"))
      .agg(count(lit(1))).collect().map(_.getLong(1))
    val nCust = Lake.customer(spark, Sf).count()
    val meanY = counts.sum.toDouble / nCust
    assert(math.abs(disp.getDouble(2) - meanY) < 0.25 * meanY,
      s"mean_mu ${disp.getDouble(2)} vs mean y $meanY")
    // z consistent with phi's sign around 1
    assert((disp.getDouble(1) >= 1.0) == (disp.getDouble(3) >= 0.0))
  }
}
