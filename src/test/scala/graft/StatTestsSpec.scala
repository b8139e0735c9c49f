package graft

import org.apache.spark.sql.functions._

import graft.operators.{StatTests, TextOps}

/** Brute-force references and invariants for the round-12 classical
  * test panel. References are computed driver-side from collected
  * sf0.001 frames (small by construction), so the distributed rank /
  * moment machinery is checked against independent arithmetic, not
  * against itself. */
class StatTestsSpec extends SparkSpecBase {

  private def segValues(): Map[String, Seq[Long]] = {
    val rows = Lake.orders(spark, Sf)
      .join(Lake.customer(spark, Sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("x2"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
  }

  test("kruskalWallis matches a driver-side rank computation") {
    val out = StatTests.kruskalWallis(spark, Sf).collect()
    assert(out.length == 5)
    val groups = segValues()
    val all = groups.values.flatten.toSeq.sorted
    val n = all.size
    // tie-averaged rank per value
    val rank: Map[Long, Double] = all.zipWithIndex.groupBy(_._1).map {
      case (v, idx) => v -> idx.map(_._2 + 1).sum.toDouble / idx.size
    }
    val meanRanks = out.map(r =>
      r.getString(0) -> r.getDouble(2)).toMap
    for ((seg, vs) <- groups) {
      val ref = vs.map(rank).sum / vs.size
      assert(math.abs(meanRanks(seg) - ref) < 1e-3,
        s"$seg mean rank ${meanRanks(seg)} vs ref $ref")
    }
    // H against the classic formula (tie-corrected)
    val hAdj = out.head.getDouble(5)
    val sRanks = groups.map { case (_, vs) => (vs.map(rank).sum, vs.size) }
    val h = 12.0 / (n.toDouble * (n + 1)) *
      sRanks.map { case (s, ng) => s * s / ng }.sum - 3.0 * (n + 1)
    val ties = all.groupBy(identity).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val c = 1.0 - ties.toDouble / (n.toLong * n * n - n)
    assert(math.abs(hAdj - h / c) < 0.01, s"H/C $hAdj vs ref ${h / c}")
    assert(out.head.getDouble(4) > 0 && out.head.getDouble(4) <= 1.0)
  }

  test("brownForsythe: F and deviations are sane, df consistent") {
    val out = StatTests.brownForsythe(spark, Sf).collect()
    assert(out.length == 5)
    val n = segValues().values.map(_.size).sum
    for (r <- out) {
      assert(r.getDouble(2) >= 0, "mean |deviation| must be >= 0")
      assert(r.getLong(3) == 4 && r.getLong(4) == n - 5)
      assert(r.getDouble(5) >= 0, "F must be >= 0")
    }
  }

  test("jarqueBera: flag agrees with the statistic") {
    val out = StatTests.jarqueBera(spark, Sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val jb = r.getDouble(4)
      assert(jb >= 0)
      assert(r.getBoolean(5) == jb > 5.991 ||
        math.abs(jb - 5.991) < 1e-3) // rounded jb vs unrounded flag
    }
  }

  test("tukeyHsd: pairwise panel is complete and self-consistent") {
    val out = StatTests.tukeyHsd(spark, Sf).collect()
    assert(out.length == 10) // C(5,2)
    val groups = segValues()
    for (r <- out) {
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val refDiff = groups(a).sum.toDouble / groups(a).size -
        groups(b).sum.toDouble / groups(b).size
      assert(math.abs(r.getDouble(4) - refDiff / 100.0) < 1e-3,
        s"$a-$b diff ${r.getDouble(4)} vs ref ${refDiff / 100.0}")
      assert(r.getDouble(6) > 0, "HSD criterion must be positive")
      // significant == |diff| > hsd up to output rounding
      if (math.abs(math.abs(r.getDouble(4)) - r.getDouble(6)) > 1e-3)
        assert(r.getBoolean(7) ==
          math.abs(r.getDouble(4)) > r.getDouble(6))
    }
  }

  test("kendallW matches a driver-side concordance computation") {
    val out = StatTests.kendallW(spark, Sf).collect()(0)
    val w = out.getDouble(2)
    assert(w >= -0.001 && w <= 1.001, s"W $w out of range")
    // driver-side reference over the zero-filled day x type grid
    val daily = Lake.events(spark, Sf)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => ((r.get(0).toString, r.getString(1)),
        r.getLong(2))).toMap
    val days = daily.keys.map(_._1).toSeq.distinct
    val types = daily.keys.map(_._2).toSeq.distinct
    val m = days.size; val k = types.size
    var sumT = 0L
    val rj = scala.collection.mutable.Map(types.map(_ -> 0.0): _*)
    for (d <- days) {
      val xs = types.map(t => t -> daily.getOrElse((d, t), 0L))
      val byVal = xs.groupBy(_._2)
      val sorted = xs.map(_._2).sorted
      val rk = sorted.zipWithIndex.groupBy(_._1).map {
        case (v, idx) => v -> idx.map(_._2 + 1).sum.toDouble / idx.size
      }
      for ((t, x) <- xs) rj(t) += rk(x)
      sumT += byVal.values.map(_.size.toLong)
        .map(t => t * t * t - t).sum
    }
    val s12 = 12.0 * rj.values.map(r => r * r).sum -
      3.0 * m.toLong * m * k * (k + 1) * (k + 1)
    val den = m.toLong * m * (k.toLong * k * k - k) - m.toLong * sumT
    val ref = s12 / den
    assert(math.abs(w - ref) < 1e-4, s"W $w vs ref $ref")
  }

  test("pChart: limits bracket the centerline, flag matches") {
    val out = StatTests.pChart(spark, Sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (pI, pBar, ucl, lcl) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(pI >= 0 && pI <= 1)
      assert(lcl <= pBar + 1e-9 && pBar <= ucl + 1e-9)
      if (math.abs(pI - ucl) > 1e-4)
        assert(r.getBoolean(7) == pI > ucl)
    }
  }

  test("purchaseGaps: non-negative, ordered percentiles, valid share") {
    val out = StatTests.purchaseGaps(spark, Sf).collect()
    assert(out.length == 5)
    for (r <- out) {
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) >= 0)
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9, "p50 <= p90")
      val share = r.getDouble(5)
      assert(share >= 0 && share <= 1)
    }
  }

  test("sourceDistance: metrics bounded, panel complete") {
    val out = TextOps.sourceDistance(spark, Sf).collect()
    val nSrc = Lake.documents(spark, Sf)
      .select(col("source")).distinct().count()
    assert(out.length == nSrc * (nSrc - 1) / 2)
    for (r <- out) {
      val tv = r.getDouble(2); val h2 = r.getDouble(3)
      assert(tv >= 0 && tv <= 1.0001, s"TV $tv")
      assert(h2 >= -0.0001 && h2 <= 1.0001, s"H² $h2")
    }
  }
}
