package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Brute-force value checks for the round-11 model wave: Cox one-step,
  * Bradley-Terry, 1-NN caliper matching, Poisson IRLS. Each test
  * recomputes the expected answer independently from collected sf0.001
  * rows (Scala collections), so the distributed formulations are
  * checked against definitions, not against themselves. */
class CausalModelSpec extends SparkSpecBase {

  private def round(v: Double, dp: Int): Double =
    BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cox one-step matches a direct risk-set recomputation") {
    val orders = Lake.orders(spark, Sf)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val bal = Lake.customer(spark, Sf)
      .select(col("c_custkey"), col("c_acctbal"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val maxD = orders.map(_._2).max
    val cutoff = maxD.minusDays(90)
    val subj = orders.groupBy(_._1).map { case (ck, os) =>
      val ds = os.map(_._2)
      val dur = java.time.temporal.ChronoUnit.DAYS
        .between(ds.min, ds.max)
      (dur, if (ds.max.isBefore(cutoff)) 1 else 0, bal(ck))
    }.toSeq
    // Breslow: risk set at t = everyone with duration >= t
    val eventTimes = subj.filter(_._2 == 1).map(_._1).distinct
    var u = BigDecimal(0); var inf = BigDecimal(0)
    for (t <- eventTimes) {
      val risk = subj.filter(_._1 >= t)
      val ev = subj.filter(s => s._1 == t && s._2 == 1)
      val n = risk.size.toDouble
      val mean = risk.map(_._3).sum / n
      val meanSq = risk.map(x => x._3 * x._3).sum / n
      u += BigDecimal(ev.map(_._3).sum - ev.size * mean)
      inf += BigDecimal(ev.size * (meanSq - mean * mean))
    }
    val got = Relational.coxChurn(spark, Sf).collect().head
    assert(got.getLong(0) == subj.size)
    assert(got.getLong(1) == subj.count(_._2 == 1))
    val beta = u.toDouble / inf.toDouble
    // the engine rounds per-event-time terms to 8 dp; the recompute
    // here uses full precision, so compare loosely
    assert(math.abs(got.getDouble(2) - beta) < 1e-4,
      s"beta ${got.getDouble(2)} vs $beta")
    assert(got.getDouble(3) > 0.0) // se0
  }

  test("bradley-terry replays bit-identically and respects duel counts") {
    val li = Lake.lineitem(spark, Sf)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("p"),
        col("l_quantity").cast("decimal(18,2)").as("q"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2), r.getDecimal(3)))
    val unit = li.groupBy(t => (t._1, t._2)).map { case (k, rows) =>
      val rev = rows.map(_._3).reduce(_ add _)
      val qty = rows.map(_._4).reduce(_ add _)
      k -> rev.doubleValue / qty.doubleValue
    }
    val duels = for {
      ((pa, sa), ua) <- unit.toSeq
      ((pb, sb), ub) <- unit.toSeq
      if pa == pb && sa < sb && ua != ub
    } yield ((sa, sb), if (ua < ub) 1L else 0L)
    val pairs = duels.groupBy(_._1).map { case (k, v) =>
      (k._1, k._2, v.map(_._2).sum, v.size.toLong)
    }.toSeq
    val sym = pairs.flatMap { case (a, b, w, n) =>
      Seq((a, b, n, w), (b, a, n, n - w))
    }
    def mm(p: Map[Long, Double]): Map[Long, Double] =
      sym.groupBy(_._1).map { case (i, rows) =>
        val w = rows.map(_._4).sum
        val den = rows.map { case (_, j, n, _) =>
          BigDecimal(round(n.toDouble / (p(i) + p(j)), 8))
        }.sum
        i -> round(w.toDouble / den.toDouble, 6)
      }
    val p0 = sym.map(_._1).distinct.map(_ -> 1.0).toMap
    val p2 = mm(mm(p0))
    val got = Relational.btSuppliers(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.size <= 20)
    val duelsBy = sym.groupBy(_._1)
      .map { case (i, r) => i -> (r.map(_._3).sum, r.map(_._4).sum) }
    for ((sk, nd, nw, st) <- got) {
      assert((nd, nw) == duelsBy(sk), s"supplier $sk duel counts")
      assert(math.abs(st - p2(sk)) < 1e-9,
        s"supplier $sk strength $st vs ${p2(sk)}")
    }
    // descending by strength with suppkey tie-break
    assert(got.sortBy(t => (-t._4, t._1)).toSeq == got.toSeq)
  }

  test("psm matching replays the nearest-control choice and caliper") {
    val spend = Lake.orders(spark, Sf)
      .select(col("o_custkey"), col("o_totalprice").cast("decimal(18,2)"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).reduce(_ add _) }
    val cust = Lake.customer(spark, Sf)
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal").cast("decimal(18,2)"), col("c_mktsegment"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2), r.getString(3)))
    val y = cust.map(c =>
      c._1 -> spend.getOrElse(c._1, java.math.BigDecimal.ZERO)).toMap
    var nM = 0; var sDiff = java.math.BigDecimal.ZERO
    val cal = new java.math.BigDecimal("100.00")
    for (nation <- cust.map(_._2).distinct) {
      val rows = cust.filter(_._2 == nation)
        .sortBy(c => (c._3.doubleValue, c._1))
      for (i <- rows.indices if rows(i)._4 == "BUILDING") {
        val prev = (i - 1 to 0 by -1).iterator
          .map(rows(_)).find(_._4 != "BUILDING")
        val next = (i + 1 until rows.size).iterator
          .map(rows(_)).find(_._4 != "BUILDING")
        val x = rows(i)._3
        val pick = (prev, next) match {
          case (Some(p), Some(n))
            if x.subtract(p._3).compareTo(n._3.subtract(x)) <= 0 => Some(p)
          case (Some(p), None) => Some(p)
          case (_, n) => n
        }
        pick.foreach { c =>
          val dist =
            if (c._3.compareTo(x) <= 0) x.subtract(c._3)
            else c._3.subtract(x)
          if (dist.compareTo(cal) <= 0) {
            nM += 1
            sDiff = sDiff.add(y(rows(i)._1).subtract(y(c._1)))
          }
        }
      }
    }
    val got = Relational.psmAtt(spark, Sf).collect().head
    assert(got.getLong(0) == cust.count(_._4 == "BUILDING"))
    assert(got.getLong(1) == nM, s"n_matched ${got.getLong(1)} vs $nM")
    assert(math.abs(got.getDouble(3) -
      round(sDiff.doubleValue / nM, 4)) < 1e-9)
  }

  test("poisson IRLS agrees with an unrounded recompute and improves on the null deviance") {
    val counts = Lake.orders(spark, Sf).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val data = Lake.customer(spark, Sf)
      .select(col("c_custkey"), col("c_acctbal")).collect()
      .map(r => (counts.getOrElse(r.getLong(0), 0L).toDouble,
        r.getDouble(1) / 1000.0))
    var b0 = math.log(data.map(_._1).sum / data.size); var b1 = 0.0
    for (_ <- 1 to 2) {
      val g = data.map { case (yv, x) =>
        val mu = math.exp(b0 + b1 * x)
        val wz = mu * (b0 + b1 * x) + (yv - mu)
        (mu, mu * x, mu * x * x, wz, x * wz)
      }
      val (sw, swx, swxx, swz, swxz) =
        (g.map(_._1).sum, g.map(_._2).sum, g.map(_._3).sum,
          g.map(_._4).sum, g.map(_._5).sum)
      b1 = (sw * swxz - swx * swz) / (sw * swxx - swx * swx)
      b0 = (swz - b1 * swx) / sw
    }
    val got = Relational.poissonOrders(spark, Sf).collect().head
    assert(got.getLong(0) == data.size)
    assert(math.abs(got.getDouble(1) - b0) < 1e-3,
      s"b0 ${got.getDouble(1)} vs $b0")
    assert(math.abs(got.getDouble(2) - b1) < 1e-3,
      s"b1 ${got.getDouble(2)} vs $b1")
    val nullDev = { // deviance of the intercept-only model
      val mu = data.map(_._1).sum / data.size
      2.0 * data.map { case (yv, _) =>
        if (yv > 0) yv * math.log(yv / mu) - (yv - mu) else mu }.sum
    }
    assert(got.getDouble(3) > 0.0 && got.getDouble(3) < nullDev,
      s"deviance ${got.getDouble(3)} vs null $nullDev")
  }
}
