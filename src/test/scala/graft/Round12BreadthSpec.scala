package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, EventOps, Relational, StatTests, TextOps}

/** Brute-force semantics for the round-12 second breadth batch:
  * Gunning fog, session depths, lifecycle-state retention, top-1%
  * share, recommender novelty, Davies–Bouldin. */
class Round12BreadthSpec extends SparkSpecBase {

  test("gunningFog matches a driver-side reference") {
    val out = TextOps.gunningFog(spark, Sf).collect()
    assert(out.nonEmpty)
    val docs = Lake.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def syll(tok: String): Int = {
      var runs = 0; var inRun = false
      for (c <- tok) {
        val v = "aeiouAEIOU".indexOf(c) >= 0
        if (v && !inRun) runs += 1
        inRun = v
      }
      runs
    }
    val bySrc = docs.groupBy(_._1)
    for (r <- out) {
      val src = r.getString(0)
      val texts = bySrc(src).map(_._2)
      val sw = texts.map(_.split(" ", -1).length.toLong).sum
      val ss = texts.map(t => 1L + t.count(c => "!?.".indexOf(c) >= 0)).sum
      val cw = texts.flatMap(_.split(" ", -1)).count(syll(_) >= 3).toLong
      val ref = 0.4 * (sw.toDouble / ss + 100.0 * cw / sw)
      assert(r.getLong(2) == cw, s"$src complex $cw vs ${r.getLong(2)}")
      assert(math.abs(r.getDouble(4) - ref) < 1e-3,
        s"$src fog ${r.getDouble(4)} vs ref $ref")
    }
  }

  test("sessionDepths: shares sum to 1, cum_share monotone to 1") {
    val out = EventOps.sessionDepths(spark, Sf).collect()
    assert(out.nonEmpty)
    val shares = out.map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 1e-3, s"Σshare ${shares.sum}")
    val cums = out.map(_.getDouble(3))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(math.abs(cums.last - 1.0) < 1e-5)
    // total sessions equals the sessionize rollup's count
    val nSessions = out.map(_.getLong(1)).sum
    val ref = EventOps.sessions(spark, Sf).count()
    assert(nSessions == ref)
  }

  test("stateRetention: states partition the user-day frame") {
    val out = EventOps.stateRetention(spark, Sf).collect()
    val states = out.map(_.getString(0)).toSet
    assert(states.subsetOf(Set("new", "retained", "resurrected")))
    val total = out.map(_.getLong(1)).sum
    val ref = Lake.events(spark, Sf)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct().count()
    assert(total == ref, s"user-days $total vs $ref")
    for (r <- out) {
      val rate = r.getDouble(3)
      assert(rate >= 0 && rate <= 1)
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("topPctShare matches a driver-side reference") {
    val out = Relational.topPctShare(spark, Sf).collect()
    assert(out.nonEmpty)
    val rows = Lake.customer(spark, Sf)
      .join(Lake.nation(spark, Sf),
        col("c_nationkey") === col("n_nationkey"))
      .join(Lake.orders(spark, Sf)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y")),
        col("c_custkey") === col("o_custkey"))
      .select(col("n_name"), col("c_custkey"),
        (col("y") * 100).cast("long").as("y2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byNation = rows.groupBy(_._1)
    for (r <- out) {
      val nation = r.getString(0)
      val cs = byNation(nation).sortBy(c => (-c._3, c._2))
      val k = (cs.size + 99) / 100
      assert(r.getLong(2) == k)
      val ref = cs.take(k).map(_._3).sum.toDouble / cs.map(_._3).sum
      assert(math.abs(r.getDouble(3) - ref) < 1e-4,
        s"$nation share ${r.getDouble(3)} vs $ref")
    }
  }

  test("recNovelty: recommended novelty is a sane per-item mean") {
    val out = Relational.recNovelty(spark, Sf).collect()(0)
    assert(out.getLong(0) > 0 && out.getLong(1) > 0)
    val (nr, nc) = (out.getDouble(2), out.getDouble(3))
    // self-information of a share is positive and bounded by log2(total)
    assert(nr > 0 && nc > 0)
    assert(nr < 64 && nc < 64)
  }

  test("riskPanel: 2x2 partitions users, ratios match direct math") {
    val out = StatTests.riskPanel(spark, Sf).collect()(0)
    val (a, b2, c, d) =
      (out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
    val nUsers = Lake.events(spark, Sf)
      .select(col("user_id")).distinct().count()
    assert(a + b2 + c + d == nUsers)
    // Haldane-corrected counts A = 2a+1, ...
    val (ha, hb, hc, hd) =
      (2 * a + 1.0, 2 * b2 + 1.0, 2 * c + 1.0, 2 * d + 1.0)
    val rr = (ha / (ha + hb)) / (hc / (hc + hd))
    assert(math.abs(out.getDouble(4) - rr) < 1e-4)
    val or = (ha * hd) / (hb * hc)
    assert(math.abs(out.getDouble(5) - or) < 1e-4)
    assert(out.getDouble(7) <= rr && rr <= out.getDouble(8),
      "RR must sit inside its Wald CI")
  }

  test("expFit: rate is n over gap-sum, KS in range") {
    val out = StatTests.expFit(spark, Sf).collect()(0)
    val n = out.getLong(0)
    assert(n > 0)
    assert(math.abs(out.getDouble(1) * out.getDouble(2) - 1.0) < 1e-3,
      "rate x mean must be ~1")
    val d = out.getDouble(3)
    assert(d > 0 && d < 1)
  }

  test("gammaFit: shape x scale recovers the mean") {
    val out = StatTests.gammaFit(spark, Sf).collect()
    assert(out.length == 5)
    for (r <- out) {
      val (m, k, th) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(k > 0 && th > 0)
      assert(math.abs(k * th - m) / m < 1e-2,
        s"k*theta ${k * th} vs mean $m")
    }
  }

  test("embeddingIsotropy: ratio bounded, norm positive") {
    val out = AnnOps.embeddingIsotropy(spark, Sf).collect()(0)
    assert(out.getLong(0) > 0 && out.getLong(1) == 64)
    assert(out.getDouble(2) > 0)
    val iso = out.getDouble(3)
    assert(iso >= 0 && iso <= 1.0001, s"isotropy $iso")
  }

  test("columnEntropy matches a driver-side reference") {
    val out = graft.operators.CatalogOps.columnEntropy(spark, Sf,
      Seq("lineitem" -> "l_returnflag")).collect()(0)
    val counts = Lake.lineitem(spark, Sf)
      .filter(col("l_returnflag").isNotNull)
      .groupBy(col("l_returnflag")).count()
      .collect().map(_.getLong(1))
    val n = counts.sum
    val ref = counts.map { c =>
      val p = math.round(c.toDouble / n * 1e8) / 1e8
      -p * math.log(p)
    }.sum
    assert(out.getLong(3) == counts.length)
    assert(math.abs(out.getDouble(4) - ref) < 1e-4,
      s"entropy ${out.getDouble(4)} vs ref $ref")
    assert(out.getDouble(5) > 0 && out.getDouble(5) <= 1.0001)
  }

  test("daviesBouldin: positive, one row per label, sane worst ratio") {
    val out = AnnOps.daviesBouldin(spark, Sf).collect()
    val nLabels = Lake.embeddings(spark, Sf)
      .select(col("label")).distinct().count()
    assert(out.length == nLabels)
    val db = out.head.getDouble(3)
    assert(db > 0, s"DB $db")
    for (r <- out) {
      assert(r.getDouble(1) >= 0)
      assert(r.getDouble(2) > 0)
      assert(math.abs(r.getDouble(3) - db) < 1e-12) // table-wide constant
    }
    // DB is the mean of the worst ratios
    val meanWorst = out.map(_.getDouble(2)).sum / out.length
    assert(math.abs(db - meanWorst) < 1e-3)
  }
}
