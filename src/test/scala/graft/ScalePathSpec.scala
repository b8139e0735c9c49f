package graft

import org.apache.spark.sql.functions._

import graft.operators.CatalogOps

/** The documented 100 TB paths must actually run and approximate well —
  * not just exist as a flag. */
class ScalePathSpec extends SparkSpecBase {

  test("approx NDV profile tracks the exact profile within sketch error") {
    val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice")
    val exact = CatalogOps.profile(spark, Sf, "lineitem", cols, exactNdv = true)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val approx = CatalogOps.profile(spark, Sf, "lineitem", cols, exactNdv = false)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    for ((c, e) <- exact) {
      val a = approx(c)
      assert(math.abs(a - e).toDouble / e <= 0.1,
        s"$c: approx NDV $a vs exact $e drifts > 10%")
    }
  }

  test("approx percentile quartiles track exact within 5% of the IQR") {
    val cols = Seq("l_quantity", "l_extendedprice")
    def asMap(exact: Boolean) =
      CatalogOps.quantiles(spark, Sf, "lineitem", cols, exact)
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val e = asMap(true); val a = asMap(false)
    for (c <- cols) {
      val iqr = e(c)._3 - e(c)._1
      for ((ev, av) <- Seq(e(c)._1 -> a(c)._1, e(c)._2 -> a(c)._2, e(c)._3 -> a(c)._3))
        assert(math.abs(ev - av) <= 0.05 * iqr + 1e-9,
          s"$c: approx $av vs exact $ev off by more than 5% of IQR $iqr")
    }
  }

  test("approx-cutpoint binning stays near equi-depth (the 100 TB path's drift bound)") {
    val exact = CatalogOps.quantileBinsApprox(spark, Sf, exact = true).collect()
    val approx = CatalogOps.quantileBinsApprox(spark, Sf, exact = false).collect()
    val n = exact.map(_.getLong(1)).sum
    assert(approx.map(_.getLong(1)).sum == n, "binning must never drop rows")
    assert(approx.length == 10, "all ten bins must be populated")
    // with sketched cutpoints, each bin holds n/10 within the sketch's
    // rank error plus tie mass; 25% of the ideal depth is a loose but
    // meaningful ceiling (exact cutpoints at this SF land within ties)
    val ideal = n.toDouble / 10
    approx.foreach { r =>
      assert(math.abs(r.getLong(1) - ideal) <= 0.25 * ideal + 1,
        s"bin ${r.getLong(0)} holds ${r.getLong(1)} rows vs ideal $ideal")
    }
  }

  test("approx binning drift bound HOLDS at 10× the base SF (sf0.01)") {
    // same invariant as above, re-proved on 10× the data — sketch rank
    // error must not grow with scale (it is a fraction of n by contract)
    val bigSf = "/root/testdata/sf0.01"
    val approx = CatalogOps.quantileBinsApprox(spark, bigSf, exact = false).collect()
    val n = approx.map(_.getLong(1)).sum
    val exactN = CatalogOps.quantileBinsApprox(spark, bigSf, exact = true)
      .collect().map(_.getLong(1)).sum
    assert(n == exactN, "approx and exact binning must cover the same rows")
    assert(approx.length == 10, "all ten bins must be populated")
    val ideal = n.toDouble / 10
    approx.foreach { r =>
      assert(math.abs(r.getLong(1) - ideal) <= 0.25 * ideal + 1,
        s"bin ${r.getLong(0)} holds ${r.getLong(1)} rows vs ideal $ideal at sf0.01")
    }
  }

  test("parallel ABC twin is bit-identical to the exact form at two SFs") {
    for (sf <- Seq(Sf, "/root/testdata/sf0.01")) {
      val exact = graft.operators.Relational.abcParts(spark, sf).collect().toSeq
      val par = graft.operators.Relational.abcPartsPar(spark, sf).collect().toSeq
      assert(par == exact, s"ABC twin diverges at $sf:\n$par\nvs\n$exact")
    }
  }

  test("parallel Lorenz twin is bit-identical to the exact form at two SFs") {
    for (sf <- Seq(Sf, "/root/testdata/sf0.01")) {
      val exact = graft.operators.Relational.lorenzCurve(spark, sf).collect().toSeq
      val par = graft.operators.Relational.lorenzCurvePar(spark, sf).collect().toSeq
      assert(par == exact, s"Lorenz twin diverges at $sf:\n$par\nvs\n$exact")
    }
  }

  test("dedup and text operators tolerate empty and single-row corpora") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.DedupOps.nearDupPairs(empty).count() == 0)
    assert(graft.operators.DedupOps.dedupExact(empty).count() == 0)
    assert(graft.operators.TextOps.tokenStats(empty).count() == 0)
    val single = Seq((1L, "just one tiny document")).toDF("doc_id", "text")
    assert(graft.operators.DedupOps.nearDupPairs(single).count() == 0)
    assert(graft.operators.DedupOps.simhash(single).count() == 1)
    assert(graft.operators.TextOps.fingerprint(single).count() == 1)
    // round-6 operators under the same degenerate shapes
    assert(graft.operators.DedupOps.setSimilarityJoin(empty).count() == 0)
    assert(graft.operators.DedupOps.setSimilarityJoin(single).count() == 0)
    assert(graft.operators.TextOps.boilerplateNgrams(empty).count() == 0)
    assert(graft.operators.TextOps.boilerplateDensity(single).count() == 1)
    val emptySeries = Seq.empty[(java.sql.Timestamp, String, Long)]
      .toDF("bucket", "event_type", "n_events")
    assert(graft.operators.EventOps.anomaliesOn(emptySeries, 24, 3.0).count() == 0)
    assert(graft.operators.TextOps.zipfFit(empty).count() == 0)
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.AnnOps.kmeansCentroidsDistributed(emptyEmb, 4).count() == 0)
  }
}
