package graft

import org.apache.spark.sql.functions._

import graft.operators.CatalogOps

/** Incremental statistics: HLL sketches of separate ingest batches union
  * to the same estimate as a full rescan — history never re-read. */
class IncrementalStatsSpec extends SparkSpecBase {

  test("batch sketches union to the full-scan estimate") {
    val docs = Lake.documents(spark, Sf)
    val batch1 = docs.filter("doc_id < 300")
    val batch2 = docs.filter("doc_id >= 300")

    val s1 = CatalogOps.ndvSketches(batch1, "lang", "doc_id")
    val s2 = CatalogOps.ndvSketches(batch2, "lang", "doc_id")
    val merged = CatalogOps.mergeNdv(s1.union(s2)).collect()(0)
    val fullScan = CatalogOps.mergeNdv(
      CatalogOps.ndvSketches(docs, "lang", "doc_id")).collect()(0)
    val exact = docs.select(countDistinct(col("doc_id"))).collect()(0).getLong(0)

    assert(merged.getLong(1) == 500, "row counts sum exactly")
    // sketch-of-union vs union-of-sketches may differ by a hair (sparse
    // buffer promotion order); both must stay in the same error envelope
    assert(math.abs(merged.getLong(0) - fullScan.getLong(0)).toDouble
             / fullScan.getLong(0) <= 0.01,
      s"incremental union (${merged.getLong(0)}) deviates from the full rescan (${fullScan.getLong(0)})")
    assert(math.abs(merged.getLong(0) - exact).toDouble / exact <= 0.05,
      s"estimate ${merged.getLong(0)} drifts >5% from exact $exact")
  }

  test("per-batch KLL quantile sketches merge to rescan-grade quantiles") {
    val li = Lake.lineitem(spark, Sf).select(col("l_extendedprice").as("v"))
    // four independent "ingest batches"
    val batches = (0 until 4).map(i =>
      CatalogOps.quantileSketches(
        li.filter(pmod(col("v").cast("long"), lit(4L)) === i)
          .withColumn("g", lit(1)), "g", "v"))
    val merged = CatalogOps.mergeQuantiles(
      batches.reduce(_.union(_)), Seq(0.25, 0.5, 0.75)).collect()(0)
    val qs = merged.getSeq[Double](0)
    val nRows = merged.getLong(1)
    assert(nRows == li.count(), "row counts must sum exactly")
    // KLL guarantees RANK error (~1.65% at k=200): each estimated quantile
    // value must sit within ±3% rank of its target — measured against the
    // actual data, i.e. the same check a full rescan would pass
    val n = nRows.toDouble
    for ((q, p) <- qs.zip(Seq(0.25, 0.5, 0.75))) {
      val rank = li.filter(col("v") <= q).count() / n
      assert(math.abs(rank - p) <= 0.03,
        s"quantile $p estimate $q sits at rank $rank (off by ${math.abs(rank - p)})")
    }
  }

  test("KLL sketches are SQL-surfaced and group-mergeable") {
    graft.functions.GraftFunctions.register(spark)
    Lake.lineitem(spark, Sf).createOrReplaceTempView("li_kll")
    val row = spark.sql(
      """SELECT kll_quantiles(kll_merge_agg(s), array(0.5D)) AS med
        |FROM (SELECT kll_sketch_agg(l_quantity, 200) AS s
        |      FROM li_kll GROUP BY l_linenumber)""".stripMargin).collect()(0)
    val med = row.getSeq[Double](0).head
    // l_quantity is uniform-ish over [1, 50]
    assert(med > 10 && med < 40, s"median l_quantity estimate $med implausible")
  }

  test("per-batch frequent-items sketches merge to exact heavy hitters while the map holds") {
    import spark.implicits._
    import graft.functions.FreqFunctions
    // skewed stream: value v_i appears i*10 times, i = 1..40 (400 distinct-
    // slot budget of 256 is NOT exceeded: 40 distinct values → exact)
    val rows = (1 to 40).flatMap(i => Seq.fill(i * 10)((i % 4, s"v$i")))
    val df = rows.toDF("batch", "value")
    val merged = CatalogOps.freqSketches(df, "batch", "value")
      .agg(FreqFunctions.freqMergeAgg(col("freq_sketch")).as("sk"))
      .select(explode(FreqFunctions.freqTopItems(col("sk"))).as("f"))
      .select(col("f.item"), col("f.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (i <- 1 to 40)
      assert(merged(s"v$i") == i * 10L, s"v$i: ${merged.get(s"v$i")} != ${i * 10}")
    // overflow regime: 5000 distinct values through a 64-slot map still
    // surfaces the planted heavy hitter within the documented error bound
    val noisy = ((1 to 5000).map(i => s"rare$i") ++ Seq.fill(2000)("hot")).toDF("value")
      .withColumn("batch", lit(1))
    val hot = CatalogOps.freqSketches(noisy, "batch", "value", maxMapSize = 64)
      .select(explode(FreqFunctions.freqTopItems(col("freq_sketch"))).as("f"))
      .select(col("f.item"), col("f.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 7000.0
    assert(hot.contains("hot"), "planted heavy hitter must survive the purges")
    assert(math.abs(hot("hot") - 2000) <= 3.5 * n / 64,
      s"estimate ${hot("hot")} outside the Misra-Gries error bound")
  }

  test("theta sketches answer exact set expressions below nominal entries") {
    import spark.implicits._
    import graft.functions.ThetaFunctions._
    // A = 1..1000, B = 500..1500: |A|=1000, |B|=1001, |A∪B|=1500,
    // |A∩B|=501, |A\B|=499 — all below the 4096-entry exact threshold
    val df = ((1 to 1000).map(i => ("a", s"k$i")) ++
              (500 to 1500).map(i => ("b", s"k$i"))).toDF("side", "k")
    val sk = df.agg(
      thetaSketchAgg(when(col("side") === "a", col("k"))).as("sa"),
      thetaSketchAgg(when(col("side") === "b", col("k"))).as("sb"))
    val r = sk.select(
      thetaEstimate(col("sa")).as("a"),
      thetaEstimate(col("sb")).as("b"),
      thetaEstimate(thetaUnion(col("sa"), col("sb"))).as("u"),
      thetaEstimate(thetaIntersect(col("sa"), col("sb"))).as("i"),
      thetaEstimate(thetaAnotB(col("sa"), col("sb"))).as("d")).collect()(0)
    assert((r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      == ((1000.0, 1001.0, 1500.0, 501.0, 499.0)),
      s"exact-regime theta set expressions must be exact, got $r")
  }

  test("sketched inclusion discovery matches the exact path in the exact regime") {
    val candidates = Seq(
      ("nation", "n_regionkey") -> ("region", "r_regionkey"),
      ("orders", "o_custkey") -> ("customer", "c_custkey"),
      ("lineitem", "l_orderkey") -> ("orders", "o_orderkey"),
      ("orders", "o_orderkey") -> ("lineitem", "l_orderkey"))
    def byPair(df: org.apache.spark.sql.DataFrame, valueCol: String) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getDouble(df.columns.indexOf(valueCol))).toMap
    val exact = byPair(graft.operators.CatalogOps
      .inclusionDependencies(spark, Sf, candidates), "containment")
    val sketched = byPair(graft.operators.CatalogOps
      .inclusionDependenciesSketched(spark, Sf, candidates), "containment_est")
    assert(exact.keySet == sketched.keySet)
    // below nominal entries theta estimates are exact → containment to
    // the rounding digit; the deliberately partial pair stays partial
    for ((k, e) <- exact)
      assert(math.abs(sketched(k) - e) <= 0.0002, s"$k: ${sketched(k)} vs $e")
    val partial = exact(("orders", "o_orderkey", "lineitem"))
    assert(partial < 1.0, "fixture should keep one partial pair")
    assert(sketched(("orders", "o_orderkey", "lineitem")) < 1.0)
  }

  test("snapshot-table stats sidecar refreshes incrementally and profiles without rescans") {
    import graft.operators.IncrementalTableStats
    import graft.sources.SnapshotTable
    val root = java.nio.file.Files.createTempDirectory("graft_inc_stats").toString
    val tableDir = s"$root/tbl"; val statsDir = s"$root/stats"
    val docs = Lake.documents(spark, Sf)

    SnapshotTable.write(spark, tableDir, docs.filter("doc_id < 200"))
    val first = IncrementalTableStats.refresh(spark, tableDir, statsDir, "source", "n_chars")
    assert(first == Seq(0L), s"first refresh must sketch v0, got $first")

    SnapshotTable.write(spark, tableDir, docs.filter("doc_id >= 200"))
    val second = IncrementalTableStats.refresh(spark, tableDir, statsDir, "source", "n_chars")
    assert(second == Seq(1L), s"second refresh must sketch ONLY the new v1, got $second")
    assert(IncrementalTableStats.refresh(spark, tableDir, statsDir, "source", "n_chars").isEmpty,
      "an up-to-date sidecar must refresh nothing")

    val p = IncrementalTableStats.profile(spark, statsDir).collect()(0)
    assert(p.getLong(0) == docs.count(), "total rows must sum exactly across versions")
    val exactNdv = docs.select(countDistinct(col("source"))).collect()(0).getLong(0)
    assert(math.abs(p.getLong(1) - exactNdv).toDouble / exactNdv <= 0.05,
      s"merged NDV ${p.getLong(1)} vs exact $exactNdv")
    // merged quantiles sit within KLL rank tolerance of the full data
    val n = docs.count().toDouble
    for ((q, t) <- p.getSeq[Double](2).zip(Seq(0.25, 0.5, 0.75))) {
      val rank = docs.filter(col("n_chars") <= q).count() / n
      assert(math.abs(rank - t) <= 0.03, s"quantile $t estimate $q at rank $rank")
    }
    // top values: exact while the value domain fits the sketch map
    val top = p.getSeq[org.apache.spark.sql.Row](3).map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactCounts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(top == exactCounts, s"merged top values $top vs exact $exactCounts")
  }

  test("per-group sketches estimate group NDVs") {
    val sk = CatalogOps.ndvSketches(Lake.documents(spark, Sf), "lang", "doc_id")
      .withColumn("ndv", hll_sketch_estimate(col("ndv_sketch")))
      .select("lang", "ndv", "n_rows").collect()
    for (r <- sk) {
      // doc_ids are unique, so per-language NDV == row count
      assert(math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2) <= 0.05,
        s"${r.getString(0)}: ndv ${r.getLong(1)} vs rows ${r.getLong(2)}")
    }
  }

  test("hand-rolled HLL: bounded error on planted cardinalities, register-monotone on supersets") {
    import spark.implicits._
    // type 'a' sees users 1..200, type 'b' the superset 1..400: registers
    // only grow under union, so est(b) >= est(a) must hold EXACTLY
    val events = ((1 to 200).map(u => ("a", u.toLong)) ++
      (1 to 400).map(u => ("b", u.toLong)))
      .toDF("event_type", "user_id")
    val out = graft.operators.IncrementalTableStats.hllNdv(events)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val (exA, _, estA, errA) = out("a")
    val (exB, _, estB, errB) = out("b")
    assert(exA == 200L && exB == 400L)
    assert(estB >= estA, s"superset monotonicity: $out")
    // m=64 gives sigma ~ 13%; deterministic data, so these are fixed facts
    assert(errA < 0.5 && errB < 0.5, s"relative error: $out")
    assert(estA > 0 && estB > 0)
    // determinism: the sketch is a pure function of the data
    val again = graft.operators.IncrementalTableStats.hllNdv(events)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(again("a") == estA && again("b") == estB)
  }
}
