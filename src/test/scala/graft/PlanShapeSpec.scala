package graft

import graft.operators._

/** Plan-shape assertions: the properties that make these operators survive
  * a 100×–1000× scale-up. Correct *values* are covered by the DuckDB
  * oracle; these tests pin the *plans*.
  */
class PlanShapeSpec extends SparkSpecBase {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  // allPlansOf comes from SparkSpecBase (shared with DedupSpec)

  test("scan+filter pushes predicates and prunes columns at the parquet scan") {
    val plan = planOf(Relational.scanFilter(spark, Sf))
    // scan nodes render as one long (possibly truncated) line — slice the
    // actual PushedFilters segment rather than pattern-matching the line
    val seg = plan.indexOf("PushedFilters")
    assert(seg >= 0, s"no PushedFilters in:\n$plan")
    val pushed = plan.substring(seg, math.min(seg + 200, plan.length))
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") ||
           pushed.contains("LessThan(l_quantity"),
      s"predicates not pushed to parquet: $pushed")
    val rs = plan.indexOf("ReadSchema")
    val readSchema = plan.substring(rs, math.min(rs + 200, plan.length))
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"column pruning failed: $readSchema")
  }

  test("disjunctive predicate pushes partial per-side filters to both scans") {
    // OR-of-ANDs: Catalyst derives `brand ∈ {...}` for the part scan and
    // the quantity hull for the lineitem scan before the exact residual
    val plan = planOf(Relational.disjunctiveRevenue(spark, Sf))
    assert(plan.contains("And(EqualTo(p_brand"),
      s"no brand filter pushed to the part scan:\n$plan")
    assert(plan.contains("And(GreaterThanOrEqual(l_quantity"),
      s"no quantity disjunction pushed to the lineitem scan:\n$plan")
  }

  test("dynamic partition pruning: a filtered dim prunes the partitioned fact scan") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Lake.events(spark, Sf).write.mode("overwrite")
      .partitionBy("event_type").parquet(tmp)
    val fact = spark.read.parquet(tmp)
    val dim = Lake.events(spark, Sf).select(col("event_type")).distinct()
      .filter(col("event_type").isin("click", "view"))
    val q = fact.join(dim, Seq("event_type"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"partitioned fact scan not runtime-pruned by the dim filter:\n$plan")
  }

  test("runtime bloom filter from the selective side prunes the shuffle-join probe") {
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test tables are tiny; drop the size gate so the rule fires
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val li = Lake.lineitem(spark, Sf)
        .select(col("l_orderkey"), col("l_quantity"))
      val sel = Lake.orders(spark, Sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val q = li.join(sel, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected on the probe side:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("dimension joins broadcast instead of shuffling the fact table") {
    val plan = planOf(Relational.regionRevenue(spark, Sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("top-K plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf(Relational.topNOrders(spark, Sf))
    assert(plan.contains("TakeOrderedAndProject"), s"no rank pushdown in:\n$plan")
  }

  test("near-dedup never builds an all-pairs product") {
    val plan = planOf(DedupOps.nearDupPairs(spark, Sf))
    assert(!plan.contains("CartesianProduct"), "cartesian product in near-dedup")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BNLJ in near-dedup")
  }

  test("LSH ANN joins equi-keyed on bucket — no all-pairs product") {
    val plan = planOf(AnnOps.lsh(spark, Sf))
    assert(!plan.contains("CartesianProduct"), "cartesian product in LSH ANN")
  }

  test("brute-force ANN broadcasts the bounded query set") {
    // A nested-loop scan against a *broadcast* 8-row query set is the
    // intended linear plan; an unbroadcast cartesian product is not.
    val plan = planOf(AnnOps.bruteForce(spark, Sf))
    assert(plan.contains("Broadcast"), s"query set not broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"), "cartesian product in brute-force ANN")
  }

  test("simhash candidate pairs join equi-keyed on band") {
    // checkpointing operator: assert over the interior (listener-captured)
    // plans, not the RDD-scan facade of the returned frame
    for (plan <- allPlansOf(DedupOps.simhashPairs(spark, Sf)))
      assert(!plan.contains("CartesianProduct"), "cartesian product in simhash pairs")
  }

  test("window-based operators still prune the scan to the columns they use") {
    // Q17 window: lineitem has 16 columns; only 3 may reach the scan
    val q17 = planOf(Relational.smallQtyRevenue(spark, Sf))
    val rs = q17.indexOf("ReadSchema")
    assert(rs >= 0, s"no ReadSchema in:\n$q17")
    val schema = q17.substring(rs, math.min(rs + 300, q17.length))
    assert(schema.contains("l_partkey") && schema.contains("l_quantity") &&
      schema.contains("l_extendedprice") && !schema.contains("l_shipdate"),
      s"Q17 scan not pruned to its 3 columns: $schema")
    // packing plan reads only (doc_id, text)
    val pack = planOf(graft.operators.CorpusOps.packingPlan(spark, Sf))
    val prs = pack.indexOf("ReadSchema")
    val pschema = pack.substring(prs, math.min(prs + 200, pack.length))
    assert(pschema.contains("doc_id") && pschema.contains("text") &&
      !pschema.contains("lang") && !pschema.contains("source"),
      s"packing scan not pruned: $pschema")
  }

  test("round-6 operators prune their scans and keep the scale-safe shapes") {
    // drift reads only the binned value + the slice column from orders
    // (lazy variant: the public path localCheckpoints its bounded report,
    // which hides the scan from the executed plan)
    val drift = planOf(CatalogOps.driftQueryLazy(spark, Sf))
    val drs = drift.indexOf("ReadSchema")
    assert(drs >= 0, s"no ReadSchema in:\n$drift")
    val dschema = drift.substring(drs, math.min(drs + 250, drift.length))
    assert(dschema.contains("o_totalprice") && dschema.contains("o_orderdate") &&
      !dschema.contains("o_comment") && !dschema.contains("o_custkey"),
      s"drift scan not pruned to its 2 columns: $dschema")
    // supplier share: one lineitem scan pruned to the 3 revenue columns
    val share = planOf(Relational.supplierShare(spark, Sf))
    val srs = share.indexOf("ReadSchema")
    val sschema = share.substring(srs, math.min(srs + 300, share.length))
    assert(sschema.contains("l_suppkey") && sschema.contains("l_extendedprice") &&
      !sschema.contains("l_shipdate"),
      s"supplier-share scan not pruned: $sschema")
    // zipf fit ranks through TakeOrdered, never a full-vocab global sort
    // (lazy variant, same reason as drift above)
    val zipf = planOf(graft.operators.TextOps.zipfFit(
      Lake.documents(spark, Sf), 1000, materialize = false))
    assert(zipf.contains("TakeOrderedAndProject"),
      s"zipf head cut must be top-K, got:\n$zipf")
  }

  test("parallel equi-depth binning plans no window (serial sort) at all") {
    // the exact ntile form is the oracle twin; the parallel form must keep
    // the whole plan window-free: cutpoint aggregate + map-side CASE chain
    val plan = planOf(CatalogOps.quantileBinsApprox(spark, Sf))
    assert(!plan.contains("Window"), s"window in parallel binning plan:\n$plan")
  }

  test("parallel ABC/Lorenz twins plan no single-partition stage") {
    // the serial forms cumulate through an UNPARTITIONED window — an
    // Exchange SinglePartition, the one stage that cannot scale out. The
    // twins decompose the global order into value-range buckets; their
    // only windows are bucket-partitioned, so the whole physical plan
    // must be free of SinglePartition exchanges.
    val abc = planOf(graft.operators.Relational.abcPartsPar(spark, Sf))
    assert(!abc.contains("SinglePartition"),
      s"serial stage in parallel ABC plan:\n$abc")
    val lor = planOf(graft.operators.Relational.lorenzCurvePar(spark, Sf))
    assert(!lor.contains("SinglePartition"),
      s"serial stage in parallel Lorenz plan:\n$lor")
    // contrast: the exact twins keep the serial stage (that is WHY the
    // parallel forms exist) — if this ever changes, the twin is obsolete
    val abcSerial = planOf(graft.operators.Relational.abcParts(spark, Sf))
    assert(abcSerial.contains("SinglePartition"),
      "exact ABC no longer has a serial stage; fold the twins")
  }

  test("bot screen reuses the window's user partitioning for the aggregate (one hash shuffle)") {
    // the lag window hash-partitions by user_id; the follow-on user-keyed
    // aggregate must ride that same partitioning instead of re-shuffling
    // (the sessionize discipline). Final orderBy adds a range exchange;
    // the corpus-sized data must cross the wire exactly once.
    val plan = planOf(EventOps.botScreen(spark, Sf))
    val hashShuffles = "hashpartitioning".r.findAllIn(plan).length
    assert(hashShuffles == 1,
      s"expected exactly one hash shuffle, found $hashShuffles:\n$plan")
  }

  test("weighted sample plans TakeOrderedAndProject, not a global sort") {
    val plan = planOf(CorpusOps.weightedSampleQuery(spark, Sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted sample must rank via top-K, got:\n$plan")
  }

  test("quality sweep reads the corpus exactly once (no probe double scan)") {
    // third recurrence of the double-scan pattern (surprisal r5, caches
    // r6, qualitySweep r7): a count()/head() probe that re-executes the
    // full upstream pipeline. The sweep's denominator must come from the
    // bounded bucket histogram, so the WHOLE computation — interior
    // actions included — touches the documents parquet exactly once.
    val plans = allPlansOf(TextOps.qualitySweep(spark, Sf))
    val scans = plans.map(p =>
      "documents\\.parquet".r.findAllIn(p).length).sum
    assert(scans == 1, s"expected exactly 1 documents scan, saw $scans in " +
      s"${plans.length} executed plan(s)")
  }

  test("grand-total analytics read their fact table exactly once") {
    // fourth recurrence risk of the double-scan pattern: a share/total
    // denominator computed as a separate .agg() subplan re-executes the
    // whole scan + aggregate. These operators must derive totals from an
    // unpartitioned window (or one conditional aggregate) over the
    // already-aggregated bounded frame — one fact scan, interior
    // actions included.
    val cases: Seq[(String, () => org.apache.spark.sql.DataFrame, String)] = Seq(
      ("benford", () => graft.operators.CatalogOps.benford(
        spark, Sf, "orders", "o_totalprice"), "orders\\.parquet"),
      ("abcParts", () => graft.operators.Relational.abcParts(spark, Sf),
        "lineitem\\.parquet"),
      ("neyman", () => graft.operators.CorpusOps.neymanQuery(spark, Sf),
        "documents\\.parquet"),
      ("abReadout", () => graft.operators.EventOps.abReadout(spark, Sf),
        "events\\.parquet"))
    for ((name, build, scanRe) <- cases) {
      val plans = allPlansOf(build())
      val scans = plans.map(p => scanRe.r.findAllIn(p).length).sum
      assert(scans == 1,
        s"$name: expected exactly 1 fact scan, saw $scans in ${plans.length} plan(s)")
    }
    // the market-basket family reads the shared basket ARTIFACT: the
    // fact table is scanned at most once (the artifact build, if this is
    // the session's first basket consumer) — never per consumer
    val icPlans = allPlansOf(graft.operators.Relational.itemCosine(spark, Sf))
    // count PLANS touching the fact table (one plan may print the path
    // more than once): only the artifact-build job may
    val liScans = icPlans.count(_.contains("lineitem.parquet"))
    assert(liScans <= 1,
      s"itemCosine: at most the one artifact-build fact scan, saw $liScans")
    assert(icPlans.exists(p => p.contains("graft_baskets_")),
      "itemCosine must read the shared basket artifact")
    // near-dup family: clusters read the shared verified-pairs artifact;
    // after the one-time build, no signature/verify corpus scans recur
    val ndPlans = allPlansOf(
      graft.operators.DedupOps.nearDupClusters(spark, Sf))
    assert(ndPlans.exists(p => p.contains("graft_neardup_")),
      "nearDupClusters must read the shared pairs artifact")
    val nd2 = allPlansOf(graft.operators.DedupOps.nearDupClusters(spark, Sf))
    assert(!nd2.exists(_.contains("documents.parquet")),
      "a second cluster call must not re-scan the corpus (artifact reuse)")
  }

  /** Substring-occurrence features over every plan a query executes —
    * the raw material for the slowest-10 fingerprints below. Counts are
    * AQE-noisy (initial + final plan sections), so fingerprints assert
    * presence/absence, never exact counts. */
  private def planFeatures(plans: Seq[String]): Map[String, Int] = {
    def cnt(re: String): Int = plans.map(p => re.r.findAllIn(p).length).sum
    Map(
      "bhj" -> cnt("BroadcastHashJoin"),
      "smj" -> cnt("SortMergeJoin"),
      "cart" -> cnt("CartesianProduct"),
      "window" -> cnt("Window"),
      "single" -> cnt("SinglePartition"),
      "pushed" -> cnt("PushedFilters: \\[[A-Z]"),
      "topk" -> cnt("TakeOrderedAndProject"))
  }

  /** The slowest-10's healthy-plan invariants: the properties whose
    * loss is exactly how these queries would silently regress (a lost
    * broadcast → the fact stream shuffles; a lost pushdown → full
    * scans; a surprise product → quadratic work). Each entry returns
    * the violated claims; empty = healthy. */
  private val slowFingerprints
      : Seq[(String, Map[String, Int] => Seq[String])] = {
    def claims(cs: (String, Map[String, Int] => Boolean)*)
        (f: Map[String, Int]): Seq[String] =
      cs.collect { case (msg, ok) if !ok(f) => msg }
    Seq(
      // scoring join ships the dimension-sized sim frame broadcast;
      // filters reach the order/lineitem scans
      "q_cf_eval" -> claims(
        "no product join" -> (_("cart") == 0),
        "scoring joins broadcast" -> (_("bhj") > 0),
        "scan pushdown present" -> (_("pushed") > 0)) _,
      // MM iteration: supplier-keyed broadcasts, no merge-join chains
      "q_bradley_terry" -> claims(
        "no product join" -> (_("cart") == 0),
        "iteration joins broadcast" -> (_("bhj") > 0),
        "top-k readout stays TakeOrdered" -> (_("topk") > 0)) _,
      // bucketed set-similarity: bounded-side broadcasts + pushdown
      "q_setsim_pairs" -> claims(
        "no product join" -> (_("cart") == 0),
        "bucket joins broadcast" -> (_("bhj") > 0),
        "scan pushdown present" -> (_("pushed") > 0)) _,
      // greedy k-center: every round ends in one TakeOrdered argmax
      "q_kcenter" -> claims(
        "no product join" -> (_("cart") == 0),
        "per-round argmax is top-K, not global sort" -> (_("topk") > 0)) _,
      // FD width: ONE one-row width broadcast is the only serial stage
      "q_auto_hist" -> claims(
        "no product join" -> (_("cart") == 0),
        "at most one one-row serial stage" -> (_("single") <= 1)) _,
      "q_source_jsd" -> claims(
        "no product join" -> (_("cart") == 0),
        "vocab joins broadcast" -> (_("bhj") > 0),
        "scan pushdown present" -> (_("pushed") > 0)) _,
      // version diff: full-outer can never broadcast — it must stay a
      // key-shuffled join, and both version scans stay pushdown-capable
      "q_snapshot_diff" -> claims(
        "no product join" -> (_("cart") == 0),
        "full-outer diff is a shuffled key join" -> (_("smj") > 0),
        "version scans keep pushdown" -> (_("pushed") > 0)) _,
      "q_join_cardinality" -> claims(
        "no product join" -> (_("cart") == 0),
        "profile joins broadcast" -> (_("bhj") > 0),
        "scan pushdown present" -> (_("pushed") > 0)) _,
      // façade time travel: one version-pruned pushdown scan, no window
      "q_snapshot_read" -> claims(
        "no product join" -> (_("cart") == 0),
        "version scan keeps pushdown" -> (_("pushed") > 0),
        "no serial stage" -> (_("single") == 0)) _,
      // first-touch paths: user-partitioned windows only, single scan
      "q_attribution" -> claims(
        "no product join" -> (_("cart") == 0),
        "path windows present (user-partitioned)" -> (_("window") > 0),
        "no serial stage" -> (_("single") == 0)) _)
  }

  test("slowest-10 plan fingerprints: broadcasts, pushdown, no products") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, check) <- slowFingerprints) {
      val f = planFeatures(allPlansOf(SparkEntry.queries(name)(spark, Sf)))
      check(f).foreach(v => offenders += s"$name: $v ($f)")
    }
    assert(offenders.isEmpty,
      s"slowest-10 fingerprint violations:\n  ${offenders.mkString("\n  ")}")
  }

  test("the fingerprints have teeth: a lost broadcast is caught") {
    import org.apache.spark.sql.functions._
    // an auto-broadcast dimension join (no explicit hint), fingerprinted
    // the same way as the slowest-10
    def q() = Lake.orders(spark, Sf).join(
      Lake.orders(spark, Sf).select(col("o_orderpriority")).distinct()
        .withColumnRenamed("o_orderpriority", "p").limit(3),
      col("o_orderpriority") === col("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
    val healthy = planFeatures(allPlansOf(q()))
    assert(healthy("bhj") > 0, s"setup: dim join should auto-broadcast: $healthy")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // deliberately break the plan: planner may no longer broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val broken = planFeatures(allPlansOf(q()))
      assert(broken("bhj") == 0,
        s"break setup failed — join still broadcasts: $broken")
      // ...and the fingerprint style used above catches exactly that
      assert(!(broken("bhj") > 0) && (healthy("bhj") > 0),
        "the broadcast fingerprint must separate healthy from broken")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("no registered query plans an unintended product join") {
    // the broad regression net: every SparkEntry query's physical plan is
    // free of CartesianProduct, except where the product IS the semantics
    // (explicit cross join) or a broadcast nested loop over a bounded
    // broadcast side is the intended linear plan (brute-force ANN)
    val intendedProducts = Set("q_cross_join")
    // intended bounded-broadcast nested loops: q_term_stats (one-row
    // corpus count), q_ann_ivf (16 centroid rows against the corpus for
    // cell assignment), q_ann_bruteforce (8 query rows), q_incremental_ndv
    // (one-row merged estimate × one-row exact NDV),
    // q_incremental_quantiles (one-row merged sketch estimates × the
    // rank-check scan)
    // ... q_set_overlap (one-row sketch estimates × one-row exact pass),
    // q_surprisal (one-row corpus token total), q_gap_fill (the dense
    // hour × event-type spine: both sides bounded by nature, the product
    // IS the resample grid), q_bm25 (one-row N/avgdl corpus-stats
    // broadcast, same pattern as q_surprisal/q_term_stats), q_enum_columns
    // (one-row ndv × one-row bounded dictionary head per candidate)
    // ... q_idle_rich (one-row balance-stats broadcast, Q22's scalar
    // threshold), q_ann_indexed (the stored-centroid twin of q_ann_ivf —
    // same 16-row centroid broadcast for cell assignment),
    // q_supplier_share / q_top_supplier (one-row global total / max
    // broadcast, the Q11/Q15 scalar thresholds), q_anomalies (inherits
    // q_gap_fill's bounded hour × event-type spine)
    val intendedBnlj =
      Set("q_cross_join", "q_ann_bruteforce", "q_ann_filtered", "q_term_stats",
        "q_ann_ivf", "q_incremental_ndv", "q_incremental_quantiles",
        "q_set_overlap", "q_surprisal", "q_gap_fill", "q_bm25",
        "q_enum_columns", "q_idle_rich", "q_ann_indexed",
        "q_supplier_share", "q_top_supplier", "q_anomalies",
        // q_drift / q_zipf: one-row aggregate broadcasts (bin totals /
        // corpus vocab stats); q_ann_adc: 16-row centroid broadcast (as
        // q_ann_ivf) + the one-row calibration-array broadcast;
        // q_windowed_psi: bounded buckets × reference-bins grid;
        // q_t_closeness: bounded groups × sensitive-values grid + one-row
        // total
        // q_rolling_psi: bounded buckets × bins grid (as q_windowed_psi)
        // q_ann_pq: 16-row centroid broadcast for cell assignment (as
        // q_ann_adc); the per-cell calibration joins on the cell KEY
        // q_winsorize: one-row percentile-fence broadcast (the
        // q_supplier_share scalar-threshold pattern)
        "q_drift", "q_zipf", "q_ann_adc", "q_windowed_psi", "q_t_closeness",
        "q_rolling_psi", "q_ann_pq", "q_winsorize",
        // q_train_order: the per-source-counts broadcast (bounded by
        // source cardinality) against which each row computes its
        // closed-form global ordinal
        "q_train_order",
        // q_collocations: one-row bigram-total broadcast (the PMI N);
        // q_doc_keywords: one-row corpus-size broadcast (the idf N);
        // q_heaps: the steps-row percentile-cutoff broadcast each doc /
        // first-occurrence row compares against (bounded fan-out × steps)
        "q_collocations", "q_doc_keywords", "q_heaps",
        // q_seasonal: inherits q_gap_fill's bounded hour × event-type
        // spine (same dense series the rolling q_anomalies scores)
        "q_seasonal",
        // q_auto_hist: one-row Freedman–Diaconis width broadcast (the
        // q_winsorize scalar-threshold pattern)
        "q_auto_hist",
        // q_assoc_rules: one-row basket-total broadcast (the lift/support
        // denominator — the q_bm25 corpus-stats pattern)
        "q_assoc_rules",
        // q_hybrid_retrieval: inherits q_bm25's one-row N/avgdl broadcast
        // in its sparse leg
        "q_hybrid_retrieval",
        // q_ann_recall: inherits q_ann_bruteforce's bounded 8-query
        // broadcast in its exact leg
        "q_ann_recall",
        // q_retrieval_ndcg: the same bounded 8-query broadcast (exact
        // ranking leg) + the label-prevalence broadcast
        "q_retrieval_ndcg",
        // q_backtest: the bounded test-days × types × 24-hours spine
        // (the q_gap_fill dense-grid pattern)
        "q_backtest",
        // q_acf / q_survival: one-row global-moment / corpus-end
        // broadcasts against bounded daily/user frames; q_rfm: the
        // corpus-end and quintile-fence one-row broadcasts (all the
        // q_supplier_share scalar-threshold pattern)
        "q_acf", "q_survival", "q_rfm",
        // q_matryoshka: both legs inherit q_ann_bruteforce's bounded
        // 8-query broadcast
        "q_matryoshka",
        // q_conformal: the bounded days x types x 24-hours spine, twice
        // (calibration + test grids — the q_gap_fill/q_backtest pattern)
        "q_conformal",
        // q_silhouette: the bounded label-centroid broadcast against the
        // vector frame (n x L with L small — the intended linear plan)
        "q_silhouette",
        // q_cross_corr: two one-row per-series moment broadcasts (the
        // q_acf pattern, one per side)
        "q_cross_corr",
        // q_lorenz_par: the 10-row decile frame cumulating through a
        // broadcast triangular self-join (decile ≤ decile) — the
        // window-free replacement for the serial cumulative window
        "q_lorenz_par",
        // q_ann_graph: the queries × entry-points seed beam (8 × 4) and
        // the per-round broadcast of the bounded beam frame — the
        // intended linear expansion plan, never a corpus product
        "q_ann_graph",
        // q_heldout_ppl: the one-row (N, V) model-stats broadcast (the
        // q_surprisal corpus-total pattern)
        "q_heldout_ppl",
        // q_nb_classify / q_nb_confusion: the one-row prior-total and
        // (V) vocab-stat broadcasts plus the classes-bounded grid — the
        // q_heldout_ppl model-stats pattern per class
        "q_nb_classify", "q_nb_confusion",
        // q_kmeans: the k-row centroid broadcast against the corpus scan
        // each iteration (the q_ann_ivf 16-centroid assignment pattern)
        "q_kmeans",
        // q_pca_top: one-row dim-count / norm / trace broadcasts around
        // the d²-bounded matrix (the scalar-threshold pattern)
        "q_pca_top",
        // q_mmr: the one-row query-vector broadcast builds the pool
        // (q_ann_bruteforce pattern); the poolK² sim matrix and greedy
        // argmax steps are pool-bounded products BY DESIGN
        "q_mmr",
        // q_cms: the d=4 salt-row broadcast fanning each token into its
        // d sketch cells (the q_ann_ivf bounded-constant-side pattern)
        "q_cms",
        // q_hll: the dense 64-register × event-type grid (the
        // q_windowed_psi bounded-grid pattern) + one-row exact-NDV
        // comparison broadcast
        "q_hll",
        // q_theil_sen: the calendar-bounded triangular day-pairs self-
        // join (the q_lorenz_par pattern) + one-row median/total
        // broadcasts
        "q_theil_sen",
        // q_rank_corr: the same calendar-bounded triangular pairs frame
        // (Kendall concordance) + one-row moment broadcasts
        "q_rank_corr",
        // q_logreg / q_logreg_auc: the one-row weight- and gradient-
        // frame broadcasts of each GD step, and the one-row class-totals
        // broadcast against the bounded distinct-score frame (the
        // q_supplier_share scalar-threshold pattern)
        "q_logreg", "q_logreg_auc",
        // q_logreg_gains: the same trainer broadcasts + the one-row
        // band-totals broadcast on the bounded distinct-score frame
        "q_logreg_gains",
        // q_stump / q_tree2: the one-row (root) and two-row (per-node)
        // class-totals broadcasts against bounded distinct-threshold
        // histograms, plus the one-row chosen-split broadcast the
        // assignment pass travels with (same pattern)
        "q_stump", "q_tree2",
        // q_ridge_cv: the one-row total-Gram broadcast against the
        // k-row fold-Gram frame (the q_supplier_share pattern)
        "q_ridge_cv",
        // q_shapley: the 2^n coalition lattice — containment and
        // bit-disjointness joins over ≤16-row broadcast frames (the
        // design-constant grid, the q_windowed_psi pattern)
        "q_shapley",
        // q_isotonic: the (i, j, k) interval enumeration — two range
        // joins over the ≤10-row broadcast decile frame
        "q_isotonic",
        // q_mde: the one-row distinct-user-count broadcast (the
        // q_supplier_share scalar-threshold pattern)
        "q_mde",
        // q_fs_weights: the one-row m-count / u-frequency / record-count
        // broadcasts composed around the NDV-bounded match join
        "q_fs_weights",
        // q_ppmi_vec: the q_pca_top iteration pattern — one-row total /
        // dimension / norm broadcasts around the vocab²-bounded matrix
        "q_ppmi_vec",
        // q_changepoint: the one-row series-totals broadcast against
        // the bounded day frame (the q_supplier_share pattern)
        "q_changepoint",
        // q_boost2: per-round one-row class-totals / chosen-stump
        // broadcasts against the bounded threshold histograms (the
        // q_stump pattern, twice)
        "q_boost2",
        // q_huber: per-IRLS-step one-row coefficient / scale broadcasts
        // against the corpus scan (the q_logreg weight-frame pattern)
        "q_huber",
        // q_nb_metrics: the one-row corpus-total broadcast against the
        // classes²-bounded confusion-cell frame (the q_supplier_share
        // pattern)
        "q_nb_metrics",
        // q_cf_eval: the one-row eval-population × one-row hit-totals
        // broadcast composing the final readout
        "q_cf_eval",
        // q_ar2: one-row stats / coefficient / mean broadcasts against
        // the bounded day frame (the q_changepoint pattern)
        "q_ar2",
        // q_att_strat: one-row overall / support-totals broadcasts
        // against the bounded stratum frame
        "q_att_strat",
        // q_logrank: the one-row corpus-end broadcast against the user
        // frame (the q_survival pattern) + one-row E/V totals
        "q_logrank",
        // q_periodogram: one-row mean / moment broadcasts against the
        // 13-period bounded grid (the q_windowed_psi pattern)
        "q_periodogram",
        // q_pacf: the one-row moment broadcast against the 3-lag ACF
        // frame (the q_ar2 pattern)
        "q_pacf",
        // q_entropy_rate: one-row total / entropy-sum broadcasts around
        // the event-type²-bounded cell frame
        "q_entropy_rate",
        // q_good_turing: the one-row corpus-total broadcast against the
        // bounded frequency-of-frequencies grid
        "q_good_turing",
        // q_ipw: the one-row support-totals broadcast against the
        // bounded stratum frame
        "q_ipw",
        // q_rec_coverage: the one-row recommended-set totals broadcast
        // against the one-row catalog totals
        "q_rec_coverage",
        // q_cox: the one-row corpus-horizon broadcast against the
        // customer frame (the q_logrank pattern) + one-row U/I totals
        "q_cox",
        // q_psm_att: the one-row treated-count broadcast composing the
        // final readout (the q_cf_eval pattern)
        "q_psm_att",
        // q_poisson: per-IRLS-step one-row coefficient broadcasts
        // against the customer frame (the q_huber pattern)
        "q_poisson",
        // q_poisson_disp: the same per-step coefficient broadcasts plus
        // the one-row fit against the customer frame
        "q_poisson_disp",
        // q_logreg_ece: the one-row bin/corpus-totals broadcasts around
        // the ≤10-row bin frame (the q_logreg weight-frame pattern)
        "q_logreg_ece",
        // q_gbt2: per-round one-row f0/stump/mse broadcasts against the
        // corpus scan (the q_huber pattern)
        "q_gbt2",
        // q_kendall: the one-row pair-class pivot broadcast against the
        // one-row day-count total
        "q_kendall",
        // q_keyness: the one-row slice-totals broadcast against the
        // vocab-bounded keyness frame (the q_good_turing pattern)
        "q_keyness",
        // q_audience_overlap: the type²-bounded pair grid from the
        // bounded per-type size frame (the q_entropy_rate pattern)
        "q_audience_overlap",
        // q_rbo: the depth-bounded k grid (≤50 rows) range-joined to the
        // ≤depth matched-rank frame — both sides constants at any scale
        "q_rbo",
        // q_cronbach: one-row user-count / total-variance broadcasts
        // around the type-bounded item frame (the q_good_turing pattern)
        "q_cronbach",
        // q_term_burstiness: the one-row doc-count broadcast against the
        // vocab-bounded term frame (the q_good_turing pattern)
        "q_term_burstiness",
        // q_clustering_coef: four one-row summary broadcasts composing
        // the final readout (the q_rec_coverage pattern)
        "q_clustering_coef",
        // q_permutation_test: the 64-row permutation grid broadcast over
        // the user frame (bounded map-side fan-out) + the one-row
        // observed-diff broadcast
        "q_permutation_test",
        // q_friedman: the calendar-days × event-types zero-fill grid
        // (days.crossJoin(broadcast(types)) at EventOps.friedman) — both
        // sides bounded (the q_gap_fill dense-spine precedent)
        "q_friedman",
        // q_kendall_w: the same bounded days × types zero-fill grid as
        // q_friedman, plus two one-row summary broadcasts
        "q_kendall_w",
        // q_kruskal: one-row tie-total broadcast over the ≤5-segment
        // frame (the q_rec_coverage readout pattern)
        "q_kruskal",
        // q_tukey_hsd: the 5×5 segment pair grid (non-equi a < b) plus
        // the one-row MSW broadcast — both sides dimension-bounded
        "q_tukey_hsd",
        // q_davies_bouldin: the label×label centroid pair grid
        // (≤10×10, the q_silhouette centroid-broadcast pattern)
        "q_davies_bouldin",
        // q_rec_novelty: two one-row popularity-total / catalog-mean
        // broadcasts (the q_rec_coverage readout pattern)
        "q_rec_novelty",
        // q_exp_fit / q_embedding_isotropy / q_column_entropy: one-row
        // total/KS/norm broadcasts (the q_rec_coverage readout pattern)
        "q_exp_fit", "q_embedding_isotropy", "q_column_entropy",
        // q_hits: one-row L1-total broadcast per normalization round
        // (the q_rec_coverage readout pattern)
        "q_hits",
        // q_hurst: one-row regression-slope broadcast over the ≤4-point
        // block-size frame (the q_rec_coverage readout pattern)
        "q_hurst",
        // q_uplift: one-row user-total broadcast over the bounded
        // distinct-score frame (the q_rec_coverage readout pattern)
        "q_uplift",
        // q_kcenter: the ≤k-row center frame broadcast over the corpus —
        // each greedy round's intentional bounded product (the
        // q_davies_bouldin centroid-broadcast pattern)
        "q_kcenter",
        // q_kn_ppl: the one-row (T, V) model-totals broadcast (the
        // q_good_turing pattern)
        "q_kn_ppl",
        // q_modularity: the one-row exact-Q-total broadcast over the
        // community frame (the q_rec_coverage readout pattern)
        "q_modularity",
        // q_label_homophily: the one-row endpoint-mass broadcast onto
        // the one-row edge aggregate (the q_rec_coverage pattern)
        "q_label_homophily")
    // collect ALL offenders before failing — a fail-fast assert hides
    // every offender behind the first and costs a full re-run per fix
    val offenders = scala.collection.mutable.LinkedHashSet[String]()
    for ((name, fn) <- SparkEntry.queries) {
      // interior plans included: checkpointing operators execute their
      // real joins during construction and return an RDD-scan facade
      for (plan <- allPlansOf(fn(spark, Sf))) {
        if (!intendedProducts(name) && plan.contains("CartesianProduct"))
          offenders += s"$name plans a CartesianProduct"
        if (!intendedBnlj(name) && plan.contains("BroadcastNestedLoopJoin"))
          offenders += s"$name plans a BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty,
      s"unintended product joins:\n  ${offenders.mkString("\n  ")}")
  }
}
