package graft

import org.apache.spark.sql.functions._

/** The facade delegates faithfully and the end-to-end corpus clean
  * composes its stages in the documented order. */
class DataLakeSpec extends SparkSpecBase {

  private lazy val lake = DataLake(spark, Sf)

  test("facade delegates match the operator modules") {
    assert(lake.tables.collect().map(_.getString(0)).toSeq == Lake.tableNames.sorted)
    assert(lake.dedupExact().count() ==
      graft.operators.DedupOps.dedupExact(spark, Sf).count())
    assert(lake.qualityRules().columns.contains("keep"))
    // the diagnostic / mining / image surface added this round
    assert(lake.imageNearDups().columns.toSeq ==
      Seq("doc_a", "doc_b", "hamming"))
    assert(lake.entityMatch("part", "p_name", 3).count() ==
      graft.operators.DedupOps
        .entityMatch(Lake.part(spark, Sf), "p_name", 3).count())
    assert(lake.sourceJsd().columns.contains("jsd"))
    assert(lake.dailyUsers().columns.contains("cum_users"))
    // the round-10 corpus-version surface
    import org.apache.spark.sql.functions.{col, lit, pmod}
    assert(lake.annSearchGraph().columns.toSeq ==
      Seq("q_id", "neighbor_id", "sim", "rnk"))
    assert(lake.embeddingDrift(pmod(col("vec_id"), lit(2)) === 0,
      pmod(col("vec_id"), lit(2)) === 1).columns.contains("centroid_cos"))
    assert(lake.heldoutPerplexity(pmod(col("doc_id"), lit(2)) === 0,
      pmod(col("doc_id"), lit(2)) === 1).columns.contains("avg_neg_logp"))
    assert(lake.tokenWaterfillFrac().columns.contains("water_level"))
    assert(lake.fdrReadout().columns.contains("q_value"))
    assert(lake.botScreen().columns.contains("cv_gap"))
    // the eval-loop / model-fit / retrieval surface added this session
    assert(lake.nbConfusion().columns.toSeq ==
      Seq("lang", "lang_pred", "n", "share_of_actual"))
    assert(lake.olsMulti().columns.toSeq ==
      Seq("source", "n", "b0", "b1", "b2", "r2"))
    assert(lake.pcaTop().columns.toSeq ==
      Seq("dim", "loading", "eigval", "var_share"))
    assert(lake.kmeans().columns.toSeq == Seq("vec_id", "cluster", "dist"))
    assert(lake.mmrRerank().columns.toSeq ==
      Seq("rank", "doc_id", "rel", "maxsim", "mmr"))
    assert(lake.recommend().columns.toSeq ==
      Seq("custkey", "partkey", "score", "n_src", "rnk"))
    assert(lake.hllNdv().columns.contains("ndv_hll"))
    assert(lake.normalize().columns.contains("text"))
    // the eval/statistics surface added this session
    assert(lake.nbMetrics().columns.toSeq == Seq("n", "n_classes",
      "accuracy", "macro_precision", "macro_recall", "macro_f1", "kappa"))
    assert(lake.cfHitRate().columns.toSeq ==
      Seq("k", "n_eval", "n_hits", "hit_rate", "mrr"))
    assert(lake.recCoverage().columns.contains("popularity_bias"))
    assert(lake.ar2Forecast().columns.contains("skill"))
    assert(lake.pacf().columns.toSeq ==
      Seq("n_days", "r1", "r2", "r3", "pacf1", "pacf2", "pacf3"))
    assert(lake.periodogram().columns.toSeq ==
      Seq("period_days", "power", "is_peak"))
    assert(lake.attStratified().columns.contains("att"))
    assert(lake.cmhTest().columns.contains("or_mh"))
    assert(lake.ipwAte().columns.contains("ess_treated"))
    assert(lake.logrank().columns.contains("chi2"))
    assert(lake.mannWhitney().columns.contains("u_stat"))
    assert(lake.entropyRate().columns.contains("predictability"))
    assert(lake.interarrival().columns.contains("cum_share"))
    assert(lake.chao1Richness().columns.contains("chao1"))
    assert(lake.yuleK().columns.contains("yule_k"))
    assert(lake.goodTuring().columns.contains("p_smoothed"))
  }

  test("cleanCorpus drops exact dups, near dups, and low-quality docs") {
    val docs = lake.documents.filter(col("text").isNotNull)
    val cleaned = lake.cleanCorpus()
    assert(cleaned.count() > 0 && cleaned.count() <= docs.count())
    // no near-dup pair survives inside the cleaned corpus
    val survivors = graft.operators.DedupOps.nearDupPairs(cleaned).count()
    assert(survivors == 0, s"$survivors near-dup pairs survived cleaning")
    // every survivor passes the quality rules
    val bad = graft.operators.TextOps.qualityRules(cleaned)
      .filter(!col("keep")).count()
    assert(bad == 0, s"$bad low-quality docs survived cleaning")
  }
}
