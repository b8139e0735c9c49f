package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared CF serving-table artifact: the [[Relational.itemKnnRecommend]]
  * output (top-N unowned parts per customer) materialized ONCE per
  * (session, lake dir, corpus fingerprint) and read back by the
  * recommender HEALTH READOUTS — catalog coverage
  * ([[Relational.recCoverage]]) and novelty ([[Relational.recNovelty]]).
  * Measured motive (VERDICT_r14 / BENCH_LOCAL_r14 sf10 sweep): each
  * readout rebuilt the full serving table inline — q_rec_coverage 250 s
  * and q_rec_novelty 238 s at sf10, both within noise of the build
  * itself — so the family paid the similarity-model + scoring-join cost
  * three times per sweep. Served through the [[ArtifactStore]] versioned
  * slot discipline (fingerprint-probed staleness over lineitem+orders,
  * builds counted in `artifact_builds`), exactly the [[BasketArtifact]]
  * pattern.
  *
  * Deliberately NOT used by `q_recommend` itself: the serving table IS
  * that query's declared result, and a declared result must be computed
  * by its own invocation — only the two readouts that consume it as an
  * input share the build. `q_cf_eval` cannot share either: its
  * leave-last-out retrain must bypass any model fitted on all orders
  * (the no-leakage discipline). */
object RecServingArtifact {

  def sharedRecs(spark: SparkSession, lakeDir: String): DataFrame = {
    val dir = ArtifactStore.familyDir(spark, lakeDir, "recserve")
    val fp = ArtifactStore.corpusFingerprint(spark, lakeDir,
      Seq("lineitem", "orders"))
    val dataDir = ArtifactStore.resolve(spark, dir, fp) { out =>
      ArtifactStore.refreshSources(spark, lakeDir, Seq("lineitem", "orders"))
      Relational.itemKnnRecommend(spark, lakeDir)
        .write.mode("overwrite").parquet(out)
    }
    spark.read.parquet(dataDir)
  }
}
