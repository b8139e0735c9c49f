package graft.operators

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Lake

/** Collaborative-filtering recommender over the purchase graph — the
  * third distributed MLlib trainer in the engine (beside PCA and the
  * k-means IVF quantizer): ALS matrix factorization on IMPLICIT
  * feedback (purchase counts as confidence, the Hu/Koren/Volinsky
  * formulation), the classic "customers who bought X" engine.
  *
  * Scale notes: ALS is the canonical distributed factorizer — each
  * iteration solves per-user and per-item least-squares blocks with only
  * the factor matrices shuffled, so it runs where the rating matrix
  * never fits one machine. MLlib's implementation requires INT ids; the
  * lake's keys fit at test scale, and at corpus scale the standing
  * recipe is a dense-rank id dictionary (bounded by the entity universe,
  * the entityMatch dictionary discipline) — the trainer itself is
  * unchanged. Training is seeded: same data, same seed, same model.
  * Test-only (RecommendSpec): factorization quality has no SQL oracle,
  * so the spec asserts ranking behavior — observed purchases score above
  * unobserved pairs, and per-user top-N comes back complete. */
object Recommend {

  /** Per-(customer, part) purchase counts — the implicit-feedback
    * "ratings": one fact⋈fact join, one aggregate, counts as confidence
    * (never fake explicit scores). */
  def purchaseCounts(spark: SparkSession, dir: String): DataFrame =
    Lake.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Lake.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").cast("int").as("user"),
        col("l_partkey").cast("int").as("item"))
      .agg(count(lit(1)).cast("float").as("rating"))

  /** Seeded implicit-ALS trainer over [[purchaseCounts]]. */
  def trainAls(ratings: DataFrame, rank: Int = 8, iters: Int = 5,
               regParam: Double = 0.1, alpha: Double = 1.0,
               seed: Long = 42L): ALSModel =
    new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setImplicitPrefs(true)
      .setRank(rank).setMaxIter(iters)
      .setRegParam(regParam).setAlpha(alpha)
      .setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(ratings)

  /** Per-user top-`n` recommendations, flattened to
    * (user, item, score, rnk) rows — the serving-table shape. */
  def topN(model: ALSModel, n: Int): DataFrame =
    model.recommendForAllUsers(n)
      .select(col("user"), posexplode(col("recommendations")))
      .select(col("user"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.item").as("item"),
        round(col("col.rating").cast("double"), 4).as("score"))
      .orderBy(col("user"), col("rnk"))
}
