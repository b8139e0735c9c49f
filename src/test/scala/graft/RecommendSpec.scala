package graft

import org.apache.spark.sql.functions._

import graft.operators.Recommend

/** Behavioral checks for the ALS recommender: no SQL oracle exists for a
  * factorization, so the bar is ranking quality — the model must score
  * what a customer actually bought above what they never touched — plus
  * determinism of the seeded trainer's serving output shape. */
class RecommendSpec extends SparkSpecBase {

  test("implicit ALS ranks observed purchases above unobserved pairs") {
    val ratings = Recommend.purchaseCounts(spark, Sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = Recommend.trainAls(ratings)
    // score every observed pair and an equal-sized set of deterministic
    // unobserved pairs (user x shifted item, anti-joined)
    val users = ratings.select(col("user")).distinct()
    val unobserved = users
      .crossJoin(ratings.select(col("item")).distinct()
        .orderBy(col("item")).limit(40))
      .join(ratings.select(col("user"), col("item")), Seq("user", "item"),
        "left_anti")
    val obsScore = model.transform(ratings)
      .agg(avg(col("prediction"))).collect()(0).getDouble(0)
    val unobsScore = model.transform(
        unobserved.withColumn("rating", lit(0f)))
      .agg(avg(col("prediction"))).collect()(0).getDouble(0)
    assert(obsScore > unobsScore,
      s"observed mean $obsScore must beat unobserved $unobsScore")
    ratings.unpersist(false)
  }

  test("top-N serving table is complete, ranked, and deterministic in shape") {
    val ratings = Recommend.purchaseCounts(spark, Sf)
    val model = Recommend.trainAls(ratings)
    val top = Recommend.topN(model, 5).collect()
    val nUsers = ratings.select(col("user")).distinct().count()
    assert(top.length == nUsers * 5)
    val byUser = top.groupBy(_.getInt(0))
    for ((_, rows) <- byUser) {
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 5))
      // scores non-increasing down the rank
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      // recommended items are distinct per user
      assert(rows.map(_.getInt(2)).distinct.length == 5)
    }
  }

  test("item-kNN recommend: never an owned item, positive neighborhood scores, contiguous ranks") {
    import graft.operators.Relational
    val recs = Relational.itemKnnRecommend(spark, Sf).collect()
    assert(recs.nonEmpty)
    val owned = graft.Lake.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(graft.Lake.orders(spark, Sf)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (r <- recs) {
      assert(!owned((r.getLong(0), r.getLong(1))),
        s"recommended an owned item: $r")
      assert(r.getDouble(2) > 0.0 && r.getLong(3) >= 1)
    }
    val byUser = recs.groupBy(_.getLong(0))
    for ((u, rows) <- byUser) {
      val ranks = rows.map(_.getLong(4)).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq, s"ranks for $u: $ranks")
      assert(rows.length <= 3)
      // ranks follow score descending
      val byRank = rows.sortBy(_.getLong(4)).map(_.getDouble(2)).toSeq
      assert(byRank == byRank.sorted.reverse, s"scores for $u: $byRank")
    }
  }

  test("leave-last-out CF eval: eval population reconciles and the MRR brackets hold") {
    import graft.operators.Relational
    val row = Relational.cfHitRate(spark, Sf).collect().head
    assert(row.getInt(0) == 5, "k")
    val (nEval, nHits) = (row.getLong(1), row.getLong(2))
    val (hitRate, mrr) = (row.getDouble(3), row.getDouble(4))
    // eval population = customers with >= 2 orders whose held-out last
    // order has at least one lineitem
    val ords = graft.Lake.orders(spark, Sf)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val withLi = graft.Lake.lineitem(spark, Sf)
      .select(col("l_orderkey")).distinct().collect()
      .map(_.getLong(0)).toSet
    val expectedEval = ords.groupBy(_._2).count { case (_, os) =>
      os.length >= 2 && withLi(
        os.maxBy(o => (o._3, o._1))._1)
    }
    assert(nEval == expectedEval.toLong, s"n_eval $nEval vs $expectedEval")
    assert(nHits >= 0L && nHits <= nEval)
    assert(hitRate == math.rint(nHits.toDouble / nEval * 1e4) / 1e4 ||
      math.abs(hitRate - nHits.toDouble / nEval) < 1e-4, "hit_rate")
    // every reciprocal rank lies in [1/5, 1], so the MRR is bracketed
    // by hit_rate/5 and hit_rate (up to 4-dp rounding)
    assert(mrr <= hitRate + 1e-4 && mrr >= hitRate / 5.0 - 1e-4,
      s"mrr $mrr outside [${hitRate / 5}, $hitRate]")
  }

  test("recommender coverage reconciles with the serving table and the catalog") {
    import graft.operators.Relational
    val recItems = Relational.itemKnnRecommend(spark, Sf).collect()
      .map(_.getLong(1)).distinct
    val itemN = graft.Lake.lineitem(spark, Sf)
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val row = Relational.recCoverage(spark, Sf).collect().head
    assert(row.getLong(0) == itemN.size.toLong, "catalog_size")
    assert(row.getLong(1) == recItems.length.toLong, "n_rec_items")
    assert(math.abs(row.getDouble(2) -
      recItems.length.toDouble / itemN.size) < 1e-5, "coverage")
    val popRec = recItems.map(itemN).sum.toDouble / recItems.length
    val popCat = itemN.values.sum.toDouble / itemN.size
    assert(math.abs(row.getDouble(3) - popRec) < 1e-3, "mean_pop_recommended")
    assert(math.abs(row.getDouble(4) - popCat) < 1e-3, "mean_pop_catalog")
    assert(math.abs(row.getDouble(5) - popRec / popCat) < 1e-3,
      "popularity_bias")
    assert(row.getDouble(2) > 0.0 && row.getDouble(2) <= 1.0)
  }
}
