package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnOps, EventOps, Relational, TextOps}

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
