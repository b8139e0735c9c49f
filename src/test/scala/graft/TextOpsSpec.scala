package graft

import graft.operators.TextOps

/** Text-analysis semantics not covered by the SQL oracle. */
class TextOpsSpec extends SparkSpecBase {

  test("token stats are internally consistent") {
    val rows = TextOps.tokenStats(spark, Sf).collect()
    assert(rows.length == Lake.documents(spark, Sf).count())
    for (r <- rows) {
      val (n, d, ttr) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d <= n && d > 0)
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(r.getDouble(4) > 0.0) // avg token length
    }
  }

  test("fingerprint is deterministic") {
    val a = TextOps.fingerprint(spark, Sf).collect().map(r => r.getLong(0) -> r.getLong(1))
    val b = TextOps.fingerprint(spark, Sf).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.sameElements(b))
  }

  test("near-duplicate docs usually share a fingerprint; distinct docs do not") {
    val fp = TextOps.fingerprint(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Lake.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet else Set(t)
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    val nearDups = for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      if (sa & sb).size.toDouble / (sa | sb).size >= 0.9
    } yield (a, b)
    assert(nearDups.nonEmpty, "test data should contain planted near-dups")
    // the min-hash fingerprint of two docs collides with prob = jaccard >= 0.9
    val sharing = nearDups.count { case (a, b) => fp(a) == fp(b) }
    assert(sharing.toDouble / nearDups.size >= 0.6,
      s"only $sharing/${nearDups.size} planted near-dups share a fingerprint")
    // a single min-hash collides between unrelated docs at ~their jaccard,
    // so demand separation, not uniqueness: most docs keep distinct prints
    val distinctFp = fp.values.toSeq.distinct.size
    assert(distinctFp >= fp.size / 2,
      s"fingerprints degenerate: $distinctFp distinct over ${fp.size} docs")
  }

  test("language heuristic marks most docs with stopwords as en") {
    val rows = TextOps.langQuality(spark, Sf).collect()
    val en = rows.count(_.getString(4) == "en")
    assert(en > 0, "heuristic should tag some docs en")
    for (r <- rows) {
      val ratio = r.getDouble(3)
      val pred = r.getString(4)
      assert(if (ratio >= 0.03) pred == "en" else pred == "und")
    }
  }
}
