package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted-join correctness: identical results to the plain equi-join,
  * regardless of salt assignment. */
class SkewSpec extends SparkSpecBase {

  test("salted join returns exactly the plain join's rows") {
    val li = Lake.lineitem(spark, Sf)
    val part = Lake.part(spark, Sf)
    val plain = li.join(part, li("l_partkey") === part("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"), col("p_brand"))
    val salted = Skew.saltedJoin(li, part, "l_partkey", "p_partkey", buckets = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"), col("p_brand"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("key histogram surfaces the heaviest keys") {
    val h = Skew.keyHistogram(Lake.events(spark, Sf), "user_id", topN = 5).collect()
    assert(h.length == 5)
    assert(h.map(_.getLong(1)).sliding(2).forall(p => p(0) >= p(1)), "descending counts")
  }

  test("autoJoin salts on planted skew, stays plain on uniform keys, same rows either way") {
    import spark.implicits._
    // uniform: every key appears 5× — far under the threshold
    val uniformBig = (1 to 200).flatMap(k => (1 to 5).map(i => (k.toLong, i)))
      .toDF("k", "payload")
    // skewed: key 7 carries 3000 rows
    val skewedBig = uniformBig
      .union((1 to 3000).map(i => (7L, i)).toDF("k", "payload"))
    val small = (1 to 200).map(k => (k.toLong, s"dim$k")).toDF("sk", "attr")

    val (plainJoined, saltedA, hotA) =
      Skew.autoJoin(uniformBig, small, "k", "sk", saltThreshold = 1000L)
    assert(!saltedA && hotA == 5L, s"uniform keys must not salt (hot=$hotA)")

    val (saltedJoined, saltedB, hotB) =
      Skew.autoJoin(skewedBig, small, "k", "sk", saltThreshold = 1000L)
    assert(saltedB && hotB == 3005L, s"planted hot key must trigger salting (hot=$hotB)")

    // both paths return exactly the plain join's rows
    val expect = skewedBig.join(small, col("k") === col("sk"))
      .select(col("k"), col("payload"), col("attr"))
    val got = saltedJoined.select(col("k"), col("payload"), col("attr"))
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).count() == 0 && expect.exceptAll(got).count() == 0)
    assert(plainJoined.count() == uniformBig.count(), "every uniform row keeps its dim match")

    // empty big side: no rows, no salting, no crash
    val (emptyJoined, saltedC, hotC) =
      Skew.autoJoin(uniformBig.filter(lit(false)), small, "k", "sk", 1000L)
    assert(!saltedC && hotC == 0L && emptyJoined.count() == 0)
  }
}
