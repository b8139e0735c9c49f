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
}
