package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{GraftExtensions, GraftFunctions}

/** SQL-surface registration of the custom expressions. */
class SqlFunctionsSpec extends SparkSpecBase {

  test("registered SQL functions evaluate through spark.sql") {
    GraftFunctions.register(spark)
    Lake.embeddings(spark, Sf).createOrReplaceTempView("emb_t")
    val rows = spark.sql(
      """SELECT vec_id,
        |  cosine_similarity(embedding, embedding) AS self_sim,
        |  dot_product_f(embedding, embedding) AS self_dot,
        |  size(lsh_buckets(embedding, 64, 16, 4)) AS n_buckets
        |FROM emb_t ORDER BY vec_id LIMIT 20""".stripMargin).collect()
    assert(rows.length == 20)
    for (r <- rows) {
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, "self-cosine must be 1")
      assert(r.getDouble(2) > 0.0, "self-dot must be positive")
      assert(r.getInt(3) == 16, "one bucket per LSH table")
    }
  }

  test("extension class injects the same function set") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builders must construct resolvable expressions
    val names = GraftFunctions.all.map(_._1)
    assert(names == Seq("cosine_similarity", "dot_product_f", "lsh_buckets",
      "kll_sketch_agg", "kll_merge_agg", "kll_quantiles"))
  }
}
