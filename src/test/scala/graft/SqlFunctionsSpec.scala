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

  test("minhash and frequent-items expressions are SQL-surfaced") {
    GraftFunctions.register(spark)
    Lake.documents(spark, Sf).createOrReplaceTempView("docs_t")
    val sig = spark.sql(
      """SELECT size(minhash_sig(split(text, ' '), 64)) AS n
        |FROM docs_t WHERE text IS NOT NULL LIMIT 5""".stripMargin).collect()
    assert(sig.nonEmpty && sig.forall(_.getInt(0) == 64))
    val top = spark.sql(
      """SELECT freq_top_items(freq_merge_agg(s)) AS items FROM (
        |  SELECT freq_sketch_agg(source) AS s FROM docs_t GROUP BY doc_id % 2)""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    val nDocs = Lake.documents(spark, Sf).count()
    assert(top.map(_.getLong(1)).sum == nDocs,
      "merged per-batch counts must cover every doc exactly")
  }

  test("extension class injects the same function set") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builders must construct resolvable expressions
    val names = GraftFunctions.all.map(_._1)
    assert(names == Seq("cosine_similarity", "dot_product_f", "lsh_buckets",
      "kll_sketch_agg", "kll_merge_agg", "kll_quantiles",
      "minhash_sig", "freq_sketch_agg", "freq_merge_agg", "freq_top_items"))
  }
}
