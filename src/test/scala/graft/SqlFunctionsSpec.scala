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

  test("portable hash, BPE, and theta sketches are SQL-surfaced") {
    GraftFunctions.register(spark)
    Lake.documents(spark, Sf).createOrReplaceTempView("docs_t2")
    // portable_hash60 must be bit-identical to the Column form the whole
    // repo hashes with (and through it, to the DuckDB oracle rendering)
    val viaSql = spark.sql(
      """SELECT doc_id, portable_hash60(text) AS h FROM docs_t2
        |WHERE text IS NOT NULL ORDER BY doc_id LIMIT 10""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = Lake.documents(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.operators.TextOps.portableHash60(
          org.apache.spark.sql.functions.col("text")).as("h"))
      .orderBy("doc_id").limit(10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol, "SQL and Column portable_hash60 must agree")

    val bpe = spark.sql(
      """SELECT size(bpe_tokens(text)) AS n, size(split(text, ' ')) AS w
        |FROM docs_t2 WHERE text IS NOT NULL LIMIT 5""".stripMargin).collect()
    assert(bpe.nonEmpty && bpe.forall(r => r.getInt(0) >= r.getInt(1)),
      "BPE emits at least one subword per word")

    // theta set algebra end-to-end in SQL: |A ∪ B|, |A ∩ B|, |A ∖ B|
    val t = spark.sql(
      """SELECT theta_estimate(theta_union(a, b)) AS u,
        |       theta_estimate(theta_intersect(a, b)) AS i,
        |       theta_estimate(theta_anotb(a, b)) AS d
        |FROM (SELECT
        |  (SELECT theta_sketch_agg(CAST(doc_id AS STRING)) FROM docs_t2
        |     WHERE doc_id % 2 = 0) AS a,
        |  (SELECT theta_sketch_agg(CAST(doc_id AS STRING)) FROM docs_t2
        |     WHERE doc_id % 3 = 0) AS b)""".stripMargin).collect().head
    val nDocs = Lake.documents(spark, Sf).count()
    val (evens, thirds, sixths) =
      ((nDocs + 1) / 2, (nDocs + 2) / 3, (nDocs + 5) / 6)
    assert(math.round(t.getDouble(0)) == evens + thirds - sixths,
      s"union estimate ${t.getDouble(0)}")
    assert(math.round(t.getDouble(1)) == sixths, s"intersect ${t.getDouble(1)}")
    assert(math.round(t.getDouble(2)) == evens - sixths, s"anotb ${t.getDouble(2)}")
  }

  test("extension class injects the same function set") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builders must construct resolvable expressions
    val names = GraftFunctions.all.map(_._1)
    assert(names == Seq("cosine_similarity", "dot_product_f", "lsh_buckets",
      "kll_sketch_agg", "kll_merge_agg", "kll_quantiles",
      "minhash_sig", "freq_sketch_agg", "freq_merge_agg", "freq_top_items",
      "portable_hash60", "bpe_tokens", "theta_sketch_agg", "theta_union",
      "theta_intersect", "theta_anotb", "theta_estimate"))
  }

  test("spark.sql.extensions config path injects the functions at session build") {
    import org.apache.spark.sql.SparkSession
    // a NEW SparkSession built the way `--conf spark.sql.extensions=
    // graft.functions.GraftExtensions` would: the class is loaded BY NAME
    // (exactly Spark's own conf handling — the string conf itself is
    // static and bound to SparkContext creation, which the shared test
    // context predates) and injected at session build; the functions must
    // resolve with NO imperative register() call.
    val byName = Class.forName("graft.functions.GraftExtensions")
      .getDeclaredConstructor().newInstance()
      .asInstanceOf[SparkSessionExtensions => Unit]
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
      .master("local[4]")
      .withExtensions(byName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
    try {
      val r = s2.sql(
        "SELECT portable_hash60('graft') AS h, size(bpe_tokens('hello world')) AS n")
        .collect().head
      assert(r.getLong(0) > 0 && r.getInt(1) >= 2)
      val sim = s2.sql(
        "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F))")
        .collect().head.getDouble(0)
      assert(math.abs(sim - 1.0) < 1e-9)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
