package graft

import org.apache.spark.sql.functions._

import graft.operators.Governance

/** Governance semantics on planted data — the cases the lake fixtures
  * don't exercise (a homogeneous group, null identifiers). */
class GovernanceSpec extends SparkSpecBase {

  test("l-diversity flags a large-but-homogeneous group k-anonymity passes") {
    import spark.implicits._
    // group A: 10 rows, 10 distinct sensitive values (fine);
    // group B: 10 rows, ONE sensitive value (homogeneity attack)
    val rows = (1 to 10).map(i => ("A", i.toLong, s"v$i")) ++
      (1 to 10).map(i => ("B", 100L + i, "same"))
    val df = rows.toDF("qi", "id", "sensitive")
    val k = Governance.kAnonymity(df, Seq("qi"), k = 10).head()
    assert(k.getAs[Boolean]("is_k_anonymous"),
      "both groups have 10 rows — k-anonymity must pass")
    val l = Governance.lDiversity(df, Seq("qi"), "sensitive", l = 3).head()
    assert(!l.getAs[Boolean]("is_l_diverse"), "group B leaks via homogeneity")
    assert(l.getAs[Long]("min_diversity") == 1L)
    assert(l.getAs[Long]("n_violating_groups") == 1L)
    assert(l.getAs[Long]("n_risky_rows") == 10L)
  }

  test("pseudonyms are deterministic, join-compatible, and null-preserving") {
    import spark.implicits._
    val a = Seq((1L, "alice"), (2L, "bob"), (3L, null.asInstanceOf[String]))
      .toDF("id", "name")
    val pa = Governance.pseudonymize(a, Seq("name"), "salt1")
    val pb = Governance.pseudonymize(a.select(col("name"), col("id")),
      Seq("name"), "salt1")
    // same salt → same token: the two pseudonymized frames still join
    val joined = pa.join(pb.select(col("name").as("name2")),
      pa("name") === col("name2"))
    assert(joined.count() == 2, "non-null pseudonyms must match across tables")
    assert(pa.filter(col("id") === 3 && col("name").isNull).count() == 1,
      "null identifiers stay null, never a shared 'unknown' token")
    // different salt → unlinkable
    val pc = Governance.pseudonymize(a, Seq("name"), "salt2")
    assert(pa.join(pc.select(col("name").as("n2")), pa("name") === col("n2"))
      .count() == 0)
  }
}
