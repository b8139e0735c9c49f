package graft

import graft.operators.CatalogOps

/** Value coverage for the registered approx scale twins
  * (q_profile_approx / q_quantiles_approx): sketch estimates carry no
  * DuckDB oracle, so accuracy vs the exact paths is pinned here — the
  * approx path must be a usable stand-in, not merely runnable. */
class ApproxProfileSpec extends SparkSpecBase {

  private val profCols =
    Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val quantCols = Seq("l_quantity", "l_extendedprice", "l_discount")

  test("approx NDV within 5% of exact; non-sketch stats bit-identical") {
    val exact = CatalogOps.profile(spark, Sf, "lineitem", profCols)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = CatalogOps.profile(spark, Sf, "lineitem", profCols,
        exactNdv = false)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    for ((c, e) <- exact; a = approx(c)) {
      assert(a.getDouble(1) == e.getDouble(1) && a.getDouble(2) == e.getDouble(2)
        && a.getLong(3) == e.getLong(3),
        s"$c: min/max/nulls are not sketched — must match exactly")
      val (en, an) = (e.getLong(4).toDouble, a.getLong(4).toDouble)
      assert(math.abs(an - en) / en <= 0.05,
        s"$c: approx ndv $an vs exact $en beyond the 2%-sketch 5% bar")
    }
  }

  test("tdigest twin returns exact-rank ELEMENTS on discrete columns") {
    import org.apache.spark.sql.functions._
    val cols = Seq("l_quantity", "l_discount", "l_tax")
    val li = Lake.table(spark, Sf, "lineitem")
    val n = li.count()
    val out = CatalogOps.quantiles(spark, Sf, "lineitem", cols,
        exact = false, accuracy = 1000000)
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- cols) {
      // ground truth: the element at rank floor(1 + p(n-1)) — the
      // quantile_disc convention the oracle uses
      val sorted = li.select(col(c).cast("double")).orderBy(col(c))
        .collect().map(_.getDouble(0))
      for ((p, i) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
        val want = sorted((1 + p * (n - 1)).toInt - 1)
        val got = out(c).getDouble(i + 1)
        assert(got == want,
          s"$c p$p: sketch element $got != exact rank element $want")
      }
    }
  }

  test("approx quartiles within 5% relative error of exact") {
    val exact = CatalogOps.quantiles(spark, Sf, "lineitem", quantCols)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = CatalogOps.quantiles(spark, Sf, "lineitem", quantCols,
        exact = false)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet)
    for ((c, e) <- exact; a = approx(c); i <- 1 to 3) {
      val (ev, av) = (e.getDouble(i), a.getDouble(i))
      val tol = math.max(math.abs(ev) * 0.05, 1e-6)
      assert(math.abs(av - ev) <= tol,
        s"$c q$i: approx $av vs exact $ev beyond 5%")
    }
  }
}
