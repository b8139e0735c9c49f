package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** The materialized-view rewrite rule: plans that SHOULD read the view
  * do (and match the base bit-for-bit), plans that must NOT be
  * rewritten aren't. */
class MvRewriteSpec extends SparkSpecBase {

  private val base = s"$Sf/orders.parquet"
  private val mvDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_mv_spec")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "mv_orders").getAbsolutePath
  }

  private def withView[A](f: => A): A = {
    MvRewrite.register(spark, "t_orders", base,
      Seq("o_orderpriority", "o_orderstatus"), "o_totalprice",
      Some("decimal(18,2)"), mvDir)
    try f finally MvRewrite.deregister(spark, base)
  }

  /** Root paths of every file scan in the optimized plan — the logical
    * plan's toString does not print relation locations. */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  private def baseQuery(): DataFrame =
    spark.read.parquet(base)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  test("exact-key query is rewritten to scan the view, values unchanged") {
    // the reference runs OUTSIDE the registration window
    val want = baseQuery().collect()
    val (got, paths) = withView {
      val df = baseQuery()
      (df.collect(), scanPaths(df))
    }
    assert(paths.exists(_.contains("mv_orders")),
      s"plan does not scan the view: $paths")
    assert(!paths.exists(_.contains("orders.parquet")),
      "plan still scans the base")
    assert(got.toSeq == want.toSeq)
  }

  test("roll-up to a key subset re-aggregates the view, values unchanged") {
    def q() = spark.read.parquet(base)
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))
    val want = q().collect()
    val (got, paths) = withView { (q().collect(), scanPaths(q())) }
    assert(paths.exists(_.contains("mv_orders")),
      s"roll-up not rewritten: $paths")
    assert(got.toSeq == want.toSeq)
  }

  test("group-key filter is pushed to the view; non-key filter blocks") {
    def filtered() = spark.read.parquet(base)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
    val want = filtered().collect()
    withView {
      val df = filtered()
      assert(scanPaths(df).exists(_.contains("mv_orders")))
      assert(df.collect().toSeq == want.toSeq)
      // a filter on a collapsed column disqualifies the plan
      val blocked = spark.read.parquet(base)
        .filter(col("o_totalprice") > 1000.0)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(!scanPaths(blocked).exists(_.contains("mv_orders")),
        "value-column filter must not rewrite")
    }
  }

  test("non-rewritable aggregates and other tables stay untouched") {
    withView {
      val minAgg = spark.read.parquet(base)
        .groupBy(col("o_orderpriority"))
        .agg(min(col("o_totalprice")).as("m"))
      assert(!scanPaths(minAgg).exists(_.contains("mv_orders")),
        "min must not rewrite")
      val wrongValue = spark.read.parquet(base)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("o_orderkey")).as("s"))
      assert(!scanPaths(wrongValue).exists(_.contains("mv_orders")),
        "a different value column must not rewrite")
      val rawDouble = spark.read.parquet(base)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("o_totalprice")).as("s"))
      assert(!scanPaths(rawDouble).exists(_.contains("mv_orders")),
        "the un-pinned double sum must not rewrite (fp order)")
      val otherTable = spark.read.parquet(s"$Sf/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(!scanPaths(otherTable).exists(_.contains("mv_orders")))
    }
    // deregistered: the exact-match query reads the base again
    val after = baseQuery()
    assert(!scanPaths(after).exists(_.contains("mv_orders")))
  }

  test("re-register rebuilds from the BASE (no self-rewrite suicide)") {
    withView {
      // second register on the SAME base while the first registration is
      // live: the rebuild must read the base, not the view it is about
      // to overwrite. Before the fix this threw mid-scan (overwrite
      // deletes mvDir under the rewritten scan) and left a poisoned
      // registry entry; now it completes and values still match.
      MvRewrite.register(spark, "t_orders", base,
        Seq("o_orderpriority", "o_orderstatus"), "o_totalprice",
        Some("decimal(18,2)"), mvDir)
      val df = baseQuery()
      assert(scanPaths(df).exists(_.contains("mv_orders")),
        "re-registration must leave a working rewrite")
      val got = df.collect().toSeq
      MvRewrite.deregister(spark, base)
      assert(got == baseQuery().collect().toSeq)
    }
  }

  test("multi-root scan that includes the base is NOT rewritten") {
    // a second parquet directory with the same schema
    val extraDir = java.nio.file.Files
      .createTempDirectory("graft_mv_extra").toFile
    extraDir.deleteOnExit()
    val extra = new java.io.File(extraDir, "more_orders").getAbsolutePath
    spark.read.parquet(base).limit(7).write.mode("overwrite").parquet(extra)
    def multi() = spark.read.parquet(base, extra)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
    val want = multi().collect()
    withView {
      val df = multi()
      assert(!scanPaths(df).exists(_.contains("mv_orders")),
        "a two-root scan must not be rewritten to the view alone")
      assert(df.collect().toSeq == want.toSeq,
        "multi-path counts must include the extra root's rows")
    }
  }

  private val ordersP = s"$Sf/orders.parquet"
  private val custP = s"$Sf/customer.parquet"
  private val jvDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_mv_join")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "mv_join").getAbsolutePath
  }

  private def withJoinView[A](f: => A): A = {
    MvRewrite.registerJoin(spark, "orders_x_customer",
      ordersP, "o_custkey", custP, "c_custkey", jvDir)
    try f finally MvRewrite.deregisterJoin(spark, ordersP, custP)
  }

  /** Run `q` with the rewrite conf-gated OFF — the reference values. */
  private def withoutRewrite[A](f: => A): A = {
    spark.conf.set("spark.graft.mv.rewrite.enabled", "false")
    try f finally spark.conf.set("spark.graft.mv.rewrite.enabled", "true")
  }

  test("join-view: matching inner join rewrites to the view, values unchanged") {
    def q() = spark.read.parquet(ordersP)
      .join(spark.read.parquet(custP),
        col("o_custkey") === col("c_custkey"), "inner")
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double"), 2).as("revenue"))
      .orderBy(col("o_orderpriority"))
    val want = q().collect()
    withJoinView {
      val df = q()
      val paths = scanPaths(df)
      assert(paths.exists(_.contains("mv_join")),
        s"join not rewritten to the view: $paths")
      assert(!paths.exists(_.contains("orders.parquet")),
        "plan still scans the base fact table")
      assert(df.collect().toSeq == want.toSeq)
      // the swapped side order rewrites too (inner join commutes)
      def sw() = spark.read.parquet(custP)
        .join(spark.read.parquet(ordersP),
          col("c_custkey") === col("o_custkey"), "inner")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
      assert(scanPaths(sw()).exists(_.contains("mv_join")),
        "swapped-order join must also rewrite")
      val swWant = withoutRewrite { sw().collect() }
      assert(sw().collect().toSeq == swWant.toSeq)
    }
  }

  test("join-view teeth: non-matching joins stay on the base") {
    withJoinView {
      // outer joins must never rewrite (the view is the INNER join)
      val outer = spark.read.parquet(ordersP)
        .join(spark.read.parquet(custP),
          col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(!scanPaths(outer).exists(_.contains("mv_join")),
        "a left join must not rewrite")
      // a different key equality is a different join
      val wrongKey = spark.read.parquet(ordersP)
        .join(spark.read.parquet(custP),
          col("o_orderkey") === col("c_custkey"), "inner")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(!scanPaths(wrongKey).exists(_.contains("mv_join")),
        "a different join key must not rewrite")
      // a different table pair stays untouched
      val otherPair = spark.read.parquet(s"$Sf/lineitem.parquet")
        .join(spark.read.parquet(ordersP),
          col("l_orderkey") === col("o_orderkey"), "inner")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(!scanPaths(otherPair).exists(_.contains("mv_join")),
        "an unregistered pair must not rewrite")
    }
    // deregistered: the matching join reads the bases again
    val after = spark.read.parquet(ordersP)
      .join(spark.read.parquet(custP),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(!scanPaths(after).exists(_.contains("mv_join")),
      "deregisterJoin must disable the rewrite")
  }

  test("registered q_mv_join_rewrite: view-answered, base-identical, clean") {
    val out = MvRewrite.joinRewriteQuery(spark, Sf).collect()
    assert(out.nonEmpty)
    val want = spark.read.parquet(ordersP)
      .join(spark.read.parquet(custP),
        col("o_custkey") === col("c_custkey"), "inner")
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority")).collect()
    assert(out.toSeq == want.toSeq)
    // the registration window is closed
    val probe = spark.read.parquet(ordersP)
      .join(spark.read.parquet(custP),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(!scanPaths(probe).exists(_.contains("graft_mv")),
      "q_mv_join_rewrite must deregister its view")
  }

  test("registered q_mv_rewrite leaves no session-global registration") {
    val out = MvRewrite.rewriteQuery(spark, Sf).collect()
    assert(out.nonEmpty)
    // values equal the base aggregate (the oracle's claim, locally)
    val want = spark.read.parquet(base)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("double"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority")).collect()
    assert(out.toSeq == want.toSeq)
    // and the registration window is closed
    val probe = spark.read.parquet(base)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    assert(!scanPaths(probe).exists(_.contains("graft_mv")),
      "q_mv_rewrite must deregister its view")
  }
}
