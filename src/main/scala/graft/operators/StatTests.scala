package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Lake

/** Classical test-statistic panel, round 12: the non-parametric /
  * diagnostic complements the existing inferential family (ANOVA F,
  * Welch, Friedman, Mann–Whitney, χ²) still lacked — Kruskal–Wallis
  * (rank one-way ANOVA), Brown–Forsythe (robust variance homogeneity,
  * the assumption-check ANOVA itself needs), Jarque–Bera (normality
  * screen), Tukey HSD (the post-hoc pairwise panel an omnibus F calls
  * for), Kendall's W (rater/series concordance over the Friedman
  * blocks), the attribute p-chart (SPC control limits over a daily
  * error share), and the inter-purchase-gap profile.
  *
  * House discipline throughout: every terminating quotient rounds by
  * the exact-integer half-up law ([[ExactRound]], numerators through
  * decimal(38,0) where int64 headroom is insufficient); √/ln-bearing
  * scalars stay in double as ONE expression tree replayed verbatim by
  * the DuckDB oracle. All report frames are bounded (segments × pairs,
  * calendar days, event types) — nothing here scales with the corpus
  * beyond its one aggregation pass. */
object StatTests {

  private val dec2 = DecimalType(18, 2)
  private val d38 = DecimalType(38, 0)

  /** (c_mktsegment, x2) — order totals in exact integer cents with the
    * customer dimension broadcast; the shared base of the segment
    * panels. */
  private def segCents(spark: SparkSession, dir: String): DataFrame =
    Lake.orders(spark, dir)
      .join(broadcast(Lake.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (col("o_totalprice").cast(dec2) * 100).cast("long").as("x2"))

  /** Kruskal–Wallis rank one-way ANOVA of order value across market
    * segments — the distribution-free twin of [[CatalogOps.anovaF]]
    * (a single whale order drags a mean but only shifts one rank).
    * Tie-averaged ranks ride as the INTEGER 2·r̄ = 2·below + t + 1 per
    * distinct value (the rank-correlation trick), so every rank sum is
    * exact; H = 12·Σ(S_g²/(4n_g))/(N(N+1)) − 3(N+1) with the per-group
    * term pinned once at 2 dp by exact integer half-up, and the tie
    * correction C = 1 − Σ(t³−t)/(N³−N) at 6 dp the same way. Emits the
    * per-segment mean rank with the table-wide H, C, H/C on every row.
    *
    * Scale: one fact aggregation to the distinct-value frame (bounded
    * by price quantization), one value-ordered window on it, one
    * segment reduce. */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val base = segCents(spark, dir)
    val perVal = base.groupBy(col("x2"))
      .agg(count(lit(1)).as("t"))
    val wOrd = Window.orderBy(col("x2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // 2·avg-rank of the tie group ending the cumulative window
    val ranked = perVal
      .withColumn("cum", sum(col("t")).over(wOrd))
      .select(col("x2"), col("t"),
        (lit(2) * (col("cum") - col("t")) + col("t") + 1).as("ar2"))
    val perSegVal = base.groupBy(col("c_mktsegment"), col("x2"))
      .agg(count(lit(1)).as("c"))
      .join(ranked.select(col("x2"), col("ar2")), Seq("x2"))
    val seg = perSegVal.groupBy(col("c_mktsegment"))
      .agg(sum(col("c")).as("n_g"),
        sum(col("c") * col("ar2")).as("s2_g"))
    val wAll = Window.partitionBy()
    val ties = ranked.agg(
      sum(col("t")).as("nn"),
      sum(col("t") * col("t") * col("t") - col("t")).cast(d38).as("tc"))
    val out = seg
      // per-group term S_g²/(4n_g) = S2²/(4·4·n_g)·4 … S2 = 2·S_g, so
      // S_g² = S2²/4 and the term is S2²/(16·n_g)·4 = S2²/(4·n_g); the
      // square exceeds int64 → decimal(38,0) staging, pinned at 2 dp
      .withColumn("s2sq",
        ((col("s2_g").cast(d38) * col("s2_g")) * 100).cast(d38))
      // the QUOTIENT s2²·100/(4n_g) crosses int64 at sf1 (~7·10¹⁹ at
      // 1.5 M orders) — `div` wraps silently there, so this one rides
      // the decimal-space floor-division form
      .withColumn("t2_g", ExactRound.halfUpPosBig("s2sq", "4 * n_g"))
      .withColumn("sum_t2", sum(col("t2_g")).over(wAll))
      .crossJoin(broadcast(ties))
      // H = (12·ΣT/100 − 3(N+1)·N(N+1)) / (N(N+1)), SIGNED at 4 dp
      .withColumn("hn",
        ((col("sum_t2").cast(d38) * 12
          - col("nn").cast(d38) * (col("nn") + 1) * (col("nn") + 1) * 300)
          * 10000).cast(d38))
      .withColumn("hd",
        (col("nn").cast(d38) * (col("nn") + 1) * 100).cast(d38))
      .withColumn("h4", ExactRound.halfUp("hn", "hd"))
      // C = ((N³−N) − Σ(t³−t))/(N³−N) at 6 dp
      .withColumn("cn",
        ((col("nn").cast(d38) * col("nn") * col("nn") - col("nn")
          - col("tc")) * 1000000).cast(d38))
      .withColumn("cd",
        (col("nn").cast(d38) * col("nn") * col("nn") - col("nn"))
          .cast(d38))
      .withColumn("c6", ExactRound.halfUpPos("cn", "cd"))
      .select(col("c_mktsegment"), col("n_g"),
        (ExactRound.halfUpPos("10000 * s2_g", "2 * n_g")
          .cast("double") / 1e4).as("mean_rank"),
        (col("h4").cast("double") / 1e4).as("h_stat"),
        (col("c6").cast("double") / 1e6).as("tie_c"),
        // H/C from the pinned values: H4·10⁶/C6 at 4 dp
        (ExactRound.halfUp("1000000 * h4", "c6")
          .cast("double") / 1e4).as("h_adj"))
      .orderBy(col("c_mktsegment"))
    out
  }

  /** Brown–Forsythe (median-based Levene) variance-homogeneity test of
    * order value across segments — the robustness check behind both the
    * ANOVA F and the Tukey panel (their pooled-MSW assumption). The
    * deviations run in exact HALF-CENT integers: the per-segment median
    * of cents interpolates to at worst a half cent, so z2 = |2·x2 −
    * round(2·median)| is exact and the whole one-way F on z2 reuses the
    * [[CatalogOps.anovaF]] moment discipline (6-dp-pinned group terms;
    * F itself √-free but left as the identical double tree). */
  def brownForsythe(spark: SparkSession, dir: String): DataFrame = {
    val base = segCents(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = base.groupBy(col("c_mktsegment"))
      .agg(round(expr("percentile(x2, 0.5D)") * 2).cast("long").as("m2"))
    val z = base.join(broadcast(med), Seq("c_mktsegment"))
      .select(col("c_mktsegment"),
        abs(col("x2") * 2 - col("m2")).as("z2"))
    val g = z.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_g"), sum(col("z2")).as("s_g"),
        sum((col("z2").cast(d38) * col("z2")).cast(d38)).as("q_g"))
    val wAll = Window.partitionBy()
    val bTerm = col("s_g").cast("double") * col("s_g").cast("double") /
      col("n_g")
    val wTerm = col("q_g").cast("double") - bTerm
    val out = g
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("n", sum(col("n_g")).over(wAll))
      .withColumn("s", sum(col("s_g")).over(wAll))
      .withColumn("sb",
        sum(round(bTerm, 6).cast(DecimalType(38, 6))).over(wAll))
      .withColumn("sw",
        sum(round(wTerm, 6).cast(DecimalType(38, 6))).over(wAll))
      .withColumn("ssb",
        col("sb").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n"))
      .withColumn("f",
        (col("ssb") / (col("k") - 1).cast("double")) /
          (col("sw").cast("double") / (col("n") - col("k")).cast("double")))
      .select(col("c_mktsegment"), col("n_g"),
        // mean |deviation| back in dollars: s_g half-cents / (200·n_g)
        (ExactRound.halfUpPos("100 * s_g", "2 * n_g")
          .cast("double") / 1e4).as("mean_absdev"),
        (col("k") - 1).as("df_between"),
        (col("n") - col("k")).as("df_within"),
        round(col("f"), 4).as("f_stat"))
      .orderBy(col("c_mktsegment"))
      .localCheckpoint(true)
    base.unpersist(false)
    out
  }

  /** Jarque–Bera normality screen of each event type's daily-count
    * series — the distributional gate before any z/t-based monitor on
    * those series (CUSUM, the seasonal z-screen) is taken at face
    * value. All four raw power sums are exact (Σx⁴ through
    * decimal(38,0)); the central moments, skewness b₁, kurtosis b₂,
    * and JB = n/6·(b₁² + (b₂−3)²/4) are one √-bearing double tree on
    * those exact sums. */
  def jarqueBera(spark: SparkSession, dir: String): DataFrame = {
    val daily = Lake.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val g = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum((col("x").cast(d38) * col("x") * col("x")).cast(d38)).as("s3"),
        sum((col("x").cast(d38) * col("x") * col("x") * col("x"))
          .cast(d38)).as("s4"))
    val nD = col("n").cast("double")
    val m = col("s1").cast("double") / nD
    val m2 = col("s2").cast("double") / nD - m * m
    val m3 = col("s3").cast("double") / nD -
      lit(3.0) * m * (col("s2").cast("double") / nD) + lit(2.0) * m * m * m
    val m4 = col("s4").cast("double") / nD -
      lit(4.0) * m * (col("s3").cast("double") / nD) +
      lit(6.0) * m * m * (col("s2").cast("double") / nD) -
      lit(3.0) * m * m * m * m
    g.withColumn("skew", m3 / pow(m2, 1.5))
      .withColumn("kurt", m4 / (m2 * m2))
      .select(col("event_type"), col("n").as("n_days"),
        round(col("skew"), 4).as("skewness"),
        round(col("kurt"), 4).as("kurtosis"),
        round(nD / 6.0 * (col("skew") * col("skew") +
          (col("kurt") - 3.0) * (col("kurt") - 3.0) / 4.0), 4).as("jb"),
        (nD / 6.0 * (col("skew") * col("skew") +
          (col("kurt") - 3.0) * (col("kurt") - 3.0) / 4.0) >
          lit(5.991)).as("reject_normal")) // χ²(2), α = .05
      .orderBy(col("event_type"))
  }

  /** Tukey HSD pairwise panel over the market segments — the post-hoc
    * step the one-way ANOVA F ([[CatalogOps.anovaF]]) calls for once it
    * rejects: every segment pair's mean difference (SIGNED exact
    * integer ratio (s_a·n_b − s_b·n_a)/(n_a·n_b), decimal(38,0)
    * staging) against the studentized-range criterion
    * q·√(MSW/2·(1/n_a+1/n_b)) with q(k=5, ∞ df, α=.05) = 3.858 as a
    * literal. MSW reuses the ANOVA within-moment discipline; the
    * significance compare runs on the unrounded double tree. k(k−1)/2 =
    * 10 rows. */
  def tukeyHsd(spark: SparkSession, dir: String,
               qCrit: Double = 3.858): DataFrame = {
    val base = segCents(spark, dir)
    val g = base.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_g"), sum(col("x2")).as("s_g"),
        sum((col("x2").cast(d38) * col("x2")).cast(d38)).as("q_g"))
      .localCheckpoint(true) // ≤5 rows; feeds the MSW reduce + the pairs
    val wAll = Window.partitionBy()
    val msw = g
      .withColumn("wTerm",
        round(col("q_g").cast("double") -
          col("s_g").cast("double") * col("s_g").cast("double") /
            col("n_g"), 6).cast(DecimalType(38, 6)))
      .agg(sum(col("n_g")).as("n"), count(lit(1)).as("k"),
        sum(col("wTerm")).as("sw"))
      .select(col("n"), col("k"),
        (col("sw").cast("double") /
          (col("n") - col("k")).cast("double")).as("msw"))
    val a = g.select(col("c_mktsegment").as("seg_a"),
      col("n_g").as("n_a"), col("s_g").as("s_a"))
    val b = g.select(col("c_mktsegment").as("seg_b"),
      col("n_g").as("n_b"), col("s_g").as("s_b"))
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .crossJoin(broadcast(msw))
      // diff in dollars at 4 dp: (s_a·n_b − s_b·n_a)·100/(n_a·n_b·100²)
      .withColumn("dn",
        ((col("s_a").cast(d38) * col("n_b")
          - col("s_b").cast(d38) * col("n_a")) * 100).cast(d38))
      .withColumn("dd", (col("n_a").cast(d38) * col("n_b")).cast(d38))
      .withColumn("se_cents",
        sqrt(col("msw") / 2.0 *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
      .select(col("seg_a"), col("seg_b"), col("n_a"), col("n_b"),
        (ExactRound.halfUp("dn", "dd").cast("double") / 1e4)
          .as("mean_diff"),
        round(col("se_cents") / 100.0, 4).as("se"),
        round(lit(qCrit) * col("se_cents") / 100.0, 4).as("hsd"),
        (abs((col("s_a").cast("double") / col("n_a") -
          col("s_b").cast("double") / col("n_b")) / 100.0) >
          lit(qCrit) * col("se_cents") / 100.0).as("significant"))
      .orderBy(col("seg_a"), col("seg_b"))
  }

  /** Kendall's coefficient of concordance W across event types with
    * days as blocks — "do the types keep the same intensity ORDER day
    * after day?", the effect-size companion the Friedman test's
    * chi-square leaves out. Per-day tie-averaged ranks as integer 2·r̄;
    * W = (12·ΣR_j² − 3k²n(n+1)²)/(k²(n³−n) − k·ΣT) with the per-day tie
    * term T = Σ(t³−t) — ONE exact integer ratio (decimal(38,0)
    * staging), 6 dp. The zero-fill day×type grid is the q_friedman /
    * q_gap_fill bounded spine. */
  def kendallW(spark: SparkSession, dir: String): DataFrame = {
    val daily = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = daily.select(col("day")).distinct()
    val types = daily.select(col("event_type")).distinct()
    val grid = days.crossJoin(broadcast(types))
      .join(daily, Seq("day", "event_type"), "left")
      .na.fill(0L, Seq("x"))
    val perDayVal = grid.groupBy(col("day"), col("x"))
      .agg(count(lit(1)).as("t"))
    val wDay = Window.partitionBy(col("day")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perDayVal
      .withColumn("cum", sum(col("t")).over(wDay))
      .select(col("day"), col("x"), col("t"),
        (lit(2) * (col("cum") - col("t")) + col("t") + 1).as("ar2"))
    val rj = grid.join(ranked.select(col("day"), col("x"), col("ar2")),
        Seq("day", "x"))
      .groupBy(col("event_type")).agg(sum(col("ar2")).as("r2_j"))
    val tiesPerDay = ranked.groupBy(col("day"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("t_d"))
    val tots = tiesPerDay.agg(count(lit(1)).as("n_days"),
      sum(col("t_d")).as("tt"))
    val kk = rj.agg(count(lit(1)).as("k"),
      sum((col("r2_j").cast(d38) * col("r2_j")).cast(d38)).as("sr2sq"))
    val out = tots.crossJoin(broadcast(kk))
      // m = n_days raters rank n = k objects; with R_j = R2_j/2 the
      // classic W = (12ΣR² − 3m²n(n+1)²)/(m²n(n²−1) − mΣT) becomes
      // (3ΣR2² − 3m²k(k+1)²)/(m²(k³−k) − mΣT) — one exact integer
      // ratio, decimal(38,0) staging, 6 dp
      .withColumn("wn",
        ((col("sr2sq") * 3
          - col("n_days").cast(d38) * col("n_days") * col("k") * 3
            * (col("k") + 1) * (col("k") + 1)) * 1000000)
          .cast(d38))
      .withColumn("wd",
        (col("n_days").cast(d38) * col("n_days") *
          (col("k").cast(d38) * col("k") * col("k") - col("k"))
          - col("n_days").cast(d38) * col("tt")).cast(d38))
      .select(col("n_days"), col("k").as("k_types"),
        (ExactRound.halfUp("wn", "wd").cast("double") / 1e6).as("w"),
        // Friedman-equivalent χ² = m(n−1)·W stays in double off the
        // pinned W (identical tree)
        round(col("n_days").cast("double") * (col("k") - 1) *
          (ExactRound.halfUp("wn", "wd").cast("double") / 1e6), 4)
          .as("chi2"))
      .localCheckpoint(true)
    daily.unpersist(false)
    out
  }

  /** Attribute p-chart over the daily error share — the SPC view the
    * anomaly screens lack: centerline p̄ = Σe/Σn and per-day 3σ limits
    * p̄ ± 3·√(p̄(1−p̄)/n_i) (wider on thin days — the whole point of a
    * p-chart vs a fixed threshold). Shares and the centerline are
    * exact integer ratios; the limits/flag are one √-bearing double
    * tree. Calendar-bounded output. */
  def pChart(spark: SparkSession, dir: String): DataFrame = {
    val daily = Lake.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_i"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("e_i"))
    val wAll = Window.partitionBy()
    daily
      .withColumn("se", sum(col("e_i")).over(wAll))
      .withColumn("sn", sum(col("n_i")).over(wAll))
      .withColumn("pbar_d",
        col("se").cast("double") / col("sn").cast("double"))
      .withColumn("sig",
        sqrt(col("pbar_d") * (lit(1.0) - col("pbar_d")) /
          col("n_i").cast("double")))
      .select(col("day"), col("n_i"), col("e_i"),
        (ExactRound.halfUpPos("1000000 * e_i", "n_i")
          .cast("double") / 1e6).as("p_i"),
        (ExactRound.halfUpPos("1000000 * se", "sn")
          .cast("double") / 1e6).as("p_bar"),
        round(col("pbar_d") + lit(3.0) * col("sig"), 6).as("ucl"),
        round(greatest(col("pbar_d") - lit(3.0) * col("sig"), lit(0.0)), 6)
          .as("lcl"),
        (col("e_i").cast("double") / col("n_i").cast("double") >
          col("pbar_d") + lit(3.0) * col("sig")).as("out_of_control"))
      .orderBy(col("day"))
  }

  /** 2×2 risk panel for the A/B arms × error outcome — the epidemiology
    * readout (risk ratio, odds ratio, risk difference + Wald 95% CIs)
    * beside the χ²/SRM screens, which say "different" but not "by how
    * much": arms by the deterministic Lehmer user hash (the q_srm
    * assignment), outcome = any `error` event. All estimates use the
    * Haldane–Anscombe +½ continuity correction UNCONDITIONALLY (a zero
    * cell otherwise leaves the odds ratio undefined — and at small SFs
    * a cell IS zero), which doubles cleanly into integer space
    * (A = 2a+1, …), so the three point estimates stay terminating
    * integer ratios → exact integer half-up. The log-scale Wald CIs on
    * the corrected counts are one ln/√ double tree. One user reduce, a
    * 1-row 2×2 after. */
  def riskPanel(spark: SparkSession, dir: String): DataFrame = {
    val users = Lake.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "error", 1L).otherwise(0L))
        .as("bad"))
      .withColumn("arm",
        when(expr("((user_id * 16807) % 2147483647) % 2") === 0, "A")
          .otherwise("B"))
    val t = users.agg(
        sum(when(col("arm") === "A" && col("bad") === 1L, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("arm") === "A" && col("bad") === 0L, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("arm") === "B" && col("bad") === 1L, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("arm") === "B" && col("bad") === 0L, 1L)
          .otherwise(0L)).as("d"))
      .withColumn("aa", col("a") * 2 + 1)
      .withColumn("bb", col("b") * 2 + 1)
      .withColumn("cc", col("c") * 2 + 1)
      .withColumn("dd", col("d") * 2 + 1)
    val lnRr = log((col("aa").cast("double") / (col("aa") + col("bb"))) /
      (col("cc").cast("double") / (col("cc") + col("dd"))))
    val seRr = sqrt(lit(2.0) / col("aa")
      - lit(2.0) / (col("aa") + col("bb"))
      + lit(2.0) / col("cc") - lit(2.0) / (col("cc") + col("dd")))
    val lnOr = log((col("aa").cast("double") * col("dd")) /
      (col("bb").cast("double") * col("cc")))
    val seOr = sqrt(lit(2.0) / col("aa") + lit(2.0) / col("bb")
      + lit(2.0) / col("cc") + lit(2.0) / col("dd"))
    t.select(col("a"), col("b"), col("c"), col("d"),
        (ExactRound.halfUpPos("1000000 * aa * (cc + dd)",
          "cc * (aa + bb)").cast("double") / 1e6).as("risk_ratio"),
        (ExactRound.halfUpPos("1000000 * aa * dd", "bb * cc")
          .cast("double") / 1e6).as("odds_ratio"),
        (ExactRound.halfUp(
          "1000000 * (aa * (cc + dd) - cc * (aa + bb))",
          "(aa + bb) * (cc + dd)").cast("double") / 1e6).as("risk_diff"),
        round(exp(lnRr - lit(1.96) * seRr), 6).as("rr_lo95"),
        round(exp(lnRr + lit(1.96) * seRr), 6).as("rr_hi95"),
        round(exp(lnOr - lit(1.96) * seOr), 6).as("or_lo95"),
        round(exp(lnOr + lit(1.96) * seOr), 6).as("or_hi95"))
  }

  def expFit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Lake.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("gap",
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).cast("long"))
      .filter(col("gap").isNotNull && col("gap") > 0)
    val perGap = gaps.groupBy(col("gap")).agg(count(lit(1)).as("t"))
    val wOrd = Window.orderBy(col("gap"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = perGap.agg(sum(col("t")).as("n"),
      sum(col("gap") * col("t")).as("sg"))
    val ks = perGap
      .withColumn("cum", sum(col("t")).over(wOrd))
      .crossJoin(broadcast(tot))
      .withColumn("lam", col("n").cast("double") / col("sg"))
      .withColumn("f", lit(1.0) - exp(-col("lam") * col("gap")))
      .withColumn("dHi",
        abs(col("cum").cast("double") / col("n") - col("f")))
      .withColumn("dLo",
        abs((col("cum") - col("t")).cast("double") / col("n") - col("f")))
      .agg(max(greatest(col("dHi"), col("dLo"))).as("d"))
    tot.crossJoin(broadcast(ks))
      .select(col("n").as("n_gaps"),
        (ExactRound.halfUpPos("1000000 * n", "sg")
          .cast("double") / 1e6).as("rate_per_day"),
        (ExactRound.halfUpPos("10000 * sg", "n")
          .cast("double") / 1e4).as("mean_gap_days"),
        round(col("d"), 6).as("ks_distance"))
  }

/** Gamma moment fit of order value per market segment — the
    * positive-skew distributional model beside the NB fit for counts:
    * with m = s/n and v = (nq − s²)/(n(n−1)) over the exact cents
    * sums, shape k = m²/v = s²(n−1)/(n(nq − s²)) and scale
    * theta = v/m = (nq − s²)/(s(n−1)) are both TERMINATING integer
    * ratios → exact integer half-up through decimal(38,0). One fact
    * reduce; the ≤5-row scalar algebra after. */
  def gammaFit(spark: SparkSession, dir: String): DataFrame = {
    val g = segCents(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("x2")).as("s"),
        sum((col("x2").cast(d38) * col("x2")).cast(d38)).as("q"))
    // m = s/n, v = (n·q − s²)/(n(n−1));
    // shape = m²/v = s²(n−1)/(n(nq − s²));
    // scale = v/m = (nq − s²)/(s(n−1)) — in cents; /100 to dollars
    // shape = round(10⁶·A/B)/10⁶ with A = s²(n−1), B = n·vd. At sf10
    // 10⁶·A reaches 1.6e40 — past decimal(38) AND the oracle's HUGEINT
    // (the decade sweep's catch) — so the quotient is SPLIT, exactly:
    //   10³·A = Q₁·B + R₁  ⇒  round(10⁶A/B) = 10³Q₁ + round(10³R₁/B)
    // (the first term divides exactly; R₁ < B keeps every operand
    // under 10³⁸ through sf10 and the next decade). The oracle replays
    // the identical Q₁/R₁ decomposition in HUGEINT.
    g.withColumn("vd", (col("n").cast(d38) * col("q")
        - col("s").cast(d38) * col("s")).cast(d38))
      .withColumn("ka",
        ((col("s").cast(d38) * col("s") * (col("n") - 1)) * 1000)
          .cast(d38))
      .withColumn("kd", (col("n").cast(d38) * col("vd")).cast(d38))
      .withColumn("kq1", expr("ka div kd"))
      .withColumn("kr1", (col("ka") % col("kd")).cast(d38))
      .withColumn("tn", (col("vd") * 10000).cast(d38))
      .withColumn("td",
        (col("s").cast(d38) * (col("n") - 1) * 100).cast(d38))
      .select(col("c_mktsegment"), col("n").as("n_orders"),
        (ExactRound.halfUpPos("100 * CAST(s AS DECIMAL(38,0))",
          "n").cast("double") / 1e4).as("mean_value"),
        ((expr("1000 * kq1") +
          ExactRound.halfUpPos("1000 * kr1", "kd")).cast("double") / 1e6)
          .as("shape_k"),
        (ExactRound.halfUpPos("tn", "td").cast("double") / 1e4)
          .as("scale_theta"))
      .orderBy(col("c_mktsegment"))
  }

  /** Inter-purchase gap profile per market segment — the repeat-rhythm
    * readout behind RFM's recency axis: per customer, the day gaps
    * between consecutive orders (one customer-keyed window), then per
    * segment the gap count, exact mean gap, median/p90, and the ≤30-day
    * repeat share. Mean and share by exact integer half-up; the
    * percentiles interpolate in double (identical tree). */
  def purchaseGaps(spark: SparkSession, dir: String,
                   repeatDays: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Lake.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("gap",
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).cast("long"))
      .filter(col("gap").isNotNull)
      .join(broadcast(Lake.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    gaps.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sg"),
        expr("percentile(gap, array(0.5D, 0.9D))").as("q"),
        sum(when(col("gap") <= repeatDays, 1L).otherwise(0L)).as("n_fast"))
      .select(col("c_mktsegment"), col("n_gaps"),
        (ExactRound.halfUpPos("10000 * sg", "n_gaps")
          .cast("double") / 1e4).as("mean_gap_days"),
        round(col("q").getItem(0), 4).as("p50_gap"),
        round(col("q").getItem(1), 4).as("p90_gap"),
        (ExactRound.halfUpPos("10000 * n_fast", "n_gaps")
          .cast("double") / 1e4).as("repeat_30d_share"))
      .orderBy(col("c_mktsegment"))
  }
}
