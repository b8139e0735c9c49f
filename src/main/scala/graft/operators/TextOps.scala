package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Lake

/** Text analysis (SURVEY.md §2 items 22–24): tokenization + per-doc token
  * statistics, a stopword-ratio language/quality heuristic, composite
  * document quality scoring, shingle fingerprinting, and corpus term
  * statistics.
  *
  * DataFrame-first API: every operator's primary overload takes any
  * DataFrame with (`doc_id`, `text`) columns; the `(SparkSession, lakeDir)`
  * overloads bind to the lake's `documents` table. Null `text` rows are
  * dropped up front (split(null) would otherwise poison downstream sizes).
  *
  * Everything is built from codegen'd `functions._` (split / higher-order
  * array functions / xxhash64) — one narrow map stage per operator, no
  * Scala UDFs, no shuffle except the final presentation sort. At 100 TB
  * these run as pure map tasks over the parquet scan.
  */
object TextOps {

  /** Tiny English stopword list used by the language heuristic. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  private def toks: Column = split(col("text"), " ")

  private def nonNull(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)

  /** Per-doc token statistics: counts, type-token ratio, token lengths.
    * `avg_token_len` exploits the single-space tokenization:
    * total token chars = len(text) - (n_tokens - 1). */
  def tokenStats(docs: DataFrame): DataFrame =
    nonNull(docs)
      .select(
        col("doc_id"),
        toks.as("tok"),
        length(col("text")).cast("long").as("text_len"))
      .select(
        col("doc_id"),
        size(col("tok")).cast("long").as("n_tokens"),
        size(array_distinct(col("tok"))).cast("long").as("n_distinct"),
        col("text_len"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_distinct"),
        // int/int ratios → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * n_distinct", "n_tokens")
          .cast("double") / 1e4).as("ttr"),
        (ExactRound.halfUpPos("10000 * (text_len - n_tokens + 1)",
          "n_tokens").cast("double") / 1e4).as("avg_token_len"))
      .orderBy(col("doc_id"))

  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    tokenStats(Lake.documents(spark, dir))

  private def stopFilterSql: String =
    s"size(filter(split(text, ' '), t -> t IN (${Stopwords.map(s => s"'$s'").mkString(", ")})))"

  /** Language-ID heuristic: stopword ratio over the token stream; docs with
    * enough English stopwords are tagged 'en', the rest 'und'. Emitted next
    * to the dataset's own `lang` label for audit. */
  def langQuality(docs: DataFrame): DataFrame =
    nonNull(docs)
      .select(
        col("doc_id"), col("lang"),
        expr(stopFilterSql).cast("long").as("n_stop"),
        size(toks).cast("long").as("n_tokens"))
      .select(
        col("doc_id"), col("lang"), col("n_stop"),
        // count/count → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * n_stop", "n_tokens")
          .cast("double") / 1e4).as("stop_ratio"))
      .withColumn("lang_pred",
        when(col("stop_ratio") >= 0.03, lit("en")).otherwise(lit("und")))
      .orderBy(col("doc_id"))

  def langQuality(spark: SparkSession, dir: String): DataFrame =
    langQuality(Lake.documents(spark, dir))

  /** Language-ID confusion matrix — the EVAL the [[langQuality]] audit
    * column exists for: the corpus carries its own `lang` ground truth,
    * so the heuristic's error structure is measurable, not guessed.
    * One row per (actual, predicted) cell with the within-actual share —
    * read a row as "X% of true-`de` docs were called `en`", i.e. the
    * false-accept rate a downstream English-only filter would suffer per
    * source language. One corpus scan → a ≤|langs|·|preds| frame; the
    * share window partitions by actual language (bounded frame). */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    langConfusion(langQuality(spark, dir))

  /** Core of [[langConfusion(spark:org\.apache\.spark\.sql\.SparkSession*]]
    * over an already-scored frame (needs `lang`, `lang_pred`). */
  def langConfusion(scored: DataFrame): DataFrame =
    scored
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot",
        sum(col("n")).over(Window.partitionBy(col("lang"))))
      // count/count → exact integer half-up ([[ExactRound]])
      .withColumn("share_of_actual",
        ExactRound.halfUpPos("10000 * n", "__tot")
          .cast("double") / 1e4)
      .drop("__tot")
      .orderBy(col("lang"), col("lang_pred"))

  /** Multinomial Naive Bayes language classifier — the trained upgrade
    * the [[langConfusion]] eval calls for once it shows the stopword
    * heuristic false-accepting. The TRAIN slice fits the model (per-class
    * doc priors + Laplace-smoothed token likelihoods over the train
    * vocab); the SCORE slice is classified, so a doc never trains its own
    * classifier (the [[heldoutPerplexity]] no-self-leakage discipline).
    *
    * score(d, l) = ln p̂(l) + Σ_{t∈d, t∈vocab} ln p̂(t|l) + n_oov(d)·ln(1/(N_l+V))
    * with p̂(t|l) = (c(l,t)+1)/(N_l+V); the predicted class is the
    * (score DESC, class ASC) argmax — the ASC tie-break keeps ties
    * deterministic across engines. Determinism routing mirrors the
    * surprisal family: every ln is rounded to 6 dp and decimal-summed,
    * so the class scores are exact decimals until the final 4-dp report.
    *
    * Scale: the likelihood matrix is |train-vocab|·|classes| — vocab-
    * bounded like the term-stats family, broadcastable for natural-
    * language vocabularies; scoring is one explode + one token-keyed
    * join + a classes-bounded grid per doc. No driver collect. */
  def nbLangClassify(docs: DataFrame, trainSlice: Column,
                     scoreSlice: Column): DataFrame = {
    val d6 = DecimalType(18, 6)
    val base = nonNull(docs).filter(trainSlice || scoreSlice)
      .select(col("doc_id"), col("lang"),
        when(trainSlice, 1).otherwise(0).as("is_train"),
        explode(toks).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val trainToks = base.filter(col("is_train") === 1)
    // per-class document priors (from distinct train docs, not tokens)
    val classes = nonNull(docs).filter(trainSlice)
      .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("n_docs"))
    val priors = classes
      .crossJoin(broadcast(classes.agg(sum(col("n_docs")).as("__d"))))
      .select(col("cls"),
        round(log(col("n_docs") / col("__d")), 6).cast(d6).as("log_prior"))
    // per-class token totals and the global train vocab
    val nl = trainToks.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).cast("double").as("n_l"))
    val vocab = trainToks.select(col("token")).distinct()
    val vstat = broadcast(vocab.agg(count(lit(1)).cast("double").as("__v")))
    val cnts = trainToks.groupBy(col("lang").as("cls"), col("token"))
      .agg(count(lit(1)).as("c"))
    // dense |vocab| x |classes| log-likelihood matrix (Laplace-smoothed)
    val mat = vocab.crossJoin(broadcast(nl)).crossJoin(vstat)
      .join(cnts, Seq("cls", "token"), "left")
      .select(col("token"), col("cls"),
        round(log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (col("n_l") + col("__v"))), 6).cast(d6).as("llk"))
      .localCheckpoint(true) // materialize: scored twice below
    val floors = nl.crossJoin(vstat)
      .select(col("cls"),
        round(log(lit(1.0) / (col("n_l") + col("__v"))), 6).cast(d6)
          .as("log_floor"))
    // score slice: per-doc OOV counts + per-(doc, class) in-vocab sums
    val scoreToks = base.filter(col("is_train") === 0)
    val docOov = scoreToks.join(vocab.withColumn("__iv", lit(1L)),
        Seq("token"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
    val inSums = scoreToks.join(mat, Seq("token"))
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("llk")).as("s_in"))
    val grid = docOov.crossJoin(broadcast(priors.join(floors, "cls")))
      .join(inSums, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("lang"), col("cls"),
        (col("log_prior") + coalesce(col("s_in"), lit(0).cast(d6)) +
          col("n_oov") * col("log_floor")).as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls").asc)
    val out = grid.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lang"), col("cls").as("lang_pred"),
        // round the EXACT 6-dp decimal in decimal space, then cast:
        // both engines round decimals half-away-from-zero, but a score
        // ending in ...5 (doc 871 at sf0.1: -266.21975) routed through
        // a double first splits them by 1 ulp of the 4th decimal
        round(col("score"), 4).cast("double").as("nb_score"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true) // materialize + release (surprisal discipline)
    base.unpersist(false)
    out
  }

  /** Lake-bound registered form: even doc_ids train, odd doc_ids are
    * classified (the [[heldoutPerplexity]] split convention). */
  def nbLangClassify(spark: SparkSession, dir: String): DataFrame =
    nbLangClassify(Lake.documents(spark, dir),
      pmod(col("doc_id"), lit(2)) === 0, pmod(col("doc_id"), lit(2)) === 1)

  /** Confusion matrix of the NB classifier over the scored slice —
    * [[langConfusion]]'s eval re-run against the TRAINED model, closing
    * the loop the heuristic matrix opened. */
  def nbConfusion(spark: SparkSession, dir: String): DataFrame =
    langConfusion(nbLangClassify(spark, dir))

  /** Scalar eval readout the [[nbConfusion]] matrix rolls up to —
    * accuracy, macro-averaged precision/recall/F1, and Cohen's κ, the
    * chance-corrected agreement every imbalanced-class eval needs
    * (accuracy alone rewards predicting the majority class). One
    * corpus group collapses the scored slice to the classes²-bounded
    * confusion cells; everything after lives on that frame. The class
    * set is the UNION of actual and predicted labels (full outer join,
    * zero-filled), with the 0/0 conventions pinned: precision = 0 when
    * a class is never predicted, recall = 0 when never actual, F1 = 0
    * when p + r = 0. Chance agreement pe = Σ_c (n_true_c/n)(n_pred_c/n)
    * is computed per class as a ratio product — never an integer
    * cross-product, which would overflow at corpus scale — and each
    * per-class term (p, r, f1, pe_c) is rounded once to 6 dp into
    * decimal so the macro sums are exact in any order; κ and the macro
    * means divide on the bounded one-row frame. */
  def classifierMetrics(scored: DataFrame): DataFrame = {
    val d6 = DecimalType(18, 6)
    val cells = scored.groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
    val truec = cells.groupBy(col("lang").as("cls"))
      .agg(sum(col("n")).as("n_true"))
    val predc = cells.groupBy(col("lang_pred").as("cls"))
      .agg(sum(col("n")).as("n_pred"))
    val tpc = cells.filter(col("lang") === col("lang_pred"))
      .select(col("lang").as("cls"), col("n").as("tp"))
    val tot = cells.agg(sum(col("n")).as("nn"))
    val perCls = truec.join(predc, Seq("cls"), "full_outer")
      .join(tpc, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .crossJoin(broadcast(tot))
      .withColumn("p", when(col("n_pred") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / col("n_pred")))
      .withColumn("r", when(col("n_true") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / col("n_true")))
      .withColumn("f1", when(col("p") + col("r") === 0.0, lit(0.0))
        .otherwise(lit(2.0) * col("p") * col("r") / (col("p") + col("r"))))
      .withColumn("pe_c", (col("n_true").cast("double") / col("nn")) *
        (col("n_pred").cast("double") / col("nn")))
    perCls.agg(
        max(col("nn")).as("n"),
        count(lit(1)).as("n_classes"),
        sum(col("tp")).as("n_correct"),
        sum(round(col("p"), 6).cast(d6)).as("sp"),
        sum(round(col("r"), 6).cast(d6)).as("sr"),
        sum(round(col("f1"), 6).cast(d6)).as("sf"),
        sum(round(col("pe_c"), 6).cast(d6)).as("spe"))
      // all five readouts are terminating quotients → exact integer
      // half-up ([[ExactRound]]): accuracy is count/count; the macro
      // averages are 6-dp decimal sums over the class count; kappa
      // clears po = n_correct/n to (n_correct·10⁶ − n·pe6) /
      // (n·(10⁶ − pe6)) — SIGNED (kappa can be negative)
      .withColumn("k", col("n_classes").cast("long"))
      .withColumn("sp6", (col("sp") * 1000000).cast("long"))
      .withColumn("sr6", (col("sr") * 1000000).cast("long"))
      .withColumn("sf6", (col("sf") * 1000000).cast("long"))
      .withColumn("pe6", (col("spe") * 1000000).cast("long"))
      .select(col("n"), col("k").as("n_classes"),
        (ExactRound.halfUpPos("10000 * n_correct", "n")
          .cast("double") / 1e4).as("accuracy"),
        (ExactRound.halfUpPos("sp6", "100 * k")
          .cast("double") / 1e4).as("macro_precision"),
        (ExactRound.halfUpPos("sr6", "100 * k")
          .cast("double") / 1e4).as("macro_recall"),
        (ExactRound.halfUpPos("sf6", "100 * k")
          .cast("double") / 1e4).as("macro_f1"),
        (ExactRound.halfUp("10000 * (1000000 * n_correct - n * pe6)",
          "n * (1000000 - pe6)").cast("double") / 1e4).as("kappa"))
  }

  /** Lake-bound registered form over the trained NB scored slice. */
  def nbMetrics(spark: SparkSession, dir: String): DataFrame =
    classifierMetrics(nbLangClassify(spark, dir))

  /** Distributed logistic regression by replayable gradient descent —
    * the trainable successor to [[nbLangClassify]] on the same eval
    * loop (predict `lang == 'en'` from the stopword features the
    * heuristic thresholds by hand): each step is ONE corpus aggregation
    * (three gradient sums, map-side combinable) followed by a scalar
    * weight update, the exact shape distributed SGD/L-BFGS drivers
    * reduce to at cluster scale — no parameter server, weights are a
    * broadcast one-row frame.
    *
    * Determinism routing (the [[nbLangClassify]] discipline): the only
    * transcendental, σ(z) = 1/(1+e^(−z)), is rounded to 6 dp and cast
    * to decimal per row, so gradient sums are exact decimals in any
    * order; weight updates divide in double space and re-enter decimals
    * by CAST (the proven primitive). DuckDB replays every step. Emits
    * one row: weights after `iters` steps + training accuracy at the
    * 0.5 boundary (compared in exact decimal space). */
  def logisticFit(docs: DataFrame, iters: Int = 4,
                  lr: Double = 2.0): DataFrame = {
    val (feats, scored) = logisticScored(docs, iters, lr)
    val out = scored.groupBy(col("w0"), col("w1"), col("w2"))
      .agg(
        sum(when((col("p") >= 0.5).cast("long") === col("y"), 1L)
          .otherwise(0L)).as("n_correct"),
        count(lit(1)).as("n"))
      .select(
        round(col("w0").cast("double"), 6).as("w0"),
        round(col("w1").cast("double"), 6).as("w1"),
        round(col("w2").cast("double"), 6).as("w2"),
        col("n"),
        // count/count → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * n_correct", "n")
          .cast("double") / 1e4).as("accuracy"))
      .localCheckpoint(true)
    feats.unpersist(false)
    out
  }

  /** Shared trainer behind [[logisticFit]] and [[logisticEval]]:
    * returns (persisted feature frame, lazily-scored frame). The caller
    * aggregates `scored` down to its SMALL result, localCheckpoints
    * that, and only then unpersists `feats` — so the corpus-sized score
    * frame itself is never materialized. */
  private def logisticScored(docs: DataFrame, iters: Int,
                             lr: Double): (DataFrame, DataFrame) = {
    val d8 = DecimalType(18, 8)
    val feats = langQuality(docs).select(
        (col("lang") === "en").cast("long").as("y"),
        col("stop_ratio").as("x1"),
        (col("n_stop") / 10.0).as("x2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var w = feats.sparkSession.range(1).select(
      lit(java.math.BigDecimal.ZERO).cast(d8).as("w0"),
      lit(java.math.BigDecimal.ZERO).cast(d8).as("w1"),
      lit(java.math.BigDecimal.ZERO).cast(d8).as("w2"))
    for (_ <- 1 to iters) {
      val p = feats.crossJoin(broadcast(w))
        .select(col("y"), col("x1"), col("x2"),
          round(lit(1.0) / (lit(1.0) +
            exp(-(col("w0").cast("double") +
              col("w1").cast("double") * col("x1") +
              col("w2").cast("double") * col("x2")))), 6)
            .cast(d8).as("p"))
        .select(col("x1"), col("x2"), (col("y") - col("p")).as("err"))
      val g = p.agg(
        sum(col("err")).as("g0"),
        sum((col("err").cast("double") * col("x1")).cast(d8)).as("g1"),
        sum((col("err").cast("double") * col("x2")).cast(d8)).as("g2"),
        count(lit(1)).as("n"))
      w = w.crossJoin(broadcast(g)).select(
        (col("w0").cast("double") +
          lit(lr) * col("g0").cast("double") / col("n")).cast(d8).as("w0"),
        (col("w1").cast("double") +
          lit(lr) * col("g1").cast("double") / col("n")).cast(d8).as("w1"),
        (col("w2").cast("double") +
          lit(lr) * col("g2").cast("double") / col("n")).cast(d8).as("w2"))
        .localCheckpoint(true) // keep per-step lineage linear
    }
    val scored = feats.crossJoin(broadcast(w))
      .select(col("y"), col("w0"), col("w1"), col("w2"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("w0").cast("double") +
            col("w1").cast("double") * col("x1") +
            col("w2").cast("double") * col("x2")))), 6)
          .cast(d8).as("p"))
    (feats, scored)
  }

  def logisticFit(spark: SparkSession, dir: String): DataFrame =
    logisticFit(Lake.documents(spark, dir))

  /** Threshold-free evaluation of the trained logistic scores — the
    * rank metrics accuracy-at-0.5 ([[logisticFit]]) cannot see: exact
    * ROC AUC via the tie-corrected Mann–Whitney statistic, its Gini
    * (2·AUC − 1), and the KS separation max|F_pos − F_neg|. The score
    * frame collapses to DISTINCT 6-dp sigmoid values with per-value
    * pos/neg counts first, so the single cumulative window that follows
    * runs on a frame hard-bounded at 1,000,001 rows by the quantization
    * (σ ∈ [0,1] at 6 dp) — never on the corpus. Every term stays BIGINT
    * (2·AUC numerator Σ pos_c·(2·neg_below + neg_c); KS as the integer
    * cross-product max|F_neg·n_pos − F_pos·n_neg|) until the one final
    * divide, so DuckDB replays the ranking value-for-value. BIGINT holds
    * while n_pos·n_neg < 2^63 (n ≈ 3·10^9 balanced) — beyond that the
    * sums route through DECIMAL(38,0), a one-line swap. */
  def logisticEval(docs: DataFrame, iters: Int = 4,
                   lr: Double = 2.0): DataFrame = {
    val (feats, scored) = logisticScored(docs, iters, lr)
    val vals = scored.filter(col("y").isNotNull)
      .groupBy(col("p"))
      .agg(sum(col("y")).as("pos_c"),
        sum(lit(1L) - col("y")).as("neg_c"))
    val wOrd = Window.orderBy(col("p"))
    val cum = vals
      .withColumn("neg_below", coalesce(
        sum(col("neg_c")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pos_upto", sum(col("pos_c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("neg_upto", sum(col("neg_c")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = vals.agg(sum(col("pos_c")).as("n_pos"),
      sum(col("neg_c")).as("n_neg"))
    val out = cum.crossJoin(broadcast(tot))
      .groupBy(col("n_pos"), col("n_neg"))
      .agg(
        sum(col("pos_c") * (lit(2L) * col("neg_below") + col("neg_c")))
          .as("num2"),
        max(abs(col("neg_upto") * col("n_pos") -
          col("pos_upto") * col("n_neg"))).as("ks_num"))
      .select(col("n_pos"), col("n_neg"),
        round(col("num2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), 6).as("auc"),
        round(col("num2").cast("double") /
          (lit(1.0) * col("n_pos") * col("n_neg")) - 1.0, 6).as("gini"),
        round(col("ks_num").cast("double") /
          (lit(1.0) * col("n_pos") * col("n_neg")), 6).as("ks"))
      .localCheckpoint(true)
    feats.unpersist(false)
    out
  }

  def logisticEval(spark: SparkSession, dir: String): DataFrame =
    logisticEval(Lake.documents(spark, dir))

  /** Cumulative gains / lift table of the trained logistic scores —
    * the per-band view the scalar AUC ([[logisticEval]]) summarizes
    * away, and the artifact a score-gated selection policy actually
    * reads ("take the top score band: how much of the positive class is
    * captured, at what lift?"). Bands are ntile(10) over the DISTINCT
    * 6-dp score values (band 1 = highest scores) — the same
    * quantization-bounded frame the AUC window runs on, never a
    * population rank over the corpus; the corpus collapses to
    * per-distinct-score class counts first, and everything after lives
    * on ≤10 rows. Response, capture, share, and lift all reduce to
    * integer cross-products with one rounded divide each, so DuckDB
    * replays the table row-for-row. */
  def logisticGains(docs: DataFrame, iters: Int = 4,
                    lr: Double = 2.0): DataFrame = {
    val (feats, scored) = logisticScored(docs, iters, lr)
    val vals = scored.filter(col("y").isNotNull)
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
    val bands = vals
      .withColumn("band", ntile(10).over(Window.orderBy(col("p").desc)))
      .groupBy(col("band"))
      .agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"))
    val wCum = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = bands.agg(sum(col("n")).as("tn"),
      sum(col("n_pos")).as("tp"))
    val out = bands
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .crossJoin(broadcast(tot))
      // count ratios → exact integer half-up ([[ExactRound]])
      .select(col("band"), col("n"), col("n_pos"),
        (ExactRound.halfUpPos("1000000 * n_pos", "n")
          .cast("double") / 1e6).as("response"),
        (ExactRound.halfUpPos("1000000 * cum_n", "tn")
          .cast("double") / 1e6).as("cum_share"),
        (ExactRound.halfUpPos("1000000 * cum_pos", "tp")
          .cast("double") / 1e6).as("cum_capture"),
        (ExactRound.halfUpPos("10000 * n_pos * tn", "n * tp")
          .cast("double") / 1e4).as("lift"))
      .orderBy(col("band"))
      .localCheckpoint(true)
    feats.unpersist(false)
    out
  }

  def logisticGains(spark: SparkSession, dir: String): DataFrame =
    logisticGains(Lake.documents(spark, dir))

  /** Calibration table + ECE + Brier score of the trained logistic —
    * the readout that decides whether the scores can be THRESHOLDED as
    * probabilities (AUC only ranks; a model can rank perfectly and be
    * wildly miscalibrated). Ten equal-width probability bins, binned on
    * the EXACT decimal score (floor(p·10) on decimal — never on a
    * double whose representation error could flip a boundary), per-bin
    * accuracy vs mean confidence, ECE = Σ (n_b/N)·|acc_b − conf_b|, and
    * the Brier score from per-distinct-score closed form
    * n·p² − 2p·pos + pos (one rounded double term per distinct value).
    * The corpus collapses to the quantization-bounded distinct-score
    * frame first (≤ 10⁶+1 rows); everything after lives on ≤ 10 rows.
    * Confidence sums are exact decimal (p·n at fixed scale); ECE/Brier
    * terms are rounded once to 8 dp into decimal so sums are
    * order-free and DuckDB replays the table row-for-row. */
  def logisticCalibration(docs: DataFrame, iters: Int = 4,
                          lr: Double = 2.0, nBins: Int = 10): DataFrame = {
    val d8 = DecimalType(18, 8)
    val d38 = DecimalType(38, 8)
    val (feats, scored) = logisticScored(docs, iters, lr)
    val vals = scored.filter(col("y").isNotNull)
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
      .withColumn("brier_t", round(
        col("n") * col("p").cast("double") * col("p").cast("double")
          - lit(2.0) * col("p").cast("double") * col("n_pos")
          + col("n_pos"), 8).cast(d8))
      .withColumn("bin",
        least(floor(col("p") * nBins), lit(nBins - 1L)).cast("int"))
    val bins = vals.groupBy(col("bin")).agg(
      sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"),
      sum((col("p") * col("n")).cast(d38)).as("sp"))
    val tot = vals.agg(sum(col("n")).as("nn"),
      sum(col("brier_t")).as("sb"))
    val terms = bins.crossJoin(broadcast(tot))
      .withColumn("acc", col("n_pos").cast("double") / col("n"))
      .withColumn("conf", col("sp").cast("double") / col("n"))
      .withColumn("gap_t", round(col("n") * abs(col("acc") - col("conf")),
        8).cast(d8))
      .localCheckpoint(true) // ≤ nBins rows; feeds the ECE sum + output
    val ece = terms.agg(sum(col("gap_t")).as("sg"))
    // every readout is a terminating quotient over exact decimals /
    // counts → exact integer half-up ([[ExactRound]]); the interior
    // gap_t terms stay in double (identical scalar tree on both sides)
    terms.crossJoin(broadcast(ece))
      .withColumn("sp8", (col("sp") * 100000000L).cast("long"))
      .withColumn("sg8", (col("sg") * 100000000L).cast("long"))
      .withColumn("sb8", (col("sb") * 100000000L).cast("long"))
      .select(col("bin"), col("n"), col("n_pos"),
        (ExactRound.halfUpPos("1000000 * n_pos", "n")
          .cast("double") / 1e6).as("acc"),
        (ExactRound.halfUpPos("sp8", "100 * n")
          .cast("double") / 1e6).as("conf"),
        (ExactRound.halfUpPos("abs(100000000 * n_pos - sp8)", "100 * n")
          .cast("double") / 1e6).as("abs_gap"),
        (ExactRound.halfUpPos("sg8", "100 * nn")
          .cast("double") / 1e6).as("ece"),
        (ExactRound.halfUpPos("sb8", "100 * nn")
          .cast("double") / 1e6).as("brier"))
      .orderBy(col("bin"))
  }

  def logisticCalibration(spark: SparkSession, dir: String): DataFrame =
    logisticCalibration(Lake.documents(spark, dir))

  /** Two rounds of L2 gradient boosting with stump base learners and
    * shrinkage ν = 0.5 — the REGRESSION member of the boosting family
    * ([[adaBoost2]] boosts classification; every distributed GBM layer
    * is exactly this: one histogram pass per round, residuals riding
    * with the rows): f₀ = ȳ (rounded once to 6 dp into decimal, so all
    * residuals are EXACT decimals), each round fits the variance-gain
    * argmax split S_l²/n_l + S_r²/n_r over the quantization-bounded
    * stop-ratio histogram (per-threshold score computed once in double,
    * rounded to 9 dp, ties broken (score DESC, x ASC)), and leaf values
    * ν·mean(residual) re-enter decimal at 6 dp so round 2's residuals
    * stay exact. Per round: one corpus pass, one bounded cumulative
    * window, a 1-row broadcast — and the published train MSE before/
    * after each round comes from 8-dp-rounded squared residual terms
    * (order-free sums). */
  def gbt2(docs: DataFrame, nu: Double = 0.5): DataFrame = {
    val d6 = DecimalType(18, 6)
    val d8 = DecimalType(18, 8)
    val feats = langQuality(docs).join(
        nonNull(docs).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("stop_ratio").as("x"), col("n_chars").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // base prediction ȳ by exact integer half-up (long/count at 6 dp)
    // before re-entering decimal — the quotient-tie law on the seed
    val f0 = feats.agg(sum(col("y")).as("sy"), count(lit(1)).as("nf"))
      .select((ExactRound.halfUpPos("1000000 * sy", "nf")
        .cast("double") / 1e6).cast(d6).as("f0"))
    val r1 = feats.crossJoin(broadcast(f0))
      .select(col("x"), (col("y") - col("f0")).as("r"))
    def fitStump(resid: DataFrame): DataFrame = {
      val hist = resid.groupBy(col("x"))
        .agg(count(lit(1)).as("n_v"), sum(col("r")).as("sr_v"))
      val wCum = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("n_l", sum(col("n_v")).over(wCum))
        .withColumn("s_l", sum(col("sr_v")).over(wCum))
      val tot = hist.agg(sum(col("n_v")).as("n"), sum(col("sr_v")).as("s"))
      val sl = col("s_l").cast("double")
      val srr = (col("s") - col("s_l")).cast("double")
      cum.crossJoin(broadcast(tot))
        .withColumn("n_r", col("n") - col("n_l"))
        .filter(col("n_r") > 0)
        .withColumn("score",
          round(sl * sl / col("n_l") + srr * srr / col("n_r"), 9))
        .withColumn("rn",
          row_number().over(Window.orderBy(col("score").desc, col("x"))))
        .filter(col("rn") === 1)
        // leaf values are signed terminating quotients (6-dp decimal
        // residual sums over counts, ×nu at scale 2) → exact integer
        // half-up; the score argmax key stays in double (its exact form
        // needs >38-digit products — both engines share the tree)
        .withColumn("sl6", (col("s_l") * 1000000).cast("long"))
        .withColumn("sr6", ((col("s") - col("s_l")) * 1000000).cast("long"))
        .withColumn("nu2", lit(math.round(nu * 100)))
        .select(col("x").as("threshold"),
          (ExactRound.halfUp("nu2 * sl6", "100 * n_l")
            .cast("double") / 1e6).cast(d6).as("left_val"),
          (ExactRound.halfUp("nu2 * sr6", "100 * n_r")
            .cast("double") / 1e6).cast(d6).as("right_val"),
          col("n_l").as("n_left"), col("n_r").as("n_right"))
        .localCheckpoint(true)
    }
    // mse = scale-8 decimal sum / count at 4 dp — the ×10⁸ numerator
    // exceeds int64, so it stages through decimal(38,0)
    def mseOf(resid: DataFrame): DataFrame = resid.agg(
        sum(round(col("r").cast("double") * col("r").cast("double"),
          8).cast(d8)).as("ssq"), count(lit(1)).as("nf"))
      .withColumn("m8",
        ((col("ssq") * 100000000L).cast(DecimalType(38, 0))))
      .select((ExactRound.halfUpPos("m8", "10000 * nf")
        .cast("double") / 1e4).as("mse"))
    val s1 = fitStump(r1)
    val r2 = r1.crossJoin(broadcast(s1))
      .select(col("x"), (col("r") - when(col("x") <= col("threshold"),
        col("left_val")).otherwise(col("right_val"))).as("r"))
    val s2 = fitStump(r2)
    val r3 = r2.crossJoin(broadcast(s2))
      .select(col("x"), (col("r") - when(col("x") <= col("threshold"),
        col("left_val")).otherwise(col("right_val"))).as("r"))
    val out = s1.withColumn("round", lit(1))
      .crossJoin(broadcast(mseOf(r1).select(col("mse").as("mse_before"))))
      .crossJoin(broadcast(mseOf(r2).select(col("mse").as("mse_after"))))
      .unionByName(s2.withColumn("round", lit(2))
        .crossJoin(broadcast(mseOf(r2).select(col("mse").as("mse_before"))))
        .crossJoin(broadcast(mseOf(r3).select(col("mse").as("mse_after")))))
      .select(col("round"), col("threshold"),
        col("left_val").cast("double").as("left_val"),
        col("right_val").cast("double").as("right_val"),
        col("n_left"), col("n_right"), col("mse_before"), col("mse_after"))
      .orderBy(col("round"))
      .localCheckpoint(true)
    feats.unpersist(false)
    out
  }

  def gbt2(spark: SparkSession, dir: String): DataFrame =
    gbt2(Lake.documents(spark, dir))

  /** Best-split decision stump by the histogram method — the primitive
    * every distributed gradient-boosted-tree layer reduces to
    * (XGBoost/LightGBM grow trees by exactly this per-feature
    * cumulative-histogram scan): classify `lang == 'en'` by one split
    * x ≤ t on the stopword ratio, choosing the t that maximizes Gini
    * gain. The corpus collapses to per-DISTINCT-value (pos, neg) counts
    * first — the 4-dp quantization hard-bounds that frame at 10,001
    * rows — then ONE cumulative window enumerates every candidate
    * split, and the argmax is a row_number pick under the deterministic
    * (score DESC, t ASC) order. The split score stays in integers —
    * S(t)·nL·nR = (posL²+negL²)·nR + (posR²+negR²)·nL — until one
    * double divide rounded to 9 dp, so both engines rank candidates
    * identically. BIGINT holds the cubic count term while n < 2^21 ≈
    * 2·10⁶ docs; beyond that the three products route through
    * DECIMAL(38,0), a localized swap. */
  def giniStump(docs: DataFrame): DataFrame = {
    val feats = langQuality(docs)
      .filter(col("lang").isNotNull)
      .select(col("stop_ratio").as("x"),
        (col("lang") === "en").cast("long").as("y"))
    val vals = feats.groupBy(col("x")).agg(
      sum(col("y")).as("pos_c"),
      sum(lit(1L) - col("y")).as("neg_c"))
    val wCum = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = vals
      .withColumn("pos_l", sum(col("pos_c")).over(wCum))
      .withColumn("neg_l", sum(col("neg_c")).over(wCum))
    val tot = vals.agg(sum(col("pos_c")).as("n_pos"),
      sum(col("neg_c")).as("n_neg"))
    val cand = cum.crossJoin(broadcast(tot))
      .withColumn("n_l", col("pos_l") + col("neg_l"))
      .withColumn("pos_r", col("n_pos") - col("pos_l"))
      .withColumn("neg_r", col("n_neg") - col("neg_l"))
      .withColumn("n_r", col("pos_r") + col("neg_r"))
      .filter(col("n_r") > 0)
      .withColumn("n", col("n_pos") + col("n_neg"))
      .withColumn("s_num",
        (col("pos_l") * col("pos_l") + col("neg_l") * col("neg_l")) *
          col("n_r") +
          (col("pos_r") * col("pos_r") + col("neg_r") * col("neg_r")) *
            col("n_l"))
      // score = s_num/(nL·nR) at 9 dp and the gain at 6 dp are
      // terminating integer ratios → exact integer half-up; the ×10⁹
      // numerators exceed int64, so they stage through decimal(38,0)
      .withColumn("sn",
        (col("s_num").cast(DecimalType(38, 0)) * 1000000000L)
          .cast(DecimalType(38, 0)))
      .withColumn("score9", ExactRound.halfUpPos("sn", "n_l * n_r"))
    val wBest = Window.orderBy(col("score9").desc, col("x"))
    cand.withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .withColumn("gn",
        ((col("score9").cast(DecimalType(38, 0)) * col("n")
          - (col("n_pos") * col("n_pos") + col("n_neg") * col("n_neg"))
            .cast(DecimalType(38, 0)) * 1000000000L) * 1000000L)
          .cast(DecimalType(38, 0)))
      .withColumn("gd",
        (col("n").cast(DecimalType(38, 0)) * col("n") * 1000000000L)
          .cast(DecimalType(38, 0)))
      .select(
        col("x").as("threshold"),
        (ExactRound.halfUp("gn", "gd").cast("double") / 1e6)
          .as("gini_gain"),
        col("n_l").as("n_left"), col("pos_l").as("pos_left"),
        col("n_r").as("n_right"), col("pos_r").as("pos_right"),
        col("n"))
  }

  def giniStump(spark: SparkSession, dir: String): DataFrame =
    giniStump(Lake.documents(spark, dir))

  /** Depth-2 CART by LEVEL-WISE histogram growth — [[giniStump]] made
    * recursive, and the exact shape every distributed tree learner
    * (XGBoost/LightGBM `depthwise`) scales by: ONE corpus pass per
    * LEVEL, not per node. Two candidate features (stopword ratio,
    * type–token ratio, both 4-dp-quantized so each per-feature
    * histogram is ≤10,001 rows), best (feature, threshold) at the root,
    * then node assignment travels WITH the rows into the second pass
    * whose histograms key by (node, feature, value) — per-node argmax
    * under the deterministic (score DESC, feature, threshold) order.
    * The integer split-score and gain trees are [[giniStump]]'s,
    * evaluated against each node's own class totals. Emits one row per
    * split node (root, L, R) with its children's class tallies; a node
    * with no valid split (single distinct value on both features)
    * simply emits no row. */
  def giniTree2(docs: DataFrame): DataFrame = {
    val base = nonNull(docs).filter(col("lang").isNotNull)
      .select(col("lang"), expr(stopFilterSql).cast("long").as("n_stop"),
        size(toks).cast("long").as("n_tok"),
        size(array_distinct(toks)).cast("long").as("n_dis"))
    val feats = base.select(
        (col("lang") === "en").cast("long").as("y"),
        // count/count features → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * n_stop", "n_tok")
          .cast("double") / 1e4).as("f1"),
        (ExactRound.halfUpPos("10000 * n_dis", "n_tok")
          .cast("double") / 1e4).as("f2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fv = explode(array(
      struct(lit("f1").as("feat"), col("f1").as("v")),
      struct(lit("f2").as("feat"), col("f2").as("v")))).as("fv")
    def candidates(hist: DataFrame, nodeKey: Seq[String],
                   totals: DataFrame): DataFrame = {
      val wCum = Window
        .partitionBy((nodeKey :+ "feat").map(col): _*)
        .orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("pos_l", sum(col("pos_c")).over(wCum))
        .withColumn("neg_l", sum(col("neg_c")).over(wCum))
      val joined =
        if (nodeKey.isEmpty) cum.crossJoin(broadcast(totals))
        else cum.join(broadcast(totals), nodeKey)
      joined
        .withColumn("n_l", col("pos_l") + col("neg_l"))
        .withColumn("pos_r", col("n_pos") - col("pos_l"))
        .withColumn("neg_r", col("n_neg") - col("neg_l"))
        .withColumn("n_r", col("pos_r") + col("neg_r"))
        .filter(col("n_r") > 0)
        .withColumn("n", col("n_pos") + col("n_neg"))
        .withColumn("s_num",
          (col("pos_l") * col("pos_l") + col("neg_l") * col("neg_l")) *
            col("n_r") +
            (col("pos_r") * col("pos_r") + col("neg_r") * col("neg_r")) *
              col("n_l"))
        // same exact-integer score/gain forms as [[giniStump]]
        .withColumn("sn",
          (col("s_num").cast(DecimalType(38, 0)) * 1000000000L)
            .cast(DecimalType(38, 0)))
        .withColumn("score9", ExactRound.halfUpPos("sn", "n_l * n_r"))
        .withColumn("gn",
          ((col("score9").cast(DecimalType(38, 0)) * col("n")
            - (col("n_pos") * col("n_pos") + col("n_neg") * col("n_neg"))
              .cast(DecimalType(38, 0)) * 1000000000L) * 1000000L)
            .cast(DecimalType(38, 0)))
        .withColumn("gd",
          (col("n").cast(DecimalType(38, 0)) * col("n") * 1000000000L)
            .cast(DecimalType(38, 0)))
        .withColumn("gini_gain",
          ExactRound.halfUp("gn", "gd").cast("double") / 1e6)
    }
    def best(cand: DataFrame, nodeKey: Seq[String]): DataFrame = {
      val wBest = Window
        .partitionBy(nodeKey.map(col): _*)
        .orderBy(col("score9").desc, col("feat"), col("v"))
      cand.withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1)
    }
    // level 1: one pass, both feature histograms
    val hist1 = feats.select(fv, col("y"))
      .select(col("fv.feat").as("feat"), col("fv.v").as("v"), col("y"))
      .groupBy(col("feat"), col("v"))
      .agg(sum(col("y")).as("pos_c"), sum(lit(1L) - col("y")).as("neg_c"))
    val tot1 = feats.agg(sum(col("y")).as("n_pos"),
      sum(lit(1L) - col("y")).as("n_neg"))
    val root = best(candidates(hist1, Seq.empty, tot1), Seq.empty)
      .localCheckpoint(true)
    // level 2: assignment travels with the rows into one more pass
    val assigned = feats
      .crossJoin(broadcast(root.select(col("feat").as("r_feat"),
        col("v").as("r_thr"))))
      .withColumn("node",
        when(when(col("r_feat") === "f1", col("f1")).otherwise(col("f2"))
          <= col("r_thr"), "L").otherwise("R"))
    val hist2 = assigned.select(col("node"), fv, col("y"))
      .select(col("node"), col("fv.feat").as("feat"), col("fv.v").as("v"),
        col("y"))
      .groupBy(col("node"), col("feat"), col("v"))
      .agg(sum(col("y")).as("pos_c"), sum(lit(1L) - col("y")).as("neg_c"))
    val tot2 = assigned.groupBy(col("node"))
      .agg(sum(col("y")).as("n_pos"), sum(lit(1L) - col("y")).as("n_neg"))
    val splits2 = best(candidates(hist2, Seq("node"), tot2), Seq("node"))
    val outCols = Seq(col("feat").as("feature"), col("v").as("threshold"),
      col("gini_gain"), col("n"), col("n_pos").as("pos"),
      col("n_l").as("n_left"), col("pos_l").as("pos_left"),
      col("n_r").as("n_right"), col("pos_r").as("pos_right"))
    val out = root.select((lit("root").as("node") +: outCols): _*)
      .unionByName(splits2.select((col("node") +: outCols): _*))
      .orderBy(col("node"))
      .localCheckpoint(true)
    feats.unpersist(false)
    out
  }

  def giniTree2(spark: SparkSession, dir: String): DataFrame =
    giniTree2(Lake.documents(spark, dir))

  /** Huber M-estimated regression, MM-style: a high-breakdown trimmed
    * restart then TWO replayable efficient IRLS steps — the robust twin
    * of the [[olsMulti]] least-squares fit (one corrupted document
    * drags an LS hyperplane; the Huber loss caps its leverage). Plain
    * IRLS from the dragged OLS start converges only geometrically (each
    * step roughly halves the bias — an arbitrarily large outlier
    * outruns any fixed step count), so between the OLS solve and the
    * Huber steps sits the classic MM move: center the OLS residuals at
    * their median, hard-trim rows whose centered-MAD z-score exceeds 3
    * (weight 0/1 — exact in DECIMAL), and re-solve. From that
    * high-breakdown start, each efficient step computes residuals
    * against the broadcast coefficients, the MAD-based Huber radius
    * c = 1.345·1.4826·median|r| (the 95%-efficiency convention;
    * `quantile_cont`-proven cross-engine), per-row weights
    * min(1, c/|r|) rounded once to 6 dp into DECIMAL, and re-solves the
    * WEIGHTED normal equations — each weighted Gram cell a decimal sum
    * of once-cast products, so the unordered reduce is exact and DuckDB
    * replays every stage cell-for-cell. Each stage is one residual
    * scan + exact-median aggregates + one Gram pass — the fixed number
    * of corpus passes every distributed IRLS reduces to. Emits the
    * robust coefficients, the final scale, and how many rows the loss
    * downweighted (the outlier-mass diagnostic). */
  def huberFit(docs: DataFrame): DataFrame = {
    val d8 = DecimalType(18, 8)
    val kC = 1.345 * 1.4826
    val feats = nonNull(docs).select(
        size(toks).cast("long").as("x1"),
        size(array_distinct(toks)).cast("long").as("x2"),
        col("n_chars").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def gramOf(wdf: DataFrame): DataFrame = wdf.agg(
      count(lit(1)).as("n"),
      sum(col("w")).as("swr"),
      sum(when(col("w") < lit(java.math.BigDecimal.ONE).cast(d8), 1L)
        .otherwise(0L)).as("n_down"),
      sum((col("w").cast("double") * col("x1")).cast(d8)).as("s1"),
      sum((col("w").cast("double") * col("x2")).cast(d8)).as("s2"),
      sum((col("w").cast("double") * col("y")).cast(d8)).as("sy"),
      sum((col("w").cast("double") * col("x1") * col("x1")).cast(d8))
        .as("s11"),
      sum((col("w").cast("double") * col("x1") * col("x2")).cast(d8))
        .as("s12"),
      sum((col("w").cast("double") * col("x2") * col("x2")).cast(d8))
        .as("s22"),
      sum((col("w").cast("double") * col("x1") * col("y")).cast(d8))
        .as("s1y"),
      sum((col("w").cast("double") * col("x2") * col("y")).cast(d8))
        .as("s2y"))
    def solve(g: DataFrame): DataFrame = g
      .withColumn("dn", col("swr").cast("double"))
      .withColumn("d1", col("s1").cast("double"))
      .withColumn("d2", col("s2").cast("double"))
      .withColumn("dy", col("sy").cast("double"))
      .withColumn("d11", col("s11").cast("double"))
      .withColumn("d12", col("s12").cast("double"))
      .withColumn("d22", col("s22").cast("double"))
      .withColumn("d1y", col("s1y").cast("double"))
      .withColumn("d2y", col("s2y").cast("double"))
      .withColumn("m00", col("d11") * col("d22") - col("d12") * col("d12"))
      .withColumn("m10", col("d1") * col("d22") - col("d2") * col("d12"))
      .withColumn("m20", col("d1") * col("d12") - col("d2") * col("d11"))
      .withColumn("det", col("dn") * col("m00") - col("d1") * col("m10")
        + col("d2") * col("m20"))
      .filter(col("det") =!= 0.0)
      .withColumn("b0",
        (col("dy") * col("m00") - col("d1y") * col("m10")
          + col("d2y") * col("m20")) / col("det"))
      .withColumn("b1",
        (-col("dy") * (col("d1") * col("d22") - col("d12") * col("d2"))
          + col("d1y") * (col("dn") * col("d22") - col("d2") * col("d2"))
          - col("d2y") * (col("dn") * col("d12") - col("d2") * col("d1")))
          / col("det"))
      .withColumn("b2",
        (col("dy") * (col("d1") * col("d12") - col("d11") * col("d2"))
          - col("d1y") * (col("dn") * col("d12") - col("d1") * col("d2"))
          + col("d2y") * (col("dn") * col("d11") - col("d1") * col("d1")))
          / col("det"))
      .select(col("n"), col("n_down"), col("swr"),
        col("b0"), col("b1"), col("b2"))
    val kT = 3 * 1.4826
    val fit0 = solve(gramOf(feats.withColumn("w",
        lit(java.math.BigDecimal.ONE).cast(d8)))).localCheckpoint(true)
    // MM-style high-breakdown restart: center the OLS residuals at
    // their median, hard-trim by centered-MAD z > 3 (0/1 weights —
    // exact in decimal), and re-solve; plain IRLS from the dragged OLS
    // start only halves the bias per step, so an arbitrarily large
    // outlier would outrun any fixed step count
    val r0 = feats
      .crossJoin(broadcast(fit0.select(col("b0"), col("b1"), col("b2"))))
      .withColumn("r", col("y") - (col("b0") + col("b1") * col("x1")
        + col("b2") * col("x2")))
    val med0 = r0.agg(expr("percentile(r, 0.5D)").as("med"))
    val a0 = r0.crossJoin(broadcast(med0))
      .withColumn("ar", abs(col("r") - col("med")))
    val mad0 = a0.agg(expr("percentile(ar, 0.5D)").as("mad"))
    val trimmed = a0.crossJoin(broadcast(mad0))
      .withColumn("w", when(col("ar") <= round(lit(kT) * col("mad"), 6),
        lit(java.math.BigDecimal.ONE)).otherwise(
        lit(java.math.BigDecimal.ZERO)).cast(d8))
    var fit = solve(gramOf(trimmed.select(col("x1"), col("x2"), col("y"),
        col("w"))))
      .withColumn("s", lit(0.0)).localCheckpoint(true)
    for (_ <- 1 to 2) {
      val resid = feats
        .crossJoin(broadcast(fit.select(col("b0"), col("b1"), col("b2"))))
        .withColumn("r", col("y") - (col("b0") + col("b1") * col("x1")
          + col("b2") * col("x2")))
      val scale = resid.agg(
        expr("percentile(abs(r), 0.5D)").as("s"))
      val wts = resid.crossJoin(broadcast(scale))
        .withColumn("cc", round(lit(kC) * col("s"), 6))
        .withColumn("w", when(abs(col("r")) <= col("cc"), lit(1.0))
          .otherwise(col("cc") / abs(col("r"))))
        .withColumn("w", round(col("w"), 6).cast(d8))
      fit = solve(gramOf(wts.select(col("x1"), col("x2"), col("y"),
          col("w"))))
        .crossJoin(broadcast(scale))
        .localCheckpoint(true)
    }
    // published scale = MAD of residuals against the EMITTED
    // coefficients (one more residual pass) — the loop's `s` is the
    // penultimate fit's working scale and does not correspond to b0..b2
    val residF = feats
      .crossJoin(broadcast(fit.select(col("b0"), col("b1"), col("b2"))))
      .withColumn("r", col("y") - (col("b0") + col("b1") * col("x1")
        + col("b2") * col("x2")))
    val scaleF = residF.agg(expr("percentile(abs(r), 0.5D)").as("s_f"))
    val out = fit.drop("s").crossJoin(broadcast(scaleF)).select(col("n"),
        round(col("b0"), 4).as("b0"),
        round(col("b1"), 4).as("b1"),
        round(col("b2"), 4).as("b2"),
        round(col("s_f"), 4).as("scale_mad"),
        col("n_down").as("n_downweighted"),
        // scale-8 decimal sum / count → exact integer half-up
        (ExactRound.halfUpPos("CAST(swr * 100000000 AS BIGINT)",
          "10000 * n").cast("double") / 1e4).as("weight_mass"))
    feats.unpersist(false)
    out
  }

  def huberFit(spark: SparkSession, dir: String): DataFrame =
    huberFit(Lake.documents(spark, dir))

  /** AdaBoost, two rounds of polarity-aware decision stumps — the
    * BOOSTED ensemble the single [[giniStump]] and level-wise
    * [[giniTree2]] build toward (distributed boosting = exactly this:
    * one weighted-histogram pass per round, weights riding with the
    * rows): round 1 picks the (threshold, polarity) minimizing the
    * INTEGER misclassification count over the quantization-bounded
    * histogram; its Laplace-smoothed vote α = ½·ln((n−e+½)/(e+½))
    * (defined even at e = 0) rounded once to 6 dp reweights every row
    * by e^{∓α} — rounded to 6 dp into DECIMAL, so round 2's weighted
    * histogram sums are EXACT decimals and its argmax compares exact
    * values, never float noise; the combined sign(α₁h₁ + α₂h₂)
    * training accuracy closes the loop. Per round: one corpus pass,
    * one bounded cumulative window, one-row broadcasts — the level
    * structure of every distributed GBM. Ties: (err ASC, t ASC,
    * polarity +1 first). */
  def adaBoost2(docs: DataFrame): DataFrame = {
    val d8 = DecimalType(18, 8)
    val feats = langQuality(docs).filter(col("lang").isNotNull)
      .select(col("stop_ratio").as("x"),
        when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wCum = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBest = Window.orderBy(col("err"), col("x"), col("pol").desc)
    // round 1: integer counts
    val h1 = feats.groupBy(col("x")).agg(
      sum(when(col("y") === 1L, 1L).otherwise(0L)).as("pos_c"),
      sum(when(col("y") === -1L, 1L).otherwise(0L)).as("neg_c"))
    val tot1 = h1.agg(sum(col("pos_c")).as("n_pos"),
      sum(col("neg_c")).as("n_neg"))
    val best1 = h1
      .withColumn("pos_l", sum(col("pos_c")).over(wCum))
      .withColumn("neg_l", sum(col("neg_c")).over(wCum))
      .crossJoin(broadcast(tot1))
      .withColumn("n", col("n_pos") + col("n_neg"))
      .filter(col("pos_l") + col("neg_l") < col("n"))
      .withColumn("ep", col("pos_l") + (col("n_neg") - col("neg_l")))
      .select(col("x"), col("n"), explode(array(
        struct(lit(1).as("pol"), col("ep").as("err")),
        struct(lit(-1).as("pol"), (col("n") - col("ep")).as("err"))))
        .as("c"))
      .select(col("x"), col("n"), col("c.pol").as("pol"),
        col("c.err").as("err"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("x").as("t1"), col("pol").as("pol1"),
        col("err").as("err1"), col("n"),
        round(lit(0.5) * log((col("n") - col("err1") + 0.5) /
          (col("err1") + 0.5)), 6).as("alpha1"))
      .localCheckpoint(true)
    // round 2: decimal weights ride with the rows
    val reweighted = feats.crossJoin(broadcast(best1))
      .withColumn("h1", when(col("x") > col("t1"),
        col("pol1").cast("long")).otherwise(-col("pol1").cast("long")))
      .withColumn("w", when(col("h1") === col("y"),
        round(exp(-col("alpha1")), 6)).otherwise(
        round(exp(col("alpha1")), 6)).cast(d8))
    val h2 = reweighted.groupBy(col("x")).agg(
      sum(when(col("y") === 1L, col("w")).otherwise(
        lit(java.math.BigDecimal.ZERO).cast(d8))).as("wpos"),
      sum(when(col("y") === -1L, col("w")).otherwise(
        lit(java.math.BigDecimal.ZERO).cast(d8))).as("wneg"))
    val tot2 = h2.agg(sum(col("wpos")).as("w_pos"),
      sum(col("wneg")).as("w_neg"))
    val best2 = h2
      .withColumn("wpos_l", sum(col("wpos")).over(wCum))
      .withColumn("wneg_l", sum(col("wneg")).over(wCum))
      .crossJoin(broadcast(tot2))
      .withColumn("wt", col("w_pos") + col("w_neg"))
      // same last-threshold exclusion as round 1: the all-left split is
      // a constant classifier and must not compete in either argmax
      // (decimal sums are exact, so the equality test is safe)
      .filter(col("wpos_l") + col("wneg_l") < col("wt"))
      .withColumn("ep", col("wpos_l") + (col("w_neg") - col("wneg_l")))
      .select(col("x"), col("wt"), explode(array(
        struct(lit(1).as("pol"), col("ep").as("err")),
        struct(lit(-1).as("pol"), (col("wt") - col("ep")).as("err"))))
        .as("c"))
      .select(col("x"), col("wt"), col("c.pol").as("pol"),
        col("c.err").as("err"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("x").as("t2"), col("pol").as("pol2"),
        col("err").as("err2"), col("wt"),
        round(lit(0.5) * log(
          ((col("wt") - col("err2")).cast("double") + 0.5) /
            (col("err2").cast("double") + 0.5)), 6).as("alpha2"))
      .localCheckpoint(true)
    // combined training accuracy of sign(a1*h1 + a2*h2)
    val acc = feats.crossJoin(broadcast(best1)).crossJoin(broadcast(best2))
      .withColumn("h1", when(col("x") > col("t1"),
        col("pol1").cast("long")).otherwise(-col("pol1").cast("long")))
      .withColumn("h2", when(col("x") > col("t2"),
        col("pol2").cast("long")).otherwise(-col("pol2").cast("long")))
      .withColumn("s", col("alpha1") * col("h1") + col("alpha2") * col("h2"))
      .withColumn("pred", when(col("s") >= 0, 1L).otherwise(-1L))
      // terminating quotients → exact integer half-up ([[ExactRound]]):
      // train_acc and round-1 err are count/count; round-2 err is a
      // ratio of scale-8 decimal weight sums (numerator staged through
      // decimal(38,0) for the ×10¹⁴ rescale)
      .agg(sum(when(col("pred") === col("y"), 1L).otherwise(0L))
        .as("n_right"), count(lit(1)).as("n_all"))
      .select((ExactRound.halfUpPos("10000 * n_right", "n_all")
        .cast("double") / 1e4).as("train_acc"))
    val out = best1.crossJoin(broadcast(acc)).select(
        lit(1).as("round"), col("t1").as("threshold"),
        col("pol1").as("polarity"),
        (ExactRound.halfUpPos("1000000 * err1", "n")
          .cast("double") / 1e6).as("err_rate"),
        col("alpha1").as("alpha"), col("train_acc"))
      .unionByName(best2.crossJoin(broadcast(acc))
        .withColumn("e2n",
          ((col("err2") * 100000000L).cast(DecimalType(38, 0)) * 1000000L)
            .cast(DecimalType(38, 0)))
        .withColumn("w8", (col("wt") * 100000000L).cast("long"))
        .select(
        lit(2).as("round"), col("t2").as("threshold"),
        col("pol2").as("polarity"),
        (ExactRound.halfUpPos("e2n", "w8")
          .cast("double") / 1e6).as("err_rate"),
        col("alpha2").as("alpha"), col("train_acc")))
      .orderBy(col("round"))
      .localCheckpoint(true)
    feats.unpersist(false)
    out
  }

  def adaBoost2(spark: SparkSession, dir: String): DataFrame =
    adaBoost2(Lake.documents(spark, dir))

  /** Word-association embedding trained IN-ENGINE: the top eigenvector
    * of the PPMI co-occurrence matrix — the classic count-based word
    * embedding (SPPMI-SVD's leading axis; skip-gram is its implicit
    * factorization) computed with the [[graft.operators.AnnOps.pcaPower]]
    * machinery so every step is oracle-replayable. Vocab = top
    * `vocabSize` tokens by (count DESC, token) — the matrix dimension
    * is a DESIGN constant, not data-driven; co-occurrence = ordered
    * token pairs within `window` positions, symmetrized; cells get
    * PPMI = max(0, log₂(c(a,b)·T / (c(a)·c(b)))) rounded once to 6 dp
    * into decimal, so the V×V matrix is exact. Power iteration then
    * runs the proven decimal/double alternation (products in double —
    * never an exact-decimal tie — decimal sums, per-step renormalize,
    * localCheckpoint per step to keep lineage linear). ONE corpus pass
    * builds positions; everything after the co-occurrence group-by
    * lives on vocab²-bounded frames. Emits token, loading, eigval —
    * the dominant association axis (function-word mass vs content
    * vocabulary) a stylometry or topic screen reads directly. */
  def ppmiVector(docs: DataFrame, vocabSize: Int = 32, window: Int = 2,
                 iters: Int = 6): DataFrame = {
    val d8 = DecimalType(18, 8)
    val toksDf = nonNull(docs)
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "tok")))
    val wIdx = Window.orderBy(col("c").desc, col("tok"))
    val vIdx = toksDf.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .withColumn("i", (row_number().over(wIdx) - 1).cast("long"))
      .localCheckpoint(true)
    // windowed pairs are generated MAP-SIDE from the token array (a
    // per-doc position self-join would square each doc's length before
    // filtering — the wrong shape for long documents at lake scale)
    val co = nonNull(docs).select(toks.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        s"flatten(transform(sequence(0, size(tk) - 2), " +
          s"p -> transform(sequence(1, least($window, size(tk) - 1 - p)), " +
          s"d -> struct(element_at(tk, p + 1) AS ta, " +
          s"element_at(tk, p + 1 + d) AS tb))))")).as("pr"))
      .select(col("pr.ta").as("ta"), col("pr.tb").as("tb"))
      .join(broadcast(vIdx.select(col("tok").as("ta"), col("i").as("ia"))),
        "ta")
      .join(broadcast(vIdx.select(col("tok").as("tb"), col("i").as("ib"))),
        "tb")
      .select(col("ia"), col("ib"))
    val cab = co
      .unionAll(co.select(col("ib").as("ia"), col("ia").as("ib")))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("c"))
    val tot = cab.agg(sum(col("c")).as("t"))
    val ca = cab.groupBy(col("ia")).agg(sum(col("c")).as("ca"))
    val g = cab.join(broadcast(ca), "ia")
      .join(broadcast(ca.select(col("ia").as("ib"), col("ca").as("cb"))),
        "ib")
      .crossJoin(broadcast(tot))
      .select(col("ia").as("i"), col("ib").as("j"),
        greatest(lit(0.0),
          round(log2(col("c").cast("double") * col("t") /
            (col("ca").cast("double") * col("cb"))), 6)).cast(d8).as("g"))
      .localCheckpoint(true) // iterations must never re-touch the corpus
    val dd = vIdx.agg(count(lit(1)).cast("double").as("d"))
    // each step references w exactly ONCE: the squared-norm rides in as
    // an unpartitioned window over the ≤vocab-row frame, so the whole
    // 6-step loop stays one lazy plan — no per-step materialization
    // jobs (the [[graft.operators.AnnOps.pcaPower]] checkpoint-per-step
    // form pays ~2 job roundtrips per iteration; at a 32-row frame the
    // job overhead IS the cost)
    var v = vIdx.select(col("i")).crossJoin(broadcast(dd))
      .select(col("i"), (lit(1.0) / sqrt(col("d"))).cast(d8).as("v"),
        lit(null).cast(d8).as("ss"))
    val wNorm = Window.partitionBy()
    for (_ <- 1 to iters) {
      val w = g.join(broadcast(v.select(col("i").as("j"), col("v"))), "j")
        .select(col("i"),
          (col("g").cast("double") * col("v").cast("double"))
            .cast(d8).as("t"))
        .groupBy(col("i")).agg(sum(col("t")).as("w"))
      v = w.withColumn("ss",
          sum((col("w").cast("double") * col("w").cast("double"))
            .cast(d8)).over(wNorm))
        .select(col("i"),
          (col("w").cast("double") / sqrt(col("ss").cast("double")))
            .cast(d8).as("v"), col("ss"))
    }
    v.join(broadcast(vIdx.select(col("i"), col("tok"), col("c"))), "i")
      .select(col("i").cast("long").as("dim"), col("tok").as("token"),
        col("c").as("n_occurrences"),
        round(col("v"), 6).cast("double").as("loading"),
        round(sqrt(col("ss").cast("double")), 6).as("eigval"))
      .orderBy(col("dim"))
  }

  def ppmiVector(spark: SparkSession, dir: String): DataFrame =
    ppmiVector(Lake.documents(spark, dir))

  /** Segment-level language screen: the doc-level heuristic applied to
    * every `blockWords`-word segment, reported per doc — catches the
    * MIXED-language documents (an English page with embedded other-
    * language blocks, or vice versa) that a whole-doc ratio averages
    * away. A segment is 'en' when its stopword ratio clears the same
    * 0.03 bar, compared in INTEGER space (100·n_stop ≥ 3·len — no
    * double division to disagree across engines). Entirely map-only:
    * the segments are a lambda over block indices, never exploded. */
  def langSegments(docs: DataFrame, blockWords: Int = 16): DataFrame = {
    val b = blockWords
    val stopSet = Stopwords.map(s => s"'$s'").mkString(", ")
    nonNull(docs)
      .select(col("doc_id"), col("lang"), toks.as("tk"))
      .withColumn("n_segments",
        floor((size(col("tk")) + b - 1) / b).cast("long"))
      .withColumn("n_en_segments", expr(
        s"""size(filter(sequence(0, CAST(n_segments AS INT) - 1),
           |  i -> 100 * size(filter(slice(tk, i * $b + 1, $b),
           |         t -> t IN ($stopSet)))
           |       >= 3 * size(slice(tk, i * $b + 1, $b))))"""
          .stripMargin).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_segments"),
        col("n_en_segments"),
        (col("n_segments") - col("n_en_segments")).as("n_und_segments"),
        when(col("n_en_segments") * 2 >= col("n_segments"), "en")
          .otherwise("und").as("lang_pred"),
        (col("n_en_segments") > 0 &&
          col("n_en_segments") < col("n_segments")).as("mixed"))
      .orderBy(col("doc_id"))
  }

  def langSegments(spark: SparkSession, dir: String): DataFrame =
    langSegments(Lake.documents(spark, dir))

  /** Composite quality score in [0,1]: length component (saturating at 100
    * tokens), lexical diversity (type-token ratio), stopword presence.
    * Same arithmetic on the oracle side so doubles round identically. */
  def docQuality(docs: DataFrame): DataFrame =
    nonNull(docs)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        expr(stopFilterSql).cast("long").as("n_stop"))
      .select(
        col("doc_id"), col("n_tokens"),
        // the weighted composite clears to ONE terminating integer
        // ratio (min(100,t)·t + 100·d + 50·min(t,10s))/(250·t) → exact
        // integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos(
          "10000 * (least(100, n_tokens) * n_tokens + 100 * n_distinct" +
            " + 50 * least(n_tokens, 10 * n_stop))",
          "250 * n_tokens").cast("double") / 1e4).as("quality"))
      .withColumn("quality_bucket",
        when(col("quality") >= 0.7, "high")
          .when(col("quality") >= 0.4, "medium")
          .otherwise("low"))
      .orderBy(col("doc_id"))

  def docQuality(spark: SparkSession, dir: String): DataFrame =
    docQuality(Lake.documents(spark, dir))

  /** Per-source multi-feature OLS — the Gram-matrix pattern that makes
    * closed-form model fitting a SINGLE distributed aggregation: fit
    * n_chars ~ b0 + b1·n_tokens + b2·n_distinct per source. All ten Gram
    * sums (n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂, Σx₂², Σx₁y, Σx₂y, Σy²) are
    * EXACT integer sums (map-side combinable; one shuffle of ≤|sources|
    * groups), so the closed-form 3×3 Cramer solve in the final projection
    * consumes identical operands in every engine — coefficients, R², and
    * the normal-equation determinants hash-match an oracle replaying the
    * same expression tree. No iteration, no driver collect, no gradient
    * sync: at 100 TB this is one scan + a |sources|-row reduce, which is
    * why normal-equation fitting beats SGD for low-dimension models on
    * cluster data. Groups needing a well-posed solve are kept by a
    * det ≠ 0 filter (collinear/degenerate sources are reported with null
    * coefficients rather than NaN noise). */
  def olsMulti(docs: DataFrame): DataFrame = {
    val feats = nonNull(docs).select(
      col("source"),
      size(toks).cast("long").as("x1"),
      size(array_distinct(toks)).cast("long").as("x2"),
      col("n_chars").as("y"))
    val sums = feats.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y") * col("y")).as("syy"))
    // every sum enters double space once; minors are shared cofactors of
    // column 0, so det and det0 reuse them verbatim (and so does the SQL)
    val d = sums.select(
      col("source"), col("n"),
      col("n").cast("double").as("dn"),
      col("s1").cast("double").as("d1"), col("s2").cast("double").as("d2"),
      col("sy").cast("double").as("dy"),
      col("s11").cast("double").as("d11"), col("s12").cast("double").as("d12"),
      col("s22").cast("double").as("d22"),
      col("s1y").cast("double").as("d1y"), col("s2y").cast("double").as("d2y"),
      col("syy").cast("double").as("dyy"))
    val m = d.select(col("*"),
      (col("d11") * col("d22") - col("d12") * col("d12")).as("m00"),
      (col("d1") * col("d22") - col("d2") * col("d12")).as("m10"),
      (col("d1") * col("d12") - col("d2") * col("d11")).as("m20"))
    val dets = m.select(col("*"),
      (col("dn") * col("m00") - col("d1") * col("m10") + col("d2") * col("m20")).as("det"),
      (col("dy") * col("m00") - col("d1y") * col("m10") + col("d2y") * col("m20")).as("det0"),
      (-col("dy") * (col("d1") * col("d22") - col("d12") * col("d2"))
        + col("d1y") * (col("dn") * col("d22") - col("d2") * col("d2"))
        - col("d2y") * (col("dn") * col("d12") - col("d2") * col("d1"))).as("det1"),
      (col("dy") * (col("d1") * col("d12") - col("d11") * col("d2"))
        - col("d1y") * (col("dn") * col("d12") - col("d1") * col("d2"))
        + col("d2y") * (col("dn") * col("d11") - col("d1") * col("d1"))).as("det2"))
    val coef = dets.filter(col("det") =!= 0.0).select(
      col("source"), col("n"),
      (col("det0") / col("det")).as("b0"),
      (col("det1") / col("det")).as("b1"),
      (col("det2") / col("det")).as("b2"),
      col("dy"), col("d1y"), col("d2y"), col("dyy"), col("dn"))
    coef.select(
      col("source"), col("n"),
      round(col("b0"), 4).as("b0"),
      round(col("b1"), 4).as("b1"),
      round(col("b2"), 4).as("b2"),
      round(lit(1.0) -
        (col("dyy") - col("b0") * col("dy") - col("b1") * col("d1y")
          - col("b2") * col("d2y")) /
        (col("dyy") - col("dy") * col("dy") / col("dn")), 4).as("r2"))
      .orderBy(col("source"))
  }

  def olsMulti(spark: SparkSession, dir: String): DataFrame =
    olsMulti(Lake.documents(spark, dir))

  /** k-fold cross-validated ridge regression — the model-SELECTION
    * layer the one-shot [[olsMulti]] fit lacks: deterministic folds
    * (doc_id mod k), a λ sweep with the scale-covariant penalty
    * λ·n_train on the feature diagonal (never the intercept), and the
    * held-out MSE read per (λ, fold) plus the per-λ CV mean. ONE corpus
    * pass computes the per-fold Gram matrices (all BIGINT — the
    * features are integer token/char counts); every train Gram is
    * total − fold by exact integer subtraction, the 3×3 ridge solve is
    * the [[olsMulti]] cofactor tree with a11/a22 shifted, and the test
    * SSE is CLOSED FORM from the held-out fold's own Gram
    * (Σ(y−ŷ)² = yᵀy − 2bᵀXᵀy + bᵀXᵀXb) — the corpus is never
    * rescanned, so the whole sweep after the single aggregation runs on
    * a k×|λ| frame. Per-fold MSEs re-enter DECIMAL(18,4) after one
    * round, so the CV mean is an exact decimal sum divided once. */
  def ridgeCv(docs: DataFrame, k: Int = 4,
              lambdas: Seq[Double] = Seq(0.0, 100.0, 10000.0)): DataFrame = {
    val d4 = DecimalType(18, 4)
    val feats = nonNull(docs).select(
      pmod(col("doc_id"), lit(k.toLong)).as("fold"),
      size(toks).cast("long").as("x1"),
      size(array_distinct(toks)).cast("long").as("x2"),
      col("n_chars").as("y"))
    val gf = feats.groupBy(col("fold")).agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y") * col("y")).as("syy"))
    val tot = gf.agg(
      sum(col("n")).as("tn"),
      sum(col("s1")).as("t1"), sum(col("s2")).as("t2"),
      sum(col("sy")).as("ty"),
      sum(col("s11")).as("t11"), sum(col("s12")).as("t12"),
      sum(col("s22")).as("t22"),
      sum(col("s1y")).as("t1y"), sum(col("s2y")).as("t2y"),
      sum(col("syy")).as("tyy"))
    // train Gram = total − fold (exact BIGINT), then doubles once
    val t = gf.crossJoin(broadcast(tot))
      .withColumn("lam", explode(array(lambdas.map(lit(_)): _*)))
      .select(col("lam").as("ridge_lambda"), col("fold"),
        (col("tn") - col("n")).as("n_train"), col("n").as("n_test"),
        (col("tn") - col("n")).cast("double").as("dn"),
        (col("t1") - col("s1")).cast("double").as("d1"),
        (col("t2") - col("s2")).cast("double").as("d2"),
        (col("ty") - col("sy")).cast("double").as("dy"),
        (col("t11") - col("s11")).cast("double").as("d11"),
        (col("t12") - col("s12")).cast("double").as("d12"),
        (col("t22") - col("s22")).cast("double").as("d22"),
        (col("t1y") - col("s1y")).cast("double").as("d1y"),
        (col("t2y") - col("s2y")).cast("double").as("d2y"),
        col("lam"),
        col("n").cast("double").as("hn"),
        col("s1").cast("double").as("h1"), col("s2").cast("double").as("h2"),
        col("sy").cast("double").as("hy"),
        col("s11").cast("double").as("h11"),
        col("s12").cast("double").as("h12"),
        col("s22").cast("double").as("h22"),
        col("s1y").cast("double").as("h1y"),
        col("s2y").cast("double").as("h2y"),
        col("syy").cast("double").as("hyy"))
      .withColumn("a11", col("d11") + col("lam") * col("dn"))
      .withColumn("a22", col("d22") + col("lam") * col("dn"))
    val m = t
      .withColumn("m00", col("a11") * col("a22") - col("d12") * col("d12"))
      .withColumn("m10", col("d1") * col("a22") - col("d2") * col("d12"))
      .withColumn("m20", col("d1") * col("d12") - col("d2") * col("a11"))
    val dets = m
      .withColumn("det", col("dn") * col("m00") - col("d1") * col("m10")
        + col("d2") * col("m20"))
      .withColumn("det0", col("dy") * col("m00") - col("d1y") * col("m10")
        + col("d2y") * col("m20"))
      .withColumn("det1",
        -col("dy") * (col("d1") * col("a22") - col("d12") * col("d2"))
          + col("d1y") * (col("dn") * col("a22") - col("d2") * col("d2"))
          - col("d2y") * (col("dn") * col("d12") - col("d2") * col("d1")))
      .withColumn("det2",
        col("dy") * (col("d1") * col("d12") - col("a11") * col("d2"))
          - col("d1y") * (col("dn") * col("d12") - col("d1") * col("d2"))
          + col("d2y") * (col("dn") * col("a11") - col("d1") * col("d1")))
    val b = dets.filter(col("det") =!= 0.0)
      .withColumn("b0", col("det0") / col("det"))
      .withColumn("b1", col("det1") / col("det"))
      .withColumn("b2", col("det2") / col("det"))
    val scoredFold = b.withColumn("sse",
      col("hyy")
        + col("b0") * col("b0") * col("hn")
        + col("b1") * col("b1") * col("h11")
        + col("b2") * col("b2") * col("h22")
        - lit(2.0) * col("b0") * col("hy")
        - lit(2.0) * col("b1") * col("h1y")
        - lit(2.0) * col("b2") * col("h2y")
        + lit(2.0) * col("b0") * col("b1") * col("h1")
        + lit(2.0) * col("b0") * col("b2") * col("h2")
        + lit(2.0) * col("b1") * col("b2") * col("h12"))
      .withColumn("mse_dec", round(col("sse") / col("hn"), 4).cast(d4))
    val wLam = Window.partitionBy(col("ridge_lambda"))
    // mean over the folds that SURVIVED the det≠0 / non-empty-fold
    // filters — dividing by the literal k would silently average a
    // dropped (lambda, fold) cell as zero
    scoredFold
      // 4-dp decimal fold-mse sum / surviving-fold count → exact
      // integer half-up (the interior per-fold mse stays the identical
      // double tree — its numerator is the Cramer-solve composite)
      .withColumn("m4s",
        (sum(col("mse_dec")).over(wLam) * 10000).cast("long"))
      .withColumn("nfold", count(lit(1)).over(wLam))
      .withColumn("cv_mse",
        ExactRound.halfUpPos("m4s", "nfold").cast("double") / 1e4)
      .select(col("ridge_lambda"), col("fold"),
        col("n_train"), col("n_test"),
        round(col("b0"), 4).as("b0"),
        round(col("b1"), 6).as("b1"),
        round(col("b2"), 6).as("b2"),
        col("mse_dec").cast("double").as("test_mse"),
        col("cv_mse"))
      .orderBy(col("ridge_lambda"), col("fold"))
  }

  def ridgeCv(spark: SparkSession, dir: String): DataFrame =
    ridgeCv(Lake.documents(spark, dir))

  /** Count-min-sketch token counts, every cell VALUE-CHECKED — the
    * bounded-memory counting twin of the HLL NDV sketch (the same
    * "sketches done honestly" standard): d=4 salted portable hashes into
    * w=128 buckets, estimate = min over the d cells, which can only
    * OVER-count (collisions add, never subtract) — the defining CMS
    * guarantee, asserted per token against the exact count riding
    * beside it. Entirely integer arithmetic: nothing to diverge across
    * engines but the hash, which is the portable md5 slice.
    *
    * Scale: token counts partial-aggregate to vocabulary size first,
    * THEN hash into the d×w grid (vocab-bounded work, the grid is 512
    * cells regardless of corpus size); per-partition grids merge by
    * cell-wise sum — the property that makes CMS the streaming/
    * distributed counter. Top-`topK` tokens by exact count reported. */
  def cmsTokenCounts(docs: DataFrame, d: Int = 4, w: Int = 128,
                     topK: Int = 20): DataFrame = {
    val counts = nonNull(docs).select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // feeds the grid AND the probe
    val salts = docs.sparkSession.range(d.toLong)
      .select(col("id").as("salt"))
    val cells = counts.crossJoin(broadcast(salts))
      .select(col("salt"),
        portableHash60(concat(col("salt").cast("string"), lit(":"),
          col("token"))).bitwiseAND(lit((w - 1).toLong)).as("bucket"),
        col("c"))
      .groupBy(col("salt"), col("bucket"))
      .agg(sum(col("c")).as("cell"))
    val probes = counts
      .orderBy(col("c").desc, col("token")).limit(topK)
      .crossJoin(broadcast(salts))
      .select(col("token"), col("c"),
        col("salt"),
        portableHash60(concat(col("salt").cast("string"), lit(":"),
          col("token"))).bitwiseAND(lit((w - 1).toLong)).as("bucket"))
    probes.join(cells, Seq("salt", "bucket"))
      .groupBy(col("token"), col("c"))
      .agg(min(col("cell")).as("est"))
      .select(col("token"), col("c").as("n_exact"), col("est").as("n_cms"),
        (col("est") - col("c")).as("overcount"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  def cmsTokenCounts(spark: SparkSession, dir: String): DataFrame =
    cmsTokenCounts(Lake.documents(spark, dir))

  /** Corpus-level term statistics (the inverted-index summary): per token,
    * document frequency, total term frequency, and smoothed IDF. One
    * explode + one group-by — linear in corpus token count; df/tf partial-
    * aggregate map-side. */
  def termStats(docs: DataFrame): DataFrame = {
    val clean = nonNull(docs)
    // corpus size as a lazy one-row aggregate broadcast into the plan —
    // no eager driver-side count at DataFrame-construction time
    val nDocs = clean.select(count(lit(1)).cast("double").as("__n_docs"))
    clean.select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("token"))
      .agg(
        countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("tf_total"))
      .crossJoin(broadcast(nDocs))
      .withColumn("idf",
        round(log((col("__n_docs") + 1.0) / (col("df") + 1.0)), 4))
      .drop("__n_docs")
      .orderBy(col("token"))
  }

  def termStats(spark: SparkSession, dir: String): DataFrame =
    termStats(Lake.documents(spark, dir))

  /** Subword ("BPE-ish") token counting: a regex lexer splitting into
    * letter runs, digit runs, and single punctuation marks — the cheap
    * stand-in for a real BPE vocabulary when budgeting token counts at
    * corpus scale. Codegen'd regexp_extract_all, pure map stage. */
  def bpeTokenCounts(docs: DataFrame): DataFrame =
    nonNull(docs)
      .select(
        col("doc_id"),
        expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)").as("tk"))
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_subwords"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct_subwords"))
      .orderBy(col("doc_id"))

  def bpeTokenCounts(spark: SparkSession, dir: String): DataFrame =
    bpeTokenCounts(Lake.documents(spark, dir))

  /** REAL byte-pair encoding over the [[graft.functions.BpeVocab]] merge
    * ranks (public GPT-2 merges.txt format): whitespace pre-tokenization,
    * then greedy priority merges per word inside the single
    * [[graft.functions.BpeTokens]] expression — a map-only stage, no
    * shuffle until the final sort. Emits the per-doc token count the
    * chunk/packing/mix planners consume, plus boundary tokens so the
    * oracle checks actual tokenization, not just arithmetic. */
  def bpeTokenize(docs: DataFrame): DataFrame =
    nonNull(docs)
      .withColumn("toks", graft.functions.BpeTokens.tokens(col("text")))
      .withColumn("words", filter(split(col("text"), " "), w => w =!= ""))
      .filter(size(col("words")) > 0)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_bpe_tokens"),
        size(col("words")).cast("long").as("n_words"),
        element_at(col("toks"), 1).as("first_token"),
        element_at(col("toks"), -1).as("last_token"))
      .orderBy(col("doc_id"))

  def bpeTokenize(spark: SparkSession, dir: String): DataFrame =
    bpeTokenize(Lake.documents(spark, dir))

  /** Tokenizer fertility by language: BPE tokens per whitespace word —
    * the standard "how badly does this tokenizer fragment language X"
    * diagnostic that drives per-language compute budgeting. Fertility is
    * computed from per-language INTEGER sums (Σtokens / Σwords, one
    * double division) rather than an average of per-doc ratios: integer
    * sums are aggregation-order-exact on any engine, a mean of doubles
    * is not. Map-only tokenize + one bounded group-by. */
  def bpeFertility(docs: DataFrame): DataFrame =
    bpeTokenize(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
        sum(col("n_words")).as("n_words"))
      .select(col("lang"), col("n_docs"), col("n_bpe_tokens"), col("n_words"),
        round(col("n_bpe_tokens").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"))
      .orderBy(col("lang"))

  def bpeFertility(spark: SparkSession, dir: String): DataFrame =
    bpeFertility(Lake.documents(spark, dir))

  /** BPE merge LEARNING, step one: corpus-wide adjacent character-pair
    * statistics over the word-frequency table — the quantity a BPE trainer
    * maximizes each iteration (the most frequent pair becomes the next
    * merge). Two bounded aggregations: word frequencies (vocabulary-sized,
    * map-side combinable), then pair counts weighted by word frequency
    * (pair space ≤ alphabet², tiny) — the corpus itself is scanned once,
    * never re-tokenized per iteration. Top-K by count with a
    * lexicographic tie-break so the ranking is engine-exact. */
  def bpePairCounts(docs: DataFrame, topK: Int = 20): DataFrame =
    nonNull(docs)
      .select(explode(filter(split(col("text"), " "), w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .filter(length(col("word")) >= 2)
      .select(col("wf"), explode(
        transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("wf")).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(topK)

  def bpePairCounts(spark: SparkSession, dir: String): DataFrame =
    bpePairCounts(Lake.documents(spark, dir))

  /** Full BPE merge-list trainer: aggregate the word-frequency table in
    * Spark (one corpus scan, capped at the top `maxVocab` words — the
    * table is vocabulary-bounded regardless of corpus size, the same
    * bounded-driver-material argument as [[AnnOps.kmeansCentroids]]), then
    * run the classic merge loop driver-side: each iteration fuses the
    * highest-count adjacent symbol pair (ties broken lexicographically, so
    * training is deterministic), until `nMerges` merges or no pair repeats.
    * Returns merges in rank order — the exact format
    * [[graft.functions.BpeVocab]] consumes, so a learned vocabulary drops
    * into the codegen'd [[bpeTokenize]] path unchanged. Iteration one's
    * pair ranking equals [[bpePairCounts]] by construction (asserted in
    * BpeSpec). */
  def bpeLearn(docs: DataFrame, nMerges: Int,
               maxVocab: Int = 65536): IndexedSeq[(String, String)] = {
    require(nMerges > 0, "need at least one merge")
    val wordFreqs = nonNull(docs)
      .select(explode(filter(split(col("text"), " "), w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wf"))
      .orderBy(col("wf").desc, col("word"))
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      wordFreqs.map { case (w, f) => (w.map(String.valueOf(_)).toArray, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && out.length < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, f) <- words; j <- 0 until syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      // a pair occurring once cannot be a merge worth learning
      val best = counts.filter(_._2 >= 2).toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case None => done = true
        case Some(((a, b), _)) =>
          out += ((a, b))
          words = words.map { case (syms, f) =>
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                merged += (a + b); j += 2
              } else { merged += syms(j); j += 1 }
            }
            (merged.toArray, f)
          }
      }
    }
    out.toIndexedSeq
  }

  /** Unigram surprisal scoring — the language-model-proxy quality signal:
    * each doc's mean −ln p(token) under the corpus's own unigram
    * distribution. Rare-word-heavy (or garbled) docs score high, boiler-
    * plate scores low; the standard cheap stand-in for model-based
    * perplexity filtering at corpus scale.
    *
    * Two shuffles, both partial-aggregated: corpus term frequencies
    * (keyed token), then tokens re-keyed by doc for the per-doc mean.
    * Cross-engine determinism: per-token surprisal is rounded to 6
    * decimals and summed as decimal(18,6) — exact and associative, so
    * Spark's unordered partial aggregation and the oracle's sequential
    * sum agree bit-for-bit (raw double sums would not, and ln() itself
    * agrees across engines to ~1 ulp, far inside the rounding). */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    // three consumers (corpus total, per-token counts, the probe join) —
    // persist so the tokenize+explode pass runs once, not per consumer
    // (ReuseExchange is not reliable across these shapes)
    val tokRows = nonNull(docs).select(col("doc_id"), explode(toks).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = tokRows.select(count(lit(1)).cast("double").as("__n_total"))
    val logp = tokRows.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"))
      .crossJoin(broadcast(total))
      .select(col("token"),
        round(-log(col("tf") / col("__n_total")), 6)
          .cast(DecimalType(18, 6)).as("neg_logp"))
    // materialize the per-doc result (O(docs), far smaller than the
    // exploded tokens) and release the corpus-sized cache NOW — repeated
    // calls in a long-lived session must not pile up caches until the
    // ContextCleaner happens to collect them (same discipline as
    // DataLake.cleanCorpus)
    // exact integer half-up for the mean (the bigramSurprisal tie fix —
    // identical shape: 6-dp decimal sum over a small per-doc count, where
    // an exact .00005 quotient is reachable)
    val out = tokRows.join(logp, "token")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("neg_logp")).as("total_surprisal"))
      .withColumn("__s", (col("total_surprisal") * lit(1000000)).cast("long"))
      .select(col("doc_id"), col("n_tokens"),
        (expr("(2 * __s + 100 * n_tokens) div (200 * n_tokens)")
          .cast("double") / 10000.0).as("avg_surprisal"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true)
    tokRows.unpersist(false)
    out
  }

  def unigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    unigramSurprisal(Lake.documents(spark, dir))

  /** Bigram (conditional) surprisal: mean −ln p(wᵢ | wᵢ₋₁) per doc under
    * the corpus bigram model — a sharper LM-proxy quality score than
    * [[unigramSurprisal]] (it penalizes unusual TRANSITIONS, not just
    * rare words; shuffled word salad scores high even when every word is
    * common). p(w₂|w₁) = c(w₁w₂) / Σ_w c(w₁w), both counts from one
    * bigram aggregate. Same determinism routing as the unigram form:
    * per-bigram −ln p rounded then decimal-summed, so the per-doc mean is
    * aggregation-order-independent and oracle-exact. Docs need ≥ 2
    * tokens. Scale: the bigram count table is vocab²-bounded (language
    * bigrams, not corpus rows); the probe join shuffles by bigram key. */
  def bigramSurprisal(docs: DataFrame): DataFrame = {
    // two consumers (bigram counts, the probe join) — persist the exploded
    // bigrams so the corpus is shingled once, same discipline as
    // unigramSurprisal's tokRows
    val withBi = nonNull(docs).filter(size(toks) >= 2)
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), explode(shinglesOf(col("__toks"), 2)).as("bigram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = withBi
      .select(substring_index(col("bigram"), " ", 1).as("w1"), col("bigram"))
      .groupBy(col("w1"), col("bigram")).agg(count(lit(1)).as("bc"))
    val prefix = counts.groupBy(col("w1")).agg(sum(col("bc")).as("pc"))
    val logp = counts.join(prefix, "w1")
      .select(col("bigram"),
        round(-log(col("bc") / col("pc")), 6)
          .cast(DecimalType(18, 6)).as("neg_logp"))
    // materialize + release, mirroring unigramSurprisal
    // The mean is rounded to 4 decimals by EXACT integer half-up, not by
    // round(double): with S = total·10⁶ (an exact long — total carries 6
    // decimals) and n bigrams, round_half_up(S/(10⁶n)·10⁴) =
    // (2S + 100n) div (200n) for S,n ≥ 0. A perfect decimal tie (doc 677
    // at sf0.1: exact quotient 3.406350) lands 1 ulp BELOW .00005 as a
    // double, where DuckDB's multiply-then-round said 3.4064 and Spark's
    // BigDecimal half-up said 3.4063 — integer arithmetic sidesteps the
    // double entirely and both engines agree at every scale.
    val out = withBi.join(logp, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("neg_logp")).as("total"))
      .withColumn("__s", (col("total") * lit(1000000)).cast("long"))
      .select(col("doc_id"), col("n_bigrams"),
        (expr("(2 * __s + 100 * n_bigrams) div (200 * n_bigrams)")
          .cast("double") / 10000.0).as("avg_surprisal"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true)
    withBi.unpersist(false)
    out
  }

  def bigramSurprisal(spark: SparkSession, dir: String): DataFrame =
    bigramSurprisal(Lake.documents(spark, dir))

  /** HELD-OUT unigram perplexity scoring — the CCNet-style LM quality
    * filter done honestly: the model trains on the REF slice only and
    * scores the CUR slice, so a doc's own tokens never inflate its own
    * probabilities (the leakage [[unigramSurprisal]] accepts by design
    * as a whole-corpus signal). Laplace smoothing p̂ = (c+1)/(N+V) keeps
    * unseen tokens finite at the 1/(N+V) floor; `n_oov` (tokens unseen
    * in REF) rides along as the exact-integer novelty signal.
    *
    * Emits mean −ln p̂ per doc (monotone in perplexity; the exp is left
    * to the caller — composing exp(round(…)) would stack float rounding
    * across engines for zero information). Same determinism routing as
    * the surprisal family: per-token −ln p̂ rounded to 6 dp, decimal-
    * summed. Scale: REF counts are vocab-bounded; the probe join keys
    * by token; one one-row (N,V) broadcast. */
  def heldoutPerplexity(docs: DataFrame, refSlice: Column,
                        curSlice: Column): DataFrame = {
    val tokRows = nonNull(docs).filter(refSlice || curSlice)
      .select(col("doc_id"), when(refSlice, 1).otherwise(0).as("is_ref"),
        explode(toks).as("token"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val refCounts = tokRows.filter(col("is_ref") === 1)
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val stats = refCounts.agg(sum(col("c")).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__v"))
    val out = tokRows.filter(col("is_ref") === 0)
      .join(refCounts, Seq("token"), "left")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        when(col("c").isNull, 1L).otherwise(0L).as("oov"),
        round(-log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
          (col("__n") + col("__v"))), 6)
          .cast(DecimalType(18, 6)).as("neg_logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("oov")).as("n_oov"),
        sum(col("neg_logp")).as("total"))
      // exact integer half-up mean (the surprisal-family tie fix)
      .withColumn("__s", (col("total") * lit(1000000)).cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (expr("(2 * __s + 100 * n_tokens) div (200 * n_tokens)")
          .cast("double") / 10000.0).as("avg_neg_logp"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true) // materialize + release (surprisal discipline)
    tokRows.unpersist(false)
    out
  }

  /** Lake-bound registered form: REF = even doc_ids train the model,
    * odd doc_ids are scored — the deterministic stand-in for
    * "reference corpus scores the incoming crawl". */
  def heldoutPerplexity(spark: SparkSession, dir: String): DataFrame =
    heldoutPerplexity(Lake.documents(spark, dir),
      pmod(col("doc_id"), lit(2)) === 0, pmod(col("doc_id"), lit(2)) === 1)

  /** Zipf fit over the corpus unigram distribution — the corpus-health
    * diagnostic tokenizer and mixing work starts from: natural language
    * follows freq ∝ rank^slope with slope ≈ −1; a far-off slope flags
    * TEMPLATE/BOILERPLATE corpora (too steep) or ID/hash soup (too
    * flat). Least-squares on (ln rank, ln freq) over the top `fitTerms`
    * terms — the head is where Zipf holds and fitting it keeps the rank
    * window BOUNDED (the full vocab rank would be an unbounded global
    * sort at web scale; the top-K cut is TakeOrdered).
    *
    * Determinism: each ln() is rounded to 6 decimals and summed as
    * decimal (exact + associative — the surprisal discipline), so the
    * slope's closed form divides identical numbers in any engine. */
  def zipfFit(docs: DataFrame, fitTerms: Int = 1000): DataFrame =
    zipfFit(docs, fitTerms, materialize = true)

  /** `materialize = true` (the public path): persist the vocab-sized
    * frequency table so the explode+group pass runs once for its two
    * consumers (corpus totals, the top-K fit), then localCheckpoint the
    * one-row fit and release the cache immediately (surprisal
    * discipline). `materialize = false` is for plan inspection only —
    * PlanShapeSpec asserts the TakeOrdered head cut, which a checkpoint
    * would hide. */
  private[graft] def zipfFit(docs: DataFrame, fitTerms: Int,
                             materialize: Boolean): DataFrame = {
    val freqsBase = nonNull(docs)
      .select(explode(toks).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val freqs = if (materialize)
      freqsBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else freqsBase
    val corpus = freqs.agg(
      count(lit(1)).as("vocab_size"),
      sum(col("freq")).as("total_tokens"))
    val top = freqs.orderBy(col("freq").desc, col("token")).limit(fitTerms)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("freq").desc, col("token"))))
    val x = round(log(col("rank").cast("double")), 6).cast(DecimalType(18, 6))
    val y = round(log(col("freq").cast("double")), 6).cast(DecimalType(18, 6))
    val fit = top.select(
        x.as("x"), y.as("y"), (x * y).as("xy"), (x * x).as("xx"))
      .agg(count(lit(1)).as("n_fit"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("xy")).as("sxy"),
        sum(col("xx")).as("sxx"))
    val n = col("n_fit").cast("double")
    val slope = (n * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) /
      (n * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    val out = fit.crossJoin(broadcast(corpus))
      .filter(col("n_fit") > 0) // empty corpus → no fit row, not a null row
      .select(col("n_fit"), col("vocab_size"), col("total_tokens"),
        round(slope, 4).as("zipf_slope"),
        round((col("sy").cast("double") - slope * col("sx").cast("double")) / n, 4)
          .as("zipf_intercept"))
    if (materialize) {
      val cp = out.localCheckpoint(true)
      freqs.unpersist(false)
      cp
    } else out
  }

  def zipfFit(spark: SparkSession, dir: String): DataFrame =
    zipfFit(Lake.documents(spark, dir))

  /** Cross-document boilerplate n-grams: the `topK` word n-grams ranked by
    * DOCUMENT frequency (each doc counts an n-gram once — repetition
    * inside one doc is that doc's problem, boilerplate is what repeats
    * ACROSS docs: headers, footers, license blurbs, nav text). The
    * RefinedWeb/CCNet-style detection pass feeding [[scrubBoilerplate]].
    * One explode + one shuffle on the n-gram key (map-side combinable);
    * (df desc, ngram asc) ordering makes the top-K cut deterministic. */
  def boilerplateNgrams(docs: DataFrame, n: Int = 3, topK: Int = 10,
                        minDf: Int = 2): DataFrame =
    nonNull(docs).filter(size(toks) >= n)
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"),
        explode(array_distinct(shinglesOf(col("__toks"), n))).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("ngram"))
      .limit(topK)

  def boilerplateNgrams(spark: SparkSession, dir: String): DataFrame =
    boilerplateNgrams(Lake.documents(spark, dir))

  /** Per-doc boilerplate load against the [[boilerplateNgrams]] top-K
    * list: occurrence count and covered-token share (`n·occ / n_tokens` —
    * an upper bound when occurrences overlap, which is what a filter
    * threshold wants). The bounded top-K list broadcasts; the corpus
    * passes once, map-side. */
  def boilerplateDensity(docs: DataFrame, n: Int = 3, topK: Int = 10,
                         minDf: Int = 2): DataFrame = {
    val bp = boilerplateNgrams(docs, n, topK, minDf).select(col("ngram"))
    val base = nonNull(docs).filter(size(toks) >= n)
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
    val occ = nonNull(docs).filter(size(toks) >= n)
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), explode(shinglesOf(col("__toks"), n)).as("ngram"))
      .join(broadcast(bp), "ngram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("occ"))
    base.join(occ, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("occ"), lit(0L)).as("n_boilerplate"),
        // count ratio → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos(s"10000 * coalesce(occ, 0) * $n",
          "n_tokens").cast("double") / 1e4).as("bp_density"))
      .orderBy(col("doc_id"))
  }

  def boilerplateDensity(spark: SparkSession, dir: String): DataFrame =
    boilerplateDensity(Lake.documents(spark, dir))

  /** Remove every occurrence of the given phrases from each doc (word-
    * boundary anchored, applied in list order), then collapse the spacing
    * — the rewrite stage downstream of [[boilerplateNgrams]]. Pure map
    * stage; phrases are regex-escaped so any literal n-gram is safe. */
  def scrubBoilerplate(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    val scrubbed = phrases.foldLeft(col("text")) { (c, p) =>
      regexp_replace(c, "\\b" + java.util.regex.Pattern.quote(p) + "\\b", "")
    }
    nonNull(docs).withColumn("text",
      trim(regexp_replace(scrubbed, " {2,}", " ")))
  }

  /** BM25 keyword retrieval — the sparse complement to the dense ANN
    * operators (AnnOps): rank documents for a bag-of-words query by
    * Okapi BM25 with the Lucene idf form,
    * `idf = ln(1 + (N − df + 0.5)/(df + 0.5))`,
    * `tf_norm = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`.
    *
    * Scale shape: tokens are filtered to the query terms BEFORE the
    * shuffle, so only matching (doc, term) rows leave the map stage —
    * the aggregate state is O(matching docs × query terms), never
    * O(corpus tokens). df comes from that same tiny frame; N and avgdl
    * are a one-row broadcast aggregate. Top-k is a bounded
    * TakeOrderedAndProject.
    *
    * Determinism: per-(doc,term) score is a pure scalar of longs and two
    * corpus doubles, rounded to 6 decimals and decimal-summed across
    * query terms (order-independent, oracle-exact); ties broken by
    * doc_id. */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val clean = nonNull(docs)
    val dl = clean.select(col("doc_id"), size(toks).cast("long").as("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("__n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val tf = clean.select(col("doc_id"), explode(toks).as("token"))
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(df, "token").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(log(lit(1.0) + (col("__n") - col("df") + 0.5) / (col("df") + 0.5)) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl"))),
          6).cast(DecimalType(18, 6)).as("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("s")).as("total"))
      .select(col("doc_id"), col("n_terms_hit"),
        round(col("total"), 4).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(Lake.documents(spark, dir), Bm25Query)

  /** Fixed query for the driver entry — common corpus words with spread
    * document frequencies, so idf actually differentiates. */
  val Bm25Query: Seq[String] = Seq("spark", "hash", "join")

  /** Hybrid (sparse + dense) retrieval with reciprocal-rank fusion — the
    * RAG-pipeline shape that combines [[bm25TopK]]'s keyword leg with a
    * dense cosine leg over the aligned embedding table (vec_id ≡ doc_id):
    * `rrf = Σ_legs 1/(rrfK + rank)`, missing-leg contribution 0.
    *
    * Scale shape: each leg produces a bounded pool (top `poolK` via
    * TakeOrderedAndProject — per-partition heaps, never a global sort);
    * the fusion itself (full-outer join + rank windows) runs on ≤2·poolK
    * rows, driver-safe at any corpus size. The dense leg broadcasts the
    * one query vector against the corpus scan — one pass, no shuffle
    * before the top-k heap.
    *
    * Determinism: both legs' ranks are row_numbers with doc-id
    * tie-breaks; RRF terms are pure doubles of small-integer ranks —
    * bit-identical in any engine. */
  def hybridRetrieval(docs: DataFrame, emb: DataFrame,
                      queryTerms: Seq[String], queryVecId: Long = 0L,
                      k: Int = 10, poolK: Int = 20, rrfK: Int = 60): DataFrame = {
    import graft.functions.VectorFunctions.cosineSimilarity
    // bounded pools: windows below run on <= poolK rows (post-limit)
    val sparse = bm25TopK(docs, queryTerms, poolK)
      .select(col("doc_id"), col("score"))
      .withColumn("r_sparse",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("r_sparse"))
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    val dense = emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        cosineSimilarity(col("embedding"), col("q_emb")).as("sim"))
      .orderBy(col("sim").desc, col("doc_id")).limit(poolK)
      .withColumn("r_dense",
        row_number().over(Window.orderBy(col("sim").desc, col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("r_dense"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_sparse"), col("r_dense"),
        round(
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("r_sparse")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("r_dense")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  def hybridRetrieval(spark: SparkSession, dir: String): DataFrame =
    hybridRetrieval(Lake.documents(spark, dir), Lake.embeddings(spark, dir),
      Bm25Query)

  /** Maximal-marginal-relevance re-rank of a dense retrieval pool — the
    * diversification step a RAG context builder runs AFTER retrieval:
    * top-k by raw similarity returns near-duplicates of the same
    * passage; MMR greedily picks argmax λ·rel(d) − (1−λ)·max_{s∈S}
    * sim(d, s), so each added doc must be relevant AND novel against
    * what's already selected.
    *
    * Scale shape: the expensive work (corpus → top-`poolK` pool) is one
    * broadcast-query scan + TakeOrdered; the greedy loop then runs
    * in-plan over POOL-sized frames only (a poolK² pairwise sim matrix,
    * k tiny join-argmax steps, each selected frame localCheckpointed to
    * keep lineage linear). Deterministic: cosines are ordered array
    * folds, ranking ties break by doc id, so DuckDB replays the greedy
    * selection CTE for CTE. */
  def mmrRerank(emb: DataFrame, queryVecId: Long = 0L, k: Int = 5,
                poolK: Int = 20, lambda: Double = 0.7): DataFrame = {
    import graft.functions.VectorFunctions.cosineSimilarity
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    val pool = emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"), col("embedding"),
        cosineSimilarity(col("embedding"), col("q_emb")).as("rel"))
      .orderBy(col("rel").desc, col("doc_id")).limit(poolK)
      .localCheckpoint(true)
    val sims = pool.select(col("doc_id").as("a"), col("embedding").as("ea"))
      .crossJoin(pool.select(col("doc_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"),
        cosineSimilarity(col("ea"), col("eb")).as("sim"))
      .localCheckpoint(true)
    val cand0 = pool.select(col("doc_id"), col("rel"))
    var sel = cand0
      .orderBy(col("rel").desc, col("doc_id")).limit(1)
      .select(lit(1L).as("rank"), col("doc_id"), col("rel"),
        lit(0.0).as("maxsim"), (lit(lambda) * col("rel")).as("mmr"))
      .localCheckpoint(true)
    for (t <- 2 to k) {
      val next = cand0
        .join(sel.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .join(sims.join(sel.select(col("doc_id").as("b")), "b")
          .select(col("a").as("doc_id"), col("sim")), "doc_id")
        .groupBy(col("doc_id"), col("rel"))
        .agg(max(col("sim")).as("maxsim"))
        .select(lit(t.toLong).as("rank"), col("doc_id"), col("rel"),
          col("maxsim"),
          (lit(lambda) * col("rel") -
            lit(1.0 - lambda) * col("maxsim")).as("mmr"))
        .orderBy(col("mmr").desc, col("doc_id")).limit(1)
      sel = sel.unionAll(next).localCheckpoint(true)
    }
    sel.select(col("rank"), col("doc_id"),
        round(col("rel"), 4).as("rel"), round(col("maxsim"), 4).as("maxsim"),
        round(col("mmr"), 4).as("mmr"))
      .orderBy(col("rank"))
  }

  def mmrRerank(spark: SparkSession, dir: String): DataFrame =
    mmrRerank(Lake.embeddings(spark, dir))

  /** Per-doc character-level Shannon entropy (nats) — the
    * distribution-shape quality signal beside the Deflate
    * compression-ratio screen: machine-generated / repetitive text sits
    * low, natural prose high, base64/hex blobs near the uniform ceiling.
    *
    * One explode of text into characters, one (doc, char) count shuffle
    * (partial-aggregated map-side), then per-class terms
    * `−p·ln p` rounded to 6 decimals and DECIMAL-summed (the surprisal
    * discipline: per-term rounding absorbs libm ulp variance, decimal
    * addition is order-free) with one final 4-decimal round. */
  def charEntropy(docs: DataFrame): DataFrame = {
    val counts = nonNull(docs)
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      // Java-regex split keeps a trailing "" the oracle's splitter never
      // emits; drop zero-width classes so both engines count len(text)
      .filter(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy(col("doc_id"))))
      .select(col("doc_id"), col("total"),
        round(-(col("cnt").cast("double") / col("total")) *
          log(col("cnt").cast("double") / col("total")), 6)
          .cast(DecimalType(18, 6)).as("term"))
      .groupBy(col("doc_id"))
      .agg(max(col("total")).as("n_chars"),
        count(lit(1)).as("n_classes"),
        // the decimal sum is exact — emit it as-is; a final lossy round
        // would reintroduce engine-specific double-rounding at exact .5
        // boundaries (observed: 2.706450 → 2.7064 vs 2.7065)
        sum(col("term")).cast("double").as("entropy"))
      .orderBy(col("doc_id"))
  }

  def charEntropy(spark: SparkSession, dir: String): DataFrame =
    charEntropy(Lake.documents(spark, dir))

  /** Rule-based quality filter (C4/Gopher-style): per doc, the repetition
    * and length metrics those pipelines gate on, plus the combined `keep`
    * verdict. Emitted metrics are the ones that vary on real text —
    * length, top-token concentration, duplicate-trigram ratio; symbol /
    * digit ratio gates are parameters too (`maxSymbolRatio`,
    * `maxDigitRatio`) for corpora that need them.
    *
    * Shape at scale: trigram metrics are a pure map stage; the top-token
    * count shuffles per-doc DISTINCT tokens once, partial-aggregated
    * map-side — never the raw token stream. All ratios are exact integer
    * divisions (bit-identical across engines, so the booleans are
    * oracle-stable). */
  def qualityRules(docs: DataFrame,
                   minTokens: Int = 25, maxTokens: Int = 10000,
                   maxTopTokenRatio: Double = 0.12,
                   maxDupTrigramRatio: Double = 0.02,
                   maxSymbolRatio: Double = 1.0,
                   maxDigitRatio: Double = 1.0): DataFrame = {
    val clean = nonNull(docs)
    val topTok = clean
      .select(col("doc_id"), explode(toks).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id")).agg(max(col("cnt")).as("top_cnt"))
    // token array then the gram array each materialized ONCE per row —
    // the gram transform is referenced twice (distinct size / raw size)
    val metrics = clean
      .select(col("doc_id"), col("text"), toks.as("__toks"))
      .select(col("doc_id"), col("text"), col("__toks"),
        shinglesOf(col("__toks"), 3).as("__grams"))
      .select(
      col("doc_id"),
      size(col("__toks")).cast("long").as("n_tokens"),
      size(col("__grams")).cast("long").as("ng"),
      size(array_distinct(col("__grams"))).cast("long").as("nd"),
      when(size(col("__toks")) >= 3,
        lit(1.0) - size(array_distinct(col("__grams"))).cast("double") /
          size(col("__grams")))
        .otherwise(lit(0.0)).as("dup3"),
      (length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
        length(col("text"))).as("symbol_ratio"),
      (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
        length(col("text"))).as("digit_ratio"))
    metrics.join(topTok, "doc_id")
      .withColumn("top_ratio", col("top_cnt").cast("double") / col("n_tokens"))
      // the two ROUNDED report columns are count ratios → exact integer
      // half-up; the keep compares stay on the unrounded doubles
      // (identical scalar tree on both engines)
      .select(
        col("doc_id"),
        col("n_tokens"),
        (ExactRound.halfUpPos("10000 * top_cnt", "n_tokens")
          .cast("double") / 1e4).as("top_token_ratio"),
        when(col("n_tokens") >= 3,
          ExactRound.halfUpPos("10000 * (ng - nd)", "ng")
            .cast("double") / 1e4)
          .otherwise(lit(0.0)).as("dup_trigram_ratio"),
        (col("n_tokens").between(minTokens, maxTokens) &&
         col("top_ratio") <= maxTopTokenRatio &&
         col("dup3") <= maxDupTrigramRatio &&
         col("symbol_ratio") <= maxSymbolRatio &&
         col("digit_ratio") <= maxDigitRatio).as("keep"))
      .orderBy(col("doc_id"))
  }

  def qualityRules(spark: SparkSession, dir: String): DataFrame =
    qualityRules(Lake.documents(spark, dir))

  /** Quality-threshold calibration sweep: for every 0.05 score step, how
    * much of the corpus a `quality ≥ t` filter would keep — the curve a
    * curator reads to PICK the threshold, rather than guessing one.
    * EXACTLY ONE corpus pass: the scoring pipeline aggregates straight
    * into a ≤21-row bucket histogram, and BOTH the reverse-cumulative
    * keep count and the corpus total are windows over that bounded frame
    * (the tiny frame is the window's partition, not the corpus — the
    * total is `sum(n_docs)` over all ≤21 rows, never a second
    * `count()` through the scorer; that double scan benched 6.9 s and
    * is regression-guarded in PlanShapeSpec). Scores are already rounded
    * to 4 decimals, so floor(score·20) buckets identically on any
    * engine. */
  def qualitySweep(docs: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wCum = W.orderBy(col("bucket").desc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val wAll = W.orderBy(col("bucket").desc)
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    docQuality(docs)
      .select(floor(col("quality") * 20).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
      .withColumn("n_kept", sum(col("n_docs")).over(wCum))
      .withColumn("__total", sum(col("n_docs")).over(wAll))
      .select(round(col("bucket") / 20.0, 2).as("threshold"),
        col("n_docs"), col("n_kept"),
        // count/count → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * n_kept", "__total")
          .cast("double") / 1e4).as("keep_rate"))
      .orderBy(col("threshold"))
  }

  def qualitySweep(spark: SparkSession, dir: String): DataFrame =
    qualitySweep(Lake.documents(spark, dir))

  /** Word n-gram shingles over an already-materialized token-array COLUMN
    * (used by dedup, fingerprinting, boilerplate, surprisal). Docs shorter
    * than `n` tokens shingle to the whole text (`concat_ws` over the tokens
    * reconstructs it exactly under split-on-space, empties included).
    *
    * The lambda must close over an ATTRIBUTE, not an expression: an earlier
    * form inlined `split(text)` into the transform body, which re-evaluates
    * the split once PER SHINGLE — O(tokens²) per doc, measured 3× slower
    * across every shingle consumer at sf0.1. Callers therefore project the
    * token array in a separate select first (Catalyst keeps the projection:
    * CollapseProject never inlines a non-trivial alias referenced more than
    * once). */
  /** 60-bit portable digest: the first 15 hex chars of md5 as a long.
    * md5 is bit-identical in every engine (unlike xxhash64, which has no
    * DuckDB twin), and 60 bits keeps every downstream shift/mask inside a
    * signed 64-bit integer in any SQL dialect — which is what makes
    * [[fingerprint]] and [[DedupOps.simhash]] oracle-verifiable.
    * Spark: conv(substr(md5(s),1,15),16,10); DuckDB:
    * ('0x' || substr(md5(s),1,15))::BIGINT — same value by construction. */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def shinglesOf(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", tokens)))

  /** Document fingerprint: min-sampled 60-bit hash over word-3-gram shingles
    * (winnowing-style representative hash). Deterministic — same text, same
    * fingerprint — and near-duplicate docs collide with high probability
    * (asserted in TextOpsSpec). Hashes via [[portableHash60]] (md5 slice),
    * so the DuckDB oracle reproduces every value exactly. */
  def fingerprint(docs: DataFrame): DataFrame =
    nonNull(docs)
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), shinglesOf(col("__toks"), 3).as("sh"))
      .select(
        col("doc_id"),
        array_min(transform(col("sh"), s => portableHash60(s))).as("fingerprint"),
        size(col("sh")).cast("long").as("n_shingles"))
      .orderBy(col("doc_id"))

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    fingerprint(Lake.documents(spark, dir))

  /** Within-document repetition profile (the Gopher-style repetition
    * signals): for each n in `ns`, the fraction of the doc's n-grams
    * claimed by its single most frequent n-gram (`top_frac` — catches
    * "the same phrase over and over") and the fraction belonging to any
    * n-gram that occurs more than once (`dup_frac` — catches diffuse
    * internal repetition). Long-form output (doc_id, n, ...) so the gram
    * sizes stay one query. The whole profile is two aggregations over the
    * exploded shingles — per-doc gram counts, then per-(doc, n) stats —
    * both map-side-combinable; nothing is held per doc beyond the bounded
    * stats row. Docs shorter than an n contribute no row for that n
    * (no grams to profile, mirroring [[shinglesOf]]'s degenerate case). */
  def repetitionProfile(docs: DataFrame, ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 2), "gram sizes must be >= 2")
    val tagged = nonNull(docs)
      .select(col("doc_id"), toks.as("__toks"))
      .select(col("doc_id"), explode(concat(ns.map(n =>
        when(size(col("__toks")) >= n,
          transform(shinglesOf(col("__toks"), n),
            g => struct(lit(n).as("n"), g.as("gram"))))
          .otherwise(array().cast("array<struct<n:int,gram:string>>"))): _*))
        .as("tg"))
      .select(col("doc_id"), col("tg.n").as("n"), col("tg.gram").as("gram"))
    tagged.groupBy(col("doc_id"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(col("c")).as("n_grams"),
        max(col("c")).as("top_c"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_c"))
      .select(col("doc_id"), col("n").cast("long").as("n"),
        col("n_grams").cast("long").as("n_grams"),
        // count ratios → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * top_c", "n_grams")
          .cast("double") / 1e4).as("top_frac"),
        (ExactRound.halfUpPos("10000 * dup_c", "n_grams")
          .cast("double") / 1e4).as("dup_frac"))
      .orderBy(col("doc_id"), col("n"))
  }

  def repetitionProfile(spark: SparkSession, dir: String): DataFrame =
    repetitionProfile(Lake.documents(spark, dir))

  /** Feature-hashing text embedder (the hashing trick): each token lands
    * in bucket `hash % dim` with a ±1 sign from the next hash bit (the
    * standard bias-reduction), per-doc bucket sums are L2-normalized —
    * a deterministic, model-free text vectorizer whose output feeds the
    * ENTIRE ANN/dedup stack ([[graft.operators.AnnOps]] brute-force /
    * LSH / kNN, embedding near-dup) directly. Hashes via
    * [[portableHash60]], integral sums, one sqrt — engine- and
    * oracle-exact. Long form (doc_id, dim, component) over TOUCHED
    * buckets; [[hashEmbed]] densifies to the (vec_id, embedding) shape.
    * One explode + two map-side-combinable aggregates; a doc whose signs
    * fully cancel (norm 0) emits null components rather than a fake
    * direction. */
  def hashEmbedLong(docs: DataFrame, dim: Int = 16): DataFrame = {
    require(dim > 0, "dim must be positive")
    val s = nonNull(docs)
      .select(col("doc_id"), explode(toks).as("token"))
      .select(col("doc_id"), portableHash60(col("token")).as("__h"))
      // integer div/mod on the long hash — Column./ would go through
      // doubles and scramble the low bits at 2^60 magnitudes
      .select(col("doc_id"), (col("__h") % dim).cast("int").as("dim"),
        when(expr(s"(__h div $dim) % 2") === 0, lit(1L))
          .otherwise(lit(-1L)).as("sgn"))
      .groupBy(col("doc_id"), col("dim"))
      .agg(sum(col("sgn")).as("v"))
    val n = s.groupBy(col("doc_id"))
      .agg(sqrt(sum(col("v").cast("double") * col("v"))).as("nrm"))
    s.join(n, "doc_id")
      .select(col("doc_id"), col("dim").cast("long").as("dim"),
        when(col("nrm") === 0d, lit(null))
          .otherwise(round(col("v") / col("nrm"), 4)).as("component"))
      .orderBy(col("doc_id"), col("dim"))
  }

  def hashEmbedLong(spark: SparkSession, dir: String): DataFrame =
    hashEmbedLong(Lake.documents(spark, dir))

  /** Dense (vec_id, embedding array&lt;float&gt;) form of [[hashEmbedLong]]
    * — drop-in input for every ANN operator (untouched buckets are 0). */
  def hashEmbed(docs: DataFrame, dim: Int = 16): DataFrame =
    hashEmbedLong(docs, dim)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(
        struct(col("dim").cast("int"), col("component")))).as("m"))
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i), lit(0d)).cast("float"))
          .as("embedding"))

  /** ExactSubstr-style duplicated-span coverage (the "dedupe repeated
    * passages, not just whole documents" screen): every word-`n`-gram
    * occurrence that is NOT the globally first occurrence of that gram
    * marks its `n` token positions as duplicated; per doc, the distinct
    * covered positions over the token count is the duplicated-text
    * fraction. Whole-doc exact dedup misses a copied paragraph inside an
    * otherwise-unique page — this is the operator that sees it.
    *
    * Scale shape: one shuffle keyed by the 60-bit gram hash (high
    * cardinality, no hot key wider than a boilerplate gram's occurrence
    * list), first-occurrence via row_number — a window, not a self-join —
    * then the coverage explode is a bounded ×n fan-out of only the
    * DUPLICATE rows, counted distinct per doc. Docs shorter than `n`
    * tokens have no spans (whole-doc dedup owns that regime). Hash is
    * [[portableHash60]], so the oracle reproduces every value. */
  def duplicatedSpans(docs: DataFrame, n: Int = 10): DataFrame = {
    val base = nonNull(docs)
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"))
    val sh = nonNull(docs)
      .select(col("doc_id"), toks.as("__toks"))
      .filter(size(col("__toks")) >= n)
      .select(col("doc_id"),
        posexplode(shinglesOf(col("__toks"), n)).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), portableHash60(col("s")).as("h"))
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("pos"))
    val covered = sh
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("tpos"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("tpos")).as("dup_tokens"))
    base.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        // count ratio → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * coalesce(dup_tokens, 0)",
          "n_tokens").cast("double") / 1e4).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  def duplicatedSpans(spark: SparkSession, dir: String): DataFrame =
    duplicatedSpans(Lake.documents(spark, dir))

  /** Per-source (domain-level) quality release gate: aggregate the
    * [[qualityRules]] per-doc keep verdicts by `source` and gate each
    * source on the WILSON LOWER BOUND of its keep rate (z = 1.96) —
    * the small-sample-honest statistic for "drop this domain wholesale":
    * a 2-doc source at 50% observed keep is not evidence of anything,
    * and the raw rate would claim it is. Closed-form doubles from exact
    * integer counts, so engine-exact; one extra map-side-combinable
    * aggregate over the per-doc frame. */
  def domainQuality(docs: DataFrame, minRate: Double = 0.5): DataFrame = {
    val z2 = 1.96 * 1.96
    val perDoc = qualityRules(docs)
      .select(col("doc_id"), col("keep"))
      .join(nonNull(docs).select(col("doc_id"), col("source")), "doc_id")
    val agg = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
    val p = col("n_keep").cast("double") / col("n_docs")
    val nn = col("n_docs").cast("double")
    // every product of small integers is exact in doubles, so the only
    // order that matters vs the oracle is the additions/divisions — kept
    // term-for-term identical
    val wilsonLo = (p + lit(z2) / (lit(2.0) * nn) -
      lit(1.96) * sqrt(p * (lit(1.0) - p) / nn +
        lit(z2) / (lit(4.0) * nn * nn))) /
      (lit(1.0) + lit(z2) / nn)
    agg.select(col("source"), col("n_docs"), col("n_keep"),
        // count/count → exact integer half-up; wilson_lo stays in
        // double (√-bearing, identical scalar tree both engines)
        (ExactRound.halfUpPos("10000 * n_keep", "n_docs")
          .cast("double") / 1e4).as("keep_rate"),
        round(wilsonLo, 4).as("wilson_lo"),
        (wilsonLo >= minRate).as("source_kept"))
      .orderBy(col("source"))
  }

  def domainQuality(spark: SparkSession, dir: String): DataFrame =
    domainQuality(Lake.documents(spark, dir))

  /** Cross-source overlap matrix: for every pair of sources, the exact
    * Jaccard similarity of their word-`n`-gram shingle VOCABULARIES —
    * the "how much does crawl A repeat crawl B" curation question asked
    * before mixing sources. Emits only intersecting pairs (a pair with
    * zero common shingles has nothing to report).
    *
    * Scale shape: NO self-join — (source, shingle) pairs deduplicate on
    * one shuffle, then shingles group to their bounded source list
    * (≤ |sources|) and pairs fan out as C(sources_per_shingle, 2), so
    * even a boilerplate shingle present everywhere costs C(|sources|,2)
    * rows, never corpus². Shingles stay strings for oracle exactness; at
    * 100 TB swap in [[portableHash60]] for the group key (same plan, 8-
    * byte key). Per-source sizes are a broadcast-sized dimension. */
  def sourceOverlap(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = nonNull(docs)
      .select(col("source"), toks.as("__toks"))
      .select(col("source"),
        explode(array_distinct(shinglesOf(col("__toks"), n))).as("s"))
      .distinct()
    val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val pairs = sh.groupBy(col("s"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(expr(
        """explode(flatten(transform(srcs, (x, i) ->
          |  transform(slice(srcs, i + 2, size(srcs)),
          |    y -> struct(x AS source_a, y AS source_b)))))""".stripMargin)
        .as("p"))
      .select(col("p.source_a"), col("p.source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(broadcast(sizes.select(col("source").as("source_a"),
        col("sz").as("sza"))), "source_a")
      .join(broadcast(sizes.select(col("source").as("source_b"),
        col("sz").as("szb"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_common"),
        round(col("n_common") / (col("sza") + col("szb") - col("n_common")), 4)
          .as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlap(Lake.documents(spark, dir))

  /** C4-style text normalization: lowercase, strip punctuation to spaces,
    * collapse whitespace runs, trim — the canonical form exact-dedup and
    * n-gram ops should see (e.g. "Hello, World!" and "hello world" are
    * the same document for dedup purposes). One codegen'd map stage.
    * Normalization HALVES then FEEDS the pipeline: `dedupExact(normalize
    * (docs))` catches case/punctuation variants the raw pass misses. */
  def normalize(docs: DataFrame): DataFrame =
    nonNull(docs).withColumn("text",
      trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
        " +", " ")))

  /** Vocabulary coverage: build the top-`vocabSize` token vocabulary by
    * corpus frequency (ties broken lexicographically for determinism),
    * then per language report what fraction of token OCCURRENCES the
    * vocab covers — the go/no-go metric before committing a tokenizer
    * vocab. Scale shape: one token-frequency aggregate (map-side partial
    * agg to vocabulary cardinality, not corpus size), top-N via
    * sort+limit on the FREQUENCY table, vocab broadcast back into a
    * per-token semi probe. OOV rate = 1 − coverage. */
  def vocabCoverage(docs: DataFrame, vocabSize: Int = 30): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val tokens = nonNull(docs)
      .select(col("lang"), explode(toks).as("token"))
    val vocab = tokens.groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(vocabSize)
      .select(col("token"))
    tokens
      .join(broadcast(vocab.withColumn("__in_vocab", lit(1L))),
        Seq("token"), "left")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__in_vocab"), lit(0L))).as("n_covered"))
      .select(col("lang"), col("n_tokens"), col("n_covered"),
        // 1 − c/t = (t−c)/t, count/count → exact integer half-up
        (ExactRound.halfUpPos("1000000 * (n_tokens - n_covered)",
          "n_tokens").cast("double") / 1e6).as("oov_rate"))
      .orderBy(col("lang"))
  }

  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    vocabCoverage(Lake.documents(spark, dir))

  /** PII dictionary for [[piiScan]]/[[redact]]: email, IPv4, phone-shaped
    * digit runs, 16-digit card-shaped numbers. RE2-compatible (no
    * lookaround, no backreferences) so the same strings run unchanged in
    * RE2-based screens. The synthetic lake corpus contains no PII, so
    * these are exercised by planted-data specs; the driver-checked query
    * scans for token classes the corpus does contain. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "card" -> "\\b(?:\\d{4}[ -]){3}\\d{4}\\b",
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",
    "phone" -> "\\+\\d[\\d() -]{6,}\\d")

  /** Pattern scan: per-doc occurrence counts for a dictionary of named
    * regexes — the mechanism behind PII detection, policy screens, and
    * content tagging. One codegen'd map stage (`regexp_extract_all` per
    * pattern, whole-match group), no shuffle; long-format output
    * (doc_id, pattern, n_matches) so adding patterns never changes the
    * schema. At 100 TB this is a pure map over the corpus scan. */
  def patternScan(docs: DataFrame, patterns: Seq[(String, String)]): DataFrame = {
    require(patterns.nonEmpty, "patternScan needs at least one pattern")
    val hits = patterns.map { case (name, re) =>
      struct(lit(name).as("pattern"),
        size(regexp_extract_all(col("text"), lit(re), lit(0)))
          .cast("long").as("n_matches"))
    }
    nonNull(docs)
      .select(col("doc_id"), explode(array(hits: _*)).as("m"))
      .select(col("doc_id"), col("m.pattern").as("pattern"),
        col("m.n_matches").as("n_matches"))
      .orderBy(col("doc_id"), col("pattern"))
  }

  /** PII occurrence counts per doc over [[PiiPatterns]]. */
  def piiScan(docs: DataFrame): DataFrame = patternScan(docs, PiiPatterns)

  /** Redaction: every match of every pattern replaced by its `[NAME]` tag
    * — chained global `regexp_replace`, still one shuffle-free map stage.
    * Patterns apply in dictionary order, so earlier tags are not re-matched
    * by later patterns (card before phone matters: a card number IS a
    * phone-shaped digit run). */
  def redact(docs: DataFrame,
             patterns: Seq[(String, String)] = PiiPatterns): DataFrame = {
    val redacted = patterns.foldLeft(col("text")) { case (c, (name, re)) =>
      regexp_replace(c, lit(re), lit(s"[${name.toUpperCase}]"))
    }
    nonNull(docs).withColumn("text", redacted)
  }

  /** Collocation extraction: the corpus's top bigrams by pointwise mutual
    * information, PMI = ln(c_ab · N / (c_a · c_b)) with unigram counts
    * taken over bigram-LEFT positions and N = total bigrams (one
    * consistent sample space — the standard bigram-table convention).
    * ONE pass over the corpus builds the bigram counts; the unigram
    * marginals and the grand total re-aggregate the BOUNDED bigram-count
    * frame, so the corpus is never scanned twice. All products are exact
    * int64 (far under 2^53 as doubles) and the single ln is the only
    * transcendental, rounded like q_zipf's. `minCount` keeps the PMI
    * estimate out of the small-count noise regime. */
  def collocations(docs: DataFrame, minCount: Long = 5,
                   topK: Int = 20): DataFrame = {
    // the bigram-count frame feeds three consumers (marginals, total,
    // join) — persist it for the query's lifetime, materialize the
    // bounded top-k head, release eagerly (nearDupPairs discipline)
    val bc = nonNull(docs)
      .select(toks.as("tk"))
      .select(explode(expr(
        """transform(slice(tk, 1, size(tk) - 1),
          |          (w, i) -> struct(w AS w1, tk[i + 1] AS w2))"""
          .stripMargin)).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uc = bc.groupBy(col("w1").as("w")).agg(sum(col("c_ab")).as("c_w"))
    val tot = bc.agg(sum(col("c_ab")).as("n_bi"))
    val out = bc
      .join(broadcast(uc.select(col("w").as("w1"), col("c_w").as("c_a"))),
        Seq("w1"))
      .join(broadcast(uc.select(col("w").as("w2"), col("c_w").as("c_b"))),
        Seq("w2"))
      .crossJoin(broadcast(tot))
      .filter(col("c_ab") >= minCount)
      .select(col("w1"), col("w2"), col("c_ab"),
        round(log((col("c_ab").cast("double") * col("n_bi")) /
          (col("c_a").cast("double") * col("c_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
      .localCheckpoint(true)
    bc.unpersist(false)
    out
  }

  def collocations(spark: SparkSession, dir: String): DataFrame =
    collocations(Lake.documents(spark, dir))

  /** Per-doc keyword extraction: top-`k` terms by TF-IDF. The idf is
    * rounded BEFORE the tf product so the score is a product of an exact
    * integer and a 6-digit double — engine-stable; ranking partitions by
    * doc (per-doc frame bounded by the doc's distinct-term count). */
  def docKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val clean = nonNull(docs)
    // tf feeds both the df aggregate and the scoring join — persist,
    // materialize, release (the paragraphDedup double-consumer pattern)
    val tf = clean.select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = clean.select(count(lit(1)).cast("double").as("__n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    val out = tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") *
          round(log((col("__n_docs") + 1.0) / (col("df") + 1.0)), 6), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
      .localCheckpoint(true)
    tf.unpersist(false)
    out
  }

  def docKeywords(spark: SparkSession, dir: String): DataFrame =
    docKeywords(Lake.documents(spark, dir))

  /** N-gram diversity (distinct-n): per source, distinct n-grams over
    * total n-grams — the repetitiveness/mode-collapse diagnostic reported
    * for generated corpora. One map-side gram fan-out + one partial-
    * aggregated group-by; output bounded by source cardinality. */
  def ngramDiversity(docs: DataFrame, n: Int = 3,
                     groupCol: String = "source"): DataFrame =
    nonNull(docs)
      .select(col(groupCol), toks.as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(groupCol), explode(expr(
        s"""transform(slice(tk, 1, size(tk) - ${n - 1}),
           |          (w, i) -> array_join(slice(tk, i + 1, $n), ' '))"""
          .stripMargin)).as("gram"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("gram")).as("n_distinct"))
      .withColumn("diversity",
        ExactRound.halfUpPos("1000000 * n_distinct", "n_grams")
          .cast("double") / 1e6)
      .orderBy(col(groupCol))

  def ngramDiversity(spark: SparkSession, dir: String): DataFrame =
    ngramDiversity(Lake.documents(spark, dir))

  /** Heaps-law vocabulary growth curve: distinct-unit count after each
    * `1/steps` fraction of the corpus in doc-id order. The unit is the
    * word `n`-gram (n = 1 gives plain words; the default 3 keeps the
    * curve informative even on a closed word vocabulary, where plain
    * words saturate in the first prefix). No global row-number window:
    * prefix cutoffs are exact doc-id percentiles (a bounded one-row
    * aggregate), each unit contributes its FIRST doc id (a partial-
    * aggregable min), and both curve counts are step-bounded fan-out
    * aggregates. Pairs with [[zipfFit]]: Zipf reads the frequency head,
    * Heaps the vocabulary's growth against corpus size. */
  def heapsCurve(docs: DataFrame, steps: Int = 10, n: Int = 3): DataFrame = {
    val clean = nonNull(docs)
    val fracs = (1 to steps).map(i => i.toDouble / steps)
    val cuts = clean
      .select(posexplode(expr(
        s"percentile(doc_id, array(${fracs.mkString(", ")}))")))
      .select((col("pos") + 1).cast("long").as("step"),
        col("col").as("cutoff"))
    val units =
      if (n == 1) clean.select(explode(toks).as("term"), col("doc_id"))
      else clean.select(col("doc_id"), toks.as("tk"))
        .filter(size(col("tk")) >= n)
        .select(col("doc_id"), explode(expr(
          s"""transform(slice(tk, 1, size(tk) - ${n - 1}),
             |          (w, i) -> array_join(slice(tk, i + 1, $n), ' '))"""
            .stripMargin)).as("term"))
    val firstDoc = units
      .groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
    val nDocs = clean.select(col("doc_id"))
      .crossJoin(broadcast(cuts))
      .filter(col("doc_id") <= col("cutoff"))
      .groupBy(col("step"), col("cutoff"))
      .agg(count(lit(1)).as("n_docs"))
    val vocab = firstDoc
      .crossJoin(broadcast(cuts))
      .filter(col("first_doc") <= col("cutoff"))
      .groupBy(col("step"), col("cutoff"))
      .agg(count(lit(1)).as("vocab"))
    nDocs.join(vocab, Seq("step", "cutoff"))
      .select(col("step"), round(col("cutoff"), 4).as("cutoff"),
        col("n_docs"), col("vocab"))
      .orderBy(col("step"))
  }

  def heapsCurve(spark: SparkSession, dir: String): DataFrame =
    heapsCurve(Lake.documents(spark, dir))

  /** ln 2 as one shared literal so engine and oracle carry the identical
    * double (never two libraries' ln(2) disagreeing in the last ulp). */
  private val Ln2 = 0.6931471805599453

  /** Pairwise Jensen–Shannon divergence between source unigram
    * distributions — the frequency-aware complement of [[sourceOverlap]]
    * (which sees only vocabulary SETS): two crawls using the same words
    * at very different rates are distant here, identical there. Support
    * is capped to the corpus top-`vocabCap` words (broadcast), and each
    * source's distribution is renormalized over that capped support, so
    * the per-pair work is bounded by sources² × cap at any corpus size.
    * Words one source lacks contribute their closed-form `p·ln2 / 2`
    * through the (2 − Σp − Σq) term — only SHARED words are ever
    * joined. Each shared term is rounded then decimal-summed, so the
    * pair sum is aggregation-order-independent; pairs sharing no capped
    * vocabulary are absent (their JSD is the maximal ln 2), matching
    * sourceOverlap's absent-disjoint-pair convention. */
  def sourceJsd(docs: DataFrame, vocabCap: Int = 10000): DataFrame = {
    // ONE corpus pass: the (source, token) count frame — bounded by
    // sources × vocabulary, far below corpus size — is the only thing
    // the corpus ever feeds; the top-N vocab, its filtered form, and the
    // totals all re-aggregate it (persisted, released on materialize)
    val countsAll = nonNull(docs)
      .select(col("source"), explode(toks).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = countsAll.groupBy(col("token"))
      .agg(sum(col("cnt")).as("c"))
      .orderBy(col("c").desc, col("token")).limit(vocabCap)
      .select(col("token"))
    val counts = countsAll.join(broadcast(vocab), Seq("token"), "left_semi")
    val tots = counts.groupBy(col("source")).agg(sum(col("cnt")).as("tot"))
    val c = counts.join(broadcast(tots), Seq("source"))
    val a = c.select(col("source").as("src_a"), col("token"),
      col("cnt").as("ca"), col("tot").as("ta"))
    val b = c.select(col("source").as("src_b"), col("token"),
      col("cnt").as("cb"), col("tot").as("tb"))
    val dec = DecimalType(28, 8)
    val p = col("ca").cast("double") / col("ta")
    val q = col("cb").cast("double") / col("tb")
    val out = a.join(b, Seq("token")).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(p * log(lit(2.0) * p / (p + q)) +
              q * log(lit(2.0) * q / (p + q)), 8).cast(dec).as("term"),
        round(p, 8).cast(dec).as("pa"),
        round(q, 8).cast(dec).as("qb"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("term")).cast("double").as("tsum"),
        sum(col("pa")).cast("double").as("psum"),
        sum(col("qb")).cast("double").as("qsum"))
      .select(col("src_a"), col("src_b"),
        round((col("tsum") +
          lit(Ln2) * (lit(2.0) - col("psum") - col("qsum"))) / 2.0, 6)
          .as("jsd"))
      .orderBy(col("src_a"), col("src_b"))
      .localCheckpoint(true)
    countsAll.unpersist(false)
    out
  }

  def sourceJsd(spark: SparkSession, dir: String): DataFrame =
    sourceJsd(Lake.documents(spark, dir))

  /** Hellinger + total-variation distance panel between source unigram
    * distributions — the bounded-metric complements of [[sourceJsd]]
    * (TV is the tightest distinguishability bound; Hellinger²
    * tensorizes): same one-pass (source, token) frame and top-N vocab.
    * TV is EXACT: ½Σ|p−q| over the shared vocab clears to one integer
    * ratio (Σ|c_a·t_b − c_b·t_a| + (t_a−C_a)·t_b + (t_b−C_b)·t_a) /
    * (2·t_a·t_b) — the two correction terms are each side's mass on
    * tokens the other lacks — staged through decimal(38,0) and rounded
    * once at 6 dp by exact integer half-up. Hellinger² = 1 − Σ√(p·q)
    * keeps the [[sourceJsd]] √-discipline: per-term 8-dp-pinned decimal
    * sum, one double readout (absent-token terms are 0 and drop out). */
  def sourceDistance(docs: DataFrame, vocabCap: Int = 10000): DataFrame = {
    val d38 = DecimalType(38, 0)
    val countsAll = nonNull(docs)
      .select(col("source"), explode(toks).as("token"))
      .groupBy(col("source"), col("token")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = countsAll.groupBy(col("token"))
      .agg(sum(col("cnt")).as("c"))
      .orderBy(col("c").desc, col("token")).limit(vocabCap)
      .select(col("token"))
    val counts = countsAll.join(broadcast(vocab), Seq("token"), "left_semi")
    val tots = counts.groupBy(col("source")).agg(sum(col("cnt")).as("tot"))
    val c = counts.join(broadcast(tots), Seq("source"))
    val a = c.select(col("source").as("src_a"), col("token"),
      col("cnt").as("ca"), col("tot").as("ta"))
    val b = c.select(col("source").as("src_b"), col("token"),
      col("cnt").as("cb"), col("tot").as("tb"))
    val dec = DecimalType(28, 8)
    val p = col("ca").cast("double") / col("ta")
    val q = col("cb").cast("double") / col("tb")
    val out = a.join(b, Seq("token")).filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("ta"), col("tb"),
        abs(col("ca").cast(d38) * col("tb") - col("cb").cast(d38) * col("ta"))
          .cast(d38).as("tv_t"),
        round(sqrt(p * q), 8).cast(dec).as("h_t"),
        col("ca"), col("cb"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(max(col("ta")).as("ta"), max(col("tb")).as("tb"),
        sum(col("tv_t")).cast(d38).as("stv"),
        sum(col("h_t")).cast("double").as("sh"),
        sum(col("ca")).as("comm_a"), sum(col("cb")).as("comm_b"))
      .withColumn("tvn",
        ((col("stv")
          + (col("ta") - col("comm_a")).cast(d38) * col("tb")
          + (col("tb") - col("comm_b")).cast(d38) * col("ta")) * 1000000)
          .cast(d38))
      .withColumn("tvd", (col("ta").cast(d38) * col("tb") * 2).cast(d38))
      .select(col("src_a"), col("src_b"),
        (ExactRound.halfUpPos("tvn", "tvd").cast("double") / 1e6)
          .as("tv_distance"),
        round(lit(1.0) - col("sh"), 6).as("hellinger_sq"))
      .orderBy(col("src_a"), col("src_b"))
      .localCheckpoint(true)
    countsAll.unpersist(false)
    out
  }

  def sourceDistance(spark: SparkSession, dir: String): DataFrame =
    sourceDistance(Lake.documents(spark, dir))

  /** Cross-source score normalization: each doc's quality score replaced
    * by its percent-rank WITHIN its source — the standard trick for
    * mixing heterogeneously-scored sources (one crawl's 0.6 is another's
    * 0.9; ranks are comparable where raw scores are not). One window per
    * source partition (skew bounded by the largest source; at 100 TB the
    * window-free cutpoint form of q_quantile_bins_par substitutes with
    * the same output contract). Tie-break on doc_id so the rank is
    * total-ordered and engine-reproducible. */
  def scoreNormalize(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality"), col("doc_id"))
    val scored = docQuality(nonNull(docs))
      .select(col("doc_id"), col("quality"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
    scored
      .withColumn("norm_score", round(percent_rank().over(w), 6))
      .select(col("doc_id"), col("source"), col("quality"), col("norm_score"))
      .orderBy(col("doc_id"))
  }

  def scoreNormalize(spark: SparkSession, dir: String): DataFrame =
    scoreNormalize(Lake.documents(spark, dir))

  /** Deflate compression ratio per doc — the model-free repetitiveness /
    * entropy signal quality pipelines use alongside the rule screens:
    * highly compressible text is repetitive or boilerplate-heavy, and
    * near-incompressible text is noise or embedded binary. Runs as
    * batched `mapPartitions` (the multimodal decode call shape) with one
    * `java.util.zip.Deflater` reused per partition — a map-only stage,
    * no shuffle until the presentation sort. Deflate output length is
    * deterministic for a fixed input/level, but has no SQL twin → spec-
    * verified invariants (bounds, planted repetition ordering,
    * determinism) instead of a DuckDB oracle. */
  def compressionRatio(docs: DataFrame, level: Int = 1): DataFrame = {
    require(level >= 1 && level <= 9, "deflate level in [1, 9]")
    val spark = docs.sparkSession
    import spark.implicits._
    nonNull(docs).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(in)
          deflater.finish()
          var out = 0L
          while (!deflater.finished()) out += deflater.deflate(buf)
          val ratio =
            if (in.length == 0) 1.0
            else math.rint(out.toDouble / in.length * 10000) / 10000
          (id, in.length.toLong, out, ratio)
        }
      }
      .toDF("doc_id", "n_bytes", "n_compressed", "compression_ratio")
      .orderBy(col("doc_id"))
  }

  def compressionRatio(spark: SparkSession, dir: String): DataFrame =
    compressionRatio(Lake.documents(spark, dir))

  /** Keyword-in-context (KWIC) concordance — the corpus-inspection grep:
    * every occurrence of `term` with `ctx` tokens of context either side.
    * One token-array projection (kept as a multi-referenced alias — the
    * §9 shingle lesson: never re-split inside per-token expressions), one
    * posexplode bounded by token count, a filter that at scale would ride
    * an inverted-index semi-join but as a scan is one pushdown-pruned
    * pass. Positions are 1-based. */
  def concordance(docs: DataFrame, term: String, ctx: Int = 3): DataFrame = {
    require(ctx >= 0, "context width must be non-negative")
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        posexplode(col("t")).as(Seq("pos0", "token")))
      .filter(col("token") === term)
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        concat_ws(" ", slice(col("t"),
          greatest(lit(1), col("pos0") - ctx + 1),
          least(lit(ctx), col("pos0")))).as("left_ctx"),
        concat_ws(" ", slice(col("t"), col("pos0") + 2, lit(ctx)))
          .as("right_ctx"))
      .orderBy(col("doc_id"), col("pos"))
  }

  def concordanceQuery(spark: SparkSession, dir: String): DataFrame =
    concordance(Lake.documents(spark, dir), term = "merge")

  /** Readability profile per source: Flesch reading ease from exact
    * integer counts — words (tokens), sentences (1 + terminal
    * punctuation runs), and a vowel-run syllable proxy (the classic
    * heuristic; real syllabification is dictionary work no engine does
    * in a scan). All three sums are exact BIGINT and map-side
    * combinable; the two ratios and the Flesch formula are the only
    * double ops, evaluated as one identical scalar tree. On a
    * punctuation-free corpus the sentence term degenerates to
    * words-per-doc — a property of the data, reported as-is. */
  def readability(docs: DataFrame): DataFrame = {
    val d = docs.filter(col("text").isNotNull)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        (lit(1) + length(regexp_replace(col("text"), "[^.!?]", ""))
          ).cast("long").as("n_sents"),
        // vowel RUNS (≈ syllables): collapsing each run to one char vs
        // deleting all vowels differs by exactly the run count
        (length(regexp_replace(col("text"), "[aeiouAEIOU]+", "V")) -
          length(regexp_replace(col("text"), "[aeiouAEIOU]+", ""))
          ).cast("long").as("n_syll"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sw"), sum(col("n_sents")).as("ss"),
        sum(col("n_syll")).as("sy"))
      // all three readouts are terminating quotients → exact integer
      // half-up ([[ExactRound]]): flesch clears to one rational,
      // (206835·ss·sw − 1015·sw² − 84600·sy·ss)/(1000·ss·sw), SIGNED,
      // staged through decimal(38,0) for the ×10⁴ rescale
      .withColumn("fn",
        ((col("ss").cast(DecimalType(38, 0)) * col("sw") * 206835
          - col("sw").cast(DecimalType(38, 0)) * col("sw") * 1015
          - col("sy").cast(DecimalType(38, 0)) * col("ss") * 84600)
          * 10000).cast(DecimalType(38, 0)))
      .withColumn("fd",
        (col("ss").cast(DecimalType(38, 0)) * col("sw") * 1000)
          .cast(DecimalType(38, 0)))
      .select(col("source"), col("n_docs"),
        (ExactRound.halfUpPos("10000 * sw", "ss")
          .cast("double") / 1e4).as("words_per_sentence"),
        (ExactRound.halfUpPos("10000 * sy", "sw")
          .cast("double") / 1e4).as("syllables_per_word"),
        (ExactRound.halfUp("fn", "fd").cast("double") / 1e4)
          .as("flesch"))
      .orderBy(col("source"))
  }

  /** Gunning fog index per source — the complex-word readability twin
    * of [[readability]]'s Flesch (Flesch counts every syllable; fog
    * counts only the ≥3-syllable words a skimming reader stumbles on):
    * fog = 0.4·(words/sentences + 100·complex/words) clears to ONE
    * terminating integer ratio (2·sw² + 200·cw·ss)/(5·ss·sw) → exact
    * integer half-up through decimal(38,0); the complex-word count
    * explodes the token array once (vowel-run syllable proxy, the
    * [[readability]] rule applied per token). Bounded source frame. */
  def gunningFog(docs: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    val perDoc = docs.filter(col("text").isNotNull)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("w"),
        (lit(1) + length(regexp_replace(col("text"), "[^.!?]", "")))
          .cast("long").as("s"))
    val complexTok = docs.filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .select(col("source"),
        when(length(regexp_replace(col("tok"), "[aeiouAEIOU]+", "V")) -
          length(regexp_replace(col("tok"), "[aeiouAEIOU]+", "")) >= 3,
          1L).otherwise(0L).as("cx"))
      .groupBy(col("source")).agg(sum(col("cx")).as("cw"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("sw"),
        sum(col("s")).as("ss"))
      .join(complexTok, Seq("source"))
      .withColumn("fn",
        ((col("sw").cast(d38) * col("sw") * 2
          + col("cw").cast(d38) * col("ss") * 200) * 10000).cast(d38))
      .withColumn("fd",
        (col("ss").cast(d38) * col("sw") * 5).cast(d38))
      .select(col("source"), col("n_docs"), col("cw").as("n_complex"),
        (ExactRound.halfUpPos("10000 * cw", "sw")
          .cast("double") / 1e4).as("complex_share"),
        (ExactRound.halfUpPos("fn", "fd").cast("double") / 1e4)
          .as("fog_index"))
      .orderBy(col("source"))
  }

  def gunningFog(spark: SparkSession, dir: String): DataFrame =
    gunningFog(Lake.documents(spark, dir))

  def readabilityQuery(spark: SparkSession, dir: String): DataFrame =
    readability(Lake.documents(spark, dir))

  /** Hapax-legomena profile per source: share of each source's
    * vocabulary that occurs exactly once IN THAT SOURCE — the classic
    * lexical-richness / OCR-noise screen (clean prose runs ~40-60%
    * hapax; template spam collapses it, OCR garbage inflates it). One
    * token explode → (source, token) counts → bounded per-source
    * aggregate; all ratios from exact integers. */
  def hapaxProfile(spark: SparkSession, dir: String): DataFrame =
    Lake.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("source"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("n_hapax"),
        // count/count → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * n_hapax", "vocab")
          .cast("double") / 1e4).as("hapax_share"))
      .orderBy(col("source"))

  /** Chao1 vocabulary-richness estimate per source — the capture-
    * recapture answer to "how much vocabulary haven't we crawled yet?"
    * that the raw [[hapaxProfile]] share and the Heaps-law curve fit
    * only gesture at: Chao1 = V + F1²/(2·F2) (bias-corrected
    * V + F1(F1−1)/2 when F2 = 0) lower-bounds the true vocabulary from
    * the singleton/doubleton counts alone, and the Good–Turing sample
    * coverage 1 − F1/N says what probability mass the UNSEEN types
    * still hold — the standard pair for deciding whether a source is
    * crawled out. One token explode → (source, token) counts → bounded
    * per-source frame; every input to the two closed forms is an exact
    * BIGINT, so both engines divide identical integers. */
  def chao1Richness(spark: SparkSession, dir: String): DataFrame =
    Lake.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("source"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("tf") === 2L, 1L).otherwise(0L)).as("f2"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("f1"),
        col("f2"),
        // both branches are terminating quotients → exact integer
        // half-up: vocab + f1²/(2f2) = (2·vocab·f2 + f1²)/(2f2), and
        // the f2=0 fallback vocab + f1(f1−1)/2 over the constant 2
        when(col("f2") > 0L,
          ExactRound.halfUpPos("10000 * (2 * vocab * f2 + f1 * f1)",
            "2 * f2").cast("double") / 1e4)
          .otherwise(
            ExactRound.halfUpPos(
              "10000 * (2 * vocab + f1 * (f1 - 1))", "2")
              .cast("double") / 1e4)
          .as("chao1"),
        (ExactRound.halfUpPos("1000000 * (n_tokens - f1)", "n_tokens")
          .cast("double") / 1e6).as("coverage"))
      .orderBy(col("source"))

  /** Yule's K lexical-concentration index per source, with Simpson's
    * repeat-rate D — the frequency-of-frequencies complement to
    * [[chao1Richness]] (richness asks how many types exist; K asks how
    * unevenly the tokens concentrate on them): K = 10⁴·(Σtf² − N)/N²
    * is length-invariant by construction (the classic authorship /
    * template-spam screen — boilerplate-heavy sources spike K), and
    * D = Σtf(tf−1)/(N(N−1)) is the probability two sampled tokens
    * coincide. Same bounded per-source shape as [[hapaxProfile]]; all
    * sums exact BIGINTs into the two closed-form divides. */
  def yuleK(spark: SparkSession, dir: String): DataFrame =
    Lake.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("source"))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("tf") * col("tf")).as("s2"))
      // K and D are integer ratios (terminating) → exact integer
      // half-up; the ×10⁸/×10⁶ numerators exceed int64 at corpus token
      // counts, so they stage through decimal(38,0)
      .withColumn("kn",
        ((col("s2") - col("n_tokens")).cast(DecimalType(38, 0))
          * 100000000L).cast(DecimalType(38, 0)))
      .withColumn("kd",
        (col("n_tokens").cast(DecimalType(38, 0)) * col("n_tokens"))
          .cast(DecimalType(38, 0)))
      .withColumn("dn",
        ((col("s2") - col("n_tokens")).cast(DecimalType(38, 0))
          * 1000000L).cast(DecimalType(38, 0)))
      .withColumn("dd",
        (col("n_tokens").cast(DecimalType(38, 0))
          * (col("n_tokens") - 1L)).cast(DecimalType(38, 0)))
      .select(col("source"), col("n_tokens"), col("vocab"),
        (ExactRound.halfUpPos("kn", "kd").cast("double") / 1e4)
          .as("yule_k"),
        (ExactRound.halfUpPos("dn", "dd").cast("double") / 1e6)
          .as("simpson_d"))
      .orderBy(col("source"))

  /** Good–Turing adjusted-count table over the corpus unigram
    * frequencies — the smoothing step between the raw counts and any
    * language-model probability ([[chao1Richness]] estimates how many
    * types are unseen; Good–Turing says how much probability mass each
    * SEEN count class should surrender to them): for r = 1..8 (a
    * DESIGN-constant grid), N_r types occur exactly r times and the
    * adjusted count is r* = (r+1)·N_{r+1}/N_r, with smoothed class
    * probability p = r* / N; row r = 0 reports the classic unseen mass
    * N₁/N (zero when no singletons exist). The grid is the `maxR`
    * SMALLEST OBSERVED frequency classes — identical to the classic
    * 1..maxR table whenever hapax exist, and still meaningful on a
    * closed-vocabulary corpus whose minimum count exceeds maxR.
    *
    * Shape: one token explode → frequency-of-frequencies frame; the
    * smallest classes come from a TakeOrderedAndProject head (never a
    * single-partition window over the class frame), and N_{r+1} rides
    * an equi-join back to the full class frame; every closed-form
    * input an exact BIGINT. */
  def goodTuring(spark: SparkSession, dir: String,
                 maxR: Int = 8): DataFrame = {
    val tf = Lake.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fof = tf.groupBy(col("tf").as("r"))
      .agg(count(lit(1)).as("n_r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = tf.agg(sum(col("tf")).as("nn"))
    val low = fof.orderBy(col("r")).limit(maxR)
    val grid = low
      .join(fof.select((col("r") - 1L).as("r"), col("n_r").as("n_r1")),
        Seq("r"), "left")
      .crossJoin(broadcast(tot))
      // (r+1)·n_{r+1}/n_r and its /N probability are count ratios →
      // exact integer half-up ([[ExactRound]])
      .withColumn("nrx", coalesce(col("n_r1"), lit(0L)))
      .select(col("r").cast("long").as("r"), col("n_r"),
        col("nrx").as("n_r_next"),
        (ExactRound.halfUpPos("1000000 * (r + 1) * nrx", "n_r")
          .cast("double") / 1e6).as("r_star"),
        (ExactRound.halfUpPos("1000000 * (r + 1) * nrx", "n_r * nn")
          .cast("double") / 1e6).as("p_smoothed"))
    val unseen = tot
      .join(broadcast(fof.filter(col("r") === 1L)
        .select(col("n_r").as("f1"))), lit(true), "left")
      .select(lit(0L).as("r"), lit(0L).as("n_r"),
        coalesce(col("f1"), lit(0L)).as("n_r_next"),
        lit(null).cast("double").as("r_star"),
        (ExactRound.halfUpPos("1000000 * coalesce(f1, 0)", "nn")
          .cast("double") / 1e6).as("p_smoothed"))
    val out = unseen.unionAll(grid).orderBy(col("r"))
      .localCheckpoint(true)
    fof.unpersist(false)
    tf.unpersist(false)
    out
  }

  /** RAKE keyword extraction (Rapid Automatic Keyword Extraction):
    * candidate phrases are maximal stopword-delimited token runs; each
    * word scores deg/freq (deg = Σ length of the phrase instances it
    * appears in — co-occurrence weight; freq = its instance count), and
    * a phrase scores the sum of its words' scores. The classic
    * no-training keyphrase baseline — multi-word phrases whose words
    * travel together outrank ubiquitous single words.
    *
    * Determinism at scale: phrase assembly sorts collected (pos, token)
    * structs per (doc, run) — runs are bounded by inter-stopword gaps,
    * never whole docs; each word score is rounded ONCE to 6 dp and
    * decimal-summed per phrase (the surprisal discipline — phrase
    * scores are aggregation-order-free), and top-K is
    * TakeOrderedAndProject on (rounded score, phrase). One corpus
    * token pass; the phrase-instance frame persists for its two
    * consumers (word stats, distinct phrases). */
  def rakeKeywords(spark: SparkSession, dir: String,
                   topK: Int = 20): DataFrame = {
    val wSeq = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val phrases = Lake.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumn("is_stop", col("col").isin(Stopwords: _*))
      .withColumn("run_id",
        sum(when(col("is_stop"), 1L).otherwise(0L)).over(wSeq))
      .filter(!col("is_stop") && col("col") =!= "")
      .groupBy(col("doc_id"), col("run_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("col")))),
          x => x.getField("col")), " ").as("phrase"),
        count(lit(1)).as("len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wordScores = phrases
      .select(explode(split(col("phrase"), " ")).as("w"), col("len"))
      .groupBy(col("w"))
      .agg(round(sum(col("len")) / count(lit(1)), 6)
        .cast(DecimalType(18, 6)).as("ws"))
    val distinctPhrases = phrases
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occur"))
    val out = distinctPhrases
      .select(col("phrase"), col("n_occur"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wordScores, Seq("w"))
      .groupBy(col("phrase"), col("n_occur"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("ws")), 4).cast("double").as("score"))
      .select(col("phrase"), col("n_tokens"), col("n_occur"), col("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(topK)
      .localCheckpoint(true)
    phrases.unpersist(false)
    out
  }

  /** Dunning log-likelihood (G²) keyness: which tokens are
    * over-represented in a focus slice of the corpus versus the rest —
    * THE standard corpus-comparison statistic (sharper than raw frequency
    * ratios for rare words, unlike PMI it doesn't explode on singletons).
    * For token w with focus count a, reference count b and slice totals
    * Nₐ, N_b: expected eₐ = Nₐ(a+b)/(Nₐ+N_b) (e_b symmetric) and
    * G² = 2·[a·ln(a/eₐ) + b·ln(b/e_b)], zero-count terms contributing 0.
    * `side` says WHICH slice the token leans toward, decided by the exact
    * integer cross-product a·N_b > b·Nₐ (no fp at the boundary; at
    * corpus scales where a·N_b could overflow a long, compare doubles —
    * the boundary rows there have G² ≈ 0 and don't matter).
    *
    * Rows are support-thresholded (a+b ≥ minCount, an exact integer
    * filter), NOT top-K'd: a LIMIT over a double ordering key is where
    * engines disagree at the boundary. Shape: one token explode →
    * vocab-bounded (token) counts; the slice totals ride a broadcast
    * one-row cross join. */
  def keyness(docs: DataFrame, focus: Column, minCount: Long = 20L): DataFrame = {
    val counts = nonNull(docs)
      .select(focus.as("in_focus"), explode(toks).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(sum(when(col("in_focus"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("in_focus"), 1L).otherwise(0L)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = counts.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    val ea = col("na").cast("double") * (col("a") + col("b")) /
      (col("na") + col("nb"))
    val eb = col("nb").cast("double") * (col("a") + col("b")) /
      (col("na") + col("nb"))
    val g2 = lit(2.0) * (
      when(col("a") > 0L,
        col("a").cast("double") * log(col("a").cast("double") / ea))
        .otherwise(lit(0.0)) +
      when(col("b") > 0L,
        col("b").cast("double") * log(col("b").cast("double") / eb))
        .otherwise(lit(0.0)))
    val out = counts
      .filter(col("a") + col("b") >= minCount)
      .crossJoin(broadcast(tot))
      .select(col("token"), col("a").as("n_focus"), col("b").as("n_rest"),
        round(g2, 4).as("g2"),
        when(col("a") * col("nb") > col("b") * col("na"), "focus")
          .otherwise("rest").as("side"))
      .orderBy(col("g2").desc, col("token"))
      .localCheckpoint(true)
    counts.unpersist(false)
    out
  }

  /** Keyness of English-labelled docs against the rest of the corpus. */
  def keyness(spark: SparkSession, dir: String): DataFrame =
    keyness(Lake.documents(spark, dir), col("lang") === "en")

  /** Inter-rater agreement panel between two deterministic document
    * classifiers — Cohen's κ (chance-corrected agreement) plus McNemar's
    * χ² on the disagreement cells (is the DIRECTION of disagreement
    * symmetric?). The raters here are the two cheapest quality gates a
    * corpus pipeline runs (char-length vs token-count thresholds); the
    * operator takes any two boolean columns. All four 2×2 cells are exact
    * BIGINTs from ONE scan; κ's chance agreement p_e and McNemar's
    * statistics are scalar arithmetic on the one-row frame. The
    * terminating ratios (observed agreement pₒ, McNemar's χ² — exact
    * integer quotients where a .5 rounding tie is a REACHABLE decimal)
    * round by exact integer half-up, (2·num·10^d + den) div (2·den); the
    * compound irrationals (p_e, κ) round as doubles, where a tie has
    * measure zero. */
  def raterAgreement(docs: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val one = nonNull(docs).agg(
      sum(when(raterA && raterB, 1L).otherwise(0L)).as("n11"),
      sum(when(raterA && !raterB, 1L).otherwise(0L)).as("n10"),
      sum(when(!raterA && raterB, 1L).otherwise(0L)).as("n01"),
      sum(when(!raterA && !raterB, 1L).otherwise(0L)).as("n00"))
    val n = col("n11") + col("n10") + col("n01") + col("n00")
    val poD = (col("n11") + col("n00")).cast("double") / n
    val paD = (col("n11") + col("n10")).cast("double") / n
    val pbD = (col("n11") + col("n01")).cast("double") / n
    val peD = paD * pbD + (lit(1.0) - paD) * (lit(1.0) - pbD)
    val d = col("n10") - col("n01")
    val m = col("n10") + col("n01")
    one.select(
      n.as("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      (expr("(2 * (n11 + n00) * 1000000 + (n11 + n10 + n01 + n00)) div " +
        "(2 * (n11 + n10 + n01 + n00))").cast("double") / 1000000.0)
        .as("p_observed"),
      round(peD, 6).as("p_expected"),
      round((poD - peD) / (lit(1.0) - peD), 4).as("kappa"),
      when(m > 0L,
        expr("(2 * (n10 - n01) * (n10 - n01) * 10000 + (n10 + n01)) div " +
          "(2 * (n10 + n01))").cast("double") / 10000.0).as("mcnemar_chi2"),
      when(m > 0L, round(
        greatest(abs(d) - 1L, lit(0L)).cast("double") *
          greatest(abs(d) - 1L, lit(0L)).cast("double") /
          m.cast("double"), 4)).as("mcnemar_cc"))
  }

  /** Driver binding: length-rater (n_chars ≥ 400) vs token-rater
    * (≥ 80 whitespace tokens) over the documents table. */
  def raterAgreement(spark: SparkSession, dir: String): DataFrame =
    raterAgreement(Lake.documents(spark, dir),
      col("n_chars") >= 400L, size(toks) >= 80)

  /** Character-class composition per source — the encoding/mojibake and
    * content-type screen a crawl pipeline runs before anything
    * language-level (a source whose digit share spikes is a table dump;
    * a non-ASCII-letter surge in a declared-English source is mojibake
    * or the wrong decoder). Five deterministic classes (ASCII lower /
    * upper / digit / space / everything-else — CJK and all non-ASCII
    * land in `other`), counted by length-minus-stripped with an explicit
    * ASCII character class (engine regex dialects agree on these;
    * Unicode property classes are where they drift). Counts are exact
    * BIGINTs map-side; the share ratios (terminating integer quotients)
    * round by exact integer half-up. Pure map + bounded aggregate. */
  /** Term burstiness / clumpiness profile — for each token above a
    * support floor, how CLUMPED are its occurrences across documents
    * (Church–Gale: content words recur within the documents that mention
    * them; function words spread evenly)? Reports per-containing-doc
    * rate tf/df and the Poisson-baseline ratio df / (N·(1−e^{−tf/N})) —
    * under an even Poisson scatter the two match (ratio ≈ 1); a bursty
    * term's observed df falls well short (ratio < 1). Drives topical-
    * keyword vs boilerplate-vocabulary separation without any language
    * resource. One explode → (token, df, tf) with both counts from the
    * same vocab-bounded aggregate; the terminating tf/df and df/N ratios
    * round by exact integer half-up; the e^{−tf/N} baseline is one
    * double tree on exact integers. */
  def termBurstiness(spark: SparkSession, dir: String,
                     minDf: Long = 20L): DataFrame = {
    val stats = nonNull(Lake.documents(spark, dir))
      .select(col("doc_id"), explode(toks).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
    val nDocs = nonNull(Lake.documents(spark, dir))
      .agg(count(lit(1)).as("n_docs"))
    val out = stats.filter(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .withColumn("df_poisson",
        col("n_docs") * (lit(1.0) -
          exp(-(col("tf").cast("double") / col("n_docs")))))
      .select(col("token"), col("df"), col("tf"),
        (expr("(2 * tf * 1000000 + df) div (2 * df)").cast("double") /
          1000000.0).as("tf_per_doc"),
        round(col("df_poisson"), 4).as("df_poisson"),
        // EXEMPT from the ExactRound law: the denominator is
        // exp-bearing (non-terminating), identical double tree both
        // engines — see SURVEY §9f exemption (i)
        round(col("df").cast("double") / col("df_poisson"), 6)
          .as("clumpiness"))
      .orderBy(col("token"))
    out
  }

  def scriptMix(spark: SparkSession, dir: String): DataFrame = {
    def stripped(cls: String): Column =
      length(col("text")) - length(regexp_replace(col("text"), cls, ""))
    val perDoc = nonNull(Lake.documents(spark, dir))
      .select(col("source"),
        length(col("text")).cast("long").as("total"),
        stripped("[a-z]").cast("long").as("lo"),
        stripped("[A-Z]").cast("long").as("up"),
        stripped("[0-9]").cast("long").as("dg"),
        stripped("[ ]").cast("long").as("sp"))
    def share(c: Column): Column =
      (expr(s"(2 * ${c.toString} * 1000000 + total) div (2 * total)")
        .cast("double") / 1000000.0)
    perDoc.groupBy(col("source"))
      .agg(sum(col("total")).as("total"), sum(col("lo")).as("n_lower"),
        sum(col("up")).as("n_upper"), sum(col("dg")).as("n_digit"),
        sum(col("sp")).as("n_space"))
      .withColumn("n_other",
        col("total") - col("n_lower") - col("n_upper") - col("n_digit") -
          col("n_space"))
      .select(col("source"), col("total").as("total_chars"),
        share(col("n_lower")).as("share_lower"),
        share(col("n_upper")).as("share_upper"),
        share(col("n_digit")).as("share_digit"),
        share(col("n_space")).as("share_space"),
        share(col("n_other")).as("share_other"))
      .orderBy(col("source"))
  }

  /** HELD-OUT interpolated Kneser–Ney bigram scoring — the smoothing
    * that separates a real LM-quality proxy from the MLE
    * [[bigramSurprisal]] (which scores any unseen transition −ln 0) and
    * the unigram [[heldoutPerplexity]] (blind to word order): absolute
    * discounting with the freed mass routed to the CONTINUATION
    * distribution (how many distinct contexts a word follows — "Kong"
    * is frequent but only ever follows "Hong", so KN correctly doubts
    * it in fresh contexts).
    *
    * Model (REF = even doc_ids), discount d = ¾ exactly:
    * p(w|v) = max(c(vw)−d, 0)/c(v·) + d·N₁₊(v·)/c(v·) · p_cont(w),
    * p_cont(w) = (N₁₊(·w)+1)/(T+V+1) — add-one floored so unseen
    * continuations stay finite and the vocab sums to 1; an unseen
    * PREFIX backs off to p_cont alone. With d = ¾ the whole ratio
    * clears to (max(4c−3,0)·D + 3·N₁₊(v·)·(N₁₊(·w)+1)) / (4·c(v·)·D),
    * D = T+V+1 — evaluated as ONE double tree feeding the ln (the
    * transcendental exemption; integer staging would overflow int64 at
    * corpus scale), per-bigram −ln p pinned at 6 dp into decimal sums,
    * per-doc mean by exact integer half-up (the surprisal-family law).
    * `n_unseen` (CUR bigrams absent from REF) rides as the exact
    * novelty signal.
    *
    * Scale: all model tables (bigram counts, prefix stats, continuation
    * stats) are vocab-bounded; the probe joins key by bigram/token; the
    * (T, V) totals are a one-row broadcast. */
  def knHeldoutScore(docs: DataFrame, refSlice: Column,
                     curSlice: Column): DataFrame = {
    // fan the filtered (doc_id, is_ref, text) rows out to core
    // parallelism BEFORE the shingle explode: the one-file corpus scans
    // as one task, which serialized the whole tokenize+shingle pass
    // (2×2.3 s single-task jobs at local[32] — AQE races the probe and
    // model branches into the same uncached partition; r14 profile).
    // The exchange moves only the narrow pre-explosion rows. Identity
    // at scale (Par scaladoc).
    val bi = Par.fanOut(
        nonNull(docs).filter((refSlice || curSlice) && size(toks) >= 2)
          .select(col("doc_id"), when(refSlice, 1).otherwise(0).as("is_ref"),
            col("text")))
      .select(col("doc_id"), col("is_ref"),
        explode(shinglesOf(toks, 2)).as("bigram"))
      .select(col("doc_id"), col("is_ref"),
        substring_index(col("bigram"), " ", 1).as("w1"),
        substring_index(col("bigram"), " ", -1).as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val refBi = bi.filter(col("is_ref") === 1)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prefix = refBi.groupBy(col("w1"))
      .agg(sum(col("c")).as("cv"), count(lit(1)).as("n1v"))
    val cont = refBi.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1w"))
    val totals = refBi.agg(count(lit(1)).as("__t"),
      countDistinct(col("w2")).as("__v"))
    val out = bi.filter(col("is_ref") === 0)
      .join(refBi, Seq("w1", "w2"), "left")
      .join(prefix, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("dd", (col("__t") + col("__v") + 1).cast("double"))
      .withColumn("pcn", (coalesce(col("n1w"), lit(0L)) + 1).cast("double"))
      .withColumn("p",
        when(col("cv").isNull, col("pcn") / col("dd"))
          .otherwise(
            (greatest(lit(4L) * coalesce(col("c"), lit(0L)) - 3L, lit(0L))
              .cast("double") * col("dd")
              + lit(3.0) * col("n1v") * col("pcn"))
              / (lit(4.0) * col("cv") * col("dd"))))
      .select(col("doc_id"),
        when(col("c").isNull, 1L).otherwise(0L).as("unseen"),
        round(-log(col("p")), 6).cast(DecimalType(18, 6)).as("neg_logp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("unseen")).as("n_unseen"),
        sum(col("neg_logp")).as("total"))
      // exact integer half-up mean (the surprisal-family tie fix)
      .withColumn("__s", (col("total") * lit(1000000)).cast("long"))
      .select(col("doc_id"), col("n_bigrams"), col("n_unseen"),
        (expr("(2 * __s + 100 * n_bigrams) div (200 * n_bigrams)")
          .cast("double") / 10000.0).as("avg_kn_surprisal"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true) // materialize + release (surprisal discipline)
    refBi.unpersist(false)
    bi.unpersist(false)
    out
  }

  /** Lake-bound registered form — even doc_ids train, odd are scored,
    * the [[heldoutPerplexity]] split convention. */
  def knHeldoutScore(spark: SparkSession, dir: String): DataFrame =
    knHeldoutScore(Lake.documents(spark, dir),
      pmod(col("doc_id"), lit(2)) === 0, pmod(col("doc_id"), lit(2)) === 1)
}
