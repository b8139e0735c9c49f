package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Lake

/** Training-corpus preparation (SURVEY.md §2 items 57–59): benchmark
  * decontamination, token-window chunking, and deterministic dataset
  * splits — the steps between "deduplicated lake" and "training samples"
  * in an LLM data pipeline.
  *
  * Scale design: contamination broadcasts the benchmark side (eval sets
  * are small by nature) so the corpus streams through one shingle pass
  * with a broadcast-hash probe — the only shuffle is the final aggregation
  * over MATCHING rows (a vanishing fraction of the corpus). Chunking and
  * splitting are pure map stages (explode / hash), no shuffle at all.
  */
object CorpusOps {

  /** (doc_id, n-gram) pairs for one side of the screen. */
  private def benchShingles(df: DataFrame, idAs: String, n: Int): DataFrame =
    df.filter(col("text").isNotNull)
      .select(col("doc_id").as(idAs), split(col("text"), " ").as("__toks"))
      .select(col(idAs),
        explode(array_distinct(TextOps.shinglesOf(col("__toks"), n)))
          .as("shingle"))

  /** Hot-shingle guard: a benchmark n-gram present in more than
    * `maxBenchDf` bench docs is boilerplate (license lines, shared
    * prompts), carries no contamination signal, and would multiply every
    * matching corpus row by its document frequency. Dropped from the
    * probe — never silently: [[hotBenchShingles]] audits what the cap
    * removed. The window runs over the (small, broadcastable) bench side
    * only. */
  private def cappedBenchShingles(bench: DataFrame, n: Int, maxBenchDf: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
    benchShingles(bench, "bench_id", n)
      .withColumn("__df", count(lit(1)).over(w))
      .filter(col("__df") <= maxBenchDf)
      .drop("__df")
  }

  /** Audit query for [[contamination]]'s hot-shingle guard: every bench
    * n-gram the cap dropped, with its bench document frequency. */
  def hotBenchShingles(bench: DataFrame, n: Int = 5, maxBenchDf: Int = 16): DataFrame =
    benchShingles(bench, "bench_id", n)
      .groupBy(col("shingle")).agg(count(lit(1)).as("bench_df"))
      .filter(col("bench_df") > maxBenchDf)
      .orderBy(col("bench_df").desc, col("shingle"))

  /** Benchmark-contamination screen: every (corpus doc, benchmark doc)
    * pair sharing at least one word-`n`-gram, with the count of shared
    * distinct n-grams. Training corpora must drop (or at least flag) docs
    * that leak eval benchmarks; n-gram overlap is the standard screen.
    * Both sides' shingles are per-doc distinct, so `n_shared` equals the
    * size of the n-gram set intersection — exactly what the DuckDB oracle
    * computes by brute force. */
  def contamination(corpus: DataFrame, bench: DataFrame, n: Int = 5,
                    maxBenchDf: Int = 16): DataFrame =
    benchShingles(corpus, "doc_id", n)
      .join(broadcast(cappedBenchShingles(bench, n, maxBenchDf)), "shingle")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("doc_id"), col("bench_id"))

  /** Lake-bound form: docs 0–49 stand in for the benchmark set. */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Lake.documents(spark, dir)
    contamination(docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50))
  }

  /** The CLEAN corpus: every corpus row sharing at least `minShared`
    * n-grams with some benchmark doc is dropped (left-anti against the
    * contaminated id set — tiny, since contamination is rare by
    * construction); everything else streams through untouched. The
    * filter-shaped counterpart of the [[contamination]] report. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, minShared: Int = 1,
                    n: Int = 5, maxBenchDf: Int = 16): DataFrame = {
    val contaminated = contamination(corpus, bench, n, maxBenchDf)
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id")).distinct()
    corpus.join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Lake-bound driver form of [[decontaminate]]: the clean corpus rows
    * (narrow projection, stable order). */
  def decontaminateQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Lake.documents(spark, dir)
    decontaminate(docs.filter(col("doc_id") >= 50), docs.filter(col("doc_id") < 50))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-size token-window chunking with overlap — doc → training-sample
    * windows. Stride = chunkSize − overlap; a doc yields
    * max(1, ceil((nTokens − overlap) / stride)) chunks, the last one
    * possibly short. Emits chunk stats + boundary tokens (not the chunk
    * text itself, so the result stays narrow; slice the tokens the same
    * way to materialize text). Pure codegen'd array ops, map-side only. */
  def chunk(docs: DataFrame, chunkSize: Int = 32, overlap: Int = 8,
            tokens: Column = split(col("text"), " ")): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val t = tokens
    val nChunks = greatest(lit(1L),
      ceil((size(t).cast("double") - overlap) / stride).cast("long"))
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), t.as("t"), nChunks.as("nc"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), col("nc") - 1),
          i => slice(col("t"), (i * stride + 1).cast("int"), lit(chunkSize)))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        size(col("col")).cast("long").as("n_tokens"),
        element_at(col("col"), 1).as("first_token"),
        element_at(col("col"), -1).as("last_token"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  def chunk(spark: SparkSession, dir: String): DataFrame =
    chunk(Lake.documents(spark, dir))

  /** Deterministic train/val/test assignment: bucket = hash of the stable
    * doc id, NOT `rand()` (re-drawn on task retry → rows silently change
    * split) and NOT `doc_id % 100` (correlated with any id-ordered
    * property). Same doc → same split, on any cluster, forever. Percents
    * are integer points of 100. */
  def withSplit(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "need train + val < 100 with a nonempty test remainder")
    docs.withColumn("split", splitFor(col("doc_id"), trainPct, valPct))
  }

  /** The split assignment itself, as a column over ANY stable id — TWO
    * Lehmer/MINSTD steps (plain 63-bit-safe integer arithmetic any
    * engine reproduces exactly — same portability argument as
    * [[sampleBucket]]) rather than xxhash64: split assignment becomes
    * oracle-verifiable, and the second step decorrelates the split from
    * the sampling bucket so "in the sample" never biases "in val". */
  def splitFor(id: Column, trainPct: Int, valPct: Int): Column = {
    val step1 = pmod(id * lit(48271L), lit(2147483647L))
    val bucket = pmod(step1 * lit(48271L), lit(2147483647L)) % 100
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Driver query: split sizes (portable-hash assignment, so the DuckDB
    * oracle reproduces the exact same buckets). */
  def splitCounts(spark: SparkSession, dir: String): DataFrame =
    withSplit(Lake.documents(spark, dir))
      .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("split"))

  /** Sequence-packing plan: where each doc's tokens land when the corpus
    * is concatenated in doc order and cut into fixed `seqLen` training
    * sequences — per doc, its start offset in the packed stream and the
    * first/last sequence it spans (the concat-and-chunk layout GPT-style
    * pretraining uses; docs cross sequence boundaries rather than pad).
    *
    * Scale shape: a GLOBAL prefix sum is inherently sequential, so the
    * stream is sharded into `bucketSize`-doc buckets and sequences never
    * cross bucket boundaries — the window partitions by bucket and runs
    * fully parallel, at the cost of one partial sequence per bucket
    * (negligible padding at any real bucket size). */
  def packingPlan(docs: DataFrame, seqLen: Int = 128,
                  bucketSize: Int = 100,
                  tokenCount: Column =
                    size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(seqLen > 0 && bucketSize > 0, "seqLen and bucketSize must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        // integer `div`, not double `/`: exact at any stream length
        expr(s"doc_id div $bucketSize").as("bucket"),
        tokenCount.as("n_tokens"))
      .withColumn("start_offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("doc_id"), col("bucket"), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div $seqLen").as("first_seq"),
        expr(s"(start_offset + n_tokens - 1) div $seqLen").as("last_seq"))
      .orderBy(col("doc_id"))
  }

  def packingPlan(spark: SparkSession, dir: String): DataFrame =
    packingPlan(Lake.documents(spark, dir))

  /** Domain-mixing rate plan: given target mixture fractions per stratum
    * and a total token budget, the per-stratum sampling rate that hits
    * the budget — the planning step a pipeline runs BEFORE
    * [[stratifiedSample]]. rate = min(1, budget·frac / stock): a stratum
    * short of its allocation keeps everything (mixing cannot mint data;
    * the shortfall surfaces in planned_tokens rather than silently
    * re-normalizing). One aggregate pass over the corpus (map-side
    * partial agg to stratum cardinality) + a broadcast of the tiny
    * target table; strata absent from `targets` get no row (rate 0).
    * Entirely SQL-expressible, so the plan is oracle-checkable. */
  def mixPlan(docs: DataFrame, targets: Map[String, Double],
              tokenBudget: Long, strataCol: String = "source",
              tokenCount: Column =
                size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(targets.values.forall(f => f >= 0.0 && f <= 1.0) &&
      math.abs(targets.values.sum - 1.0) < 1e-9,
      "target fractions must form a distribution")
    val spark = docs.sparkSession
    import spark.implicits._
    val t = targets.toSeq.toDF(strataCol, "target_frac")
    docs.filter(col("text").isNotNull)
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount).as("n_tokens"))
      .join(broadcast(t), Seq(strataCol))
      .select(
        col(strataCol), col("n_docs"), col("n_tokens"), col("target_frac"),
        round(least(lit(1.0),
          lit(tokenBudget.toDouble) * col("target_frac") / col("n_tokens")), 6)
          .as("rate"),
        floor(least(col("n_tokens").cast("double"),
          lit(tokenBudget.toDouble) * col("target_frac"))).cast("long")
          .as("planned_tokens"))
      .orderBy(col(strataCol))
  }

  /** Lake-bound driver form: targets proportional to (suffix mod 4 + 1)
    * over the 20 sources (sums to 1 exactly), budget small enough that
    * high-stock strata cap while low-stock strata keep everything. */
  def mixPlanQuery(spark: SparkSession, dir: String): DataFrame = {
    val targets = (0 until 20).map(i => s"src$i" -> (i % 4 + 1) / 50.0).toMap
    mixPlan(Lake.documents(spark, dir), targets, tokenBudget = 20000L)
  }

  /** Token-budget waterfilling: the TARGET-FREE complement of [[mixPlan]]
    * — with no desired mixture in hand, allocate a token budget across
    * sources max-min fairly: find the water level L with
    * Σ min(stock_i, L) = budget, give every source min(stock, ⌊L⌋).
    * Small sources keep everything; large sources are capped at the
    * common level — the standard guard against one mega-crawl drowning
    * the mixture. Closed form, no iteration: sort strata by stock
    * ascending, a source is UNCAPPED iff filling it and everything
    * smaller still leaves ≥ stock_i for each larger source
    * (cum_i + (m−i)·stock_i ≤ budget); with k = the last uncapped rank
    * and S_k its cumulative stock, L = (budget − S_k)/(m − k). When the
    * budget covers total stock, every source is uncapped and the level
    * is NULL (nothing to cap).
    *
    * Shape: one corpus aggregate (map-side combinable) down to a
    * #strata-row frame; every window runs over that domain-constant
    * frame, never the corpus — the [[mixPlan]]/Benford frame argument.
    * All comparisons are exact BIGINT arithmetic ((m−i)·stock stays
    * ≤ strata×stock ≪ 2⁶³); only the final level divide is double. */
  def tokenWaterfill(docs: DataFrame, tokenBudget: Long,
                     strataCol: String = "source",
                     tokenCount: Column =
                       size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    waterfillCore(docs, _ => lit(tokenBudget), strataCol, tokenCount)
  }

  /** Relative-budget form: budget = ⌊frac · total stock⌋, computed
    * IN-PLAN from the same strata frame (no driver-side action) — the
    * scale-covariant shape ("keep 96% of the corpus, shave the biggest
    * sources down to a common level") whose capped/kept split survives
    * any SF, unlike an absolute token number. */
  def tokenWaterfillFrac(docs: DataFrame, frac: Double = 0.96,
                         strataCol: String = "source",
                         tokenCount: Column =
                           size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(frac > 0 && frac <= 1.0, "frac must be in (0, 1]")
    waterfillCore(docs, total => floor(lit(frac) * total).cast("long"),
      strataCol, tokenCount)
  }

  private def waterfillCore(docs: DataFrame, budgetOf: Column => Column,
                            strataCol: String,
                            tokenCount: Column): DataFrame = {
    val wOrd = Window.orderBy(col("n_tokens"), col(strataCol))
    val wAll = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    docs.filter(col("text").isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).as("n_tokens"))
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("cum", sum(col("n_tokens")).over(wOrd))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("budget", budgetOf(sum(col("n_tokens")).over(wAll)))
      .withColumn("uncapped",
        col("cum") + (col("m") - col("rk")) * col("n_tokens")
          <= col("budget"))
      .withColumn("k",
        max(when(col("uncapped"), col("rk")).otherwise(0)).over(wAll))
      .withColumn("s_k",
        max(when(col("uncapped"), col("cum")).otherwise(0L)).over(wAll))
      .withColumn("level", when(col("k") < col("m"),
        (col("budget") - col("s_k")).cast("double") /
          (col("m") - col("k"))))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        when(col("rk") <= col("k"), col("n_tokens"))
          .otherwise(floor(col("level")).cast("long")).as("alloc_tokens"),
        (col("rk") > col("k")).as("capped"),
        round(col("level"), 4).as("water_level"))
      .orderBy(col(strataCol))
  }

  /** Lake-bound driver form: 96% of total stock — inside the partial-cap
    * band at every SF of this near-uniform synthetic corpus (m·min/total
    * ranges 0.84–0.93), so small-kept AND large-capped branches are both
    * exercised wherever the driver runs it. */
  def tokenWaterfillQuery(spark: SparkSession, dir: String): DataFrame =
    tokenWaterfillFrac(Lake.documents(spark, dir), frac = 0.96)

  /** Epoch-aware mixing: [[mixPlan]] caps each source's rate at 1.0 —
    * this is its up-sampling complement for when a source's target
    * EXCEEDS its stock (the low-resource-language / high-quality-source
    * case): repeat the source in FULL epochs plus a deterministic
    * fractional top-up epoch, capped at `maxEpochs` (unbounded repetition
    * of a small source degrades models faster than it fills the budget).
    * The top-up is doc-level and portable: a doc joins the partial epoch
    * iff its [[sampleBucket]] clears the fractional threshold, so
    * planned_tokens is an EXACT token count, not rate×stock arithmetic.
    *
    * Two corpus passes by necessity (the fractional threshold is a
    * function of the per-source aggregate, so the top-up sum cannot fold
    * into the same aggregation); both are map-side-combinable aggregates,
    * and the rate table between them is broadcast-tiny. */
  def mixEpochs(docs: DataFrame, targets: Map[String, Double],
                tokenBudget: Long, maxEpochs: Int = 4,
                strataCol: String = "source",
                tokenCount: Column =
                  size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(maxEpochs >= 1, "need at least one epoch")
    val d = docs.filter(col("text").isNotNull)
      .select(col(strataCol), tokenCount.as("__tok"), sampleBucket.as("__bucket"))
    // the rate table is source-cardinality-bounded but derives from a
    // corpus aggregate; persisted so its two consumers (top-up join +
    // final join) pay that scan once (bounded frame — ContextCleaner
    // reclaims it, the supplierShare precedent)
    val stock = epochRates(docs, targets, tokenBudget, maxEpochs, strataCol,
      tokenCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val topup = d.join(broadcast(stock.select(col(strataCol), col("__th"))),
        Seq(strataCol))
      .groupBy(col(strataCol))
      .agg(coalesce(sum(when(col("__bucket") < col("__th"), col("__tok"))),
        lit(0L)).as("topup_tokens"))
    stock.join(topup, Seq(strataCol))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        col("full_epochs"), round(col("__topup"), 6).as("topup_rate"),
        col("topup_tokens"),
        (col("full_epochs") * col("n_tokens") + col("topup_tokens"))
          .as("planned_tokens"))
      .orderBy(col(strataCol))
  }

  /** The per-source rate table both [[mixEpochs]] and [[epochExpand]]
    * derive from: effective epochs (capped), full epochs, and the
    * UNROUNDED fractional-top-up bucket threshold — shared so the plan
    * and the expansion can never disagree at a rounding boundary. */
  private def epochRates(docs: DataFrame, targets: Map[String, Double],
                         tokenBudget: Long, maxEpochs: Int,
                         strataCol: String,
                         tokenCount: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = targets.toSeq.toDF(strataCol, "target_frac")
    docs.filter(col("text").isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokenCount).as("n_tokens"))
      .join(broadcast(t), Seq(strataCol))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        least(lit(tokenBudget.toDouble) * col("target_frac") / col("n_tokens"),
          lit(maxEpochs.toDouble)).as("__eff"))
      .select(col(strataCol), col("n_docs"), col("n_tokens"),
        floor(col("__eff")).cast("long").as("full_epochs"),
        (col("__eff") - floor(col("__eff"))).as("__topup"))
      .withColumn("__th", floor(col("__topup") * 10000).cast("long"))
  }

  /** Doc-level expansion of [[mixEpochs]]: one (doc_id, copy_idx) row per
    * planned copy — full epochs for every doc, plus the top-up copy for
    * docs clearing the fractional threshold. Pure map-side explode
    * against the broadcast rate table; per-source token sums equal the
    * plan's planned_tokens exactly (spec-asserted). */
  def epochExpand(docs: DataFrame, targets: Map[String, Double],
                  tokenBudget: Long, maxEpochs: Int = 4,
                  strataCol: String = "source",
                  tokenCount: Column =
                    size(split(col("text"), " ")).cast("long")): DataFrame = {
    val plan = epochRates(docs, targets, tokenBudget, maxEpochs, strataCol,
      tokenCount)
      .select(col(strataCol), col("full_epochs"), col("__th"))
    docs.filter(col("text").isNotNull)
      .join(broadcast(plan), Seq(strataCol))
      .withColumn("__n_copies",
        col("full_epochs") +
          when(sampleBucket < col("__th"), lit(1L)).otherwise(lit(0L)))
      .filter(col("__n_copies") > 0)
      .select(col("doc_id"), col(strataCol),
        explode(sequence(lit(0L), col("__n_copies") - 1)).as("copy_idx"))
  }

  /** Lake-bound driver form: same suffix-proportional targets as
    * [[mixPlanQuery]] but a 30× budget, so every source up-samples —
    * high-target sources hit the 4-epoch cap, low-target ones land on
    * full+fractional epochs. */
  def mixEpochsQuery(spark: SparkSession, dir: String): DataFrame = {
    val targets = (0 until 20).map(i => s"src$i" -> (i % 4 + 1) / 50.0).toMap
    mixEpochs(Lake.documents(spark, dir), targets, tokenBudget = 600000L)
  }

  /** Sequence-length bucket report: docs assigned to power-of-two-ish
    * length buckets (the dynamic-batching prep), with the padding waste
    * a pad-to-bucket-bound batcher would pay and the token mass a
    * truncate-at-the-largest-bound policy would cut. Everything is
    * integer arithmetic over token counts — engine-exact — and one
    * map-side-combinable aggregate; the bucket set is bounded by the
    * edge list, not the corpus. */
  def lengthBuckets(docs: DataFrame,
                    edges: Seq[Long] = Seq(32L, 64L, 128L, 256L, 512L),
                    tokenCount: Column =
                      size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted && edges.distinct == edges,
      "bucket edges must be ascending and distinct")
    val t = col("__tok")
    val bound = edges.init.foldRight(lit(edges.last): Column)(
      (e, acc) => when(t <= e, lit(e)).otherwise(acc))
    docs.filter(col("text").isNotNull)
      .select(tokenCount.as("__tok"))
      .select(bound.as("bucket"), t)
      .withColumn("__kept", least(t, col("bucket")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(t).as("sum_tokens"),
        sum(col("__kept")).as("kept_tokens"),
        (sum(col("bucket") - col("__kept"))).as("pad_tokens"),
        sum(t - col("__kept")).as("truncated_tokens"))
      .select(col("bucket"), col("n_docs"), col("sum_tokens"),
        col("kept_tokens"), col("pad_tokens"), col("truncated_tokens"),
        // int/int ratio → exact integer half-up ([[ExactRound]])
        (ExactRound.halfUpPos("10000 * pad_tokens", "bucket * n_docs")
          .cast("double") / 1e4).as("pad_waste_rate"))
      .orderBy(col("bucket"))
  }

  def lengthBucketsQuery(spark: SparkSession, dir: String): DataFrame =
    lengthBuckets(Lake.documents(spark, dir))

  /** Stable per-doc sampling bucket in [0, 10000): a Lehmer/MINSTD step
    * ((id * 48271) mod 2^31−1) reduced mod 10000 — plain integer
    * arithmetic any engine reproduces exactly, so sampling decisions are
    * portable and verifiable, unlike `rand()` (re-drawn on task retry →
    * silent row changes) or `doc_id % N` (correlated with id order).
    * Ids must stay below 2^63 / 48271 ≈ 1.9·10^14 — comfortably above any
    * real corpus. */
  def sampleBucket: org.apache.spark.sql.Column =
    pmod(col("doc_id") * lit(48271L), lit(2147483647L)) % 10000

  /** Exact-size deterministic sample per stratum: rank rows within each
    * stratum by the portable [[sampleBucket]] (doc_id tie-break) and keep
    * the first `n` — when the contract is "exactly N docs per source"
    * rather than [[stratifiedSample]]'s "rate r of each source". One
    * window shuffle keyed by stratum; the hash order makes the pick
    * uniform-ish, retry-stable, partitioning-independent, and — unlike
    * rand()-based reservoirs — reproducible by any engine. */
  def fixedSample(docs: DataFrame, n: Int,
                  strataCol: String = "source"): DataFrame = {
    require(n > 0, "sample size must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(sampleBucket, col("doc_id"))
    docs.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= n)
      .drop("__r")
  }

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis): each doc draws key = ln(u)/w from a portable
    * uniform u (the [[sampleBucket]] Lehmer hash, so the draw is
    * retry-stable and engine-reproducible) and the n LARGEST keys win —
    * inclusion probability proportional to weight, here token count
    * ("longer docs carry more training signal"). The plan is a map stage
    * + TakeOrderedAndProject: no shuffle of the corpus, no global sort.
    * Keys are rounded to 8 dp before ranking so the cross-engine ln()
    * agreement (~1 ulp) can never reorder the cutoff. */
  def weightedSample(docs: DataFrame, n: Int,
                     weight: Column =
                       size(split(col("text"), " ")).cast("long")): DataFrame = {
    require(n > 0, "sample size must be positive")
    val u = (sampleBucket.cast("double") + lit(0.5)) / lit(10000.0)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), weight.as("weight"),
        round(log(u) / weight.cast("double"), 8).as("sample_key"))
      .filter(col("weight") > 0)
      .orderBy(col("sample_key").desc, col("doc_id"))
      .limit(n)
  }

  def weightedSampleQuery(spark: SparkSession, dir: String): DataFrame =
    weightedSample(Lake.documents(spark, dir), n = 100)

  /** Domain mixing / deterministic stratified downsampling: keep each row
    * of stratum s iff its [[sampleBucket]] < rates(s)·10000 — the
    * "re-weight sources for training" step of a data pipeline. The rate
    * table is broadcast (strata counts are tiny by nature); rows of
    * strata absent from `rates` are dropped. Pure map-side decision: no
    * shuffle, retry-stable, and the same doc set is kept on ANY cluster
    * or partitioning. Rates are basis points of 10000, so quarter-percent
    * granularity is exact in integer space. */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Double],
                       strataCol: String = "source"): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "sampling rates must be within [0, 1]")
    val spark = docs.sparkSession
    import spark.implicits._
    val rateRows = rates.toSeq.toDF(strataCol, "__rate")
    docs.join(broadcast(rateRows), strataCol)
      .filter(sampleBucket < (col("__rate") * 10000).cast("long"))
      .drop("__rate")
  }

  /** Lake-bound driver form: src0–src19 sampled at 25/50/75/100% by
    * numeric suffix mod 4 — every rate tier exercised, every decision
    * reproducible by the oracle's integer arithmetic. */
  def stratifiedSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    val rates = (0 until 20).map(i => s"src$i" -> ((i % 4 + 1) * 0.25)).toMap
    stratifiedSample(Lake.documents(spark, dir), rates)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Leakage-safe train/val/test split: hash the near-dup CLUSTER keeper,
    * not the doc — every member of a near-duplicate cluster lands in the
    * same split, so a paraphrase of a training doc can never leak into
    * val/test and inflate eval (the contamination mode plain
    * [[withSplit]] cannot prevent: two 0.9-Jaccard docs hash
    * independently and straddle the boundary ~10% of the time).
    * Singleton docs (no near-dup) keep keeper = doc_id, so their
    * assignment is IDENTICAL to [[withSplit]] — adopting the leakage-safe
    * split reshuffles only clustered docs.
    *
    * Scale shape: inherits [[DedupOps.nearDupClusters]]'s bucketed
    * LSH + connected-components machinery (no all-pairs anywhere); the
    * split itself is one broadcast-free left join on doc_id plus pure
    * per-row arithmetic. */
  def leakageSplit(docs: DataFrame, threshold: Double = 0.6,
                   trainPct: Int = 90, valPct: Int = 5): DataFrame =
    leakageSplitFromClusters(docs,
      DedupOps.nearDupClusters(docs, threshold), trainPct, valPct)

  /** Core with the cluster frame supplied — the lake-bound form feeds
    * the shared [[DedupOps]] artifact-backed clusters so the split does
    * not re-run the LSH pipeline. */
  def leakageSplitFromClusters(docs: DataFrame, clusters0: DataFrame,
                               trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val clusters = clusters0.select(col("doc_id"), col("keeper"))
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keeper"), col("doc_id")).as("keeper"))
      .withColumn("split", splitFor(col("keeper"), trainPct, valPct))
      .orderBy(col("doc_id"))
  }

  def leakageSplitQuery(spark: SparkSession, dir: String): DataFrame =
    leakageSplitFromClusters(Lake.documents(spark, dir),
      DedupOps.nearDupClusters(spark, dir))

  /** Deterministic training order: a reproducible global shuffle with
    * exact round-robin source interleave — the step between "cleaned
    * corpus" and "packed sequences" that fixes WHICH doc is seen when.
    * Within each source, docs are permuted by a third Lehmer step of the
    * id (decorrelated from both the sampling bucket and the split);
    * across sources, position r of every source precedes position r+1 of
    * any source, so no window of the stream over- or under-samples a
    * source by more than the source-count imbalance.
    *
    * Scale shape: the global ordinal is NOT a global window (a
    * single-partition sort at corpus scale). With per-source counts n_s
    * (one tiny broadcast — source cardinality is bounded), the ordinal
    * of (source s, rank r) is closed-form:
    *   pos = Σ_{s'} min(r−1, n_{s'}) + #{s' < s : n_{s'} ≥ r} + 1
    * — per-row arithmetic against a broadcast, fully parallel. The
    * DuckDB oracle computes the same pos as a global row_number(), so
    * the equality check PROVES the arithmetic. The per-source rank
    * window shards like [[packingPlan]]'s buckets at 100 TB. */
  def trainOrder(docs: DataFrame): DataFrame = {
    val s1 = pmod(col("doc_id") * lit(48271L), lit(2147483647L))
    val s2 = pmod(s1 * lit(48271L), lit(2147483647L))
    val s3 = pmod(s2 * lit(48271L), lit(2147483647L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("__shuf"), col("doc_id"))
    val ranked = docs
      .select(col("doc_id"), col("source"), s3.as("__shuf"))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .drop("__shuf")
    // counts come straight from the source column — deriving them from
    // `ranked` would execute the rank window a second time
    val cnts = docs.groupBy(col("source").as("__src"))
      .agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(cnts))
      .groupBy(col("doc_id"), col("source"), col("src_rank"))
      .agg((sum(least(col("src_rank") - 1, col("__n"))) +
        sum(when(col("__src") < col("source") &&
          col("__n") >= col("src_rank"), lit(1L)).otherwise(lit(0L))) +
        lit(1L)).as("pos"))
      .orderBy(col("pos"))
  }

  def trainOrderQuery(spark: SparkSession, dir: String): DataFrame =
    trainOrder(Lake.documents(spark, dir))

  /** Neyman (optimal-allocation) sampling plan: for a total budget of `n`
    * sampled docs, each stratum's share is proportional to N_h·σ_h — big
    * AND internally-varied strata get more of the budget than
    * proportional allocation would give, which minimizes the variance of
    * the estimated corpus mean (the classical survey-sampling result).
    * Complements [[mixPlan]] (budget split by POLICY weights) with a
    * budget split by measured VARIANCE.
    *
    * Exactness: per-stratum Σx and Σx² accumulate as exact integers, the
    * population variance numerator N·Σx² − (Σx)² is formed in
    * decimal(38,0) (the square would overflow bigint), and each
    * N_h·σ_h term is rounded once and re-summed in decimal — so the
    * total is aggregation-order-free and the final share division is the
    * only unordered double op, fed identical inputs in any engine. */
  def neymanPlan(docs: DataFrame, budget: Long = 1000,
                 valueCol: String = "n_chars",
                 strataCol: String = "source"): DataFrame = {
    val perSrc = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(valueCol)).as("sx"),
        sum(col(valueCol) * col(valueCol)).as("sxx"))
      .withColumn("var_num",
        col("n_docs").cast("decimal(38,0)") * col("sxx").cast("decimal(38,0)") -
          col("sx").cast("decimal(38,0)") * col("sx").cast("decimal(38,0)"))
      .withColumn("sd",
        sqrt(col("var_num").cast("double")) / col("n_docs").cast("double"))
      .withColumn("nh_sigma",
        round(col("n_docs") * col("sd"), 6).cast("decimal(28,6)"))
    // total via an unpartitioned window over the stratum-count-bounded
    // frame — a separate .agg() would re-run the corpus scan + group-by
    perSrc
      .withColumn("total_ns", sum(col("nh_sigma"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("alloc_share",
        col("nh_sigma").cast("double") / col("total_ns").cast("double"))
      .select(col(strataCol), col("n_docs"),
        round(col("sd"), 4).as("sd"),
        round(col("alloc_share"), 6).as("alloc_share"),
        round(col("alloc_share") * budget).cast("long").as("n_alloc"))
      .orderBy(col(strataCol))
  }

  def neymanQuery(spark: SparkSession, dir: String): DataFrame =
    neymanPlan(Lake.documents(spark, dir))

  /** Importance weights toward a TARGET mixture (domain-reweighting, the
    * DoReMi-style knob): per stratum, weight = target_share /
    * observed_share, clipped to [1/maxW, maxW] so no stratum explodes
    * the variance of a weighted objective. Default target is the uniform
    * mixture over observed strata — "every source counts equally" — with
    * the target share derived from the stratum count via a window over
    * the BOUNDED aggregated frame (one corpus scan total). The clip is
    * reported next to the raw weight so the truncation is visible, not
    * silent. */
  def importanceWeights(docs: DataFrame, strataCol: String = "source",
                        maxW: Double = 10.0): DataFrame = {
    require(maxW >= 1.0, "the clip bound must be >= 1")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("n_total", sum(col("n_docs")).over(wAll))
      .withColumn("n_strata", count(lit(1)).over(wAll))
      // all four readouts are terminating integer ratios → exact
      // integer half-up ([[ExactRound]]): obs = n/N, target = 1/k,
      // raw_w = N/(k·n); the clip bounds (maxW, 1/maxW) are 6-dp
      // representable, so clipping the 6-dp value equals rounding the
      // clipped exact value (round is monotone)
      .withColumn("w6",
        ExactRound.halfUpPos("1000000 * n_total", "n_strata * n_docs"))
      .select(col(strataCol), col("n_docs"),
        (ExactRound.halfUpPos("1000000 * n_docs", "n_total")
          .cast("double") / 1e6).as("obs_share"),
        (ExactRound.halfUpPos("1000000", "n_strata")
          .cast("double") / 1e6).as("target_share"),
        (col("w6").cast("double") / 1e6).as("raw_w"),
        (least(greatest(col("w6"), lit(math.round(1e6 / maxW))),
          lit(math.round(maxW * 1e6))).cast("double") / 1e6).as("weight"))
      .orderBy(col(strataCol))
  }

  def importanceWeightsQuery(spark: SparkSession, dir: String): DataFrame =
    importanceWeights(Lake.documents(spark, dir))
}
