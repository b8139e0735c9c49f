package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Training-corpus preparation semantics: contamination screening against
  * brute-force ground truth, chunking invariants, split determinism. */
class CorpusOpsSpec extends SparkSpecBase {

  test("contamination matches brute-force 5-gram intersection and broadcasts the benchmark") {
    val docs = Lake.documents(spark, Sf)
    val found = CorpusOps.contamination(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force driver-side
    def grams(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length >= 5) w.sliding(5).map(_.mkString(" ")).toSet else Set(t)
    }
    val all = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> grams(r.getString(1)))
    val bench = all.filter(_._1 < 50)
    val corpus = all.filter(_._1 >= 50)
    val truth = (for {
      (c, cs) <- corpus; (b, bs) <- bench
      shared = (cs & bs).size if shared > 0
    } yield (c, b) -> shared.toLong).toMap
    assert(found == truth,
      s"missed: ${truth.keySet -- found.keySet}; spurious: ${found.keySet -- truth.keySet}")
    // scale shape: benchmark side broadcast, never a product join
    val plan = CorpusOps.contamination(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("hot benchmark shingles are capped with an audit; decontaminate drops exactly the leaked docs") {
    import spark.implicits._
    // every bench doc shares one boilerplate 5-gram ("answer the question
    // as follows please"); uncapped, each corpus doc containing it would
    // join against ALL bench docs
    val boiler = "answer the question as follows please"
    val bench = (0L until 30L).map(i =>
      (i, s"$boiler bench unique ${i} content ${(1 to 10).map(j => s"b${i}_$j").mkString(" ")}"))
    // corpus doc 100 contains the boilerplate only; 101 genuinely leaks
    // bench doc 7's unique content; 102+ are clean
    val corpus = Seq(
      (100L, s"some preface then $boiler and unrelated tail words here"),
      (101L, s"bench unique 7 content ${(1 to 10).map(j => s"b7_$j").mkString(" ")} copied verbatim")) ++
      (102L until 112L).map(i => (i, (1 to 20).map(j => s"c${i}_$j").mkString(" ")))
    val benchDf = bench.toDF("doc_id", "text")
    val corpusDf = corpus.toDF("doc_id", "text")
    // cap of 16 < 30 bench docs: the boilerplate shingles drop, so doc 100
    // reports nothing and doc 101 pairs only with bench doc 7
    val contam = CorpusOps.contamination(corpusDf, benchDf, maxBenchDf = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(contam.forall(_._1 == 101L),
      s"boilerplate-only matches must be capped away, got $contam")
    assert(contam.contains((101L, 7L)), "the genuine leak must survive the cap")
    // the cap is auditable, never silent
    val audit = CorpusOps.hotBenchShingles(benchDf, maxBenchDf = 16).collect()
    assert(audit.nonEmpty && audit.forall(_.getLong(1) > 16),
      "audit must list the dropped boilerplate shingles with their bench df")
    // decontaminate removes exactly the leaked doc, keeps the rest
    val kept = CorpusOps.decontaminate(corpusDf, benchDf, maxBenchDf = 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == corpus.map(_._1).toSet - 101L,
      s"decontaminate must drop only the leaked doc, kept $kept")
  }

  test("chunking covers every token with the declared window and stride") {
    val docs = Lake.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val chunks = CorpusOps.chunk(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .groupBy(_._1)
    assert(chunks.keySet == docs.keySet, "every doc must chunk")
    for ((id, toks) <- docs) {
      val cs = chunks(id).sortBy(_._2)
      val expected = math.max(1, math.ceil((toks.length - 8) / 24.0).toInt)
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks, expected $expected")
      assert(cs.head._4 == toks.head, s"doc $id: first chunk must start at token 0")
      assert(cs.last._5 == toks.last, s"doc $id: last chunk must end at the last token")
      for ((c, k) <- cs.zipWithIndex) {
        assert(c._2 == k, s"doc $id: chunk indices must be dense")
        assert(c._3 <= 32 && c._3 > 0, s"doc $id chunk $k: bad size ${c._3}")
        assert(c._4 == toks(k * 24), s"doc $id chunk $k: wrong window start")
      }
    }
  }

  test("stratified sampling keeps a deterministic per-stratum subset at the target rate") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i => (i, s"s${i % 4}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val rates = Map("s0" -> 1.0, "s1" -> 0.5, "s2" -> 0.25, "s3" -> 0.0)
    def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      CorpusOps.stratifiedSample(df, rates).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val a = keptIds(docs)
    val b = keptIds(docs.repartition(7)) // layout must not matter
    assert(a == b, "sampling decisions must be independent of partitioning")
    val bySrc = docs.filter(col("doc_id").isin(a.toSeq: _*))
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("s0", 0L) == 500L, "rate-1.0 stratum must keep every row")
    assert(!bySrc.contains("s3"), "rate-0 stratum must keep nothing")
    // hash buckets are uniform: observed fractions track the rates
    assert(math.abs(bySrc("s1") / 500.0 - 0.5) < 0.08, s"s1 kept ${bySrc("s1")}/500")
    assert(math.abs(bySrc("s2") / 500.0 - 0.25) < 0.08, s"s2 kept ${bySrc("s2")}/500")
  }

  test("weighted sample is deterministic and overrepresents heavy docs") {
    import org.apache.spark.sql.functions._
    val docs = Lake.documents(spark, Sf)
    val a = CorpusOps.weightedSample(docs, n = 100).collect().map(_.getLong(0)).toSeq
    val b = CorpusOps.weightedSample(docs.repartition(7), n = 100)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "weighted sample must be partitioning-independent")
    assert(a.distinct.size == a.size, "sampling is without replacement")
    val sampleMean = CorpusOps.weightedSample(docs, n = 100)
      .agg(avg(col("weight"))).head().getDouble(0)
    val corpusMean = docs.filter(col("text").isNotNull)
      .agg(avg(size(split(col("text"), " ")))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"token-weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("splits are deterministic, partitioning-independent, and complete") {
    val docs = Lake.documents(spark, Sf)
    def assignments(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      CorpusOps.withSplit(df).select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assignments(docs)
    val b = assignments(docs.repartition(7)) // layout must not matter
    assert(a == b, "split assignment must be independent of partitioning")
    assert(a.size == docs.count(), "every doc gets exactly one split")
    val frac = a.values.groupBy(identity).view.mapValues(_.size.toDouble / a.size).toMap
    assert(frac.keySet == Set("train", "val", "test"), s"got splits ${frac.keySet}")
    assert(math.abs(frac("train") - 0.90) < 0.05, s"train fraction ${frac("train")}")
    assert(frac("val") > 0 && frac("test") > 0)
  }

  test("mixPlan allocates the budget by target fraction and caps at stock") {
    import spark.implicits._
    // three strata: "big" has plenty of tokens, "tiny" cannot fill its share
    val docs = (
      (1 to 50).map(i => (i.toLong, ("w " * 100).trim, "big")) ++
      (51 to 60).map(i => (i.toLong, ("w " * 100).trim, "mid")) ++
      Seq((61L, "one two three", "tiny"))).toDF("doc_id", "text", "source")
    val plan = CorpusOps.mixPlan(docs,
      Map("big" -> 0.2, "mid" -> 0.3, "tiny" -> 0.5), tokenBudget = 2000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(4), r.getLong(5)))).toMap
    // big: 0.2*2000=400 of 5000 → rate 0.08; mid: 600 of 1000 → 0.6;
    // tiny: 1000 wanted, 3 in stock → rate caps at 1, keeps all 3
    assert(plan("big") == ((5000L, 0.08, 400L)), s"big: ${plan("big")}")
    assert(plan("mid") == ((1000L, 0.6, 600L)), s"mid: ${plan("mid")}")
    assert(plan("tiny") == ((3L, 1.0, 3L)), s"tiny: ${plan("tiny")}")
    // an under-filled stratum surfaces as a shortfall, never re-normalizes
    assert(plan.values.map(_._3).sum < 2000L)
  }

  test("epoch expansion realizes the mix plan token-exactly") {
    val docs = Lake.documents(spark, Sf)
    val targets = (0 until 20).map(i => s"src$i" -> (i % 4 + 1) / 50.0).toMap
    // budget ~2× stock: some sources stay sub-epoch (full_epochs = 0,
    // pure fractional top-up), others repeat with a partial extra epoch
    val budget = 30000L
    val plan = CorpusOps.mixEpochs(docs, targets, budget).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(5), r.getLong(6))))
      .toMap
    assert(plan.values.exists(_._1 == 0), "want a pure-fractional source")
    assert(plan.values.exists(_._1 >= 1), "want a repeating source")
    val tok = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length.toLong).toMap
    val exp = CorpusOps.epochExpand(docs, targets, budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // per-source expanded token mass equals the plan's planned_tokens
    val bySource = exp.groupBy(_._2).view.mapValues(_.map(c => tok(c._1)).sum).toMap
    for ((s, (_, _, planned)) <- plan)
      assert(bySource.getOrElse(s, 0L) == planned,
        s"$s expanded ${bySource.getOrElse(s, 0L)} tokens, plan says $planned")
    // each doc's copies are consecutive 0..n-1 with n ∈ {full, full+1}
    for ((doc, copies) <- exp.groupBy(_._1)) {
      val idx = copies.map(_._3).sorted.toSeq
      assert(idx == (0L until idx.size), s"doc $doc copy indices $idx")
      val full = plan(copies.head._2)._1
      assert(idx.size == full || idx.size == full + 1,
        s"doc $doc has ${idx.size} copies, full epochs $full")
    }
  }

  test("length buckets: pad and truncate arithmetic on planted lengths") {
    import spark.implicits._
    val docs = Seq(
      (1L, ("w " * 10).trim),   // 10 tokens → bucket 32, pad 22
      (2L, ("w " * 32).trim),   // boundary: exactly 32 stays in 32
      (3L, ("w " * 600).trim)   // overflow: bucket 512, 88 truncated
    ).toDF("doc_id", "text")
    val out = CorpusOps.lengthBuckets(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(out(32L) == ((2L, 42L, 42L, 22L, 0L)), s"bucket 32: ${out.get(32L)}")
    assert(out(512L) == ((1L, 600L, 512L, 0L, 88L)), s"bucket 512: ${out.get(512L)}")
    assert(!out.contains(64L) && !out.contains(128L))
  }

  test("leakage split keeps near-dup clusters whole; singletons match the plain split") {
    import spark.implicits._
    // plain-split assignment replayed driver-side to pick a doc pair that
    // WOULD straddle the train/test boundary if hashed independently
    def bucket(id: Long): Long = ((id * 48271) % 2147483647) * 48271 % 2147483647 % 100
    def plainSplit(id: Long): String =
      if (bucket(id) < 90) "train" else if (bucket(id) < 95) "val" else "test"
    val ids = 1L to 200L
    val trainId = ids.find(plainSplit(_) == "train").get
    val testId = ids.find(plainSplit(_) == "test").get
    val dupText = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = (Seq((trainId, dupText), (testId, dupText)) ++
      ids.filterNot(i => i == trainId || i == testId)
        .map(i => i -> (1 to 20).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = CorpusOps.leakageSplit(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // the identical pair clusters under the lower id and shares ITS split
    val keeper = math.min(trainId, testId)
    assert(out(trainId) == ((keeper, plainSplit(keeper))))
    assert(out(testId) == ((keeper, plainSplit(keeper))),
      s"near-dup pair straddles splits: ${out(trainId)} vs ${out(testId)}")
    // every singleton is its own keeper with the plain-split assignment
    for (i <- ids if i != trainId && i != testId)
      assert(out(i) == ((i, plainSplit(i))), s"singleton $i moved: ${out(i)}")
  }

  test("train order is a permutation interleaving sources round-robin") {
    import spark.implicits._
    // unequal sources: exhausted sources drop out of later rounds
    val docs = (
      (1 to 5).map(i => (i.toLong, "t", "srcA")) ++
      (6 to 8).map(i => (i.toLong, "t", "srcB")) ++
      Seq((9L, "t", "srcC"))).toDF("doc_id", "text", "source")
    val out = CorpusOps.trainOrder(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._4).sorted.toSeq == (1L to 9L), s"pos not a permutation: ${out.toSeq}")
    // closed-form ordinal ≡ global sort by (rank, source)
    val expected = out.sortBy(t => (t._3, t._2)).map(_._1).toSeq
    assert(out.sortBy(_._4).map(_._1).toSeq == expected)
    // round-robin: every rank-r doc precedes every rank-(r+1) doc
    val posByRank = out.groupBy(_._3).view.mapValues(_.map(_._4)).toMap
    for (r <- 1L until posByRank.keys.max)
      assert(posByRank(r).max < posByRank(r + 1).min,
        s"rank $r does not fully precede rank ${r + 1}")
  }

  test("token waterfill: closed-form level, all-kept and all-capped edges, floor shortfall < m") {
    import spark.implicits._
    // capacities 10 / 20 / 40 tokens
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "s1"),
      (2L, Seq.fill(20)("w").mkString(" "), "s2"),
      (3L, Seq.fill(40)("w").mkString(" "), "s3")
    ).toDF("doc_id", "text", "source")
    def run(budget: Long) = CorpusOps.tokenWaterfill(docs, budget).collect()
      .map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4),
          if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).toMap
    // budget 50: s1+s2 fit under the level, s3 capped at L = (50−30)/1 = 20
    val b50 = run(50L)
    assert(b50("s1") == ((10L, 10L, false, 20.0)), s"s1: ${b50("s1")}")
    assert(b50("s2") == ((20L, 20L, false, 20.0)), s"s2: ${b50("s2")}")
    assert(b50("s3") == ((40L, 20L, true, 20.0)), s"s3: ${b50("s3")}")
    // budget ≥ total stock: everyone keeps everything, no level to report
    val b100 = run(100L)
    assert(b100.values.forall(v => v._1 == v._2 && !v._3 && v._4.isNaN),
      s"uncapped corpus: $b100")
    // budget below m·min: nobody fits whole, L = 15/3 = 5 for all
    val b15 = run(15L)
    assert(b15.values.forall(v => v._2 == 5L && v._3 && v._4 == 5.0),
      s"all-capped: $b15")
    // non-integer level floors: Σ alloc ≤ budget with shortfall < m strata
    val b17 = run(17L)
    val alloc17 = b17.values.map(_._2).sum
    assert(alloc17 <= 17L && 17L - alloc17 < 3, s"conservation: $b17")
    // the relative form at frac = 1.0 is the all-kept edge
    val full = CorpusOps.tokenWaterfillFrac(docs, frac = 1.0).collect()
    assert(full.forall(r => r.getLong(2) == r.getLong(3) && !r.getBoolean(4)))
  }
}
