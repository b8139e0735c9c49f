package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.functions.{BpeTokens, BpeVocab}
import graft.operators.TextOps

/** Real-BPE semantics: hand-checked merges, the priority ≡ rank-order
  * equivalence the DuckDB oracle depends on, and the operator contract. */
class BpeSpec extends SparkSpecBase {

  private def applyPriority(word: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    BpeVocab.applyWord(word, out)
    out.toSeq
  }

  test("hand-checked tokenizations against the shipped merge list") {
    // "the": t+h -> th (rank 0), th+e -> the (rank 10)
    assert(applyPriority("the") == Seq("the"))
    // "them": ... -> the, the+m (rank 49)
    assert(applyPriority("them") == Seq("them"))
    // "forest": r+e (rank 3) beats o+r (8); e+s is consumed by re, s+t (18)
    assert(applyPriority("forest") == Seq("f", "o", "re", "st"))
    // unknown chars stay single
    assert(applyPriority("x9!") == Seq("x", "9", "!"))
    // empty word contributes nothing
    assert(applyPriority("") == Seq.empty)
  }

  test("merge list keeps the learned-order invariant") {
    // every merge's inputs are base chars or outputs of earlier merges —
    // the property that makes rank-order application equal priority BPE
    val produced = scala.collection.mutable.Set.empty[String]
    for (((a, b), i) <- BpeVocab.merges.zipWithIndex) {
      for (t <- Seq(a, b) if t.length > 1)
        assert(produced.contains(t),
          s"merge $i ($a,$b): input '$t' not produced by any earlier merge")
      produced += (a + b)
    }
  }

  test("priority BPE equals rank-order sequential application corpus-wide") {
    // the oracle applies merges as a rank-ordered replace chain; assert
    // the equivalence on every distinct word in the test corpus
    val words = Lake.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .distinct()
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    for (w <- words)
      assert(applyPriority(w) == BpeVocab.applyWordSequential(w),
        s"priority vs sequential disagree on '$w'")
  }

  test("bpeTokenize: counts, boundaries, and concat-invariance") {
    val out = TextOps.bpeTokenize(spark, Sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // token counts are bounded by character count and at least word count
    val joined = TextOps.bpeTokenize(Lake.documents(spark, Sf))
      .join(Lake.documents(spark, Sf).select(col("doc_id"), col("text")), "doc_id")
      .select(col("n_bpe_tokens"), col("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars"))
      .collect()
    joined.foreach { r =>
      assert(r.getLong(0) >= r.getLong(1), "fewer tokens than words")
      assert(r.getLong(0) <= r.getLong(2), "more tokens than characters")
    }
    // tokens reassemble the original words exactly
    val docs = Lake.documents(spark, Sf).filter(col("text").isNotNull).limit(50)
      .select(col("text")).collect().map(_.getString(0))
    for (text <- docs) {
      val toks = ArrayBuffer.empty[String]
      text.split(" ").filter(_.nonEmpty).foreach(BpeVocab.applyWord(_, toks))
      assert(toks.mkString == text.split(" ").filter(_.nonEmpty).mkString,
        "BPE tokens must concatenate back to the input words")
    }
  }

  test("chunk/packing/mix planners accept real BPE token counts") {
    import graft.operators.CorpusOps
    val docs = Lake.documents(spark, Sf)
    val bpeToks = BpeTokens.tokens(col("text"))
    val counts = TextOps.bpeTokenize(spark, Sf)
      .select(col("doc_id"), col("n_bpe_tokens"))

    // packing plan driven by BPE counts: per-doc n_tokens must equal the
    // tokenizer's count
    val packed = CorpusOps.packingPlan(docs,
        tokenCount = size(bpeToks).cast("long"))
      .select(col("doc_id"), col("n_tokens"))
    assert(packed.join(counts, "doc_id")
      .filter(col("n_tokens") =!= col("n_bpe_tokens")).count() == 0)

    // chunking over BPE tokens: chunk token counts sum to the BPE total
    // plus the overlap double-count, and the first boundary token matches
    val ch = CorpusOps.chunk(docs, chunkSize = 32, overlap = 0, tokens = bpeToks)
    val chTotals = ch.groupBy(col("doc_id"))
      .agg(sum(col("n_tokens")).as("chunked_total"))
    assert(chTotals.join(counts, "doc_id")
      .filter(col("chunked_total") =!= col("n_bpe_tokens")).count() == 0)
    val firstChunk = ch.filter(col("chunk_idx") === 0)
      .select(col("doc_id"), col("first_token"))
    val firstTok = TextOps.bpeTokenize(spark, Sf)
      .select(col("doc_id"), col("first_token").as("expect_first"))
    assert(firstChunk.join(firstTok, "doc_id")
      .filter(col("first_token") =!= col("expect_first")).count() == 0)

    // mix plan driven by BPE counts: per-stratum stock equals the summed
    // tokenizer counts
    val targets = (0 until 20).map(i => s"src$i" -> 0.05).toMap
    val mix = CorpusOps.mixPlan(docs, targets, tokenBudget = 1000L,
      tokenCount = size(bpeToks).cast("long"))
    val stock = docs.filter(col("text").isNotNull)
      .join(counts, "doc_id")
      .groupBy(col("source")).agg(sum(col("n_bpe_tokens")).as("expect_tokens"))
    assert(mix.join(stock, "source")
      .filter(col("n_tokens") =!= col("expect_tokens")).count() == 0)
  }

  test("bpeLearn: iteration one equals the pair-count query, merges are prefix-stable and deterministic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new"),
      (3L, "low new wider wide")).toDF("doc_id", "text")
    // iteration one maximizes exactly what bpePairCounts reports
    val topPair = TextOps.bpePairCounts(docs, topK = 1).collect().head.getString(0)
    val learned = TextOps.bpeLearn(docs, nMerges = 8)
    assert(learned.nonEmpty)
    assert(learned.head._1 + learned.head._2 == topPair,
      s"first merge ${learned.head} must fuse the top pair $topPair")
    // deterministic, and a shorter run is a prefix of a longer one (each
    // iteration depends only on the merges before it)
    assert(TextOps.bpeLearn(docs, nMerges = 8) == learned)
    assert(TextOps.bpeLearn(docs, nMerges = 3) == learned.take(3))
    // applying the learned merges in rank order compresses the corpus's
    // own words below character level
    def applySeq(word: String, merges: Seq[(String, String)]): Seq[String] = {
      var toks: List[String] = word.map(String.valueOf(_)).toList
      for ((a, b) <- merges) {
        val out = ArrayBuffer.empty[String]
        var rest = toks
        while (rest.nonEmpty) rest match {
          case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
          case x :: tail => out += x; rest = tail
          case Nil =>
        }
        toks = out.toList
      }
      toks
    }
    val words = Seq("low", "lower", "new", "newest")
    val before = words.map(_.length).sum
    val after = words.map(w => applySeq(w, learned).length).sum
    assert(after < before, s"learned merges must compress: $after !< $before")
  }

  test("bpe_tokens expression is null-safe and plan stays map-only") {
    import spark.implicits._
    val df = Seq((1L, "the forest"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), BpeTokens.tokens(col("t")).as("toks"))
    val got = df.collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(got(1L).get == Seq("the", "f", "o", "re", "st"))
    assert(got(2L).isEmpty)
  }
}
