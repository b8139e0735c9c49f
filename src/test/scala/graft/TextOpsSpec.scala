package graft

import graft.operators.TextOps

/** Text-analysis semantics not covered by the SQL oracle. */
class TextOpsSpec extends SparkSpecBase {

  test("hash embeddings are unit-norm, feed the ANN stack, and pull textual near-dups together") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "spark table scan join filter merge sort window"),
      (2L, "spark table scan join filter merge sort group"), // 7/8 tokens shared
      (3L, "alpha beta gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val emb = TextOps.hashEmbed(docs)
    val rows = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(rows.values.forall(_.length == 16), "dense 16-dim vectors")
    for ((id, v) <- rows) {
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 0.01, s"doc $id norm $norm not ~1")
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum /
        (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    assert(cos(rows(1L), rows(2L)) > cos(rows(1L), rows(3L)) + 0.3,
      "near-dup text must be far closer than unrelated text")
    // the dense shape drops straight into the ANN operators
    val q = emb.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val nn = graft.operators.AnnOps.bruteForce(emb, q, k = 1).collect()
    assert(nn.length == 1 && nn.head.getLong(1) == 2L,
      s"doc 1's nearest hashed neighbor must be its near-copy: ${nn.toSeq}")
  }

  test("duplicated spans: copied passage marked in the copy only, first occurrence clean") {
    import spark.implicits._
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val passage = words("p", 12) // 12 shared tokens → three 10-gram starts
    val docs = Seq(
      // doc 1: the ORIGINAL — unique preamble + the passage
      (1L, words("a", 8) + " " + passage),
      // doc 2: copies the passage inside its own unique text
      (2L, words("b", 8) + " " + passage + " " + words("c", 8)),
      // doc 3: fully unique, long enough to shingle
      (3L, words("d", 25)),
      // doc 4: too short for any 10-gram span
      (4L, words("e", 5))
    ).toDF("doc_id", "text")
    val out = TextOps.duplicatedSpans(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // first occurrence (doc 1, global (doc_id, pos) order) is never marked
    assert(out(1L) == (20L, 0L, 0.0), s"doc1: ${out(1L)}")
    // the copy: exactly the 12 passage tokens are covered (3 dup 10-gram
    // starts at positions 8,9,10 → union covers positions 8..19)
    assert(out(2L) == (28L, 12L, 0.4286), s"doc2: ${out(2L)}")
    assert(out(3L) == (25L, 0L, 0.0))
    assert(out(4L) == (5L, 0L, 0.0))
  }

  test("domain quality gate: Wilson bound keeps the evidenced source, withholds judgment on tiny samples") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // "good" text passes qualityRules (30 distinct tokens); "bad" is one
    // token repeated (top_ratio 1.0)
    def good(seed: Int): String = (0 until 30).map(i => s"w${seed}_$i").mkString(" ")
    val bad = ("x " * 30).trim
    val rows =
      (0 until 40).map(i => (i.toLong, good(i), "solid.example")) ++       // 40/40 keep
      Seq((100L, good(100), "tiny.example"), (101L, bad, "tiny.example")) ++ // 1/2 keep
      (0 until 40).map(i => (200L + i, bad, "junk.example"))               // 0/40 keep
    val docs = rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val out = TextOps.domainQuality(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(5))).toMap
    assert(out("solid.example") == (40L, 40L, true))
    // observed 50% on n=2 has a Wilson lower bound ~0.095 — NOT kept
    assert(out("tiny.example") == (2L, 1L, false))
    assert(out("junk.example") == (40L, 0L, false))
  }

  test("source overlap: exact pairwise Jaccard of shingle vocabularies, disjoint pairs absent") {
    import spark.implicits._
    // src A: shingles over "w0..w4" (3 shingles); src B shares A's text
    // exactly (same 3) plus a disjoint doc (2 more); src C fully disjoint
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4", "A"),
      (2L, "w0 w1 w2 w3 w4", "B"),
      (3L, "x0 x1 x2 x3", "B"),
      (4L, "z0 z1 z2", "C")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // A: 3 shingles; B: 3 + 2 = 5; common 3 → J = 3/(3+5-3) = 0.6
    assert(out((
      "A", "B")) == (3L, 0.6), s"got $out")
    // C overlaps nothing → no row at all
    assert(out.size == 1)
  }

  test("repetition profile: planted loop, clean doc, and too-short doc behave per spec") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),          // bigrams: "a b"×3, "b a"×2 → all duplicated
      (2L, "u v w x y z"),          // no repeated n-gram of any size
      (3L, "p q")                    // has bigrams, but no 3- or 4-grams
    ).toDF("doc_id", "text")
    val rows = TextOps.repetitionProfile(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // doc 1, n=2: 5 bigrams, top "a b" covers 3/5, every gram repeats
    assert(rows((1L, 2L)) == ((5L, 0.6, 1.0)))
    // doc 1, n=3: "a b a"×2, "b a b"×2 → top 0.5, dup 1.0
    assert(rows((1L, 3L)) == ((4L, 0.5, 1.0)))
    // clean doc: top gram covers exactly one slot, nothing duplicated
    assert(rows((2L, 2L)) == ((5L, 0.2, 0.0)))
    assert(rows((2L, 4L))._3 == 0.0)
    // the 2-token doc profiles bigrams only — no degenerate 3/4-gram rows
    assert(rows.contains((3L, 2L)))
    assert(!rows.contains((3L, 3L)) && !rows.contains((3L, 4L)))
  }

  test("token stats are internally consistent") {
    val rows = TextOps.tokenStats(spark, Sf).collect()
    assert(rows.length == Lake.documents(spark, Sf).count())
    for (r <- rows) {
      val (n, d, ttr) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d <= n && d > 0)
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(r.getDouble(4) > 0.0) // avg token length
    }
  }

  test("fingerprint is deterministic") {
    val a = TextOps.fingerprint(spark, Sf).collect().map(r => r.getLong(0) -> r.getLong(1))
    val b = TextOps.fingerprint(spark, Sf).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.sameElements(b))
  }

  test("near-duplicate docs usually share a fingerprint; distinct docs do not") {
    val fp = TextOps.fingerprint(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Lake.documents(spark, Sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet else Set(t)
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    val nearDups = for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      if (sa & sb).size.toDouble / (sa | sb).size >= 0.9
    } yield (a, b)
    assert(nearDups.nonEmpty, "test data should contain planted near-dups")
    // the min-hash fingerprint of two docs collides with prob = jaccard >= 0.9
    val sharing = nearDups.count { case (a, b) => fp(a) == fp(b) }
    assert(sharing.toDouble / nearDups.size >= 0.6,
      s"only $sharing/${nearDups.size} planted near-dups share a fingerprint")
    // a single min-hash collides between unrelated docs at ~their jaccard,
    // so demand separation, not uniqueness: most docs keep distinct prints
    val distinctFp = fp.values.toSeq.distinct.size
    assert(distinctFp >= fp.size / 2,
      s"fingerprints degenerate: $distinctFp distinct over ${fp.size} docs")
  }

  test("language heuristic marks most docs with stopwords as en") {
    val rows = TextOps.langQuality(spark, Sf).collect()
    val en = rows.count(_.getString(4) == "en")
    assert(en > 0, "heuristic should tag some docs en")
    for (r <- rows) {
      val ratio = r.getDouble(3)
      val pred = r.getString(4)
      assert(if (ratio >= 0.03) pred == "en" else pred == "und")
    }
  }

  test("normalize canonicalizes case/punct/whitespace so exact dedup catches variants") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "HELLO... WORLD"),
      (4L, "a genuinely different document")).toDF("doc_id", "text")
    val norm = TextOps.normalize(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(norm(1L) == "hello world" && norm(3L) == "hello world",
      s"variants must canonicalize: $norm")
    assert(norm(2L) == "hello world", "already-canonical text must pass through")
    // normalization feeds dedup: three variants collapse to one group
    val groups = graft.operators.DedupOps.dedupExact(TextOps.normalize(docs))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(groups.exists(_._2 == 3L),
      s"normalized dedup must find the 3-variant group, got ${groups.toSeq}")
    assert(groups.length == 2, "two distinct contents after normalization")
  }

  test("boilerplate detection finds the planted cross-doc n-gram and scrub removes it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "click here to subscribe fresh analysis of spark plans"),
      (2L, "weekly digest follows click here to subscribe and more"),
      (3L, "click here to subscribe this week we cover shuffles"),
      (4L, "an organic article with no repeated footer at all"),
      (5L, "short doc")).toDF("doc_id", "text")
    val top = TextOps.boilerplateNgrams(docs, n = 4, topK = 3, minDf = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(top.head == ("click here to subscribe", 3L),
      s"the 3-doc footer must rank first: ${top.toSeq}")
    val density = TextOps.boilerplateDensity(docs, n = 4, topK = 3, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(density(1L) >= 1L && density(4L) == 0L,
      s"footer docs carry occurrences, organic doc none: $density")
    val scrubbed = TextOps.scrubBoilerplate(docs, Seq("click here to subscribe"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(scrubbed(1L) == "fresh analysis of spark plans", s"got: $scrubbed")
    assert(scrubbed(2L) == "weekly digest follows and more")
    assert(scrubbed(4L) == "an organic article with no repeated footer at all",
      "clean docs must pass through unchanged")
    // scrub → rescan fixed point: the phrase is gone everywhere
    val rescanned = TextOps.boilerplateNgrams(
      TextOps.scrubBoilerplate(docs, Seq("click here to subscribe")),
      n = 4, topK = 3, minDf = 2).collect()
    assert(!rescanned.exists(_.getString(0) == "click here to subscribe"))
  }

  test("piiScan counts planted PII and redact removes every occurrence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact me at alice.smith+work@example.co.uk or bob@test.io today"),
      (2L, "server 10.0.255.3 talked to 192.168.1.1; call +1 (555) 123-4567"),
      (3L, "card 4111 1111-1111 1111 on file"),
      (4L, "nothing sensitive here at all")).toDF("doc_id", "text")
    val counts = TextOps.piiScan(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts((1L, "email")) == 2, s"emails: $counts")
    assert(counts((2L, "ipv4")) == 2 && counts((2L, "phone")) == 1, s"doc2: $counts")
    assert(counts((3L, "card")) == 1, s"card: $counts")
    assert(counts((4L, "email")) == 0 && counts((4L, "ipv4")) == 0 &&
      counts((4L, "phone")) == 0 && counts((4L, "card")) == 0, s"doc4 clean: $counts")
    val redacted = TextOps.redact(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(redacted(1L).contains("[EMAIL]") && !redacted(1L).contains("@"),
      s"emails must be gone: ${redacted(1L)}")
    assert(redacted(2L).contains("[IPV4]") && redacted(2L).contains("[PHONE]"),
      s"ip+phone tags expected: ${redacted(2L)}")
    assert(redacted(3L).contains("[CARD]"), s"card tag expected: ${redacted(3L)}")
    assert(redacted(4L) == "nothing sensitive here at all",
      "clean docs must pass through untouched")
    // redacted corpus re-scans clean — the screen's fixed point
    val rescan = TextOps.piiScan(TextOps.redact(docs)).collect()
    assert(rescan.forall(_.getLong(2) == 0L), "redacted corpus must scan clean")
  }

  test("bm25 ranks by tf, penalizes long docs, rewards rare terms") {
    import spark.implicits._
    val filler = Seq.fill(40)("pad").mkString(" ")
    val docs = Seq(
      (1L, "spark spark spark runs fast"),       // high tf
      (2L, "spark runs somewhere else"),         // low tf, same length ballpark
      (3L, s"spark $filler"),                    // same tf as 2 but much longer
      (4L, "quartz is a rare mineral"),          // rare term only
      (5L, "quartz quartz everywhere quartz"),
      (6L, "no match at all here")).toDF("doc_id", "text")
    val hits = TextOps.bm25TopK(docs, Seq("spark", "quartz"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!hits.contains(6L), "docs with no query term must not appear")
    assert(hits(1L) > hits(2L), s"tf must raise the score: $hits")
    assert(hits(2L) > hits(3L), s"length normalization must penalize doc 3: $hits")
    // quartz (df=2 of 6) outranks spark (df=3 of 6) at equal tf=1
    assert(hits(4L) > hits(2L), s"rarer term must score higher at tf=1: $hits")
    // k truncates deterministically: the same two highest scorers
    val best2 = hits.toSeq.sortBy { case (id, s) => (-s, id) }.take(2).map(_._1).toSet
    val top2 = TextOps.bm25TopK(docs, Seq("spark", "quartz"), k = 2).collect()
    assert(top2.length == 2 && top2.map(_.getLong(0)).toSet == best2,
      s"top-2 must be the two highest scorers: ${top2.mkString(",")}")
  }

  test("segment language screen flags mixed docs the whole-doc ratio misses") {
    import spark.implicits._
    val en = ("the of and to " * 4).trim          // 16 stopword-heavy words
    val und = (1 to 16).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, s"$en $und", "en"),   // one en block + one und block → mixed
      (2L, s"$und $und", "en"),  // no stopwords anywhere → und, unmixed
      (3L, en, "en")             // single clean en block
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.langSegments(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getString(5), r.getBoolean(6)))).toMap
    assert(out(1L) == ((2L, 1L, "en", true)), s"mixed doc: ${out.get(1L)}")
    assert(out(2L) == ((2L, 0L, "und", false)), s"und doc: ${out.get(2L)}")
    assert(out(3L) == ((1L, 1L, "en", false)), s"clean doc: ${out.get(3L)}")
    // the whole-doc heuristic calls doc 1 plain 'en' — the segment screen
    // is strictly more informative
    val whole = TextOps.langQuality(docs).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(whole(1L) == "en")
  }

  test("quality sweep is a proper reverse-cumulative keep curve") {
    val docs = Lake.documents(spark, Sf)
    val rows = TextOps.qualitySweep(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = TextOps.docQuality(docs).count()
    assert(rows.map(_._2).sum == total, "histogram must cover every doc")
    assert(rows.head._3 == total && math.abs(rows.head._4 - 1.0) < 1e-9,
      "the lowest threshold keeps everything")
    // keep counts strictly reconstruct from the bucket histogram
    val sorted = rows.sortBy(_._1)
    for (i <- 1 until sorted.length)
      assert(sorted(i)._3 == sorted(i - 1)._3 - sorted(i - 1)._2,
        s"cumulative break at ${sorted(i)._1}")
  }

  test("fertility aggregates integer token/word sums per language, never a mean of ratios") {
    val docs = Lake.documents(spark, Sf)
    val out = TextOps.bpeFertility(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.nonEmpty)
    // ground truth from the per-doc tokenizer output, summed driver-side
    val perDoc = TextOps.bpeTokenize(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select("lang", "n_bpe_tokens", "n_words").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((lang, (nDocs, nBpe, nWords, fert)) <- out) {
      val g = perDoc.filter(_._1 == lang)
      assert(g.length == nDocs && g.map(_._2).sum == nBpe && g.map(_._3).sum == nWords,
        s"$lang sums drifted")
      assert(math.abs(fert - nBpe.toDouble / nWords) < 1e-6)
      assert(fert >= 1.0, "BPE never merges across words, so fertility >= 1")
    }
  }

  test("collocations: a glued pair tops PMI, a promiscuous word ranks below") {
    import spark.implicits._
    // "san francisco" always co-occur; "the" pairs with everything
    val glue = (1 to 10).map(i => (i.toLong, "san francisco the end"))
    val noise = (11 to 20).map(i => (i.toLong, s"the w$i san diego the x$i"))
    val docs = (glue ++ noise).toDF("doc_id", "text")
    val out = TextOps.collocations(docs, minCount = 5, topK = 5).collect()
    assert(out.nonEmpty, "collocations found")
    val top = (out.head.getString(0), out.head.getString(1))
    assert(top == ("san", "francisco") || top == ("san", "diego"),
      s"top PMI pair should be a glued bigram, got $top")
    val pmis = out.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val theish = pmis.collect { case ((w1, _), p) if w1 == "the" => p }
    for (p <- theish)
      assert(p < pmis(top), "'the …' bigrams must rank below the glued pair")
  }

  test("doc keywords: a doc's rare repeated term beats its common terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark zeppelin zeppelin zeppelin spark table scan"),
      (2L, "spark table scan join"),
      (3L, "spark table scan merge"),
      (4L, "spark table scan sort")
    ).toDF("doc_id", "text")
    val out = TextOps.docKeywords(docs, k = 2).collect()
    val doc1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(doc1.head.getString(2) == "zeppelin",
      s"doc 1 top keyword should be the doc-specific term, got ${doc1.head.getString(2)}")
    assert(out.groupBy(_.getLong(0)).forall(_._2.length <= 2), "at most k per doc")
  }

  test("ngram diversity: a looping source scores below a diverse one") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b c a b c a b c", "loop"),
      (2L, "one two three four five six seven eight nine ten", "fresh")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.ngramDiversity(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("loop") < out("fresh"),
      s"loop ${out("loop")} should be less diverse than fresh ${out("fresh")}")
    assert(out("fresh") == 1.0, "all-distinct trigram source has diversity 1")
  }

  test("heaps curve: monotone vocabulary growth ending at the full vocab") {
    val docs = graft.Lake.documents(spark, Sf)
    val out = TextOps.heapsCurve(docs).collect()
    assert(out.length == 10, "one row per decile")
    val vocab = out.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => a <= b },
      "vocabulary never shrinks along the curve")
    assert(vocab.head < vocab.last,
      "the n-gram vocabulary must still be growing across the corpus")
    import org.apache.spark.sql.functions._
    val full = docs.filter(col("text").isNotNull)
      .select(split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(explode(expr(
        "transform(slice(tk, 1, size(tk) - 2), " +
          "(w, i) -> array_join(slice(tk, i + 1, 3), ' '))")).as("g"))
      .select(countDistinct(col("g"))).head().getLong(0)
    assert(vocab.last == full,
      s"final point ${vocab.last} must equal total trigram vocab $full")
    val nDocs = out.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(nDocs.last == docs.filter(col("text").isNotNull).count(),
      "final prefix covers every doc")
  }

  test("source JSD: identical sources at 0, skewed rates between 0 and ln2, disjoint pairs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha beta", "twin1"),
      (2L, "alpha beta alpha beta", "twin2"),
      (3L, "alpha alpha alpha beta", "skew"),
      (4L, "gamma delta gamma delta", "other")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.sourceJsd(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("twin1", "twin2")) == 0.0, "identical distributions at 0")
    val skew = out(("skew", "twin1"))
    assert(skew > 0.0 && skew < 0.6931471805599453,
      s"skewed same-vocab pair strictly inside (0, ln2): $skew")
    assert(!out.contains(("other", "twin1")) && !out.contains(("twin1", "other")),
      "a pair sharing no vocabulary is absent (JSD = ln2 by convention)")
    assert(out(("skew", "twin2")) == skew, "symmetric by construction")
  }

  test("compression ratio: repetitive text compresses far below diverse text, deterministically") {
    import spark.implicits._
    val loop = ("spark table " * 200).trim
    val fresh = (1 to 200).map(i => s"w${i * 7919 % 9973}x$i").mkString(" ")
    val docs = Seq((1L, loop), (2L, fresh), (3L, "")).toDF("doc_id", "text")
    val out = TextOps.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val (loopBytes, loopComp, loopRatio) = out(1L)
    val (_, _, freshRatio) = out(2L)
    assert(loopBytes == loop.length.toLong && loopComp > 0)
    assert(loopRatio < 0.05, s"looping text must crush: $loopRatio")
    assert(freshRatio > 3 * loopRatio,
      s"diverse text compresses far worse: $freshRatio vs $loopRatio")
    assert(out(3L)._3 == 1.0, "empty doc pins ratio at 1")
    val again = TextOps.compressionRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(again(1L) == loopRatio && again(2L) == freshRatio, "deterministic")
  }

  test("rake keywords match a brute-force RAKE over the corpus") {
    val got = TextOps.rakeKeywords(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 20)
    // brute force: stopword-delimited runs, deg/freq word scores
    val stop = TextOps.Stopwords.toSet
    val docs = Lake.documents(spark, Sf)
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .map(_.getString(0)).filter(_ != null)
    val phrases = docs.flatMap { text =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      for (t <- text.split(" ", -1)) {
        if (stop(t)) { if (cur.nonEmpty) runs += cur.reverse; cur = Nil }
        else if (t.nonEmpty) cur = t :: cur
      }
      if (cur.nonEmpty) runs += cur.reverse
      runs
    }
    val freq = phrases.flatten.groupBy(identity).view.mapValues(_.length).toMap
    val deg = phrases.flatMap(p => p.map(_ -> p.length))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    def ws(w: String): BigDecimal =
      BigDecimal(java.lang.Double.toString(deg(w).toDouble / freq(w)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val scored = phrases.groupBy(_.mkString(" ")).map { case (ph, insts) =>
      (ph, insts.head.length.toLong, insts.length.toLong,
        insts.head.map(ws).sum.toDouble)
    }.toSeq
    val top = scored.sortBy { case (ph, _, _, s) =>
      (-math.rint(s * 1e4) / 1e4, ph) }.take(20)
    for (((gp, gt, go, gs), (ep, et, eo, es)) <- got.zip(top)) {
      assert(gp == ep, s"phrase $gp vs $ep")
      assert(gt == et && go == eo)
      assert(math.abs(gs - es) < 1e-3, s"$gp score $gs vs $es")
    }
  }

  test("lang confusion matrix partitions every doc and shares sum to 1 per actual language") {
    val docs = Lake.documents(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
    val out = graft.operators.TextOps.langConfusion(spark, Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._3).sum == docs.count(), "every doc lands in one cell")
    val byLang = out.groupBy(_._1)
    for ((lang, cells) <- byLang) {
      assert(math.abs(cells.map(_._4).sum - 1.0) < 1e-3,
        s"$lang shares: ${cells.toSeq}")
      assert(cells.map(_._2).distinct.length == cells.length)
    }
    // every ground-truth language present in the corpus gets a row
    assert(byLang.keySet == docs.select("lang").distinct().collect()
      .map(_.getString(0)).toSet)
    // on the synthetic corpus the heuristic's en recall is high — and the
    // matrix exposes that non-en docs false-accept too (the eval's point)
    val en = out.filter(t => t._1 == "en" && t._2 == "en").map(_._4).sum
    assert(en > 0.5, s"en recall: $en")
  }

  test("lang confusion separates a planted corpus: stopword-free text is never called en") {
    import spark.implicits._
    val planted = Seq(
      ("d1", "en", "the cat sat on the mat and it was the best of all the mats"),
      ("d2", "en", "it is a truth that a reader of a book is in want of the next"),
      ("d3", "xx", "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
      ("d4", "xx", "zxcv qwerty asdf uiop hjkl bnm vcxz trewq fdsa poiuy lkjhg"))
      .toDF("doc_id", "lang", "text")
    val cells = graft.operators.TextOps.langConfusion(
      graft.operators.TextOps.langQuality(planted)).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(3))).toMap
    assert(cells(("en", "en")) == 1.0, s"planted en recall: $cells")
    assert(!cells.contains(("xx", "en")), s"planted xx false-accept: $cells")
    assert(cells(("xx", "und")) == 1.0)
  }

  test("NB classifier separates a planted corpus and never self-trains") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, lit}
    // even ids train, odd ids score; two languages with disjoint vocab
    val planted = Seq(
      (0L, "aa", "alpha beta gamma alpha beta alpha gamma beta alpha beta"),
      (2L, "aa", "beta alpha alpha gamma beta alpha beta gamma alpha alpha"),
      (4L, "bb", "zeta eta theta zeta eta zeta theta eta zeta eta"),
      (6L, "bb", "eta zeta zeta theta eta zeta eta theta zeta zeta"),
      (1L, "aa", "alpha beta gamma beta alpha"),
      (3L, "bb", "zeta eta theta eta zeta"),
      (5L, "aa", "gamma alpha beta alpha gamma"),
      // all-OOV doc: every class sees only its floor -> prior breaks the
      // tie toward the largest train class deterministically
      (7L, "bb", "omicron upsilon omega"))
      .toDF("doc_id", "lang", "text")
    val out = graft.operators.TextOps.nbLangClassify(planted,
        pmod(col("doc_id"), lit(2)) === 0, pmod(col("doc_id"), lit(2)) === 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3))).toList
    assert(out.map(_._1) == List(1L, 3L, 5L, 7L), "odd docs only, ordered")
    val pred = out.map(t => t._1 -> t._3).toMap
    assert(pred(1L) == "aa" && pred(3L) == "bb" && pred(5L) == "aa",
      s"planted separation: $out")
    // equal train priors + all-OOV -> identical scores; cls ASC tie-break
    assert(pred(7L) == "aa", s"deterministic OOV tie-break: $out")
    assert(out.forall(_._4 < 0), "log-scores are negative")
  }

  test("multi-feature OLS recovers planted coefficients exactly and drops singular groups") {
    import spark.implicits._
    // s1: y = 3 + 2*x1 + 5*x2 exactly (x1 = tokens, x2 = distinct tokens)
    // s2: every doc has identical (x1, x2) -> singular normal equations
    val planted = Seq(
      ("s1", "a a", 12L), ("s1", "a b b", 19L),
      ("s1", "a a a b", 21L), ("s1", "a b c c c", 28L),
      ("s2", "a b", 7L), ("s2", "a b", 9L), ("s2", "a b", 11L))
      .zipWithIndex
      .map { case ((src, t, y), i) => (i.toLong, src, t, y) }
      .toDF("doc_id", "source", "text", "n_chars")
    val out = graft.operators.TextOps.olsMulti(planted).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.map(_._1).toSeq == Seq("s1"), "singular s2 dropped")
    val (_, n, b0, b1, b2, r2) = out.head
    assert(n == 4L)
    assert(b0 == 3.0 && b1 == 2.0 && b2 == 5.0, s"coefficients: $out")
    assert(r2 == 1.0, "exact fit")
  }

  test("multi-feature OLS on the lake: finite coefficients, training R2 at most 1") {
    val out = graft.operators.TextOps.olsMulti(spark, Sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getLong(1) >= 3, "enough rows to fit 3 parameters")
      for (i <- 2 to 5)
        assert(!r.getDouble(i).isNaN && !r.getDouble(i).isInfinite)
      assert(r.getDouble(5) <= 1.0, s"r2 bound: $r")
    }
  }

  test("CMS never undercounts: exact at ample width, bounded overcount under forced collisions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b b c"), (2L, "a b c d e f"), (3L, "a a b c c d"))
      .toDF("doc_id", "text")
    // ample grid: tiny vocab, no collisions -> estimates ARE the counts
    val exact = graft.operators.TextOps.cmsTokenCounts(docs).collect()
    assert(exact.nonEmpty)
    assert(exact.forall(_.getLong(3) == 0L), s"no-collision grid must be exact")
    // 2-bucket single-hash grid: collisions guaranteed, never undercounts
    val crushed = graft.operators.TextOps
      .cmsTokenCounts(docs, d = 1, w = 2).collect()
    assert(crushed.forall(_.getLong(3) >= 0L), "CMS may never undercount")
    assert(crushed.exists(_.getLong(3) > 0L),
      "6 tokens in 2 buckets must collide somewhere")
    val total = exact.map(_.getLong(1)).sum
    assert(crushed.forall(r => r.getLong(2) <= total),
      "a cell can never exceed the total token count")
  }

  test("logistic GD learns the stopword signal on a separable planted corpus") {
    import spark.implicits._
    // en docs are stopword-rich, others stopword-free; class imbalance
    // pushes the intercept negative so the 0.5 boundary separates
    val planted = Seq(
      (1L, "en", "the cat is on the mat and it is a cat"),
      (2L, "en", "it is the best of the lot and a joy"),
      (3L, "xx", "lorem ipsum dolor sit amet consectetur adipiscing elit"),
      (4L, "xx", "zxcv qwerty asdf uiop hjkl bnm vcxz trewq"),
      (5L, "xx", "foo bar baz qux quux corge grault garply"))
      .toDF("doc_id", "lang", "text")
    val r = graft.operators.TextOps.logisticFit(planted).collect().head
    val (w0, w1, acc) = (r.getDouble(0), r.getDouble(1), r.getDouble(4))
    assert(r.getLong(3) == 5L)
    assert(w1 > 0, s"stopword ratio must predict en positively: $r")
    assert(w0 < 0, s"imbalanced prior pushes the intercept negative: $r")
    assert(acc >= 0.8, s"separable corpus must be separated: $r")
  }

  test("logistic GD on the lake: one weight row, bounded accuracy, full corpus counted") {
    val out = graft.operators.TextOps.logisticFit(spark, Sf).collect()
    assert(out.length == 1)
    val r = out.head
    val docs = Lake.documents(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull).count()
    assert(r.getLong(3) == docs, "every doc enters the fit")
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    for (i <- 0 to 2)
      assert(!r.getDouble(i).isNaN && !r.getDouble(i).isInfinite)
  }

  test("MMR picks the diverse doc over the near-duplicate when diversity is weighted") {
    import spark.implicits._
    // q = e0; A is q's twin, A2 a near-copy of A, B relevant-but-novel.
    // Raw top-2 = {A, A2}; MMR at lambda=0.4 must swap A2 for B.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),    // the query vector
      (1L, Array(1.0f, 0.0f, 0.0f), 0),    // A: rel = 1
      (2L, Array(0.999f, 0.045f, 0.0f), 0), // A2: rel ~ .999, sim(A,A2) ~ .999
      (3L, Array(0.5f, 0.0f, 0.866f), 0))  // B: rel = .5, sim(A,B) = .5
      .toDF("vec_id", "embedding", "label")
    val diverse = graft.operators.TextOps.mmrRerank(emb, 0L, k = 2,
        poolK = 3, lambda = 0.4).collect()
    assert(diverse.map(_.getLong(1)).toSeq == Seq(1L, 3L),
      s"lambda=0.4 must pick B second: ${diverse.mkString(", ")}")
    val greedy = graft.operators.TextOps.mmrRerank(emb, 0L, k = 2,
        poolK = 3, lambda = 1.0).collect()
    assert(greedy.map(_.getLong(1)).toSeq == Seq(1L, 2L),
      s"lambda=1 degenerates to raw top-k: ${greedy.mkString(", ")}")
  }

  test("MMR on the lake: k ranked rows, query excluded, first pick is the rel argmax") {
    val out = graft.operators.TextOps.mmrRerank(spark, Sf).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(0)).toSeq == (1L to 5L).toSeq)
    assert(!out.map(_.getLong(1)).contains(0L), "query never retrieved")
    assert(out.map(_.getLong(1)).distinct.length == 5)
    val first = out.head
    assert(first.getDouble(3) == 0.0, "first pick has no selected set")
    assert(first.getDouble(2) >= out.map(_.getDouble(2)).max,
      "first pick is the relevance argmax")
  }

  test("NB classifier on the lake: every scored doc classified once, classes from train slice") {
    import org.apache.spark.sql.functions.col
    val docs = Lake.documents(spark, Sf).filter(col("text").isNotNull)
    val out = graft.operators.TextOps.nbLangClassify(spark, Sf).collect()
    val odd = docs.filter(col("doc_id") % 2 === 1).count()
    assert(out.length.toLong == odd, "one verdict per scored doc")
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    val trainLangs = docs.filter(col("doc_id") % 2 === 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(out.map(_.getString(2)).toSet.subsetOf(trainLangs),
      "predictions only from classes the model was trained on")
  }

  test("held-out perplexity: Laplace floor for OOV, no self-leakage, planted values") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // REF (even ids) trains: tokens a a b  → N=3, V=2, denom N+V=5
    // CUR doc 1: "a c" → p(a)=(2+1)/5=0.6, p(c)=1/5=0.2 (OOV floor)
    val docs = Seq(
      (0L, "a a"), (2L, "b"),           // reference slice
      (1L, "a c"), (3L, "c c")          // scored slice
    ).toDF("doc_id", "text")
    val got = graft.operators.TextOps.heldoutPerplexity(docs,
        org.apache.spark.sql.functions.pmod(col("doc_id"),
          org.apache.spark.sql.functions.lit(2)) === 0,
        org.apache.spark.sql.functions.pmod(col("doc_id"),
          org.apache.spark.sql.functions.lit(2)) === 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected1 = r4((r6(-math.log(0.6)) + r6(-math.log(0.2))) / 2)
    assert(got(1L) == ((2L, 1L, expected1)), s"doc 1: ${got(1L)}")
    // doc 3 is ALL OOV — both tokens at the floor; crucially its own
    // repeated "c c" must NOT teach the model c (no self-leakage)
    val expected3 = r4(r6(-math.log(0.2)))
    assert(got(3L) == ((2L, 2L, expected3)), s"doc 3: ${got(3L)}")
    // reference docs are never scored
    assert(!got.contains(0L) && !got.contains(2L))
  }

  test("logistic AUC is 1 on a separable planted corpus and internally consistent on the lake") {
    import spark.implicits._
    val planted = Seq(
      (1L, "en", "the cat is on the mat and it is a cat"),
      (2L, "en", "it is the best of the lot and a joy"),
      (3L, "xx", "lorem ipsum dolor sit amet consectetur adipiscing elit"),
      (4L, "xx", "zxcv qwerty asdf uiop hjkl bnm vcxz trewq"),
      (5L, "xx", "foo bar baz qux quux corge grault garply"))
      .toDF("doc_id", "lang", "text")
    val r = graft.operators.TextOps.logisticEval(planted).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 2L && row.getLong(1) == 3L, s"class sizes: $row")
    // every en score above every xx score -> perfect ranking
    assert(row.getDouble(2) == 1.0, s"separable AUC must be 1: $row")
    assert(row.getDouble(3) == 1.0, s"gini = 2*AUC - 1: $row")
    assert(row.getDouble(4) == 1.0, s"KS of disjoint score supports: $row")
    val lake = graft.operators.TextOps.logisticEval(spark, Sf)
      .collect().head
    val (auc, gini, ks) =
      (lake.getDouble(2), lake.getDouble(3), lake.getDouble(4))
    assert(auc >= 0.0 && auc <= 1.0)
    assert(math.abs(gini - (2 * auc - 1)) <= 2e-6, s"gini vs auc: $lake")
    assert(ks >= 0.0 && ks <= 1.0)
    // a trained ranker must beat coin-flip on its own training corpus
    assert(auc > 0.5, s"lake AUC: $lake")
  }

  test("ridge CV recovers planted coefficients exactly at lambda 0 and degrades under shrinkage") {
    import spark.implicits._
    // y = 3 + 2*x1 + 5*x2 exactly; 8 docs -> 4 folds of 2
    val planted = Seq(
      ("a a", 12L), ("a b b", 19L), ("a a a b", 21L), ("a b c c c", 28L),
      ("a b c c", 26L), ("a a b b c c", 30L), ("a a a b b", 23L),
      ("a b c d d d", 35L))
      .zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "n_chars")
    val rows = graft.operators.TextOps.ridgeCv(planted).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8)))
    assert(rows.length == 12, "3 lambdas x 4 folds")
    val lam0 = rows.filter(_._1 == 0.0)
    assert(lam0.length == 4)
    for ((_, fold, nTr, nTe, b0, b1, b2, mse, cv) <- lam0) {
      assert(nTr == 6L && nTe == 2L, s"fold $fold sizes")
      assert(b0 == 3.0 && b1 == 2.0 && b2 == 5.0, s"fold $fold: exact fit")
      assert(mse == 0.0 && cv == 0.0, s"fold $fold: zero held-out error")
    }
    // exact linear data: any shrinkage only biases the fit
    val cvByLam = rows.groupBy(_._1).view.mapValues(_.head._9).toMap
    assert(cvByLam(0.0) <= cvByLam(100.0) + 1e-9)
    assert(cvByLam(100.0) <= cvByLam(10000.0) + 1e-9)
  }

  test("ridge CV on the lake: full grid, consistent CV means, nonnegative errors") {
    val rows = graft.operators.TextOps.ridgeCv(spark, Sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(7), r.getDouble(8)))
    assert(rows.length == 12)
    val n = Lake.documents(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("text").isNotNull).count()
    for ((lam, fold, nTr, nTe, mse, _) <- rows) {
      assert(nTr + nTe == n, s"fold $fold partitions the corpus")
      assert(mse >= 0.0, s"MSE >= 0: lam=$lam fold=$fold")
    }
    for ((lam, grp) <- rows.groupBy(_._1)) {
      assert(grp.map(_._2).sorted.toSeq == Seq(0L, 1L, 2L, 3L))
      // engine: exact decimal sum of the 4-dp fold MSEs, one double
      // divide, one 4-dp round — replayed here via valueOf (canonical
      // decimal) so the sum is the same exact value
      val expCv = BigDecimal(
        grp.map(t => BigDecimal.valueOf(t._5)).sum.toDouble / 4)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(grp.head._6 - expCv) <= 1e-9,
        s"cv mean at lambda $lam: ${grp.head._6} vs $expCv")
    }
  }

  test("gini stump finds the pure split on a separable corpus") {
    import spark.implicits._
    // xx docs have stopword ratio 0, en docs ratio > 0: splitting at 0
    // yields pure children, so the gain is the full parent impurity 0.5
    val planted = Seq(
      (1L, "en", "the cat is on the mat and it is a cat"),
      (2L, "en", "it is the best of the lot and a joy"),
      (3L, "en", "the dog and the fox ran off in a field"),
      (4L, "xx", "lorem ipsum dolor sit amet consectetur adipiscing elit"),
      (5L, "xx", "zxcv qwerty asdf uiop hjkl bnm vcxz trewq"),
      (6L, "xx", "foo bar baz qux quux corge grault garply"))
      .toDF("doc_id", "lang", "text")
    val row = graft.operators.TextOps.giniStump(planted).collect().head
    assert(row.getDouble(0) == 0.0, s"threshold at the pure boundary: $row")
    assert(row.getDouble(1) == 0.5, s"gain = parent impurity: $row")
    assert(row.getLong(2) == 3L && row.getLong(3) == 0L,
      s"left child pure-negative: $row")
    assert(row.getLong(4) == 3L && row.getLong(5) == 3L,
      s"right child pure-positive: $row")
    assert(row.getLong(6) == 6L)
  }

  test("depth-2 tree: root picks the stronger feature, the impure child re-splits on the other, a pure child emits nothing") {
    import spark.implicits._
    // en1/en2/xx3 share stop_ratio 0.5 (f1 cannot separate them) but
    // differ in type-token ratio; xx1/xx2 are stopword-free. Root must
    // split f1 <= 0 (score 22/6 beats f2's 3.0); the pure L child has a
    // single (f1, f2) point -> no candidate row; R re-splits on f2.
    val planted = Seq(
      (1L, "xx", "foo bar baz qux"),
      (2L, "xx", "lorem ipsum dolor sit"),
      (3L, "en", "the of in to aa bb cc dd"),
      (4L, "en", "the of in to ee ff gg hh"),
      (5L, "xx", "the the of of zz zz yy yy"))
      .toDF("doc_id", "lang", "text")
    val rows = graft.operators.TextOps.giniTree2(planted).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9)))
    assert(rows.map(_._1).toSeq == Seq("R", "root"),
      s"pure/degenerate L emits no split: $rows")
    val root = rows.find(_._1 == "root").get
    assert(root._2 == "f1" && root._3 == 0.0, s"root split: $root")
    assert(root._4 == 0.213333, s"root gain: $root")
    assert((root._5, root._6, root._7, root._8, root._9, root._10) ==
      ((5L, 2L, 2L, 0L, 3L, 2L)), s"root tallies: $root")
    val r = rows.find(_._1 == "R").get
    assert(r._2 == "f2" && r._3 == 0.5, s"R split on the TTR: $r")
    assert(r._4 == 0.444444, s"R gain: $r")
    assert((r._5, r._6, r._7, r._8, r._9, r._10) ==
      ((3L, 2L, 1L, 0L, 2L, 2L)), s"R tallies: $r")
  }

  test("depth-2 tree on the lake: children partition each node, gains nonnegative, level-2 nodes nest in the root split") {
    val rows = graft.operators.TextOps.giniTree2(spark, Sf).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9)))
    val byNode = rows.map(t => t._1 -> t).toMap
    assert(byNode.contains("root"))
    val root = byNode("root")
    for ((_, gain, n, pos, nl, pl, nr, pr) <- rows) {
      assert(nl + nr == n && pl + pr == pos, "children partition the node")
      assert(gain >= -1e-9, "best split never hurts")
      assert(pl <= nl && pr <= nr)
    }
    // a level-2 node's totals are exactly the root's child tallies
    for (node <- Seq("L", "R") if byNode.contains(node)) {
      val c = byNode(node)
      val expN = if (node == "L") root._5 else root._7
      val expPos = if (node == "L") root._6 else root._8
      assert(c._3 == expN && c._4 == expPos,
        s"$node nests in the root split: $c vs ($expN, $expPos)")
    }
  }

  test("gains table: monotone capture, exact totals, top band concentrates the positive class") {
    val rows = graft.operators.TextOps.logisticGains(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(_._1).toSeq == (1 to rows.length).toSeq,
      "contiguous bands from 1")
    // cumulative share and capture are nondecreasing and end at 1
    for ((a, b) <- rows.zip(rows.tail)) {
      assert(b._5 >= a._5 - 1e-9 && b._6 >= a._6 - 1e-9)
    }
    assert(math.abs(rows.last._5 - 1.0) < 1e-6, "share ends at 1")
    assert(math.abs(rows.last._6 - 1.0) < 1e-6, "capture ends at 1")
    for ((_, n, pos, resp, _, _, _) <- rows) {
      assert(pos >= 0 && pos <= n)
      assert(math.abs(resp - pos.toDouble / n) < 1e-5)
    }
    // a trained ranker's top band must capture at least its share
    assert(rows.head._6 >= rows.head._5 - 1e-6,
      s"top band lifts: ${rows.head}")
  }

  test("Huber IRLS shrugs off the outlier that drags the OLS plane") {
    import spark.implicits._
    // 9 docs on y = 3 + 2*x1 + 5*x2 exactly, one corrupted y
    val clean = Seq(
      ("a a", 12L), ("a b b", 19L), ("a a a b", 21L), ("a b c c c", 28L),
      ("a b c c", 26L), ("a a b b c c", 30L), ("a a a b b", 23L),
      ("a b c d d d", 35L), ("a b c d", 31L))
    val planted = (clean :+ (("a a b c d d"), 9000L))
      .zipWithIndex.map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "n_chars")
    val r = graft.operators.TextOps.huberFit(planted).collect()
    assert(r.length == 1)
    val row = r.head
    val (b0, b1, b2) = (row.getDouble(1), row.getDouble(2), row.getDouble(3))
    // the OLS start is dragged far off (outlier residual ~8958); two
    // IRLS rounds must pull the fit back near the clean plane
    assert(math.abs(b0 - 3.0) < 0.5 && math.abs(b1 - 2.0) < 0.5 &&
      math.abs(b2 - 5.0) < 0.5, s"robust recovery: $row")
    assert(row.getLong(5) >= 1L, "the outlier is downweighted")
    assert(row.getDouble(6) < 1.0, "weight mass strictly below uniform")
  }

  test("Huber on the lake: one finite row, bounded weight mass, nonnegative scale") {
    val row = graft.operators.TextOps.huberFit(spark, Sf).collect().head
    for (i <- 1 to 3)
      assert(!row.getDouble(i).isNaN && !row.getDouble(i).isInfinite)
    assert(row.getDouble(4) >= 0.0, "MAD scale")
    assert(row.getLong(5) >= 0L)
    assert(row.getDouble(6) > 0.0 && row.getDouble(6) <= 1.0 + 1e-9)
  }

  test("AdaBoost: separable corpus drives both rounds to the pure split with replayed alphas") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val planted = Seq(
      (1L, "en", "the cat is on the mat and it is a cat"),
      (2L, "en", "it is the best of the lot and a joy"),
      (3L, "xx", "lorem ipsum dolor sit amet consectetur adipiscing elit"),
      (4L, "xx", "zxcv qwerty asdf uiop hjkl bnm vcxz trewq"),
      (5L, "xx", "foo bar baz qux quux corge grault garply"))
      .toDF("doc_id", "lang", "text")
    val rows = graft.operators.TextOps.adaBoost2(planted).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSeq == Seq(1, 2))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val a1 = r6(0.5 * math.log((5 - 0 + 0.5) / 0.5))
    // round-2 weights are all round6(e^-a1): W = 5w exactly in decimal
    val w = BigDecimal(math.exp(-a1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val a2 = r6(0.5 * math.log(((w * 5).toDouble + 0.5) / 0.5))
    val Seq(rd1, rd2) = rows.toSeq
    assert(rd1 == ((1, 0.0, 1, 0.0, a1, 1.0)), s"round 1: $rd1")
    assert(rd2 == ((2, 0.0, 1, 0.0, a2, 1.0)), s"round 2: $rd2")
    // anti-separable corpus: the informative direction is reversed, so
    // the stump must pick polarity -1 and still classify perfectly
    val flipped = planted.withColumn("lang",
      when(col("lang") === "en", "xx").otherwise("en"))
    val f = graft.operators.TextOps.adaBoost2(flipped).collect()
      .map(r => (r.getInt(0), r.getInt(2), r.getDouble(3), r.getDouble(5)))
    assert(f.forall(_._2 == -1), s"flipped polarity: ${f.toSeq}")
    assert(f.forall(_._4 == 1.0), s"flipped accuracy: ${f.toSeq}")
  }

  test("AdaBoost on the lake: two rounds, bounded errors, nonnegative votes, better than chance") {
    val rows = graft.operators.TextOps.adaBoost2(spark, Sf).collect()
      .map(r => (r.getInt(0), r.getInt(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(rows.map(_._1).toSeq == Seq(1, 2))
    for ((round, pol, err, alpha, acc) <- rows) {
      assert(pol == 1 || pol == -1)
      assert(err >= 0.0 && err <= 0.5 + 1e-9,
        s"round $round: polarity argmax bounds the error at 1/2")
      assert(alpha >= 0.0, s"round $round: vote sign")
      assert(acc > 0.5, "trained ensemble beats a coin flip")
    }
  }

  test("changepoint localizes a planted level shift exactly") {
    import spark.implicits._
    val d0 = java.time.LocalDate.parse("2024-03-01")
    val ev = (0 until 10).flatMap { i =>
      val n = if (i < 5) 10 else 30
      (0 until n).map(j => (i * 1000L + j,
        java.sql.Timestamp.valueOf(d0.plusDays(i).atTime(5, j % 60))))
    }.toDF("event_id", "ts")
    val r = graft.operators.EventOps.changepoint(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getDate(0).toLocalDate == d0.plusDays(4),
      s"split after the last low day: $row")
    assert(row.getLong(1) == 10L && row.getLong(2) == 5L)
    assert(row.getDouble(3) == 10.0 && row.getDouble(4) == 30.0)
    assert(row.getDouble(5) == 1.0, s"step series: all variance explained")
    assert(row.getDouble(6) == 1000.0, s"sse reduction: $row")
  }

  test("changepoint on the lake matches the brute-force best split") {
    import org.apache.spark.sql.functions._
    val daily = Lake.events(spark, Sf)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
    val cs = daily.map(_._2.toDouble)
    def sse(xs: Seq[Double]) =
      xs.map(x => x * x).sum - math.pow(xs.sum, 2) / xs.length
    val parent = sse(cs)
    val best = (1 until cs.length).map { k =>
      (parent - (sse(cs.take(k)) + sse(cs.drop(k))), k)
    }.maxBy(t => (t._1, -t._2))
    val row = graft.operators.EventOps.changepoint(spark, Sf)
      .collect().head
    assert(row.getDate(0).toLocalDate == daily(best._2 - 1)._1,
      s"split day: $row vs ${daily(best._2 - 1)._1}")
    assert(math.abs(row.getDouble(6) - best._1) < 1e-2,
      s"reduction: $row vs $best")
  }

  test("PPMI eigenvector matches a from-scratch double-precision power iteration") {
    import spark.implicits._
    val texts = Seq(
      "aa bb aa bb aa bb", "aa bb cc aa bb", "cc dd cc dd",
      "aa cc bb dd", "dd aa dd bb", "bb cc aa dd cc")
    val planted = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.operators.TextOps.ppmiVector(planted).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // independent replay in plain doubles (no decimal routing): same
    // vocab order, window-2 symmetric counts, 6-dp PPMI, 6 iterations
    val toks = texts.map(_.split(" ").toSeq)
    val counts = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.map(_._1)
    val idx = vocab.zipWithIndex.toMap
    val pairCounts = scala.collection.mutable.Map[(Int, Int), Long]()
    for (t <- toks; p <- t.indices; d <- 1 to 2 if p + d < t.length) {
      val (a, b) = (idx(t(p)), idx(t(p + d)))
      pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + 1
      pairCounts((b, a)) = pairCounts.getOrElse((b, a), 0L) + 1
    }
    val total = pairCounts.values.sum.toDouble
    val rowSum = pairCounts.groupBy(_._1._1).view
      .mapValues(_.values.sum.toDouble).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = vocab.length
    val m = Array.tabulate(n, n) { (i, j) =>
      pairCounts.get((i, j)).map { c =>
        math.max(0.0, r6(math.log(c * total / (rowSum(i) * rowSum(j))) /
          math.log(2.0)))
      }.getOrElse(0.0)
    }
    var v = Array.fill(n)(1.0 / math.sqrt(n.toDouble))
    var eig = 0.0
    for (_ <- 1 to 6) {
      val w = Array.tabulate(n)(i =>
        (0 until n).map(j => m(i)(j) * v(j)).sum)
      eig = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / eig)
    }
    assert(got.length == n, s"every vocab token present: $got")
    for ((dim, tok, cnt, loading, eigval) <- got) {
      assert(tok == vocab(dim.toInt), s"vocab order: $got")
      assert(cnt == counts(tok).toLong)
      assert(math.abs(loading - v(dim.toInt)) < 1e-3,
        s"$tok loading $loading vs ${v(dim.toInt)}")
      assert(math.abs(eigval - eig) < 1e-3, s"eigval $eigval vs $eig")
    }
    val norm = got.map(t => t._4 * t._4).sum
    assert(math.abs(norm - 1.0) < 1e-4, s"unit norm: $norm")
  }

  test("PPMI eigenvector on the lake: bounded vocab, unit norm, positive dominant association") {
    val got = graft.operators.TextOps.ppmiVector(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3),
        r.getDouble(4)))
    assert(got.nonEmpty && got.length <= 32)
    assert(got.map(_._2).distinct.length == got.length, "distinct vocab")
    for ((_, tok, loading, eigval) <- got) {
      assert(!loading.isNaN && !loading.isInfinite, s"$tok loading")
      assert(eigval > 0.0)
    }
    val norm = got.map(t => t._3 * t._3).sum
    assert(math.abs(norm - 1.0) < 1e-4, s"unit norm: $norm")
  }

  test("gini stump on the lake: gain bounded by parent impurity, children partition the corpus") {
    val row = graft.operators.TextOps.giniStump(spark, Sf).collect().head
    val (nL, posL, nR, posR, n) = (row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6))
    assert(nL + nR == n && nL > 0 && nR > 0)
    assert(posL >= 0 && posL <= nL && posR >= 0 && posR <= nR)
    val nPos = (posL + posR).toDouble
    val parentGini = 1.0 -
      (nPos * nPos + (n - nPos) * (n - nPos)) / (n.toDouble * n)
    val gain = row.getDouble(1)
    assert(gain >= -1e-9, s"best split never hurts: $row")
    assert(gain <= parentGini + 1e-9, s"gain bounded by parent: $row")
  }

  test("classifier metrics pin the hand-computed macro readout and the 0/0 conventions") {
    import spark.implicits._
    // actual a,a,a,b,b,c vs predicted a,b,a,b,b,d: class c never
    // predicted (precision convention), class d never actual (recall
    // convention); per-class p/r/f1: a (1, 2/3, 0.8), b (2/3, 1, 0.8),
    // c and d all-zero → macros average over the 4-class UNION
    val scored = Seq(
      ("a", "a"), ("a", "b"), ("a", "a"),
      ("b", "b"), ("b", "b"), ("c", "d")).toDF("lang", "lang_pred")
    val row = graft.operators.TextOps.classifierMetrics(scored).collect().head
    assert(row.getLong(0) == 6L && row.getLong(1) == 4L, s"n/classes: $row")
    assert(row.getDouble(2) == 0.6667, "accuracy")
    assert(row.getDouble(3) == 0.4167, "macro_precision")
    assert(row.getDouble(4) == 0.4167, "macro_recall")
    assert(row.getDouble(5) == 0.4, "macro_f1")
    // pe = (3/6)(2/6) + (2/6)(3/6) = 1/3; kappa = (2/3 - 1/3)/(1 - 1/3)
    assert(row.getDouble(6) == 0.5, s"kappa: $row")
    // lake readout: accuracy must reconcile with the confusion matrix
    val conf = graft.operators.TextOps.nbConfusion(spark, Sf).collect()
    val n = conf.map(_.getLong(2)).sum
    val diag = conf.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val lake = graft.operators.TextOps.nbMetrics(spark, Sf).collect().head
    assert(lake.getLong(0) == n, "metrics n == confusion mass")
    assert(math.abs(lake.getDouble(2) - diag.toDouble / n) < 1e-4,
      "accuracy == diagonal share")
    assert(lake.getDouble(6) <= lake.getDouble(2) + 1e-9,
      "kappa never exceeds accuracy when chance agreement is positive")
  }

  test("chao1 and yule: brute-force frequency spectra, richness bounds, D in [0,1]") {
    import org.apache.spark.sql.functions._
    val tf = Lake.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (s, ts) => s -> ts.map(_._2) }
    val chao = graft.operators.TextOps.chao1Richness(spark, Sf).collect()
    assert(chao.map(_.getString(0)).toSet == tf.keySet)
    for (r <- chao) {
      val fs = tf(r.getString(0))
      val (nTok, v) = (fs.sum, fs.size.toLong)
      val f1 = fs.count(_ == 1L).toLong; val f2 = fs.count(_ == 2L).toLong
      assert(r.getLong(1) == nTok && r.getLong(2) == v)
      assert(r.getLong(3) == f1 && r.getLong(4) == f2)
      val expected = if (f2 > 0) v + f1.toDouble * f1 / (2.0 * f2)
        else v + f1.toDouble * (f1 - 1) / 2.0
      assert(math.abs(r.getDouble(5) - expected) < 1e-3, s"chao1: $r")
      assert(r.getDouble(5) >= v - 1e-9, "chao1 lower-bounds at vocab")
      assert(math.abs(r.getDouble(6) - (1.0 - f1.toDouble / nTok)) < 1e-5,
        "coverage")
    }
    val yule = graft.operators.TextOps.yuleK(spark, Sf).collect()
    for (r <- yule) {
      val fs = tf(r.getString(0))
      val nTok = fs.sum; val s2 = fs.map(f => f * f).sum
      val k = 1e4 * (s2 - nTok).toDouble / (nTok.toDouble * nTok)
      val d = (s2 - nTok).toDouble / (nTok.toDouble * (nTok - 1))
      assert(math.abs(r.getDouble(3) - k) < 1e-3, s"yule_k: $r")
      assert(math.abs(r.getDouble(4) - d) < 1e-5, s"simpson_d: $r")
      assert(d >= 0.0 && d <= 1.0, "D in [0,1]")
    }
  }

  test("Good-Turing table matches the brute-force frequency spectrum and the r* identity") {
    import org.apache.spark.sql.functions._
    val freqs = Lake.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("tf"))
      .collect().map(_.getLong(1))
    val nn = freqs.sum
    val fof = freqs.groupBy(identity).map { case (r, v) => r -> v.size.toLong }
    val rows = graft.operators.TextOps.goodTuring(spark, Sf).collect()
    val byR = rows.map(r => r.getLong(0) -> r).toMap
    // r = 0 row carries the unseen mass N1/N (0 without singletons)
    assert(byR.contains(0L), "unseen row present")
    assert(math.abs(byR(0L).getDouble(4) -
      fof.getOrElse(1L, 0L).toDouble / nn) < 1e-6, "unseen mass")
    // the grid is exactly the 8 smallest observed frequency classes
    val expectedGrid = fof.keySet.toSeq.sorted.take(8)
    assert(rows.filter(_.getLong(0) > 0L).map(_.getLong(0)).toSeq ==
      expectedGrid, "smallest-8 grid")
    for (r <- rows if r.getLong(0) > 0L) {
      val rr = r.getLong(0)
      assert(r.getLong(1) == fof(rr), s"N_$rr")
      assert(r.getLong(2) == fof.getOrElse(rr + 1, 0L), s"N_{r+1} at $rr")
      val star = (rr + 1).toDouble * fof.getOrElse(rr + 1, 0L) / fof(rr)
      assert(math.abs(r.getDouble(3) - star) < 1e-5, s"r* at $rr")
      assert(math.abs(r.getDouble(4) - star / nn) < 1e-6, s"p at $rr")
      // Good-Turing always discounts from the bottom: r* < r forces
      // N_{r+1}(r+1) < N_r r mass-wise only in aggregate — but p must
      // be a probability
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
