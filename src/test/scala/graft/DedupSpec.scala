package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Semantics of the dedup operators against brute-force ground truth
  * computed driver-side over the tiny sf0.001 corpus. */
class DedupSpec extends SparkSpecBase {

  /** Brute-force word-3-gram Jaccard over all pairs (test-only!). */
  private lazy val groundTruth: Map[(Long, Long), Double] = {
    val docs = Lake.documents(spark, Sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet else Set(t)
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.6
    } yield (a, b) -> j).toMap
  }

  test("MinHash-LSH near-dedup finds exactly the true pairs at threshold 0.6") {
    val found = DedupOps.nearDupPairs(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(found.keySet == groundTruth.keySet,
      s"missed: ${groundTruth.keySet -- found.keySet}; spurious: ${found.keySet -- groundTruth.keySet}")
    // verification stage reports the *exact* jaccard, not an estimate
    for ((pair, j) <- groundTruth)
      assert(math.abs(found(pair) - j) < 5e-5, s"pair $pair jaccard off: ${found(pair)} vs $j")
  }

  test("hot-bucket cap bounds MinHash-LSH candidates on boilerplate corpora") {
    import spark.implicits._
    val boiler = "license header all rights reserved do not remove this notice ever"
    // 500 identical boilerplate copies: every band bucket holds all 500 —
    // uncapped, candidate generation alone is 500*499/2 ≈ 125k pairs
    val copies = (0 until 500).map(i => (1000L + i, boiler))
    // one genuine near-dup pair, distinct from the boilerplate
    val words = (1 to 50).map(i => s"w$i")
    val docA = (2000L, words.mkString(" "))
    val docB = (2001L, (words.dropRight(1) :+ "changed").mkString(" "))
    val fillers = (0 until 20).map(i =>
      (3000L + i, (1 to 20).map(j => s"f${i}_$j").mkString(" ")))
    val docs = (copies ++ Seq(docA, docB) ++ fillers).toDF("doc_id", "text")
    val found = DedupOps.nearDupPairs(docs, threshold = 0.6, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot bucket is dropped (exact-dup territory), the true pair survives
    assert(found == Set((2000L, 2001L)),
      s"expected only the planted near-dup pair, got ${found.size} pairs")
    // the exact-dedup path is where the boilerplate belongs — and finds it
    val exact = DedupOps.dedupExact(docs).collect()
    assert(exact.exists(_.getLong(2) == 500L),
      "dedupExact must report the 500-copy boilerplate group")
    // the drop is auditable, never silent
    val audit = DedupOps.oversizedBands(docs, maxBucketSize = 100).collect()
    assert(audit.nonEmpty && audit.forall(_.getLong(2) > 100),
      "audit query must report the dropped hot band-buckets")
  }

  test("near-dup clusters collapse transitive chains; dedupNear keeps one per cluster") {
    import spark.implicits._
    // A~B and B~C exceed the 0.6 jaccard threshold, A~C does not (0.4):
    // only transitive clustering puts all three in one component
    val words = (1 to 30).map(i => s"w$i")
    val a = (1L, words.mkString(" "))
    val b = (2L, (words.take(24) ++ (1 to 6).map(i => s"x$i")).mkString(" "))
    val c = (3L, ((1 to 6).map(i => s"y$i") ++ words.slice(6, 24) ++ (1 to 6).map(i => s"x$i")).mkString(" "))
    val fillers = (0 until 10).map(i =>
      (100L + i, (1 to 25).map(j => s"f${i}_$j").mkString(" ")))
    val docs = (Seq(a, b, c) ++ fillers).toDF("doc_id", "text")
    val pairs = DedupOps.nearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (2L, 3L)),
      s"planted chain should verify exactly A~B and B~C, got $pairs")
    val clusters = DedupOps.nearDupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"chain must collapse to one cluster with keeper 1, got $clusters")
    // the distributed min-label path (forced by maxDriverEdges=0) must
    // agree with the driver union-find path exactly
    val distributed = DedupOps.nearDupClusters(docs, maxDriverEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == clusters,
      s"distributed path must match union-find path, got $distributed")
    val kept = DedupOps.dedupNear(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (Set(1L) ++ fillers.map(_._1)),
      s"dedupNear must keep the keeper and untouched docs, got $kept")
  }

  test("exact dedup groups by content hash with stable keepers") {
    val rows = DedupOps.dedupExact(spark, Sf).collect()
    val nDocs = Lake.documents(spark, Sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs, "copy counts must partition the corpus")
    assert(rows.map(_.getString(1)).distinct.length == rows.length, "hash groups must be unique")
  }

  test("simhash is deterministic across runs") {
    val a = DedupOps.simhash(spark, Sf).collect().map(r => r.getLong(0) -> r.getLong(1))
    val b = DedupOps.simhash(spark, Sf).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a.sameElements(b))
  }

  test("embedding near-dups: bucketed pairs match brute force at high precision") {
    import org.apache.spark.sql.functions.{broadcast => bc}
    val emb = Lake.embeddings(spark, Sf)
    val found = DedupOps.embeddingNearDups(emb, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // brute-force ground truth (test-only cross join on 500 vectors)
    val l = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val r = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    val truth = l.join(bc(r), col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        graft.functions.VectorFunctions.cosineSimilarity(col("ea"), col("eb")).as("s"))
      .filter(col("s") >= 0.4).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(truth.nonEmpty, "ground truth should contain some high-cosine pairs")
    // precision 1.0: every reported pair is a true pair
    assert(found.keySet.subsetOf(truth), s"spurious pairs: ${found.keySet -- truth}")
    // multi-table LSH recall on near-uniform vectors
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.5, s"embedding near-dup recall $recall < 0.5 (${found.size}/${truth.size})")
  }

  test("set-similarity join is lossless vs brute force and exact on planted pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // doc 1/2: 9 of 10 shared trigrams (J = 9/11); doc 3 unrelated;
    // doc 4/5: identical (J = 1); doc 6: shorter prefix edge case
    val docs = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d e f g h i j k z"),
      (3L, "q r s t u v w x y z zz zy"),
      (4L, "m n o p m n o p m n o p"),
      (5L, "m n o p m n o p m n o p"),
      (6L, "a b c")).toDF("doc_id", "text")
    val got = DedupOps.setSimilarityJoin(docs, threshold = 0.5, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L), (4L, 5L)), s"pairs: $got")
    assert(math.abs(got((1L, 2L)) - 9.0 / 11.0) < 1e-6)
    assert(got((4L, 5L)) == 1.0)
    // the plan must stay an equi-join on prefix shingles — never all-pairs.
    // Checkpointing operator: assert over interior (listener-captured)
    // plans; the returned frame is an RDD-scan facade.
    for (plan <- allPlansOf(DedupOps.setSimilarityJoin(docs, 0.5, 3)))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"non-equi plan:\n$plan")
  }

  test("containment hot-shingle cap drops saturated index shingles; audit sees the fan-out") {
    import spark.implicits._
    // five identical docs: 3 shingles each, every shingle df = 5
    val docs = (1L to 5L).map(i => (i, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val full = DedupOps.containmentJoin(docs, 0.9, 3)
    assert(full.count() == 20, "all directed pairs of 5 exact dups")
    // cap below the saturation level: the hot shingles leave the outer
    // index, so no candidates form — fewer results, never wrong ones
    val capped = DedupOps.containmentJoin(docs, 0.9, 3, maxShingleDf = 4)
    assert(capped.count() == 0, "capped index generates no candidates")
    // the audit reports exactly the pressure the cap responds to:
    // prefix len 1 → rarest-first tie-break picks "alpha beta gamma";
    // prefix_df 5, df 5 → 5·(5−1) = 20 implied directed candidates
    val audit = DedupOps.containmentPressure(docs, 0.9, 3).collect()
    assert(audit.length == 1, s"audit: ${audit.toSeq}")
    val r = audit.head
    assert(r.getString(0) == "alpha beta gamma" && r.getLong(1) == 5 &&
      r.getLong(2) == 5 && r.getLong(3) == 20, s"audit row: $r")
  }

  test("set-similarity join keeps boundary pairs where t*size rounds above an integer") {
    import spark.implicits._
    // t=0.1 with |b|=70 shingles: 0.1*70 = 7.000000000000001 in doubles, so
    // an unslacked ceil shortens b's prefix below the lossless bound AND the
    // unslacked size filter rejects |a|=7 vs |b|=70 — yet a ⊂ b there has
    // Jaccard exactly 7/70 = 0.1, a qualifying pair. 9 words → 7 trigrams;
    // 72 words (the same 9 + 63 fresh) → 70 trigrams containing a's 7.
    val aWords = (1 to 9).map(i => s"w$i")
    val bWords = aWords ++ (1 to 63).map(i => s"x$i")
    val docs = Seq(
      (1L, aWords.mkString(" ")),
      (2L, bWords.mkString(" "))).toDF("doc_id", "text")
    val got = DedupOps.setSimilarityJoin(docs, threshold = 0.1, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 2L)), s"boundary pair lost: $got")
    assert(math.abs(got((1L, 2L)) - 0.1) < 1e-9)
  }

  test("dup rates: exact-clean but paragraph-dirty sources are told apart") {
    import spark.implicits._
    val p1 = "a b c d"
    val docs = Seq(
      (1L, s"$p1 e f g h", "srcA"),
      (2L, s"$p1 e f g h", "srcA"),  // exact copy of 1 → A exact-dirty
      (3L, s"$p1 x y z w", "srcB"),  // copies 1's first paragraph only
      (4L, "m n o p q r s t", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = DedupOps.dupRates(docs, blockWords = 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // srcA: 2 docs, 1 distinct text; 4 paras, doc 2's two are non-first
    assert(out("srcA") == ((2L, 1L, 0.5, 4L, 2L, 0.5)), s"srcA: ${out.get("srcA")}")
    // srcB: exact-clean (rate 0) yet paragraph-dirty (1 of 4 copied)
    assert(out("srcB") == ((2L, 2L, 0.0, 4L, 1L, 0.25)), s"srcB: ${out.get("srcB")}")
  }

  test("incremental screen flags fresh-vs-base only and picks the best base match") {
    import spark.implicits._
    val a = (1 to 20).map(i => s"a$i").mkString(" ")
    val cNew = (1 to 20).map(i => s"c$i").mkString(" ")
    val base = Seq(
      (1L, a),
      (2L, (1 to 20).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, a),     // exact copy of base 1 → dup_of 1
      (15L, a),     // also base 1, never fresh 10 (no fresh×fresh)
      (20L, cNew),  // fresh-only content → kept …
      (25L, cNew),  // … and so is its intra-batch twin
      (30L, (1 to 20).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val out = DedupOps.incrementalNearDups(base, fresh).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(3)))).toMap
    assert(out(10L) == ((Some(1L), false)))
    assert(out(15L) == ((Some(1L), false)), "fresh×fresh must not shadow the base match")
    assert(out(20L) == ((None, true)), "fresh-only content must be kept")
    assert(out(25L) == ((None, true)), "intra-batch twins are not this screen's job")
    assert(out(30L) == ((None, true)))
  }

  test("paragraph dedup keeps first occurrences, rebuilds in order, drops emptied docs") {
    import spark.implicits._
    // block = 4 words. doc 1 owns P1 P2; doc 2 copies P1 then adds its
    // own; doc 3 is entirely P1++P2; doc 4 is shorter than one block;
    // doc 5 repeats its own paragraph within itself.
    val p1 = "a b c d"; val p2 = "e f g h"
    val docs = Seq(
      (1L, s"$p1 $p2"),
      (2L, s"$p1 x y z w"),
      (3L, s"$p1 $p2"),
      (4L, "q r"),
      (5L, "m n o p m n o p")).toDF("doc_id", "text")
    val out = DedupOps.paragraphDedup(docs, blockWords = 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((2L, 2L, s"$p1 $p2")), s"original doc mangled: ${out.get(1L)}")
    assert(out(2L) == ((2L, 1L, "x y z w")), s"copied paragraph kept: ${out.get(2L)}")
    assert(!out.contains(3L), "fully-duplicate doc must vanish")
    assert(out(4L) == ((1L, 1L, "q r")), "sub-block doc must survive whole")
    assert(out(5L) == ((2L, 1L, "m n o p")), "within-doc repeat must collapse")
  }

  test("near-duplicate docs have close simhashes; random pairs do not") {
    val sig = DedupOps.simhash(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val dupHam = groundTruth.keySet.toSeq.map { case (a, b) => hamming(sig(a), sig(b)) }
    val ids = sig.keys.toSeq.sorted.take(60)
    val randHam = for (a <- ids; b <- ids if a < b && !groundTruth.contains((a, b)))
      yield hamming(sig(a), sig(b))
    assert(dupHam.nonEmpty)
    val dupMax = dupHam.max
    val randAvg = randHam.sum.toDouble / randHam.size
    assert(dupMax < randAvg,
      s"near-dup hamming (max $dupMax) should beat random average ($randAvg)")
  }

  test("entity match: blocked edit-distance linkage with multiplicities") {
    import spark.implicits._
    val rows = Seq(
      "acme corp", "acme corp", "acme corp",  // canonical, n=3
      "acme corpp",                           // typo, same block, dist 1
      "acme industries",                      // same block, too far
      "acne corp"                             // dist 1 but DIFFERENT block
    ).map(Tuple1(_)).toDF("name")
    val out = DedupOps.entityMatch(rows, "name", 2).collect()
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("acme corp", "acme corpp")),
      s"only the in-block typo pair should match, got $pairs")
    val m = out.head
    assert(m.getLong(2) == 3L && m.getLong(3) == 1L,
      "multiplicities ride on the matched pair")
    assert(m.getInt(4) == 1, "exact edit distance reported")
  }

  test("entity link: cross-table A×B matching, exact matches included, no self-pairing rule") {
    import spark.implicits._
    val master = Seq("acme corp", "zenith inc", "nova ltd")
      .map(Tuple1(_)).toDF("name")
    val feed = Seq("acme corp", "acme corpp", "zenith ink", "orbit gmbh")
      .map(Tuple1(_)).toDF("name")
    val out = DedupOps.entityLink(master, feed, "name", 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(4)))
    assert(out.toSet == Set(
      ("acme corp", "acme corp", 0),     // exact cross-table match kept
      ("acme corp", "acme corpp", 1),
      ("zenith inc", "zenith ink", 1)),
      s"got ${out.toSeq}")
  }

  test("cluster size histogram covers every doc and matches the cluster frame") {
    val hist = DedupOps.clusterSizeHistogram(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Lake.documents(spark, Sf)
      .filter(col("text").isNotNull).count()
    assert(hist.map(_._3).sum == nDocs, "histogram mass equals the corpus")
    for ((size, nClusters, nd) <- hist) {
      assert(size >= 1 && nClusters >= 1)
      assert(nd == size * nClusters)
    }
    // cross-check multi-doc clusters against the cluster frame itself
    val clusters = DedupOps.nearDupClusters(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sizes = clusters.groupBy(_._2).values.map(_.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((size, nClusters, _) <- hist if size > 1)
      assert(sizes.get(size).contains(nClusters),
        s"size-$size clusters: $nClusters vs ${sizes.get(size)}")
  }

  test("dedup savings: loser mass matches the cluster frame and shares reconcile") {
    val rows = DedupOps.dedupSavings(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val docs = Lake.documents(spark, Sf).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._2).sum == docs.length)
    assert(rows.map(_._3).sum == docs.map(_._3).sum)
    val losers = DedupOps.nearDupClusters(spark, Sf).collect()
      .filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0)).toSet
    assert(rows.map(_._4).sum == losers.size, "loser count reconciles")
    val loserChars = docs.filter(d => losers(d._1)).map(_._3).sum
    assert(rows.map(_._5).sum == loserChars, "loser char mass reconciles")
    for ((_, _, total, _, lchars, share) <- rows)
      assert(math.abs(share - lchars.toDouble / total) < 1e-5)
  }

  test("keep-best survivorship picks the per-cluster quality argmax with id tie-break") {
    val out = DedupOps.nearDupKeepBest(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(out.nonEmpty, "test data should contain near-dup clusters")
    val byCluster = out.groupBy(_._2)
    for ((cl, members) <- byCluster) {
      val bests = members.map(_._3).distinct
      assert(bests.length == 1, s"cluster $cl names two keepers")
      // the keeper is the (quality DESC, doc_id ASC) argmax of its cluster
      val expect = members.minBy(m => (-m._4, m._1))._1
      assert(bests.head == expect, s"cluster $cl keeper ${bests.head} != $expect")
      assert(members.count(_._5) == 1, s"cluster $cl kept != 1")
      assert(members.find(_._5).get._1 == expect)
      // cluster identity stays the min-id label even when the keeper moves
      assert(cl == members.map(_._1).min)
    }
    // the policy must actually differ from min-id keeping somewhere
    assert(out.exists(m => m._5 && m._1 != m._2),
      "no cluster where the best copy is not the min id — vacuous policy")
  }

  test("golden record merges transitive chains and applies deterministic survivorship") {
    import spark.implicits._
    // chain at maxDist=1: corpa ~ corpab ~ corpabb (ends are dist 2 apart
    // — only transitive closure merges all three); zeta is a singleton
    val rows = Seq(
      ("acme corpa",   "B2", 3.00, 4),
      ("acme corpab",  "B1", 1.50, 9),
      ("acme corpab",  "B1", 2.00, 2),
      ("acme corpabb", "B2", 5.00, 7),
      ("zeta widget",  "B9", 8.00, 1)
    ).toDF("name", "brand", "price", "size")
    val out = DedupOps.goldenRecord(rows, "name", 1, "brand", "price", "size")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4),
          r.getInt(5))).toMap
    assert(out.keySet == Set("acme corpa", "zeta widget"), s"entities: $out")
    // mode tie (B1 ×2, B2 ×2) breaks to the smaller value
    assert(out("acme corpa") == ((3L, 4L, "B1", 1.5, 9)), s"merged: $out")
    assert(out("zeta widget") == ((1L, 1L, "B9", 8.0, 1)), s"singleton: $out")
  }
}
