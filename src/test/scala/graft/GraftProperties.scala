package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.{CorpusOps, DedupOps}

/** Property-based invariants over generated corpora — the guarantees that
  * must hold for EVERY input shape, not just the lake fixtures:
  * chunk() tiles exactly, and split/sample decisions are pure per-row
  * functions (dropping other rows never changes them — the property
  * `rand()`-based implementations violate under retry or repartition). */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = {
    val s = GraftSession.builder("graft-props", Some("local[4]"), 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 25)
    lens <- Gen.listOfN(n, Gen.choose(1, 90))
  } yield lens.zipWithIndex.map { case (len, i) =>
    (i.toLong, (1 to len).map(j => s"t${(i * 7 + j) % 50}").mkString(" "))
  }

  property("chunk tiles every doc: dense indices, declared stride, exact count") =
    forAll(genCorpus) { corpus =>
      import spark.implicits._
      val byDoc = CorpusOps.chunk(corpus.toDF("doc_id", "text"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
        .groupBy(_._1)
      corpus.forall { case (id, text) =>
        val toks = text.split(" ")
        val cs = byDoc(id).sortBy(_._2)
        val expected = math.max(1, math.ceil((toks.length - 8) / 24.0).toInt)
        cs.length == expected &&
          cs.zipWithIndex.forall { case (c, k) => c._2 == k && c._4 == toks(k * 24) } &&
          cs.last._5 == toks.last &&
          cs.forall(c => c._3 > 0 && c._3 <= 32)
      }
    }

  private val genIds: Gen[List[Long]] =
    Gen.choose(2, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0L, 100000L))).map(_.distinct)

  property("split assignment is a pure per-row function (subset-invariant)") =
    forAll(genIds) { ids =>
      import spark.implicits._
      def assign(xs: List[Long]): Map[Long, String] =
        CorpusOps.withSplit(xs.map(i => (i, s"text $i")).toDF("doc_id", "text"))
          .select("doc_id", "split").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
      val full = assign(ids)
      val sub = assign(ids.take(ids.length / 2 + 1))
      sub.forall { case (id, s) => full(id) == s }
    }

  property("stratified sampling decisions are per-row (subset-invariant)") =
    forAll(genIds) { ids =>
      import spark.implicits._
      val rates = Map("s0" -> 0.5, "s1" -> 0.25)
      def kept(xs: List[Long]): Set[Long] =
        CorpusOps.stratifiedSample(
          xs.map(i => (i, s"s${i % 2}", "x")).toDF("doc_id", "source", "text"), rates)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      val full = kept(ids)
      val half = ids.take(ids.length / 2 + 1)
      kept(half) == (full intersect half.toSet)
    }

  private val genWord: Gen[String] = for {
    n <- Gen.choose(1, 14)
    cs <- Gen.listOfN(n, Gen.frequency(
      9 -> Gen.alphaLowerChar, 1 -> Gen.oneOf('#', '9', '!')))
  } yield cs.mkString

  property("BPE: priority == rank-order sequential; tokens reassemble the word") =
    forAll(Gen.listOf(genWord)) { words =>
      // the equivalence the DuckDB oracle's replace chain relies on must
      // hold for EVERY word, not just the corpus fixtures
      words.forall { w =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        graft.functions.BpeVocab.applyWord(w, out)
        out.toSeq == graft.functions.BpeVocab.applyWordSequential(w) &&
          out.mkString == w
      }
    }

  property("weighted sample is subset-stable at the kept set's keys") =
    forAll(genIds) { ids =>
      import spark.implicits._
      // E-S keys are per-row pure: computing them on any superset yields
      // the same per-doc key, so rank order among surviving docs is fixed
      def keys(xs: List[Long]): Map[Long, Double] =
        CorpusOps.weightedSample(
          xs.map(i => (i, "s", ("x " * (i % 7 + 1).toInt).trim)).toDF("doc_id", "source", "text"),
          n = xs.length.max(1))
          .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      val full = keys(ids)
      val half = ids.take(ids.length / 2 + 1)
      keys(half).forall { case (id, k) => full.get(id).contains(k) }
    }

  property("minhash signatures are deterministic with one min per permutation") =
    forAll(genCorpus) { corpus =>
      import spark.implicits._
      val df = corpus.toDF("doc_id", "text")
      def sigs = DedupOps.minhashSignatures(df).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val a = sigs
      a.values.forall(_.length == DedupOps.NumPerms) && sigs == a
    }

  property("incremental MV refresh == full recompute for EVERY change set") =
    forAll(Gen.choose(1, 30), Gen.choose(0L, 9999L)) { (n, seed) =>
      import spark.implicits._
      // deterministic pseudo-random base and mutation from the seed: any
      // mix of deletes, value updates, group moves, and inserts
      def row(id: Long, salt: Long) =
        (id, s"g${(id * 7 + salt) % 5}", (id * 31 + salt) % 100)
      val base = (0L until n.toLong).map(row(_, seed))
      val next = base.flatMap { case (id, _, _) =>
        (id + seed) % 4 match {
          case 0 => None                       // delete
          case 1 => Some(row(id, seed + 1))    // update (value and/or group)
          case _ => Some(row(id, seed))        // unchanged
        }
      } ++ (n.toLong until n.toLong + (seed % 3)).map(row(_, seed)) // inserts
      val baseDf = base.toDF("id", "g", "v")
      val nextDf = next.toDF("id", "g", "v")
      val refreshed = graft.operators.MaterializedAgg.refresh(
        graft.operators.MaterializedAgg.define(baseDf, "g", "v"),
        graft.sources.SnapshotTable.frameDiff(baseDf, nextDf, "id"), "g", "v")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val recomputed = graft.operators.MaterializedAgg.define(nextDf, "g", "v")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      refreshed == recomputed
    }

  property("set-similarity join == brute-force Jaccard on EVERY corpus shape") =
    forAll(genCorpus, Gen.oneOf(0.3, 0.5, 0.7)) { (corpus, t) =>
      import spark.implicits._
      // the prefix filter's losslessness claim, checked against a direct
      // Scala reimplementation of shingle-set Jaccard over all pairs
      def shingles(text: String): Set[String] = {
        val toks = text.split(" ")
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
        else Set(text)
      }
      val truth = (for {
        (a, ta) <- corpus; (b, tb) <- corpus if a < b
        sa = shingles(ta); sb = shingles(tb)
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= t
      } yield (a, b) -> j).toMap
      val got = DedupOps.setSimilarityJoin(corpus.toDF("doc_id", "text"), t, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      got.keySet == truth.keySet &&
        truth.forall { case (k, j) => math.abs(got(k) - j) < 1e-5 }
    }

  property("containment join == brute-force directed containment on EVERY corpus shape") =
    forAll(genCorpus, Gen.oneOf(0.5, 0.7, 0.9)) { (corpus, t) =>
      import spark.implicits._
      def shingles(text: String): Set[String] = {
        val toks = text.split(" ")
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
        else Set(text)
      }
      val truth = (for {
        (a, ta) <- corpus; (b, tb) <- corpus if a != b
        sa = shingles(ta); sb = shingles(tb)
        c = sa.intersect(sb).size.toDouble / sa.size
        if c >= t
      } yield (a, b) -> c).toMap
      val got = DedupOps.containmentJoin(corpus.toDF("doc_id", "text"), t, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
      got.keySet == truth.keySet &&
        truth.forall { case (k, c) => math.abs(got(k) - c) < 1e-5 }
    }

  private val genChangeStream: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      key <- Gen.choose(1L, 4L)
      attr <- Gen.oneOf("a", "b", "c")
    } yield (key, attr))
  } yield rows.zipWithIndex.map { case ((k, a), i) => (i.toLong, k, a) }

  property("scd2 history partitions each key's timeline with collapsed changes") =
    forAll(genChangeStream) { stream =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // event_id doubles as the (strictly increasing) timestamp
      val ev = stream.toDF("event_id", "user_id", "event_type")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("timestamp_micros(event_id * 1000000)").as("ts"))
      val hist = graft.operators.EventOps.scd2(ev, "user_id", "event_type")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5)))
        .groupBy(_._1)
      stream.groupBy(_._2).forall { case (key, rows) =>
        val attrs = rows.sortBy(_._1).map(_._3)
        // reference change-collapse in plain Scala
        val collapsed = attrs.foldLeft(List.empty[String]) {
          case (acc, a) if acc.headOption.contains(a) => acc
          case (acc, a) => a :: acc
        }.reverse
        val h = hist(key).sortBy(_._5)
        h.map(_._2).toList == collapsed &&                  // same history
        h.map(_._5).toList == (1L to h.length).toList &&     // dense versions
        h.init.zip(h.tail).forall { case (a, b) =>           // chained
          a._4.contains(b._3) } &&
        h.last._4.isEmpty && h.last._6 &&                    // open current
        h.init.forall(!_._6)
      }
    }

  property("incremental JOIN-view refresh == full recompute under appends") =
    forAll(
      Gen.listOf(Gen.zip(Gen.choose(1L, 6L), Gen.choose(0, 99))),
      Gen.listOf(Gen.zip(Gen.choose(1L, 6L), Gen.choose(100, 199))),
      Gen.listOf(Gen.zip(Gen.choose(1L, 6L), Gen.choose(200, 299))),
      Gen.listOf(Gen.zip(Gen.choose(1L, 6L), Gen.choose(300, 399)))
    ) { (a0, da, b0, db) =>
      import spark.implicits._
      // duplicate keys on both sides exercise the fan-out preservation
      val aOld = a0.toDF("k", "av"); val dA = da.toDF("k", "av")
      val bOld = b0.toDF("k", "bv"); val dB = db.toDF("k", "bv")
      def bag(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
          .groupBy(identity).view.mapValues(_.length).toMap
      val view = graft.operators.MaterializedJoin.define(aOld, bOld, "k")
      val refreshed = graft.operators.MaterializedJoin.refresh(
        view, aOld, dA, bOld.unionByName(dB), dB, "k")
      val recomputed = graft.operators.MaterializedJoin.define(
        aOld.unionByName(dA), bOld.unionByName(dB), "k")
      bag(refreshed) == bag(recomputed)
    }

  property("entity match finds exactly the in-block close pairs") =
    forAll(Gen.listOfN(12, Gen.oneOf(
      "acme corp", "acme corpp", "acme co", "apex corp", "apex labs",
      "zenith inc", "zenith ink", "nova ltd")), Gen.choose(1, 3)) { (names, maxDist) =>
      import spark.implicits._
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val truth = (for {
        a <- names.distinct; b <- names.distinct
        if a < b && a.split(" ")(0) == b.split(" ")(0) && lev(a, b) <= maxDist
      } yield (a, b)).toSet
      val got = DedupOps.entityMatch(
          names.map(Tuple1(_)).toDF("name"), "name", maxDist)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      got == truth
    }

  // byte streams spanning the LZW regimes: short literals, long runs
  // (deep dictionary chains), alternating churn, and width-bump
  // boundary lengths — the adversarial shapes for a variable-width codec
  private val genBytes: Gen[Array[Byte]] = Gen.oneOf(
    Gen.choose(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)),
    Gen.choose(1, 20000).flatMap(n => Gen.choose(0, 255).map(b =>
      Array.fill(n)(b.toByte))),
    Gen.choose(1, 20000).map(n =>
      Array.tabulate(n)(i => ((i * 7 + i / 253) & 0xFF).toByte)),
    Gen.choose(200, 300).map(n => Array.tabulate(n)(i => (i & 0xFF).toByte)))

  property("GIF LZW round-trips every byte stream exactly") =
    forAll(genBytes) { d =>
      java.util.Arrays.equals(
        graft.operators.GifCodec.lzwDecode(
          graft.operators.GifCodec.lzwEncode(d), d.length), d)
    }

  property("GIF container round-trips the zero-padded frame planes") =
    forAll(Gen.choose(1, 4000).map(n =>
      Array.tabulate(n)(i => ((i * 13 + 5) & 0xFF).toByte))) { d =>
      val frames = graft.operators.GifCodec.gifDecode(
        graft.operators.GifCodec.gifEncode(d))
      val joined = frames.flatten.toArray
      frames.length == math.max(1, (d.length + 255) / 256) &&
        joined.take(d.length).sameElements(d) &&
        joined.drop(d.length).forall(_ == 0)
    }
}
