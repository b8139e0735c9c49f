package graft

import org.apache.spark.sql.functions._

import graft.operators.{CatalogOps, CorpusOps, EventOps, GraphOps, Relational}

/** Brute-force value checks for the analytics wave: skyline, ABC,
  * Gini, Benford, MAD, item-cosine, A/B readout, rolling actives,
  * 2-hop reach, hubness, Neyman allocation. Every assertion recomputes
  * the expected answer independently (Scala collections over collected
  * sf0.001 rows), so the operators' join/window formulations are checked
  * against definitions, not against themselves. */
class AnalyticsOpsSpec extends SparkSpecBase {

  test("skyline: members are mutually non-dominated and every non-member is dominated") {
    val parts = Lake.part(spark, Sf)
      .select(col("p_partkey"), col("p_size"),
        col("p_retailprice").cast("decimal(18,2)").as("price"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDecimal(2)))
    def dominates(a: (Long, Int, java.math.BigDecimal),
                  b: (Long, Int, java.math.BigDecimal)): Boolean =
      a._2 >= b._2 && a._3.compareTo(b._3) <= 0 &&
        (a._2 > b._2 || a._3.compareTo(b._3) < 0)
    val sky = Relational.skylineParts(spark, Sf).collect()
      .map(_.getLong(0)).toSet
    assert(sky.nonEmpty)
    val byKey = parts.map(p => p._1 -> p).toMap
    for (s <- sky; p <- parts)
      assert(!dominates(p, byKey(s)), s"skyline part $s dominated by ${p._1}")
    for (p <- parts if !sky(p._1))
      assert(parts.exists(q => dominates(q, p)),
        s"non-skyline part ${p._1} dominated by nobody")
  }

  test("gini matches the brute-force closed form per segment and sits in [0,1)") {
    val perCust = Lake.orders(spark, Sf)
      .join(Lake.customer(spark, Sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("c_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val expected = perCust.groupBy(_._1).map { case (seg, rows) =>
      val xs = rows.sortBy(r => (r._3.doubleValue, r._2)).map(_._3.doubleValue)
      val n = xs.length
      val sw = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      seg -> (2 * sw - (n + 1) * xs.sum) / (n * xs.sum)
    }
    val got = Relational.giniSegments(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(got.keySet == expected.keySet)
    for ((seg, e) <- expected) {
      assert(math.abs(got(seg) - e) < 1e-6, s"$seg gini ${got(seg)} vs $e")
      assert(got(seg) >= 0.0 && got(seg) < 1.0)
    }
  }

  test("abc classes partition all revenue-bearing parts and A carries the most revenue per part") {
    val rows = Relational.abcParts(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted)
    val nParts = Lake.lineitem(spark, Sf)
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_._2).sum == nParts, "classes must partition the parts")
    val perPart = rows.map(r => r._1 -> r._3 / r._2).toMap
    // A-parts are the head of the revenue ranking → highest avg revenue
    assert(perPart("A") > perPart.getOrElse("C", 0.0))
  }

  test("benford digits are 1–9, shares sum to 1, expected follows ln(1+1/d)/ln 10") {
    val rows = CatalogOps.benford(spark, Sf, "orders", "o_totalprice")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).forall(d => d >= 1 && d <= 9))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    for ((d, _, _, exp) <- rows)
      assert(math.abs(exp - math.log(1.0 + 1.0 / d) / math.log(10.0)) < 1e-6)
    // counts reconcile with the base table
    assert(rows.map(_._2).sum ==
      Lake.orders(spark, Sf).filter(col("o_totalprice") > 0).count())
  }

  test("mad outliers: per-group counts match a brute-force robust fence") {
    val vals = Lake.orders(spark, Sf)
      .select(col("o_orderstatus"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2)
      else {
        // linear-interpolated (quantile_cont / Spark percentile) median
        val (a, b) = (s(n / 2 - 1), s(n / 2)); a + (b - a) * 0.5
      }
    }
    val expected = vals.groupBy(_._1).map { case (g, rows) =>
      val xs = rows.map(_._2)
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      g -> xs.count(x => math.abs(x - med) > 3.0 * 1.4826 * mad)
    }
    val got = CatalogOps.madOutliers(spark, Sf, "orders", "o_totalprice",
        "o_orderstatus").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got.keySet == expected.keySet)
    for ((g, e) <- expected) assert(got(g) == e, s"$g: ${got(g)} vs $e")
  }

  test("item cosine equals n_ab/sqrt(n_a*n_b) over brute-force basket counts") {
    val li = Lake.lineitem(spark, Sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val itemN = li.distinct.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    val pairN = li.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val items = rows.map(_._2).distinct.sorted
      for (i <- items.indices; j <- i + 1 until items.length)
        yield (items(i), items(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val got = Relational.itemCosine(spark, Sf).collect()
    assert(got.nonEmpty)
    for (r <- got) {
      val (a, b, nab, cos) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(pairN((a, b)) == nab)
      val e = nab / math.sqrt(itemN(a).toDouble * itemN(b))
      assert(math.abs(cos - e) < 1e-6, s"($a,$b): $cos vs $e")
    }
  }

  test("ab readout: arms are a deterministic user partition and rates reconcile") {
    val r = EventOps.abReadout(spark, Sf).collect().head
    val (na, nb, ca, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val users = Lake.events(spark, Sf).select(col("user_id")).distinct().count()
    assert(na + nb == users, "arms must partition the user universe")
    val converted = Lake.events(spark, Sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).count()
      .filter(col("count") >= 15).count()
    assert(ca + cb == converted)
    assert(converted > 0 && converted < users,
      "the conversion metric must have real variance on this corpus")
    assert(math.abs(r.getDouble(4) - ca.toDouble / na) < 1e-6)
    assert(math.abs(r.getDouble(6) - (cb.toDouble / nb - ca.toDouble / na)) < 1e-5)
    // determinism: a second run is bit-identical (hash arms, no rand())
    assert(EventOps.abReadout(spark, Sf).collect().head == r)
  }

  test("rolling 7-day actives match per-day brute force over user-days") {
    val ud = Lake.events(spark, Sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = ud.map(_._1).distinct
    val expected = days.map { d =>
      d -> ud.filter { case (ud1, _) =>
        !ud1.isAfter(d) && !ud1.isBefore(d.minusDays(6))
      }.map(_._2).distinct.size.toLong
    }.toMap
    val got = EventOps.rollingActives(spark, Sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("two-hop reach matches brute force over the 5-NN graph") {
    val edges = graft.operators.AnnOps.knnGraph(spark, Sf)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = GraphOps.twoHopQuery(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSet == adj.keySet)
    for ((s, nd, n2) <- got) {
      val direct = adj(s)
      assert(nd == direct.size)
      val two = direct.flatMap(m => adj.getOrElse(m, Set.empty)) - s -- direct
      assert(n2 == two.size, s"node $s: $n2 vs ${two.size}")
    }
  }

  test("hubness equals kNN in-degree, descending with id tie-break") {
    val edges = graft.operators.AnnOps.knnGraph(spark, Sf)
      .select(col("dst")).collect().map(_.getLong(0))
    val indeg = edges.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = GraphOps.hubnessQuery(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty && got.length <= 20)
    for ((v, d) <- got) assert(indeg(v) == d)
    val sorted = got.sortBy { case (v, d) => (-d, v) }.toSeq
    assert(got.toSeq == sorted, "top hubs must be ordered by in-degree")
    // the report really is the top: no unlisted node beats the last entry
    val cut = got.last._2
    val listed = got.map(_._1).toSet
    for ((v, d) <- indeg if !listed(v)) assert(d <= cut)
  }

  test("neyman allocation: shares sum to 1 and follow N_h*sigma_h proportions") {
    val rows = CorpusOps.neymanQuery(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    // brute-force population sd per source
    val docs = Lake.documents(spark, Sf)
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    for ((src, n, sd, share, alloc) <- rows) {
      val xs = bySrc(src)
      assert(n == xs.length)
      val mean = xs.sum / xs.length
      val esd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.length)
      assert(math.abs(sd - esd) < 1e-2 * math.max(1.0, esd), s"$src sd $sd vs $esd")
      val totalNs = bySrc.map { case (_, ys) =>
        val m = ys.sum / ys.length
        ys.length * math.sqrt(ys.map(y => (y - m) * (y - m)).sum / ys.length)
      }.sum
      val eshare = n * esd / totalNs
      assert(math.abs(share - eshare) < 1e-4, s"$src share $share vs $eshare")
      assert(math.abs(alloc - share * 1000) <= 1.0)
    }
  }
}
