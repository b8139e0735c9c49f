package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Maintenance

/** Lake-maintenance semantics: compaction, clustering-for-pruning, and
  * dedup-on-ingest, all against temp table dirs. */
class MaintenanceSpec extends SparkSpecBase {

  private lazy val tmp = Files.createTempDirectory("graft_maint").toString

  test("compaction reduces file count without changing data") {
    val frag = s"$tmp/frag"
    Lake.orders(spark, Sf).repartition(40).write.parquet(frag)
    val before = new java.io.File(frag).listFiles().count(_.getName.endsWith(".parquet"))
    Maintenance.compact(spark, frag, s"$tmp/compacted", targetFileCount = 4)
    val after = new java.io.File(s"$tmp/compacted").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before == 40 && after == 4, s"$before -> $after files")
    val a = spark.read.parquet(frag)
    val b = spark.read.parquet(s"$tmp/compacted")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("range clustering gives files disjoint key ranges that a filter can skip") {
    Maintenance.clusterBy(spark, s"$tmp/frag", s"$tmp/clustered",
      Seq("o_totalprice"), targetFileCount = 8)
    val stats = Maintenance.fileStats(spark, s"$tmp/clustered", "o_totalprice")
    val rows = stats.collect()
    assert(rows.length == 8)
    // disjoint ranges: sorted by min, each file's min exceeds the previous max
    val ranges = rows.map(r => (r.get(2).toString.toDouble, r.get(3).toString.toDouble))
      .sortBy(_._1)
    assert(ranges.sliding(2).forall {
      case Array((_, aMax), (bMin, _)) => bMin >= aMax
      case _ => true
    }, s"overlapping file ranges: ${ranges.toSeq}")
    // a narrow range predicate should be able to skip most files
    val mid = ranges(ranges.length / 2)
    val ratio = Maintenance.skipRatio(stats, mid._1, mid._1 + 1.0)
    assert(ratio >= 0.75, s"skip ratio $ratio too low for a point-ish predicate")
  }

  test("z-order clustering prunes on BOTH columns; single-dim only on its own") {
    val src = s"$tmp/z_src"
    Lake.lineitem(spark, Sf).repartition(8).write.parquet(src)
    // single-dim baseline: range-cluster on partkey only
    Maintenance.clusterBy(spark, src, s"$tmp/z_single", Seq("l_partkey"), 16)
    // z-order on (partkey, suppkey)
    Maintenance.clusterByZorder(spark, src, s"$tmp/z_multi",
      Seq("l_partkey", "l_suppkey"), 16)
    def skip(dir: String, c: String, lo: Double, hi: Double): Double =
      Maintenance.skipRatio(Maintenance.fileStats(spark, dir, c), lo, hi)
    // narrow predicate on each dimension (key domains are small at sf0.001)
    val single_pk = skip(s"$tmp/z_single", "l_partkey", 100, 110)
    val single_sk = skip(s"$tmp/z_single", "l_suppkey", 5, 6)
    val multi_pk = skip(s"$tmp/z_multi", "l_partkey", 100, 110)
    val multi_sk = skip(s"$tmp/z_multi", "l_suppkey", 5, 6)
    assert(single_pk >= 0.8, s"single-dim must prune its own column: $single_pk")
    assert(single_sk == 0.0, s"single-dim cannot prune the other column: $single_sk")
    assert(multi_pk >= 0.4, s"z-order should prune partkey: $multi_pk")
    assert(multi_sk >= 0.4, s"z-order should prune suppkey: $multi_sk")
    // data unchanged
    val a = spark.read.parquet(src); val b = spark.read.parquet(s"$tmp/z_multi")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    import org.apache.spark.sql.functions._
    Maintenance.writeBucketed(Lake.orders(spark, Sf), "b_orders", "o_orderkey", 8)
    Maintenance.writeBucketed(
      Lake.lineitem(spark, Sf)
        .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "b_lineitem", "l_orderkey", 8)
    // forbid broadcast so the test exercises the co-located merge path the
    // feature exists for (at real scale neither fact side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (joined, plan) = try {
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      (j, j.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
           !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle the join keys:\n$plan")
    // and it returns the same result as the plain-parquet join
    val expected = Lake.lineitem(spark, Sf)
      .join(Lake.orders(spark, Sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
    assert(joined.exceptAll(expected).count() == 0 &&
           expected.exceptAll(joined).count() == 0)
  }

  test("point index prunes files for key lookups with zero false negatives") {
    val dir = s"$tmp/point_idx"
    // 20 unsorted files over a high-cardinality key: min/max zone maps are
    // useless here (every file spans the whole keyspace)
    Lake.orders(spark, Sf).repartition(20).write.parquet(dir)
    val stats = Maintenance.fileStats(spark, dir, "o_orderkey")
    assert(Maintenance.skipRatio(stats, 500.0, 600.0) == 0.0,
      "precondition: zone maps must be useless on this layout")
    val index = Maintenance.pointIndex(spark, dir, "o_orderkey", buckets = 4096)
    val nFiles = index.count()
    assert(nFiles == 20, s"one index row per file, got $nFiles")
    val keys = Seq(1L, 777L, 4242L, 9999L)
    for (k <- keys) {
      val cand = Maintenance.candidateFiles(index, "o_orderkey", k, buckets = 4096)
        .collect().map(_.getString(0)).toSet
      // no false negatives: every file that truly holds the key is a candidate
      val truth = spark.read.parquet(dir)
        .filter(col("o_orderkey") === k)
        .select(input_file_name()).distinct()
        .collect().map(_.getString(0)).toSet
      assert(truth.subsetOf(cand), s"key $k: index missed files ${truth -- cand}")
      // and the index actually prunes (each file holds ~750 of 15000 keys
      // → ~18% bucket occupancy at 4096 buckets; a candidate list as big
      // as the file list would make the index pointless)
      assert(cand.size < 20, s"key $k: index pruned nothing")
    }
  }

  test("dynamic partition overwrite restates only the touched partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpo").toString + "/t"
    // initial table: three day-partitions
    Seq((1L, "d1", 10L), (2L, "d2", 20L), (3L, "d3", 30L))
      .toDF("id", "day", "v")
      .write.partitionBy("day").parquet(dir)
    // restate day d2 only (new value, new row count)
    Maintenance.overwritePartitions(spark,
      dir, Seq((20L, "d2", 99L), (21L, "d2", 98L)).toDF("id", "day", "v"), "day")
    val after = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(1))).toSet
    assert(after == Set((1L, "d1", 10L), (20L, "d2", 99L), (21L, "d2", 98L),
      (3L, "d3", 30L)),
      s"untouched partitions must survive, restated one must be replaced: $after")
    // idempotent: the same restatement twice is a no-op
    Maintenance.overwritePartitions(spark,
      dir, Seq((20L, "d2", 99L), (21L, "d2", 98L)).toDF("id", "day", "v"), "day")
    assert(spark.read.parquet(dir).count() == 4)
    // the global conf is not left mutated
    assert(!spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .contains("dynamic"))
  }

  test("ingest dedup appends only unseen content") {
    val target = s"$tmp/docs_target"
    val docs = Lake.documents(spark, Sf)
    val first = Maintenance.ingestDedup(spark, target, docs.limit(300))
    assert(first == 300)
    // re-ingesting an overlapping batch appends only the new rows
    val second = Maintenance.ingestDedup(spark, target, docs)
    val total = spark.read.parquet(target).count()
    assert(second == 200, s"expected 200 fresh rows, got $second")
    assert(total == 500, s"expected 500 total rows, got $total")
    // fully-seen batch is a no-op
    val third = Maintenance.ingestDedup(spark, target, docs.limit(100))
    assert(third == 0)
  }

  test("ingest dedup handles within-batch duplicates and null content") {
    import spark.implicits._
    val target = s"$tmp/dup_target"
    val batch = Seq(
      (1L, "same content"), (2L, "same content"), // within-batch dup
      (3L, "unique content"), (4L, null.asInstanceOf[String])) // null text
      .toDF("doc_id", "text")
    val n1 = Maintenance.ingestDedup(spark, target, batch)
    assert(n1 == 2, s"one copy of the dup + the unique row = 2, got $n1")
    // re-ingesting the same batch (incl. the null row) is a strict no-op
    val n2 = Maintenance.ingestDedup(spark, target, batch)
    assert(n2 == 0, s"re-ingest must be a no-op, got $n2 fresh rows")
    assert(spark.read.parquet(target).count() == 2)
  }
}
