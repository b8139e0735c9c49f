package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{SnapshotSource, SnapshotStats, SnapshotTable}

/** The V2 snapshot source: version resolution (latest / explicit /
  * tag / errors) and full parquet pushdown THROUGH the façade. */
class SnapshotSourceSpec extends SparkSpecBase {

  private val dir = {
    val d = java.nio.file.Files.createTempDirectory("graft_snap_src")
    d.toFile.deleteOnExit()
    new java.io.File(d.toFile, "t").getAbsolutePath
  }

  private lazy val setup: (Long, Long) = {
    import spark.implicits._
    val v0 = SnapshotTable.write(spark, dir,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "x"))
    val v1 = SnapshotTable.write(spark, dir,
      Seq((1L, "a", 11.0), (2L, "b", 21.0), (3L, "c", 31.0))
        .toDF("k", "s", "x"))
    SnapshotTable.tag(spark, dir, "prod", v0)
    (v0, v1)
  }

  test("latest by default, explicit version and tag time-travel") {
    val (v0, _) = setup
    val latest = spark.read.format("graft-snapshot").load(dir)
    assert(latest.count() == 3)
    val old = spark.read.format("graft-snapshot")
      .option("version", v0).load(dir)
    assert(old.count() == 2)
    assert(old.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val tagged = spark.read.format("graft-snapshot")
      .option("tag", "prod").load(dir)
    assert(tagged.collect().toSet == old.collect().toSet)
    // value identity with the Scala API
    assert(latest.collect().toSet ==
      SnapshotTable.read(spark, dir).collect().toSet)
  }

  test("predicate pushdown and column pruning reach the parquet scan") {
    setup
    val df = spark.read.format("graft-snapshot").load(dir)
      .filter(col("k") > 1L).select(col("k"), col("x"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(k,1"), s"no pushdown:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("s:string"),
      s"column s not pruned:\n$plan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("uncommitted or vacuumed versions fail loudly") {
    setup
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot").option("version", 99).load(dir)
        .collect()
    }
    assert(e.getMessage.contains("no committed version 99"))
    val e2 = intercept[Exception] {
      spark.read.format("graft-snapshot").option("tag", "nope").load(dir)
        .collect()
    }
    assert(e2.getMessage.contains("no tag"))
  }

  test("the short name resolves through the service registry") {
    // format("graft-snapshot") worked above; also assert the provider
    // class itself is what the registry serves
    val p = new SnapshotSource
    assert(p.shortName() == "graft-snapshot")
  }

  /** Files the (pre-AQE) physical plan's parquet scans would read. */
  private def scannedFiles(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten

  private def mkPrunedTable(prefix: String): String = {
    import spark.implicits._
    val d = new java.io.File(
      java.nio.file.Files.createTempDirectory(prefix).toFile,
      "t").getAbsolutePath
    // k = 0..39, range-clustered into 4 files with disjoint k ranges
    val df = spark.range(40).select(col("id").as("k"),
      (col("id") % 4).cast("string").as("s"), (col("id") * 2.5).as("x"))
    SnapshotTable.write(spark, d, df.repartitionByRange(4, col("k")))
    d
  }

  test("min/max sidecar skips files at planning time, values identical") {
    val d = mkPrunedTable("graft_snap_mm")
    val want = SnapshotTable.read(spark, d)
      .filter(col("k") < 10).collect().toSet
    // before the sidecar exists: full 4-file scan
    val before = spark.read.format("graft-snapshot").load(d)
      .filter(col("k") < 10)
    assert(scannedFiles(before).length == 4)
    SnapshotStats.indexMinMax(spark, d, "k")
    val after = spark.read.format("graft-snapshot").load(d)
      .filter(col("k") < 10)
    val files = scannedFiles(after)
    assert(files.length < 4 && files.nonEmpty,
      s"selective range filter must scan strictly fewer files: $files")
    assert(after.collect().toSet == want, "pruned read lost or gained rows")
    // row-group pushdown survives the pruning wrapper
    val plan = after.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(k,10"),
      s"pushdown lost through the pruning builder:\n$plan")
    // a predicate beyond every file's range plans a valid zero-file scan
    val none = spark.read.format("graft-snapshot").load(d)
      .filter(col("k") > 1000L)
    assert(scannedFiles(none).isEmpty, "disjoint predicate must skip all files")
    assert(none.count() == 0)
    // an unprunable filter shape (non-literal) still answers correctly
    val odd = spark.read.format("graft-snapshot").load(d)
      .filter(col("k") % 2 === 1)
    assert(odd.count() == 20)
  }

  test("bucket sidecar skips files on point lookups min/max cannot help") {
    import spark.implicits._
    val d = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snap_bk").toFile,
      "t").getAbsolutePath
    // written UNSORTED: round-robin over 4 files, so every file spans
    // nearly the whole k range and a zone map is useless
    val df = spark.range(400).select(col("id").as("k"),
      (col("id") % 7).cast("string").as("s"))
    SnapshotTable.write(spark, d, df.repartition(4))
    SnapshotStats.indexBuckets(spark, d, "k", buckets = 8192)
    val probe = spark.read.format("graft-snapshot").load(d)
      .filter(col("k") === 123L)
    val files = scannedFiles(probe)
    assert(files.length < 4,
      s"point lookup must skip files whose bucket set lacks the key: $files")
    assert(probe.collect().map(_.getLong(0)).toSeq == Seq(123L))
    // IN-list probes prune too, and never lose rows
    val in = spark.read.format("graft-snapshot").load(d)
      .filter(col("k").isin(5L, 77L, 311L))
    assert(in.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 77L, 311L))
  }

  test("a sidecar that does not cover the live files disables pruning") {
    val d = mkPrunedTable("graft_snap_stale")
    SnapshotStats.indexMinMax(spark, d, "k")
    // corrupt the sidecar: drop one file's stats row
    val scPath = s"$d/_stats/minmax_k/v=0"
    val sc = spark.read.parquet(scPath).collect()
    val dropped = spark.read.parquet(scPath)
      .filter(col("file") =!= sc.head.getString(0))
    val tmp = scPath + ".new"
    dropped.write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(scPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(scPath), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(scPath))
    val df = spark.read.format("graft-snapshot").load(d)
      .filter(col("k") < 10)
    assert(scannedFiles(df).length == 4,
      "a partial sidecar must fall back to the full scan, not guess")
    assert(df.count() == 10)
  }

  test("change feed through the facade: option(changes) = rowDiff, cached") {
    import spark.implicits._
    val d = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snap_cdc").toFile,
      "t").getAbsolutePath
    SnapshotTable.write(spark, d,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
        .toDF("k", "s", "x"))
    SnapshotTable.write(spark, d,
      Seq((2L, "b", 21.0), (3L, "c", 30.0), (4L, "d", 40.0))
        .toDF("k", "s", "x")) // 1 removed, 2 updated, 3 unchanged, 4 added
    val feed = spark.read.format("graft-snapshot")
      .option("changes", "0..1").option("key", "k").load(d)
    val api = SnapshotTable.rowDiff(spark, d, 0L, 1L, "k")
    assert(feed.columns.toSeq == api.columns.toSeq)
    assert(feed.collect().map(_.toString).sorted.toSeq ==
      api.collect().map(_.toString).sorted.toSeq)
    assert(feed.filter(col("change_type") === "added").count() == 1)
    // materialized once: the sidecar exists and a re-read scans it
    val cdcDir = new java.io.File(s"$d/_cdc")
    assert(cdcDir.isDirectory && cdcDir.list().exists(_.contains("k_v0_1")))
    assert(spark.read.format("graft-snapshot")
      .option("changes", "0..1").option("key", "k").load(d).count() == 3)
    // incremental MV refresh consumes the FACADE feed and lands exactly
    // on a direct aggregate of v1 (delta-rule maintenance is exact)
    val mv0 = graft.operators.MaterializedAgg.define(
      SnapshotTable.read(spark, d, Some(0L)), "s", "x")
    val refreshed = graft.operators.MaterializedAgg
      .refresh(mv0, feed, "s", "x")
      .orderBy(col("s")).collect()
    val direct = SnapshotTable.read(spark, d, Some(1L))
      .groupBy(col("s"))
      .agg(sum(col("x")).as("sum_value"), count(lit(1)).as("n_rows"))
      .orderBy(col("s")).collect()
    assert(refreshed.toSeq == direct.toSeq)
    // malformed or conflicting options fail loudly
    intercept[Exception] { spark.read.format("graft-snapshot")
      .option("changes", "0..1").load(d).collect() }
    intercept[Exception] { spark.read.format("graft-snapshot")
      .option("changes", "zero..one").option("key", "k").load(d).collect() }
    intercept[Exception] { spark.read.format("graft-snapshot")
      .option("changes", "0..1").option("version", 1)
      .option("key", "k").load(d).collect() }
  }

  test("registered q_snapshot_pruned: pruned scan, lake-replay values") {
    val df = SnapshotSource.prunedReadQuery(spark, Sf)
    val files = scannedFiles(df)
    assert(files.nonEmpty && files.length < 8,
      s"the registered query's plan must skip range-clustered files: " +
        s"${files.length} of 8 scanned")
    val want = Lake.documents(spark, Sf)
      .filter(col("doc_id") >= 50 && col("doc_id") < 250)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))
    assert(df.collect().toSeq == want.collect().toSeq)
  }

  test("registered q_snapshot_lookup: bucket-pruned scan, lake-replay values") {
    val df = SnapshotSource.pointLookupQuery(spark, Sf)
    val files = scannedFiles(df)
    assert(files.nonEmpty && files.length < 8,
      s"the IN-probe must skip unsorted files by bucket: " +
        s"${files.length} of 8 scanned")
    val want = Lake.documents(spark, Sf)
      .filter(col("doc_id").isin(7L, 123L, 401L))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
    assert(df.collect().toSeq == want.collect().toSeq)
  }

  test("write path: every save commits a version, history preserved") {
    import spark.implicits._
    val wdir = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snap_w").toFile,
      "t").getAbsolutePath
    val d1 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x")
    val d2 = Seq((1L, 11.0), (3L, 30.0)).toDF("k", "x")
    // default ErrorIfExists creates the first version
    d1.write.format("graft-snapshot").save(wdir)
    assert(SnapshotTable.versions(spark, wdir) == Seq(0L))
    // ... and refuses a second commit
    intercept[Exception] { d1.write.format("graft-snapshot").save(wdir) }
    // Append commits a NEW version; old one stays readable
    d2.write.format("graft-snapshot").mode("append").save(wdir)
    assert(SnapshotTable.versions(spark, wdir) == Seq(0L, 1L))
    val v0 = spark.read.format("graft-snapshot")
      .option("version", 0).load(wdir)
    assert(v0.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val latest = spark.read.format("graft-snapshot").load(wdir)
    assert(latest.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // Overwrite also just advances the version (history is immutable)
    d1.write.format("graft-snapshot").mode("overwrite").save(wdir)
    assert(SnapshotTable.versions(spark, wdir) == Seq(0L, 1L, 2L))
    // Ignore is a no-op on a non-empty table
    d2.write.format("graft-snapshot").mode("ignore").save(wdir)
    assert(SnapshotTable.versions(spark, wdir) == Seq(0L, 1L, 2L))
  }

  test("auto-index property keeps pruning live across commits") {
    val d = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snap_auto").toFile,
      "t").getAbsolutePath
    def clustered(n: Long) = spark.range(n).select(col("id").as("k"),
      (col("id") % 4).cast("string").as("s"))
      .repartitionByRange(4, col("k"))
    // v0: the write itself persists the property AND indexes v0
    SnapshotTable.write(spark, d, clustered(40),
      autoIndex = Seq("minmax:k"))
    val v0 = spark.read.format("graft-snapshot").load(d)
      .filter(col("k") < 10)
    assert(scannedFiles(v0).length < 4,
      "the autoIndex write must leave v0 pruned-readable")
    // v1: a PLAIN write — no autoIndex argument — must stay pruned,
    // because the property persisted; this is the "never silently
    // lapses" contract
    SnapshotTable.write(spark, d, clustered(80))
    val v1 = spark.read.format("graft-snapshot").load(d)
      .filter(col("k") < 10)
    val files = scannedFiles(v1)
    assert(files.length < 4 && files.nonEmpty,
      s"a v+1 commit with the property set must keep pruning: $files")
    assert(v1.collect().map(_.getLong(0)).sorted.toSeq == (0L until 10L),
      "pruned v1 read lost or gained rows")
    // façade write path twin: option("autoindex") persists + indexes
    val d2 = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snap_auto2").toFile,
      "t").getAbsolutePath
    clustered(40).write.format("graft-snapshot")
      .option("autoindex", "minmax:k").save(d2)
    assert(scannedFiles(spark.read.format("graft-snapshot").load(d2)
      .filter(col("k") < 10)).length < 4,
      "option(autoindex) write must index its own commit")
    // a malformed spec fails BEFORE anything persists
    intercept[IllegalArgumentException] {
      SnapshotStats.setAutoIndex(spark, d2, Seq("zonemap=k"))
    }
    assert(SnapshotStats.autoIndexSpecs(spark, d2) == Seq("minmax:k"),
      "a rejected spec must not clobber the persisted property")
  }

  test("describe surfaces refs, the property, and sidecar staleness") {
    val d = new java.io.File(
      java.nio.file.Files.createTempDirectory("graft_snap_desc").toFile,
      "t").getAbsolutePath
    def frame(n: Long) = spark.range(n).select(col("id").as("k"),
      (col("id") % 4).cast("string").as("s"))
      .repartitionByRange(4, col("k"))
    SnapshotTable.write(spark, d, frame(40))
    SnapshotStats.indexMinMax(spark, d, "k") // v0 indexed manually
    SnapshotTable.tag(spark, d, "prod", 0L)
    SnapshotTable.write(spark, d, frame(80)) // v1: NOT indexed (no property)
    val rows = SnapshotTable.describe(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(rows(("table", "latest")) == "v=1")
    assert(rows(("tag", "prod")) == "v=0")
    assert(rows(("sidecar", "minmax:k")).contains("STALE"),
      s"v1 has no sidecar — describe must say so: $rows")
    // setting the property + committing v2 makes the head fresh again
    SnapshotStats.setAutoIndex(spark, d, Seq("minmax:k"))
    SnapshotTable.write(spark, d, frame(20))
    val after = SnapshotTable.describe(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(after(("autoindex", "minmax:k")).nonEmpty)
    assert(after(("sidecar", "minmax:k")) == "fresh @ v=2",
      s"auto-indexed head must describe as fresh: $after")
  }
}
