package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** The snapshot changelog as a streaming source
  * (`option("changes", "stream")` — CdcStreamTable): versions as
  * offsets, per-commit micro-batches with exact diff rows, checkpoint
  * resume, genesis bootstrap, and the schema-drift contract (loud fail
  * or evolve-aligned). */
class CdcStreamSpec extends SparkSpecBase {

  import scala.collection.concurrent.TrieMap

  private def mkDir(prefix: String): String =
    new java.io.File(Files.createTempDirectory(prefix).toFile, "t")
      .getAbsolutePath

  private def docsV(dir: String, pred: String): Long = {
    val docs = Lake.documents(spark, Sf).filter(pred)
    SnapshotTable.write(spark, dir, docs)
  }

  private def diffRows(dir: String, a: Long, b: Long): Seq[String] =
    SnapshotTable.rowDiff(spark, dir, a, b, "doc_id")
      .collect().map(_.toString).sorted.toSeq

  /** Start the changelog stream into a batch-capturing foreachBatch;
    * returns (query, batches): batchId → sorted row strings. Batches
    * that carry no rows are recorded too (they should not occur). */
  private def startCapture(dir: String, ckpt: String,
                           startingVersion: Option[Long])
      : (org.apache.spark.sql.streaming.StreamingQuery,
         TrieMap[Long, Seq[String]]) = {
    val batches = TrieMap.empty[Long, Seq[String]]
    var reader = spark.readStream.format("graft-snapshot")
      .option("changes", "stream").option("key", "doc_id")
    startingVersion.foreach(v => reader = reader.option("startingVersion", v))
    val q = reader.load(dir).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches.put(id, b.collect().map(_.toString).sorted.toSeq): Unit
      }
      .start()
    (q, batches)
  }

  test("three commits arrive as three micro-batches of exact diff rows") {
    val root = Files.createTempDirectory("graft_cdcstream").toString
    val dir = s"$root/t"
    docsV(dir, "doc_id < 100") // v0
    val (q, batches) = startCapture(dir, s"$root/ckpt", Some(-1L))
    try {
      // batch 0: genesis bootstrap — all of v0 as `added`
      q.processAllAvailable()
      assert(batches(0L) == diffRows(dir, -1L, 0L))
      assert(batches(0L).nonEmpty &&
        batches(0L).forall(_.contains("added")))
      // each further commit is its own batch with that commit's rowDiff
      docsV(dir, "doc_id >= 50 AND doc_id < 200") // v1: removes + adds
      q.processAllAvailable()
      assert(batches(1L) == diffRows(dir, 0L, 1L))
      docsV(dir, "doc_id >= 50 AND doc_id < 250") // v2: adds only
      q.processAllAvailable()
      assert(batches(2L) == diffRows(dir, 1L, 2L))
      assert(batches.size == 3)
    } finally q.stop()
    // restart from the SAME checkpoint: only commits past the
    // checkpointed version offset arrive (no replay of v0..v2)
    docsV(dir, "doc_id >= 100 AND doc_id < 250") // v3: removes 50..99
    val (q2, batches2) = startCapture(dir, s"$root/ckpt", Some(-1L))
    try {
      q2.processAllAvailable()
      val replayed = batches2.values.flatten.toSeq.sorted
      assert(replayed == diffRows(dir, 2L, 3L),
        "restart must resume from the checkpointed version, not genesis")
    } finally q2.stop()
  }

  test("default start is the latest commit: changes only, no backfill") {
    val root = Files.createTempDirectory("graft_cdcstream_tip").toString
    val dir = s"$root/t"
    docsV(dir, "doc_id < 100") // v0
    docsV(dir, "doc_id < 150") // v1
    val (q, batches) = startCapture(dir, s"$root/ckpt", None)
    try {
      q.processAllAvailable()
      assert(batches.values.flatten.isEmpty, "no new commit → no rows")
      docsV(dir, "doc_id < 180") // v2
      q.processAllAvailable()
      assert(batches.values.flatten.toSeq.sorted == diffRows(dir, 1L, 2L))
    } finally q.stop()
  }

  test("several commits while stopped coalesce into one exact batch") {
    val root = Files.createTempDirectory("graft_cdcstream_coal").toString
    val dir = s"$root/t"
    docsV(dir, "doc_id < 50")  // v0
    docsV(dir, "doc_id < 100") // v1
    docsV(dir, "doc_id < 150") // v2
    val (q, batches) = startCapture(dir, s"$root/ckpt", Some(0L))
    try {
      q.processAllAvailable()
      // span (0..2] = the concatenation of the per-pair diffs
      val want = (diffRows(dir, 0L, 1L) ++ diffRows(dir, 1L, 2L)).sorted
      assert(batches.values.flatten.toSeq.sorted == want)
    } finally q.stop()
    // the stream consumed the SAME materialized sidecars the batch
    // changes reader uses — per-pair, computed once
    val cdc = new java.io.File(s"$dir/_cdc")
    assert(cdc.isDirectory &&
      cdc.list().count(n => !n.startsWith(".")) >= 2)
  }

  test("streaming needs a key and a committed version; bad starts fail loudly") {
    val root = Files.createTempDirectory("graft_cdcstream_err").toString
    val dir = s"$root/t"
    val e0 = intercept[Exception] {
      spark.readStream.format("graft-snapshot")
        .option("changes", "stream").option("key", "doc_id").load(dir)
    }
    assert(e0.getMessage.contains("no committed version"))
    docsV(dir, "doc_id < 50")
    intercept[Exception] {
      spark.readStream.format("graft-snapshot")
        .option("changes", "stream").load(dir)
    }
    val (q, _) = startCapture(dir, s"$root/ckpt", Some(7L))
    try {
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(e.getMessage.contains("startingVersion") ||
        Option(e.getCause).exists(_.getMessage.contains("startingVersion")))
    } finally q.stop()
  }

  test("schema drift: loud fail with the drift report, or evolve-aligned") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cdc_drift").toString
    val dir = s"$root/t"
    SnapshotTable.write(spark, dir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"))
    // v1 ADDS a column
    SnapshotTable.write(spark, dir,
      Seq((1L, 10.0, "a"), (3L, 30.0, "c")).toDF("k", "x", "s"))
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.rowDiff(spark, dir, 0L, 1L, "k")
    }
    assert(e.getMessage.contains("schema drift") &&
      e.getMessage.contains("added s"), e.getMessage)
    // evolve=true aligns additively: the old side reads s as NULL, so
    // key 1 surfaces as updated (s: null → "a")
    val feed = spark.read.format("graft-snapshot")
      .option("changes", "0..1").option("key", "k")
      .option("evolve", "true").load(dir)
    val byType = feed.groupBy(col("change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("added" -> 1L, "removed" -> 1L, "updated" -> 1L))
    // a RETYPE cannot be aligned — loud fail names the column
    SnapshotTable.write(spark, dir,
      Seq((1L, "ten", "a")).toDF("k", "x", "s")) // v2 retypes x
    val e2 = intercept[IllegalArgumentException] {
      SnapshotTable.rowDiff(spark, dir, 1L, 2L, "k", evolve = true)
    }
    assert(e2.getMessage.contains("retyped") && e2.getMessage.contains("x"))
  }

  test("batch genesis read: changes -1..0 serves v0 as all-added") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cdc_genesis").toString
    val dir = s"$root/t"
    SnapshotTable.write(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    val feed = spark.read.format("graft-snapshot")
      .option("changes", "-1..0").option("key", "k").load(dir)
    assert(feed.count() == 2)
    assert(feed.select("change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("added"))
  }

  test("facade evolved read: option(evolve) = readEvolved, latest schema") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_evolve_read").toString
    val dir = s"$root/t"
    SnapshotTable.write(spark, dir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x"))
    SnapshotTable.write(spark, dir,
      Seq((1L, 10.0, "a"), (3L, 30.0, "c")).toDF("k", "x", "s"))
    val viaSource = spark.read.format("graft-snapshot")
      .option("version", 0).option("evolve", "true").load(dir)
    val viaApi = SnapshotTable.readEvolved(spark, dir, Some(0L))
    assert(viaSource.columns.toSeq == viaApi.columns.toSeq)
    assert(viaSource.collect().map(_.toString).sorted.toSeq ==
      viaApi.collect().map(_.toString).sorted.toSeq)
    assert(viaSource.filter(col("s").isNull).count() == 2,
      "added column must read as NULL in the old version")
    // without evolve, the raw v0 physical schema is served (2 columns)
    assert(spark.read.format("graft-snapshot")
      .option("version", 0).load(dir).columns.length == 2)
  }

  test("zero-row data files: sidecars cover them, pruning stays on") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_zero_file").toString
    val dir = s"$root/t"
    val df = spark.range(40).select(col("id").as("k"),
      (col("id") * 2.5).as("x"))
    SnapshotTable.write(spark, dir, df.repartitionByRange(4, col("k")))
    // plant a legitimate ZERO-ROW parquet file into the committed dir
    // (compactors and external writers produce these)
    val emptyTmp = s"$root/empty"
    df.filter(lit(false)).coalesce(1).write.parquet(emptyTmp)
    val part = new java.io.File(emptyTmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$dir/v=0", "part-zero.parquet"))
    graft.sources.SnapshotStats.indexMinMax(spark, dir, "k")
    // the sidecar must cover the empty file (keyset check) so pruning
    // still engages — before the coverage fix this silently fell back
    // to the full scan forever
    val probe = spark.read.format("graft-snapshot").load(dir)
      .filter(col("k") < 10)
    val files = probe.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan match {
          case f: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            f.fileIndex.inputFiles.toSeq
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(files.length < 5 && files.nonEmpty,
      s"pruning must stay on with a zero-row file present: $files")
    assert(probe.count() == 10)
  }
}
