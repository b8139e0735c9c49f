package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Snapshot-table semantics: versioned commits, time travel, vacuum. */
class SnapshotTableSpec extends SparkSpecBase {

  test("commits version, time-travels, and vacuums old versions") {
    val dir = Files.createTempDirectory("graft_snap").toString + "/tbl"
    val docs = Lake.documents(spark, Sf)

    assert(SnapshotTable.latestVersion(spark, dir).isEmpty)
    val v0 = SnapshotTable.write(spark, dir, docs.filter("doc_id < 100"))
    val v1 = SnapshotTable.write(spark, dir, docs.filter("doc_id < 300"))
    val v2 = SnapshotTable.write(spark, dir, docs)
    assert((v0, v1, v2) == (0L, 1L, 2L))

    // latest reads v2; explicit versions time-travel
    assert(SnapshotTable.read(spark, dir).count() == 500)
    assert(SnapshotTable.read(spark, dir, Some(0L)).count() == 100)
    assert(SnapshotTable.read(spark, dir, Some(1L)).count() == 300)

    // a reader holding v1 still works after a new commit
    val heldV1 = SnapshotTable.read(spark, dir, Some(1L))
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 50"))
    assert(heldV1.count() == 300, "old version must stay readable after commits")
    assert(SnapshotTable.read(spark, dir).count() == 50)

    // vacuum keeps the latest two versions
    val dropped = SnapshotTable.vacuum(spark, dir, keepLast = 2)
    assert(dropped == Seq(0L, 1L), s"expected to drop v0,v1; dropped $dropped")
    assert(SnapshotTable.read(spark, dir).count() == 50)
    intercept[Exception](SnapshotTable.read(spark, dir, Some(0L)).count())
  }

  test("concurrent writers both commit, each marker pointing at its own data") {
    val dir = Files.createTempDirectory("graft_snap_cc").toString + "/tbl"
    val docs = Lake.documents(spark, Sf)
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 10"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(SnapshotTable.write(spark, dir, docs.filter("doc_id < 100")))
    val fb = Future(SnapshotTable.write(spark, dir, docs.filter("doc_id < 200")))
    val va = Await.result(fa, 120.seconds)
    val vb = Await.result(fb, 120.seconds)
    assert(va != vb, "concurrent writers must land on distinct versions")
    val counts = Set(SnapshotTable.read(spark, dir, Some(va)).count(),
                     SnapshotTable.read(spark, dir, Some(vb)).count())
    assert(counts == Set(100L, 200L),
      s"each version must hold exactly its writer's data, got $counts")
    assert(SnapshotTable.latestVersion(spark, dir).contains(math.max(va, vb)))
  }

  test("a claim conflict advances the writer past the contested version") {
    val dir = Files.createTempDirectory("graft_snap_claim").toString + "/tbl"
    val docs = Lake.documents(spark, Sf)
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 10")) // v0
    // simulate a concurrent (or crashed) writer holding the claim on v1
    val p = new org.apache.hadoop.fs.Path(dir, "_claim_1")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(p, false).close()
    val v = SnapshotTable.write(spark, dir, docs.filter("doc_id < 100"))
    assert(v == 2L, s"writer must skip the claimed v1, got v$v")
    assert(SnapshotTable.read(spark, dir, Some(2L)).count() == 100)
    assert(SnapshotTable.latestVersion(spark, dir).contains(2L))
    // the orphan claim never becomes a readable version
    intercept[Exception](SnapshotTable.read(spark, dir, Some(1L)).count())
  }

  test("schema evolution: later versions may add columns; reads stay version-exact") {
    val dir = Files.createTempDirectory("graft_snap_ev").toString + "/tbl"
    val base = Lake.documents(spark, Sf).select("doc_id", "text")
    SnapshotTable.write(spark, dir, base)
    SnapshotTable.write(spark, dir,
      base.withColumn("quality", length(col("text")).cast("double")))
    assert(!SnapshotTable.read(spark, dir, Some(0L)).columns.contains("quality"))
    assert(SnapshotTable.read(spark, dir).columns.contains("quality"))
    // the merge-schema path: v0 under the latest schema — added column
    // surfaces as NULL, data and types otherwise intact
    val evolved = SnapshotTable.readEvolved(spark, dir, Some(0L))
    assert(evolved.columns.toSeq == SnapshotTable.read(spark, dir).columns.toSeq)
    assert(evolved.schema("quality").dataType.typeName == "double")
    assert(evolved.filter(col("quality").isNotNull).count() == 0)
    assert(evolved.count() == base.count())
    // and a version-evolved union across commits is well-typed
    val unioned = evolved.union(SnapshotTable.readEvolved(spark, dir, Some(1L)))
    assert(unioned.count() == 2 * base.count())
  }

  test("schemaDiff reports added, removed, and retyped columns between versions") {
    val dir = Files.createTempDirectory("graft_snap_sd").toString + "/tbl"
    val base = Lake.documents(spark, Sf).select("doc_id", "text", "n_chars")
    SnapshotTable.write(spark, dir, base)
    SnapshotTable.write(spark, dir, base
      .drop("n_chars")                                   // removed
      .withColumn("doc_id", col("doc_id").cast("int"))   // retyped
      .withColumn("quality", length(col("text")).cast("double"))) // added
    val changes = SnapshotTable.schemaDiff(spark, dir, 0L, 1L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(changes.toSet == Set(
      ("added", "quality", null, "double"),
      ("removed", "n_chars", "bigint", null),
      ("retyped", "doc_id", "bigint", "int")),
      s"schema diff wrong: ${changes.toSeq}")
    // identical versions → empty report
    assert(SnapshotTable.schemaDiff(spark, dir, 1L, 1L).count() == 0)
  }

  test("merge upserts by key and delete erases by predicate, both copy-on-write") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snap_merge").toString + "/tbl"
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
    SnapshotTable.write(spark, dir, base)
    // update id=2, insert id=4
    val updates = Seq((2L, "b2", 25.0), (4L, "d", 40.0)).toDF("id", "name", "score")
    val v1 = SnapshotTable.merge(spark, dir, updates, "id")
    assert(v1 == 1L)
    val after = SnapshotTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(after == Map(1L -> ("a", 10.0), 2L -> ("b2", 25.0),
      3L -> ("c", 30.0), 4L -> ("d", 40.0)))
    // snapshot isolation: v0 still has the pre-merge rows
    assert(SnapshotTable.read(spark, dir, Some(0L)).count() == 3)
    // schema drift is rejected, not silently merged
    intercept[IllegalArgumentException](
      SnapshotTable.merge(spark, dir, updates.withColumnRenamed("score", "s"), "id"))
    // delete id <= 1: new version without it, old versions intact
    val v2 = SnapshotTable.delete(spark, dir, col("id") <= 1)
    assert(v2 == 2L)
    assert(SnapshotTable.read(spark, dir).select("id").collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
    assert(SnapshotTable.read(spark, dir, Some(1L)).count() == 4)
  }

  test("tags name versions; re-tag moves the ref; stale names rejected") {
    val dir = Files.createTempDirectory("graft_snap_tag").toString + "/tbl"
    val docs = Lake.documents(spark, Sf)
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 100")) // v0
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 300")) // v1
    SnapshotTable.tag(spark, dir, "prod", 0L)
    assert(SnapshotTable.tagVersion(spark, dir, "prod").contains(0L))
    assert(SnapshotTable.readTag(spark, dir, "prod").count() == 100)
    // readers pinned to the tag are unaffected by newer commits
    SnapshotTable.write(spark, dir, docs) // v2
    assert(SnapshotTable.readTag(spark, dir, "prod").count() == 100)
    // re-tag moves the ref atomically
    SnapshotTable.tag(spark, dir, "prod", 2L)
    assert(SnapshotTable.readTag(spark, dir, "prod").count() == 500)
    // tagging an uncommitted version or using a bad name is rejected
    intercept[IllegalArgumentException](SnapshotTable.tag(spark, dir, "x", 9L))
    intercept[IllegalArgumentException](SnapshotTable.tag(spark, dir, "a/b", 0L))
    intercept[IllegalArgumentException](SnapshotTable.readTag(spark, dir, "nope"))
  }

  test("branches stage writes invisibly to main, publish fast-forward only") {
    val dir = Files.createTempDirectory("graft_snap_branch").toString + "/tbl"
    val docs = Lake.documents(spark, Sf)
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 100"))  // v0 (main)
    SnapshotTable.createBranch(spark, dir, "audit")
    // before any branch write, the branch reads its fork point
    assert(SnapshotTable.readBranch(spark, dir, "audit").count() == 100)
    // two branch writes: both staged, main never moves
    val s1 = SnapshotTable.writeBranch(spark, dir, "audit", docs.filter("doc_id < 200"))
    val s2 = SnapshotTable.writeBranch(spark, dir, "audit", docs.filter("doc_id < 300"))
    assert(s2 > s1 && s1 > 0L, s"staged versions must be fresh numbers: $s1, $s2")
    assert(SnapshotTable.latestVersion(spark, dir).contains(0L),
      "main must not see staged branch commits")
    assert(SnapshotTable.read(spark, dir).count() == 100)
    assert(SnapshotTable.readBranch(spark, dir, "audit").count() == 300)
    // a main write AFTER the branch head blocks fast-forward publish
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 150"))  // claims s2+1
    intercept[IllegalStateException](SnapshotTable.publishBranch(spark, dir, "audit"))
    // a re-write of the branch past main's head publishes cleanly
    val s3 = SnapshotTable.writeBranch(spark, dir, "audit", docs.filter("doc_id < 400"))
    assert(SnapshotTable.publishBranch(spark, dir, "audit") == s3)
    assert(SnapshotTable.latestVersion(spark, dir).contains(s3))
    assert(SnapshotTable.read(spark, dir).count() == 400)
    // double publish is rejected; vacuumStaged drops the superseded heads
    intercept[IllegalStateException](SnapshotTable.publishBranch(spark, dir, "audit"))
    SnapshotTable.dropBranch(spark, dir, "audit")
    val dropped = SnapshotTable.vacuumStaged(spark, dir)
    assert(dropped == Seq(s1, s2), s"superseded staged heads must go: $dropped")
    // published + main history is untouched by the staged vacuum
    assert(SnapshotTable.versions(spark, dir) == Seq(0L, s2 + 1, s3))
    assert(SnapshotTable.read(spark, dir, Some(0L)).count() == 100)
    intercept[IllegalArgumentException](SnapshotTable.readBranch(spark, dir, "audit"))
    intercept[IllegalArgumentException](SnapshotTable.createBranch(spark, dir, "x", Some(99L)))
  }

  test("diff emits exactly the added/removed/updated keys between versions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snap_diff").toString + "/tbl"
    val v0 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "score")
    val v1 = Seq((2L, "b", 20.0), (3L, "c2", 30.0), (4L, "d", 40.0))
      .toDF("id", "name", "score")
    SnapshotTable.write(spark, dir, v0)
    SnapshotTable.write(spark, dir, v1)
    val d = SnapshotTable.diff(spark, dir, 0L, 1L, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 2L unchanged → absent; diff is proportional to the change
    assert(d == Map(1L -> "removed", 3L -> "updated", 4L -> "added"), s"got $d")
    // diff is directional: reversed versions swap added/removed
    val rev = SnapshotTable.diff(spark, dir, 1L, 0L, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rev == Map(1L -> "added", 3L -> "updated", 4L -> "removed"), s"got $rev")
    // schema drift between compared versions is rejected
    SnapshotTable.write(spark, dir, v1.withColumnRenamed("score", "s"))
    intercept[IllegalArgumentException](SnapshotTable.diff(spark, dir, 0L, 2L, "id"))
  }

  test("versionDrift flags a shifted commit and clears an unchanged one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_snap_drift").toString + "/tbl"
    val base = (1 to 1000).map(i => (i.toLong, (i % 100).toDouble))
    SnapshotTable.write(spark, dir, base.toDF("id", "v"))
    SnapshotTable.write(spark, dir, base.toDF("id", "v")) // v1 identical
    SnapshotTable.write(spark, dir, // v2: mass shifted up by 50
      base.map { case (id, v) => (id, v + 50.0) }.toDF("id", "v"))
    def psi(vOld: Long, vNew: Long): Double =
      SnapshotTable.versionDrift(spark, dir, vOld, vNew, "v", 25.0)
        .agg(org.apache.spark.sql.functions.sum("psi_term")).head().getDouble(0)
    assert(math.abs(psi(0L, 1L)) < 0.01,
      s"identical versions must show ~zero PSI, got ${psi(0L, 1L)}")
    assert(psi(0L, 2L) > 0.25,
      s"a 50-point shift must cross the PSI investigate line, got ${psi(0L, 2L)}")
  }

  test("streaming micro-batches upsert into a snapshot table via foreachBatch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = Files.createTempDirectory("graft_snap_stream").toString + "/tbl"
    SnapshotTable.write(spark, dir,
      Seq((0L, 0.0)).toDF("id", "score"))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val q = input.toDF().toDF("id", "score")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) SnapshotTable.merge(spark, dir, batch, "id"): Unit
      }
      .start()
    input.addData((1L, 1.0), (2L, 2.0))
    q.processAllAvailable()
    input.addData((2L, 22.0), (3L, 3.0)) // second batch updates id=2
    q.processAllAvailable()
    q.stop()
    val finalRows = SnapshotTable.read(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(finalRows == Map(0L -> 0.0, 1L -> 1.0, 2L -> 22.0, 3L -> 3.0),
      s"streamed upserts must land with last-write-wins per key, got $finalRows")
    // each non-empty micro-batch committed its own version
    assert(SnapshotTable.versions(spark, dir).length >= 2)
  }

  test("compaction commits a new version with fewer files, data intact") {
    val dir = Files.createTempDirectory("graft_snap_cpt").toString + "/tbl"
    val docs = Lake.documents(spark, Sf)
    SnapshotTable.write(spark, dir, docs.repartition(40))
    def nFiles(v: Long) = new java.io.File(s"$dir/v=$v")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(nFiles(0) == 40)
    val v = SnapshotTable.compact(spark, dir, targetFiles = 4)
    assert(v == 1L && nFiles(1) == 4, s"compaction must rewrite into 4 files")
    assert(SnapshotTable.read(spark, dir).count() == docs.count())
    // snapshot isolation: the pre-compaction version is untouched
    assert(SnapshotTable.read(spark, dir, Some(0L)).count() == docs.count())
    assert(nFiles(0) == 40)
    // content identical, not just counts
    assert(SnapshotTable.read(spark, dir).exceptAll(
      SnapshotTable.read(spark, dir, Some(0L))).isEmpty)
  }

  test("expire keeps tag- and branch-referenced versions as GC roots; vacuum does not") {
    val dir = Files.createTempDirectory("graft_snap_expire").toString + "/tbl"
    val docs = Lake.documents(spark, Sf)
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 100")) // v0 — expendable
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 200")) // v1 — tagged
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 300")) // v2 — branch base
    SnapshotTable.write(spark, dir, docs.filter("doc_id < 400")) // v3 — latest
    SnapshotTable.tag(spark, dir, "release", 1L)
    SnapshotTable.createBranch(spark, dir, "audit", Some(2L))
    val dropped = SnapshotTable.expire(spark, dir, keepLast = 1)
    assert(dropped == Seq(0L), s"only the unreferenced v0 may go: $dropped")
    assert(SnapshotTable.versions(spark, dir) == Seq(1L, 2L, 3L))
    // the pinned readers survive the retention sweep
    assert(SnapshotTable.readTag(spark, dir, "release").count() == 200)
    assert(SnapshotTable.readBranch(spark, dir, "audit").count() == 300)
    // a second expire is a no-op (idempotent under an unchanged policy)
    assert(SnapshotTable.expire(spark, dir, keepLast = 1).isEmpty)
    // contrast: raw vacuum would reclaim the tagged version too
    SnapshotTable.vacuum(spark, dir, keepLast = 1)
    assert(SnapshotTable.versions(spark, dir) == Seq(3L),
      "vacuum is the ref-blind form — that is WHY expire exists")
  }

  test("publishAtomic: staged heads of several tables promote together") {
    val root = Files.createTempDirectory("graft_snap_txn").toString
    val (a, b) = (s"$root/a", s"$root/b")
    val docs = Lake.documents(spark, Sf)
    for (d <- Seq(a, b)) {
      SnapshotTable.write(spark, d, docs.filter("doc_id < 100"))
      SnapshotTable.createBranch(spark, d, "wap")
    }
    val sa = SnapshotTable.writeBranch(spark, a, "wap", docs.filter("doc_id < 200"))
    val sb = SnapshotTable.writeBranch(spark, b, "wap", docs.filter("doc_id < 300"))
    assert(SnapshotTable.latestVersion(spark, a).contains(0L))
    val published = SnapshotTable.publishAtomic(spark,
      Seq(a -> "wap", b -> "wap"))
    assert(published == Map(a -> sa, b -> sb))
    assert(SnapshotTable.read(spark, a).count() == 200)
    assert(SnapshotTable.read(spark, b).count() == 300)
    // no transaction residue: journal, locks and staged markers all gone
    for (d <- Seq(a, b)) {
      val left = new java.io.File(d).list().toSeq
        .filter(n => n.startsWith("_txn_") || n.startsWith("_staged_"))
      assert(left.isEmpty, s"txn residue in $d: $left")
    }
  }

  test("publishAtomic: a failed validation publishes NEITHER table") {
    val root = Files.createTempDirectory("graft_snap_txn2").toString
    val (a, b) = (s"$root/a", s"$root/b")
    val docs = Lake.documents(spark, Sf)
    for (d <- Seq(a, b)) {
      SnapshotTable.write(spark, d, docs.filter("doc_id < 100"))
      SnapshotTable.createBranch(spark, d, "wap")
    }
    SnapshotTable.writeBranch(spark, a, "wap", docs.filter("doc_id < 200"))
    // b's branch head is its fork point — committed, NOT staged
    intercept[IllegalStateException](
      SnapshotTable.publishAtomic(spark, Seq(a -> "wap", b -> "wap")))
    assert(SnapshotTable.latestVersion(spark, a).contains(0L),
      "a validation failure must not publish the valid table either")
    assert(SnapshotTable.latestVersion(spark, b).contains(0L))
    // locks were released on abort: the corrected transaction goes through
    SnapshotTable.writeBranch(spark, b, "wap", docs.filter("doc_id < 300"))
    assert(SnapshotTable.publishAtomic(spark,
      Seq(a -> "wap", b -> "wap")).size == 2)
  }

  test("publishAtomic crash window: recoverTxn rolls the journal forward") {
    val root = Files.createTempDirectory("graft_snap_txn3").toString
    // sorted order decides the coordinator — make it deterministic
    val (a, b) = (s"$root/a", s"$root/b")
    val docs = Lake.documents(spark, Sf)
    for (d <- Seq(a, b)) {
      SnapshotTable.write(spark, d, docs.filter("doc_id < 100"))
      SnapshotTable.createBranch(spark, d, "wap")
    }
    val sa = SnapshotTable.writeBranch(spark, a, "wap", docs.filter("doc_id < 200"))
    val sb = SnapshotTable.writeBranch(spark, b, "wap", docs.filter("doc_id < 300"))
    // simulate a publisher that died right after the commit point: locks
    // held, journal written, table a promoted, table b still staged
    import java.nio.file.{Files => JFiles, Paths}
    JFiles.createFile(Paths.get(a, "_txn_lock"))
    JFiles.createFile(Paths.get(b, "_txn_lock"))
    JFiles.write(Paths.get(a, "_txn_deadbeef"),
      s"$a\t$sa\n$b\t$sb".getBytes("UTF-8"))
    JFiles.createFile(Paths.get(a, s"_commit_$sa"))
    JFiles.delete(Paths.get(a, s"_staged_$sa"))
    // a competing publisher is blocked while the crash is unrecovered
    intercept[IllegalStateException](
      SnapshotTable.publishAtomic(spark, Seq(b -> "wap")))
    val recovered = SnapshotTable.recoverTxn(spark, a)
    assert(recovered == Seq("deadbeef"))
    assert(SnapshotTable.latestVersion(spark, a).contains(sa))
    assert(SnapshotTable.latestVersion(spark, b).contains(sb),
      "recovery must complete the journaled transaction (together)")
    assert(SnapshotTable.read(spark, b).count() == 300)
    for (d <- Seq(a, b))
      assert(!new java.io.File(d, "_txn_lock").exists(), s"lock left in $d")
    // idempotent: a second recovery finds nothing
    assert(SnapshotTable.recoverTxn(spark, a).isEmpty)
    // a journal-less stale lock is cleared by recovery too
    JFiles.createFile(Paths.get(b, "_txn_lock"))
    SnapshotTable.recoverTxn(spark, b)
    assert(!new java.io.File(b, "_txn_lock").exists())
  }

  test("timeTravelQuery reuses one scratch dir across invocations") {
    val tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))
    def snapDirs() = tmpRoot.listFiles()
      .count(_.getName.startsWith("graft_snap_q"))
    assert(SnapshotTable.timeTravelQuery(spark, Sf).count() > 0)
    val after1 = snapDirs()
    SnapshotTable.timeTravelQuery(spark, Sf).count()
    SnapshotTable.timeTravelQuery(spark, Sf).count()
    assert(snapDirs() == after1,
      "repeated invocations must not accumulate scratch dirs")
  }
}
