package graft

import org.apache.spark.sql.functions._

import graft.sources.{GraftCatalog, SnapshotStats, SnapshotTable}

/** The SQL-native catalog: namespace/table DDL, INSERT-commits-a-version
  * semantics, VERSION/TIMESTAMP AS OF time travel, and the `CALL`
  * maintenance procedures. */
class GraftCatalogSpec extends SparkSpecBase {

  private val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft_catalog")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** Registered once for the whole suite (catalog instances cache by
    * name, so the warehouse conf must be set before first reference). */
  private lazy val cat: String = {
    spark.conf.set("spark.sql.catalog.gtest",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.lake")
    "gtest"
  }

  test("namespace DDL: create, list, describe, drop") {
    spark.sql(s"CREATE NAMESPACE $cat.tmpns")
    val namespaces = spark.sql(s"SHOW NAMESPACES IN $cat")
      .collect().map(_.getString(0)).toSet
    assert(namespaces.contains("tmpns") && namespaces.contains("lake"))
    val meta = spark.sql(s"DESCRIBE NAMESPACE $cat.tmpns").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(meta.getOrElse("Location", "").contains("tmpns"))
    spark.sql(s"DROP NAMESPACE $cat.tmpns")
    assert(!spark.sql(s"SHOW NAMESPACES IN $cat")
      .collect().map(_.getString(0)).contains("tmpns"))
  }

  test("create + insert commits versions; append vs overwrite; time travel") {
    spark.sql(s"CREATE TABLE $cat.lake.t (k BIGINT, s STRING, x DOUBLE)")
    // empty table: declared schema, zero rows
    val empty = spark.sql(s"SELECT * FROM $cat.lake.t")
    assert(empty.columns.toSeq == Seq("k", "s", "x") && empty.count() == 0)

    spark.sql(s"INSERT INTO $cat.lake.t VALUES (1, 'a', 1.5), (2, 'b', 2.5)")
    spark.sql(s"INSERT INTO $cat.lake.t VALUES (3, 'c', 3.5)")
    // INSERT INTO appends: latest = v0 rows ∪ new rows
    assert(spark.sql(s"SELECT * FROM $cat.lake.t").count() == 3)
    assert(spark.table(s"$cat.lake.t").agg(sum("k")).head.getLong(0) == 6L)
    // both commits remain readable
    assert(spark.sql(s"SELECT * FROM $cat.lake.t VERSION AS OF 0").count() == 2)
    assert(spark.sql(s"SELECT * FROM $cat.lake.t VERSION AS OF 1").count() == 3)
    // INSERT OVERWRITE replaces content in a NEW version — history intact
    spark.sql(s"INSERT OVERWRITE $cat.lake.t VALUES (9, 'z', 9.5)")
    assert(spark.sql(s"SELECT * FROM $cat.lake.t").count() == 1)
    assert(spark.sql(s"SELECT * FROM $cat.lake.t VERSION AS OF 1").count() == 3)

    // TIMESTAMP AS OF: resolve by commit instant (v1's marker mtime)
    val t1 = SnapshotTable.commitTimes(spark, s"$wh/lake/t")
      .find(_._1 == 1L).get._2
    val iso = java.time.Instant.ofEpochMilli(t1).toString
    val asOf = spark.sql(
      s"SELECT count(*) FROM $cat.lake.t TIMESTAMP AS OF '$iso'")
    assert(asOf.head.getLong(0) == 3L)
  }

  test("tag refs resolve through VERSION AS OF strings") {
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.lake.tagged (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.tagged VALUES (1)")
    spark.sql(s"INSERT INTO $cat.lake.tagged VALUES (2)")
    spark.sql(
      s"CALL $cat.system.snapshot_tag(table => 'lake.tagged', tag => 'first', version => 0)")
    assert(spark.sql(
      s"SELECT * FROM $cat.lake.tagged VERSION AS OF 'first'").count() == 1)
    // default version = -1 → latest
    val latest = spark.sql(
      s"CALL $cat.system.snapshot_tag('lake.tagged', 'head')").collect()
    assert(latest.head.getLong(1) == 1L)
  }

  test("catalog reads keep parquet pushdown and stats-sidecar pruning") {
    spark.sql(s"CREATE TABLE $cat.lake.pruned (k BIGINT, s STRING)")
    import spark.implicits._
    val df = (0L until 400L).map(i => (i, s"s$i")).toDF("k", "s")
    SnapshotTable.write(spark, s"$wh/lake/pruned",
      df.repartitionByRange(8, col("k")))
    SnapshotStats.indexMinMax(spark, s"$wh/lake/pruned", "k")
    val q = spark.sql(s"SELECT k FROM $cat.lake.pruned WHERE k >= 390")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(k,390"), s"no pushdown:\n$plan")
    // a pruned scan plans over the explicit surviving FILE list (the
    // location shows a part file); an unpruned scan lists the v=0 DIR
    assert(plan.contains("InMemoryFileIndex(1 paths)") &&
      plan.contains("/v=0/part-"),
      s"stats pruning did not engage through the catalog:\n$plan")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (390L until 400L))
  }

  test("CALL procedures: history, describe, compact, rollback, expire, index") {
    spark.sql(s"CREATE TABLE $cat.lake.m (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.m SELECT id FROM range(100)")
    spark.sql(s"INSERT INTO $cat.lake.m SELECT id FROM range(100, 150)")

    val hist = spark.sql(
      s"CALL $cat.system.snapshot_history('lake.m')").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(hist.forall(r => r.getLong(2) > 0 && r.getLong(3) > 0))

    val compacted = spark.sql(
      s"CALL $cat.system.snapshot_compact(table => 'lake.m', target_files => 2)")
      .collect()
    assert(compacted.head.getLong(0) == 2L && compacted.head.getInt(1) == 2)
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.m").head.getLong(0) == 150L)

    val rolled = spark.sql(
      s"CALL $cat.system.snapshot_rollback('lake.m', 0)").collect()
    assert(rolled.head.getLong(0) == 3L && rolled.head.getLong(1) == 0L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.m").head.getLong(0) == 100L)

    val idx = spark.sql(
      s"CALL $cat.system.snapshot_index('lake.m', 'minmax:k')").collect()
    assert(idx.head.getString(0) == "minmax:k" && idx.head.getLong(1) == 3L)
    val desc = spark.sql(
      s"CALL $cat.system.snapshot_describe('lake.m')").collect()
    assert(desc.exists(r => r.getString(0) == "sidecar" &&
      r.getString(2).startsWith("fresh")))

    val dropped = spark.sql(
      s"CALL $cat.system.snapshot_expire(table => 'lake.m', keep_last => 1)")
      .collect().map(_.getLong(0)).toSeq
    assert(dropped == Seq(0L, 1L, 2L))
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.m").head.getLong(0) == 100L)
  }

  test("SHOW TABLES, rename, drop, and loud failures") {
    spark.sql(s"CREATE TABLE $cat.lake.a (k BIGINT)")
    assert(spark.sql(s"SHOW TABLES IN $cat.lake").collect()
      .map(_.getString(1)).contains("a"))
    // the rename target is catalog-relative (a rename cannot cross
    // catalogs, so Spark parses every part as namespace)
    spark.sql(s"ALTER TABLE $cat.lake.a RENAME TO lake.b")
    val names = spark.sql(s"SHOW TABLES IN $cat.lake").collect()
      .map(_.getString(1)).toSet
    assert(names.contains("b") && !names.contains("a"))
    spark.sql(s"DROP TABLE $cat.lake.b")
    assert(!spark.sql(s"SHOW TABLES IN $cat.lake").collect()
      .map(_.getString(1)).contains("b"))

    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.lake.vt (k BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.vt VALUES (1)")
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.lake.vt VERSION AS OF 99").collect())
    assert(e.getMessage.contains("no committed version 99"))
    val e2 = intercept[Exception](
      spark.sql(s"CALL $cat.system.no_such_proc('x')").collect())
    assert(e2.getMessage.toLowerCase.contains("no_such_proc"))
  }

  test("SHOW PROCEDURES lists the maintenance verbs") {
    val procs = spark.sql(s"SHOW PROCEDURES IN $cat.system").collect()
      .map(_.toSeq.map(String.valueOf).mkString(" ")).mkString("\n")
    Seq("snapshot_history", "snapshot_compact", "snapshot_vacuum",
      "snapshot_tag", "snapshot_rollback", "snapshot_recover")
      .foreach(p => assert(procs.contains(p), s"missing $p in:\n$procs"))
  }
}
