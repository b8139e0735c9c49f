package graft

import org.apache.spark.sql.functions._

import graft.sources.{SnapshotSource, SnapshotTable}

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
}
