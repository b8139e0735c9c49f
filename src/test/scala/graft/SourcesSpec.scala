package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Source/sink round-trips and partition pruning. */
class SourcesSpec extends SparkSpecBase {

  private lazy val tmp = Files.createTempDirectory("graft_sources").toString

  test("CSV round-trip preserves every value bit-exactly") {
    val orig = Lake.customer(spark, Sf)
    Sources.writeCsv(orig, s"$tmp/cust_csv")
    val back = Sources.readCsv(spark, s"$tmp/cust_csv", orig.schema)
    assert(back.schema == orig.schema)
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }

  test("JSONL round-trip preserves rows including timestamps") {
    val orig = Lake.orders(spark, Sf)
    Sources.writeJsonl(orig, s"$tmp/ord_json")
    val back = Sources.readJsonl(spark, s"$tmp/ord_json", orig.schema)
    assert(back.exceptAll(orig).count() == 0 && orig.exceptAll(back).count() == 0)
  }

  test("ORC round-trip is lossless and its scan pushes filters down") {
    val orig = Lake.lineitem(spark, Sf)
    val path = s"$tmp/lineitem_orc"
    Sources.writeOrc(orig, path)
    val back = Sources.readOrc(spark, path)
    assert(back.schema == orig.schema, "ORC must round-trip the schema")
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      "ORC round-trip must preserve every row bit-exactly")
    // pushdown + pruning reach the ORC scan just like parquet
    val plan = back.filter(col("l_quantity") < 5)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5"),
      s"filter must reach the ORC scan:\n$plan")
  }

  test("partitioned parquet write prunes partitions on read") {
    Sources.writePartitionedParquet(
      Lake.lineitem(spark, Sf), s"$tmp/li_part", Seq("l_returnflag"))
    val filtered = Sources.readParquet(spark, s"$tmp/li_part")
      .filter(col("l_returnflag") === "R")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("l_returnflag"),
      s"no partition pruning in:\n$plan")
    val expected = Lake.lineitem(spark, Sf).filter(col("l_returnflag") === "R").count()
    assert(filtered.count() == expected)
  }

  test("jsonl quarantine: malformed lines land in the dead-letter lane, nothing lost") {
    import org.apache.spark.sql.types._
    val path = s"$tmp/quarantine.jsonl"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """{"id": 1, "name": "ok"}
        |{"id": 2 "name": "broken-json"}
        |{"id": 3, "name": "fine"}
        |not json at all
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val (good, bad) = Sources.readJsonlQuarantined(spark, path, schema)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L),
      "exactly the well-formed rows parse")
    assert(good.columns.toSeq == Seq("id", "name"),
      "good lane carries the declared schema only")
    val raw = bad.collect().map(_.getString(0))
    assert(raw.length == 2, s"both bad lines quarantined: ${raw.toSeq}")
    assert(raw.exists(_.contains("broken-json")) &&
      raw.exists(_.contains("not json at all")),
      "quarantine preserves the original raw lines for replay")
  }

  test("binaryFile ingest feeds raw media files straight into the decode kernels") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_binfiles")
    // three REAL Netpbm images of distinct sizes, plus a decoy the glob
    // must prune at listing time
    for (i <- 1 to 3) {
      val img = graft.operators.MultimodalOps.ppmEncode(
        Array.tabulate(48 * i)(j => (j % 251).toByte))
      java.nio.file.Files.write(dir.resolve(s"img$i.ppm"), img)
    }
    java.nio.file.Files.write(dir.resolve("notes.txt"), "decoy".getBytes)
    val files = graft.sources.Sources.readBinaryFiles(spark, dir.toString,
      glob = "*.ppm")
    val rows = files.collect()
    assert(rows.length == 3, "glob must prune the decoy at listing time")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 3,
      "path-hashed ids are distinct")
    for (r <- rows) {
      val onDisk = java.nio.file.Files.size(
        java.nio.file.Paths.get(new java.net.URI(r.getAs[String]("path"))))
      assert(r.getAs[Long]("n_bytes") == onDisk)
      assert(r.getAs[Array[Byte]]("payload").length == onDisk,
        "payload carries the exact file bytes")
    }
    // the frame satisfies the multimodal payload contract end-to-end
    val feats = graft.operators.MultimodalOps.decodeFeaturesOf(files).collect()
    assert(feats.length == 3)
    for (f <- feats) {
      val v = f.getAs[scala.collection.Seq[Float]]("features")
      assert(v.head == 16.0f, s"decoded width: $v")
      assert(v(1) >= 1.0f && v(1) <= 3.0f, s"decoded height: $v")
    }
  }
}
