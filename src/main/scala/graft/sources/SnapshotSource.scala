package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 façade over [[SnapshotTable]] — the integration that
  * makes snapshot tables first-class to ANY Spark reader, not just
  * callers of the Scala API:
  *
  * {{{
  *   spark.read.format("graft-snapshot").load(dir)                  // latest
  *   spark.read.format("graft-snapshot").option("version", 3).load(dir)
  *   spark.read.format("graft-snapshot").option("tag", "prod").load(dir)
  * }}}
  *
  * The provider resolves which committed `v=N` directory the options
  * name — explicit `version` (validated against the commit markers, so
  * a vacuumed or never-committed number fails loudly instead of
  * reading orphan data), a named `tag` ref, or the latest commit — and
  * then DELEGATES to Spark's own V2 [[ParquetTable]] over that one
  * directory. Delegation is the design: predicate pushdown, column
  * pruning, partition planning, vectorized reading and every future
  * parquet improvement come from the stock implementation; this class
  * only owns the version-resolution semantics (asserted in
  * SnapshotSourceSpec: pushed filters reach the scan through the
  * façade). Registered under the short name `graft-snapshot` via the
  * standard DataSourceRegister service file. */
class SnapshotSource extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.CreatableRelationProvider {

  override def shortName(): String = "graft-snapshot"

  /** Write path — `df.write.format("graft-snapshot").mode(m).save(dir)`
    * — through the V1 CreatableRelationProvider fallback (the standard
    * hybrid for sources whose V2 Table is read-only): every successful
    * write COMMITS A NEW VERSION via [[SnapshotTable.write]]'s
    * claim/marker protocol — history is never clobbered, so Append and
    * Overwrite differ only in intent (both advance the latest version;
    * time travel keeps every prior commit readable). ErrorIfExists
    * (the writer default) refuses a non-empty table; Ignore writes
    * only the first version. */
  override def createRelation(
      sqlContext: org.apache.spark.sql.SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.sources.BaseRelation = {
    import org.apache.spark.sql.SaveMode._
    val dir = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot needs a table directory: .save(<dir>)"))
    val spark = sqlContext.sparkSession
    val empty = SnapshotTable.versions(spark, dir).isEmpty
    mode match {
      case Append | Overwrite => SnapshotTable.write(spark, dir, data)
      case ErrorIfExists =>
        if (!empty) throw new IllegalStateException(
          s"snapshot table $dir already has commits (mode ErrorIfExists); " +
            "use Append to commit a new version")
        SnapshotTable.write(spark, dir, data)
      case Ignore => if (empty) SnapshotTable.write(spark, dir, data)
    }
    val ctx = sqlContext
    new org.apache.spark.sql.sources.BaseRelation {
      override def sqlContext: org.apache.spark.sql.SQLContext = ctx
      override def schema: StructType = data.schema
    }
  }

  /** The resolved version's scan, wrapped READ-ONLY. The wrapper is
    * load-bearing for the write path: Spark's DataFrameWriter prefers a
    * V2 table that `SupportsWrite` — and FileTable (ParquetTable) does,
    * with plain directory-append semantics that would bypass the
    * claim/marker commit protocol entirely. Hiding the write capability
    * forces the writer down the V1 `CreatableRelationProvider` fallback
    * above, which commits properly. Reads keep the delegate's
    * ScanBuilder, so pushdown/pruning are untouched. */
  private final class ReadOnlySnapshot(delegate: ParquetTable)
      extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
    override def name(): String = delegate.name
    override def schema(): StructType = delegate.schema
    override def capabilities()
        : util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
      util.EnumSet.of(
        org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : org.apache.spark.sql.connector.read.ScanBuilder =
      delegate.newScanBuilder(options)
  }

  /** Placeholder for a table with no commits yet: schemaless and
    * capability-free, so a WRITE falls through to the V1 path (which
    * creates version 0) and a READ fails with the no-commits message at
    * scan-capability check time. */
  private final class EmptySnapshot(dir: String) extends Table {
    override def name(): String = s"graft-snapshot $dir (no commits)"
    override def schema(): StructType = new StructType()
    override def capabilities()
        : util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
      util.EnumSet.noneOf(
        classOf[org.apache.spark.sql.connector.catalog.TableCapability])
  }

  private def resolve(options: CaseInsensitiveStringMap): Table = {
    val dir = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot needs a table directory: .load(<dir>)"))
    val spark = SparkSession.active
    val explicit = Option(options.get("version")).map(_.toLong)
    val tag = Option(options.get("tag"))
    require(explicit.isEmpty || tag.isEmpty,
      "pass either version or tag, not both")
    val committed = SnapshotTable.versions(spark, dir)
    if (committed.isEmpty && explicit.isEmpty && tag.isEmpty)
      return new EmptySnapshot(dir) // first write of a fresh table
    val v = explicit
      .orElse(tag.map(t => SnapshotTable.tagVersion(spark, dir, t)
        .getOrElse(throw new IllegalArgumentException(
          s"snapshot table $dir has no tag '$t'"))))
      .getOrElse(committed.lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"snapshot table $dir has no committed version")))
    if (!committed.contains(v))
      throw new IllegalArgumentException(
        s"snapshot table $dir has no committed version $v " +
          "(vacuumed or never written)")
    new ReadOnlySnapshot(
      ParquetTable(s"graft-snapshot $dir@v$v", spark, options,
        Seq(s"$dir/v=$v"), None, classOf[ParquetFileFormat]))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    resolve(new CaseInsensitiveStringMap(properties))
}

object SnapshotSource {

  /** Registered-query form — [[SnapshotTable.timeTravelQuery]]'s twin
    * THROUGH the V2 source (`format("graft-snapshot")`), so the façade's
    * version resolution + delegated parquet scan sit behind the DuckDB
    * oracle every round: two commits, read v0 by the reader API,
    * aggregate. The oracle replays the v0 slice straight off the lake
    * table. */
  def sourceReadQuery(spark: SparkSession, lakeDir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val scratch = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(
        System.getProperty("java.io.tmpdir")), "graft_snapsrc_q_scratch")
    val f = scratch.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(scratch, true)
    val tmp = s"$scratch/tbl"
    val docs = graft.Lake.documents(spark, lakeDir)
    SnapshotTable.write(spark, tmp, docs.filter(col("doc_id") < 250))
    SnapshotTable.write(spark, tmp, docs)
    spark.read.format("graft-snapshot").option("version", 0L).load(tmp)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))
  }
}
