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
  *   spark.read.format("graft-snapshot")                       // change feed
  *     .option("changes", "3..5").option("key", "doc_id").load(dir)
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
/** Planning-time file-skipping ScanBuilder: receives Catalyst filter
  * pushdown FIRST (the same internal hook Spark's own FileScanBuilder
  * uses), asks [[SnapshotStats.pruneFiles]] which of the version's
  * files can possibly satisfy them, and — when files drop — swaps the
  * delegate for a ParquetTable over exactly the surviving file list
  * (schema pinned from the full table, so an empty survivor list
  * still plans as a valid zero-row scan). Everything else — filter
  * translation + row-group pushdown, column pruning, aggregate
  * pushdown — forwards to the (possibly swapped) stock parquet
  * builder, so a pruned scan keeps every other optimization.
  * Pruning is metadata-only and conservative: a kept file is merely
  * re-filtered by the delegate, never wrong. Shared by the anonymous
  * `format("graft-snapshot")` path and the name-addressed
  * [[GraftCatalog]] tables. */
private[sources] final class PruningScanBuilder(
    spark: SparkSession, dir: String, v: Long,
    options: CaseInsensitiveStringMap, fullTable: ParquetTable)
    extends org.apache.spark.sql.connector.read.ScanBuilder
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.catalyst.expressions.Expression

  private var delegate = fullTable.newScanBuilder(options)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    SnapshotStats.pruneFiles(spark, dir, v, filters).foreach { files =>
      delegate = ParquetTable(
        s"${fullTable.name} (${files.length} files after stats pruning)",
        spark, options, files, Some(fullTable.schema),
        classOf[ParquetFileFormat]).newScanBuilder(options)
    }
    delegate.pushFilters(filters)
  }
  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit =
    delegate.pruneColumns(requiredSchema)
  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = delegate.pushAggregation(agg)
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = delegate.supportCompletePushDown(agg)
  override def build(): org.apache.spark.sql.connector.read.Scan =
    delegate.build()
}

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
    // .option("autoindex", "minmax:doc_id,buckets:doc_id") persists the
    // auto-index property BEFORE committing, so this write and every
    // later commit rebuild the named sidecars — façade twin of
    // SnapshotTable.write(..., autoIndex = …)
    parameters.get("autoindex").foreach { spec =>
      SnapshotStats.setAutoIndex(spark, dir,
        spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    }
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
    * ScanBuilder — EXCEPT when the version carries [[SnapshotStats]]
    * sidecars, where a [[PruningScanBuilder]] consumes the pushed
    * filters to skip whole files before the delegate ever lists them. */
  private final class ReadOnlySnapshot(spark: SparkSession, dir: String,
                                       v: Long, delegate: ParquetTable)
      extends Table with org.apache.spark.sql.connector.catalog.SupportsRead {
    override def name(): String = delegate.name
    override def schema(): StructType = delegate.schema
    override def capabilities()
        : util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
      util.EnumSet.of(
        org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : org.apache.spark.sql.connector.read.ScanBuilder =
      if (SnapshotStats.hasSidecars(spark, dir, v))
        new PruningScanBuilder(spark, dir, v, options, delegate)
      else delegate.newScanBuilder(options)
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
    val changes = Option(options.get("changes"))
    val evolve = Option(options.get("evolve")).exists(_.toBoolean)
    require(Seq(explicit, tag, changes).count(_.isDefined) <= 1,
      "pass at most one of version, tag, changes")
    def keyOpt: String = Option(options.get("key")).getOrElse(
      throw new IllegalArgumentException(
        "a changes read needs the diff key column: .option(\"key\", <col>)"))
    // change-data-feed read: option("changes", "vOld..vNew") +
    // option("key", <keyCol>) serves the rowDiff frame (key,
    // change_type, old_row, new_row) through the same delegated parquet
    // machinery — materialized once per immutable version pair, so
    // every consumer after the first gets a plain pushdown-capable scan.
    // vOld = -1 bootstraps: v0 arrives as all-`added`. "stream" instead
    // of a range serves the feed CONTINUOUSLY via readStream
    // ([[CdcStreamTable]] — micro-batch offsets are snapshot versions).
    changes.foreach { spec =>
      if (spec.trim == "stream")
        return new CdcStreamTable(spark, dir, keyOpt,
          Option(options.get("startingVersion")).map(_.trim.toLong), options)
      val m = "^(-1|\\d+)\\.\\.(\\d+)$".r.findFirstMatchIn(spec.trim)
        .getOrElse(throw new IllegalArgumentException(
          s"changes must be 'vOld..vNew' (two version numbers, vOld may " +
            s"be -1 for genesis) or 'stream': '$spec'"))
      val (vOld, vNew) = (m.group(1).toLong, m.group(2).toLong)
      val cdc = SnapshotTable.materializeDiff(spark, dir, vOld, vNew,
        keyOpt, evolve)
      // v = -1: the change feed has no stats sidecars of its own, so the
      // wrapper always uses the delegate's stock ScanBuilder
      return new ReadOnlySnapshot(spark, dir, -1L,
        ParquetTable(s"graft-snapshot $dir changes v$vOld..v$vNew",
          spark, options, Seq(cdc), None, classOf[ParquetFileFormat]))
    }
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
    // option("evolve","true"): serve the OLD version aligned to the
    // LATEST committed schema (readEvolved through the façade) — the
    // delegate parquet scan is planned with the latest schema as the
    // specified schema, so columns newer commits added surface as NULL
    // natively in the vectorized reader; a retyped column fails loudly
    // at scan time (additive evolution is the contract, as in the Scala
    // API). A consumer unioning across versions reads each with one
    // uniform schema.
    val evolvedSchema =
      if (evolve && v != committed.last)
        Some(SnapshotTable.read(spark, dir, Some(committed.last)).schema)
      else None
    new ReadOnlySnapshot(spark, dir, if (evolvedSchema.isEmpty) v else -1L,
      ParquetTable(s"graft-snapshot $dir@v$v${if (evolve) " (evolved)" else ""}",
        spark, options, Seq(s"$dir/v=$v"), evolvedSchema,
        classOf[ParquetFileFormat]))
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

  /** Registered-query form of STATS-PRUNED reading: commit the lake's
    * documents table range-clustered on doc_id into 8 files, build the
    * [[SnapshotStats]] min/max sidecar, then answer a selective range
    * aggregate THROUGH the façade — the optimizer consults the sidecar
    * and plans the scan over only the files whose [min,max] overlaps
    * the predicate (SnapshotSourceSpec asserts the file count drops;
    * this query puts the pruned plan's VALUES behind the DuckDB oracle,
    * so a wrong skip hash-mismatches every round).
    *
    * Bench note: the table is DELIBERATELY rebuilt (write + index) per
    * invocation so the pruned read path sits behind the oracle every
    * round — its bench time therefore measures mostly setup write cost,
    * not the pruned scan. */
  def prunedReadQuery(spark: SparkSession, lakeDir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val scratch = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(System.getProperty("java.io.tmpdir")),
      s"graft_snapprune_q_${spark.sparkContext.applicationId}")
    val f = scratch.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(scratch, true)
    val tmp = s"$scratch/tbl"
    val docs = graft.Lake.documents(spark, lakeDir)
    SnapshotTable.write(spark, tmp,
      docs.repartitionByRange(8, col("doc_id")))
    SnapshotStats.indexMinMax(spark, tmp, "doc_id")
    spark.read.format("graft-snapshot").load(tmp)
      .filter(col("doc_id") >= 50 && col("doc_id") < 250)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))
  }

  /** Registered-query form of BUCKET-INDEX point lookup — the
    * zone-map-proof case [[prunedReadQuery]] cannot cover: the table is
    * committed UNSORTED (hash round-robin into 8 files, so every file
    * spans nearly the whole doc_id range and min/max stats skip
    * nothing), then the occupied-bucket sidecar lets an IN-list probe
    * skip the files that provably lack the keys' hash buckets
    * (SnapshotSourceSpec asserts the file count; this query puts the
    * bucket-pruned plan's VALUES behind the DuckDB oracle — a
    * false-negative bucket set loses rows and hash-mismatches).
    *
    * Bench note: like [[prunedReadQuery]], the per-invocation rebuild is
    * deliberate (oracle coverage of the pruned path beats a cached
    * fixture); its bench time is dominated by the setup write. */
  def pointLookupQuery(spark: SparkSession, lakeDir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val scratch = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(System.getProperty("java.io.tmpdir")),
      s"graft_snaplookup_q_${spark.sparkContext.applicationId}")
    val f = scratch.getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(scratch, true)
    val tmp = s"$scratch/tbl"
    val docs = graft.Lake.documents(spark, lakeDir)
    SnapshotTable.write(spark, tmp, docs.repartition(8))
    SnapshotStats.indexBuckets(spark, tmp, "doc_id")
    spark.read.format("graft-snapshot").load(tmp)
      .filter(col("doc_id").isin(7L, 123L, 401L))
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }
}
