package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL-native catalog over the snapshot lake — the layer that makes
  * every [[SnapshotTable]] verb reachable from PURE SQL, no Scala API
  * in sight:
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /data/lake
  *
  *   CREATE NAMESPACE graft.lake;
  *   CREATE TABLE graft.lake.docs (doc_id BIGINT, text STRING);
  *   INSERT INTO graft.lake.docs SELECT ...;          -- commits a version
  *   SELECT * FROM graft.lake.docs VERSION AS OF 0;   -- time travel
  *   SELECT * FROM graft.lake.docs VERSION AS OF 'prod';      -- tag ref
  *   SELECT * FROM graft.lake.docs TIMESTAMP AS OF '2026-…';  -- by commit time
  *   CALL graft.system.snapshot_compact(table => 'lake.docs');
  * }}}
  *
  * Layout: one warehouse root, single-level namespaces as directories,
  * each table a [[SnapshotTable]] directory (`<warehouse>/<ns>/<name>`)
  * — so catalog tables and path-addressed `format("graft-snapshot")`
  * reads see the SAME commits, tags, stats sidecars, and CDC sidecars.
  *
  * Write semantics are SQL's, layered on versioned commits: INSERT INTO
  * commits a new version holding previous-latest ∪ new rows; INSERT
  * OVERWRITE commits a version holding exactly the new rows. History is
  * never clobbered either way — `VERSION AS OF` keeps serving every
  * prior commit. (The append's read-modify-write pairs rows up at the
  * version that was latest when the INSERT started — the same
  * last-writer-wins caveat [[SnapshotTable.merge]] documents.)
  *
  * Maintenance verbs ship as Spark 4 DSv2 PROCEDURES (`CALL`), listed
  * under the reserved `system` namespace: history / describe / compact /
  * expire / vacuum / tag / rollback / index / set_autoindex / recover.
  * Each accepts the table as `'ns.name'` (resolved under the warehouse)
  * or an absolute path, so one catalog can also service path-addressed
  * tables. All are driver-side metadata ops except compact and rollback,
  * which run one distributed rewrite each.
  *
  * Scale: catalog calls are O(namespaces + tables) directory listings
  * and O(versions) marker reads — the same planning-time costs the
  * façade pays; data is only ever touched by the scan/write the query
  * itself plans. */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  import GraftCatalog._

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs a warehouse root: " +
          s"spark.sql.catalog.$name.warehouse=<dir>"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active
  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def nsPath(ns: Array[String]): Path = {
    require(ns.length == 1,
      s"$catalogName supports single-level namespaces, got " +
        ns.mkString("."))
    new Path(warehouse, ns.head)
  }

  private def tableDir(ident: Identifier): String =
    s"${nsPath(ident.namespace()).toString}/${ident.name()}"

  /** 'ns.name' under the warehouse, or an absolute path as-is — the
    * procedures' table-argument convention. */
  private def resolveDir(table: String): String =
    if (table.contains("/")) table
    else table.split('.') match {
      case Array(ns, t) => s"$warehouse/$ns/$t"
      case _ => throw new IllegalArgumentException(
        s"table must be 'ns.name' or an absolute path: '$table'")
    }

  // ------------------------------------------------------------- tables

  override def listTables(ns: Array[String]): Array[Identifier] = {
    val p = nsPath(ns)
    if (!fs.exists(p)) throw new NoSuchNamespaceException(ns)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).sorted
      .map(t => Identifier.of(ns, t))
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(new Path(tableDir(ident)))

  override def loadTable(ident: Identifier): Table =
    loadResolved(ident, None)

  /** `VERSION AS OF <n>` (a commit number) or `VERSION AS OF '<tag>'`
    * (a named ref) — the literal's text arrives as-is. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tableDir(ident)
    val v =
      if (version.nonEmpty && version.forall(_.isDigit)) version.toLong
      else SnapshotTable.tagVersion(spark, dir, version).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot table $dir has no tag '$version'"))
    loadResolved(ident, Some(v))
  }

  /** `TIMESTAMP AS OF` — micros since epoch; serves the newest version
    * whose commit-marker mtime is ≤ the asked instant. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tableDir(ident)
    val at = SnapshotTable.commitTimes(spark, dir)
      .filter(_._2 * 1000L <= timestampMicros).map(_._1).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot table $dir has no version committed at or before " +
          s"timestamp $timestampMicros"))
    loadResolved(ident, Some(at))
  }

  private def loadResolved(ident: Identifier, version: Option[Long]): Table = {
    val dir = tableDir(ident)
    if (!fs.exists(new Path(dir))) throw new NoSuchTableException(ident)
    val committed = SnapshotTable.versions(spark, dir)
    version.foreach(v => require(committed.contains(v),
      s"snapshot table $dir has no committed version $v " +
        "(vacuumed or never written)"))
    val v = version.orElse(committed.lastOption)
    new CatalogSnapshotTable(ident, dir, v,
      if (v.isEmpty) readDeclaredSchema(spark, dir) else None)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "snapshot tables cluster by sort/stats sidecars, not partition " +
        "transforms — create unpartitioned and use CALL " +
        s"$catalogName.system.snapshot_set_autoindex for file skipping")
    val ns = nsPath(ident.namespace())
    if (!fs.exists(ns)) throw new NoSuchNamespaceException(ident.namespace())
    val dir = tableDir(ident)
    if (fs.exists(new Path(dir))) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(new Path(dir))
    writeDeclaredSchema(spark, dir, schema)
    // TBLPROPERTIES('autoindex'='minmax:c,buckets:c') arms the
    // write-time sidecar rebuild from the very first commit
    Option(properties.get("autoindex")).foreach(spec =>
      SnapshotStats.setAutoIndex(spark, dir,
        spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty)))
    new CatalogSnapshotTable(ident, dir, None, Some(schema))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "snapshot table schemas evolve through commits (additive columns " +
        "land with the data; readEvolved/evolve=true serves the union) — " +
        "ALTER TABLE is not the mechanism")

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(tableDir(ident))
    fs.exists(p) && fs.delete(p, true)
  }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val src = new Path(tableDir(from))
    if (!fs.exists(src)) throw new NoSuchTableException(from)
    val dstNs = nsPath(to.namespace())
    if (!fs.exists(dstNs)) throw new NoSuchNamespaceException(to.namespace())
    val dst = new Path(tableDir(to))
    if (fs.exists(dst)) throw new TableAlreadyExistsException(to)
    if (!fs.rename(src, dst)) throw new java.io.IOException(
      s"could not rename $src to $dst")
  }

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).sorted.map(Array(_))
  }

  override def listNamespaces(parent: Array[String]): Array[Array[String]] =
    if (parent.isEmpty) listNamespaces()
    else if (namespaceExists(parent)) Array.empty
    else throw new NoSuchNamespaceException(parent)

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.length == 1 && fs.exists(nsPath(ns))

  override def loadNamespaceMetadata(ns: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns)
    util.Collections.singletonMap(SupportsNamespaces.PROP_LOCATION,
      nsPath(ns).toString)
  }

  override def createNamespace(ns: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(ns)) throw new NamespaceAlreadyExistsException(ns)
    fs.mkdirs(nsPath(ns))
  }

  override def alterNamespace(ns: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft namespaces are plain directories — nothing to alter")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(ns)
    if (!fs.exists(p)) return false
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${ns.mkString(".")} is not empty (use CASCADE)")
    fs.delete(p, true)
  }

  // --------------------------------------------------------- procedures

  override def listProcedures(ns: Array[String]): Array[Identifier] =
    if (ns.isEmpty || ns.sameElements(Array(SystemNs)))
      procedures.keys.toArray.sorted
        .map(n => Identifier.of(Array(SystemNs), n))
    else throw new NoSuchNamespaceException(ns)

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array(SystemNs)),
      s"procedures live in the '$SystemNs' namespace: " +
        s"CALL $catalogName.$SystemNs.<proc>(...)")
    procedures.getOrElse(ident.name().toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"unknown procedure '${ident.name()}' — known: " +
          procedures.keys.toSeq.sorted.mkString(", ")))
  }

  /** The maintenance verbs as DSv2 procedures. Each returns its facts as
    * rows (a LocalScan — the only result shape `CALL` materializes), so
    * `CALL`'s output is queryable like any other statement's. */
  private lazy val procedures: Map[String, UnboundProcedure] = {
    def rows(schema: StructType)(body: InternalRow => Seq[Seq[Any]]) =
      (schema, body)
    def str(r: InternalRow, i: Int): String = r.getUTF8String(i).toString

    Seq[(String, String, Array[ProcedureParameter],
         (StructType, InternalRow => Seq[Seq[Any]]))](
      ("snapshot_history", "commit history with commit instants and file counts",
        Array(ProcedureParameter.in("table", StringType).build()),
        rows(new StructType().add("version", LongType)
          .add("committed_at", TimestampType)
          .add("n_files", LongType).add("total_bytes", LongType)) { in =>
          val dir = resolveDir(str(in, 0))
          SnapshotTable.commitTimes(spark, dir).map { case (v, ms) =>
            val files = fs.listStatus(new Path(dir, s"v=$v"))
              .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
                && !s.getPath.getName.startsWith("."))
            Seq(v, ms * 1000L, files.length.toLong, files.map(_.getLen).sum)
          }
        }),
      ("snapshot_describe", "refs, auto-index property, sidecar freshness",
        Array(ProcedureParameter.in("table", StringType).build()),
        rows(new StructType().add("kind", StringType).add("name", StringType)
          .add("value", StringType)) { in =>
          SnapshotTable.describe(spark, resolveDir(str(in, 0)))
            .collect().toSeq.map(r => Seq(r.getString(0), r.getString(1),
              r.getString(2)))
        }),
      ("snapshot_compact", "rewrite the latest version into target_files files (new commit)",
        Array(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("target_files", IntegerType).defaultValue("4").build()),
        rows(new StructType().add("version", LongType)
          .add("n_files", IntegerType)) { in =>
          val dir = resolveDir(str(in, 0))
          val v = SnapshotTable.compact(spark, dir, in.getInt(1))
          // Seq[Any], NOT Seq(...) — Scala widens a mixed Long/Int Seq
          // to Seq[Long], silently breaking the IntegerType column
          Seq(Seq[Any](v, in.getInt(1)))
        }),
      ("snapshot_expire", "drop versions beyond keep_last, keeping tag/branch roots",
        Array(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("keep_last", IntegerType).defaultValue("1").build()),
        rows(new StructType().add("dropped_version", LongType)) { in =>
          SnapshotTable.expire(spark, resolveDir(str(in, 0)), in.getInt(1))
            .map(Seq(_))
        }),
      ("snapshot_vacuum", "drop versions beyond keep_last unconditionally",
        Array(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("keep_last", IntegerType).defaultValue("1").build()),
        rows(new StructType().add("dropped_version", LongType)) { in =>
          SnapshotTable.vacuum(spark, resolveDir(str(in, 0)), in.getInt(1))
            .map(Seq(_))
        }),
      ("snapshot_tag", "name a committed version (-1 = latest)",
        Array(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("tag", StringType).build(),
          ProcedureParameter.in("version", LongType).defaultValue("-1").build()),
        rows(new StructType().add("tag", StringType)
          .add("version", LongType)) { in =>
          val dir = resolveDir(str(in, 0))
          val v = in.getLong(2) match {
            case -1L => SnapshotTable.latestVersion(spark, dir).getOrElse(
              throw new IllegalArgumentException(
                s"snapshot table $dir has no committed version to tag"))
            case x => x
          }
          SnapshotTable.tag(spark, dir, str(in, 1), v)
          Seq(Seq(str(in, 1), v))
        }),
      ("snapshot_rollback", "re-commit an old version's content as the new latest",
        Array(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("version", LongType).build()),
        rows(new StructType().add("new_version", LongType)
          .add("restored_from", LongType)) { in =>
          val dir = resolveDir(str(in, 0))
          val from = in.getLong(1)
          val v = SnapshotTable.write(spark, dir,
            SnapshotTable.read(spark, dir, Some(from)))
          Seq(Seq(v, from))
        }),
      ("snapshot_index", "build a stats sidecar ('minmax:col' / 'buckets:col[:n]') for the latest version",
        Array(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("spec", StringType).build()),
        rows(new StructType().add("spec", StringType)
          .add("version", LongType)) { in =>
          val dir = resolveDir(str(in, 0))
          val spec = str(in, 1)
          val v = spec.split(':') match {
            case Array("minmax", c) => SnapshotStats.indexMinMax(spark, dir, c)
            case Array("buckets", c) => SnapshotStats.indexBuckets(spark, dir, c)
            case Array("buckets", c, n) =>
              SnapshotStats.indexBuckets(spark, dir, c, n.toInt)
            case _ => throw new IllegalArgumentException(
              s"spec must be 'minmax:col' or 'buckets:col[:n]': '$spec'")
          }
          Seq(Seq(spec, v))
        }),
      ("snapshot_set_autoindex", "persist comma-separated sidecar specs rebuilt on every commit ('' clears)",
        Array(ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("specs", StringType).build()),
        rows(new StructType().add("spec", StringType)) { in =>
          val specs = str(in, 1).split(',').toSeq.map(_.trim)
            .filter(_.nonEmpty)
          SnapshotStats.setAutoIndex(spark, resolveDir(str(in, 0)), specs)
          specs.map(Seq(_))
        }),
      ("snapshot_recover", "sweep stale locks / roll crashed atomic publishes forward (comma-separated tables)",
        Array(ProcedureParameter.in("tables", StringType).build()),
        rows(new StructType().add("action", StringType)) { in =>
          val dirs = str(in, 0).split(',').toSeq.map(_.trim)
            .filter(_.nonEmpty).map(resolveDir)
          SnapshotTable.recoverTxnAll(spark, dirs).map(Seq(_))
        })
    ).map { case (name, desc, params, (schema, body)) =>
      name -> (new SnapshotProcedure(name, desc, params, schema, body)
        : UnboundProcedure)
    }.toMap
  }
}

object GraftCatalog {

  private[sources] val SystemNs = "system"
  private val SchemaFile = "_schema.json"

  /** Registered-query form of the SQL-native path end to end — catalog
    * DDL, INSERT-commits-a-version, a CALL-tagged ref, tag time travel,
    * and the latest-read append union, all through `spark.sql` with
    * ZERO Scala lake API in the statement text. The oracle replays both
    * snapshots straight off the lake table, so a wrong append union, a
    * mis-resolved tag, or a version bleed hash-fails the round.
    *
    * The catalog registers lazily under a per-query name with an
    * appId-scoped warehouse: first invocation in a session wins the
    * conf (Spark caches catalog instances by name), every invocation
    * rebuilds the table itself (the façade queries' deliberate
    * setup-per-run convention — the SQL surface stays behind the oracle
    * every round). */
  def sqlCatalogQuery(spark: SparkSession, lakeDir: String)
      : org.apache.spark.sql.DataFrame = {
    val wh = s"${System.getProperty("java.io.tmpdir")}/graft_sqlcat_q_" +
      spark.sparkContext.applicationId
    if (spark.conf.getOption("spark.sql.catalog.graft_sql").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft_sql",
        classOf[GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft_sql.warehouse", wh)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_sql.lake")
    spark.sql("DROP TABLE IF EXISTS graft_sql.lake.docs")
    spark.sql("CREATE TABLE graft_sql.lake.docs " +
      "(doc_id BIGINT, source STRING, n_chars BIGINT)")
    graft.Lake.documents(spark, lakeDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("n_chars"))
      .createOrReplaceTempView("graft_sqlcat_docs_src")
    spark.sql("INSERT INTO graft_sql.lake.docs " +
      "SELECT * FROM graft_sqlcat_docs_src WHERE doc_id < 250")
    spark.sql("INSERT INTO graft_sql.lake.docs " +
      "SELECT * FROM graft_sqlcat_docs_src WHERE doc_id >= 250")
    spark.sql(
      "CALL graft_sql.system.snapshot_tag('lake.docs', 'first', 0)")
    spark.sql(
      """SELECT 'v0' AS snapshot, source, count(*) AS n_docs,
        |  sum(n_chars) AS sum_chars, max(doc_id) AS max_doc
        |FROM graft_sql.lake.docs VERSION AS OF 'first' GROUP BY source
        |UNION ALL
        |SELECT 'latest', source, count(*), sum(n_chars), max(doc_id)
        |FROM graft_sql.lake.docs GROUP BY source
        |ORDER BY snapshot, source""".stripMargin)
  }

  private def fsFor(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** CREATE TABLE's declared schema, persisted so an empty table can
    * plan (and accept its first INSERT) before any commit exists. Once
    * commits exist the committed data's schema wins — the snapshot
    * contract (schema travels with each version). */
  private def writeDeclaredSchema(spark: SparkSession, dir: String,
                                  schema: StructType): Unit = {
    val f = fsFor(spark, dir)
    val tmp = new Path(dir, s".$SchemaFile.tmp")
    val out = f.create(tmp, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    val target = new Path(dir, SchemaFile)
    f.delete(target, false)
    if (!f.rename(tmp, target)) throw new java.io.IOException(
      s"could not persist the declared schema in $dir")
  }

  private def readDeclaredSchema(spark: SparkSession,
                                 dir: String): Option[StructType] = {
    val f = fsFor(spark, dir)
    val p = new Path(dir, SchemaFile)
    if (!f.exists(p)) return None
    val in = f.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    Some(DataType.fromJson(body).asInstanceOf[StructType])
  }

  /** A name-addressed snapshot table: reads delegate to Spark's V2
    * parquet scan over the resolved version's directory (stats-sidecar
    * file skipping included, via the shared [[PruningScanBuilder]]);
    * writes go through the V1 fallback so every INSERT runs the
    * claim/marker commit protocol. A created-but-never-written table
    * plans as a zero-row scan of its declared schema. */
  private[sources] final class CatalogSnapshotTable(
      ident: Identifier, dir: String, v: Option[Long],
      declared: Option[StructType]) extends Table
      with SupportsRead with SupportsWrite {

    private def spark = SparkSession.active

    private lazy val delegate: Option[ParquetTable] = v.map(ver =>
      ParquetTable(s"graft ${ident.namespace().mkString(".")}.${ident.name()}@v$ver",
        spark, CaseInsensitiveStringMap.empty(), Seq(s"$dir/v=$ver"),
        None, classOf[ParquetFileFormat]))

    override def name(): String =
      s"${ident.namespace().mkString(".")}.${ident.name()}"

    override def schema(): StructType =
      delegate.map(_.schema).orElse(declared).getOrElse(new StructType())

    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = delegate match {
      case Some(t) =>
        if (SnapshotStats.hasSidecars(spark, dir, v.get))
          new PruningScanBuilder(spark, dir, v.get, options, t)
        else t.newScanBuilder(options)
      case None =>
        // no commits yet: a valid empty scan of the declared schema
        val s = schema()
        new ScanBuilder {
          override def build(): Scan = new LocalScan {
            override def readSchema(): StructType = s
            override def rows(): Array[InternalRow] = Array.empty
          }
        }
    }

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
      new WriteBuilder with SupportsTruncate {
        private var replace = false
        override def truncate(): WriteBuilder = { replace = true; this }
        override def build(): Write = new V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
              val s = data.sparkSession
              val latest = SnapshotTable.latestVersion(s, dir)
              val full =
                if (replace || overwrite || latest.isEmpty) data
                else SnapshotTable.read(s, dir).unionByName(data)
              SnapshotTable.write(s, dir, full)
              ()
            }
        }
      }
  }

  /** One maintenance verb as an unbound+bound procedure: fixed IN
    * parameters, driver-computed result rows. Never cacheable
    * (`isDeterministic = false`) — every CALL re-executes the verb. */
  private final class SnapshotProcedure(
      procName: String, desc: String, params: Array[ProcedureParameter],
      outSchema: StructType, body: InternalRow => Seq[Seq[Any]])
      extends UnboundProcedure with BoundProcedure {

    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false

    override def call(input: InternalRow): util.Iterator[Scan] = {
      val out = body(input).map(vals => InternalRow.fromSeq(vals.map {
        case s: String => UTF8String.fromString(s)
        case x => x
      })).toArray
      util.Collections.singletonList[Scan](new LocalScan {
        override def readSchema(): StructType = outSchema
        override def rows(): Array[InternalRow] = out
      }).iterator()
    }
  }
}
