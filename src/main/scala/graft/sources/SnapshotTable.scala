package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned ("time travel") parquet tables: every write lands in a
  * `v=N` directory and is published by atomically CREATING a `_commit_N`
  * marker file — the latest version is the highest marker present.
  * There is no delete-then-rename window: markers are only ever created
  * (and removed by vacuum), so a crash at any point leaves every already-
  * committed version readable and the table writable.
  *
  * Crash analysis:
  *  - crash before the data write finishes → no marker; the orphan
  *    `v=N` data is clobbered by the next writer (mode Overwrite) because
  *    it was never committed;
  *  - crash after marker creation → the commit is complete.
  *
  * This is the minimal snapshot-isolation layout (the idea behind
  * Delta/Iceberg manifests reduced to marker files).
  *
  * Concurrent writers: a writer CLAIMS its version number first by
  * exclusively creating `_claim_N` (same atomic create(…, false) that
  * publishes commits), writes data under the claimed `v=N`, then publishes
  * `_commit_N` and drops the claim. Two simultaneous writers race on the
  * claim, the loser advances to N+1 — both commits land, each marker
  * points at its own writer's data. A writer that crashes after claiming
  * leaves an orphan claim: that version number is skipped forever (version
  * gaps are benign — readers only follow commit markers). On HDFS/local fs
  * the exclusive create is atomic; on object stores map it to a
  * conditional put (if-none-match), same protocol.
  */
object SnapshotTable {

  private val MarkerPrefix = "_commit_"
  private val ClaimPrefix = "_claim_"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All committed versions, ascending (empty for an empty table). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return Seq.empty
    // only all-digit suffixes count — a stray `_commit_foo.tmp` must not
    // make the whole table unreadable with NumberFormatException
    f.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith(MarkerPrefix))
      .map(_.stripPrefix(MarkerPrefix))
      .filter(s => s.nonEmpty && s.forall(_.isDigit))
      .map(_.toLong).toSeq.sorted
  }

  /** Highest committed version, or None for an empty table. */
  def latestVersion(spark: SparkSession, dir: String): Option[Long] =
    versions(spark, dir).lastOption

  /** (version, commit-time millis) per committed version, ascending —
    * the marker file's mtime IS the commit instant (the marker is
    * created exactly once, at publish). Powers `TIMESTAMP AS OF` through
    * [[GraftCatalog]] and the history procedure. Driver-only metadata
    * listing, O(versions). */
  def commitTimes(spark: SparkSession, dir: String): Seq[(Long, Long)] = {
    val f = fs(spark, dir)
    versions(spark, dir).map { v =>
      v -> f.getFileStatus(new Path(dir, s"$MarkerPrefix$v"))
        .getModificationTime
    }
  }

  /** Smallest version number no commit, claim, or staged branch head has
    * used yet (staged versions hold data with the claim already dropped —
    * reusing their number would clobber an unpublished branch). */
  private def nextFree(f: org.apache.hadoop.fs.FileSystem, base: Path): Long = {
    if (!f.exists(base)) return 0L
    val used = f.listStatus(base).iterator.map(_.getPath.getName)
      .flatMap { n =>
        val suffix =
          if (n.startsWith(MarkerPrefix)) n.stripPrefix(MarkerPrefix)
          else if (n.startsWith(ClaimPrefix)) n.stripPrefix(ClaimPrefix)
          else if (n.startsWith(StagedPrefix)) n.stripPrefix(StagedPrefix)
          else ""
        if (suffix.nonEmpty && suffix.forall(_.isDigit)) Some(suffix.toLong)
        else None
      }.toSeq
    if (used.isEmpty) 0L else used.max + 1L
  }

  /** Atomic exclusive create of an empty marker: false if it already
    * exists. Hadoop's LOCAL `create(path, overwrite=false)` is a
    * check-then-create (two racing writers can both pass the check), so
    * the local scheme goes through NIO's O_CREAT|O_EXCL createFile; HDFS
    * `create` is atomic on the namenode as-is; object stores map this to
    * a conditional put (if-none-match). */
  private def atomicCreate(f: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    try {
      if ("file" == f.getUri.getScheme) {
        java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath))
      } else f.create(p, false).close()
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
    }

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Rebuild the table's persisted auto-index sidecars for a freshly
    * committed version ([[SnapshotStats.setAutoIndex]]). Best-effort BY
    * DESIGN: the commit marker already exists, so an indexing failure
    * must not make the caller believe the write failed — it logs, the
    * scan falls back to unpruned (correct, slower), and [[describe]]
    * surfaces the staleness until someone re-indexes. */
  private def autoIndexAfterCommit(spark: SparkSession, dir: String,
                                   v: Long): Unit =
    try {
      val applied = SnapshotStats.applyAutoIndex(spark, dir, v)
      if (applied.nonEmpty)
        log.info(s"auto-indexed $dir v=$v: ${applied.mkString(", ")}")
    } catch {
      case scala.util.control.NonFatal(e) =>
        log.warn(s"auto-index of $dir v=$v failed — the commit stands, " +
          "but pruning is stale until re-indexed (describe shows it)", e)
    }

  /** [[write]] that also persists the auto-index property first: this
    * commit AND every later one (by any writer) rebuilds the named
    * sidecars at write time — `autoIndex = Seq("minmax:doc_id",
    * "buckets:doc_id:8192")`. */
  def write(spark: SparkSession, dir: String, df: DataFrame,
            autoIndex: Seq[String]): Long = {
    SnapshotStats.setAutoIndex(spark, dir, autoIndex)
    write(spark, dir, df)
  }

  /** Commit `df` as the next version; returns the version number.
    * Safe under concurrent writers — see the claim protocol above. */
  def write(spark: SparkSession, dir: String, df: DataFrame): Long = {
    val f = fs(spark, dir)
    val base = new Path(dir)
    if (!f.exists(base)) f.mkdirs(base)
    var v = nextFree(f, base)
    var attempts = 0
    // lost race → another writer holds that claim → move past it
    while (!atomicCreate(f, new Path(base, s"$ClaimPrefix$v"))) {
      attempts += 1
      if (attempts > 100) throw new java.io.IOException(
        s"could not claim a snapshot version in $dir after $attempts attempts")
      v = math.max(v + 1L, nextFree(f, base))
    }
    // the claim makes v=N exclusively ours; Overwrite clobbers only
    // orphan data from a crashed former claimant of this same number
    df.write.mode("overwrite").parquet(s"$dir/v=$v")
    if (!atomicCreate(f, new Path(base, s"$MarkerPrefix$v")))
      throw new IllegalStateException(
        s"commit marker for v=$v already exists in $dir despite our claim")
    f.delete(new Path(base, s"$ClaimPrefix$v"), false)
    autoIndexAfterCommit(spark, dir, v)
    v
  }

  /** Read the latest version (or a specific one for time travel). */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"snapshot table $dir has no committed version"))
    version.foreach { req =>
      if (!fs(spark, dir).exists(new Path(dir, s"$MarkerPrefix$req")))
        throw new IllegalArgumentException(
          s"snapshot table $dir has no committed version $req (vacuumed or never written)")
    }
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Schema-evolved time travel: read `version` aligned to the LATEST
    * committed schema — columns added by newer commits surface as NULL in
    * older versions (parquet-style additive evolution), so a reader can
    * scan any version with one uniform schema. Version-exact [[read]]
    * stays the default; this is the merge-schema path for consumers that
    * union across versions. */
  def readEvolved(spark: SparkSession, dir: String,
                  version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val latest = read(spark, dir)
    val old = read(spark, dir, version)
    val have = old.columns.toSet
    val aligned = latest.schema.fields.map { f =>
      if (have(f.name)) col(f.name) else lit(null).cast(f.dataType).as(f.name)
    }
    old.select(aligned.toSeq: _*)
  }

  /** Schema drift between two committed versions — the catalog's "what
    * changed structurally" report a consumer checks before pointing a job
    * at a newer version: added / removed / retyped columns, one row per
    * change (schemas come from parquet footers — no data read). Pairs
    * with [[diff]] (row-level changes) and [[readEvolved]] (how additive
    * drift is absorbed). */
  def schemaDiff(spark: SparkSession, dir: String,
                 vOld: Long, vNew: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val o = read(spark, dir, Some(vOld)).schema
      .map(f => f.name -> f.dataType.simpleString).toMap
    val n = read(spark, dir, Some(vNew)).schema
      .map(f => f.name -> f.dataType.simpleString).toMap
    val added = (n.keySet -- o.keySet).toSeq.sorted
      .map(c => ("added", c, null: String, n(c)))
    val removed = (o.keySet -- n.keySet).toSeq.sorted
      .map(c => ("removed", c, o(c), null: String))
    val retyped = (o.keySet & n.keySet).toSeq.sorted
      .filter(c => o(c) != n(c))
      .map(c => ("retyped", c, o(c), n(c)))
    (added ++ removed ++ retyped)
      .toDF("change", "column_name", "old_type", "new_type")
      .orderBy(col("change"), col("column_name"))
  }

  /** Driver-visible time-travel query: commit two versions of the lake's
    * documents table into a scratch snapshot dir (v0 = doc_id < 250,
    * v1 = everything), then aggregate the TIME-TRAVELED v0 — so the result
    * proves the old version stayed intact and readable after a newer
    * commit. SQL-equivalent: the same aggregate over the v0 predicate.
    *
    * The scratch location is FIXED per JVM (deleted and rewritten on each
    * invocation), so repeated Verify/Bench runs never accumulate temp
    * dirs. */
  /** Session-keyed scratch root: one dir per (purpose, Spark app) —
    * rebuilt per call so repeated runs never accumulate temp dirs, and
    * app-id-keyed so concurrent sessions on one machine cannot race on
    * (or delete under) each other's scratch files. */
  private def scratchPath(spark: SparkSession, name: String): Path =
    new Path(sys.props("java.io.tmpdir"),
      s"${name}_${spark.sparkContext.applicationId}")

  def timeTravelQuery(spark: SparkSession, lakeDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val scratch = scratchPath(spark, "graft_snap_q_scratch")
    val f = fs(spark, scratch.toString)
    f.delete(scratch, true)
    val tmp = s"$scratch/tbl"
    val docs = graft.Lake.documents(spark, lakeDir)
    write(spark, tmp, docs.filter(col("doc_id") < 250))
    write(spark, tmp, docs)
    read(spark, tmp, Some(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("source"))
  }

  /** Change-data-feed between two committed versions: one row per changed
    * key with change_type ∈ added | removed | updated (unchanged rows are
    * not emitted — at lake scale the diff must be proportional to the
    * change, not the table). Full-outer equi-join on `key`; change
    * detection null-safe-compares the non-key columns as one struct, so
    * any schema works without per-column code. Both sides are single
    * version-pruned parquet scans — the join shuffles the two compared
    * versions and nothing else. */
  def diff(spark: SparkSession, dir: String, vOld: Long, vNew: Long,
           key: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    rowDiff(spark, dir, vOld, vNew, key).select(col(key), col("change_type"))
  }

  /** [[diff]] with payloads: (key, change_type, old_row, new_row) — the
    * change-data-feed rows downstream incremental maintenance consumes
    * (e.g. [[graft.operators.MaterializedAgg.refresh]]). `old_row` is
    * null for adds, `new_row` for removes; updates carry both.
    *
    * `vOld = -1` is GENESIS: every row of `vNew` arrives as `added`
    * (the initial-snapshot bootstrap of a changelog consumer).
    *
    * Schema drift between the versions fails LOUDLY with the
    * [[schemaDiff]] report inline — a silent positional or
    * name-intersection diff would mislabel changes; `evolve = true`
    * instead TOLERATES additive drift by aligning the old version to
    * the new version's schema (added columns read as NULL on the old
    * side, so they surface as genuine `updated` payload differences). */
  def rowDiff(spark: SparkSession, dir: String, vOld: Long, vNew: Long,
              key: String, evolve: Boolean = false): DataFrame = {
    val newV = read(spark, dir, Some(vNew))
    if (vOld == -1L) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], newV.schema)
      return frameDiff(empty, newV, key)
    }
    val oldRaw = read(spark, dir, Some(vOld))
    def shape(df: DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    val oldV =
      if (shape(oldRaw) == shape(newV)) oldRaw
      else if (evolve) alignTo(oldRaw, newV.schema, vOld, vNew)
      else {
        val drift = schemaDiff(spark, dir, vOld, vNew).collect()
          .map(r => s"${r.getString(0)} ${r.getString(1)}: " +
            s"${Option(r.getString(2)).getOrElse("—")} → " +
            s"${Option(r.getString(3)).getOrElse("—")}")
          .mkString("; ")
        throw new IllegalArgumentException(
          s"diff schema drift between v$vOld and v$vNew of $dir [$drift] " +
            "— pass evolve=true to align additively, or readEvolved first")
      }
    frameDiff(oldV, newV, key)
  }

  /** Align `df` to `target`'s schema ADDITIVELY: absent columns become
    * typed NULLs, order follows the target. Removed or retyped columns
    * cannot be aligned and fail loudly (there is no value-preserving
    * answer for them). */
  private def alignTo(df: DataFrame, target: org.apache.spark.sql.types.StructType,
                      vOld: Long, vNew: Long): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val aligned = target.fields.map { f =>
      have.get(f.name) match {
        case Some(t) if t == f.dataType => col(f.name)
        case Some(t) => throw new IllegalArgumentException(
          s"cannot align v$vOld to v$vNew: column ${f.name} retyped " +
            s"${t.simpleString} → ${f.dataType.simpleString}")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }
    val extra = have.keySet -- target.fields.map(_.name)
    require(extra.isEmpty,
      s"cannot align v$vOld to v$vNew: columns removed: ${extra.toSeq.sorted
        .mkString(", ")}")
    df.select(aligned.toSeq: _*)
  }

  /** The change-data computation itself, over any two same-schema frames
    * — [[rowDiff]] binds it to committed versions; callers holding frames
    * from elsewhere (a staging table vs production, two branches) use it
    * directly. */
  def frameDiff(oldV: DataFrame, newV: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val nonKey = oldV.columns.filterNot(_ == key).toSeq
    val o = oldV.select(col(key), struct(nonKey.map(col): _*).as("old_row"))
    val n = newV.select(col(key), struct(nonKey.map(col): _*).as("new_row"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("old_row").isNull, lit("added"))
          .when(col("new_row").isNull, lit("removed"))
          .when(!(col("old_row") <=> col("new_row")), lit("updated")))
      .filter(col("change_type").isNotNull)
      .select(col(key), col("change_type"), col("old_row"), col("new_row"))
  }

  /** Driver-visible change-data-feed query: commit two versions of the
    * lake's documents table into a per-JVM scratch snapshot (v0 = doc_id
    * < 300; v1 drops doc_id < 50, rewrites n_chars for 50 ≤ doc_id < 100,
    * and adds everything ≥ 300), then count [[diff]] rows by change_type —
    * so added, removed AND updated are all non-trivially exercised.
    * SQL-equivalent: the same three counts straight off the predicates. */
  def diffQuery(spark: SparkSession, lakeDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val scratch = scratchPath(spark, "graft_snap_diff_scratch")
    val f = fs(spark, scratch.toString)
    f.delete(scratch, true)
    val tmp = s"$scratch/tbl"
    val docs = graft.Lake.documents(spark, lakeDir)
    write(spark, tmp, docs.filter(col("doc_id") < 300))
    write(spark, tmp, docs.filter(col("doc_id") >= 50)
      .withColumn("n_chars",
        when(col("doc_id") < 100, col("n_chars") + 1000L)
          .otherwise(col("n_chars"))))
    diff(spark, tmp, 0L, 1L, "doc_id")
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("change_type"))
  }

  /** Driver-visible incremental-view-maintenance query: commit the same
    * two scratch versions as [[diffQuery]], define a (source, sum n_chars,
    * count) view on v0, then REFRESH it from the v0→v1 change feed alone
    * ([[graft.operators.MaterializedAgg.refresh]] — the base table is
    * never re-read). Because delta-rule maintenance is exact, the result
    * must equal a plain group-by over v1, which is what the SQL oracle
    * computes from the same predicates — any drift in the delta algebra
    * hash-mismatches. */
  def mvRefreshQuery(spark: SparkSession, lakeDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val scratch = scratchPath(spark, "graft_mv_refresh_scratch")
    val f = fs(spark, scratch.toString)
    f.delete(scratch, true)
    val tmp = s"$scratch/tbl"
    val docs = graft.Lake.documents(spark, lakeDir)
    val v0 = docs.filter(col("doc_id") < 300)
    write(spark, tmp, v0)
    write(spark, tmp, docs.filter(col("doc_id") >= 50)
      .withColumn("n_chars",
        when(col("doc_id") < 100, col("n_chars") + 1000L)
          .otherwise(col("n_chars"))))
    val mv0 = graft.operators.MaterializedAgg.define(v0, "source", "n_chars")
    graft.operators.MaterializedAgg
      .refresh(mv0, rowDiff(spark, tmp, 0L, 1L, "doc_id"), "source", "n_chars")
      .select(col("source"), col("sum_value").cast("long").as("sum_value"),
        col("n_rows"))
      .orderBy(col("source"))
  }

  /** Materialize the v`vOld`→v`vNew` change feed once as a parquet
    * sidecar under `_cdc/` and return its path — the storage half of
    * the `option("changes", "vOld..vNew")` read on the V2 source.
    * Committed versions are immutable, so a (key, vOld, vNew) diff is
    * deterministic forever: the first reader pays the [[rowDiff]] join,
    * every later reader (and every pushdown-capable engine pointed at
    * the sidecar) gets a plain pruned parquet scan — the same
    * amortization Iceberg/Delta changelog materialization makes.
    * Concurrent first readers race benignly: each computes into its own
    * temp dir and the loser of the atomic rename deletes its copy. */
  def materializeDiff(spark: SparkSession, dir: String, vOld: Long,
                      vNew: Long, key: String,
                      evolve: Boolean = false): String = {
    requireRefName(key)
    // evolve-aligned diffs get their own sidecar name: same version pair,
    // different row payloads (typed-NULL backfill on the old side)
    val suffix = if (evolve) "_evolved" else ""
    val target = new Path(dir, s"_cdc/${key}_v${vOld}_$vNew$suffix")
    val f = fs(spark, dir)
    if (f.exists(target)) return target.toString
    val tmp = new Path(dir,
      s"_cdc/.tmp_${key}_v${vOld}_${vNew}_${java.util.UUID.randomUUID()}")
    rowDiff(spark, dir, vOld, vNew, key, evolve)
      .write.mode("overwrite").parquet(tmp.toString)
    f.mkdirs(target.getParent)
    if (!f.rename(tmp, target)) {
      // another reader materialized first; theirs is identical
      f.delete(tmp, true)
      if (!f.exists(target)) throw new java.io.IOException(
        s"could not publish change feed $target")
    }
    target.toString
  }

  /** Distribution drift of `valueCol` between two committed versions —
    * [[graft.operators.CatalogOps.distributionDrift]] over time travel:
    * the "did this commit shift the data?" check a lake runs next to
    * [[schemaDiff]] (structure) and [[diff]] (rows). */
  def versionDrift(spark: SparkSession, dir: String, vOld: Long, vNew: Long,
                   valueCol: String, binWidth: Double): DataFrame =
    graft.operators.CatalogOps.distributionDrift(
      read(spark, dir, Some(vOld)), read(spark, dir, Some(vNew)),
      valueCol, binWidth)

  /** MERGE (upsert) by key: rows of `updates` replace same-key rows of
    * the latest version; new keys append. One left-anti join (updates are
    * typically small → broadcast) + union, committed as a new version —
    * copy-on-write merge with full snapshot isolation, the Delta/Iceberg
    * MERGE INTO reduced to its data plan. Returns the new version. */
  def merge(spark: SparkSession, dir: String, updates: DataFrame,
            key: String): Long = {
    val current = read(spark, dir)
    require(current.columns.toSeq == updates.columns.toSeq,
      s"merge schema mismatch: table ${current.columns.toSeq} vs updates ${updates.columns.toSeq}")
    val kept = current.join(
      org.apache.spark.sql.functions.broadcast(updates.select(key)), Seq(key), "left_anti")
    write(spark, dir, kept.unionByName(updates))
  }

  /** DELETE by predicate: commit a new version without the matching rows
    * (copy-on-write; the GDPR-style erase). Returns the new version.
    *
    * Three-valued-logic safe: a predicate that evaluates to NULL (e.g.
    * `key.isin(...)` on a NULL key) deletes NOTHING — the row is kept.
    * Without the coalesce, `filter(!predicate)` would drop NULL-evaluating
    * rows too (!NULL is NULL, and filter discards NULL), silently erasing
    * more rows than the caller's own `predicate`-TRUE audit count. */
  def delete(spark: SparkSession, dir: String,
             predicate: org.apache.spark.sql.Column): Long =
    write(spark, dir, read(spark, dir)
      .filter(!org.apache.spark.sql.functions.coalesce(
        predicate, org.apache.spark.sql.functions.lit(false))))

  /** Compact the latest version into a NEW commit with `targetFiles`
    * files — small-file hygiene with snapshot isolation: concurrent
    * readers keep their version until vacuum, and a crash mid-compaction
    * leaves the table exactly as it was (the claim/marker protocol covers
    * the rewrite like any other write). Returns the new version. */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 4): Long = {
    require(targetFiles > 0, "targetFiles must be positive")
    write(spark, dir, read(spark, dir).repartition(targetFiles))
  }

  /** Table metadata report — one (kind, name, value) row per fact:
    * commit history, refs (tags/branches), the persisted auto-index
    * property, and per-sidecar-family FRESHNESS (`fresh @ v=N` vs
    * `STALE: indexed v=M, latest v=N`), so an operator sees at a glance
    * whether file pruning is live on the table's head or has lapsed
    * (e.g. a commit made before the property was set, or a crashed
    * auto-index). Driver-only metadata listing — no data read. */
  def describe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val latest = vs.lastOption
    val header = Seq(
      ("table", "location", dir),
      ("table", "versions",
        if (vs.isEmpty) "none"
        else s"${vs.size} committed (v=${vs.head}..v=${vs.last})"),
      ("table", "latest", latest.map(v => s"v=$v").getOrElse("none")))
    val tagRows = tags(spark, dir).toSeq.sortBy(_._1)
      .map { case (n, v) => ("tag", n, s"v=$v") }
    val branchRows =
      if (!f.exists(new Path(dir))) Seq.empty
      else f.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(BranchPrefix)).map(_.stripPrefix(BranchPrefix))
        .sorted.flatMap(n => branchVersion(spark, dir, n)
          .map(v => ("branch", n, s"v=$v")))
    val propRows = SnapshotStats.autoIndexSpecs(spark, dir)
      .map(s => ("autoindex", s, "rebuilt on every commit"))
    val sidecarRows = SnapshotStats.sidecarFamilies(spark, dir)
      .map { case (kind, c, indexed) =>
        val name = s"$kind:$c"
        val state = (latest, indexed.lastOption) match {
          case (Some(l), Some(i)) if i >= l => s"fresh @ v=$l"
          case (Some(l), Some(i)) =>
            s"STALE: indexed v=$i, latest v=$l — pruning off at head"
          case (None, _) => "no committed version"
          case (_, None) => "no indexed version"
        }
        ("sidecar", name, state)
      }
    (header ++ tagRows ++ branchRows ++ propRows ++ sidecarRows)
      .toDF("kind", "name", "value")
  }

  private val TagPrefix = "_tag_"

  private def requireRefName(name: String): Unit =
    require(name.nonEmpty && name.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"invalid ref name '$name'")

  /** Tag a committed version with a stable name (Iceberg/Delta-style
    * refs): `prod`, `exp-2026-08`, … — readers pin to the NAME while
    * writers keep committing. A tag is one marker file whose content is
    * the version number; re-tagging overwrites atomically via
    * write-temp + rename. Tag names: [A-Za-z0-9._-]. */
  def tag(spark: SparkSession, dir: String, name: String, version: Long): Unit = {
    requireRefName(name)
    require(versions(spark, dir).contains(version),
      s"cannot tag uncommitted version $version of $dir")
    setRef(fs(spark, dir), dir, s"$TagPrefix$name", version)
  }

  /** Atomically point ref file `refName` at `version` (write-temp +
    * rename — readers see the old target or the new one, never a torn
    * file). */
  private def setRef(f: org.apache.hadoop.fs.FileSystem, dir: String,
                     refName: String, version: Long): Unit = {
    val tmp = new Path(dir, s".$refName.tmp")
    val out = f.create(tmp, true)
    try out.write(version.toString.getBytes("UTF-8")) finally out.close()
    val dst = new Path(dir, refName)
    f.delete(dst, false)
    if (!f.rename(tmp, dst))
      throw new java.io.IOException(s"could not move ref $refName in $dir")
  }

  /** Version a tag points at, or None. Tags at vacuumed versions resolve
    * but [[read]] then rejects them — stale-tag detection, not silence. */
  def tagVersion(spark: SparkSession, dir: String, name: String): Option[Long] =
    refVersion(fs(spark, dir), dir, s"$TagPrefix$name")

  private def refVersion(f: org.apache.hadoop.fs.FileSystem, dir: String,
                         refName: String): Option[Long] = {
    val p = new Path(dir, refName)
    if (!f.exists(p)) return None
    val in = f.open(p)
    try {
      val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      if (s.nonEmpty && s.forall(_.isDigit)) Some(s.toLong) else None
    } finally in.close()
  }

  /** All tags of the table: name → version (skips torn/invalid refs). */
  def tags(spark: SparkSession, dir: String): Map[String, Long] = {
    val f = fs(spark, dir)
    val base = new Path(dir)
    if (!f.exists(base)) return Map.empty
    f.listStatus(base).iterator.map(_.getPath.getName)
      .filter(_.startsWith(TagPrefix))
      .map(_.stripPrefix(TagPrefix))
      .flatMap(n => refVersion(f, dir, s"$TagPrefix$n").map(n -> _))
      .toMap
  }

  /** Read the version a tag names. */
  def readTag(spark: SparkSession, dir: String, name: String): DataFrame =
    read(spark, dir, Some(tagVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(s"no tag '$name' in $dir"))))

  private val BranchPrefix = "_branch_"
  private val StagedPrefix = "_staged_"

  /** Create branch `name` at `from` (default: latest main version) — the
    * write-audit-publish workflow: [[writeBranch]] commits data that main
    * readers never see, audits run against [[readBranch]], and
    * [[publishBranch]] fast-forwards main to the audited head. Branch
    * commits claim version numbers from the SAME pool as main writers
    * (the `_claim_N` protocol), so branch and main writes never collide;
    * a branch head is published by `_staged_N` → `_commit_N` marker
    * promotion — no data is rewritten at publish time. */
  def createBranch(spark: SparkSession, dir: String, name: String,
                   from: Option[Long] = None): Long = {
    requireRefName(name)
    val v = from.orElse(latestVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(
        s"cannot branch an empty snapshot table $dir"))
    require(versions(spark, dir).contains(v),
      s"cannot branch from uncommitted version $v of $dir")
    val f = fs(spark, dir)
    if (!atomicCreate(f, new Path(dir, s"$BranchPrefix$name")))
      throw new IllegalArgumentException(s"branch '$name' already exists in $dir")
    setRef(f, dir, s"$BranchPrefix$name", v)
    v
  }

  /** Version a branch head points at, or None if no such branch. */
  def branchVersion(spark: SparkSession, dir: String, name: String): Option[Long] =
    refVersion(fs(spark, dir), dir, s"$BranchPrefix$name")

  /** Commit `df` to the branch: the data lands as a STAGED version —
    * invisible to main readers ([[versions]]/[[read]] follow `_commit_`
    * markers only) until [[publishBranch]]. Returns the staged version. */
  def writeBranch(spark: SparkSession, dir: String, name: String,
                  df: DataFrame): Long = {
    val f = fs(spark, dir)
    if (branchVersion(spark, dir, name).isEmpty)
      throw new IllegalArgumentException(s"no branch '$name' in $dir")
    val base = new Path(dir)
    var v = nextFree(f, base)
    var attempts = 0
    while (!atomicCreate(f, new Path(base, s"$ClaimPrefix$v"))) {
      attempts += 1
      if (attempts > 100) throw new java.io.IOException(
        s"could not claim a snapshot version in $dir after $attempts attempts")
      v = math.max(v + 1L, nextFree(f, base))
    }
    df.write.mode("overwrite").parquet(s"$dir/v=$v")
    if (!atomicCreate(f, new Path(base, s"$StagedPrefix$v")))
      throw new IllegalStateException(
        s"staged marker for v=$v already exists in $dir despite our claim")
    f.delete(new Path(base, s"$ClaimPrefix$v"), false)
    setRef(f, dir, s"$BranchPrefix$name", v)
    v
  }

  /** Read the branch head (staged or, before any branch write, the
    * committed version it branched from). */
  def readBranch(spark: SparkSession, dir: String, name: String): DataFrame = {
    val v = branchVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(s"no branch '$name' in $dir"))
    val f = fs(spark, dir)
    if (!f.exists(new Path(dir, s"$StagedPrefix$v")) &&
        !f.exists(new Path(dir, s"$MarkerPrefix$v")))
      throw new IllegalStateException(
        s"branch '$name' head v=$v of $dir has neither staged nor commit marker")
    spark.read.parquet(s"$dir/v=$v")
  }

  /** Publish the branch head to main — fast-forward only: if main
    * committed past the branch head since the branch was written, the
    * publish is rejected (re-write the branch from current main and
    * re-audit; silently promoting stale data would drop main's commits).
    * Marker promotion only, no data rewrite. Returns the published
    * version. */
  def publishBranch(spark: SparkSession, dir: String, name: String): Long = {
    val v = branchVersion(spark, dir, name).getOrElse(
      throw new IllegalArgumentException(s"no branch '$name' in $dir"))
    val f = fs(spark, dir)
    if (!f.exists(new Path(dir, s"$StagedPrefix$v")))
      throw new IllegalStateException(
        s"branch '$name' head v=$v is not staged (nothing to publish)")
    latestVersion(spark, dir).foreach { main =>
      if (main > v) throw new IllegalStateException(
        s"main of $dir advanced to v=$main past branch '$name' head v=$v; " +
          "re-write the branch from current main before publishing")
    }
    if (!atomicCreate(f, new Path(dir, s"$MarkerPrefix$v")))
      throw new IllegalStateException(s"v=$v of $dir is already committed")
    f.delete(new Path(dir, s"$StagedPrefix$v"), false)
    autoIndexAfterCommit(spark, dir, v)
    v
  }

  private val TxnPrefix = "_txn_"
  private val TxnLock = "_txn_lock"

  /** Publish several tables' staged branch heads ATOMICALLY — the
    * cross-table transaction the per-table write-audit-publish flow
    * cannot give (a pipeline that stages `documents` and its derived
    * `doc_stats` must never expose one without the other). Two-phase,
    * journaled:
    *
    *  1. LOCK: take `_txn_lock` in every table dir (atomic exclusive
    *     create), in sorted-path order so two concurrent multi-table
    *     publishers cannot deadlock. The lock extends the single-table
    *     claim discipline across tables: competing publishers of any
    *     overlapping set serialize here.
    *  2. VALIDATE all heads under the lock (staged + fast-forwardable),
    *     so promotion below cannot fail for semantic reasons.
    *  3. JOURNAL: write `_txn_<id>` in the FIRST (sorted) table dir —
    *     the coordinator — listing every (dir, version) pair, via the
    *     same write-temp + atomic-rename as refs. The journal's
    *     existence is the commit point: before it, nothing is
    *     published ("neither"); from the instant it exists, the
    *     transaction must complete ("together") — by this call, or by
    *     [[recoverTxn]] after a crash.
    *  4. PROMOTE each head (`_staged_N` → `_commit_N` marker, no data
    *     rewrite), drop staged markers, delete the journal, release
    *     the locks.
    *
    * Crash windows: before the journal → locks may linger (cleared by
    * [[recoverTxn]]'s lock sweep given no journal) and no table
    * changed; after the journal → [[recoverTxn]] rolls FORWARD
    * (promotion is idempotent: an already-present commit marker is
    * skipped), then cleans up. Readers between a crash and recovery can
    * observe a prefix of the promotions — the standard WAL contract:
    * run recovery before trusting cross-table consistency after a
    * crash. All participating tables must share one filesystem (the
    * journal's atomicity domain). Returns (dir → published version). */
  def publishAtomic(spark: SparkSession,
                    heads: Seq[(String, String)]): Map[String, Long] = {
    require(heads.nonEmpty, "publishAtomic needs at least one (dir, branch)")
    require(heads.map(_._1).distinct.size == heads.size,
      "one branch per table dir per transaction")
    val ordered = heads.sortBy(_._1)
    val f = fs(spark, ordered.head._1)
    val locked = scala.collection.mutable.ArrayBuffer.empty[Path]
    def unlock(): Unit = { locked.foreach(f.delete(_, false)); locked.clear() }
    // once the journal exists the locks belong to the TRANSACTION, not
    // this call: a post-journal failure must NOT release them (an
    // interleaving publishAtomic could lock/validate/publish against
    // tables whose journaled promotions haven't landed yet, and readers
    // would see a partial publish on unlocked tables). Pre-journal
    // failure releases everything — nothing was published.
    var journaled = false
    try {
      // 1. lock every table, sorted order
      for ((dir, _) <- ordered) {
        val lock = new Path(dir, TxnLock)
        if (!atomicCreate(f, lock)) throw new IllegalStateException(
          s"table $dir is locked by another cross-table publish (or a " +
            "crashed one — run recoverTxn over the participating dirs)")
        locked += lock
      }
      // 2. validate every head under the lock
      val resolved = ordered.map { case (dir, branch) =>
        val v = branchVersion(spark, dir, branch).getOrElse(
          throw new IllegalArgumentException(s"no branch '$branch' in $dir"))
        if (!f.exists(new Path(dir, s"$StagedPrefix$v")))
          throw new IllegalStateException(
            s"branch '$branch' head v=$v of $dir is not staged")
        latestVersion(spark, dir).foreach { main =>
          if (main > v) throw new IllegalStateException(
            s"main of $dir advanced to v=$main past branch '$branch' " +
              s"head v=$v; re-write the branch before publishing")
        }
        dir -> v
      }
      // 3. journal in the coordinator (first sorted dir) — THE commit point
      val txnId = java.util.UUID.randomUUID().toString
      val journal = new Path(ordered.head._1, s"$TxnPrefix$txnId")
      val body = resolved.map { case (d, v) => s"$d\t$v" }.mkString("\n")
      val tmp = new Path(ordered.head._1, s".$TxnPrefix$txnId.tmp")
      val out = f.create(tmp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      if (!f.rename(tmp, journal))
        throw new java.io.IOException(s"could not journal txn $txnId")
      journaled = true
      // 4. promote all, clean up — failures here roll FORWARD: first
      // inline (promotion is idempotent), and if that also fails the
      // locks stay held and the error names the recovery entry point
      try {
        promoteAll(f, resolved)
        f.delete(journal, false)
      } catch {
        case e: Exception =>
          try {
            promoteAll(f, resolved)
            f.delete(journal, false)
          } catch {
            case _: Exception => throw new IllegalStateException(
              s"txn $txnId journaled but promotion failed; tables remain " +
                s"LOCKED — run recoverTxn(\"${ordered.head._1}\") to roll " +
                "forward and release them", e)
          }
      }
      unlock()
      // auto-index AFTER the transaction completes (outside the locks —
      // sidecars are per-immutable-version, so no reader can race them);
      // recovery-path promotions don't re-index: describe shows it
      resolved.foreach { case (d, v) => autoIndexAfterCommit(spark, d, v) }
      resolved.toMap
    } finally {
      // no-op on success (already unlocked); releases on pre-journal
      // failure only — post-journal the locks are the transaction's
      if (!journaled) unlock()
    }
  }

  /** Idempotent promotion: staged → committed for each pair; a pair
    * already committed (recovery re-run) is skipped. */
  private def promoteAll(f: org.apache.hadoop.fs.FileSystem,
                         pairs: Seq[(String, Long)]): Unit =
    for ((dir, v) <- pairs) {
      atomicCreate(f, new Path(dir, s"$MarkerPrefix$v")) // false if committed
      f.delete(new Path(dir, s"$StagedPrefix$v"), false)
    }

  /** Crash recovery for [[publishAtomic]]: roll every journaled
    * transaction in `coordinatorDir` FORWARD (complete its promotions,
    * delete the journal, release the participating tables' locks), and
    * clear a journal-less stale lock on the coordinator itself. Returns
    * the ids of the transactions completed.
    *
    * A multi-table txn journals only in its COORDINATOR (first sorted
    * dir) but locks EVERY participant — after a pre-journal crash the
    * other participants stay locked with no journal anywhere naming
    * them, so single-dir recovery cannot free them. Pass the full dir
    * set through [[recoverTxnAll]] for that case. */
  def recoverTxn(spark: SparkSession, coordinatorDir: String): Seq[String] =
    recoverTxnAll(spark, Seq(coordinatorDir))

  /** [[recoverTxn]] over every dir that participated (or might have) in
    * crashed cross-table publishes: first rolls forward every journal
    * found in ANY of the dirs, then clears the journal-less stale locks
    * left by pre-journal crashes — on every dir given, not just the
    * coordinator. Only run while no publisher is live (the standard WAL
    * recovery contract): a lock held by an in-flight transaction whose
    * coordinator is OUTSIDE `dirs` is indistinguishable from residue. */
  def recoverTxnAll(spark: SparkSession, dirs: Seq[String]): Seq[String] = {
    require(dirs.nonEmpty, "recoverTxnAll needs at least one table dir")
    val f = fs(spark, dirs.head)
    val done = dirs.flatMap { dir =>
      val base = new Path(dir)
      if (!f.exists(base)) Seq.empty[String]
      else {
        val journals = f.listStatus(base).iterator.map(_.getPath)
          .filter(_.getName.startsWith(TxnPrefix))
          .filterNot(_.getName == TxnLock).toSeq
        journals.map { j =>
          val in = f.open(j)
          val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          val pairs = body.split("\n").toSeq.filter(_.contains("\t")).map { l =>
            val Array(d, v) = l.split("\t"); (d, v.toLong)
          }
          promoteAll(f, pairs)
          pairs.foreach { case (d, _) => f.delete(new Path(d, TxnLock), false) }
          f.delete(j, false)
          j.getName.stripPrefix(TxnPrefix)
        }
      }
    }
    // any lock still present has no journal in the given dirs: pre-
    // commit-point residue — nothing was published, clearing it simply
    // re-opens the table
    dirs.foreach(d => f.delete(new Path(d, TxnLock), false))
    done
  }

  /** Delete a branch ref. Its staged data stays on disk until
    * [[vacuumStaged]]. */
  def dropBranch(spark: SparkSession, dir: String, name: String): Unit = {
    val f = fs(spark, dir)
    if (!f.delete(new Path(dir, s"$BranchPrefix$name"), false))
      throw new IllegalArgumentException(s"no branch '$name' in $dir")
  }

  /** Drop staged versions no branch ref points at — superseded branch
    * heads and dropped branches. Marker first, then data (a crash
    * mid-vacuum leaves an orphan data dir, never a readable marker with
    * missing data). Returns the versions removed. */
  def vacuumStaged(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val base = new Path(dir)
    if (!f.exists(base)) return Seq.empty
    val names = f.listStatus(base).iterator.map(_.getPath.getName).toSeq
    val live = names.filter(_.startsWith(BranchPrefix))
      .flatMap(n => refVersion(f, dir, n)).toSet
    val staged = names.filter(_.startsWith(StagedPrefix))
      .map(_.stripPrefix(StagedPrefix))
      .filter(s => s.nonEmpty && s.forall(_.isDigit)).map(_.toLong)
    val drop = staged.filterNot(live).sorted
    drop.foreach { v =>
      f.delete(new Path(base, s"$StagedPrefix$v"), false)
      f.delete(new Path(base, s"v=$v"), true)
    }
    drop
  }

  /** Policy-aware retention expiry — the production form of [[vacuum]]:
    * drop versions outside the keep-last window UNLESS a tag or branch
    * references them. Raw [[vacuum]] silently breaks `readTag`/
    * `readBranch` when the window slides past a pinned release; expire
    * treats every named ref as a GC root (the Iceberg/Delta retention
    * contract). Same crash-safe marker-first delete order; returns the
    * versions actually dropped. */
  def expire(spark: SparkSession, dir: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "expire must keep at least the current version")
    val latest = latestVersion(spark, dir).getOrElse(return Seq.empty)
    val f = fs(spark, dir)
    val base = new Path(dir)
    val refRoots = f.listStatus(base).iterator.map(_.getPath.getName)
      .filter(n => n.startsWith(TagPrefix) || n.startsWith(BranchPrefix))
      .flatMap(n => refVersion(f, dir, n)).toSet
    val dropBelow = latest - (keepLast - 1)
    (0L until dropBelow).filterNot(refRoots).filter { v =>
      val marker = new Path(dir, s"$MarkerPrefix$v")
      if (f.exists(marker)) {
        f.delete(marker, false)
        f.delete(new Path(dir, s"v=$v"), true)
        true
      } else false
    }
  }

  /** Drop all versions older than the `keepLast` most recent (never the
    * current one — `keepLast` must be ≥ 1). */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "vacuum must keep at least the current version")
    val latest = latestVersion(spark, dir).getOrElse(return Seq.empty)
    val f = fs(spark, dir)
    val dropBelow = latest - (keepLast - 1)
    (0L until dropBelow).filter { v =>
      val marker = new Path(dir, s"$MarkerPrefix$v")
      if (f.exists(marker)) {
        // remove the marker FIRST so a crash mid-vacuum never leaves a
        // committed pointer at missing data
        f.delete(marker, false)
        f.delete(new Path(dir, s"v=$v"), true)
        true
      } else false
    }
  }
}
