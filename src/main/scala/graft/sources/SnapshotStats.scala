package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
// catalyst's wildcard brings its own Left/Right string expressions —
// restore the scala Either constructors for the comparable-value ADT
import scala.util.{Either, Left, Right}
import org.apache.spark.sql.functions.{col, collect_set, count, input_file_name, lit, max, min, pmod, sort_array, xxhash64}

/** Per-version statistics sidecars for [[SnapshotTable]]s, and the
  * planning-time FILE PRUNING that consumes them through the
  * `graft-snapshot` V2 read path — the piece that turns "we computed
  * skip ratios" ([[graft.operators.Maintenance.fileStats]] /
  * [[graft.operators.Maintenance.pointIndex]] as demonstrations) into
  * "scans actually skip": at 100 TB a range-clustered table read
  * through the façade with a selective predicate must open the handful
  * of overlapping files, not list-and-footer-check tens of thousands.
  *
  * Two sidecar kinds, both one small parquet per (version, column)
  * under the table's own `_stats/` dir (underscore-prefixed, so plain
  * parquet readers of `v=N` never see them):
  *
  *  - `minmax_<col>/v=N` — per data file: row count + min/max of the
  *    column. Prunes RANGE predicates (`<`,`<=`,`>`,`>=`,`=`,
  *    BETWEEN-as-conjunction, IN-as-any-of): a file is skipped iff its
  *    [min,max] is provably disjoint from the predicate's satisfying
  *    set. Pays off exactly when the table is range-clustered on the
  *    column (`repartitionByRange` at write, [[graft.operators
  *    .Maintenance]] sort-clustering) — the zone-map discipline.
  *  - `buckets_<col>/v=N` — per data file: the sorted set of occupied
  *    hash buckets (`pmod(xxhash64(cast(col as long)), n)`), the
  *    bloom-filter complement for high-cardinality keys written
  *    UNSORTED (every file spans the whole min/max range). Prunes
  *    EQUALITY/IN point lookups: a key whose bucket is absent from a
  *    file's set is provably not in that file; collisions only cost an
  *    extra file read — no false negatives.
  *
  * Soundness: versions are immutable after commit (the claim/marker
  * protocol), so a sidecar can never go stale against its own version;
  * pruning additionally re-lists the version dir and verifies the
  * sidecar covers EXACTLY the live file set (defence against a
  * hand-rolled partial sidecar), falling back to the unpruned scan on
  * any mismatch, any unconvertible stats type, or any predicate shape
  * it does not understand. Skipping is always an optimization, never a
  * semantics change: the delegate parquet scan re-applies every pushed
  * filter per row group, so a conservative "keep" is merely slower.
  *
  * Driver cost: one listing + one O(files) sidecar read per pruned
  * query — the same planning-time metadata pass Delta/Iceberg make
  * against their manifests. */
object SnapshotStats {

  private val StatsDir = "_stats"

  private def requireCol(c: String): Unit =
    require(c.nonEmpty && c.forall(ch => ch.isLetterOrDigit || ch == '_'),
      s"sidecar column name must be [A-Za-z0-9_]+: '$c'")

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def minMaxPath(dir: String, c: String, v: Long) =
    s"$dir/$StatsDir/minmax_$c/v=$v"
  private def bucketsPath(dir: String, c: String, v: Long) =
    s"$dir/$StatsDir/buckets_$c/v=$v"

  private def resolveVersion(spark: SparkSession, dir: String,
                             version: Option[Long]): Long =
    version.orElse(SnapshotTable.latestVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot table $dir has no committed version"))

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The version's live data files (what a scan would read) — the set
    * every sidecar must cover exactly for pruning to engage. */
  private def liveDataFiles(spark: SparkSession, dir: String, v: Long)
      : Seq[String] = {
    val f = fs(spark, dir)
    val vDir = new Path(s"$dir/v=$v")
    if (!f.exists(vDir)) return Seq.empty
    f.listStatus(vDir).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        !n.startsWith("_") && !n.startsWith(".")
      }.map(_.toString)
  }

  /** Union coverage rows for committed data files the aggregate cannot
    * represent — a ZERO-ROW file yields no `input_file_name()` group, and
    * a sidecar missing it would fail the pruner's keyset-coverage check,
    * silently disabling pruning for the version forever. The filler rows
    * (`n_rows=0` + null stats / empty bucket set) keep coverage exact;
    * null min/max conservatively keeps the empty file, an empty bucket
    * set correctly skips it. O(files) driver rows — the same planning-
    * time metadata class as the sidecar itself. */
  private def writeCovered(spark: SparkSession, dir: String, v: Long,
                           agg: DataFrame, zeroRow: String => org.apache.spark.sql.Row,
                           path: String): Unit = {
    val rows = agg.collect()
    val have = rows.map(r => norm(r.getString(0))).toSet
    val missing = liveDataFiles(spark, dir, v).filterNot(p => have(norm(p)))
    val all = (rows.toSeq ++ missing.map(zeroRow))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(all).asJava),
      agg.schema)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Build the min/max zone-map sidecar for `statCol` of `version`
    * (default latest). One scan of the version; the sidecar is O(files)
    * rows in one file. Returns the indexed version. */
  def indexMinMax(spark: SparkSession, dir: String, statCol: String,
                  version: Option[Long] = None): Long = {
    requireCol(statCol)
    val v = resolveVersion(spark, dir, version)
    val agg = SnapshotTable.read(spark, dir, Some(v))
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(statCol)).as("min_val"),
        max(col(statCol)).as("max_val"))
    writeCovered(spark, dir, v, agg,
      f => org.apache.spark.sql.Row(f, 0L, null, null),
      minMaxPath(dir, statCol, v))
    v
  }

  /** Build the occupied-bucket point-lookup sidecar for integral
    * `keyCol` of `version` (default latest): per file, the sorted set
    * of `pmod(xxhash64(cast(key as long)), buckets)` values present.
    * Returns the indexed version. */
  def indexBuckets(spark: SparkSession, dir: String, keyCol: String,
                   buckets: Int = 8192, version: Option[Long] = None): Long = {
    requireCol(keyCol)
    require(buckets > 0, "bucket count must be positive")
    val v = resolveVersion(spark, dir, version)
    val agg = SnapshotTable.read(spark, dir, Some(v))
      .groupBy(input_file_name().as("file"),
        // cast to long so driver-side probe literals hash identically
        // (xxhash64 is type-sensitive: int and bigint encodings differ)
        pmod(xxhash64(col(keyCol).cast("long")), lit(buckets.toLong)).as("__b"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("file"))
      .agg(sort_array(collect_set(col("__b"))).as("occupied"))
      .withColumn("n_buckets", lit(buckets.toLong))
    writeCovered(spark, dir, v, agg,
      f => org.apache.spark.sql.Row(f, Seq.empty[Long], buckets.toLong),
      bucketsPath(dir, keyCol, v))
    v
  }

  // ---------------------------------------------------------------------
  // auto-maintained sidecars (persisted table property)
  // ---------------------------------------------------------------------

  private val AutoIndexFile = "_autoindex"

  /** One parsed auto-index spec. Rendered/parsed as `minmax:<col>` or
    * `buckets:<col>[:<n>]` (n defaults to 8192). */
  private final case class IndexSpec(kind: String, column: String,
                                     buckets: Int) {
    def render: String =
      if (kind == "minmax") s"minmax:$column" else s"buckets:$column:$buckets"
  }

  private def parseSpec(s: String): IndexSpec = s.trim.split(':') match {
    case Array("minmax", c) =>
      requireCol(c); IndexSpec("minmax", c, 0)
    case Array("buckets", c) =>
      requireCol(c); IndexSpec("buckets", c, 8192)
    case Array("buckets", c, n) if n.nonEmpty && n.forall(_.isDigit) =>
      requireCol(c)
      val b = n.toInt
      require(b > 0, s"bucket count must be positive: '$s'")
      IndexSpec("buckets", c, b)
    case _ => throw new IllegalArgumentException(
      s"auto-index spec must be 'minmax:<col>' or 'buckets:<col>[:<n>]': '$s'")
  }

  /** Persist the table's auto-index property: from now on EVERY commit
    * ([[SnapshotTable.write]], merge/delete/compact — they all commit
    * through write — and branch publishes) rebuilds these sidecars for
    * the new version at write time, so file pruning never silently
    * lapses on a fresh commit. Specs are validated BEFORE anything
    * lands on disk; an empty list clears the property. Stored as one
    * small text file beside the refs, written with the same
    * temp + atomic-rename discipline. */
  def setAutoIndex(spark: SparkSession, dir: String,
                   specs: Seq[String]): Unit = {
    val parsed = specs.map(parseSpec) // fail fast — bad spec never persists
    val f = fs(spark, dir)
    val base = new Path(dir)
    if (!f.exists(base)) f.mkdirs(base)
    val target = new Path(base, AutoIndexFile)
    if (parsed.isEmpty) { f.delete(target, false); return }
    val tmp = new Path(base, s".$AutoIndexFile.tmp")
    val out = f.create(tmp, true)
    try out.write(parsed.map(_.render).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    f.delete(target, false)
    if (!f.rename(tmp, target))
      throw new java.io.IOException(
        s"could not persist the auto-index property in $dir")
  }

  /** The persisted auto-index specs (empty when the property is unset). */
  def autoIndexSpecs(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    val p = new Path(dir, AutoIndexFile)
    if (!f.exists(p)) return Seq.empty
    val in = f.open(p)
    val body =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    body.split('\n').toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Build every persisted spec's sidecar for `version` — the hook
    * [[SnapshotTable]] calls after each commit. Returns the specs
    * applied (empty when the property is unset). */
  def applyAutoIndex(spark: SparkSession, dir: String,
                     version: Long): Seq[String] =
    autoIndexSpecs(spark, dir).map { s =>
      val spec = parseSpec(s)
      if (spec.kind == "minmax")
        indexMinMax(spark, dir, spec.column, Some(version))
      else
        indexBuckets(spark, dir, spec.column, spec.buckets, Some(version))
      s
    }

  /** Every sidecar family on the table and the versions it has indexed,
    * sorted — `describe`'s raw material for the staleness report. */
  def sidecarFamilies(spark: SparkSession, dir: String)
      : Seq[(String, String, Seq[Long])] = {
    val f = fs(spark, dir)
    val root = new Path(dir, StatsDir)
    if (!f.exists(root)) return Seq.empty
    f.listStatus(root).toSeq.map(_.getPath).flatMap { p =>
      val n = p.getName
      val parsed =
        if (n.startsWith("minmax_")) Some(("minmax", n.stripPrefix("minmax_")))
        else if (n.startsWith("buckets_"))
          Some(("buckets", n.stripPrefix("buckets_")))
        else None
      parsed.map { case (kind, c) =>
        val vs = f.listStatus(p).toSeq.map(_.getPath.getName)
          .filter(_.startsWith("v="))
          .map(_.stripPrefix("v="))
          .filter(s => s.nonEmpty && s.forall(_.isDigit))
          .map(_.toLong).sorted
        (kind, c, vs)
      }
    }.sortBy(t => (t._1, t._2))
  }

  /** Columns with a sidecar of each kind for version `v` — the cheap
    * existence probe the read path uses to decide whether pruning is
    * even on the table. */
  def sidecars(spark: SparkSession, dir: String, v: Long)
      : (Seq[String], Seq[String]) = {
    val f = fs(spark, dir)
    val root = new Path(dir, StatsDir)
    if (!f.exists(root)) return (Nil, Nil)
    val kids = f.listStatus(root).toSeq.map(_.getPath.getName)
    def withKind(prefix: String): Seq[String] = kids
      .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix))
      .filter(c => f.exists(new Path(s"$dir/$StatsDir/$prefix$c/v=$v")))
      .sorted
    (withKind("minmax_"), withKind("buckets_"))
  }

  def hasSidecars(spark: SparkSession, dir: String, v: Long): Boolean = {
    val (mm, bk) = sidecars(spark, dir, v)
    mm.nonEmpty || bk.nonEmpty
  }

  // ---------------------------------------------------------------------
  // planning-time pruning
  // ---------------------------------------------------------------------

  /** A comparable stats/literal value: numbers in exact decimal space,
    * strings as themselves. Anything else (dates, binary, NaN) refuses
    * conversion, which conservatively disables pruning on that
    * conjunct. */
  private def comparable(x: Any): Option[Either[BigDecimal, String]] = x match {
    case null => None
    case b: java.lang.Byte => Some(Left(BigDecimal(b.longValue)))
    case s: java.lang.Short => Some(Left(BigDecimal(s.longValue)))
    case i: java.lang.Integer => Some(Left(BigDecimal(i.longValue)))
    case l: java.lang.Long => Some(Left(BigDecimal(l)))
    case f: java.lang.Float =>
      if (f.isNaN || f.isInfinite) None
      // BigDecimal.decimal round-trips and is order-preserving over the
      // same float/double domain — sufficient for disjointness tests
      else Some(Left(BigDecimal.decimal(f.floatValue)))
    case d: java.lang.Double =>
      if (d.isNaN || d.isInfinite) None
      else Some(Left(BigDecimal.decimal(d.doubleValue)))
    case d: java.math.BigDecimal => Some(Left(BigDecimal(d)))
    case d: org.apache.spark.sql.types.Decimal => Some(Left(d.toBigDecimal))
    case s: String => Some(Right(s))
    case u: org.apache.spark.unsafe.types.UTF8String => Some(Right(u.toString))
    case _ => None
  }

  private def lt(a: Either[BigDecimal, String],
                 b: Either[BigDecimal, String]): Option[Boolean] = (a, b) match {
    case (Left(x), Left(y)) => Some(x < y)
    case (Right(x), Right(y)) => Some(x < y)
    case _ => None // mixed kinds: refuse, keep the file
  }
  private def lte(a: Either[BigDecimal, String],
                  b: Either[BigDecimal, String]): Option[Boolean] =
    lt(b, a).map(!_)

  /** One extracted prunable conjunct. */
  private sealed trait Prunable { def column: String }
  private final case class RangePred(column: String, op: String,
                                     value: Either[BigDecimal, String])
      extends Prunable
  private final case class InPred(column: String,
                                  values: Seq[Either[BigDecimal, String]])
      extends Prunable

  /** Flatten ANDs and extract the conjuncts this pruner understands;
    * everything else is ignored (the delegate scan still evaluates it).
    * Literal-on-the-left comparisons are normalized to column-first. */
  private def extract(filters: Seq[Expression]): Seq[Prunable] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    filters.flatMap(conjuncts).flatMap {
      case EqualTo(a: AttributeReference, Literal(v, _)) =>
        comparable(v).map(RangePred(a.name, "=", _))
      case EqualTo(Literal(v, _), a: AttributeReference) =>
        comparable(v).map(RangePred(a.name, "=", _))
      case GreaterThan(a: AttributeReference, Literal(v, _)) =>
        comparable(v).map(RangePred(a.name, ">", _))
      case GreaterThan(Literal(v, _), a: AttributeReference) =>
        comparable(v).map(RangePred(a.name, "<", _))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        comparable(v).map(RangePred(a.name, ">=", _))
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
        comparable(v).map(RangePred(a.name, "<=", _))
      case LessThan(a: AttributeReference, Literal(v, _)) =>
        comparable(v).map(RangePred(a.name, "<", _))
      case LessThan(Literal(v, _), a: AttributeReference) =>
        comparable(v).map(RangePred(a.name, ">", _))
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        comparable(v).map(RangePred(a.name, "<=", _))
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
        comparable(v).map(RangePred(a.name, ">=", _))
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        val conv = vs.map { case Literal(v, _) => comparable(v) }
        if (conv.forall(_.isDefined) && conv.nonEmpty)
          Some(InPred(a.name, conv.flatten)) else None
      case _ => None
    }
  }

  /** May a file with stats [mn, mx] contain a row satisfying `p`?
    * Any uncertainty (null stats, unconvertible, mixed kinds) → true. */
  private def mayMatch(mn: Option[Either[BigDecimal, String]],
                       mx: Option[Either[BigDecimal, String]],
                       p: Prunable): Boolean = (mn, mx) match {
    case (Some(lo), Some(hi)) => p match {
      case RangePred(_, "=", v) =>
        lte(lo, v).getOrElse(true) && lte(v, hi).getOrElse(true)
      case RangePred(_, ">", v) => lt(v, hi).getOrElse(true)
      case RangePred(_, ">=", v) => lte(v, hi).getOrElse(true)
      case RangePred(_, "<", v) => lt(lo, v).getOrElse(true)
      case RangePred(_, "<=", v) => lte(lo, v).getOrElse(true)
      case InPred(_, vs) => vs.exists(v =>
        lte(lo, v).getOrElse(true) && lte(v, hi).getOrElse(true))
      case _ => true
    }
    case _ => true // all-null column chunk or unreadable stats: keep
  }

  /** The exact bucket expression [[indexBuckets]] wrote, replayed on
    * the driver for a probe literal. */
  private def bucketOf(key: Long, buckets: Long): Long = {
    val h = XxHash64(Seq(Literal(key)), 42L).eval(null).asInstanceOf[Long]
    ((h % buckets) + buckets) % buckets
  }

  private def asLong(v: Either[BigDecimal, String]): Option[Long] = v match {
    case Left(d) if d.isValidLong => Some(d.toLongExact)
    case _ => None
  }

  /** Normalized (scheme-free) path form used to match sidecar `file`
    * strings (from `input_file_name`) against live listings. */
  private def norm(p: String): String = new Path(p).toUri.getPath

  /** Planning-time file pruning: given the version's committed dir and
    * the pushed-down filter expressions, return the strict subset of
    * data files that can satisfy them — or None when pruning is
    * impossible (no sidecar, no usable conjunct, sidecar/listing
    * mismatch) or useless (nothing skipped). */
  def pruneFiles(spark: SparkSession, dir: String, v: Long,
                 filters: Seq[Expression]): Option[Seq[String]] = {
    val preds = extract(filters)
    if (preds.isEmpty) return None
    val (mmCols, bkCols) = sidecars(spark, dir, v)
    if (mmCols.isEmpty && bkCols.isEmpty) return None
    val f = fs(spark, dir)
    val vDir = new Path(s"$dir/v=$v")
    if (!f.exists(vDir)) return None
    val live = f.listStatus(vDir).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        !n.startsWith("_") && !n.startsWith(".")
      }
    val liveByNorm = live.map(p => norm(p.toString) -> p.toString).toMap
    // per-conjunct keep sets, intersected; every sidecar consulted must
    // cover exactly the live files or pruning aborts
    var keep: Set[String] = liveByNorm.keySet
    for (c <- mmCols; ps = preds.filter(_.column == c); if ps.nonEmpty) {
      val rows = spark.read.parquet(minMaxPath(dir, c, v))
        .select(col("file"), col("min_val"), col("max_val")).collect()
      val byFile = rows.map(r => norm(r.getString(0)) ->
        (comparable(r.get(1)), comparable(r.get(2)))).toMap
      if (byFile.keySet != liveByNorm.keySet) {
        // correct but expensive: the scan proceeds UNPRUNED — say so,
        // or a stale/partial sidecar silently costs full scans forever
        log.warn(s"minmax sidecar for $dir v=$v column $c does not cover " +
          s"the live file set (${byFile.size} indexed vs ${liveByNorm.size} " +
          "live) — pruning disabled for this query; re-run indexMinMax")
        return None
      }
      keep = keep.filter { fn =>
        val (mn, mx) = byFile(fn)
        ps.forall(p => mayMatch(mn, mx, p))
      }
    }
    for (c <- bkCols; ps = preds.filter(_.column == c); if ps.nonEmpty) {
      // only pure point probes prune on buckets
      val keys: Seq[Seq[Long]] = ps.flatMap {
        case RangePred(_, "=", v0) => asLong(v0).map(Seq(_))
        case InPred(_, vs) =>
          val ls = vs.map(asLong)
          if (ls.forall(_.isDefined)) Some(ls.flatten) else None
        case _ => None
      }
      if (keys.nonEmpty) {
        val rows = spark.read.parquet(bucketsPath(dir, c, v))
          .select(col("file"), col("occupied"), col("n_buckets")).collect()
        if (rows.isEmpty) return None
        val nb = rows.head.getLong(2)
        val byFile = rows.map(r =>
          norm(r.getString(0)) -> r.getSeq[Long](1).toSet).toMap
        if (byFile.keySet != liveByNorm.keySet) {
          log.warn(s"bucket sidecar for $dir v=$v column $c does not cover " +
            s"the live file set (${byFile.size} indexed vs ${liveByNorm.size} " +
            "live) — pruning disabled for this query; re-run indexBuckets")
          return None
        }
        keep = keep.filter { fn =>
          val occ = byFile(fn)
          keys.forall(_.exists(k => occ.contains(bucketOf(k, nb))))
        }
      }
    }
    if (keep.size < liveByNorm.size)
      Some(keep.toSeq.sorted.map(liveByNorm))
    else None
  }
}
