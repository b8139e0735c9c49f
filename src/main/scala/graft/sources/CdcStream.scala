package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The snapshot changelog as a STRUCTURED STREAMING source — the
  * continuous form of `option("changes", "a..b")`:
  *
  * {{{
  *   spark.readStream.format("graft-snapshot")
  *     .option("changes", "stream").option("key", "doc_id")
  *     .option("startingVersion", -1)        // optional; default: latest
  *     .load(dir)
  * }}}
  *
  * Offsets ARE snapshot versions (the Iceberg/Delta changelog shape):
  * an offset of N means "the consumer is current through commit N", and
  * each micro-batch serves the [[SnapshotTable.rowDiff]] rows of every
  * commit in `(start, end]` — `(key, change_type, old_row, new_row)`,
  * exactly the batch CDC schema. `startingVersion = -1` bootstraps with
  * version 0 served as all-`added` (the initial-snapshot-then-changes
  * convention); the default start is the latest commit at stream start
  * (changes only).
  *
  * Exactly-once comes from determinism, not state: committed versions
  * are immutable, so a `(start, end]` batch replayed after a crash from
  * the checkpointed offsets is bit-identical, and the per-pair diffs
  * are MATERIALIZED ONCE as `_cdc/` parquet sidecars
  * ([[SnapshotTable.materializeDiff]]) — a restart re-reads cheap
  * parquet rather than re-joining versions. Per trigger the driver does
  * one `listStatus` ([[SnapshotTable.latestVersion]]); per NEW commit
  * it pays the diff join once, ever, shared with every other consumer
  * of the same feed. At 100 TB the batch cost is proportional to the
  * CHANGE, never the table.
  *
  * Execution delegates to the stock V2 parquet machinery: each batch
  * plans a [[ParquetTable]] scan over the span's sidecar files, so
  * vectorized reading, partition sizing and every parquet improvement
  * apply to the stream for free. A schema change between versions fails
  * the diff loudly with the drift report (see
  * [[SnapshotTable.rowDiff]]) rather than serving mixed-schema
  * batches. */
final class CdcStreamTable(spark: SparkSession, dir: String, key: String,
                           startingVersion: Option[Long],
                           options: CaseInsensitiveStringMap)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {

  override def name(): String = s"graft-snapshot $dir changes (stream)"

  /** The diff frame's schema, derived analytically (no execution) by
    * running [[SnapshotTable.frameDiff]] over empty frames of the
    * LATEST committed schema — the stream is pinned to it; a later
    * commit that drifts fails the batch loudly. */
  override lazy val schema: StructType = {
    val latest = SnapshotTable.latestVersion(spark, dir).getOrElse(
      throw new IllegalArgumentException(
        s"cannot stream changes of $dir: no committed version yet"))
    val proto = SnapshotTable.read(spark, dir, Some(latest))
    require(proto.columns.contains(key),
      s"changes key '$key' is not a column of $dir (has " +
        s"${proto.columns.mkString(", ")})")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], proto.schema)
    SnapshotTable.frameDiff(empty, empty, key).schema
  }

  override def capabilities()
      : java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    java.util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def description(): String = name()
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new CdcMicroBatchStream(spark, dir, key, startingVersion,
            schema, options)
      }
    }
}

/** One snapshot version as a streaming offset. */
final case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** See [[CdcStreamTable]]. Version-ranged micro-batches over the
  * materialized per-commit diff sidecars. */
final class CdcMicroBatchStream(spark: SparkSession, dir: String,
                                key: String, startingVersion: Option[Long],
                                diffSchema: StructType,
                                options: CaseInsensitiveStringMap)
    extends MicroBatchStream {

  // the delegate parquet batch's reader factory from the most recent
  // planInputPartitions — parquet reader factories depend only on the
  // (fixed) schema, not the file list, so the latest one serves any
  // planned batch; a factory requested before any plan reads zero files
  @volatile private var factory: PartitionReaderFactory =
    delegateBatch(Seq.empty).createReaderFactory()

  private def delegateBatch(paths: Seq[String])
      : org.apache.spark.sql.connector.read.Batch = {
    val pt = ParquetTable(s"graft-snapshot $dir changes (stream)", spark,
      options, paths, Some(diffSchema), classOf[ParquetFileFormat])
    pt.newScanBuilder(options).build().toBatch
  }

  override def initialOffset(): Offset = {
    val committed = SnapshotTable.versions(spark, dir)
    startingVersion match {
      case Some(-1L) => VersionOffset(-1L) // genesis: v0 arrives as adds
      case Some(v) =>
        require(committed.contains(v),
          s"startingVersion $v is not a committed version of $dir " +
            "(use -1 to bootstrap from genesis)")
        VersionOffset(v)
      case None => VersionOffset(committed.lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"cannot stream changes of $dir: no committed version yet")))
    }
  }

  override def latestOffset(): Offset =
    VersionOffset(SnapshotTable.latestVersion(spark, dir).getOrElse(-1L))

  override def deserializeOffset(json: String): Offset =
    VersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    if (e <= s) return Array.empty
    val committed = SnapshotTable.versions(spark, dir)
    require(s == -1L || committed.contains(s),
      s"stream base version v$s of $dir was vacuumed — restart the " +
        "stream from a fresh checkpoint (startingVersion or default)")
    require(committed.contains(e),
      s"offset version v$e of $dir is not committed")
    val span = s +: committed.filter(v => v > s && v <= e)
    // one materialized-once sidecar per consecutive commit pair: the
    // first trigger over a new commit pays its diff join; replays and
    // other consumers read the parquet
    val paths = span.sliding(2).collect { case Seq(a, b) =>
      SnapshotTable.materializeDiff(spark, dir, a, b, key)
    }.toSeq
    val batch = delegateBatch(paths)
    factory = batch.createReaderFactory()
    batch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = factory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
