package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a REAL DataSource-v2 streaming source — the custom
  * `MicroBatchStream` option the survey names for the CDC source
  * (connector.go:54-58), instead of mapping onto the built-in file
  * source. The semantic carried over from the reference:
  *
  *   - a WAL is an ORDERED sequence of segments; the source's `Offset`
  *     is the count of consumed segments — exactly a replication slot's
  *     LSN, serialized into the checkpoint's offset log. Restart resumes
  *     from the committed offset; segments are never re-delivered
  *     (R2's at-least-once ack sits ABOVE this, at batch granularity).
  *   - segment admission per micro-batch (`maxSegmentsPerTrigger` ≙
  *     batch-size-bounded WAL reads) via `SupportsAdmissionControl`.
  *   - segments are JSON-lines event files, name-ordered (names must be
  *     monotone like LSNs — the capture side writes them that way, and
  *     the offset records the last consumed NAME so a violation fails
  *     loudly instead of silently skipping/re-delivering).
  *
  * Usage:
  * {{{
  *   spark.readStream.format(classOf[WalReplayProvider].getName)
  *     .option("path", dir).option("maxSegmentsPerTrigger", "1").load()
  * }}}
  *
  * Scale notes: one input partition per segment (a segment is the unit
  * of WAL ordering; parallelism comes from many segments in flight, like
  * the file source); the driver holds only the segment NAME list. The
  * parse is Jackson straight to `InternalRow` — no Row round-trip.
  */
class WalReplayProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.stream.Pipeline.eventSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WalTable(schema, properties.asScala.toMap)

  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class WalTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = s"wal-replay(${props.getOrElse("path", "?")})"
  override def schema(): StructType = schema0
  private def schema0: StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema0
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new WalMicroBatchStream(
            options.get("path"),
            Option(options.get("maxSegmentsPerTrigger")).map(_.toInt),
            schema0)
      }
    }
}

/** Offset = number of consumed segments (the "LSN") + the NAME of the
  * last consumed segment. The name is what makes the monotone-naming
  * contract ENFORCEABLE instead of a scaladoc hope: a count alone is an
  * index into a re-sorted listing, so a capture side that writes
  * non-monotone names (unpadded `seg-10` sorting before `seg-2`) or
  * deletes consumed segments would silently shift the committed prefix —
  * skipping some segments and re-delivering others. With the name stored,
  * any such shift is detected on the next batch and fails loudly.
  * (`last` is absent at offset 0 and when resuming from a pre-name
  * checkpoint — validation simply skips then.)
  */
private[sources] case class WalOffset(seg: Long, last: Option[String] = None)
    extends Offset {
  override def json(): String = {
    val m = new ObjectMapper()
    val node = m.createObjectNode()
    node.put("seg", seg)
    last.foreach(node.put("last", _))
    m.writeValueAsString(node)
  }
}

private[sources] class WalMicroBatchStream(dir: String, maxSegments: Option[Int],
    schema: StructType = graft.stream.Pipeline.eventSchema)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  require(dir != null, "wal-replay requires option path")

  /** Trigger.AvailableNow: the end bound is PINNED at query start (the
    * segment count then); batches drain up to it under the normal
    * admission limit, then the query stops. Without this interface Spark
    * falls back to ONE unbounded batch — which both ignores
    * `maxSegmentsPerTrigger` (a 10⁶-segment backlog lands in a single
    * batch) and means a long catch-up run commits nothing until the very
    * end (one crash = redo everything). Segments landing after prepare
    * are left for the next run — exactly AvailableNow's contract.
    */
  private var availableNowBound: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowBound = Some(segments().length.toLong)
  }

  /** Name-sorted segment listing — names must be monotone (LSN-like). */
  private def segments(): Array[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf())
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.toString).sorted
  }

  override def initialOffset(): Offset = WalOffset(0L)

  override def deserializeOffset(json: String): Offset = {
    val n = new ObjectMapper().readTree(json)
    WalOffset(n.get("seg").asLong(),
      if (n.hasNonNull("last")) Some(n.get("last").asText()) else None)
  }

  /** Fail loudly if the committed prefix no longer ends at the recorded
    * segment — a violated monotone-name contract (or a deleted segment)
    * would otherwise silently skip and re-deliver. Two distinct loud
    * failures:
    *
    *   - RETENTION: fewer segments on disk than the committed count —
    *     consumed segments were deleted while the query was down. This
    *     is the reference's slot-dropped-while-down analog
    *     (a dropped replication slot also makes the committed position
    *     unreplayable); resuming against a truncated listing would
    *     renumber every remaining segment, silently skipping some and
    *     re-delivering others.
    *   - NAMING: the listing's segment #i is not the recorded name — a
    *     non-monotone name landed inside the committed range (or the
    *     tail segment was replaced).
    */
  private def validate(segs: Array[String], o: WalOffset): Unit =
    o.last.foreach { l =>
      val i = o.seg.toInt
      // names, not counts: "one deleted + one new arrival" keeps the
      // listing length at i, so only the name structure distinguishes
      // retention (segments REMOVED from the committed range) from a
      // naming violation (names INSERTED into it). j = how many names
      // sort at-or-before the recorded tail in the (sorted) listing.
      val j = segs.count(_ <= l)
      val present = j > 0 && segs(j - 1) == l
      if (!present || j < i)
        throw new IllegalStateException(
          s"WAL retention violated: the committed offset covers $i segments " +
            s"ending at '$l', but " +
            (if (!present) "that segment is no longer in the listing"
             else s"only $j of them remain") +
            " — consumed segments were deleted while the query was down " +
            "(the dropped-replication-slot analog). Restart is refused: " +
            "resuming against a truncated WAL would renumber the remaining " +
            "segments, silently skipping some and re-delivering others. " +
            "Restore the missing segments, or start over with a fresh " +
            "checkpoint.")
      if (j > i)
        throw new IllegalStateException(
          s"WAL segment naming contract violated: the committed offset covers " +
            s"$i segments ending at '$l', but the listing has $j names " +
            s"sorting at or before it. Segment names must be monotone " +
            "(zero-padded / LSN-like) — a non-monotone name (e.g. unpadded " +
            "'seg-10' sorting before 'seg-2') lands INSIDE the committed " +
            "range and silently skips some segments and re-delivers others.")
    }

  override def getDefaultReadLimit: ReadLimit =
    maxSegments.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val segs = segments()
    val s = start.asInstanceOf[WalOffset]
    validate(segs, s)
    val total = availableNowBound
      .fold(segs.length.toLong)(math.min(_, segs.length.toLong))
    val to = limit match {
      case mf: ReadMaxFiles => math.min(s.seg + mf.maxFiles(), total)
      case _ => total
    }
    WalOffset(to, if (to > 0) Some(segs((to - 1).toInt)) else None)
  }

  /** The unbounded high-water mark (progress reporting only — admission
    * goes through `latestOffset(start, limit)`).
    */
  override def reportLatestOffset(): Offset = {
    val segs = segments()
    WalOffset(segs.length.toLong, segs.lastOption)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val segs = segments()
    val s = start.asInstanceOf[WalOffset]
    val e = end.asInstanceOf[WalOffset]
    // validate BOTH ends: on crash-restart the uncommitted batch (start, end)
    // is replayed from the offsets log against a FRESH listing — a
    // non-monotone segment that landed during downtime (e.g. 'seg-25'
    // sorting INSIDE the committed range) leaves the start name intact but
    // shifts indices within (start, end), so only the end name catches the
    // shift BEFORE the wrong segment files are read and written to the sink
    validate(segs, s)
    validate(segs, e)
    val from = s.seg.toInt
    val to = math.min(e.seg, segs.length.toLong).toInt
    (from until to).map(i => WalSegmentPartition(segs(i)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the SESSION's Hadoop conf to executors (as a serializable map —
    // Configuration itself isn't Serializable): a bare `new Configuration()`
    // on the reader side would drop spark.hadoop.* settings (s3a
    // credentials, custom filesystems) and only ever work on file:// paths
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val confMap = conf.iterator().asScala
      .map(e => e.getKey -> e.getValue).toMap
    new WalReaderFactory(confMap, schema)
  }

  override def commit(end: Offset): Unit = () // segments are retained (replayable slot)
  override def stop(): Unit = ()
}

private[sources] case class WalSegmentPartition(path: String) extends InputPartition

private[sources] class WalReaderFactory(hadoopConf: Map[String, String],
    schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WalSegmentReader(partition.asInstanceOf[WalSegmentPartition].path,
      hadoopConf, schema)
}

/** JSONL → InternalRow, one segment per reader (executor-side),
  * SCHEMA-DRIVEN (round 8): fields convert by the declared read schema
  * instead of a hard-coded event layout, so any JSON-lines WAL — CDC
  * events, documents, embeddings manifests — replays through the same
  * segment-offset source (the e2e production composition streams
  * documents this way).
  */
private[sources] class WalSegmentReader(path: String, hadoopConf: Map[String, String],
    schema: StructType = graft.stream.Pipeline.eventSchema)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val p = new Path(path)
  private val in = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    hadoopConf.foreach { case (k, v) => conf.set(k, v) }
    p.getFileSystem(conf).open(p)
  }
  private val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  private var current: InternalRow = _

  override def next(): Boolean = {
    var ok = false
    while (!ok && lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty) {
        val n = mapper.readTree(line)
        current = new GenericInternalRow(schema.fields.map { f =>
          if (!n.hasNonNull(f.name)) null
          else f.dataType match {
            case org.apache.spark.sql.types.LongType =>
              java.lang.Long.valueOf(n.get(f.name).asLong())
            case org.apache.spark.sql.types.IntegerType =>
              java.lang.Integer.valueOf(n.get(f.name).asInt())
            case org.apache.spark.sql.types.DoubleType =>
              java.lang.Double.valueOf(n.get(f.name).asDouble())
            case org.apache.spark.sql.types.BooleanType =>
              java.lang.Boolean.valueOf(n.get(f.name).asBoolean())
            case org.apache.spark.sql.types.StringType =>
              UTF8String.fromString(n.get(f.name).asText())
            case dt => throw new IllegalArgumentException(
              s"WAL replay: unsupported field type $dt for '${f.name}'")
          }
        }.asInstanceOf[Array[Any]])
        ok = true
      }
    }
    ok
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
