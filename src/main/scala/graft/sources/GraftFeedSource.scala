package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `.gfc` — a minimal chunked binary export format for the audit feed,
  * plus its DataSource V2 reader. This is the engine-extension answer to
  * "the feed arrives as an in-house export, not parquet": the reference
  * ingests changes in-database (trigger → audit table, audit.go:627);
  * a Spark deployment often receives the same rows as opaque vendor
  * chunks. The point of doing it as DSv2 (rather than a mapPartitions
  * decode) is that the optimizer keeps working across the boundary:
  *
  *   - **Chunk skipping (filter pushdown)**: each chunk header carries
  *     min/max audit id; `SupportsPushDownFilters` prunes whole chunks at
  *     planning against id-range predicates — the parquet row-group
  *     min/max story, reimplemented for the custom format. Pushed filters
  *     are also KEPT as residual (pushFilters returns them all), so chunk
  *     skipping is purely an optimization — correctness never depends on
  *     the stats.
  *   - **Decode pruning (column pruning)**: `SupportsPushDownRequiredColumns`
  *     narrows the reader's schema; the record decoder skips the bytes of
  *     unneeded columns instead of materializing them (UTF8 payloads are
  *     never allocated for a `select(event_id)`).
  *   - **Partition = chunk**: planInputPartitions yields one partition
  *     per surviving chunk, so read parallelism scales with data volume,
  *     not file count.
  *
  * Layout per chunk:
  * {{{
  *   magic:int "GFC1" | nRows:int | minId:long | maxId:long | payloadLen:int
  *   then nRows × record
  *   record: event_id:long | tsNanos:long | user_id:long | value:double
  *           | etLen:short | et:bytes | propsLen:int | props:bytes
  * }}}
  */
object GraftFeedFormat {

  val Magic = 0x47464331 // "GFC1"
  val ChunkRows = 1000

  /** Feed schema as stored (ts in epoch NANOS, matching the driver's raw
    * export encoding, so [[FeedSources.normalize]] applies unchanged). */
  val schema: StructType = FeedSources.feedSchema

  /** Executor-side chunked writer: one `.gfc` file per input partition
    * (the real distributed-sink shape — no driver collect). Input must be
    * the NORMALIZED feed (ts as TIMESTAMP); rows are stored as epoch
    * nanos. Local filesystem is the deployment target here (local[32]);
    * a cluster build would swap FileOutputStream for the Hadoop FS API —
    * the format and reader are unchanged. */
  def write(normalized: DataFrame, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    new File(dir).mkdirs()
    val rows = normalized.select(
      col("event_id"), (expr("unix_micros(ts)") * 1000L).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    rows.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val f = new File(dir, f"part-$pid%05d.gfc")
        val out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(f)))
        try {
          val buf = new ArrayBuffer[org.apache.spark.sql.Row](ChunkRows)
          def flush(): Unit = if (buf.nonEmpty) {
            val body = new java.io.ByteArrayOutputStream()
            val bo = new DataOutputStream(body)
            var minId = Long.MaxValue; var maxId = Long.MinValue
            buf.foreach { r =>
              val id = r.getLong(0)
              minId = math.min(minId, id); maxId = math.max(maxId, id)
              bo.writeLong(id); bo.writeLong(r.getLong(1)); bo.writeLong(r.getLong(2))
              bo.writeDouble(r.getDouble(4))
              val et = r.getString(3).getBytes(StandardCharsets.UTF_8)
              // the 2-byte length field caps event_type at 65535 UTF-8
              // bytes; an unchecked writeShort would silently truncate a
              // longer value to a negative short and corrupt the stream
              // at read time (NegativeArraySizeException or misparse)
              require(et.length <= 0xFFFF,
                s"event_type exceeds gfc 2-byte length limit: ${et.length} bytes")
              bo.writeShort(et.length); bo.write(et)
              val pr = r.getString(5).getBytes(StandardCharsets.UTF_8)
              bo.writeInt(pr.length); bo.write(pr)
            }
            bo.flush()
            out.writeInt(Magic); out.writeInt(buf.size)
            out.writeLong(minId); out.writeLong(maxId)
            out.writeInt(body.size()); body.writeTo(out)
            buf.clear()
          }
          it.foreach { r => buf += r; if (buf.size >= ChunkRows) flush() }
          flush()
        } finally out.close()
      }
    }
  }

  /** One chunk's planning metadata (header scan only — record bytes are
    * not touched until an executor opens the partition). */
  final case class ChunkMeta(file: String, offset: Long, nRows: Int,
      minId: Long, maxId: Long, payloadLen: Int)

  def listChunks(dir: String): Seq[ChunkMeta] = {
    val files = Option(new File(dir).listFiles())
      .getOrElse(Array.empty[File])
      .filter(_.getName.endsWith(".gfc")).sortBy(_.getName)
    files.toSeq.flatMap { f =>
      val in = new DataInputStream(
        new BufferedInputStream(new FileInputStream(f)))
      try {
        val metas = ArrayBuffer.empty[ChunkMeta]
        var offset = 0L
        var done = false
        while (!done) {
          val magic = try in.readInt() catch { case _: EOFException => done = true; 0 }
          if (!done) {
            require(magic == Magic, s"bad .gfc chunk magic in ${f.getName}")
            val n = in.readInt(); val mn = in.readLong(); val mx = in.readLong()
            val len = in.readInt()
            metas += ChunkMeta(f.getAbsolutePath, offset + 28L, n, mn, mx, len)
            in.skipBytes(len)
            offset += 28L + len
          }
        }
        metas.toSeq
      } finally in.close()
    }
  }
}

/** Planning-time observability for the spec: how many chunks the pushed
  * id-range predicates skipped in the last scan plan. */
object GraftFeedMetrics {
  val chunksSkipped = new AtomicLong(0)
  val chunksPlanned = new AtomicLong(0)
}

class GraftFeedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftFeedFormat.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftFeedTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

class GraftFeedTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_feed($path)"
  override def schema(): StructType = GraftFeedFormat.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftFeedScanBuilder(path)
}

class GraftFeedScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftFeedFormat.schema

  /** Accepts id-range predicates for chunk skipping but returns ALL
    * filters as residual — Spark re-applies them row-level, so the
    * min/max stats can only skip work, never change results. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case GreaterThan("event_id", _: java.lang.Long) => true
      case GreaterThanOrEqual("event_id", _: java.lang.Long) => true
      case LessThan("event_id", _: java.lang.Long) => true
      case LessThanOrEqual("event_id", _: java.lang.Long) => true
      case EqualTo("event_id", _: java.lang.Long) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftFeedScan(path, pushed, required)
}

class GraftFeedScan(path: String, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftFeedScan path=$path pushed=[${pushed.mkString(", ")}] " +
      s"read=[${required.fieldNames.mkString(",")}]"

  private def survives(m: GraftFeedFormat.ChunkMeta): Boolean = pushed.forall {
    case GreaterThan("event_id", v: java.lang.Long) => m.maxId > v
    case GreaterThanOrEqual("event_id", v: java.lang.Long) => m.maxId >= v
    case LessThan("event_id", v: java.lang.Long) => m.minId < v
    case LessThanOrEqual("event_id", v: java.lang.Long) => m.minId <= v
    case EqualTo("event_id", v: java.lang.Long) => m.minId <= v && m.maxId >= v
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val all = GraftFeedFormat.listChunks(path)
    val kept = all.filter(survives)
    GraftFeedMetrics.chunksPlanned.addAndGet(all.size.toLong)
    GraftFeedMetrics.chunksSkipped.addAndGet((all.size - kept.size).toLong)
    kept.map(m => GraftFeedPartition(m): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftFeedReaderFactory(required)
}

final case class GraftFeedPartition(meta: GraftFeedFormat.ChunkMeta)
    extends InputPartition

class GraftFeedReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftFeedReader(partition.asInstanceOf[GraftFeedPartition].meta, required)
}

/** Decodes one chunk; skips the bytes of columns the scan pruned away. */
class GraftFeedReader(meta: GraftFeedFormat.ChunkMeta, required: StructType)
    extends PartitionReader[InternalRow] {
  private val in = new DataInputStream(new BufferedInputStream(
    new FileInputStream(meta.file)))
  in.skipNBytes(meta.offset)
  private var remaining = meta.nRows
  private var row: InternalRow = _
  // field positions in the OUTPUT row, -1 = pruned
  private def fieldPos(n: String): Int = required.fieldNames.indexOf(n)
  private val pId = fieldPos("event_id")
  private val pTs = fieldPos("ts")
  private val pUser = fieldPos("user_id")
  private val pEt = fieldPos("event_type")
  private val pVal = fieldPos("value")
  private val pProps = fieldPos("props")

  override def next(): Boolean = {
    if (remaining <= 0) false
    else {
      val vals = new Array[Any](required.size)
      val id = in.readLong(); val ts = in.readLong(); val uid = in.readLong()
      val v = in.readDouble()
      if (pId >= 0) vals(pId) = id
      if (pTs >= 0) vals(pTs) = ts
      if (pUser >= 0) vals(pUser) = uid
      if (pVal >= 0) vals(pVal) = v
      // unsigned decode pairs with the write-side 0xFFFF cap: lengths in
      // [32768, 65535] round-trip instead of reading back negative
      val etLen = in.readUnsignedShort()
      if (pEt >= 0) {
        val b = new Array[Byte](etLen); in.readFully(b)
        vals(pEt) = UTF8String.fromBytes(b)
      } else in.skipNBytes(etLen.toLong)
      val prLen = in.readInt()
      if (pProps >= 0) {
        val b = new Array[Byte](prLen); in.readFully(b)
        vals(pProps) = UTF8String.fromBytes(b)
      } else in.skipNBytes(prLen.toLong)
      row = new GenericInternalRow(vals)
      remaining -= 1
      true
    }
  }
  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
