package graft.sources

import java.io.{BufferedReader, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A custom DataSource-V2 MICRO-BATCH streaming source: lines of a
  * (optionally gzipped) text file, admitted at a bounded rate per
  * trigger. This is the Spark-native reconstruction of the reference's
  * ingestion stage — `FileIO.fromPath + Compression.gunzip()` for the
  * codec (Main.scala:20-27), `.throttle(1, 3.seconds)` as per-trigger
  * admission control (Main.scala:33), and `.buffer(10, backpressure)` as
  * the micro-batch engine's own admission/backpressure loop
  * (Main.scala:106) — implemented on the public connector API
  * (TableProvider → MicroBatchStream with SupportsAdmissionControl).
  *
  * Usage:
  * {{{
  *   spark.readStream.format(classOf[ThrottledLinesSource].getName)
  *     .option("path", "/data/packages.txt.gz")
  *     .option("linesPerTrigger", "5")
  *     .load()                      // schema: (line_no LONG, line STRING)
  * }}}
  *
  * Scale notes: offsets are LINE numbers, so a committed batch is exactly
  * reproducible (replayable source ⇒ end-to-end exactly-once with a
  * checkpointed sink). The demo reader re-scans to skip to the start
  * offset (gz is not splittable); a production deployment would keep a
  * line→byte index per file, or many files, to make seeks O(1) — the
  * offset/commit contract here is unchanged by that.
  */
class ThrottledLinesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ThrottledLinesSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("option 'path' is required"))
    val perTrigger = Option(properties.get("linespertrigger")).map(_.toLong)
      .orElse(Option(properties.get("linesPerTrigger")).map(_.toLong))
      .getOrElse(10L)
    new ThrottledLinesTable(path, perTrigger)
  }
}

object ThrottledLinesSource {
  val schema: StructType = StructType(Seq(
    StructField("line_no", LongType, nullable = false),
    StructField("line", StringType, nullable = true)))

  private[sources] def open(path: String): BufferedReader = {
    val in = new FileInputStream(path)
    val stream = if (path.endsWith(".gz")) new GZIPInputStream(in) else in
    new BufferedReader(new InputStreamReader(stream, StandardCharsets.UTF_8))
  }

  private[sources] def countLines(path: String): Long = {
    val r = open(path)
    try Iterator.continually(r.readLine()).takeWhile(_ != null).size.toLong
    finally r.close()
  }
}

private[sources] class ThrottledLinesTable(path: String, perTrigger: Long)
    extends Table with SupportsRead {
  override def name(): String = s"throttled_lines($path)"
  override def schema(): StructType = ThrottledLinesSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ThrottledLinesSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ThrottledLinesStream(path, perTrigger)
      }
    }
}

/** Offset = number of lines fully committed (replay-stable). */
private[sources] case class LineOffset(line: Long) extends Offset {
  override def json(): String = line.toString
}

private[sources] class ThrottledLinesStream(path: String, perTrigger: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Counted once on the driver at stream start; AvailableNow pins this as
  // the end-of-stream watermark so the run terminates deterministically.
  private lazy val total: Long = ThrottledLinesSource.countLines(path)
  @volatile private var availableNowEnd: Option[Long] = None

  override def initialOffset(): Offset = LineOffset(0L)
  override def deserializeOffset(json: String): Offset = LineOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(perTrigger)

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(total)

  override def reportLatestOffset(): Offset =
    LineOffset(availableNowEnd.getOrElse(total))

  /** Throttle: admit at most `perTrigger` lines per micro-batch. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LineOffset].line
    val cap = availableNowEnd.getOrElse(total)
    val step = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows => r.maxRows()
      case _ => perTrigger
    }
    LineOffset(math.min(cap, from + step))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control path")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LineOffset].line
    val e = end.asInstanceOf[LineOffset].line
    if (e <= s) Array.empty
    else Array(LinesInputPartition(path, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory = LinesReaderFactory

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class LinesInputPartition(path: String, start: Long, end: Long)
    extends InputPartition

private[sources] object LinesReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LinesInputPartition]
    new PartitionReader[InternalRow] {
      private val reader = ThrottledLinesSource.open(p.path)
      private var lineNo = 0L
      private var current: String = _
      // skip to the batch's start offset
      while (lineNo < p.start && reader.readLine() != null) lineNo += 1

      override def next(): Boolean = {
        if (lineNo >= p.end) return false
        current = reader.readLine()
        if (current == null) return false
        lineNo += 1
        true
      }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](lineNo - 1, UTF8String.fromString(current)))
      override def close(): Unit = reader.close()
    }
  }
}
