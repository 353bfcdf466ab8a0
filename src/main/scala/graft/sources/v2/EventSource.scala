package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's push-event envelope shape
  * (SURVEY §2.1 S1; api/main.py:235-246) — the API-level form of "source
  * predicate registration" (S12): filters on `event_id` are consumed by
  * the SOURCE, which then plans only the input partitions that can
  * contain matching rows. On a real backlog (Pub/Sub snapshot, Kafka
  * offsets, an id-keyed changelog) this is the difference between
  * scanning the retention window and scanning the slice the query asked
  * for. Column pruning is honored the same way: the reader materializes
  * only the columns Catalyst requires.
  *
  * Besides BATCH_READ the table supports MICRO_BATCH_READ — the
  * connector-level analog of the reference's offset-based CDC loop
  * (api/main.py:235-249 push notification + :278-287 `history.list(
  * startHistoryId=...)`): the checkpointable [[EventOffset]] is the
  * `event_id` high-watermark (exclusive), exactly the role
  * `last_history_id.txt` plays (api/main.py:257-290), and admission
  * control (`maxPerTrigger`, via [[SupportsAdmissionControl]]) bounds
  * each micro-batch the way `maxResults` bounds a history page. Offsets
  * are committed by the engine's checkpoint, so a killed-and-restarted
  * query resumes from the persisted watermark with no duplicated or
  * skipped event_id — the F2/ST1 monotone-watermark semantics at the
  * source layer instead of the query layer. Streaming partition pruning
  * is offset-range pruning: each batch plans only the chunks
  * intersecting [start, end), the same arithmetic the batch path uses
  * for pushed event_id ranges (`startId` bounds the stream's initial
  * offset; pushed batch filters are honored too if the engine offers
  * them to a streaming scan).
  *
  * The rows here are deterministic functions of `event_id` (this
  * container has no live broker), which makes the connector's pushdown,
  * pruning, and resume behavior testable exactly: the spec asserts
  * planned partition counts shrink under pushed range filters,
  * non-pushable predicates still apply as residuals, values match the
  * formulas, and a kill-and-restart drains every id exactly once.
  *
  * Usage:
  *   spark.read.format("graftevents")
  *     .option("events", 100000).option("chunk", 4096).load()
  *   spark.readStream.format("graftevents")
  *     .option("events", 100000).option("maxPerTrigger", 1000).load()
  *   // explicit projection (the streaming-path pruning opt-in; Spark 4
  *   // won't push V2 column pruning into MICRO_BATCH scans):
  *   spark.readStream.format("graftevents")
  *     .option("events", 100000).option("columns", "event_id,user_id").load()
  *
  * Wiring: registered under the short name via DataSourceRegister
  * (META-INF/services), capabilities = BATCH_READ + MICRO_BATCH_READ,
  * one [[EventRange]] per planned chunk; readers fill one reusable
  * values array + InternalRow per partition (the DSv2 reader contract
  * allows returning the same mutable row from `get()`).
  */
class EventSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftevents"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventSource.schemaFor(Option(options.get("columns")))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // Spark hands getTable a case-SENSITIVE map while inferSchema got a
    // CaseInsensitiveStringMap — re-wrap so an option spelled `Columns`
    // (or `MaxPerTrigger`) isn't honored by schema inference but silently
    // dropped here, the convention every built-in source follows
    val opts = new CaseInsensitiveStringMap(properties)
    val events = Option(opts.get("events")).map(_.toLong).getOrElse(10000L)
    val chunk = Option(opts.get("chunk")).map(_.toLong).getOrElse(1024L)
    val startId = Option(opts.get("startId")).map(_.toLong).getOrElse(0L)
    // clamp like chunk: maxPerTrigger <= 0 would make latestOffset never
    // advance and spin an AvailableNow drain forever
    val maxPerTrigger = Option(opts.get("maxPerTrigger"))
      .map(v => math.max(1L, v.toLong))
    new EventTable(events, math.max(1L, chunk), startId, maxPerTrigger,
      EventSource.schemaFor(Option(opts.get("columns"))))
  }
}

object EventSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  private val baseMicros = 1704067200L * 1000000L // 2024-01-01T00:00:00Z
  private val types = Array("view", "click", "purchase")

  /** Explicit-projection table schema for the `columns` option (comma-
    * separated names, requested order, case-sensitive). Spark 4 does not
    * apply V2 column pruning to MICRO_BATCH scans (measured via
    * StreamingQuery.explain: the streaming scan reads the full schema and
    * Catalyst projects after), so a streaming reader's only way to get
    * the narrow read the batch path gets automatically is to opt in at
    * the table level — the option narrows the TABLE schema, which every
    * scan (batch and micro-batch) then materializes verbatim. */
  def schemaFor(columns: Option[String]): StructType = columns match {
    case None => schema
    case Some(spec) =>
      val names = spec.split(",").map(_.trim).filter(_.nonEmpty).distinct
      val known = schema.fieldNames.toSet
      val bad = names.filterNot(known)
      require(bad.isEmpty && names.nonEmpty,
        s"graftevents 'columns' option: unknown/empty column list " +
          s"'${spec}' (available: ${schema.fieldNames.mkString(",")})")
      StructType(names.map(n => schema(n)).toSeq)
  }

  /** The deterministic row formulas — mirrored by the spec. */
  def tsMicros(id: Long): Long = baseMicros + id * 60000000L // 1/min
  def userId(id: Long): Long = id % 97
  def eventType(id: Long): String = types((id % 3).toInt)
  def payload(id: Long): String = s"""{"event":$id,"u":${userId(id)}}"""

  /** Chunk-aligned partition planning over an id range — shared by the
    * batch scan (post-pushdown) and every micro-batch (post-offset), so
    * pruning behavior is identical on both paths. */
  def partitionsFor(lo: Long, hi: Long, chunk: Long): Array[InputPartition] = {
    val first = lo / chunk
    val last = if (hi <= lo) first - 1 else (hi - 1) / chunk
    (first to last).map { c =>
      EventRange(math.max(lo, c * chunk), math.min(hi, (c + 1) * chunk))
    }.toArray
  }
}

class EventTable(events: Long, chunk: Long, startId: Long,
    maxPerTrigger: Option[Long],
    tableSchema: StructType = EventSource.schema)
    extends Table with SupportsRead {
  override def name(): String = s"graftevents($events)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventScanBuilder(events, chunk, startId, maxPerTrigger, tableSchema)
}

/** Consumes event_id range predicates; everything else stays a residual
  * Catalyst filter (returned from pushFilters), so correctness never
  * depends on what the source understands. */
class EventScanBuilder(events: Long, chunk: Long, startId: Long,
    maxPerTrigger: Option[Long],
    tableSchema: StructType = EventSource.schema) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = startId             // inclusive
  private var hi = events              // exclusive
  private var pushed = Array.empty[Filter]
  private var required = tableSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case EqualTo("event_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("event_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThanOrEqual("event_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("event_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("event_id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    def num(v: Any): Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
    }
    supported.foreach {
      case EqualTo(_, v) => lo = math.max(lo, num(v)); hi = math.min(hi, num(v) + 1)
      case GreaterThan(_, v) => lo = math.max(lo, num(v) + 1)
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, num(v))
      case LessThan(_, v) => hi = math.min(hi, num(v))
      case LessThanOrEqual(_, v) => hi = math.min(hi, num(v) + 1)
      case _ =>
    }
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new EventScan(lo, math.max(lo, hi), chunk, required, maxPerTrigger)
}

class EventScan(lo: Long, hi: Long, chunk: Long, required: StructType,
    maxPerTrigger: Option[Long]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftevents range=[$lo,$hi) chunk=$chunk cols=${required.fieldNames.mkString(",")}"
  // partition planning AFTER pushdown: only chunks intersecting the
  // pushed range exist — the pruning the spec pins
  override def planInputPartitions(): Array[InputPartition] =
    EventSource.partitionsFor(lo, hi, chunk)
  override def createReaderFactory(): PartitionReaderFactory =
    new EventReaderFactory(required)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new EventMicroBatchStream(lo, hi, chunk, required, maxPerTrigger)
}

/** Offset = event_id high-watermark (exclusive): "everything below this id
  * has been emitted". JSON form is the bare number, mirroring the
  * reference's `last_history_id.txt` single-value watermark file. */
case class EventOffset(id: Long) extends Offset {
  override def json(): String = id.toString
}

/** Micro-batch view of the event range: each batch covers offsets
  * [start, end) where `end - start <= maxPerTrigger` when admission
  * control is configured. The engine persists committed offsets in the
  * query checkpoint; on restart it hands back the deserialized watermark
  * instead of calling initialOffset, which is what makes resume
  * exactly-once with no source-side state. */
class EventMicroBatchStream(lo: Long, hi: Long, chunk: Long,
    required: StructType, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Trigger.AvailableNow pins the drain target at query start; without
  // SupportsTriggerAvailableNow the engine falls back to Trigger.Once
  // (ONE batch, read limits ignored) — the opposite of admitted CDC.
  @volatile private var availableNowTarget: Long = hi
  override def prepareForTriggerAvailableNow(): Unit = availableNowTarget = hi

  override def initialOffset(): Offset = EventOffset(lo)
  override def deserializeOffset(json: String): Offset = EventOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  // The engine calls the admission-controlled overload because we
  // implement SupportsAdmissionControl; the no-arg variant is dead code
  // kept loud rather than silently unbounded.
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled entry point")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[EventOffset].id
    val cap = math.min(hi, availableNowTarget)
    def maxRowsOf(l: ReadLimit): Option[Long] = l match {
      case m: ReadMaxRows => Some(m.maxRows())
      case c: CompositeReadLimit =>
        c.getReadLimits.toSeq.flatMap(maxRowsOf(_)).minOption
      case _ => None
    }
    EventOffset(maxRowsOf(limit).fold(cap)(n => math.min(cap, s + n)))
  }
  override def reportLatestOffset(): Offset = EventOffset(hi)

  // Offset-range pruning: identical chunk arithmetic to the batch path.
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    EventSource.partitionsFor(
      start.asInstanceOf[EventOffset].id, end.asInstanceOf[EventOffset].id, chunk)
  override def createReaderFactory(): PartitionReaderFactory =
    new EventReaderFactory(required)

  // Rows below a committed offset are immutable history; nothing to GC.
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class EventRange(lo: Long, hi: Long) extends InputPartition

class EventReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val EventRange(lo, hi) = partition.asInstanceOf[EventRange]
    // resolve the projection ONCE per partition, not per row
    val cols: Array[Long => Any] = required.fieldNames.map {
      case "event_id" => (id: Long) => id
      case "ts" => (id: Long) => EventSource.tsMicros(id)
      case "user_id" => (id: Long) => EventSource.userId(id)
      case "event_type" => (id: Long) => UTF8String.fromString(EventSource.eventType(id))
      case "payload" => (id: Long) => UTF8String.fromString(EventSource.payload(id))
    }
    new PartitionReader[InternalRow] {
      private var id = lo - 1
      // one reusable backing array + row per partition; the consumer
      // copies (unsafe projection) before buffering, per DSv2 contract
      private val values = new Array[Any](cols.length)
      private val row = new GenericInternalRow(values)
      override def next(): Boolean = { id += 1; id < hi }
      override def get(): InternalRow = {
        var i = 0
        while (i < cols.length) { values(i) = cols(i)(id); i += 1 }
        row
      }
      override def close(): Unit = ()
    }
  }
}
