package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
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
  * The rows here are deterministic functions of `event_id` (this
  * container has no live broker), which makes the connector's pushdown
  * and pruning behavior testable exactly: the spec asserts planned
  * partition counts shrink under pushed range filters, non-pushable
  * predicates still apply as residuals, and values match the formulas.
  *
  * Usage:
  *   spark.read.format("graftevents")
  *     .option("events", 100000).option("chunk", 4096).load()
  *
  * Wiring: registered under the short name via DataSourceRegister
  * (META-INF/services), capabilities = BATCH_READ, one [[EventRange]]
  * per planned chunk, readers are per-partition and allocation-free per
  * row beyond the InternalRow.
  */
class EventSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graftevents"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val events = Option(properties.get("events")).map(_.toLong).getOrElse(10000L)
    val chunk = Option(properties.get("chunk")).map(_.toLong).getOrElse(1024L)
    new EventTable(events, math.max(1L, chunk))
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

  /** The deterministic row formulas — mirrored by the spec. */
  def tsMicros(id: Long): Long = baseMicros + id * 60000000L // 1/min
  def userId(id: Long): Long = id % 97
  def eventType(id: Long): String = types((id % 3).toInt)
  def payload(id: Long): String = s"""{"event":$id,"u":${userId(id)}}"""
}

class EventTable(events: Long, chunk: Long) extends Table with SupportsRead {
  override def name(): String = s"graftevents($events)"
  override def schema(): StructType = EventSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventScanBuilder(events, chunk)
}

/** Consumes event_id range predicates; everything else stays a residual
  * Catalyst filter (returned from pushFilters), so correctness never
  * depends on what the source understands. */
class EventScanBuilder(events: Long, chunk: Long) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L                  // inclusive
  private var hi = events              // exclusive
  private var pushed = Array.empty[Filter]
  private var required = EventSource.schema

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
  override def build(): Scan = new EventScan(lo, math.max(lo, hi), chunk, required)
}

class EventScan(lo: Long, hi: Long, chunk: Long, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftevents range=[$lo,$hi) chunk=$chunk cols=${required.fieldNames.mkString(",")}"
  // partition planning AFTER pushdown: only chunks intersecting the
  // pushed range exist — the pruning the spec pins
  override def planInputPartitions(): Array[InputPartition] = {
    val first = lo / chunk
    val last = if (hi <= lo) first - 1 else (hi - 1) / chunk
    (first to last).map { c =>
      EventRange(math.max(lo, c * chunk), math.min(hi, (c + 1) * chunk))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new EventReaderFactory(required)
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
      override def next(): Boolean = { id += 1; id < hi }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map(f => f(id)))
      override def close(): Unit = ()
    }
  }
}
