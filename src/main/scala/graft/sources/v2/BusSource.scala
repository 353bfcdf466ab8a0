package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.FileBus

/** "graftbus" — a message-BUS-class connector (the Kafka shape) over a
  * directory-backed partitioned log, modeling the semantics the
  * reference's Pub/Sub transport rides on (deployment/api/
  * gmail_pubsub.tf:7-22) without a broker client: a topic is `P`
  * append-only partitions, each a sequence of immutable SEGMENT files
  * named by their first offset and record count ([[FileBus]] writes
  * them with the spool durability discipline — tmp + DSYNC + atomic
  * rename); a consumer's position is a PER-PARTITION OFFSET VECTOR
  * checkpointed as the streaming offset, so resume/replay follow
  * exactly the Kafka consumer-group contract: per-partition order is
  * total and gapless, cross-partition order is undefined.
  *
  * Scale shape: one Spark input partition per LOG partition — consumer
  * parallelism scales with the topic's partition count exactly like a
  * Kafka consumer group; a micro-batch plans only partitions with new
  * records, and each reader opens only the segment files overlapping
  * its [from, until) slice (segment names carry the offset range, so
  * slicing never reads dead bytes). Admission control
  * (`maxPerTrigger`) bounds a batch's total rows across partitions —
  * the `maxOffsetsPerTrigger` analog — allocated deterministically in
  * ascending partition order.
  *
  * Schema: (partition INT, offset LONG, key STRING, value STRING).
  */
class BusSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftbus"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BusSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // the engine hands getTable the CASE-PRESERVING map — wrap it back
    // so "MaxPerTrigger" is not silently ignored (unbounded first batch)
    val opts = new CaseInsensitiveStringMap(properties)
    val path = Option(opts.get("path")).getOrElse(
      throw new IllegalArgumentException("graftbus requires a path option"))
    val maxPerTrigger = Option(opts.get("maxpertrigger")).map(_.toLong)
    new BusTable(path, maxPerTrigger)
  }
}

object BusSource {
  val schema: StructType = new StructType()
    .add("partition", IntegerType)
    .add("offset", LongType)
    .add("key", StringType)
    .add("value", StringType)
}

class BusTable(path: String, maxPerTrigger: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"graftbus($path)"
  override def schema(): StructType = BusSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new BusScan(path, maxPerTrigger)
    }
}

class BusScan(path: String, maxPerTrigger: Option[Long]) extends Scan with Batch {
  override def readSchema(): StructType = BusSource.schema
  override def description(): String = s"graftbus $path"
  // batch read: the whole log as of planning time (verification surface)
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val ends = FileBus.endOffsets(path)
    ends.toArray.sortBy(_._1).collect {
      case (p, end) if end > 0 => BusSlice(path, p, 0L, end): InputPartition
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new BusReaderFactory
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BusMicroBatchStream(path, maxPerTrigger)
}

/** Streaming offset: the per-partition next-offset vector, JSON-encoded
  * with sorted keys so equal vectors serialize identically (offset
  * equality is string equality in the streaming engine). */
case class BusOffset(next: Map[Int, Long]) extends Offset {
  override def json(): String =
    next.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p":$o""" }.mkString("{", ",", "}")
}

object BusOffset {
  def parse(json: String): BusOffset = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) BusOffset(Map.empty)
    else BusOffset(body.split(",").map { kv =>
      val Array(k, v) = kv.split(":")
      k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
    }.toMap)
  }
}

class BusMicroBatchStream(path: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // AvailableNow must drain to a SNAPSHOT taken at prepare time — new
  // segments landing mid-drain belong to the next run (without the
  // interface the engine degrades to one unbounded batch; the
  // EventSource lesson)
  @volatile private var availableNowTarget: Option[Map[Int, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(FileBus.endOffsets(path))

  override def initialOffset(): Offset =
    BusOffset(FileBus.partitionIds(path).map(_ -> 0L).toMap)
  override def deserializeOffset(json: String): Offset = BusOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(n => ReadLimit.maxRows(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-controlled entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[BusOffset].next
    val avail = availableNowTarget.getOrElse(FileBus.endOffsets(path))
    def maxRowsOf(l: ReadLimit): Option[Long] = l match {
      case m: ReadMaxRows => Some(m.maxRows())
      case c: CompositeReadLimit =>
        c.getReadLimits.toSeq.flatMap(maxRowsOf(_)).minOption
      case _ => None
    }
    // deterministic admission, starvation-free: the budget is split
    // across partitions in proportion to their lag (Kafka's
    // maxOffsetsPerTrigger discipline — a greedy ascending-p fill would
    // let one hot partition starve all higher ones forever under a
    // ProcessingTime trigger), with the integer remainder granted to
    // the largest-lag partitions first (ties: ascending p) — the
    // most-behind partitions are always served, so every partition's
    // lag drains even when budget < partition count
    val budget = maxRowsOf(limit).getOrElse(Long.MaxValue)
    val lags = avail.toSeq.sortBy(_._1).map { case (p, end) =>
      (p, s.getOrElse(p, 0L), math.max(end - s.getOrElse(p, 0L), 0L))
    }
    val total = lags.map(_._3).sum
    val takes: Map[Int, Long] =
      if (total <= budget) lags.map { case (p, _, lag) => p -> lag }.toMap
      else {
        val base = lags.map { case (p, _, lag) =>
          // lag/total <= 1 so lag*budget can overflow only if budget is
          // huge — but then total <= budget took the branch above
          p -> lag * budget / total
        }.toMap
        var rem = budget - base.values.sum
        // the integer remainder rotates round-robin over the lagging
        // partitions, keyed by the total rows already admitted (derived
        // from the start vector, hence deterministic across replays of
        // the same batch): a small-lag partition whose proportional
        // share floors to 0 is still served within |partitions|
        // batches, no matter how hard a hot peer floods — bounded
        // delay, where a largest-remainder rule would let a mid-size
        // partition outbid a tiny one indefinitely
        val rot = lags.map(_._2).sum
        val order = lags.sortBy { case (p, _, _) =>
          (math.floorMod(p - rot, lags.size.toLong), p)
        }
        val bonus = order.collect {
          case (p, _, lag) if rem > 0 && base(p) < lag => rem -= 1; p -> 1L
        }.toMap
        base.map { case (p, b) => p -> (b + bonus.getOrElse(p, 0L)) }
      }
    val next = lags.map { case (p, from, _) =>
      p -> (from + takes.getOrElse(p, 0L))
    }.toMap
    // partitions present in the checkpoint but not on disk (yet) keep
    // their position rather than vanishing from the vector
    BusOffset(s ++ next)
  }
  override def reportLatestOffset(): Offset = BusOffset(FileBus.endOffsets(path))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BusOffset].next
    val e = end.asInstanceOf[BusOffset].next
    e.toSeq.sortBy(_._1).collect {
      case (p, until) if until > s.getOrElse(p, 0L) =>
        BusSlice(path, p, s.getOrElse(p, 0L), until): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new BusReaderFactory

  // committed offsets are consumer-group state (the checkpoint); the
  // log itself is immutable history — retention is a separate concern
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One log partition's [from, until) slice. */
case class BusSlice(path: String, partition: Int, from: Long, until: Long)
    extends InputPartition

class BusReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val BusSlice(path, p, from, until) = partition.asInstanceOf[BusSlice]
    // segment names carry (firstOffset, count): open only segments
    // overlapping the slice — never the whole partition
    val segs = FileBus.segments(path, p)
      .filter { case (first, count, _) => first < until && first + count > from }
    val it = segs.iterator.flatMap { case (first, _, file) =>
      FileBus.readSegment(file).zipWithIndex.collect {
        case ((k, v), i) if first + i >= from && first + i < until =>
          (first + i, k, v)
      }
    }
    new PartitionReader[InternalRow] {
      private val values = new Array[Any](4)
      private val row = new GenericInternalRow(values)
      // DSv2 contract: next() advances, get() is a pure read of the
      // current row (callable any number of times between next()s)
      override def next(): Boolean =
        if (it.hasNext) {
          val (off, k, v) = it.next()
          values(0) = p
          values(1) = off
          values(2) = if (k == null) null else UTF8String.fromString(k)
          values(3) = if (v == null) null else UTF8String.fromString(v)
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
