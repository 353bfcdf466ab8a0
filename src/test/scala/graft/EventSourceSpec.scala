package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.v2.EventSource

class EventSourceSpec extends SparkSpecBase {

  private def events(n: Long, chunk: Long = 100L): DataFrame =
    spark.read.format("graftevents")
      .option("events", n).option("chunk", chunk).load()

  test("rows match the deterministic formulas (full schema)") {
    val rows = events(50).orderBy("event_id").collect()
    assert(rows.length == 50)
    rows.zipWithIndex.foreach { case (r, i) =>
      val id = i.toLong
      assert(r.getLong(0) == id)
      assert(r.getAs[Timestamp]("ts").getTime ==
        EventSource.tsMicros(id) / 1000)
      assert(r.getAs[Long]("user_id") == EventSource.userId(id))
      assert(r.getAs[String]("event_type") == EventSource.eventType(id))
      assert(r.getAs[String]("payload") == EventSource.payload(id))
    }
  }

  test("event_id range filters prune planned partitions at the source") {
    val full = events(1000, chunk = 100)
    assert(full.rdd.getNumPartitions == 10)
    val sliced = events(1000, chunk = 100)
      .filter(col("event_id") >= 850L && col("event_id") < 960L)
    // chunks [800,900) and [900,1000) intersect [850,960) → 2 partitions
    assert(sliced.rdd.getNumPartitions == 2,
      s"expected 2 pruned partitions, got ${sliced.rdd.getNumPartitions}")
    assert(sliced.count() == 110)
    assert(sliced.agg(min("event_id"), max("event_id")).head() ==
      org.apache.spark.sql.Row(850L, 959L))
    // the pushed range is visible in the scan description
    val p = sliced.queryExecution.executedPlan.toString
    assert(p.contains("graftevents range=[850,960)"), s"pushdown missing:\n$p")
  }

  test("non-pushable predicates still apply as residual filters") {
    val r = events(300)
      .filter(col("event_id") < 30L && col("event_type") === "view")
      .collect()
    // ids 0,3,6,... are 'view' (id % 3 == 0)
    assert(r.map(_.getLong(0)).sorted.toSeq == (0L until 30L by 3).toSeq)
  }

  test("option names are case-insensitive end to end (Columns, Events)") {
    // inferSchema gets a CaseInsensitiveStringMap but getTable a
    // case-sensitive one — a mixed-case option honored by one and
    // dropped by the other would silently return the wrong shape
    val df = spark.read.format("graftevents")
      .option("Events", 10L).option("Columns", "event_id,user_id").load()
    assert(df.columns.toSeq == Seq("event_id", "user_id"))
    assert(df.count() == 10)
  }

  test("column pruning reaches the reader (scan emits only required cols)") {
    val df = events(100).select("event_id", "user_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cols=event_id,user_id"),
      s"reader not pruned to the projection:\n$p")
    assert(df.columns.toSeq == Seq("event_id", "user_id"))
    assert(df.count() == 100)
  }

  test("the source composes with ordinary relational plans") {
    // per-type counts over a pushed slice — the S1 envelope feeding the
    // usual aggregation spine
    val agg = events(3000)
      .filter(col("event_id") >= 600L)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg.values.sum == 2400L)
    assert(agg("view") == 800L && agg("click") == 800L && agg("purchase") == 800L)
  }

  // ---- MICRO_BATCH_READ: the connector-level CDC surface (SURVEY S1/S2) ----

  import org.apache.spark.sql.streaming.Trigger
  import graft.sources.v2.{EventMicroBatchStream, EventOffset}

  private def streamEvents(n: Long, chunk: Long, maxPerTrigger: Long) =
    spark.readStream.format("graftevents")
      .option("events", n).option("chunk", chunk)
      .option("maxPerTrigger", maxPerTrigger).load()

  private def drainedIds(outDir: String): Seq[Long] =
    spark.read.parquet(outDir).select("event_id").collect()
      .map(_.getLong(0)).toSeq.sorted

  test("streaming: admission control bounds every micro-batch (maxPerTrigger)") {
    val out = java.nio.file.Files.createTempDirectory("ev_mb_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ev_mb_ckpt").toString
    val q = streamEvents(1000, chunk = 100, maxPerTrigger = 137)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val perBatch = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(perBatch.nonEmpty && perBatch.forall(_ <= 137),
      s"admission violated: $perBatch")
    assert(perBatch.length >= 8, s"expected >=8 admitted batches, got $perBatch")
    assert(drainedIds(out) == (0L until 1000L), "drain must cover every id once")
  }

  test("streaming: kill-and-restart resumes from checkpointed offsets exactly once") {
    val out = java.nio.file.Files.createTempDirectory("ev_rs_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ev_rs_ckpt").toString
    // phase 1: a one-hour trigger interval fires exactly ONE admitted
    // batch (113 rows) before the kill — deterministic, no race against
    // a fast drain (ProcessingTime(0) could finish all 9 batches before
    // a polling loop saw them)
    val q1 = streamEvents(1000, chunk = 100, maxPerTrigger = 113)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(3600000L)).start()
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop() // the "kill": offsets for completed batches are checkpointed
    val afterKill = drainedIds(out)
    assert(afterKill == (0L until 113L),
      s"exactly the one admitted batch should be committed, got ${afterKill.size}")
    // phase 2: restart against the same checkpoint drains the remainder
    val q2 = streamEvents(1000, chunk = 100, maxPerTrigger = 113)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    assert(drainedIds(out) == (0L until 1000L),
      "restart must resume at the watermark: every event_id exactly once")
  }

  test("streaming: growing the backlog and restarting picks up only new ids") {
    // run 1 drains a 600-id backlog; run 2 sees the source grown to 1000
    // and must emit exactly the 400 new ids — the reference's
    // startHistoryId=last_history_id incremental scan (api/main.py:278-287)
    val out = java.nio.file.Files.createTempDirectory("ev_gr_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ev_gr_ckpt").toString
    def run(n: Long): Unit = {
      val q = streamEvents(n, chunk = 100, maxPerTrigger = 250)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run(600)
    assert(drainedIds(out) == (0L until 600L))
    run(1000)
    assert(drainedIds(out) == (0L until 1000L),
      "second run must append exactly ids 600..999, no re-reads")
  }

  test("streaming: 'columns' option narrows the micro-batch read schema") {
    // Spark 4 won't push V2 column pruning into MICRO_BATCH scans, so the
    // connector honors an explicit projection option instead: the table
    // schema itself narrows, and the micro-batch reader materializes ONLY
    // the requested fields (pinned below on the reader's InternalRow).
    val df = spark.readStream.format("graftevents")
      .option("events", 300).option("chunk", 100)
      .option("maxPerTrigger", 100)
      .option("columns", "event_id,user_id").load()
    assert(df.schema.fieldNames.toSeq == Seq("event_id", "user_id"))
    val out = java.nio.file.Files.createTempDirectory("ev_col_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ev_col_ckpt").toString
    val q = df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.read.parquet(out)
    assert(got.schema.fieldNames.sorted.toSeq == Seq("event_id", "user_id"))
    assert(got.count() == 300)
    assert(got.filter(col("user_id") =!= pmod(col("event_id"), lit(97L)))
      .count() == 0, "narrowed columns must still carry the row formulas")
    // reader-level pin: the micro-batch PartitionReader's rows carry
    // exactly the projected fields, not the full 5-column envelope
    val t = new EventSource().getTable(EventSource.schema, Array.empty,
        java.util.Map.of("events", "300", "chunk", "100",
          "columns", "event_id,user_id"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val mb = t.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toMicroBatchStream("unused")
    val parts = mb.planInputPartitions(EventOffset(0L), EventOffset(100L))
    val reader = mb.createReaderFactory().createReader(parts(0))
    assert(reader.next() && reader.get().numFields == 2,
      "micro-batch reader must materialize only the projected columns")
    reader.close()
    // the batch path honors the same option (requested order preserved)
    val b = spark.read.format("graftevents")
      .option("events", 10).option("columns", "payload,event_id").load()
    assert(b.schema.fieldNames.toSeq == Seq("payload", "event_id"))
    assert(b.count() == 10)
    // unknown names are rejected loudly, naming the offender
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graftevents")
        .option("events", 10).option("columns", "event_id,nope").load()
    }
    assert(e.getMessage.contains("nope"))
  }

  test("streaming: admission overload serves ProcessingTime (no-arg stays loud)") {
    // The no-arg latestOffset is dead code kept loud; the engine must
    // dispatch the admission-controlled overload because the stream
    // implements SupportsAdmissionControl. Pin both halves: the throw,
    // and a ProcessingTime drain that would FAIL with
    // UnsupportedOperationException if a Spark version changed dispatch.
    // (The AvailableNow half is pinned by the admission-control test
    // above — its 8+ bounded batches only happen via the overload.)
    val stream = new EventMicroBatchStream(0L, 100L, 10L,
      EventSource.schema, maxPerTrigger = Some(10L))
    intercept[UnsupportedOperationException] { stream.latestOffset() }
    val q = streamEvents(500, chunk = 100, maxPerTrigger = 100)
      .writeStream.format("memory").queryName("ev_pt_drain")
      .trigger(Trigger.ProcessingTime(0L)).start()
    val deadline = System.currentTimeMillis() + 120000
    while (spark.table("ev_pt_drain").count() < 500 &&
        q.exception.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    q.stop()
    assert(q.exception.isEmpty, s"ProcessingTime drain failed: ${q.exception}")
    assert(spark.table("ev_pt_drain").count() == 500)
    val perBatch = q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(perBatch.forall(_ <= 100) && perBatch.length >= 5,
      s"expected >=5 admitted batches of <=100 rows, got $perBatch")
  }

  test("streaming: per-batch partition planning is offset-range pruned") {
    // same chunk arithmetic as the pushed batch path, applied per batch:
    // offsets [850,960) over chunk=100 plan exactly 2 partitions
    val stream = new EventMicroBatchStream(0L, 1000L, 100L,
      EventSource.schema, maxPerTrigger = Some(110L))
    val parts = stream.planInputPartitions(EventOffset(850L), EventOffset(960L))
    assert(parts.length == 2, s"expected 2 pruned partitions, got ${parts.length}")
    // admission-controlled latestOffset advances by at most maxPerTrigger
    val lim = stream.getDefaultReadLimit
    assert(stream.latestOffset(EventOffset(850L), lim) == EventOffset(960L))
    assert(stream.latestOffset(EventOffset(950L), lim) == EventOffset(1000L))
    // startId bounds the stream's initial offset (CDC "start from here")
    val t = new EventSource().getTable(EventSource.schema,
        Array.empty, java.util.Map.of("events", "1000", "startId", "500"))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
    val mb = t.newScanBuilder(
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
      .build().toMicroBatchStream("unused")
    assert(mb.initialOffset() == EventOffset(500L))
    // offsets round-trip through their checkpoint JSON form
    assert(mb.deserializeOffset(EventOffset(777L).json()) == EventOffset(777L))
    // composite read limits (AvailableNow wrapping) take the tightest rows cap
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val composite = ReadLimit.compositeLimit(
      Array(ReadLimit.allAvailable(), ReadLimit.maxRows(40L)))
    assert(stream.latestOffset(EventOffset(0L), composite) == EventOffset(40L))
  }
}
