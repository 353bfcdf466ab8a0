package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** The "graftbus" partitioned-log connector — the Kafka-contract specs:
  * per-partition total gapless order, offset-vector resume, admission
  * control, independent consumer groups, and the exactly-once streaming
  * producer (torn-batch replay converges via segment tags). */
class BusSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def newTopic(parts: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("bus_topic").toString
    FileBus.createTopic(dir, parts)
    dir
  }

  test("segment IO runs through the Hadoop FS API: an explicit file: URI topic works end-to-end") {
    // the round-13 port: FileBus speaks FileSystem/FileContext, not
    // java.nio-on-a-POSIX-path — so a topic addressed by URI (the shape
    // hdfs:// and s3a:// deployments use) must behave identically
    val dir = java.nio.file.Files.createTempDirectory("bus_uri").toString
    val topic = s"file://$dir"
    FileBus.createTopic(topic, 2)
    FileBus.produce(topic, (0 until 10).map(i => (s"k$i", s"v$i")), tag = "t0")
    FileBus.produce(topic, (0 until 10).map(i => (s"k$i", s"w$i")), tag = "t0")
    // second same-tag produce is a no-op (idempotency through the FS API)
    assert(FileBus.endOffsets(topic).values.sum == 10L)
    // no checksum sidecars strand beside published segments (raw-FS
    // write path; a .crc next to a segment means the layers remixed)
    val leaked = new java.io.File(dir).listFiles().flatMap(p =>
      Option(p.listFiles()).toSeq.flatten).filter(_.getName.endsWith(".crc"))
    assert(leaked.isEmpty, s"checksum sidecars leaked: ${leaked.toSeq}")
    val out = spark.readStream.format("graftbus").option("path", topic)
      .load()
    val q = out.writeStream.format("memory").queryName("bus_uri")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("bus_uri").select($"key", $"value")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == (0 until 10).map(i => (s"k$i", s"v$i")).sorted.toSeq)
  }

  test("produce/consume: every record once, per-partition offsets dense, key order kept") {
    val topic = newTopic(4)
    // three producer calls = three segments per touched partition;
    // same key → same partition → per-key order is per-partition order
    val batches = Seq(
      (0 until 20).map(i => (s"k${i % 7}", s"a$i")),
      (0 until 15).map(i => (s"k${i % 7}", s"b$i")),
      (0 until 9).map(i => (s"k${i % 7}", s"c$i")))
    batches.zipWithIndex.foreach { case (b, i) =>
      FileBus.produce(topic, b, tag = s"t$i") }

    val out = spark.readStream.format("graftbus").option("path", topic)
      .load()
    val q = out.writeStream.format("memory").queryName("bus_all")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("bus_all")
      .select($"partition", $"offset", $"key", $"value")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(rows.length == 44, s"expected 44 records, got ${rows.length}")
    // dense gapless offsets per partition
    rows.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (0L until rs.length).toSeq,
        s"partition $p offsets not dense: ${rs.map(_._2).sorted.toSeq}")
    }
    // per-key order = produce order (same key, same partition, offsets
    // ascending in append order)
    val expected = batches.flatten
    (0 until 7).map(i => s"k$i").foreach { k =>
      val got = rows.filter(_._3 == k).sortBy(_._2).map(_._4).toSeq
      val want = expected.filter(_._1 == k).map(_._2)
      assert(got == want, s"key $k order: got $got want $want")
    }
    // every record routed by the stable hash
    rows.foreach { case (p, _, k, _) =>
      assert(p == FileBus.partitionOf(k, 4)) }
  }

  test("admission control: maxPerTrigger caps each micro-batch across partitions") {
    val topic = newTopic(3)
    FileBus.produce(topic, (0 until 50).map(i => (s"k$i", s"v$i")), tag = "t0")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graftbus").option("path", topic)
      .option("maxPerTrigger", "7").load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bus_adm_ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sizes.synchronized { sizes += b.count() }; ()
      }.start()
    q.awaitTermination(120000)
    assert(sizes.sum == 50, s"all records must drain, got ${sizes.sum}")
    assert(sizes.forall(_ <= 7), s"a batch exceeded the admission cap: $sizes")
    assert(sizes.length >= 8, s"expected >= ceil(50/7) batches, got $sizes")
  }

  test("offset-vector resume: kill mid-drain, produce more, restart — exactly once") {
    val topic = newTopic(2)
    val ckpt = java.nio.file.Files.createTempDirectory("bus_resume").toString
    FileBus.produce(topic, (0 until 20).map(i => (s"k$i", s"v$i")), tag = "t0")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def consume(crashAtBatch: Long): org.apache.spark.sql.streaming.StreamingQuery =
      spark.readStream.format("graftbus").option("path", topic)
        .option("maxPerTrigger", "6").load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          // crash BEFORE recording: the torn batch replays on restart
          if (id == crashAtBatch)
            throw new RuntimeException("injected kill mid-drain")
          b.select(col("value")).collect().foreach(r => got.add(r.getString(0)))
          ()
        }.start()
    // run 1: batch 0 (cap = 6 rows) commits, batch 1 crashes
    val q1 = consume(crashAtBatch = 1L)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable(); q1.awaitTermination()
    }
    assert(got.size == 6, s"first run should commit exactly the cap, got ${got.size}")
    // run 2: the uncommitted batch 1 REPLAYS from the offset vector,
    // then the rest — including records produced after the kill
    FileBus.produce(topic, (20 until 25).map(i => (s"k$i", s"v$i")), tag = "t1")
    val q2 = consume(crashAtBatch = -1L)
    q2.awaitTermination(120000)
    val vals = got.toArray(Array.empty[String]).toSeq
    assert(vals.length == 25, s"expected 25 total, got ${vals.length}: $vals")
    assert(vals.distinct.length == 25, "resume duplicated or lost records")
  }

  test("independent consumer groups: a fresh checkpoint re-reads from offset zero") {
    val topic = newTopic(2)
    FileBus.produce(topic, (0 until 12).map(i => (s"k$i", s"v$i")), tag = "t0")
    def drain(name: String): Long = {
      val q = spark.readStream.format("graftbus").option("path", topic)
        .load().writeStream.format("memory").queryName(name)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"bus_$name").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.table(name).count()
    }
    assert(drain("bus_g1") == 12)
    assert(drain("bus_g2") == 12, "a second group must re-read the full log")
  }

  test("batch read mirrors the streamed log") {
    val topic = newTopic(3)
    FileBus.produce(topic, (0 until 30).map(i => (s"k$i", s"v$i")), tag = "t0")
    val batch = spark.read.format("graftbus").option("path", topic).load()
    assert(batch.count() == 30)
    assert(batch.select($"partition").distinct().count() == 3)
    // empty-partition topics plan only non-empty slices
    val topic2 = newTopic(8)
    FileBus.produce(topic2, Seq(("only", "one")), tag = "t0")
    assert(spark.read.format("graftbus").option("path", topic2).load()
      .count() == 1)
  }

  test("exactly-once streaming producer: torn-batch replay converges via segment tags") {
    val topic = newTopic(3)
    val ckpt = java.nio.file.Files.createTempDirectory("bus_sink_ckpt").toString
    val input = MemoryStream[(String, String)](spark)
    val df = input.toDS().toDF("key", "value")

    // run 1: crash AFTER the segment appends, BEFORE the checkpoint
    // commit — the torn window
    val crashed = new AtomicInteger(0)
    val q1 = FileBus.sink(df, topic, ckpt,
      afterWrite = _ => {
        if (crashed.incrementAndGet() == 1)
          throw new RuntimeException("injected crash in the torn window")
      })
    input.addData(("a", "1"), ("b", "2"), ("c", "3"), ("d", "4"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable(); q1.awaitTermination()
    }
    // the appends happened; the batch will replay
    assert(FileBus.endOffsets(topic).values.sum == 4L)

    // run 2: replay the torn batch (tag-skip), then new data
    val q2 = FileBus.sink(df, topic, ckpt)
    input.addData(("a", "5"), ("e", "6"))
    q2.processAllAvailable()
    q2.stop()
    val all = spark.read.format("graftbus").option("path", topic).load()
      .select($"key", $"value").as[(String, String)].collect().toSeq
    assert(all.length == 6, s"expected 6 records exactly-once, got $all")
    assert(all.toSet ==
      Set(("a", "1"), ("b", "2"), ("c", "3"), ("d", "4"), ("a", "5"), ("e", "6")))
    // per-key ordering survived the crash: a's two values in produce order
    val aVals = spark.read.format("graftbus").option("path", topic).load()
      .filter($"key" === "a").orderBy($"offset")
      .select($"value").as[String].collect().toSeq
    assert(aVals == Seq("1", "5"))
  }

  test("admission is proportional: a hot partition cannot starve the others") {
    val topic = newTopic(3)
    // p-lags 90 / 9 / 1 (keys chosen per partition), budget 10 — the
    // old greedy ascending-p fill would admit 10 from the hot partition
    // and zero from the rest, forever under continuous production
    def keyFor(p: Int): String =
      Iterator.from(0).map(i => s"k$i")
        .find(k => FileBus.partitionOf(k, 3) == p).get
    FileBus.appendSegment(topic, 0, (0 until 90).map(i => (keyFor(0), s"a$i")), "t0")
    FileBus.appendSegment(topic, 1, (0 until 9).map(i => (keyFor(1), s"b$i")), "t0")
    FileBus.appendSegment(topic, 2, Seq((keyFor(2), "c0")), "t0")
    val stream = new graft.sources.v2.BusMicroBatchStream(topic, Some(10L))
    val limit =
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(10L)
    var pos = stream.initialOffset()
    // drive 12 admission rounds while the hot partition keeps producing
    // 10 rows/round (production = budget: the old greedy fill would pin
    // the whole budget on p0 forever and p1/p2 would never drain)
    (0 until 12).foreach { round =>
      FileBus.appendSegment(topic, 0,
        (0 until 10).map(i => (keyFor(0), s"hot${round}_$i")), s"h$round")
      val end = stream.latestOffset(pos, limit)
      val v = end.asInstanceOf[graft.sources.v2.BusOffset].next
      val prev = pos.asInstanceOf[graft.sources.v2.BusOffset].next
      assert(v.map { case (p, o) => o - prev.getOrElse(p, 0L) }.sum <= 10,
        s"budget exceeded in round $round: $prev -> $v")
      pos = end
    }
    val contended = pos.asInstanceOf[graft.sources.v2.BusOffset].next
    // bounded-delay service under perpetual contention: the remainder
    // rotation must have reached both small partitions several times
    assert(contended(2) == 1L,
      s"the 1-row partition must drain under a hot peer, got $contended")
    assert(contended(1) >= 3L,
      s"the 9-row partition must make steady progress, got $contended")
    assert(contended(0) > 90L,
      "the hot partition must still get most of the budget")
    // production stops: every partition must drain to its end offset
    var prev = Map.empty[Int, Long]
    var cur = contended
    while (cur != prev) {
      prev = cur
      pos = stream.latestOffset(pos, limit)
      cur = pos.asInstanceOf[graft.sources.v2.BusOffset].next
    }
    assert(cur == FileBus.endOffsets(topic),
      s"quiet rounds must drain everything: $cur")
  }

  test("segment tag idempotency compares the exact tag field, not a suffix") {
    val topic = newTopic(1)
    FileBus.appendSegment(topic, 0, Seq(("k", "first")), "x_1")
    // tag "1" is a SUFFIX of "x_1" — it must still append
    FileBus.appendSegment(topic, 0, Seq(("k", "second")), "1")
    // exact replays skip
    FileBus.appendSegment(topic, 0, Seq(("k", "dup")), "x_1")
    FileBus.appendSegment(topic, 0, Seq(("k", "dup")), "1")
    val vals = spark.read.format("graftbus").option("path", topic).load()
      .orderBy($"offset").select($"value").as[String].collect().toSeq
    assert(vals == Seq("first", "second"), s"got $vals")
    // default producer tags are full-entropy and never collide/skip
    FileBus.produce(topic, Seq(("k", "v1")))
    FileBus.produce(topic, Seq(("k", "v2")))
    assert(FileBus.endOffsets(topic)(0) == 4L)
  }

  test("option keys are case-insensitive (MaxPerTrigger is honored)") {
    val topic = newTopic(2)
    FileBus.produce(topic, (0 until 30).map(i => (s"k$i", s"v$i")), tag = "t0")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graftbus").option("path", topic)
      .option("MaxPerTrigger", "7").load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("bus_case_ckpt").toString)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sizes.synchronized { sizes += b.count() }; ()
      }.start()
    q.awaitTermination(120000)
    assert(sizes.sum == 30 && sizes.forall(_ <= 7),
      s"MaxPerTrigger ignored: $sizes")
  }

  test("partition reader honors the DSv2 next()/get() contract (get is a pure read)") {
    val topic = newTopic(1)
    FileBus.produce(topic, Seq(("a", "1"), ("b", "2"), ("c", "3")), tag = "t0")
    val reader = new graft.sources.v2.BusReaderFactory()
      .createReader(graft.sources.v2.BusSlice(topic, 0, 0L, 3L))
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    while (reader.next()) {
      val once = reader.get().getString(3).toString
      // a second get() between next()s must return the SAME row
      assert(reader.get().getString(3).toString == once)
      seen += once
    }
    reader.close()
    assert(seen.toSeq == Seq("1", "2", "3"),
      s"double get() skipped or repeated rows: $seen")
  }

  test("log survives foreign files and round-trips hostile record content") {
    val topic = newTopic(2)
    val hostile = Seq(
      ("quote\"key", "value with \"quotes\" and \\backslash"),
      ("tab\tkey", "line\nbreak\rand\ttab"),
      ("", "empty key routes to a stable partition"),
      ("k", """{"key":"looks","value":"like json"}"""),
      // Kafka's tombstone shapes: null value, null key, both
      ("tombstone-key", null),
      (null, "null key routes to partition 0"),
      (null, null),
      ("colon:key", "colon:value"))
    FileBus.produce(topic, hostile, tag = "t0")
    // a foreign file in a partition dir must be ignored, not fatal
    java.nio.file.Files.write(
      java.nio.file.Paths.get(topic, "p=0", "seg_README"), "junk".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(topic, "p=0", "other.jsonl"), "junk".getBytes)
    val got = spark.read.format("graftbus").option("path", topic).load()
      .select($"key", $"value").as[(String, String)].collect().toSet
    assert(got == hostile.toSet)
  }
}
