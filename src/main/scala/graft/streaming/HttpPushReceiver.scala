package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S1 over real HTTP — the push half of the reference's transport: Gmail
  * Pub/Sub delivers notifications as HTTP POSTs to a webhook
  * (deployment/api/gmail_pubsub.tf:7-22 wires the topic; api/main.py:235-249
  * receives the push). This receiver is that webhook as a Spark ingest
  * edge:
  *
  *  POST /push ──▶ durable spool file (tmp + atomic rename) ──▶ 200 OK
  *                                 │
  *                `readStream.json(spool)` — Spark's file source tracks
  *                processed files in the checkpoint, so every spooled
  *                message enters the stream EXACTLY once across restarts.
  *
  * Semantics match the bus faithfully: Pub/Sub push is AT-LEAST-ONCE
  * (redeliveries happen), so the receiver spools duplicates as distinct
  * files and ACKs only after the rename — a crash before the rename means
  * no ACK, the bus redelivers, nothing is lost. Dedupe belongs downstream
  * in the monotone watermark guard (StreamOps), exactly where the
  * reference does it (`last_history_id`, api/main.py:269-273).
  *
  * The ACK-after-durable ordering is the load-bearing property: an
  * in-memory queue would ACK messages a driver crash then silently drops.
  * Scale: the receiver is a thin edge (one per ingest endpoint); the
  * heavy lifting — parse, guard, correlate — happens in the distributed
  * stream behind it, and the spool dir can be object storage in
  * production.
  */
class HttpPushReceiver(spoolDir: String, port: Int = 0) {
  // Resume the spool sequence PAST anything already on disk: a fresh
  // receiver over an existing spool (the restart flow) restarting at 0
  // would silently OVERWRITE spooled files via ATOMIC_MOVE — and the
  // file-stream checkpoint has already marked those names processed, so
  // the new message would be ACKed yet never enter the stream.
  private val seq = new java.util.concurrent.atomic.AtomicLong(
    Option(new java.io.File(spoolDir).listFiles()).toSeq.flatten
      .map(_.getName)
      // guarded parse: a foreign/corrupt file in the spool dir (e.g.
      // msg_readme.json) must be ignored, not fatal to the constructor
      .flatMap { n =>
        if (n.startsWith("msg_") && n.endsWith(".json"))
          scala.util.Try(n.stripPrefix("msg_").stripSuffix(".json").toLong).toOption
        else None }
      .foldLeft(0L)(math.max))
  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/push", { exchange =>
    try {
      val body = exchange.getRequestBody.readAllBytes()
      val n = seq.incrementAndGet()
      // zero-padded sequence keeps spool listing order = arrival order
      val name = f"msg_$n%012d.json"
      val tmp = java.nio.file.Paths.get(spoolDir, s".$name.tmp")
      // DSYNC: the BYTES are on stable storage before the rename — an
      // ACK backed only by the page cache is the in-memory-queue failure
      // mode the class contract exists to rule out (power loss after a
      // cached ACK would lose a message the bus will never redeliver)
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
        java.nio.file.StandardOpenOption.DSYNC)
      try ch.write(java.nio.ByteBuffer.wrap(body)) finally ch.close()
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(spoolDir, name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      // ...and the DIRECTORY ENTRY too: the rename itself lives in the
      // directory inode, which has its own writeback
      // Directory fsync is best-effort (the Lucene IOUtils.fsync
      // convention): opening/forcing a directory channel throws on
      // Windows and some network filesystems, and a failure here must
      // not turn an already-durably-renamed message into a 500 NACK.
      // The file-DATA sync above stays strict.
      try {
        val dch = java.nio.channels.FileChannel.open(
          java.nio.file.Paths.get(spoolDir),
          java.nio.file.StandardOpenOption.READ)
        try dch.force(true) finally dch.close()
      } catch { case _: java.io.IOException => () }
      // ACK only now: the message is durable — a crash anywhere above
      // leaves it un-ACKed and the bus redelivers (at-least-once kept)
      val resp = "{\"ok\":true}".getBytes("UTF-8")
      exchange.sendResponseHeaders(200, resp.length)
      exchange.getResponseBody.write(resp)
    } catch {
      case _: Throwable =>
        exchange.sendResponseHeaders(500, -1) // NACK → bus retries
    } finally exchange.close()
  })
  server.start()

  def endpoint: String =
    s"http://127.0.0.1:${server.getAddress.getPort}/push"

  def stop(): Unit = server.stop(0)
}

object HttpPushReceiver {
  /** The streaming read over a receiver's spool: schema-explicit JSON
    * (never inference — a production stream cannot re-list history to
    * guess types), exactly-once per file via the source's checkpointed
    * file log. `maxFilesPerTrigger` is the admission control knob. */
  def stream(s: SparkSession, spoolDir: String, schema: StructType,
      maxFilesPerTrigger: Int = 1000): DataFrame =
    s.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(spoolDir)
}
