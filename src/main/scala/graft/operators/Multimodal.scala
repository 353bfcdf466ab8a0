package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11): media treated as opaque
  * `BINARY` payloads + a typed metadata struct, with decode / feature
  * extraction as a per-partition batch operator.
  *
  * The decode path is REAL, pure-JDK: PNG images encoded and decoded
  * through `javax.imageio`, WAV audio through RIFF chunk construction and
  * parsing, multi-frame GIF "video" through the ImageIO sequence writer
  * and `getNumImages` — see [[MediaCodec]]. Payload dimensions are
  * deterministic functions of `doc_id`, so the DuckDB oracle independently
  * derives the expected width/height/frame-count and the comparison
  * verifies the full byte round-trip (encode → binary column →
  * per-partition decode), not just the plumbing. Extraction is
  * partition-batched (`mapPartitions`, the Scala analog of `mapInPandas` —
  * one decoder init per partition, not per row) and the metadata-only
  * queries never deserialize the payload (column pruning drops it).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte],
      byte_len: Long,
      content_hash: String)

  /** Extracted features (the "decoded" view). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** Real, pure-JDK media codec. Encoders build genuinely valid files —
    * an ImageIO reader, a WAV player, or a GIF viewer would accept every
    * payload — and decoders parse the actual bytes (no shortcut through
    * the generator's formulas): PNG/GIF via `javax.imageio`, WAV via RIFF
    * chunk walking. The "feature" is an 8-bin intensity histogram over the
    * DECODED samples (pixels / PCM), L1-normalized — so a corrupted
    * payload changes the feature, unlike a metadata fake.
    *
    * Dimension conventions in [[MediaFeatures]]: images/video use
    * (width, height) in pixels and `n_frames` (1 for stills, GIF sequence
    * length for video); audio is a 1-D signal, so width carries the
    * sample count, height is 1, n_frames is 1. */
  object MediaCodec extends Serializable {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.{IIOImage, ImageIO}

    // never spill ImageIO stream caches to executor-local disk
    ImageIO.setUseCache(false)

    private def grayImage(w: Int, h: Int, seed: Long): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((x * 7 + y * 13 + seed * 31) & 0xff).toInt)
          x += 1
        }
        y += 1
      }
      img
    }

    def makePng(w: Int, h: Int, seed: Long): Array[Byte] = {
      val baos = new ByteArrayOutputStream()
      ImageIO.write(grayImage(w, h, seed), "png", baos)
      baos.toByteArray
    }

    /** Baseline JFIF JPEG through the JDK writer — the format most of a
      * real multimodal corpus actually arrives in. Lossy: pixel values
      * round-trip approximately (the histogram feature is therefore
      * pinned by ScalaTest, not the oracle), but DIMENSIONS round-trip
      * exactly, which is what the q106 oracle verifies. The `image`
      * decode path needs no JPEG branch: `ImageIO.read` sniffs the SOI
      * magic and dispatches to the JPEG reader on its own. */
    def makeJpeg(w: Int, h: Int, seed: Long): Array[Byte] = {
      val baos = new ByteArrayOutputStream()
      ImageIO.write(grayImage(w, h, seed), "jpg", baos)
      baos.toByteArray
    }

    /** Canonical 44-byte-header PCM WAV: 8-bit unsigned mono @ 8 kHz. */
    def makeWav(nSamples: Int, seed: Long): Array[Byte] = {
      val sampleRate = 8000
      val out = new Array[Byte](44 + nSamples)
      def ascii(off: Int, s: String): Unit = {
        var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
      }
      def le32(off: Int, v: Int): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
        out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
      }
      def le16(off: Int, v: Int): Unit = {
        out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      }
      ascii(0, "RIFF"); le32(4, 36 + nSamples); ascii(8, "WAVE")
      ascii(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */); le16(22, 1)
      le32(24, sampleRate); le32(28, sampleRate); le16(32, 1); le16(34, 8)
      ascii(36, "data"); le32(40, nSamples)
      var i = 0
      while (i < nSamples) {
        out(44 + i) = ((i * 31 + seed * 17) & 0xff).toByte
        i += 1
      }
      out
    }

    /** Multi-frame GIF through the JDK's ImageIO sequence writer. */
    def makeGif(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val baos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var k = 0
        while (k < frames) {
          writer.writeToSequence(new IIOImage(grayImage(w, h, seed + k), null, null), null)
          k += 1
        }
        writer.endWriteSequence()
      } finally {
        writer.dispose()
        ios.close()
      }
      baos.toByteArray
    }

    /** Decode real bytes → (width, height, n_frames, feature histogram). */
    def decode(payload: Array[Byte], mediaType: String): (Int, Int, Int, Array[Float]) =
      mediaType match {
        case "image" =>
          val img = ImageIO.read(new ByteArrayInputStream(payload))
          require(img != null, "undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          val hist = new Array[Float](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { hist(raster.getSample(x, y, 0) % 8) += 1f; x += 1 }
            y += 1
          }
          val total = math.max(1f, (w.toLong * h).toFloat)
          (w, h, 1, hist.map(_ / total))

        case "audio" =>
          require(payload.length >= 44 &&
            new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
            new String(payload, 8, 4, "US-ASCII") == "WAVE", "not a WAV payload")
          def le32(off: Int): Int =
            (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
              ((payload(off + 2) & 0xff) << 16) | ((payload(off + 3) & 0xff) << 24)
          // walk chunks from offset 12 to find "data" (robust to extra chunks)
          var off = 12
          var dataOff = -1
          var dataLen = 0
          while (dataOff < 0 && off + 8 <= payload.length) {
            val id = new String(payload, off, 4, "US-ASCII")
            val len = le32(off + 4)
            // corrupt lengths must throw (→ quarantine), not wedge the walk:
            // len = -8/-9 makes the step zero and the loop would never
            // terminate — a hang Try cannot catch, unlike this require
            require(len >= 0 && off.toLong + 8 + len <= payload.length,
              s"corrupt WAV chunk length $len at offset $off")
            if (id == "data") { dataOff = off + 8; dataLen = len }
            else off += 8 + len + (len & 1)
          }
          require(dataOff >= 0, "WAV data chunk missing")
          val hist = new Array[Float](8)
          var i = 0
          while (i < dataLen) { hist((payload(dataOff + i) & 0xff) % 8) += 1f; i += 1 }
          val total = math.max(1f, dataLen.toFloat)
          (dataLen, 1, 1, hist.map(_ / total))

        case _ => // video: GIF sequence
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
          val readers = ImageIO.getImageReaders(iis)
          require(readers.hasNext, "undecodable video payload")
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val f0 = reader.read(0)
            val (w, h) = (f0.getWidth, f0.getHeight)
            val hist = new Array[Float](8)
            var y = 0
            while (y < h) {
              var x = 0
              // GIF decodes to an indexed model; getRGB resolves the
              // palette (gray palette ⇒ blue channel = intensity)
              while (x < w) { hist((f0.getRGB(x, y) & 0xff) % 8) += 1f; x += 1 }
              y += 1
            }
            val total = math.max(1f, (w.toLong * h).toFloat)
            (w, h, n, hist.map(_ / total))
          } finally {
            reader.dispose()
            iis.close()
          }
      }

    /** Deterministic payload generator used by [[realMediaTable]] — the
      * test-data stand-in for bytes that in production arrive from object
      * storage. Dimensions are pure functions of doc_id, mirrored in the
      * DuckDB oracle SQL (q47/q56/q57). A minority of images exceed 224 px
      * so the resize planner's downscale branch stays exercised. */
    def makeMedia(docId: Long, mediaType: String): Array[Byte] = mediaType match {
      case "image" =>
        val w = 16 + (docId % 48) + (if (docId % 5 == 0) 240 else 0)
        val h = 16 + ((docId / 3) % 48) + (if (docId % 7 == 0) 240 else 0)
        makePng(w.toInt, h.toInt, docId)
      case "audio" =>
        makeWav((800 + (docId % 1600)).toInt, docId)
      case _ =>
        val w = 16 + (docId % 32)
        val h = 16 + ((docId / 3) % 32)
        makeGif(w.toInt, h.toInt, (1 + (docId % 10)).toInt, docId)
    }
  }

  /** The payload-OPAQUE media table (text bytes as payloads): serves the
    * metadata/manifest queries (q45/q46) whose whole point is that the
    * payload is never deserialized — byte_len and content_hash must be
    * SQL-derivable for their oracles, so these payloads stay text. The
    * decode-path queries use [[realMediaTable]] instead. */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    graft.sources.Tables.spread(graft.sources.Tables.documents(s, d))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1))
      .withColumn("payload", encode(col("text"), "UTF-8"))
      .select(col("doc_id"), col("media_type"), col("payload"),
        length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("content_hash"))
  }

  /** The real-bytes media table: every payload is a genuinely decodable
    * file (PNG / WAV / multi-frame GIF), built per-partition by
    * [[MediaCodec.makeMedia]]. In production these bytes come from object
    * storage; the generator stands in so the decode path is testable and
    * oracle-checkable (dims are doc_id formulas). Generation runs in
    * `mapPartitions` like the decode — payload bytes are born and consumed
    * executor-side, never on the driver. */
  def realMediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.sources.Tables.spread(graft.sources.Tables.documents(s, d))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1))
      .select(col("doc_id"), col("media_type"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, mt) =>
          val bytes = MediaCodec.makeMedia(id, mt)
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          MediaRecord(id, mt, bytes, bytes.length.toLong, hex)
        }
      }
  }

  /** All-JPEG media table (every payload a real baseline JPEG, dims pure
    * doc_id formulas): the q106 corpus. media_type stays "image" — the
    * decoder dispatches on the BYTES (SOI magic), not the label, exactly
    * as a production pipeline must when a lake mixes PNG and JPEG under
    * one logical type. */
  def jpegMediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.sources.Tables.spread(graft.sources.Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (16 + id % 40).toInt
          val h = (16 + (id / 3) % 40).toInt
          val bytes = MediaCodec.makeJpeg(w, h, id)
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          MediaRecord(id, "image", bytes, bytes.length.toLong, hex)
        }
      }
  }

  /** Batched feature extraction: one decoder per partition, rows streamed
    * through it — the `mapInPandas` shape, natively in Scala. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts, models…)
      rows.map { r =>
        val (w, h, f, feat) = MediaCodec.decode(r.payload, r.media_type)
        MediaFeatures(r.doc_id, r.media_type, r.byte_len, w, h, f, feat)
      }
    }
  }

  /** Corrupt-tolerant variant: at fleet scale a handful of truncated or
    * mislabeled payloads are a statistical certainty, and one throwing
    * row would fail its task 4 times and kill the whole 1000-executor
    * job. Undecodable rows are DROPPED here, not errored — callers that
    * need the rejects for quarantine/audit get them from
    * [[extractRejects]] (same decode pass, inverted filter) rather than
    * from a job failure. */
  def extractFeaturesSafe(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        scala.util.Try(MediaCodec.decode(r.payload, r.media_type)).toOption
          .map { case (w, h, f, feat) =>
            MediaFeatures(r.doc_id, r.media_type, r.byte_len, w, h, f, feat)
          }
      }
    }
  }

  /** The rows [[extractFeaturesSafe]] dropped: (doc_id, media_type,
    * byte_len, error). The quarantine manifest of a curation run. */
  def extractRejects(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        scala.util.Try(MediaCodec.decode(r.payload, r.media_type)) match {
          case scala.util.Failure(e) =>
            Some((r.doc_id, r.media_type, r.byte_len,
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
          case _ => None
        }
      }
    }.toDF("doc_id", "media_type", "byte_len", "error")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Metadata projection + per-type profile — stays fully relational; the
    // payload column is never deserialized (column pruning drops it).
    "q45_multimodal_meta" -> ((s, d) => {
      mediaTable(s, d)
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("byte_len")).as("total_bytes"),
          max(col("byte_len")).as("max_bytes"),
          countDistinct(col("content_hash")).as("n_unique"))
        .orderBy(col("media_type"))
    }),

    // Per-asset metadata record (binary length + content hash), the
    // dedup-ready manifest of a media lake.
    "q46_media_manifest" -> ((s, d) => {
      mediaTable(s, d)
        .select(col("doc_id"), col("media_type"), col("byte_len"),
          col("content_hash"))
        .orderBy(col("doc_id"))
    }),

    // Full REAL decode path: PNG/WAV/GIF payloads built per-partition,
    // then parsed back by MediaCodec.decode in the mapPartitions batch
    // extractor. Output dims come only from the decoded bytes; the oracle
    // independently derives the expected dims from doc_id, so a mismatch
    // anywhere in encode → binary column → decode fails the gate. The
    // float feature vector (decoded-pixel/PCM histogram) is covered by
    // ScalaTest (MultimodalSpec round-trip fixtures).
    "q47_media_features" -> ((s, d) => {
      extractFeatures(realMediaTable(s, d))
        .toDF()
        .select(col("doc_id"), col("media_type"),
          col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // Resize planning for images: fit-within-224 preserving aspect ratio.
    // Dims come from the decode stage (mapPartitions); the scale math is
    // pure INTEGER arithmetic ((w*224) DIV max-side) so the plan is
    // bit-reproducible across engines — no float rounding to disagree on.
    // In a real deployment the pixel resample runs inside the same
    // per-partition decoder pass; the planning columns are what downstream
    // batching/packing consumes and what is verified here.
    "q56_media_resize" -> ((s, d) => {
      extractFeatures(realMediaTable(s, d)).toDF()
        .filter(col("media_type") === "image")
        .withColumn("m", greatest(col("width"), col("height")))
        .select(col("doc_id"), col("width"), col("height"),
          when(col("m") > 224,
            expr("CAST((width * 224) DIV m AS INT)"))
            .otherwise(col("width")).as("out_w"),
          when(col("m") > 224,
            expr("CAST((height * 224) DIV m AS INT)"))
            .otherwise(col("height")).as("out_h"))
        .orderBy(col("doc_id"))
    }),

    // JPEG decode path: real baseline-JPEG payloads (the dominant format
    // of actual image corpora), parsed back through the same sniffing
    // image decoder as PNG. Dims come only from the decoded bytes; the
    // oracle independently derives them from doc_id.
    "q106_jpeg_features" -> ((s, d) => {
      extractFeatures(jpegMediaTable(s, d)).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // Frame sampling for videos: every 5th frame index from the decoded
    // frame count — the manifest a frame-extraction stage consumes. The
    // explode is map-side (rows × ≤6 at 30 fps-stub); no shuffle before
    // the final presentation sort.
    "q57_frame_sample" -> ((s, d) => {
      extractFeatures(realMediaTable(s, d)).toDF()
        .filter(col("media_type") === "video")
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("fi"))
        .select(col("doc_id"), col("n_frames"),
          col("fi").cast("long").as("frame_idx"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }))

  def oracle: Map[String, String] = Map(
    "q45_multimodal_meta" ->
      """WITH m AS (
           SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS byte_len,
             md5(text) AS content_hash
           FROM documents)
         SELECT media_type, count(*) AS n_assets,
           CAST(sum(byte_len) AS BIGINT) AS total_bytes,
           max(byte_len) AS max_bytes,
           count(DISTINCT content_hash) AS n_unique
         FROM m GROUP BY media_type ORDER BY media_type""",

    // Independent derivation of MediaCodec.makeMedia's dimension formulas:
    // a pass means Spark's decoded-from-real-bytes dims equal these.
    "q47_media_features" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS media_type,
           CAST(CASE doc_id % 3
             WHEN 0 THEN 16 + doc_id % 48
               + CASE WHEN doc_id % 5 = 0 THEN 240 ELSE 0 END
             WHEN 1 THEN 800 + doc_id % 1600
             ELSE 16 + doc_id % 32 END AS INT) AS width,
           CAST(CASE doc_id % 3
             WHEN 0 THEN 16 + (doc_id // 3) % 48
               + CASE WHEN doc_id % 7 = 0 THEN 240 ELSE 0 END
             WHEN 1 THEN 1
             ELSE 16 + (doc_id // 3) % 32 END AS INT) AS height,
           CAST(CASE doc_id % 3 WHEN 2 THEN 1 + doc_id % 10 ELSE 1 END
             AS INT) AS n_frames
         FROM documents ORDER BY doc_id""",

    "q46_media_manifest" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS content_hash
         FROM documents ORDER BY doc_id""",

    "q56_media_resize" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(16 + doc_id % 48
               + CASE WHEN doc_id % 5 = 0 THEN 240 ELSE 0 END AS INT) AS width,
             CAST(16 + (doc_id // 3) % 48
               + CASE WHEN doc_id % 7 = 0 THEN 240 ELSE 0 END AS INT) AS height
           FROM documents WHERE doc_id % 3 = 0)
         SELECT doc_id, width, height,
           CAST(CASE WHEN greatest(width, height) > 224
             THEN (width * 224) // greatest(width, height)
             ELSE width END AS INT) AS out_w,
           CAST(CASE WHEN greatest(width, height) > 224
             THEN (height * 224) // greatest(width, height)
             ELSE height END AS INT) AS out_h
         FROM d ORDER BY doc_id""",

    "q106_jpeg_features" ->
      """SELECT doc_id,
           CAST(16 + doc_id % 40 AS INT) AS width,
           CAST(16 + (doc_id // 3) % 40 AS INT) AS height,
           CAST(1 AS INT) AS n_frames
         FROM documents ORDER BY doc_id""",

    "q57_frame_sample" ->
      """WITH v AS (
           SELECT doc_id, CAST(1 + doc_id % 10 AS INT) AS n_frames
           FROM documents WHERE doc_id % 3 = 2)
         SELECT doc_id, n_frames,
           CAST(unnest(range(0, n_frames, 5)) AS BIGINT) AS frame_idx
         FROM v ORDER BY doc_id, frame_idx""")
}
