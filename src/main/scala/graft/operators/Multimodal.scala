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

    /** Minimal-but-valid ISO-BMFF (MP4) container: `ftyp` + `mdat`
      * (raw 8-bit gray frames, same pixel formula as [[grayImage]]) +
      * a structurally complete `moov` — mvhd/tkhd with 16.16 dims,
      * full mdia/minf/stbl chain (stsd with a custom `rgry` visual
      * sample entry, stts/stsc/stsz/stco sample tables) at timescale
      * 1000 with 40 ms frames (25 fps). The payload codec is
      * uncompressed gray (a real corpus would carry H.264 inside the
      * same boxes); everything the PARSER touches — box sizes, sample
      * tables, chunk offsets, fixed-point dims — is spec-shaped, so
      * [[parseMp4]] is an honest container walk, not a formula echo. */
    def makeMp4(w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
      import java.io.DataOutputStream
      def bytes(f: DataOutputStream => Unit): Array[Byte] = {
        val b = new ByteArrayOutputStream()
        val d = new DataOutputStream(b)
        f(d); d.flush(); b.toByteArray
      }
      def box(tp: String, parts: Array[Byte]*): Array[Byte] = bytes { d =>
        d.writeInt(8 + parts.map(_.length).sum)
        d.writeBytes(tp)
        parts.foreach(d.write)
      }
      def matrix(d: DataOutputStream): Unit = {
        d.writeInt(0x00010000); d.writeInt(0); d.writeInt(0)
        d.writeInt(0); d.writeInt(0x00010000); d.writeInt(0)
        d.writeInt(0); d.writeInt(0); d.writeInt(0x40000000)
      }
      val durTs = frames * 40 // timescale 1000 ⇒ 40 ms per frame
      val ftyp = box("ftyp", bytes { d =>
        d.writeBytes("isom"); d.writeInt(0x200)
        d.writeBytes("isom"); d.writeBytes("mp42")
      })
      val mdat = box("mdat", bytes { d =>
        var k = 0
        while (k < frames) {
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              d.write(((x * 7 + y * 13 + (seed + k) * 31) & 0xff).toInt)
              x += 1
            }
            y += 1
          }
          k += 1
        }
      })
      val dataOff = ftyp.length + 8 // first sample = start of mdat payload
      val mvhd = box("mvhd", bytes { d =>
        d.writeInt(0) // version 0 + flags
        d.writeInt(0); d.writeInt(0) // ctime, mtime
        d.writeInt(1000); d.writeInt(durTs)
        d.writeInt(0x00010000); d.writeShort(0x0100) // rate, volume
        d.writeShort(0); d.writeLong(0) // reserved
        matrix(d)
        var i = 0; while (i < 6) { d.writeInt(0); i += 1 } // pre_defined
        d.writeInt(2) // next_track_ID
      })
      val tkhd = box("tkhd", bytes { d =>
        d.writeInt(7) // version 0, flags: enabled|in_movie|in_preview
        d.writeInt(0); d.writeInt(0) // ctime, mtime
        d.writeInt(1); d.writeInt(0) // track_ID, reserved
        d.writeInt(durTs); d.writeLong(0) // duration, reserved
        d.writeShort(0); d.writeShort(0) // layer, alternate_group
        d.writeShort(0); d.writeShort(0) // volume (video: 0), reserved
        matrix(d)
        d.writeInt(w << 16); d.writeInt(h << 16) // 16.16 fixed-point dims
      })
      val mdhd = box("mdhd", bytes { d =>
        d.writeInt(0); d.writeInt(0); d.writeInt(0)
        d.writeInt(1000); d.writeInt(durTs)
        d.writeShort(0x55c4); d.writeShort(0) // language "und", pre_defined
      })
      val hdlr = box("hdlr", bytes { d =>
        d.writeInt(0); d.writeInt(0)
        d.writeBytes("vide")
        d.writeInt(0); d.writeInt(0); d.writeInt(0)
        d.writeBytes("graft"); d.write(0)
      })
      val vmhd = box("vmhd", bytes { d =>
        d.writeInt(1) // version 0, flags 1 (spec-required)
        d.writeShort(0) // graphicsmode copy
        d.writeShort(0); d.writeShort(0); d.writeShort(0) // opcolor
      })
      val dinf = box("dinf", box("dref",
        bytes { d => d.writeInt(0); d.writeInt(1) },
        box("url ", bytes(_.writeInt(1))))) // self-contained
      val sampleEntry = box("rgry", bytes { d =>
        var i = 0; while (i < 6) { d.write(0); i += 1 } // reserved
        d.writeShort(1) // data_reference_index
        d.writeShort(0); d.writeShort(0) // pre_defined, reserved
        d.writeInt(0); d.writeInt(0); d.writeInt(0) // pre_defined[3]
        d.writeShort(w); d.writeShort(h)
        d.writeInt(0x00480000); d.writeInt(0x00480000) // 72 dpi
        d.writeInt(0) // reserved
        d.writeShort(1) // frame_count per sample
        d.write(5); d.writeBytes("rgray") // compressorname (pascal)
        i = 0; while (i < 26) { d.write(0); i += 1 } // pad name to 32
        d.writeShort(8) // depth: 8-bit gray
        d.writeShort(-1) // pre_defined
      })
      val stsd = box("stsd",
        bytes { d => d.writeInt(0); d.writeInt(1) }, sampleEntry)
      val stts = box("stts", bytes { d =>
        d.writeInt(0); d.writeInt(1); d.writeInt(frames); d.writeInt(40)
      })
      val stsc = box("stsc", bytes { d =>
        d.writeInt(0); d.writeInt(1)
        d.writeInt(1); d.writeInt(frames); d.writeInt(1)
      })
      val stsz = box("stsz", bytes { d =>
        d.writeInt(0); d.writeInt(w * h); d.writeInt(frames)
      })
      val stco = box("stco", bytes { d =>
        d.writeInt(0); d.writeInt(1); d.writeInt(dataOff)
      })
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = box("minf", vmhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      val moov = box("moov", mvhd, trak)
      ftyp ++ mdat ++ moov
    }

    /** Parsed MP4 container facts — everything read from the real box
      * structure, nothing from generator formulas. */
    case class Mp4Info(width: Int, height: Int, nFrames: Int,
        durationMs: Long, timescale: Int, dataOff: Int, sampleSize: Int)

    /** Walk the ISO-BMFF box tree: moov → mvhd (timescale/duration),
      * trak → tkhd (16.16 dims), mdia/minf/stbl → stsz (sample count +
      * uniform size) and stco (first chunk offset). Corrupt structure —
      * undersized boxes (the classic size=0 infinite-walk), overrun
      * boxes, truncated mdat, inconsistent sample tables — throws, so
      * [[Multimodal.extractFeaturesSafe]] quarantines instead of
      * wedging or miscounting. Version-0 boxes only (what we write;
      * v1 would move every offset). */
    def parseMp4(p: Array[Byte]): Mp4Info = {
      require(p.length >= 16 && new String(p, 4, 4, "US-ASCII") == "ftyp",
        "not an ISO-BMFF payload")
      def be32(off: Int): Int =
        ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
          ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
      def be16(off: Int): Int = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
      // find child box `tp` in [from, to): returns (payloadStart, boxEnd)
      def find(from: Int, to: Int, tp: String): (Int, Int) = {
        var off = from
        while (off + 8 <= to) {
          val size = be32(off)
          require(size >= 8 && off.toLong + size <= to,
            s"corrupt MP4 box size $size at offset $off")
          if (new String(p, off + 4, 4, "US-ASCII") == tp)
            return (off + 8, off + size)
          off += size
        }
        throw new IllegalArgumentException(s"MP4 box $tp missing")
      }
      val (moovS, moovE) = find(0, p.length, "moov")
      val (mvhdS, _) = find(moovS, moovE, "mvhd")
      require(p(mvhdS) == 0, "unsupported mvhd version")
      val timescale = be32(mvhdS + 12)
      val duration = be32(mvhdS + 16)
      val (trakS, trakE) = find(moovS, moovE, "trak")
      val (tkhdS, _) = find(trakS, trakE, "tkhd")
      require(p(tkhdS) == 0, "unsupported tkhd version")
      val w = be16(tkhdS + 76) // integer part of the 16.16 width
      val h = be16(tkhdS + 80)
      val (mdiaS, mdiaE) = find(trakS, trakE, "mdia")
      val (minfS, minfE) = find(mdiaS, mdiaE, "minf")
      val (stblS, stblE) = find(minfS, minfE, "stbl")
      val (stszS, _) = find(stblS, stblE, "stsz")
      val sampleSize = be32(stszS + 4)
      val nFrames = be32(stszS + 8)
      val (stcoS, _) = find(stblS, stblE, "stco")
      require(be32(stcoS + 4) >= 1, "stco chunk-offset table empty")
      val dataOff = be32(stcoS + 8)
      require(timescale > 0 && nFrames > 0 && sampleSize == w * h,
        s"inconsistent MP4 sample table (dims $w x $h, sample $sampleSize)")
      require(dataOff >= 0 &&
        dataOff.toLong + sampleSize.toLong * nFrames <= p.length,
        "MP4 mdat truncated: sample table points past the payload")
      Mp4Info(w, h, nFrames, duration.toLong * 1000L / timescale,
        timescale, dataOff, sampleSize)
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

        case _ if payload.length >= 16 &&
            new String(payload, 4, 4, "US-ASCII") == "ftyp" =>
          // video, ISO-BMFF container: dims + frame count from the real
          // sample tables; feature = histogram over frame 0's raw gray
          // samples (same binning as every other media type)
          val info = parseMp4(payload)
          val hist = new Array[Float](8)
          var i = 0
          while (i < info.sampleSize) {
            hist((payload(info.dataOff + i) & 0xff) % 8) += 1f
            i += 1
          }
          val total = math.max(1f, info.sampleSize.toFloat)
          (info.width, info.height, info.nFrames, hist.map(_ / total))

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
        // video rows alternate container: even ids ISO-BMFF (MP4), odd
        // ids GIF — one logical type, two real on-disk formats, exactly
        // as a production lake mixes them; the decoder dispatches on the
        // BYTES (ftyp sniff), so the dims formulas (and the q47/q57
        // oracles) are container-independent
        val w = 16 + (docId % 32)
        val h = 16 + ((docId / 3) % 32)
        val frames = (1 + (docId % 10)).toInt
        if (docId % 2 == 0) makeMp4(w.toInt, h.toInt, frames, docId)
        else makeGif(w.toInt, h.toInt, frames, docId)
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

  /** All-MP4 media table (every payload a real ISO-BMFF container, dims
    * and frame counts pure doc_id formulas): the q109 corpus. */
  def mp4MediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.sources.Tables.spread(graft.sources.Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (16 + id % 32).toInt
          val h = (16 + (id / 3) % 32).toInt
          val frames = (1 + id % 10).toInt
          val bytes = MediaCodec.makeMp4(w, h, frames, id)
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          MediaRecord(id, "video", bytes, bytes.length.toLong, hex)
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

    // MP4 container manifest: every field walked out of the real box
    // tree (mvhd timescale/duration, tkhd 16.16 dims, stsz/stco sample
    // tables) by parseMp4 in a mapPartitions batch — the oracle derives
    // the same facts independently from the doc_id formulas, so a pass
    // pins the full encode → binary column → container-walk round trip.
    "q109_mp4_manifest" -> ((s, d) => {
      import s.implicits._
      mp4MediaTable(s, d)
        .mapPartitions { rows =>
          rows.map { r =>
            val info = MediaCodec.parseMp4(r.payload)
            (r.doc_id, info.width, info.height, info.nFrames,
              info.durationMs, info.timescale,
              info.sampleSize.toLong * info.nFrames)
          }
        }
        .toDF("doc_id", "width", "height", "n_frames", "duration_ms",
          "timescale", "sample_bytes")
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

    "q109_mp4_manifest" ->
      """WITH v AS (
           SELECT doc_id,
             CAST(16 + doc_id % 32 AS INT) AS width,
             CAST(16 + (doc_id // 3) % 32 AS INT) AS height,
             CAST(1 + doc_id % 10 AS INT) AS n_frames
           FROM documents)
         SELECT doc_id, width, height, n_frames,
           CAST(n_frames * 40 AS BIGINT) AS duration_ms,
           CAST(1000 AS INT) AS timescale,
           CAST(width * height * n_frames AS BIGINT) AS sample_bytes
         FROM v ORDER BY doc_id""",

    "q57_frame_sample" ->
      """WITH v AS (
           SELECT doc_id, CAST(1 + doc_id % 10 AS INT) AS n_frames
           FROM documents WHERE doc_id % 3 = 2)
         SELECT doc_id, n_frames,
           CAST(unnest(range(0, n_frames, 5)) AS BIGINT) AS frame_idx
         FROM v ORDER BY doc_id, frame_idx""")
}
