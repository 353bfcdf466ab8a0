package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.MediaRecord

/** Perceptual image dedup (SURVEY.md §2.11 multimodal extension): the
  * image analog of SimHash near-dup — image corpora for multimodal
  * training carry the same re-encode/re-brightness/thumbnail duplicate
  * problem text corpora carry with whitespace edits, and content-hash
  * dedup (q33's discipline) misses every one of them because the BYTES
  * differ while the PICTURE doesn't.
  *
  * The fingerprint is the classic 64-bit average hash, made
  * EXACT-INTEGER: the image is block-averaged onto an 8×8 grid and bit
  * i is set iff block i's mean exceeds the global mean — evaluated as
  * the cross-multiplication `blockSum·totalPix > totalSum·blockPix`
  * (no float division anywhere, so the hash is bit-deterministic on
  * any platform). That form also makes the headline invariance a
  * THEOREM rather than a tendency: a uniform brightness shift `c` adds
  * `c·blockPix` and `c·totalPix` to the two sides, which cancel —
  * `(bs+c·bp)·tp > (ts+c·tp)·bp  ⇔  bs·tp > ts·bp` — so a re-graded
  * copy hashes IDENTICALLY while its content hash differs (spec-pinned;
  * localized pixel noise moves only the touched blocks' bits, so small
  * edits stay within a small Hamming radius).
  *
  * Pairing is the q48 SimHash discipline applied to the image hash:
  * collapse identical fingerprints to one representative FIRST (pair
  * enumeration is inherently quadratic in duplicate-group size — the
  * planted-duplicate worst case collapses to nothing), then 4 bands ×
  * 16 bits bucket candidate pairs (any pair within Hamming 3 shares at
  * least one intact band by pigeonhole — guaranteed recall at the
  * default radius), then ONE exact `bit_count(a XOR b)` verify per
  * candidate. Decode runs once per image in `mapPartitions` (the
  * mapInPandas shape, natively); only (doc_id, 64-bit hash) ever
  * reaches a shuffle — payload bytes never leave their scan partition.
  */
object MediaDedup {

  /** Exact-integer 8×8 average hash of a decoded image (see object doc;
    * bit 8·by+bx, MSB-free plain Long). Deterministic for any image. */
  def aHash(img: BufferedImage): Long = {
    require(img.getWidth > 0 && img.getHeight > 0, "MediaDedup: empty image")
    val raster = img.getRaster
    aHashSamples(img.getWidth, img.getHeight,
      (x, y) => raster.getSample(x, y, 0))
  }

  /** The shared block-average core over any (w × h, sample) plane —
    * images decode through a raster, video frames read raw bytes. */
  private def aHashSamples(w: Int, h: Int,
      sample: (Int, Int) => Int): Long = {
    // block sums + pixel counts on the 8x8 grid: pixel (x, y) lands in
    // block (8x/w, 8y/h) — exact integer block edges, any w/h ≥ 1
    val sums = new Array[Long](64)
    val pix = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      val by = (8L * y / h).toInt
      var x = 0
      while (x < w) {
        val b = by * 8 + (8L * x / w).toInt
        val v = sample(x, y).toLong
        sums(b) += v
        pix(b) += 1L
        total += v
        x += 1
      }
      y += 1
    }
    val totalPix = w.toLong * h
    var hash = 0L
    var b = 0
    while (b < 64) {
      // blocks can be empty when w or h < 8: an empty block's mean is
      // defined as 0 (never above the global mean of a nonempty image)
      if (pix(b) > 0L &&
          multiplyExactSafe(sums(b), totalPix) >
            multiplyExactSafe(total, pix(b)))
        hash |= (1L << b)
      b += 1
    }
    hash
  }

  /** [[aHash]] of a video's MIDDLE frame — the frame-sample convention
    * (q57) applied to dedup: re-encoded/re-graded copies of the same
    * footage collide while different footage doesn't, and one frame's
    * hash costs O(w·h) regardless of duration. Dispatches on BYTES like
    * the image path: ISO-BMFF walks the real box tree (dims and frame
    * offsets from tkhd/stsz/stco — raw-gray payloads only, anything
    * else is refused loudly, the honest stand-in for a codec hook);
    * GIF decodes its first frame through ImageIO. The aHash core is
    * shared, so the brightness-shift invariance theorem carries over
    * verbatim. */
  def videoFrameHash(payload: Array[Byte]): Long = {
    if (payload.length >= 6 &&
        new String(payload, 0, 3, "US-ASCII") == "GIF") {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "MediaDedup: undecodable GIF payload")
      aHash(img)
    } else {
      // parseMp4 enforces sampleSize == width*height (raw-gray) and
      // throws on anything else — that refusal IS the codec-hook seam;
      // real-codec support starts by relaxing parseMp4's contract
      val info = Multimodal.MediaCodec.parseMp4(payload)
      val mid = info.nFrames / 2
      val base = info.dataOff + mid.toLong * info.sampleSize
      require(base >= 0 && base + info.sampleSize <= payload.length,
        "MediaDedup: middle frame overruns the MP4 payload")
      aHashSamples(info.width, info.height,
        (x, y) => payload((base + y.toLong * info.width + x).toInt) & 0xff)
    }
  }

  /** (doc_id, ahash) for every video payload — feed to [[nearDupPairs]]. */
  def videoHashes(media: Dataset[MediaRecord]): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (r.doc_id, videoFrameHash(r.payload)))
    }.toDF("doc_id", "ahash")
  }

  /** Planted video-dup corpus: generator MP4s with mdat pixels clamped
    * to ≤ 246, plus for ids ≡ 0 (mod 5) a +9 brightness-regrade at
    * id+offset — different bytes, identical middle-frame structure. */
  def plantedVideoTable(s: org.apache.spark.sql.SparkSession, d: String,
      offset: Long = 1000000L): Dataset[MediaRecord] = {
    import s.implicits._
    graft.sources.Tables.spread(graft.sources.Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w = (16 + id % 32).toInt
          val h = (16 + (id / 3) % 32).toInt
          val frames = (1 + id % 10).toInt
          val raw = Multimodal.MediaCodec.makeMp4(w, h, frames, id)
          def regrade(delta: Int): Array[Byte] = {
            val out = raw.clone()
            // top-level box walk to the mdat payload
            def be32(off: Int): Int =
              ((out(off) & 0xff) << 24) | ((out(off + 1) & 0xff) << 16) |
                ((out(off + 2) & 0xff) << 8) | (out(off + 3) & 0xff)
            var off = 0
            var done = false
            while (!done && off + 8 <= out.length) {
              val size = be32(off)
              require(size >= 8, s"corrupt box at $off")
              if (new String(out, off + 4, 4, "US-ASCII") == "mdat") {
                var i = off + 8
                while (i < off + size) {
                  out(i) = (math.min(246, out(i) & 0xff) + delta).toByte
                  i += 1
                }
                done = true
              } else off += size
            }
            require(done, "generator MP4 without mdat")
            out
          }
          val orig = rec(id, regrade(0), "video")
          if (id % 5 == 0)
            Iterator(orig, rec(id + offset, regrade(9), "video"))
          else Iterator(orig)
        }
      }
  }

  // 8-bit samples × ≤2^31 pixels fit a Long product for any image up to
  // ~2^25 per side; guard loudly instead of silently wrapping
  private def multiplyExactSafe(a: Long, b: Long): Long =
    try math.multiplyExact(a, b)
    catch {
      case _: ArithmeticException => throw new IllegalArgumentException(
        "MediaDedup: image too large for exact-integer aHash accumulation")
    }

  /** (doc_id, ahash) for every decodable image payload; one decoder per
    * partition, undecodable payloads fail loudly (route through
    * [[Multimodal.extractRejects]] first when quarantine is wanted). */
  def imageHashes(media: Dataset[MediaRecord]): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = ImageIO.read(new ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for ${r.doc_id}")
        (r.doc_id, aHash(img))
      }
    }.toDF("doc_id", "ahash")
  }

  /** Near-duplicate pairs (a < b, hamming ≤ maxHamming) among `hashes`
    * — signature collapse, 4×16 band buckets, exact bit_count verify
    * (see object doc). Recall is GUARANTEED for hamming ≤ 3 (pigeonhole
    * over 4 bands) and best-effort above; maxHamming > 3 widens the
    * verify radius, not the candidate generation.
    *
    * Output is REPRESENTATIVE-based (the rep-star shape, never
    * all-pairs): identical-hash members pair only with their group's
    * rep, and cross-group edges pair rep-to-rep — a member of group A
    * within radius of group B's docs is never paired with them
    * directly. The pair set is complete only up to the transitive
    * closure of rep edges: consumers wanting every near-dup relation
    * must union-find / connected-component over these edges (as
    * [[graft.operators.TextOps.clusterAssignments]] does), not treat
    * the rows as the exhaustive pair list. */
  def nearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"MediaDedup: bad maxHamming $maxHamming")
    val h = hashes.select(col("doc_id").cast("long").as("doc_id"),
      col("ahash").cast("long").as("ahash"))
    // collapse identical hashes: reps pair across groups, members pair
    // within their group by construction (hamming 0)
    val groups = h.groupBy(col("ahash"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
      .localCheckpoint(true)
    val within = h.join(groups.select(col("ahash"), col("rep")), "ahash")
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("a"), col("doc_id").as("b"),
        lit(0).as("hamming"))
    val reps = groups.select(col("rep"), col("ahash"))
    val bands = reps.select(col("rep"), col("ahash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bkey",
        expr("(ahash >> (band * 16)) & 65535"))
    val cand = bands.select(col("band"), col("bkey"),
        col("rep").as("ra"), col("ahash").as("ha"))
      .join(bands.select(col("band"), col("bkey"),
        col("rep").as("rb"), col("ahash").as("hb")), Seq("band", "bkey"))
      .filter(col("ra") < col("rb"))
      .select(col("ra"), col("rb"), col("ha"), col("hb")).distinct()
    val cross = cand
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("ra").as("a"), col("rb").as("b"), col("hamming"))
    cross.union(within)
  }

  /** 64-bit energy-trend fingerprint of an 8-bit-PCM WAV payload — the
    * audio analog of [[aHash]]: samples split onto 64 equal windows
    * (integer edges, any length ≥ 1), per-window energy `Σ(v-128)²` in
    * exact Longs, bit i set iff window i's energy exceeds window
    * (i+1) mod 64's. The TREND of the energy envelope survives what
    * byte equality doesn't: uniform gain `v → 128 + α·(v-128)` scales
    * every window energy by exactly α², so all 64 comparisons — and the
    * fingerprint — are EXACTLY invariant (while the content hash
    * moves), the brightness-shift theorem transposed to audio. Pair
    * with [[nearDupPairs]] — it is fingerprint-agnostic. */
  def audioTrendHash(payload: Array[Byte]): Long = {
    require(payload.length >= 44 &&
      new String(payload, 0, 4, "US-ASCII") == "RIFF" &&
      new String(payload, 8, 4, "US-ASCII") == "WAVE",
      "MediaDedup: not a WAV payload")
    def le32(off: Int): Int =
      (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8) |
        ((payload(off + 2) & 0xff) << 16) | ((payload(off + 3) & 0xff) << 24)
    var off = 12
    var dataOff = -1
    var dataLen = 0
    while (dataOff < 0 && off + 8 <= payload.length) {
      val id = new String(payload, off, 4, "US-ASCII")
      val len = le32(off + 4)
      require(len >= 0 && off.toLong + 8 + len <= payload.length,
        s"MediaDedup: corrupt WAV chunk `$id` length $len")
      if (id == "data") { dataOff = off + 8; dataLen = len }
      else off += 8 + len + (len & 1)
    }
    require(dataOff >= 0 && dataLen > 0, "MediaDedup: WAV has no data")
    val e = new Array[Long](64)
    var i = 0
    while (i < dataLen) {
      val c = (payload(dataOff + i) & 0xff) - 128L
      e((64L * i / dataLen).toInt) += c * c
      i += 1
    }
    var hash = 0L
    var b = 0
    while (b < 64) {
      if (e(b) > e((b + 1) % 64)) hash |= (1L << b)
      b += 1
    }
    hash
  }

  /** (doc_id, ahash) for every WAV payload — feed to [[nearDupPairs]]. */
  def audioHashes(media: Dataset[MediaRecord]): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (r.doc_id, audioTrendHash(r.payload)))
    }.toDF("doc_id", "ahash")
  }

  /** Planted audio-dup corpus: generator WAVs with samples compressed
    * toward the midpoint (so a ×2 gain never clips), plus for ids ≡ 0
    * (mod 5) an exactly-gain-doubled copy at id+offset — different
    * bytes, identical energy trend. */
  def plantedAudioTable(s: org.apache.spark.sql.SparkSession, d: String,
      offset: Long = 1000000L): Dataset[MediaRecord] = {
    import s.implicits._
    graft.sources.Tables.spread(graft.sources.Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val n = (160 + id % 400).toInt
          val raw = Multimodal.MediaCodec.makeWav(n, id)
          def withGain(alpha: Int): Array[Byte] = {
            val out = raw.clone()
            var i = 44
            while (i < out.length) {
              val centered = ((out(i) & 0xff) - 128) / 2
              out(i) = (128 + alpha * centered).toByte
              i += 1
            }
            out
          }
          val orig = rec(id, withGain(1), "audio")
          if (id % 5 == 0)
            Iterator(orig, rec(id + offset, withGain(2), "audio"))
          else Iterator(orig)
        }
      }
  }

  /** The planted perceptual-dup corpus for specs/probes: every PNG from
    * the generator (pixels clamped to ≤ 246 so a +9 shift never
    * saturates — saturation would break the EXACT invariance the spec
    * pins), plus for ids ≡ 0 (mod 5) a uniformly brightness-shifted
    * copy at id+offset — DIFFERENT bytes (content hash moves),
    * IDENTICAL picture structure (aHash provably equal). */
  def plantedImageTable(s: org.apache.spark.sql.SparkSession, d: String,
      offset: Long = 1000000L): Dataset[MediaRecord] = {
    import s.implicits._
    graft.sources.Tables.spread(graft.sources.Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w = (16 + id % 40).toInt
          val h = (16 + (id / 3) % 40).toInt
          val img = ImageIO.read(
            new ByteArrayInputStream(Multimodal.MediaCodec.makePng(w, h, id)))
          def encodeWith(delta: Int): Array[Byte] = {
            val out = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = math.min(246, img.getRaster.getSample(x, y, 0))
                out.getRaster.setSample(x, y, 0, v + delta)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            ImageIO.write(out, "png", bos)
            bos.toByteArray
          }
          val orig = rec(id, encodeWith(0))
          if (id % 5 == 0) Iterator(orig, rec(id + offset, encodeWith(9)))
          else Iterator(orig)
        }
      }
  }

  private def rec(id: Long, bytes: Array[Byte],
      mediaType: String = "image"): MediaRecord = {
    val md = java.security.MessageDigest.getInstance("MD5")
    MediaRecord(id, mediaType, bytes, bytes.length.toLong,
      md.digest(bytes).map("%02x".format(_)).mkString)
  }
}
