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
    val (w, h) = (img.getWidth, img.getHeight)
    require(w > 0 && h > 0, "MediaDedup: empty image")
    val raster = img.getRaster
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
        val v = raster.getSample(x, y, 0).toLong
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
    * verify radius, not the candidate generation. */
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

  private def rec(id: Long, bytes: Array[Byte]): MediaRecord = {
    val md = java.security.MessageDigest.getInstance("MD5")
    MediaRecord(id, "image", bytes, bytes.length.toLong,
      md.digest(bytes).map("%02x".format(_)).mkString)
  }
}
