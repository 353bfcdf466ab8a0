package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.operators.MediaDedup

/** Perceptual image dedup (operators/MediaDedup): the exact-integer
  * aHash, its PROVEN brightness invariance, banded-LSH recall, and the
  * signature-collapse pair shape. */
class MediaDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, f(x, y))
    img
  }

  test("aHash: handcrafted gradient — exactly the bright half's bits set") {
    // left half 10, right half 200: global mean 105; blocks 0-3 of each
    // row are below, 4-7 above → hash = columns 4-7 set in every row
    val img = gray(16, 16)((x, _) => if (x < 8) 10 else 200)
    val hash = MediaDedup.aHash(img)
    val expected = (0 until 64)
      .filter(b => (b % 8) >= 4).map(1L << _).reduce(_ | _)
    assert(hash == expected,
      s"got ${hash.toBinaryString}, want ${expected.toBinaryString}")
  }

  test("aHash: uniform brightness shift is EXACTLY invariant; content hash is not") {
    val base = gray(24, 17)((x, y) => (x * 31 + y * 7) % 240)
    val shifted = gray(24, 17)((x, y) => (x * 31 + y * 7) % 240 + 9)
    assert(MediaDedup.aHash(base) == MediaDedup.aHash(shifted))
    // a flat image hashes to 0 (no block exceeds the global mean)
    assert(MediaDedup.aHash(gray(8, 8)((_, _) => 100)) == 0L)
  }

  test("aHash: localized edit moves few bits; different structure moves many") {
    val base = gray(32, 32)((x, y) => (x * 13 + y * 29) % 230)
    val dent = gray(32, 32)((x, y) =>
      if (x < 4 && y < 4) 255 else (x * 13 + y * 29) % 230)
    val flipped = gray(32, 32)((x, y) => 230 - (x * 13 + y * 29) % 230)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val localDelta = ham(MediaDedup.aHash(base), MediaDedup.aHash(dent))
    val structDelta = ham(MediaDedup.aHash(base), MediaDedup.aHash(flipped))
    assert(localDelta <= 4, s"4x4 dent moved $localDelta bits")
    assert(structDelta >= 20,
      s"inverted image only $structDelta bits away")
  }

  test("planted brightness-shifted copies pair at hamming 0 through the full pipeline") {
    val media = MediaDedup.plantedImageTable(spark, sf)
    val hashes = MediaDedup.imageHashes(media).cache()
    val pairs = MediaDedup.nearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = media.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("orig"))
      .as[Long].collect().toSet
    // the output is a CLUSTER-GENERATING edge set (identical hashes
    // collapse to a rep-star, so a planted pair may connect through its
    // group rep rather than directly): assert same-component, and that
    // every edge on the connecting star is hamming 0
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      parent(x) = r; r
    }
    pairs.foreach { case (a, b, _) => parent(find(a)) = find(b) }
    for (o <- planted) {
      assert(find(o) == find(o + 1000000L),
        s"planted pair for $o not connected")
    }
    assert(pairs.forall(p => p._3 >= 0 && p._3 <= 3))
    // and their content hashes DIFFER (bytes moved, picture didn't)
    val ch = media.select(col("doc_id"), col("content_hash"))
      .as[(Long, String)].collect().toMap
    for (o <- planted) assert(ch(o) != ch(o + 1000000L))
    hashes.unpersist()
  }

  test("audioTrendHash: exact gain invariance; planted copies pair through the pipeline") {
    // handcrafted WAV helper: 8-bit PCM mono around midpoint 128
    def wav(samples: Seq[Int]): Array[Byte] = {
      val n = samples.length
      val out = new Array[Byte](44 + n)
      def ascii(off: Int, s: String): Unit =
        s.zipWithIndex.foreach { case (c, i) => out(off + i) = c.toByte }
      def le32(off: Int, v: Int): Unit = (0 until 4).foreach(i =>
        out(off + i) = (v >> (8 * i)).toByte)
      ascii(0, "RIFF"); le32(4, 36 + n); ascii(8, "WAVE")
      ascii(12, "fmt "); le32(16, 16); out(20) = 1; out(22) = 1
      le32(24, 8000); le32(28, 8000); out(32) = 1; out(34) = 8
      ascii(36, "data"); le32(40, n)
      samples.zipWithIndex.foreach { case (v, i) => out(44 + i) = v.toByte }
      out
    }
    val base = (0 until 320).map(i => 128 + ((i * 7) % 40 - 20))
    val doubled = base.map(v => 128 + 2 * (v - 128))
    assert(MediaDedup.audioTrendHash(wav(base)) ==
      MediaDedup.audioTrendHash(wav(doubled)),
      "x2 gain must be exactly invariant")
    // a reversed envelope is structurally different
    val hBase = MediaDedup.audioTrendHash(wav(base))
    val hRev = MediaDedup.audioTrendHash(wav(base.reverse))
    assert(java.lang.Long.bitCount(hBase ^ hRev) >= 16,
      "reversed audio should be far in hamming")
    // full pipeline over the planted table: every gain-doubled copy
    // lands in its original's cluster
    val media = MediaDedup.plantedAudioTable(spark, sf)
    val pairs = MediaDedup.nearDupPairs(
        MediaDedup.audioHashes(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      parent(x) = r; r
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    import org.apache.spark.sql.functions.col
    val planted = media.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("o")).as[Long].collect()
    planted.foreach(o => assert(find(o) == find(o + 1000000L),
      s"planted audio pair for $o not connected"))
  }

  test("videoFrameHash: regraded MP4 copies pair; GIF dispatches by bytes") {
    val media = MediaDedup.plantedVideoTable(spark, sf)
    val pairs = MediaDedup.nearDupPairs(
        MediaDedup.videoHashes(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      parent(x) = r; r
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    import org.apache.spark.sql.functions.col
    val planted = media.filter(col("doc_id") >= 1000000L)
      .select((col("doc_id") - 1000000L).as("o")).as[Long].collect()
    assert(planted.nonEmpty)
    planted.foreach(o => assert(find(o) == find(o + 1000000L),
      s"planted video pair for $o not connected"))
    // GIF path: deterministic and structure-sensitive
    val g1 = MediaDedup.videoFrameHash(
      graft.operators.Multimodal.MediaCodec.makeGif(24, 24, 3, 7L))
    val g2 = MediaDedup.videoFrameHash(
      graft.operators.Multimodal.MediaCodec.makeGif(24, 24, 3, 7L))
    assert(g1 == g2, "GIF hash must be deterministic")
    // a truncated MP4 is refused loudly, never a silent wrong hash
    val mp4 = graft.operators.Multimodal.MediaCodec.makeMp4(16, 16, 4, 3L)
    intercept[Exception] {
      MediaDedup.videoFrameHash(mp4.take(mp4.length / 2))
    }
  }

  test("audioTrendHash: corrupt WAVs are refused loudly") {
    val e = intercept[IllegalArgumentException] {
      MediaDedup.audioTrendHash("RIFFxxxxWAVEjunk".getBytes ++
        new Array[Byte](40))
    }
    assert(e.getMessage.contains("WAV"))
    intercept[IllegalArgumentException] {
      MediaDedup.audioTrendHash(new Array[Byte](10))
    }
  }

  test("banded LSH finds every pair within hamming 3 (pigeonhole recall)") {
    // distinct synthetic hashes: base patterns + variants at hamming 1-3
    val base = Seq(0x0123456789abcdefL, 0x00000000ffffffffL,
      -6148914691236517206L /* 0xaaaa... */)
    val hs = base.zipWithIndex.flatMap { case (h, i) =>
      Seq((i * 10L, h), (i * 10L + 1, h ^ 1L),
        (i * 10L + 2, h ^ (1L << 20) ^ (1L << 40)),
        (i * 10L + 3, h ^ (1L << 5) ^ (1L << 25) ^ (1L << 45)))
    }
    val got = MediaDedup.nearDupPairs(hs.toDF("doc_id", "ahash"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("identical hashes collapse to a rep-star, never all-pairs") {
    val hs = (1L to 20L).map(i => (i, 42L)) :+ ((100L, 43L))
    val pairs = MediaDedup.nearDupPairs(hs.toDF("doc_id", "ahash"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // 19 within-group star edges from rep 1, plus the rep-rep pair
    // (42 vs 43 is hamming 1-2: 42=101010, 43=101011 → 1)
    val within = pairs.filter(p => p._1 == 1L && p._3 == 0)
    assert(within.length == 19, s"star edges: ${within.length}")
    assert(pairs.length == 20, s"expected 20 rows, got ${pairs.length}")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 100L && p._3 == 1))
  }
}
