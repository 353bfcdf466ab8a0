package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  test("q56 resize: fits within 224, aspect preserved, no upscaling") {
    val r = Multimodal.queries("q56_media_resize")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (w, h) = (row.getInt(1), row.getInt(2))
      val (ow, oh) = (row.getInt(3), row.getInt(4))
      val m = math.max(w, h)
      if (m > 224) {
        assert(math.max(ow, oh) <= 224, s"doc ${row.getLong(0)} not fit")
        // integer-floor scaling of both dims by the same ratio
        assert(ow == w * 224 / m && oh == h * 224 / m)
      } else assert(ow == w && oh == h) // never upscale
      assert(ow >= 1 && oh >= 1)
    }
  }

  test("q57 frame sample: stride-5 indices within the decoded frame count") {
    val r = Multimodal.queries("q57_frame_sample")(spark, sf).collect()
    assert(r.nonEmpty)
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val n = rows.head.getInt(1)
      val idx = rows.map(_.getLong(2)).sorted.toSeq
      assert(idx == (0L until n by 5).toSeq)
    }
    // videos only
    val videoIds = Multimodal.mediaTable(spark, sf)
      .filter($"media_type" === "video").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(r.map(_.getLong(0)).toSet.subsetOf(videoIds))
  }

  test("MediaCodec PNG round-trip: dims and exact pixel histogram") {
    import graft.operators.Multimodal.MediaCodec
    val (w, h, seed) = (37, 21, 42L)
    val bytes = MediaCodec.makePng(w, h, seed)
    // PNG magic — the payload is a real file, not a labeled blob
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
    val (dw, dh, nf, hist) = MediaCodec.decode(bytes, "image")
    assert(dw == w && dh == h && nf == 1)
    // recompute the histogram from the generator's pixel formula — PNG is
    // lossless, so the decoded histogram must match exactly
    val expected = new Array[Float](8)
    for (y <- 0 until h; x <- 0 until w)
      expected(((x * 7 + y * 13 + seed * 31) & 0xff).toInt % 8) += 1f
    val total = (w * h).toFloat
    (0 until 8).foreach { i =>
      assert(math.abs(hist(i) - expected(i) / total) < 1e-6f, s"bin $i")
    }
  }

  test("MediaCodec WAV round-trip: RIFF header parsed, sample count exact") {
    import graft.operators.Multimodal.MediaCodec
    val bytes = MediaCodec.makeWav(1234, 7L)
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    val (n, one, nf, hist) = MediaCodec.decode(bytes, "audio")
    assert(n == 1234 && one == 1 && nf == 1)
    assert(math.abs(hist.sum - 1.0f) < 1e-5f)
  }

  test("MediaCodec GIF round-trip: frame count and dims from real decode") {
    import graft.operators.Multimodal.MediaCodec
    val bytes = MediaCodec.makeGif(24, 18, 7, 99L)
    assert(new String(bytes, 0, 3, "US-ASCII") == "GIF")
    val (w, h, nf, hist) = MediaCodec.decode(bytes, "video")
    assert(w == 24 && h == 18 && nf == 7)
    assert(math.abs(hist.sum - 1.0f) < 1e-5f)
  }

  test("MediaCodec MP4: real box walk — dims, frames, duration, exact histogram") {
    import graft.operators.Multimodal.MediaCodec
    val (w, h, frames, seed) = (24, 18, 7, 99L)
    val bytes = MediaCodec.makeMp4(w, h, frames, seed)
    // genuinely ISO-BMFF: ftyp box leads
    assert(new String(bytes, 4, 4, "US-ASCII") == "ftyp")
    val info = MediaCodec.parseMp4(bytes)
    assert(info.width == w && info.height == h && info.nFrames == frames)
    assert(info.timescale == 1000 && info.durationMs == frames * 40L)
    assert(info.sampleSize == w * h)
    // decode dispatches on the bytes under the same "video" label as GIF
    val (dw, dh, nf, hist) = MediaCodec.decode(bytes, "video")
    assert(dw == w && dh == h && nf == frames)
    // raw-gray payload is lossless: frame-0 histogram matches the pixel
    // formula exactly (and therefore matches the equivalent GIF's)
    val expected = new Array[Float](8)
    for (y <- 0 until h; x <- 0 until w)
      expected(((x * 7 + y * 13 + seed * 31) & 0xff).toInt % 8) += 1f
    (0 until 8).foreach { i =>
      assert(math.abs(hist(i) - expected(i) / (w * h)) < 1e-6f, s"bin $i")
    }
    val (_, _, _, gifHist) =
      MediaCodec.decode(MediaCodec.makeGif(w, h, frames, seed), "video")
    (0 until 8).foreach(i => assert(math.abs(hist(i) - gifHist(i)) < 1e-6f))
  }

  test("corrupt MP4s quarantine: truncation, zero-size box, sample-table overrun") {
    import graft.operators.Multimodal.{MediaCodec, MediaRecord}
    val good = MediaCodec.makeMp4(20, 12, 3, 7L)
    // moov truncated mid-box
    val truncated = good.take(good.length - 20)
    // a size=0 box after ftyp: the classic infinite-walk corruption —
    // must throw (bounded), not hang
    val zeroSize = good.take(24) ++ Array[Byte](0, 0, 0, 0) ++
      "junk".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0)
    // ftyp magic over garbage: no moov to find
    val garbage = good.take(24) ++ Array.fill[Byte](40)(9)
    Seq(truncated, zeroSize, garbage).foreach { bad =>
      intercept[Exception](MediaCodec.parseMp4(bad))
    }
    val rows = Seq(
      MediaRecord(1L, "video", good, good.length.toLong, "a"),
      MediaRecord(2L, "video", truncated, truncated.length.toLong, "b"),
      MediaRecord(3L, "video", zeroSize, zeroSize.length.toLong, "c"),
      MediaRecord(4L, "video", garbage, garbage.length.toLong, "d"))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val ok = Multimodal.extractFeaturesSafe(ds).collect()
    assert(ok.map(_.doc_id).toSeq == Seq(1L), "only the intact MP4 decodes")
    assert(ok.head.width == 20 && ok.head.height == 12 && ok.head.n_frames == 3)
    assert(Multimodal.extractRejects(ds).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
  }

  test("q109 MP4 manifest fields equal the generator formulas (full pipeline)") {
    val r = Multimodal.queries("q109_mp4_manifest")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val id = row.getLong(0)
      val (w, h, nf) = (16 + id % 32, 16 + (id / 3) % 32, 1 + id % 10)
      assert(row.getInt(1) == w && row.getInt(2) == h && row.getInt(3) == nf)
      assert(row.getLong(4) == nf * 40)
      assert(row.getInt(5) == 1000)
      assert(row.getLong(6) == w * h * nf)
    }
  }

  test("video container mix: even ids MP4, odd ids GIF, one decode surface") {
    import graft.operators.Multimodal.MediaCodec
    val mp4 = MediaCodec.makeMedia(8L, "video") // even → ISO-BMFF
    val gif = MediaCodec.makeMedia(5L, "video") // odd → GIF
    assert(new String(mp4, 4, 4, "US-ASCII") == "ftyp")
    assert(new String(gif, 0, 3, "US-ASCII") == "GIF")
    val (w8, h8, f8, _) = MediaCodec.decode(mp4, "video")
    assert(w8 == 16 + 8 % 32 && h8 == 16 + (8 / 3) % 32 && f8 == 1 + 8 % 10)
    val (w5, h5, f5, _) = MediaCodec.decode(gif, "video")
    assert(w5 == 16 + 5 % 32 && h5 == 16 + (5 / 3) % 32 && f5 == 1 + 5 % 10)
  }

  test("corrupt payloads: safe extractor drops them, rejects manifest catches them") {
    import graft.operators.Multimodal.{MediaCodec, MediaRecord}
    val good = MediaCodec.makePng(20, 20, 1L)
    val truncated = good.take(30) // cut mid-IHDR: undecodable
    val mislabeled = MediaCodec.makeWav(100, 2L) // WAV bytes labeled image
    val rows = Seq(
      MediaRecord(1L, "image", good, good.length.toLong, "a"),
      MediaRecord(2L, "image", truncated, 30L, "b"),
      MediaRecord(3L, "image", mislabeled, mislabeled.length.toLong, "c"),
      MediaRecord(4L, "audio", Array[Byte](1, 2, 3), 3L, "d"))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val ok = Multimodal.extractFeaturesSafe(ds).collect()
    assert(ok.map(_.doc_id).toSet == Set(1L), "only the intact PNG decodes")
    assert(ok.head.width == 20 && ok.head.height == 20)
    val rejects = Multimodal.extractRejects(ds).collect()
    assert(rejects.map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
    rejects.foreach(r => assert(r.getString(3).nonEmpty, "reject carries a reason"))
  }

  test("MediaCodec JPEG: real SOI-magic bytes, exact dims, corrupt quarantine") {
    import Multimodal.{MediaCodec, MediaRecord}
    val jpg = MediaCodec.makeJpeg(20, 12, 7L)
    // genuinely a JPEG: SOI marker + JFIF/Exif APP segment
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8,
      "payload does not start with the JPEG SOI marker")
    val (w, h, nf, hist) = MediaCodec.decode(jpg, "image")
    assert(w == 20 && h == 12 && nf == 1, s"JPEG dims ($w,$h,$nf)")
    // lossy codec: the histogram is a valid distribution over DECODED
    // pixels (sums to 1), not necessarily the source histogram
    assert(math.abs(hist.sum - 1f) < 1e-4)
    // corrupt JPEGs quarantine instead of failing the job: a truncated
    // file and SOI-prefixed garbage both reject, the intact row survives
    val rows = Seq(
      MediaRecord(1L, "image", jpg, jpg.length.toLong, "a"),
      MediaRecord(2L, "image", jpg.take(60), 60L, "b"),
      MediaRecord(3L, "image",
        Array[Byte](0xff.toByte, 0xd8.toByte) ++ Array.fill[Byte](40)(9), 42L, "c"))
    val ds = spark.createDataset(rows)(
      org.apache.spark.sql.Encoders.product[MediaRecord])
    val ok = Multimodal.extractFeaturesSafe(ds).collect()
    assert(ok.map(_.doc_id).toSeq == Seq(1L), "only the intact JPEG decodes")
    assert(Multimodal.extractRejects(ds).collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("q106 decoded JPEG dims equal the generator formulas (full pipeline)") {
    val r = Multimodal.queries("q106_jpeg_features")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val id = row.getLong(0)
      assert(row.getInt(1) == 16 + id % 40)
      assert(row.getInt(2) == 16 + (id / 3) % 40)
      assert(row.getInt(3) == 1)
    }
  }

  test("q47 decoded dims equal the generator formulas (full pipeline)") {
    val r = Multimodal.queries("q47_media_features")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val id = row.getLong(0)
      val (w, h, nf) = (row.getInt(2), row.getInt(3), row.getInt(4))
      (id % 3) match {
        case 0 =>
          assert(w == 16 + id % 48 + (if (id % 5 == 0) 240 else 0))
          assert(h == 16 + (id / 3) % 48 + (if (id % 7 == 0) 240 else 0))
          assert(nf == 1)
        case 1 =>
          assert(w == 800 + id % 1600 && h == 1 && nf == 1)
        case _ =>
          assert(w == 16 + id % 32)
          assert(h == 16 + (id / 3) % 32)
          assert(nf == 1 + id % 10)
      }
    }
  }
}
