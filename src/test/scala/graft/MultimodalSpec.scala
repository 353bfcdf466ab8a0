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
}
