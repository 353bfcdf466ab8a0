package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11): media treated as opaque
  * `BINARY` payloads + a typed metadata struct, with decode / feature
  * extraction as a per-partition batch operator.
  *
  * The actual byte-level decoders (JPEG/audio/video) are STUBBED — this
  * container has no media libraries — behind [[FakeDecoder]], a
  * deterministic fake. Everything Spark-side is real and tested: schema,
  * binary column handling, partition-batched extraction (`mapPartitions`,
  * the Scala analog of `mapInPandas` — one decoder init per partition, not
  * per row), and the pushdown-friendly metadata projection.
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

  /** Deterministic stand-in for an image/audio decoder. Real deployments
    * swap this for an actual codec; the Spark plumbing is unchanged. */
  object FakeDecoder extends Serializable {
    def decode(payload: Array[Byte], mediaType: String): (Int, Int, Int, Array[Float]) = {
      val n = payload.length
      val width = 64 + (n % 576)           // fake 64..639 px
      val height = 64 + ((n / 7) % 576)
      val frames = if (mediaType == "video") 1 + n % 30 else 1
      // 8-dim "embedding": byte histogram folded mod 8, L1-normalized.
      val hist = new Array[Float](8)
      var i = 0
      while (i < n) { hist((payload(i) & 0xff) % 8) += 1f; i += 1 }
      val total = math.max(1f, n.toFloat)
      (width, height, frames, hist.map(_ / total))
    }
  }

  /** Build the media table from `documents` (text bytes as stand-in
    * payloads — deterministic, so oracle-checkable). */
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

  /** Batched feature extraction: one decoder per partition, rows streamed
    * through it — the `mapInPandas` shape, natively in Scala. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec contexts, models…)
      rows.map { r =>
        val (w, h, f, feat) = FakeDecoder.decode(r.payload, r.media_type)
        MediaFeatures(r.doc_id, r.media_type, r.byte_len, w, h, f, feat)
      }
    }
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

    // Full decode path through the stubbed per-partition extractor —
    // exercises the mapPartitions batch shape end-to-end. The stub's
    // metadata outputs are pure functions of payload length, so the oracle
    // recomputes them in SQL — verifying the whole Dataset[T] round-trip
    // (encode → mapPartitions decode → DataFrame) against an independent
    // derivation. The float feature vector is covered by ScalaTest.
    "q47_media_features" -> ((s, d) => {
      import s.implicits._
      val media = mediaTable(s, d)
        .select("doc_id", "media_type", "payload", "byte_len", "content_hash")
        .as[MediaRecord]
      extractFeatures(media)
        .toDF()
        .select(col("doc_id"), col("media_type"), col("byte_len"),
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
      import s.implicits._
      val media = mediaTable(s, d)
        .select("doc_id", "media_type", "payload", "byte_len", "content_hash")
        .as[MediaRecord]
      extractFeatures(media).toDF()
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

    // Frame sampling for videos: every 5th frame index from the decoded
    // frame count — the manifest a frame-extraction stage consumes. The
    // explode is map-side (rows × ≤6 at 30 fps-stub); no shuffle before
    // the final presentation sort.
    "q57_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = mediaTable(s, d)
        .select("doc_id", "media_type", "payload", "byte_len", "content_hash")
        .as[MediaRecord]
      extractFeatures(media).toDF()
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

    "q47_media_features" ->
      """WITH m AS (
           SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
               ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS n
           FROM documents)
         SELECT doc_id, media_type, CAST(n AS BIGINT) AS byte_len,
           CAST(64 + (n % 576) AS INT) AS width,
           CAST(64 + ((n // 7) % 576) AS INT) AS height,
           CAST(CASE WHEN media_type = 'video' THEN 1 + n % 30 ELSE 1 END
             AS INT) AS n_frames
         FROM m ORDER BY doc_id""",

    "q46_media_manifest" ->
      """SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
             ELSE 'video' END AS media_type,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS content_hash
         FROM documents ORDER BY doc_id""",

    "q56_media_resize" ->
      """WITH m AS (
           SELECT doc_id, octet_length(encode(text)) AS n
           FROM documents WHERE doc_id % 3 = 0),
         d AS (SELECT doc_id,
           CAST(64 + (n % 576) AS INT) AS width,
           CAST(64 + ((n // 7) % 576) AS INT) AS height FROM m)
         SELECT doc_id, width, height,
           CAST(CASE WHEN greatest(width, height) > 224
             THEN (width * 224) // greatest(width, height)
             ELSE width END AS INT) AS out_w,
           CAST(CASE WHEN greatest(width, height) > 224
             THEN (height * 224) // greatest(width, height)
             ELSE height END AS INT) AS out_h
         FROM d ORDER BY doc_id""",

    "q57_frame_sample" ->
      """WITH m AS (
           SELECT doc_id, octet_length(encode(text)) AS n
           FROM documents WHERE doc_id % 3 = 2),
         v AS (SELECT doc_id, CAST(1 + n % 30 AS INT) AS n_frames FROM m)
         SELECT doc_id, n_frames,
           CAST(unnest(range(0, n_frames, 5)) AS BIGINT) AS frame_idx
         FROM v ORDER BY doc_id, frame_idx""")
}
