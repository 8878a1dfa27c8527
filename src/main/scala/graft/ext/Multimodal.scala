package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (extension surface, SURVEY §7.6).
  *
  * Image/audio/video payloads are opaque `binary` columns with typed
  * metadata. The actual codec work is STUBBED (no media libraries in
  * this container — see [[StubDecoder]]): what is real and tested is
  * the Spark-side shape — binary column schema, per-partition batch
  * decode via `mapPartitions` (the Scala analog of `mapInPandas`:
  * amortizes decoder init per partition, keeps memory bounded to a
  * partition), and the feature-struct output schema a downstream
  * trainer would consume.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  /** Derived fields are Options: a null payload (null source text)
    * yields a row of nulls, matching [[featuresExpr]] — not an NPE. */
  case class MediaFeatures(doc_id: Long, n_bytes: Option[Long],
                           format: Option[String], width: Option[Long],
                           height: Option[Long], checksum: Option[Long])

  /** Attach a binary payload column. In production this is the raw
    * image/audio bytes column of the table; here it is derived from
    * text so the pipeline is runnable end-to-end. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Deterministic fake decoder standing in for e.g. libjpeg. A real
    * deployment swaps only this object; the Spark plumbing (partition
    * batching, schema) is unchanged. */
  object StubDecoder {
    def decode(payload: Array[Byte]): (String, Long, Long) = {
      val n = payload.length.toLong
      // ??? real codec goes here; fake metadata derived from bytes
      val format = if (n % 2 == 0) "jpeg" else "png"
      (format, 64L + n % 640L, 64L + n % 480L)
    }
  }

  /** Per-partition batch decode: one decoder per partition, streaming
    * iterator in/out (never materializes a partition in memory). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // decoder init happens once per partition here
      it.map { rec =>
        if (rec.payload == null)
          MediaFeatures(rec.doc_id, None, None, None, None, None)
        else {
          val (format, w, h) = StubDecoder.decode(rec.payload)
          val checksum = rec.payload.foldLeft(0L)((acc, b) =>
            (acc * 31 + (b & 0xff)) % 1000000007L)
          MediaFeatures(rec.doc_id, Some(rec.payload.length.toLong),
            Some(format), Some(w), Some(h), Some(checksum))
        }
      }
    }
  }

  /** Expression-only twin of the stub decode, used by the declared
    * oracle query (pure column ops — DuckDB-expressible; the
    * mapPartitions path is covered by ScalaTest instead). */
  def featuresExpr(docs: DataFrame): DataFrame = {
    val n = octet_length(encode(col("text"), "UTF-8")).cast("long")
    docs.select(col("doc_id"),
      n.as("n_bytes"),
      // no otherwise: a null payload has null format (the old
      // .otherwise("png") labeled missing media as png)
      when(n % 2 === 0, "jpeg").when(n.isNotNull, "png").as("format"),
      (lit(64L) + n % 640L).as("width"),
      (lit(64L) + n % 480L).as("height"))
  }

  val featuresOracleSql: String =
    """
    |SELECT doc_id,
    |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
    |  CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'jpeg'
    |       WHEN octet_length(encode(text)) IS NOT NULL THEN 'png' END AS format,
    |  64 + CAST(octet_length(encode(text)) AS BIGINT) % 640 AS width,
    |  64 + CAST(octet_length(encode(text)) AS BIGINT) % 480 AS height
    |FROM documents ORDER BY doc_id
    |""".stripMargin.trim

  /** Video frame-sampling manifest: for each media row, the uniform
    * stride sample of its frames — one output row per (doc, sampled
    * frame) with the frame index and its millisecond timestamp. This
    * is the step that turns a video column into the per-frame work
    * list a decode/caption/embed stage consumes; the decode itself
    * stays behind [[StubDecoder]], the MANIFEST is the Spark-side
    * plumbing and is exact.
    *
    * `n_frames` comes from container metadata in production; here it
    * derives from payload length so the op runs end-to-end. Stride =
    * max(1, n_frames div targetFrames) — at most ~2·targetFrames rows
    * per doc, never fewer than 1.
    *
    * Scale shape: `sequence` + `explode` is a generator projection —
    * no shuffle, no join, output bounded by targetFrames per row.
    * All arithmetic is int64 (div/mod), engine-portable. */
  def frameSample(docs: DataFrame, targetFrames: Int,
                  fps: Int): DataFrame = {
    require(targetFrames > 0, s"targetFrames must be positive: $targetFrames")
    require(fps > 0, s"fps must be positive: $fps")
    val nFrames = expr(
      "CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) div 16 + 1")
    val step = greatest(lit(1L), expr(s"n_frames div $targetFrames"))
    docs.select(col("doc_id"), nFrames.as("n_frames"))
      .withColumn("frame_idx",
        explode(sequence(lit(0L), col("n_frames") - 1, step)))
      .withColumn("ts_ms", expr(s"frame_idx * 1000 div $fps"))
  }

  def frameSampleOracleSql(targetFrames: Int, fps: Int): String =
    s"""
    |WITH m AS (
    |  SELECT doc_id,
    |    CAST(octet_length(encode(text)) AS BIGINT) // 16 + 1 AS n_frames
    |  FROM documents),
    |f AS (
    |  SELECT doc_id, n_frames,
    |    unnest(range(0, n_frames,
    |      greatest(1, n_frames // $targetFrames))) AS frame_idx
    |  FROM m)
    |SELECT doc_id, n_frames, CAST(frame_idx AS BIGINT) AS frame_idx,
    |  frame_idx * 1000 // $fps AS ts_ms
    |FROM f ORDER BY doc_id, frame_idx
    |""".stripMargin.trim
}
