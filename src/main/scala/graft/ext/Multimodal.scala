package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (extension surface, SURVEY §7.6).
  *
  * Image/audio/video payloads are opaque `binary` columns with typed
  * metadata. Recognized still-image containers (JPEG, PNG, GIF) are
  * parsed for real — width/height/channels straight from the encoded
  * header bytes per the public container specs (ITU T.81 §B.2.2 for
  * JPEG SOFn, RFC 2083 §4.1.1 for PNG IHDR, GIF89a §18 for the
  * logical screen descriptor). Payloads that are not recognized media
  * (e.g. the UTF-8 text payloads the synthetic corpus carries) fall
  * back to [[MediaDecoder.synthetic]], the deterministic stand-in that
  * keeps the end-to-end pipeline runnable on text-only fixtures and
  * stays in lockstep with the oracle-checked [[featuresExpr]] twin.
  * Full-pixel decode (the libjpeg equivalent) is out of scope in this
  * container; the Spark-side shape — binary column schema,
  * per-partition batch decode via `mapPartitions` (the Scala analog
  * of `mapInPandas`: amortizes decoder init per partition, keeps
  * memory bounded to a partition), and the feature-struct output
  * schema a downstream trainer consumes — is real and tested.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte])
  /** Derived fields are Options: a null payload (null source text)
    * yields a row of nulls, matching [[featuresExpr]] — not an NPE.
    * `channels` is populated only for recognized media containers
    * (header-parsed); the synthetic fallback leaves it None. */
  case class MediaFeatures(doc_id: Long, n_bytes: Option[Long],
                           format: Option[String], width: Option[Long],
                           height: Option[Long], channels: Option[Long],
                           checksum: Option[Long])

  /** Attach a binary payload column. In production this is the raw
    * image/audio bytes column of the table; here it is derived from
    * text so the pipeline is runnable end-to-end. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Header metadata decoder. Dispatches on magic bytes: real parsing
    * for JPEG/PNG/GIF; [[synthetic]] fallback for everything else so a
    * text-derived payload still yields deterministic metadata (and
    * agrees with the DuckDB-expressible [[featuresExpr]]). Pure
    * byte-array arithmetic — no libraries, safe on any executor. */
  object MediaDecoder {
    final case class Decoded(format: String, width: Long, height: Long,
                             channels: Option[Long])

    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Long =
      ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
        (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

    /** JPEG (ITU T.81): walk the marker segments from SOI to the first
      * frame header SOFn (C0–CF minus C4 DHT / C8 JPG / CC DAC), which
      * carries sample precision, lines (height), samples-per-line
      * (width), and component count. Stops at SOS/EOI — a JPEG whose
      * entropy stream starts before any SOF is malformed. */
    def parseJpeg(b: Array[Byte]): Option[Decoded] = {
      if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return None // lost marker sync
        var j = i
        while (j + 1 < b.length && u8(b, j + 1) == 0xff) j += 1 // fill bytes
        val marker = u8(b, j + 1)
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          i = j + 2 // standalone marker, no length field
        } else if (marker == 0xd9 || marker == 0xda) {
          return None // EOI / SOS before any SOF
        } else {
          if (j + 3 >= b.length) return None
          val len = be16(b, j + 2)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (j + 9 >= b.length || len < 8) return None
            val h = be16(b, j + 5)
            val w = be16(b, j + 7)
            val nc = u8(b, j + 9)
            return Some(Decoded("jpeg", w.toLong, h.toLong, Some(nc.toLong)))
          }
          i = j + 2 + len
        }
      }
      None
    }

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

    /** PNG (RFC 2083): 8-byte signature, then IHDR must be the first
      * chunk — width/height as big-endian u32, colour type at byte 25
      * mapped to its channel count. */
    def parsePng(b: Array[Byte]): Option[Decoded] = {
      if (b.length < 26) return None
      if (!PngSig.indices.forall(k => u8(b, k) == PngSig(k))) return None
      if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
        return None
      val channels = u8(b, 25) match {
        case 0 => 1L // greyscale
        case 2 => 3L // truecolour
        case 3 => 1L // indexed
        case 4 => 2L // greyscale + alpha
        case 6 => 4L // truecolour + alpha
        case _ => return None
      }
      Some(Decoded("png", be32(b, 16), be32(b, 20), Some(channels)))
    }

    /** GIF87a/89a: 6-byte version signature, then the logical screen
      * descriptor's little-endian u16 width/height. Palette output is
      * RGB → 3 channels. */
    def parseGif(b: Array[Byte]): Option[Decoded] = {
      if (b.length < 10) return None
      val sig = new String(b, 0, 6, "US-ASCII")
      if (sig != "GIF87a" && sig != "GIF89a") return None
      Some(Decoded("gif", le16(b, 6).toLong, le16(b, 8).toLong, Some(3L)))
    }

    /** Deterministic stand-in for unrecognized payloads (the corpus'
      * text-derived bytes): metadata derived from byte length, kept
      * bit-identical to [[featuresExpr]] so the mapPartitions path and
      * the oracle-checked expression path agree on text fixtures. */
    def synthetic(payload: Array[Byte]): Decoded = {
      val n = payload.length.toLong
      val format = if (n % 2 == 0) "jpeg" else "png"
      Decoded(format, 64L + n % 640L, 64L + n % 480L, None)
    }

    def decode(payload: Array[Byte]): Decoded =
      parsePng(payload)
        .orElse(parseJpeg(payload))
        .orElse(parseGif(payload))
        .getOrElse(synthetic(payload))
  }

  /** Per-partition batch decode: one decoder per partition, streaming
    * iterator in/out (never materializes a partition in memory). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      // decoder init happens once per partition here
      it.map { rec =>
        if (rec.payload == null)
          MediaFeatures(rec.doc_id, None, None, None, None, None, None)
        else {
          val d = MediaDecoder.decode(rec.payload)
          val checksum = rec.payload.foldLeft(0L)((acc, b) =>
            (acc * 31 + (b & 0xff)) % 1000000007L)
          MediaFeatures(rec.doc_id, Some(rec.payload.length.toLong),
            Some(d.format), Some(d.width), Some(d.height), d.channels,
            Some(checksum))
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
    * stays behind [[MediaDecoder]], the MANIFEST is the Spark-side
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

  /** Asset-level exact dedup audit, per sniffed format: how much of
    * the media column is byte-identical payloads — the number that
    * decides whether a content-hash dedup pass pays for itself BEFORE
    * any decode work is scheduled (dup frames/images are the single
    * biggest decode-cost saving in web-scale multimodal ingest).
    * Hash = md5 over the payload bytes; per format: payload count,
    * distinct-hash count, total bytes, and dup mass in ppm. One
    * projection + one format-keyed aggregate — the hash shuffles
    * |formats| groups of partial aggregates, never the payloads. */
  def mediaDedup(docs: DataFrame): DataFrame = {
    val n = octet_length(encode(col("text"), "UTF-8")).cast("long")
    withPayload(docs)
      .select(
        when(n % 2 === 0, "jpeg").when(n.isNotNull, "png").as("format"),
        md5(col("payload")).as("__h"),
        n.as("__bytes"))
      .groupBy(col("format"))
      .agg(count(lit(1)).cast("long").as("n_media"),
        countDistinct(col("__h")).cast("long").as("n_distinct"),
        sum(col("__bytes")).cast("long").as("total_bytes"))
      .withColumn("dup_ppm", expr(
        "(cast(n_media - n_distinct as decimal(38,0)) * 1000000) " +
          "div n_media").cast("long"))
  }

  /** Audio segmentation manifest — the ASR-prep shape ([[frameSample]]
    * is video's; this is audio's): fixed `windowMs` windows at
    * `hopMs` stride over each asset's duration, emitted as
    * `(doc_id, duration_ms, seg_idx, start_ms, end_ms)` rows a
    * transcription/feature stage consumes (Whisper-style 30 s
    * windows with overlap are `windowMs=30000, hopMs=25000`). The
    * last window clips to the asset (`end_ms = least(start+window,
    * duration)`); every asset emits at least one segment.
    *
    * Duration derives from the payload by the declared synthetic
    * mapping (bytes DIV 2 = 16-bit mono samples at `sampleRate`,
    * +1 ms so an empty payload still has a manifest row) — in
    * production the decoded metadata column replaces that one
    * expression and NOTHING downstream changes. Scale shape: a
    * generator projection (`sequence` + `explode`) — no shuffle, no
    * join, ≤ duration/hop rows per asset. All int64 arithmetic. */
  def audioSegments(docs: DataFrame, windowMs: Int, hopMs: Int,
                    sampleRate: Int): DataFrame = {
    require(windowMs > 0 && hopMs > 0 && hopMs <= windowMs,
      s"need 0 < hopMs <= windowMs, got hop=$hopMs window=$windowMs")
    require(sampleRate > 0, s"sampleRate must be positive: $sampleRate")
    val durationMs = expr(
      "CAST(octet_length(encode(text, 'UTF-8')) AS BIGINT) div 2 " +
        s"* 1000 div $sampleRate + 1")
    docs.select(col("doc_id"), durationMs.as("duration_ms"))
      .withColumn("start_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1,
          lit(hopMs.toLong))))
      .select(col("doc_id"), col("duration_ms"),
        expr(s"start_ms DIV $hopMs").as("seg_idx"),
        col("start_ms"),
        least(col("start_ms") + windowMs, col("duration_ms"))
          .as("end_ms"))
  }

  /** DuckDB twin of [[audioSegments]]. */
  def audioSegmentsOracleSql(windowMs: Int, hopMs: Int,
                             sampleRate: Int): String =
    s"""
    |WITH m AS (
    |  SELECT doc_id,
    |    CAST(octet_length(encode(text)) AS BIGINT) // 2
    |      * 1000 // $sampleRate + 1 AS duration_ms
    |  FROM documents),
    |s AS (
    |  SELECT doc_id, duration_ms,
    |    unnest(range(0, duration_ms, $hopMs)) AS start_ms
    |  FROM m)
    |SELECT doc_id, duration_ms,
    |  CAST(start_ms // $hopMs AS BIGINT) AS seg_idx,
    |  CAST(start_ms AS BIGINT) AS start_ms,
    |  CAST(least(start_ms + $windowMs, duration_ms) AS BIGINT) AS end_ms
    |FROM s ORDER BY doc_id, seg_idx
    |""".stripMargin.trim

  /** DuckDB twin of [[mediaDedup]] over `documents` (md5 of the
    * UTF-8 payload bytes is md5 of the text on both engines). */
  val mediaDedupOracleSql: String =
    """
    |WITH m AS (
    |  SELECT CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'jpeg'
    |              WHEN octet_length(encode(text)) IS NOT NULL
    |                THEN 'png' END AS format,
    |    md5(text) AS h,
    |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    |  FROM documents)
    |SELECT format, CAST(count(*) AS BIGINT) AS n_media,
    |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
    |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
    |  CAST((CAST(count(*) AS HUGEINT) - count(DISTINCT h)) * 1000000
    |       // count(*) AS BIGINT) AS dup_ppm
    |FROM m GROUP BY format ORDER BY format
    |""".stripMargin.trim
}
