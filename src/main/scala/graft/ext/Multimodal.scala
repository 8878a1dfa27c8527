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
}
