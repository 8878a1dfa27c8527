package graft

import org.apache.spark.sql.functions._

import graft.ext.Multimodal

class MultimodalSpec extends SparkSpec {

  test("mapPartitions decode path: schema, row-count, determinism") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = Multimodal.withPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[Multimodal.MediaRecord]
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() == docs.count())
    // deterministic: run twice, same checksums
    val a = feats.orderBy("doc_id").collect().map(f => (f.doc_id, f.checksum))
    val b = Multimodal.decodeFeatures(media).orderBy("doc_id").collect()
      .map(f => (f.doc_id, f.checksum))
    assert(a.toSeq == b.toSeq)
    // payload length survives the decode
    val sizes = feats.filter(col("n_bytes") <= 0).count()
    assert(sizes == 0)
  }

  test("expression twin agrees with mapPartitions stub on shared fields") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exprSide = Multimodal.featuresExpr(docs)
      .select("doc_id", "n_bytes", "format", "width", "height")
    val media = Multimodal.withPayload(docs)
      .select(col("doc_id"), col("payload")).as[Multimodal.MediaRecord]
    val dsSide = Multimodal.decodeFeatures(media)
      .select("doc_id", "n_bytes", "format", "width", "height")
    assert(exprSide.exceptAll(dsSide).count() == 0)
    assert(dsSide.exceptAll(exprSide).count() == 0)
  }

  test("MediaDecoder returns true dimensions for real encoded images") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    import Multimodal.MediaDecoder
    def encodeImg(fmt: String, w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      // non-uniform pixels so the encoder can't degenerate-case the file
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK cannot encode $fmt")
      bos.toByteArray
    }
    val png = MediaDecoder.decode(
      encodeImg("png", 321, 87, BufferedImage.TYPE_INT_RGB))
    assert(png.format == "png" && png.width == 321 && png.height == 87 &&
      png.channels.contains(3L))
    val pngA = MediaDecoder.decode(
      encodeImg("png", 40, 23, BufferedImage.TYPE_INT_ARGB))
    assert(pngA.format == "png" && pngA.width == 40 && pngA.height == 23 &&
      pngA.channels.contains(4L))
    val jpg = MediaDecoder.decode(
      encodeImg("jpg", 640, 479, BufferedImage.TYPE_INT_RGB))
    assert(jpg.format == "jpeg" && jpg.width == 640 && jpg.height == 479 &&
      jpg.channels.contains(3L))
    val gif = MediaDecoder.decode(
      encodeImg("gif", 130, 66, BufferedImage.TYPE_INT_RGB))
    assert(gif.format == "gif" && gif.width == 130 && gif.height == 66)
    // and through the distributed mapPartitions path
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRecord(1L, encodeImg("png", 321, 87,
        BufferedImage.TYPE_INT_RGB)),
      Multimodal.MediaRecord(2L, encodeImg("jpg", 640, 479,
        BufferedImage.TYPE_INT_RGB)),
      Multimodal.MediaRecord(3L, "plain text payload".getBytes("UTF-8"))
    ).toDS()
    val feats = Multimodal.decodeFeatures(media)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).width.contains(321L) && feats(1L).height.contains(87L))
    assert(feats(2L).width.contains(640L) && feats(2L).height.contains(479L))
    // unrecognized payload falls back to the synthetic featuresExpr twin
    val n = "plain text payload".getBytes("UTF-8").length
    assert(feats(3L).width.contains(64L + n % 640) && feats(3L).channels.isEmpty)
  }

  test("frameSample: uniform stride covering frame 0, bounded per doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val target = 8
    val rows = Multimodal.frameSample(docs, target, 4).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (id, fs) =>
      val n = fs.head.getAs[Long]("n_frames")
      val idx = fs.map(_.getAs[Long]("frame_idx")).sorted
      assert(idx.head == 0, s"doc $id must sample frame 0")
      assert(idx.last < n, s"doc $id sampled past its last frame")
      assert(idx.distinct.length == idx.length)
      val step = math.max(1L, n / target)
      assert(idx.zip(idx.tail).forall { case (a, b) => b - a == step },
        s"doc $id stride not uniform")
      assert(fs.length <= 2 * target,
        s"doc $id emitted ${fs.length} frames (> 2x target)")
      fs.foreach(r => assert(
        r.getAs[Long]("ts_ms") == r.getAs[Long]("frame_idx") * 1000 / 4))
    }
  }

  test("mediaDedup: distinct <= count, a planted dup moves dup_ppm") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val base = Multimodal.mediaDedup(docs).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_media"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("dup_ppm"))).toMap
    assert(base.nonEmpty)
    base.values.foreach { case (n, d, ppm) =>
      assert(d <= n)
      assert(ppm == (BigInt(n - d) * 1000000 / BigInt(n)).toLong)
    }
    // duplicate the whole corpus: every payload now appears twice, so
    // per-format n doubles, distinct stays, dup mass >= 500000 ppm
    val doubled = Multimodal.mediaDedup(
      docs.unionByName(docs)).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_media"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("dup_ppm"))).toMap
    doubled.foreach { case (f, (n, d, ppm)) =>
      assert(n == 2 * base(f)._1 && d == base(f)._2)
      assert(ppm >= 500000L)
    }
  }

  test("audioSegments: hop-strided windows tile the duration, last " +
      "window clips, empty payload still emits one segment") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 320), (2L, "")).toDF("doc_id", "text")
    // doc 1: 320 bytes -> 160 samples -> 10 ms + 1 = 11 ms duration
    // doc 2: 0 bytes -> 1 ms duration
    val got = Multimodal.audioSegments(docs, windowMs = 4, hopMs = 3,
        sampleRate = 16000)
      .orderBy("doc_id", "seg_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(_._2).forall(_ == 11L))
    assert(d1.map(t => (t._3, t._4, t._5)).toSeq == Seq(
      (0L, 0L, 4L), (1L, 3L, 7L), (2L, 6L, 10L), (3L, 9L, 11L)),
      s"doc 1 segments drifted: ${d1.toSeq}")
    val d2 = got.filter(_._1 == 2L)
    assert(d2.map(t => (t._2, t._3, t._4, t._5)).toSeq ==
      Seq((1L, 0L, 0L, 1L)),
      s"empty payload must emit exactly one clipped segment: ${d2.toSeq}")
  }
}
