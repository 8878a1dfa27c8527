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
}
