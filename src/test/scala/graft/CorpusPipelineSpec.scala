package graft

import org.apache.spark.sql.functions._

import graft.ext.CorpusPipeline

class CorpusPipelineSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("prepare: stages only shrink the corpus, and the shape is complete") {
    val (out, counts) = CorpusPipeline.prepare(docs,
      evalPred = col("source") === "src19")
    val byStage = counts.map(c => c.stage -> c.rows).toMap
    assert(counts.map(_.stage) == Seq("input", "quality_gate",
      "exact_dedup", "neardup_best_keep", "contamination_gate",
      "stratified_sample", "split_assign"))
    // monotone: no stage may grow the corpus
    counts.map(_.rows).sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"stage grew: $counts")
    }
    assert(byStage("input") == docs.count())
    // the fixture plants exact and near duplicates -> both dedup
    // stages must actually fire
    assert(byStage("exact_dedup") < byStage("quality_gate"))
    assert(byStage("neardup_best_keep") < byStage("exact_dedup"))
    // eval docs never survive into the training corpus
    assert(out.filter(col("source") === "src19").count() == 0)
    // final frame carries quality + sampling + split columns
    val cols = out.columns.toSet
    assert(Set("doc_id", "text", "lang", "source", "quality",
      "bucket1k", "rate_permille", "bucket", "split").subsetOf(cols))
    assert(out.select("split").distinct().count() <= 3)
    assert(byStage("split_assign") == out.count())
  }

  test("prepare is deterministic: a rerun yields the identical corpus") {
    val (a, _) = CorpusPipeline.prepare(docs,
      evalPred = col("source") === "src19", countStages = false)
    val (b, _) = CorpusPipeline.prepare(docs,
      evalPred = col("source") === "src19", countStages = false)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("prepare: surviving near-dup representatives are the best of their group") {
    val (out, _) = CorpusPipeline.prepare(docs,
      evalPred = col("source") === "src19", countStages = false)
    // no surviving pair of docs is a direct near-duplicate
    val pairs = graft.ext.Dedup.simhashPairs(
      graft.ext.Dedup.simhash(out.select("doc_id", "text"),
        col("doc_id"), col("text")), 3)
    assert(pairs.isEmpty, "prepared corpus still contains near-dup pairs")
  }

  test("preparePack packs exactly the surviving train docs, densely") {
    val evalPred = col("source") === "src19"
    val packed = CorpusPipeline.preparePack(docs, evalPred,
      budget = 128, nShards = 4).collect()
    val (corpus, _) = CorpusPipeline.prepare(docs, evalPred,
      countStages = false)
    val train = corpus.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(packed.map(_.getLong(0)).toSet == train,
      "packed set must be the prepared train split, nothing else")
    // dense offsets over the FINAL corpus: per shard the prefix sum
    // has no holes where dropped docs used to be
    packed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("tokens_before") == run,
          s"hole before doc ${r.getLong(0)}")
        run += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("preparePackScrubbed: scrub only shrinks docs, offsets stay dense") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plain = CorpusPipeline.preparePack(docs,
        col("source") === "src19", 1024, 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_tokens")).toMap
    val scrubbed = CorpusPipeline.preparePackScrubbed(docs,
      col("source") === "src19", 1024, 4).collect()
    assert(scrubbed.nonEmpty)
    // scrubbed docs are a subset of the plain pack, never longer
    scrubbed.foreach { r =>
      val id = r.getLong(0)
      assert(plain.contains(id), s"doc $id appeared from nowhere")
      assert(r.getAs[Long]("n_tokens") <= plain(id),
        s"scrub grew doc $id")
    }
    // dense offsets hold over the scrubbed stream too
    scrubbed.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("tokens_before") == run)
        run += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("funnel rows equal prepare's own StageCount accounting") {
    val pred = col("source") === "src3"
    val rows = CorpusPipeline.funnel(docs, pred).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val (_, counts) = CorpusPipeline.prepare(docs, pred)
    assert(rows.map(_._2).toSeq == counts.map(_.stage),
      "stage names/order drifted between funnel and prepare")
    assert(rows.map(_._3).toSeq == counts.map(_.rows),
      s"counts drifted: funnel=${rows.map(_._3).mkString(",")} " +
        s"prepare=${counts.map(_.rows).mkString(",")}")
    // the waterfall only narrows until split assignment (which is 1:1)
    rows.init.zip(rows.tail).foreach { case ((_, s1, n1), (_, s2, n2)) =>
      assert(n2 <= n1 || s2 == "split_assign", s"$s1 -> $s2 grew: $n1 -> $n2")
    }
  }
}
