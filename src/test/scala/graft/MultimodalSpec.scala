package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** The multimodal plumbing (binary columns, partition-parallel decode,
  * frame sampling, featurization) — the decode itself is a deterministic
  * stub, the Spark mechanics are real. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  test("media table: binary payload column with stable schema") {
    val m = Multimodal.mediaTable(spark, sf)
    val schema = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") == "binary" && schema("media_id") == "bigint")
    assert(m.count() == 500L)
  }

  test("decode: deterministic, one row per media, plausible dimensions") {
    val m = Multimodal.mediaTable(spark, sf)
    val d1 = Multimodal.decodeImages(m).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeImages(m).collect().sortBy(_.media_id)
    assert(d1.length == 500 && d1.sameElements(d2))
    d1.foreach { img =>
      assert(img.width >= 64 && img.width < 192 && img.channels == 3)
      assert(img.mean_luma > 0.0 && img.mean_luma < 256.0)
    }
  }

  test("decode preserves partitioning (no unintended shuffle)") {
    val m = Multimodal.mediaTable(spark, sf).repartition(7)
    assert(Multimodal.decodeImages(m).rdd.getNumPartitions == 7)
  }

  test("frame sampling: stride semantics") {
    val m = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.frameSample(m, 50)
    val byMedia = frames.collect().groupBy(_.media_id)
    val lens = Multimodal.mediaTable(spark, sf).collect()
      .map(x => x.media_id -> x.payload.length).toMap
    byMedia.foreach { case (id, fs) =>
      assert(fs.length == (lens(id) + 49) / 50)
    }
  }

  test("featurize: fixed-width normalized histogram embedding") {
    val emb = Multimodal.featurize(Multimodal.mediaTable(spark, sf), dim = 16)
    val rows = emb.collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(v.length == 16 && math.abs(v.sum - 1.0) < 1e-9)
    }
  }
}
