package graft

import graft.ml.Multimodal

/** Multimodal binary plumbing: schema, determinism, partition-invariance. */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private lazy val media =
    Multimodal.documentsAsMedia(spark, "/root/testdata/sf0.001")

  test("payloads stay binary and kinds partition the corpus") {
    val kinds = media.groupByKey(_.kind).count().collect().toMap
    assert(kinds.keySet === Set("image", "audio", "video"))
    assert(kinds.values.sum === 500)
  }

  test("featurize emits fixed-dim L2-normalized features + frame offsets") {
    val f = Multimodal.featurize(media, frames = 4).collect()
    assert(f.length === 500)
    assert(f.forall(_.features.length === Multimodal.FeatureDim))
    f.take(20).foreach { r =>
      val norm = math.sqrt(r.features.map(v => v.toDouble * v).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
      assert(r.frame_offsets.length === 4)
      assert(r.frame_offsets.toSeq === r.frame_offsets.sorted.toSeq)
      assert(r.frame_offsets.forall(o => o >= 0 && o < r.n_bytes))
    }
  }

  test("repartitioning does not change results (decode is deterministic)") {
    val a = Multimodal.featurize(media).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    val b = Multimodal.featurize(media, coPartitions = Some(7)).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    assert(a === b)
  }
}
