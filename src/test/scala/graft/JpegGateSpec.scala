package graft

import graft.ml.Multimodal
import graft.queries.MLQueries

/** Keeps the committed JPEG fixture pair honest (the lossy-codec analog
  * of GateFixtureSpec): the gate's oracle is a committed expected-stats
  * parquet, so these tests are what stop a decoder regression (or a
  * hand-edited fixture) from sliding through a green gate.
  */
class JpegGateSpec extends SparkSpec {

  private def payloads: Seq[(Long, Array[Byte])] =
    spark.read.parquet(s"${MLQueries.jpegFixtureDir}/payloads.parquet")
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Array[Byte]]("payload")))
      .sortBy(_._1).toSeq

  test("decoding the committed payloads reproduces the committed expected stats exactly") {
    val expected = spark.read.parquet(s"${MLQueries.jpegFixtureDir}/expected.parquet")
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("r_sum"), r.getAs[Long]("g_sum"), r.getAs[Long]("b_sum"))).toMap
    assert(expected.size === JpegGateFixtureGen.NImages)
    payloads.foreach { case (id, bytes) =>
      val j = Multimodal.decodeJpeg(bytes).get
      assert(expected(id) ===
        ((bytes.length.toLong, j.width, j.height, j.rSum, j.gSum, j.bSum)), s"media $id")
    }
  }

  test("decoded channel sums track the SOURCE pixels — a fake decoder cannot pass") {
    // the expected stats were pinned FROM a decode, so exactness alone
    // could self-confirm; this bound ties the decode to the pre-encoding
    // pixel values through the lossy round-trip (smooth gradients keep
    // JPEG error far below it)
    payloads.foreach { case (id, bytes) =>
      val j = Multimodal.decodeJpeg(bytes).get
      val (w, h) = JpegGateFixtureGen.geometry(id)
      assert(j.width === w.toLong && j.height === h.toLong)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = JpegGateFixtureGen.sourceRgb(id, w, h, x, y)
        sr += r; sg += g; sb += b
      }
      for ((dec, src, c) <- Seq((j.rSum, sr, "r"), (j.gSum, sg, "g"), (j.bSum, sb, "b")))
        assert(math.abs(dec - src) <= math.max(200L, src / 50),
          s"media $id channel $c: decoded $dec vs source $src")
    }
  }

  test("decodeJpeg is total on corrupted bytes and strict on magic") {
    val (_, good) = payloads.head
    // other formats' magics must not route through the JPEG decoder even
    // though ImageIO could decode them
    assert(Multimodal.decodeJpeg(Multimodal.synthPng(3L)).isEmpty)
    assert(Multimodal.decodeJpeg(Multimodal.synthPpm(3L)).isEmpty)
    assert(Multimodal.decodeJpeg(Array.empty[Byte]).isEmpty)
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 100) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeJpeg(b) // any result, never a throw
    }
    for (len <- 0 until good.length by 7) Multimodal.decodeJpeg(good.take(len))
  }

  test("featurize dispatch routes JPEG payloads through the real decoder") {
    import spark.implicits._
    val (id, bytes) = payloads.head
    val recs = Seq(Multimodal.MediaRecord(id, "image", bytes, None, None, None))
    val out = Multimodal.featurize(recs.toDS()).collect().head
    val j = Multimodal.decodeJpeg(bytes).get
    assert(out.width === Some(j.width) && out.height === Some(j.height))
    assert(out.duration_ms === None)
    val norm = math.sqrt(out.features.map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }
}
