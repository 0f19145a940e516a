package graft

import graft.ml.Multimodal
import graft.queries.MLQueries

/** Keeps the committed GIF/BMP fixture pairs honest (JpegGateSpec's
  * pattern for the palette and lossless-truecolor formats). Stronger
  * than the JPEG closeness bound: both encodes are EXACT (explicit
  * ≤64-color palettes for GIF, uncompressed 24-bit for BMP), so decoded
  * channel sums must EQUAL the source pixel sums — a bound no fake
  * decoder can meet, and one that is JDK-independent (no IDCT rounding
  * to drift on a toolchain upgrade).
  */
class GifBmpGateSpec extends SparkSpec {

  private def payloads(dir: String): Seq[(Long, Array[Byte])] =
    spark.read.parquet(s"$dir/payloads.parquet")
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Array[Byte]]("payload")))
      .sortBy(_._1).toSeq

  test("decoding the committed GIFs reproduces the committed expected stats exactly") {
    val expected = spark.read.parquet(s"${MLQueries.gifFixtureDir}/expected.parquet")
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("n_frames"),
          r.getAs[Long]("r_sum"), r.getAs[Long]("g_sum"), r.getAs[Long]("b_sum"))).toMap
    assert(expected.size === GifBmpGateFixtureGen.NImages)
    payloads(MLQueries.gifFixtureDir).foreach { case (id, bytes) =>
      val g = Multimodal.decodeGif(bytes).get
      assert(expected(id) === ((bytes.length.toLong, g.width, g.height,
        g.nFrames, g.rSum, g.gSum, g.bSum)), s"media $id")
    }
  }

  test("decoded GIF sums EQUAL the source pixels across ALL frames — lossless palette encode") {
    payloads(MLQueries.gifFixtureDir).foreach { case (id, bytes) =>
      val g = Multimodal.decodeGif(bytes).get
      val (w, h) = GifBmpGateFixtureGen.geometry(id)
      val frames = GifBmpGateFixtureGen.nFrames(id)
      assert(g.width === w.toLong && g.height === h.toLong
        && g.nFrames === frames.toLong)
      val (sr, sg, sb) = GifBmpGateFixtureGen.sourceSums(id, frames)
      assert((g.rSum, g.gSum, g.bSum) === ((sr, sg, sb)),
        s"media $id: decode is not the exact source — not a real GIF decode")
      // multi-frame is load-bearing: frame 0 alone must NOT explain the
      // sums (a decoder that reads one frame and multiplies fails here
      // because the per-frame pixel indices differ)
      val (f0r, f0g, f0b) = GifBmpGateFixtureGen.sourceSums(id, 1)
      assert((f0r * frames, f0g * frames, f0b * frames) !== ((sr, sg, sb)),
        s"media $id: fixture frames degenerate (identical), weak contract")
    }
  }

  test("decoded BMP sums EQUAL the source pixels — lossless truecolor encode") {
    val expected = spark.read.parquet(s"${MLQueries.bmpFixtureDir}/expected.parquet")
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("r_sum"), r.getAs[Long]("g_sum"), r.getAs[Long]("b_sum"))).toMap
    assert(expected.size === GifBmpGateFixtureGen.NImages)
    payloads(MLQueries.bmpFixtureDir).foreach { case (id, bytes) =>
      val b = Multimodal.decodeBmp(bytes).get
      val (w, h) = GifBmpGateFixtureGen.geometry(id)
      val (sr, sg, sb) = GifBmpGateFixtureGen.sourceSums(id, 1)
      assert((b.width, b.height, b.rSum, b.gSum, b.bSum)
        === ((w.toLong, h.toLong, sr, sg, sb)), s"media $id")
      assert(expected(id) === ((b.width, b.height, b.rSum, b.gSum, b.bSum)),
        s"media $id: committed expected stats drifted")
    }
  }

  test("decodeGif/decodeBmp are total on corrupted bytes and strict on magic") {
    val (_, gifGood) = payloads(MLQueries.gifFixtureDir).head
    val (_, bmpGood) = payloads(MLQueries.bmpFixtureDir).head
    // other formats' magics must not route through the wrong decoder
    // even though ImageIO could decode them
    assert(Multimodal.decodeGif(Multimodal.synthPng(3L)).isEmpty)
    assert(Multimodal.decodeGif(bmpGood).isEmpty)
    assert(Multimodal.decodeBmp(gifGood).isEmpty)
    assert(Multimodal.decodeBmp(Multimodal.synthPng(3L)).isEmpty)
    assert(Multimodal.decodeGif(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeBmp(Array.empty[Byte]).isEmpty)
    val rnd = new scala.util.Random(47)
    for (_ <- 1 to 100) {
      val g = gifGood.clone()
      g(rnd.nextInt(g.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeGif(g) // any result, never a throw
      val b = bmpGood.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeBmp(b)
    }
    for (len <- 0 until gifGood.length by 11) Multimodal.decodeGif(gifGood.take(len))
    for (len <- 0 until bmpGood.length by 11) Multimodal.decodeBmp(bmpGood.take(len))
  }

  test("featurize dispatch routes GIF and BMP payloads through the real decoders") {
    import spark.implicits._
    val (gid, gifBytes) = payloads(MLQueries.gifFixtureDir).head
    val (bid, bmpBytes) = payloads(MLQueries.bmpFixtureDir).head
    val recs = Seq(
      Multimodal.MediaRecord(gid, "image", gifBytes, None, None, None),
      Multimodal.MediaRecord(bid + 100, "image", bmpBytes, None, None, None))
    val out = Multimodal.featurize(recs.toDS()).collect()
      .map(f => f.media_id -> f).toMap
    val g = Multimodal.decodeGif(gifBytes).get
    assert(out(gid).width === Some(g.width) && out(gid).height === Some(g.height))
    val b = Multimodal.decodeBmp(bmpBytes).get
    assert(out(bid + 100).width === Some(b.width)
      && out(bid + 100).height === Some(b.height))
    out.values.foreach { f =>
      assert(f.duration_ms === None)
      val norm = math.sqrt(f.features.map(v => v.toDouble * v).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }
}
