package graft

import graft.ml.Multimodal
import graft.queries.MLQueries

/** Keeps the committed MJPEG-in-AVI fixture pair honest — the video
  * analog of JpegGateSpec, under the same PINNED-JDK CONTRACT (the
  * per-frame JPEG decode rides javax.imageio; a JDK whose IDCT rounding
  * changes is EXPECTED to fail the exactness test — regenerate with
  * `sbt "Test/runMain graft.MjpegGateFixtureGen"` and commit both
  * parquets; the source-closeness test is the JDK-independent invariant).
  */
class MjpegGateSpec extends SparkSpec {

  private def payloads: Seq[(Long, Array[Byte])] =
    spark.read.parquet(s"${MLQueries.mjpegFixtureDir}/payloads.parquet")
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Array[Byte]]("payload")))
      .sortBy(_._1).toSeq

  test("decoding the committed payloads reproduces the committed expected stats exactly") {
    val expected = spark.read.parquet(s"${MLQueries.mjpegFixtureDir}/expected.parquet")
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("n_frames"), r.getAs[Long]("duration_ms"),
          r.getAs[Long]("r_sum"), r.getAs[Long]("g_sum"), r.getAs[Long]("b_sum"))).toMap
    assert(expected.size === MjpegGateFixtureGen.NVideos)
    payloads.foreach { case (id, bytes) =>
      val v = Multimodal.decodeMjpegAvi(bytes).get
      assert(expected(id) ===
        ((bytes.length.toLong, v.width, v.height, v.nFrames, v.durationMs,
          v.rSum, v.gSum, v.bSum)),
        s"media $id — if this is a JDK upgrade (ImageIO rounding change), " +
          "regenerate: sbt \"Test/runMain graft.MjpegGateFixtureGen\"")
    }
  }

  test("the per-frame sheet sums to the committed totals; scene cuts split") {
    // expected_frames.parquet (MjpegFrameFixtureGen) must stay consistent
    // with expected.parquet: frame-level sums adding to each video's
    // committed totals ties the scene-cut oracle's sheet to the decode
    // gate's contract through ONE decoder
    val frames = spark.read
      .parquet(s"${MLQueries.mjpegFixtureDir}/expected_frames.parquet")
      .collect()
      .groupBy(_.getAs[Long]("media_id"))
    val expected = spark.read
      .parquet(s"${MLQueries.mjpegFixtureDir}/expected.parquet").collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("r_sum"),
          r.getAs[Long]("g_sum"), r.getAs[Long]("b_sum"))).toMap
    assert(frames.keySet == expected.keySet)
    frames.foreach { case (id, rows) =>
      val (nf, rs, gs, bs) = expected(id)
      assert(rows.length.toLong == nf, s"media $id frame count")
      assert(rows.map(_.getAs[Long]("r_sum")).sum == rs, s"media $id r")
      assert(rows.map(_.getAs[Long]("g_sum")).sum == gs, s"media $id g")
      assert(rows.map(_.getAs[Long]("b_sum")).sum == bs, s"media $id b")
    }
    // the judged threshold genuinely separates: both cut classes present
    val cuts = SparkEntry.queries("multimodal_scene_cut")(spark, "unused")
      .collect()
    assert(cuts.exists(_.getAs[Boolean]("is_cut")))
    assert(cuts.exists(!_.getAs[Boolean]("is_cut")))
    cuts.foreach { r =>
      val sc = r.getAs[Long]("score_micro")
      assert(sc >= 0L && sc <= 1000000L)
    }
  }

  test("decoded channel sums track the SOURCE pixels across every frame") {
    // pinned from a decode at fixture build, so exactness alone could
    // self-confirm; this bound ties the decode to the pre-encoding pixels
    // of ALL frames through the lossy round-trip
    payloads.foreach { case (id, bytes) =>
      val v = Multimodal.decodeMjpegAvi(bytes).get
      val (w, h) = MjpegGateFixtureGen.geometry(id)
      val n = MjpegGateFixtureGen.nFrames(id)
      assert(v.width === w.toLong && v.height === h.toLong && v.nFrames === n.toLong)
      assert(v.durationMs === n * MjpegGateFixtureGen.usPerFrame(id) / 1000L)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (f <- 0 until n; y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = MjpegGateFixtureGen.frameSourceRgb(id, f, w, h, x, y)
        sr += r; sg += g; sb += b
      }
      for ((dec, src, c) <- Seq((v.rSum, sr, "r"), (v.gSum, sg, "g"), (v.bSum, sb, "b")))
        assert(math.abs(dec - src) <= math.max(200L * n, src / 50),
          s"media $id channel $c: decoded $dec vs source $src")
    }
  }

  test("decodeMjpegAvi is total on corrupted bytes and strict on structure") {
    val (_, good) = payloads.head
    // other formats' magics must not route through the AVI decoder —
    // including the SIBLING RIFF format (WAV) and a bare JPEG frame
    assert(Multimodal.decodeMjpegAvi(Multimodal.synthWav(3L)).isEmpty)
    assert(Multimodal.decodeMjpegAvi(JpegGateFixtureGen.encodeJpeg(3L)).isEmpty)
    assert(Multimodal.decodeMjpegAvi(Multimodal.synthPng(3L)).isEmpty)
    assert(Multimodal.decodeMjpegAvi(Array.empty[Byte]).isEmpty)
    // and the reverse: an AVI must not decode as WAV
    assert(Multimodal.decodeWav(good).isEmpty)
    // a container whose declared frame count lies is malformed, not
    // "mostly fine": avih dwTotalFrames sits 16 bytes into the avih body
    // (offset 12 (RIFF+form) + 12 (LIST hdrl header+type) + 8 (avih
    // header) + 16) — bump it and the strict count check must reject
    val lying = good.clone()
    assert((lying(48) & 0xff) !== 0xff) // fixture counts are tiny; safe +1
    lying(48) = (lying(48) + 1).toByte
    assert(Multimodal.decodeMjpegAvi(lying).isEmpty, "lying dwTotalFrames must reject")
    // single-bit corruption anywhere: any result, never a throw
    val rnd = new scala.util.Random(47)
    for (_ <- 1 to 100) {
      val b = good.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeMjpegAvi(b)
    }
    // truncation at every 13th boundary: total, never a throw
    for (len <- 0 until good.length by 13) Multimodal.decodeMjpegAvi(good.take(len))
  }

  test("a second stream's chunks are ignored, not blended or fatal") {
    // dwTotalFrames declares the VIDEO stream's count; another stream's
    // ##dc chunks in movi must neither fail the strict count check nor
    // leak pixels into the channel sums (round-10 code-review finding)
    val id = 3L
    val (w, h) = MjpegGateFixtureGen.geometry(id)
    // re-encode deterministically rather than slicing the committed AVI
    val realFrames = (0 until MjpegGateFixtureGen.nFrames(id)).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = MjpegGateFixtureGen.frameSourceRgb(id, f, w, h, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val clean = MjpegGateFixtureGen.buildAvi(id, realFrames)
    val withAudio = MjpegGateFixtureGen.buildAvi(id, realFrames,
      extraStreamChunks = Seq(Array.fill[Byte](33)(0x55), Array.fill[Byte](7)(0x2a)))
    val a = Multimodal.decodeMjpegAvi(clean).get
    val b = Multimodal.decodeMjpegAvi(withAudio).get
    assert(a.nFrames === b.nFrames && a.rSum === b.rSum &&
      a.gSum === b.gSum && a.bSum === b.bSum && a.durationMs === b.durationMs)
  }

  test("featurize dispatch routes AVI payloads through the real video decoder") {
    import spark.implicits._
    val (id, bytes) = payloads.head
    val recs = Seq(Multimodal.MediaRecord(id, "video", bytes, None, None, None))
    val out = Multimodal.featurize(recs.toDS()).collect().head
    val v = Multimodal.decodeMjpegAvi(bytes).get
    // video is the one kind that surfaces BOTH geometry and duration
    assert(out.width === Some(v.width) && out.height === Some(v.height))
    assert(out.duration_ms === Some(v.durationMs))
    val norm = math.sqrt(out.features.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }
}
