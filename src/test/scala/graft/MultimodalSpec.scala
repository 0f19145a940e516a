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

  // --- real WAV decode ---

  /** Hand-built mono 8 kHz PCM16 WAV with known samples — independent of
    * synthWav, so a shared bug in writer+reader can't self-confirm.
    */
  private def goldenWav(samples: Seq[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    buf.put("data".getBytes).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("decodeWav parses a golden hand-built WAV exactly") {
    val w = Multimodal.decodeWav(goldenWav(Seq[Short](0, 1000, -1000, -32768))).get
    assert(w.nChannels === 1L)
    assert(w.sampleRate === 8000L)
    assert(w.bitsPerSample === 16L)
    assert(w.nFrames === 4L)
    assert(w.durationMs === 0L) // 4 frames / 8 kHz = 0 whole ms
    assert(w.sumVal === -32768L)
    assert(w.sumAbs === 34768L)
    assert(w.hist.sum === 4L)
    assert(w.hist(0) === 1L) // -32768 lands in the first bucket
    assert(w.hist(7) === 1L) // -1000 → (31768*16)/65536 = 7
    assert(w.hist(8) === 2L) // 0 and 1000 land in the middle bucket
  }

  test("decodeWav rejects malformed payloads (stub fallback path)") {
    val good = goldenWav(Seq[Short](1, 2, 3))
    assert(Multimodal.decodeWav(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxx".getBytes).isEmpty)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeWav(badMagic).isEmpty)
    val truncated = good.dropRight(3) // mid-sample: data chunk overruns
    assert(Multimodal.decodeWav(truncated).isEmpty)
    val nonPcm = good.clone(); nonPcm(20) = 3 // format tag = IEEE float
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
  }

  test("synthWav round-trips through decodeWav matching the analytic formulas") {
    for (id <- 0L to 16L) { // covers both parities (LIST chunk walk) and all rates
      val bytes = Multimodal.synthWav(id)
      val w = Multimodal.decodeWav(bytes).get
      val channels = 1 + id % 2
      val rate = Seq(8000, 16000, 44100)((id % 3).toInt)
      val frames = 100 + id % 400
      assert(w.nChannels === channels)
      assert(w.sampleRate === rate.toLong)
      assert(w.nFrames === frames)
      assert(w.durationMs === frames * 1000 / rate)
      val vs = for (i <- 0L until frames; c <- 0L until channels)
        yield ((id * 131 + i * 7 + c * 13) % 65536) - 32768
      assert(w.sumVal === vs.sum)
      assert(w.sumAbs === vs.map(math.abs).sum)
      assert(bytes.length === 44 + frames * channels * 2 + (if (id % 2 == 1) 12 else 0))
    }
  }

  test("decodePpm parses a golden hand-built P6 exactly (incl. comments)") {
    // 2x2 image, known channel values, a comment line in the header —
    // independent of synthPpm so writer+reader can't self-confirm
    val pixels = Array[Int](
      10, 20, 30, 40, 50, 60,
      70, 80, 90, 255, 0, 128)
    val header = "P6\n# made by hand\n2 2\n255\n"
    val bytes = header.getBytes("US-ASCII") ++ pixels.map(_.toByte)
    val p = Multimodal.decodePpm(bytes).get
    assert(p.width === 2L && p.height === 2L && p.maxval === 255L)
    assert(p.rSum === 10L + 40 + 70 + 255)
    assert(p.gSum === 20L + 50 + 80 + 0)
    assert(p.bSum === 30L + 60 + 90 + 128)
    assert(p.hist.sum === 12L)
  }

  test("decodePpm rejects malformed payloads") {
    val good = Multimodal.synthPpm(4L)
    assert(Multimodal.decodePpm(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodePpm("P5\n2 2\n255\n".getBytes).isEmpty) // grayscale magic
    assert(Multimodal.decodePpm(good.dropRight(1)).isEmpty) // truncated pixels
    assert(Multimodal.decodePpm(good :+ 0.toByte).isEmpty)  // trailing junk
    // 16-bit maxval (2-byte samples) is out of contract
    assert(Multimodal.decodePpm("P6\n1 1\n65535\n".getBytes ++ Array[Byte](1, 2, 3, 4, 5, 6)).isEmpty)
  }

  test("synthPpm round-trips through decodePpm matching the analytic formulas") {
    for (id <- 0L to 16L) { // both parities → comment-line handling
      val bytes = Multimodal.synthPpm(id)
      val p = Multimodal.decodePpm(bytes).get
      val (w, h) = (4 + id % 13, 3 + id % 7)
      assert(p.width === w && p.height === h && p.maxval === 255L)
      def chan(c: Int) = (0L until w * h).map(px => (id * 37 + px * 5 + c * 11) % 256).sum
      assert(p.rSum === chan(0))
      assert(p.gSum === chan(1))
      assert(p.bSum === chan(2))
      assert(bytes.length === 3 + (if (id % 2 == 1) 4 else 0) +
        w.toString.length + 1 + h.toString.length + 1 + 4 + 3 * w * h)
    }
  }

  test("decodePng decodes the JDK ImageIO encoder's output exactly") {
    // a genuinely INDEPENDENT PNG writer: java's ImageIO, which emits
    // real entropy-coded DEFLATE (not synthPng's stored blocks) and its
    // own filter choices — so this proves (a) the Inflater path on
    // compressed data, (b) unfiltering whatever filters a foreign
    // encoder picked, (c) no synth/decode bug pair can self-confirm
    val (w, h) = (23, 17)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var rs = 0L; var gs = 0L; var bs = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = ((x * 31 + y * 7) % 256, (x * 13 + y * 57) % 256, (x + y * 101) % 256)
      rs += r; gs += g; bs += b
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val p = Multimodal.decodePng(baos.toByteArray).get
    assert(p.width === w.toLong && p.height === h.toLong && p.bitDepth === 8L)
    assert(p.rSum === rs && p.gSum === gs && p.bSum === bs)
    assert(p.hist.sum === 3L * w * h)
  }

  test("decodePng rejects malformed payloads") {
    val good = Multimodal.synthPng(7L)
    assert(Multimodal.decodePng(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodePng("not a png at all, nope".getBytes).isEmpty)
    val badSig = good.clone(); badSig(0) = 'X'.toByte
    assert(Multimodal.decodePng(badSig).isEmpty)
    // flip a pixel byte inside IDAT: the chunk CRC must catch it
    val badCrc = good.clone(); badCrc(8 + 25 + 8 + 10) = (badCrc(8 + 25 + 8 + 10) ^ 0x5a).toByte
    assert(Multimodal.decodePng(badCrc).isEmpty)
    assert(Multimodal.decodePng(good.dropRight(5)).isEmpty) // truncated IEND
    // interlaced flag is out of contract (IHDR byte 12, with CRC refreshed)
    val inter = good.clone(); inter(8 + 8 + 12) = 1.toByte
    val crc = new java.util.zip.CRC32(); crc.update(inter, 8 + 4, 4 + 13)
    val cv = crc.getValue
    for (i <- 0 until 4) inter(8 + 8 + 13 + i) = ((cv >> (24 - 8 * i)) & 0xff).toByte
    assert(Multimodal.decodePng(inter).isEmpty)
    // crafted dimensions with VALID CRCs whose height·stride product
    // overflows int64: the guard must reject without ever forming the
    // product (it used to wrap negative, pass the cap, and crash on the
    // pixel-array allocation instead of returning None)
    for ((hw, hh) <- Seq((0x80000000L, 0x60000000L), (0xffffffffL, 0xffffffffL),
        (1L << 29, 4L), (4L, 0xffffffffL))) {
      val t = good.clone()
      for (i <- 0 until 4) t(16 + i) = ((hw >> (24 - 8 * i)) & 0xff).toByte
      for (i <- 0 until 4) t(20 + i) = ((hh >> (24 - 8 * i)) & 0xff).toByte
      val c = new java.util.zip.CRC32(); c.update(t, 8 + 4, 4 + 13)
      for (i <- 0 until 4)
        t(8 + 8 + 13 + i) = ((c.getValue >> (24 - 8 * i)) & 0xff).toByte
      assert(Multimodal.decodePng(t).isEmpty, s"w=$hw h=$hh must be rejected")
    }
  }

  test("synthPng round-trips through decodePng matching the analytic formulas") {
    for (id <- 0L to 16L) { // covers every (w, h) residue pair and all filters
      val bytes = Multimodal.synthPng(id)
      val p = Multimodal.decodePng(bytes).get
      val (w, h) = (4 + id % 9, 5 + id % 6)
      assert(p.width === w && p.height === h && p.bitDepth === 8L)
      def chan(c: Int) = (0L until w * h).map(px => (id * 53 + px * 7 + c * 19) % 256).sum
      assert(p.rSum === chan(0))
      assert(p.gSum === chan(1))
      assert(p.bSum === chan(2))
      assert(bytes.length === 68 + h * (1 + 3 * w))
    }
  }

  test("decoders never throw on arbitrary or corrupted bytes") {
    // media payloads are untrusted input: any byte sequence must decode
    // to Some(stats) or None, never an exception — fuzz with random
    // buffers plus single-byte corruptions of valid payloads (the
    // adversarial case: mostly-valid headers with poisoned fields)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val buf = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(buf)
      Multimodal.decodeWav(buf)
      Multimodal.decodePpm(buf)
      Multimodal.decodePng(buf)
    }
    for (id <- 0L to 4L; _ <- 1 to 50) {
      val wav = Multimodal.synthWav(id)
      wav(rnd.nextInt(wav.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeWav(wav)
      val ppm = Multimodal.synthPpm(id)
      ppm(rnd.nextInt(ppm.length)) = rnd.nextInt(256).toByte
      Multimodal.decodePpm(ppm)
      val png = Multimodal.synthPng(id)
      png(rnd.nextInt(png.length)) = rnd.nextInt(256).toByte
      Multimodal.decodePng(png)
    }
    // truncations at every prefix length of one valid payload each
    val wav = Multimodal.synthWav(3L)
    val ppm = Multimodal.synthPpm(3L)
    val png = Multimodal.synthPng(3L)
    for (len <- 0 until wav.length) Multimodal.decodeWav(wav.take(len))
    for (len <- 0 until ppm.length) Multimodal.decodePpm(ppm.take(len))
    for (len <- 0 until png.length) Multimodal.decodePng(png.take(len))
  }

  test("featurize routes WAV payloads through the real decoder") {
    val wav = Multimodal.synthWav(6L)
    val ppm = Multimodal.synthPpm(6L)
    val png = Multimodal.synthPng(6L)
    val recs = Seq(
      Multimodal.MediaRecord(1L, "audio", wav, None, None, None),
      Multimodal.MediaRecord(2L, "image", "not a wav".getBytes, None, None, None),
      Multimodal.MediaRecord(3L, "image", ppm, None, None, None),
      Multimodal.MediaRecord(4L, "image", png, None, None, None))
    val out = Multimodal.featurize(recs.toDS()).collect().map(r => r.media_id -> r).toMap
    // WAV/PPM paths: features = normalized decoded histograms, not the byte stub
    def expect(hist: Array[Long]): Array[Double] = {
      val h = hist.map(_.toDouble)
      val norm = math.sqrt(h.map(v => v * v).sum)
      h.map(_ / norm)
    }
    out(1L).features.zip(expect(Multimodal.decodeWav(wav).get.hist)).foreach {
      case (got, want) => assert(math.abs(got - want) < 1e-5)
    }
    out(3L).features.zip(expect(Multimodal.decodePpm(ppm).get.hist)).foreach {
      case (got, want) => assert(math.abs(got - want) < 1e-5)
    }
    // undecodable payload: still the stub
    assert(out(2L).features.toSeq !== out(1L).features.toSeq)
    assert(math.abs(math.sqrt(out(2L).features.map(v => v.toDouble * v).sum) - 1.0) < 1e-5)
    // typed metadata surfaces from the real decoders only
    assert(out(1L).duration_ms === Some(Multimodal.decodeWav(wav).get.durationMs))
    assert(out(1L).width === None && out(1L).height === None)
    assert(out(3L).width === Some(Multimodal.decodePpm(ppm).get.width))
    assert(out(3L).height === Some(Multimodal.decodePpm(ppm).get.height))
    assert(out(3L).duration_ms === None)
    assert(out(2L).width === None && out(2L).duration_ms === None)
    // PNG path: real inflate+unfilter decode, geometry surfaced
    val pinfo = Multimodal.decodePng(png).get
    out(4L).features.zip(expect(pinfo.hist)).foreach {
      case (got, want) => assert(math.abs(got - want) < 1e-5)
    }
    assert(out(4L).width === Some(pinfo.width))
    assert(out(4L).height === Some(pinfo.height))
    assert(out(4L).duration_ms === None)
  }
}
