package graft

import graft.multimodal._
import org.scalatest.funsuite.AnyFunSuite

class MediaPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("multimodal decode pipeline: schema, determinism, batch shape") {
    val items = MediaPipeline.documentsAsMedia(spark, TestSpark.Sf0001)
    val feats = MediaPipeline.extractFeatures(items)
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.foreach { f =>
      assert(f.features.length == 16, "fixed-width feature vector")
      assert(math.abs(f.features.sum - 1.0) < 1e-9,
        "normalized histogram (deterministic stub decode)")
      assert(f.n_bytes > 0)
    }
    // determinism: same payload → same features
    val again = MediaPipeline.extractFeatures(items).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    rows.foreach(f => assert(again(f.media_id) == f.features.toSeq))
  }

  test("decode stub handles empty payload") {
    assert(MediaPipeline.fakeDecode(Array.emptyByteArray).sum == 0.0)
  }

  test("resize stage shrinks payloads by the factor, keeps ids/mime") {
    val items = MediaPipeline.documentsAsMedia(spark, TestSpark.Sf0001)
    val before = items.collect().map(m => m.media_id -> m.payload.length).toMap
    val after = MediaPipeline.resize(items, factor = 2).collect()
    assert(after.length == before.size)
    after.foreach { m =>
      val n = before(m.media_id)
      assert(m.payload.length == (n + 1) / 2,
        s"resize factor 2: expected ${(n + 1) / 2} bytes, got ${m.payload.length}")
      assert(m.mime == "text/plain")
    }
  }

  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image codec decodes real PNG bytes into pixel-derived features") {
    import spark.implicits._
    val items = Seq(
      MediaItem(1L, "image/png", solidPng(32, 16, 0xff0000)),
      MediaItem(2L, "image/png", solidPng(8, 8, 0x808080)),
      MediaItem(3L, "text/plain", "hello world".getBytes("UTF-8")),
      // valid mime, garbage bytes: must DEGRADE to the stub, not fail
      MediaItem(4L, "image/png", Array[Byte](1, 2, 3, 4))).toDS()
    val f = MediaPipeline.extractFeatures(items).collect()
      .map(x => x.media_id -> x.features).toMap
    // solid red 32×16: [w, h, meanR, meanG, meanB] from REAL pixels
    assert(f(1L).take(5).toSeq == Seq(32.0, 16.0, 255.0, 0.0, 0.0),
      s"red header: ${f(1L).take(5).toSeq}")
    // red's Rec.601 luma = 255·299/1000 = 76 → all mass in bin 4
    assert(f(1L)(5 + 4) == 1.0, "red luma mass not in bin 4")
    assert(f(2L).take(5).toSeq == Seq(8.0, 8.0, 128.0, 128.0, 128.0),
      s"gray header: ${f(2L).take(5).toSeq}")
    assert(f(2L)(5 + 8) == 1.0, "gray luma mass not in bin 8")
    // non-image mime and undecodable bytes both ride the 16-bin stub
    assert(f(3L).length == 16, "text payload must keep the stub features")
    assert(f(4L).length == 16, "corrupt image must degrade to the stub")
  }

  test("image resize really rescales pixels (decode → bilinear → re-encode)") {
    import spark.implicits._
    val items = Seq(
      MediaItem(1L, "image/png", solidPng(32, 16, 0x00ff00)),
      MediaItem(2L, "image/png", Array[Byte](9, 9, 9))).toDS()
    val out = MediaPipeline.resize(items, factor = 2).collect()
      .map(m => m.media_id -> m.payload).toMap
    val img = MediaPipeline.decodeImage(out(1L))
      .getOrElse(fail("resized payload is not a decodable image"))
    assert(img.getWidth == 16 && img.getHeight == 8,
      s"expected 16×8, got ${img.getWidth}×${img.getHeight}")
    // bilinear scale of a solid color is the same solid color
    assert((img.getRGB(7, 3) & 0xffffff) == 0x00ff00,
      f"color drifted: 0x${img.getRGB(7, 3) & 0xffffff}%06x")
    // undecodable "image" falls back to the stride stub: ceil(3/2) bytes
    assert(out(2L).length == 2, "corrupt image must use the stride stub")
  }

  private def sineWav(freqHz: Double, seconds: Double, amp: Double,
      rateHz: Float = 8000f): Array[Byte] = {
    val n = (seconds * rateHz).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (amp * math.sin(2 * math.Pi * freqHz * i / rateHz) *
        32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte // little-endian 16-bit mono
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio codec decodes real WAV bytes into sample-derived features") {
    import spark.implicits._
    // 440 Hz sine, 0.5 s, amplitude 0.5: duration/RMS/zero-cross/peak are
    // textbook closed forms, so the decode path is checked against MATH,
    // not against itself
    val items = Seq(
      MediaItem(1L, "audio/wav", sineWav(440.0, 0.5, 0.5)),
      MediaItem(2L, "audio/wav", Array[Byte](1, 2, 3, 4))).toDS()
    val f = MediaPipeline.extractFeatures(items).collect()
      .map(x => x.media_id -> x.features).toMap
    val feats = f(1L)
    assert(feats.length == 12, s"expected 12 audio features: ${feats.length}")
    assert(math.abs(feats(0) - 0.5) < 1e-3, s"duration ${feats(0)} != 0.5 s")
    // RMS of a sine = amp/√2
    assert(math.abs(feats(1) - 0.5 / math.sqrt(2)) < 0.01,
      s"rms ${feats(1)} != ${0.5 / math.sqrt(2)}")
    // a 440 Hz sine crosses zero 880×/s
    assert(math.abs(feats(2) - 880.0) < 10.0, s"zcr ${feats(2)} != ~880/s")
    assert(math.abs(feats(3) - 0.5) < 0.01, s"peak ${feats(3)} != ~0.5")
    // steady tone → flat RMS envelope across all 8 slices
    (4 until 12).foreach(i => assert(math.abs(feats(i) - feats(1)) < 0.01,
      s"envelope bin ${i - 4} (${feats(i)}) drifts from rms ${feats(1)}"))
    // undecodable audio degrades to the 16-bin stub
    assert(f(2L).length == 16, "corrupt audio must degrade to the stub")
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    val items = MediaPipeline.documentsAsMedia(spark, TestSpark.Sf0001)
    val nBytes = items.collect().map(m => m.media_id -> m.payload.length).toMap
    val frames = MediaPipeline.sampleFrames(items, frameBytes = 64, stride = 4)
      .collect()
    val byDoc = frames.groupBy(_.media_id)
    byDoc.foreach { case (id, fs) =>
      val totalFrames = (nBytes(id) + 63) / 64
      val expected = (totalFrames + 3) / 4
      assert(fs.length == expected,
        s"doc $id: expected $expected sampled frames, got ${fs.length}")
      assert(fs.forall(f => f.frame_no % 4 == 0), "only stride-aligned frames")
      assert(fs.filter(_.frame_no + 4 <= totalFrames - 1)
        .forall(_.frame.length == 64), "interior frames are fixed-size")
    }
  }

  /** Animated GIF with one solid-color full frame per rgb value — the
    * multi-frame fixture for the real frame-sampling path (the GIF writer
    * ships in the JDK; writeToSequence appends each frame to the stream).
    */
  private def animatedGif(w: Int, h: Int, rgbs: Seq[Int]): Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    rgbs.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb))
      g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("frame sampling really decodes animated-GIF frames (stride keyframes)") {
    import spark.implicits._
    // 9 frames of distinct primary-ish colors (GIF's 256-color palette
    // represents solid primaries exactly); stride 4 keeps frames 0, 4, 8
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00, 0xff00ff,
      0x00ffff, 0xffffff, 0x000000, 0x800000)
    val gif = animatedGif(16, 8, colors)
    val items = Seq(
      MediaItem(1L, "image/gif", gif),
      MediaItem(2L, "image/gif", "not a gif at all".getBytes("UTF-8")))
      .toDS()
    val frames = MediaPipeline.sampleFrames(items, stride = 4)
      .collect().groupBy(_.media_id)
    val real = frames(1L).sortBy(_.frame_no)
    assert(real.map(_.frame_no).toSeq == Seq(0, 4, 8),
      s"stride-4 over 9 real frames must keep 0/4/8: ${real.toSeq}")
    // each sampled frame re-decodes (as PNG) to its source frame's color
    real.foreach { f =>
      val img = MediaPipeline.decodeImage(f.frame)
        .getOrElse(fail(s"frame ${f.frame_no} is not a decodable image"))
      assert(img.getWidth == 16 && img.getHeight == 8)
      val expected = colors(f.frame_no)
      assert(img.getRGB(8, 4) == (0xff000000 | expected),
        f"frame ${f.frame_no}: got ${img.getRGB(8, 4)}%08x, " +
          f"want $expected%06x")
    }
    // an undecodable "gif" degrades to the byte-chop stub, not a crash
    assert(frames(2L).nonEmpty &&
      frames(2L).forall(_.frame_no % 4 == 0))
  }

  /** A structurally-correct MJPEG AVI: RIFF(AVI ) → LIST(movi) → one
    * `00dc` chunk per JPEG-encoded frame, sizes little-endian, chunks
    * padded to even offsets — the same layout any MJPEG writer emits.
    */
  private def mjpegAvi(w: Int, h: Int, grays: Seq[Int]): Array[Byte] = {
    def le32(n: Int): Array[Byte] =
      Array(n, n >> 8, n >> 16, n >> 24).map(_.toByte)
    val frames = grays.map { g =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gr = img.createGraphics()
      gr.setColor(new java.awt.Color(g, g, g))
      gr.fillRect(0, 0, w, h)
      gr.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.foreach { jpg =>
      movi.write("00dc".getBytes("US-ASCII"))
      movi.write(le32(jpg.length))
      movi.write(jpg)
      if (jpg.length % 2 == 1) movi.write(0) // even-offset padding
    }
    val body = new java.io.ByteArrayOutputStream()
    body.write("AVI ".getBytes("US-ASCII"))
    body.write("LIST".getBytes("US-ASCII"))
    body.write(le32(movi.size))
    movi.writeTo(body)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(body.size))
    body.writeTo(out)
    out.toByteArray
  }

  test("video codec decodes MJPEG-AVI frames through the RIFF walk") {
    import spark.implicits._
    // grayscale levels far enough apart that JPEG's lossy round-trip
    // still separates them unambiguously
    val grays = Seq(0, 64, 128, 192, 255, 32)
    val avi = mjpegAvi(16, 8, grays)
    val direct = MediaPipeline.decodeAviMjpeg(avi)
      .getOrElse(fail("decodeAviMjpeg rejected a valid MJPEG AVI"))
    assert(direct.size == grays.size)
    direct.zip(grays).foreach { case (img, g) =>
      assert(img.getWidth == 16 && img.getHeight == 8)
      val got = img.getRGB(8, 4) & 0xff
      assert(math.abs(got - g) <= 8,
        s"JPEG round-trip drifted: got $got, want ~$g")
    }
    // non-AVI payloads are rejected, not mis-parsed
    assert(MediaPipeline.decodeAviMjpeg(
      "RIFFxxxxWAVE1234".getBytes("US-ASCII")).isEmpty)
    assert(MediaPipeline.decodeAviMjpeg(Array[Byte]()).isEmpty)
    // and the sampling stage routes video/* through the real decode
    val items = Seq(
      MediaItem(7L, "video/avi", avi),
      MediaItem(8L, "video/mp4", "no jvm codec for this".getBytes)).toDS()
    val sampled = MediaPipeline.sampleFrames(items, stride = 2)
      .collect().groupBy(_.media_id)
    val real = sampled(7L).sortBy(_.frame_no)
    assert(real.map(_.frame_no).toSeq == Seq(0, 2, 4),
      s"stride-2 over 6 real frames must keep 0/2/4: ${real.toSeq}")
    real.foreach { f =>
      val img = MediaPipeline.decodeImage(f.frame)
        .getOrElse(fail(s"frame ${f.frame_no} is not a decodable image"))
      val got = img.getRGB(8, 4) & 0xff
      assert(math.abs(got - grays(f.frame_no)) <= 8)
    }
    // undecodable video degrades to the byte-chop stub, not a crash
    assert(sampled(8L).nonEmpty && sampled(8L).forall(_.frame_no % 2 == 0))
  }

  test("RIFF walk survives pathologically deep LIST nesting (no stack)") {
    // ~170k nested 12-byte LIST headers: the old recursive walk threw
    // StackOverflowError here, which NonFatal does NOT catch — escaping
    // the 'None for bad payloads' contract and killing the Spark task.
    val depth = 170000
    val total = 12 + depth * 12
    val out = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
      .put("AVI ".getBytes("US-ASCII"))
    (0 until depth).foreach { i =>
      out.put("LIST".getBytes("US-ASCII"))
        .putInt(total - (12 + i * 12) - 8) // span = everything that follows
        .put("mvi ".getBytes("US-ASCII"))
    }
    assert(MediaPipeline.decodeAviMjpeg(out.array()).isEmpty)
  }

  test("RIFF walk keeps file order across sibling LIST nodes") {
    // frame inside a LIST, then a sibling 00dc AFTER the list at the same
    // level — the iterative walk must emit list-interior frames before
    // post-list siblings (depth-first file order), or stride sampling
    // would pick the wrong keyframes.
    def le32(n: Int): Array[Byte] =
      Array(n, n >> 8, n >> 16, n >> 24).map(_.toByte)
    def jpeg(g: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gr = img.createGraphics()
      gr.setColor(new java.awt.Color(g, g, g)); gr.fillRect(0, 0, 8, 8)
      gr.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(jpg: Array[Byte]): Array[Byte] =
      "00dc".getBytes("US-ASCII") ++ le32(jpg.length) ++ jpg ++
        (if (jpg.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val inner = "movi".getBytes("US-ASCII") ++ chunk(jpeg(0))
    val body = "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(inner.length) ++ inner ++
      chunk(jpeg(224)) // sibling AFTER the LIST
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val frames = MediaPipeline.decodeAviMjpeg(avi)
      .getOrElse(fail("walk rejected a valid sibling-LIST AVI"))
    assert(frames.size == 2)
    val gs = frames.map(_.getRGB(4, 4) & 0xff)
    assert(gs.head < 64 && gs(1) > 160,
      s"frames out of file order: gray levels $gs (want ~0 then ~224)")
  }

  /** Deterministic structured PNG: per-pixel RGB from an integer recipe —
    * dHash fixtures need luminance STRUCTURE (a solid color hashes to 0L
    * and everything would collide vacuously).
    */
  private def gradientPng(w: Int, h: Int, seed: Int,
      perturb: Option[(Int, Int, Int)] = None): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 13 + seed * 31) % 256
      img.setRGB(x, y, (v << 16) | (((v * 3) % 256) << 8) | ((x * seed) % 256))
    }
    perturb.foreach { case (px, py, rgb) => img.setRGB(px, py, rgb) }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("header probe: format/dims parity with the real decoders on every fixture") {
    // The scan-speed profile stage must agree with what a full decode
    // would say, per mime, across sizes (odd dims catch off-by-ones;
    // 1×1 catches truncation guards). Encoders are the JDK's own
    // ImageIO/AudioSystem writers — real container bytes, not synthetic.
    def enc(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val sizes = Seq((1, 1), (9, 8), (37, 23), (256, 128), (640, 481))
    for ((fmt, name) <- Seq("png" -> "png", "gif" -> "gif", "bmp" -> "bmp",
        "jpg" -> "jpeg"); (w, h) <- sizes) {
      val bytes = enc(fmt, w, h)
      val hd = MediaPipeline.headerProbe(bytes)
        .getOrElse(fail(s"$fmt ${w}x$h: header probe returned None"))
      assert(hd.format == name, s"$fmt ${w}x$h: probed format ${hd.format}")
      val img = MediaPipeline.decodeImage(bytes)
        .getOrElse(fail(s"$fmt ${w}x$h: real decoder rejected own bytes"))
      assert((hd.width, hd.height) == ((img.getWidth, img.getHeight)),
        s"$fmt ${w}x$h: header says ${hd.width}x${hd.height}, " +
          s"decode says ${img.getWidth}x${img.getHeight}")
    }
    // WAV: fmt-chunk fields vs the real AudioSystem decode
    val wav = sineWav(440.0, 0.25, 0.5)
    val hw = MediaPipeline.headerProbe(wav)
      .getOrElse(fail("wav: header probe returned None"))
    val (sr, _) = MediaPipeline.decodeWav(wav)
      .getOrElse(fail("wav: real decoder rejected own bytes"))
    assert(hw.format == "wav" && hw.sampleRate == sr.toInt &&
      hw.channels == 1 && hw.bitsPerSample == 16,
      s"wav header fields diverge from the decoder: $hw vs rate $sr")
    // corrupt / truncated / unknown degrade to None, never throw
    assert(MediaPipeline.headerProbe("not media".getBytes("UTF-8")).isEmpty)
    assert(MediaPipeline.headerProbe(Array.emptyByteArray).isEmpty)
    assert(MediaPipeline.headerProbe(enc("png", 64, 64).take(20)).isEmpty,
      "PNG truncated before IHDR dims must probe as None")
    assert(MediaPipeline.headerProbe(enc("jpg", 64, 64).take(6)).isEmpty,
      "JPEG truncated before any SOF must probe as None")
    // corrupt WAV with a NEGATIVE chunk size (le32 is signed): the RIFF
    // walk's advance would be <= 0 — must abort to None, never spin
    // forever (a hang is worse than the partition-kill the probe guards
    // against)
    val evilWav = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "junk".getBytes("US-ASCII") ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      new Array[Byte](16)
    assert(MediaPipeline.headerProbe(evilWav).isEmpty,
      "negative RIFF chunk size must probe as None, not loop")
    // OS/2 BITMAPCOREHEADER (DIB size 12, 16-bit dims at 18/20): the
    // 32-bit reads at 18/22 would decode plausible-looking garbage — the
    // DIB header-size check must route it to None
    val coreBmp = "BM".getBytes("US-ASCII") ++ new Array[Byte](12) ++
      Array[Byte](12, 0, 0, 0) ++ // BITMAPCOREHEADER size
      Array[Byte](64, 0, 48, 0, 1, 0, 24, 0) ++ new Array[Byte](8)
    assert(MediaPipeline.headerProbe(coreBmp).isEmpty,
      "OS/2 core-header BMP must probe as None, not garbage dims")
    // the Dataset-level profile stage: one row per item, nulls (not drops)
    // for unrecognized payloads — profiling must SURFACE corrupt rows
    import spark.implicits._
    val profiled = MediaPipeline.headerProfile(Seq(
        MediaItem(1L, "image/png", enc("png", 37, 23)),
        MediaItem(2L, "audio/wav", wav),
        MediaItem(3L, "text/plain", "not media".getBytes("UTF-8"))).toDS())
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))).toMap
    assert(profiled(1L) == ((Some("png"), Some(37), Some(23))))
    assert(profiled(2L)._1 == Some("wav"))
    assert(profiled(3L) == ((None, None, None)),
      "unrecognized payload must profile as nulls, not vanish")
  }

  test("header probe: MP3/MP4 byte walks with hand-built ground truth") {
    // No JVM codec exists for either container in this environment, so the
    // fixtures are assembled byte-by-byte from the public specs and the
    // probe is checked against the values they were built with.
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    // --- MP3 ---
    // bare MPEG1 Layer III frame: FF FB = sync + ver 3 + layer 1;
    // 0x90 = bitrate idx 9, sample-rate idx 0 (44100); 0x40 = joint stereo
    val bare = Array[Byte](0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x40)
    val hBare = MediaPipeline.headerProbe(bare ++ new Array[Byte](32))
      .getOrElse(fail("bare MPEG1 frame: probe returned None"))
    assert(hBare.format == "mp3" && hBare.sampleRate == 44100 &&
      hBare.channels == 2, s"bare frame fields: $hBare")
    // ID3v2 tag (syncsafe size 257) then an MPEG2.5 Layer III mono frame:
    // 0xE2 = ver 0 (2.5) layer 1; 0x58 = br 5, sr idx 2 (8000); 0xC0 = mono
    val id3 = "ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0, 0, 2, 1) ++ new Array[Byte](257)
    val frame25 = Array[Byte](0xff.toByte, 0xe2.toByte, 0x58, 0xc0.toByte)
    val hTag = MediaPipeline.headerProbe(id3 ++ frame25)
      .getOrElse(fail("ID3-prefixed frame: probe returned None"))
    assert(hTag.format == "mp3" && hTag.sampleRate == 8000 &&
      hTag.channels == 1, s"post-ID3 frame fields: $hTag")
    // corrupt MP3s → None: reserved sample-rate index, reserved layer,
    // non-syncsafe tag size, tag overrunning the payload
    assert(MediaPipeline.headerProbe(
      Array[Byte](0xff.toByte, 0xfb.toByte, 0x9c.toByte, 0x40)).isEmpty,
      "reserved sample-rate index must probe as None")
    assert(MediaPipeline.headerProbe(
      Array[Byte](0xff.toByte, 0xf9.toByte, 0x90.toByte, 0x40)).isEmpty,
      "reserved layer must probe as None")
    assert(MediaPipeline.headerProbe("ID3".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0, 0, 0x80.toByte, 0) ++ new Array[Byte](64))
      .isEmpty, "non-syncsafe ID3 size byte must probe as None")
    assert(MediaPipeline.headerProbe(id3.take(40)).isEmpty,
      "ID3 tag overrunning the payload must probe as None")
    // --- MP4 ---
    def mbox(tpe: String, content: Array[Byte]): Array[Byte] =
      be32(content.length + 8) ++ tpe.getBytes("US-ASCII") ++ content
    val mvhd = mbox("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(7500) ++ new Array[Byte](80)) // ts 1000, dur 7500
    // audio trak FIRST (0x0 tkhd dims) — the probe must skip it and take
    // the video trak's 16.16 fixed-point 640x360
    def tkhd(w: Int, h: Int) = mbox("tkhd", Array[Byte](0, 0, 0, 0) ++
      new Array[Byte](72) ++ be32(w << 16) ++ be32(h << 16))
    val moov = mbox("moov", mvhd ++ mbox("trak", tkhd(0, 0)) ++
      mbox("trak", tkhd(640, 360)))
    val ftyp = mbox("ftyp", "isom".getBytes("US-ASCII") ++ be32(0) ++
      "isom".getBytes("US-ASCII"))
    val mp4 = ftyp ++ moov ++ mbox("mdat", new Array[Byte](16))
    val hMp4 = MediaPipeline.headerProbe(mp4)
      .getOrElse(fail("assembled mp4: probe returned None"))
    assert(hMp4.format == "mp4" && hMp4.width == 640 && hMp4.height == 360 &&
      hMp4.durationMs == 7500L, s"mp4 fields: $hMp4")
    // version-1 mvhd (64-bit times/duration): ts 600, dur 1234 → 2056 ms
    val mvhd1 = mbox("mvhd", Array[Byte](1, 0, 0, 0) ++
      new Array[Byte](16) ++ be32(600) ++ be32(0) ++ be32(1234))
    val hV1 = MediaPipeline.headerProbe(
      ftyp ++ mbox("moov", mvhd1 ++ mbox("trak", tkhd(64, 48))))
      .getOrElse(fail("v1-mvhd mp4: probe returned None"))
    assert(hV1.durationMs == 1234L * 1000 / 600 && hV1.width == 64,
      s"v1 mvhd fields: $hV1")
    // all-ones duration is ISO 14496-12's "duration unknown" sentinel
    // (live/streamed recordings): BOTH mvhd versions must report it as
    // not-carried (-1), never as a real ~49-day v0 value
    val mvhdUnk0 = mbox("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++
      be32(0) ++ be32(1000) ++ be32(0xffffffff) ++ new Array[Byte](80))
    val hUnk0 = MediaPipeline.headerProbe(
      ftyp ++ mbox("moov", mvhdUnk0 ++ mbox("trak", tkhd(64, 48))))
      .getOrElse(fail("v0 unknown-duration mp4: probe returned None"))
    assert(hUnk0.durationMs == -1L && hUnk0.width == 64,
      s"v0 all-ones duration must be not-carried: $hUnk0")
    val mvhdUnk1 = mbox("mvhd", Array[Byte](1, 0, 0, 0) ++
      new Array[Byte](16) ++ be32(600) ++ be32(0xffffffff) ++
      be32(0xffffffff))
    val hUnk1 = MediaPipeline.headerProbe(
      ftyp ++ mbox("moov", mvhdUnk1 ++ mbox("trak", tkhd(64, 48))))
      .getOrElse(fail("v1 unknown-duration mp4: probe returned None"))
    assert(hUnk1.durationMs == -1L,
      s"v1 all-ones duration must be not-carried: $hUnk1")
    // corrupt MP4s: no moov → None; moov whose declared size overruns the
    // payload (truncation) → None; child box smaller than its header stops
    // the inner walk (fields degrade to -1, format still identified)
    assert(MediaPipeline.headerProbe(ftyp ++ mbox("mdat",
      new Array[Byte](8))).isEmpty, "ftyp without moov must probe as None")
    assert(MediaPipeline.headerProbe(
      (ftyp ++ moov).dropRight(20)).isEmpty,
      "truncated moov must probe as None")
    val evilChild = mbox("moov", be32(3) ++ "mvhd".getBytes("US-ASCII"))
    val hEvil = MediaPipeline.headerProbe(ftyp ++ evilChild)
      .getOrElse(fail("undersized child box: format should still identify"))
    assert(hEvil.durationMs == -1L && hEvil.width == -1,
      "undersized child box must stop the inner walk, fields -1")
    // --- r12 ADVICE regressions on existing formats ---
    // WAV fmt chunk declaring sz < 16: the probed fields would be the NEXT
    // chunk's bytes — must be corrupt → None, even with trailing payload
    val smallFmt = "RIFF".getBytes("US-ASCII") ++ be32(0).reverse ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      Array[Byte](8, 0, 0, 0) ++ new Array[Byte](32)
    assert(MediaPipeline.headerProbe(smallFmt).isEmpty,
      "fmt chunk with sz < 16 must probe as None, not next-chunk bytes")
    // JPEG reaching SOS with no SOF seen: the walk must stop, not misread
    // a stray FF Cx inside entropy-coded data as a frame header
    val evilJpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++ // SOI
      Array[Byte](0xff.toByte, 0xda.toByte, 0, 4, 0, 0) ++ // SOS, len 4
      Array[Byte](0xff.toByte, 0xc0.toByte, 0, 17, 8, 1, 0, 1, 0, 3) ++
      new Array[Byte](16) // fake SOF bytes inside entropy data
    assert(MediaPipeline.headerProbe(evilJpeg).isEmpty,
      "SOS before any SOF must probe as None, not entropy-data dims")
  }

  test("header probe: FLAC/OGG byte walks with hand-built ground truth") {
    // Same discipline as the MP3/MP4 fixtures: no JVM codec for either
    // container, so the bytes are assembled from the public specs and
    // checked against the values they encode.
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def le32(v: Int) = be32(v).reverse
    // --- FLAC: 44100 Hz, 2ch, 16-bit, 441000 samples = 10000 ms ---
    // STREAMINFO bit-pack at content bytes 10..17: sr 20 bits, ch-1 3,
    // bps-1 5, totalSamples 36 (high nibble in byte 13)
    val streaminfo = new Array[Byte](10) ++
      Array[Byte](0x0a, 0xc4.toByte, 0x42, 0xf0.toByte) ++ be32(441000) ++
      new Array[Byte](16) // md5 of the stream, unread by the probe
    assert(streaminfo.length == 34)
    val flac = "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ streaminfo
    val hFlac = MediaPipeline.headerProbe(flac)
      .getOrElse(fail("assembled flac: probe returned None"))
    assert(hFlac.format == "flac" && hFlac.sampleRate == 44100 &&
      hFlac.channels == 2 && hFlac.bitsPerSample == 16 &&
      hFlac.durationMs == 10000L, s"flac fields: $hFlac")
    // corrupt FLACs → None: first block not STREAMINFO (spec: mandatory
    // first), wrong STREAMINFO length, sample rate 0 (explicitly
    // invalid), truncation inside the packed fields
    assert(MediaPipeline.headerProbe("fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x01, 0, 0, 34) ++ streaminfo).isEmpty,
      "non-STREAMINFO first block must probe as None")
    assert(MediaPipeline.headerProbe("fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 20) ++ streaminfo).isEmpty,
      "wrong STREAMINFO length must probe as None")
    val zeroSr = streaminfo.clone()
    zeroSr(10) = 0; zeroSr(11) = 0; zeroSr(12) = (zeroSr(12) & 0x0f).toByte
    assert(MediaPipeline.headerProbe("fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ zeroSr).isEmpty,
      "sample rate 0 must probe as None")
    assert(MediaPipeline.headerProbe(flac.take(20)).isEmpty,
      "truncated STREAMINFO must probe as None")
    // --- OGG: one first page (version 0, BOS) per codec ---
    def oggPage(packet: Array[Byte]): Array[Byte] =
      "OggS".getBytes("US-ASCII") ++ Array[Byte](0, 0x02) ++
        new Array[Byte](8 + 4 + 4 + 4) ++ // granule, serial, seq, crc
        Array[Byte](1, packet.length.toByte) ++ packet
    val vorbisId = Array[Byte](0x01) ++ "vorbis".getBytes("US-ASCII") ++
      le32(0) ++ Array[Byte](2) ++ le32(44100) ++ new Array[Byte](9)
    val hVorbis = MediaPipeline.headerProbe(oggPage(vorbisId))
      .getOrElse(fail("assembled ogg-vorbis: probe returned None"))
    assert(hVorbis.format == "ogg-vorbis" && hVorbis.sampleRate == 44100 &&
      hVorbis.channels == 2, s"vorbis fields: $hVorbis")
    val opusId = "OpusHead".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0, 0) ++ le32(48000) ++ new Array[Byte](3)
    val hOpus = MediaPipeline.headerProbe(oggPage(opusId))
      .getOrElse(fail("assembled ogg-opus: probe returned None"))
    assert(hOpus.format == "ogg-opus" && hOpus.sampleRate == 48000 &&
      hOpus.channels == 1, s"opus fields: $hOpus")
    // corrupt OGGs → None: nonzero version, missing BOS flag (mid-stream
    // fragment carries no id header), unknown codec packet, rate <= 0
    val vPage = oggPage(vorbisId)
    val badVer = vPage.clone(); badVer(4) = 1
    assert(MediaPipeline.headerProbe(badVer).isEmpty,
      "ogg version != 0 must probe as None")
    val noBos = vPage.clone(); noBos(5) = 0
    assert(MediaPipeline.headerProbe(noBos).isEmpty,
      "page without BOS must probe as None")
    assert(MediaPipeline.headerProbe(
      oggPage("notACodecIdPacket".getBytes("US-ASCII"))).isEmpty,
      "unknown codec id packet must probe as None")
    assert(MediaPipeline.headerProbe(oggPage(Array[Byte](0x01) ++
      "vorbis".getBytes("US-ASCII") ++ le32(0) ++ Array[Byte](2) ++
      le32(0) ++ new Array[Byte](9))).isEmpty,
      "vorbis rate 0 must probe as None")
  }

  test("header probe costs orders of magnitude less per row than a decode") {
    // the 100 TB point of the header path, measured not asserted-by-doc:
    // profiling a media column must not pay a codec per row
    val payload = {
      val img = new java.awt.image.BufferedImage(
        256, 256, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    (1 to 50).foreach { _ => // JIT warmup for BOTH paths
      MediaPipeline.headerProbe(payload); MediaPipeline.decodeImage(payload)
    }
    val n = 300
    var t0 = System.nanoTime()
    (1 to n).foreach(_ => MediaPipeline.headerProbe(payload))
    val probeNs = (System.nanoTime() - t0).toDouble / n
    t0 = System.nanoTime()
    (1 to n).foreach(_ => MediaPipeline.decodeImage(payload))
    val decodeNs = (System.nanoTime() - t0).toDouble / n
    info(f"256x256 png: header probe ${probeNs / 1e3}%.1f us/row, full " +
      f"decode ${decodeNs / 1e3}%.1f us/row (${decodeNs / probeNs}%.0fx)")
    // lenient 3x floor so scheduler noise can't flake the build — the
    // measured gap is ~56x at 256x256 and grows with resolution (probe
    // cost is flat, decode is O(pixels)); recorded via info per run
    assert(probeNs * 3 < decodeNs,
      f"header probe (${probeNs / 1e3}%.1f us) not meaningfully cheaper " +
        f"than decode (${decodeNs / 1e3}%.1f us)")
  }

  test("fixed-point bilinear downscale: identity at same size, exact midpoint blend") {
    // identity: center-aligned mapping at 1:1 scale lands every target
    // pixel EXACTLY on its source pixel (fractional weight 0), so a
    // same-size "downscale" must reproduce the image bit-for-bit — the
    // property Java2D drawImage does not guarantee, and the reason dHash
    // switched to this integer resampler (cross-JVM determinism).
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 9)
      img.setRGB(x, y, (x * 29 + y * 47) * 97 & 0xffffff)
    val same = MediaPipeline.bilinearDownscale(img, 9, 8)
    for (y <- 0 until 8; x <- 0 until 9)
      assert(same(y * 9 + x) == (img.getRGB(x, y) & 0xffffff),
        s"identity resample changed pixel ($x,$y)")
    // exact arithmetic pin: [0, 255] → 1 pixel samples the exact midpoint
    // (fx = 0.5 in 16.16), and the round-half-up blend of 127.5 is 128
    val two = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    two.setRGB(0, 0, 0x000000); two.setRGB(1, 0, 0xffffff)
    assert(MediaPipeline.bilinearDownscale(two, 1, 1)(0) == 0x808080,
      "midpoint blend of 0 and 255 must round-half-up to 128 per channel")
  }

  test("dHash: stable under small perturbation, far for unrelated images") {
    val base = MediaPipeline.dHash(gradientPng(64, 48, 1)).get
    // same image bytes -> same hash (decode + bilinear are deterministic)
    assert(MediaPipeline.dHash(gradientPng(64, 48, 1)).get == base)
    // one perturbed pixel moves at most a couple of 9x8 cells
    val near = MediaPipeline.dHash(
      gradientPng(64, 48, 1, Some((10, 10, 0xffffff)))).get
    assert(java.lang.Long.bitCount(base ^ near) <= 3,
      s"1-px edit moved ${java.lang.Long.bitCount(base ^ near)} bits")
    // a different recipe is far away in Hamming space
    val other = MediaPipeline.dHash(gradientPng(64, 48, 7)).get
    assert(java.lang.Long.bitCount(base ^ other) >= 10,
      s"unrelated images only ${java.lang.Long.bitCount(base ^ other)} bits apart")
    // undecodable payload -> None, never a throw
    assert(MediaPipeline.dHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("banded image near-dup join finds exactly the close pairs (pigeonhole recall)") {
    import spark.implicits._
    val items = Seq(
      MediaItem(1L, "image/png", gradientPng(64, 48, 1)),
      MediaItem(2L, "image/png", gradientPng(64, 48, 1, Some((10, 10, 0xffffff)))),
      MediaItem(3L, "image/png", gradientPng(64, 48, 7)),
      MediaItem(4L, "image/png", gradientPng(64, 48, 11)),
      MediaItem(5L, "text/plain", "not an image".getBytes("UTF-8")),
      MediaItem(6L, "image/png", "corrupt".getBytes("UTF-8"))).toDS()
    val pairs = MediaPipeline.imageNeardupPairs(items).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ground truth by brute force over the decodable images
    val hs = Seq(1L, 2L, 3L, 4L).map(id => id ->
      MediaPipeline.dHash(items.collect().find(_.media_id == id).get.payload).get)
    val truth = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(truth.nonEmpty, "fixture produced no close pair - test is vacuous")
    assert(pairs.toSet == truth,
      s"banded join ${pairs.toSet} != exhaustive truth $truth")
    // the planted perturbation pair must be among them
    assert(truth.exists(p => p._1 == 1L && p._2 == 2L))
  }
}
