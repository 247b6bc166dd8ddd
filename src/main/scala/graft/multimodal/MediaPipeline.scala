package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media item: opaque binary payload + typed metadata, the multimodal
  * column pattern (image/audio/video travel as `binary` with a metadata
  * struct; Spark never interprets the bytes until a decode stage).
  */
final case class MediaItem(
    media_id: Long, mime: String, payload: Array[Byte])

final case class MediaFeatures(
    media_id: Long, mime: String, n_bytes: Long, features: Array[Double])

final case class MediaFrame(
    media_id: Long, frame_no: Int, frame: Array[Byte])

/** Multimodal column plumbing (SURVEY §2 j6 / task-brief "multimodal
  * columns"). The Spark-side mechanics — schema, partition-preserving
  * `mapPartitions`, batched per-partition decode — are real and tested.
  * Decoders by modality:
  *
  *  - image mimes: REAL decode via `javax.imageio` (PNG/BMP/GIF readers ship
  *    with the JDK — no new dependency): payload → pixels → pixel-derived
  *    features, and a real decode→scale→re-encode resize. Round 10.
  *  - audio mimes: REAL WAV/16-bit-PCM decode via `javax.sound.sampled`
  *    (also JDK-shipped): payload → normalized mono samples →
  *    duration/RMS/zero-cross/envelope features. Round 10.
  *  - compressed audio + video + unknown: a declared STUB — the container
  *    has no ffmpeg, so `fakeDecode` computes a deterministic 16-bin byte
  *    histogram where a real deployment would plug its codec into the
  *    same payload → Array[Double] signature.
  *
  * Scale notes (100 TB of media): decode runs per-partition with no shuffle
  * — `mapPartitions` keeps the scan→decode→feature pipeline inside one
  * stage; heavy codecs amortize any per-partition init across the whole
  * partition iterator. Feature vectors then feed the `graft.queries.LlmOps`
  * similarity/dedup operators unchanged.
  */
object MediaPipeline {

  /** Real image decode (pure JVM, `javax.imageio`). None ⇔ the payload is
    * not a decodable image — callers fall back to the byte-histogram stub
    * so a corrupt file degrades to weaker features instead of killing the
    * partition (at 100 TB some fraction of any crawl's images is broken).
    */
  def decodeImage(
      payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Pixel-derived features from a REAL decode: [width, height, meanR,
    * meanG, meanB] ++ 16-bin normalized luminance histogram (21 doubles).
    * Plain while-loops over getRGB — the per-pixel hot path allocates
    * nothing.
    */
  def imageFeatures(img: java.awt.image.BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val hist = new Array[Double](16)
    var sr = 0.0; var sg = 0.0; var sb = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        // integer Rec.601 luma, range 0..255 → bins of 16
        hist((r * 299 + g * 587 + b * 114) / 1000 >> 4) += 1.0
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    Array(w.toDouble, h.toDouble, sr / n, sg / n, sb / n) ++ hist.map(_ / n)
  }

  /** Real WAV/PCM decode via `javax.sound.sampled` (pure JVM — the WAV
    * parser ships in the JDK's java.desktop module). Returns the sample
    * rate and channel-averaged mono samples normalized to [-1, 1]; None
    * for compressed/undecodable payloads (callers fall back to the stub).
    * Only 16-bit signed PCM is handled — the canonical uncompressed
    * interchange format; MP3/AAC/etc. need external codecs and stay stubs.
    */
  def decodeWav(payload: Array[Byte]): Option[(Float, Array[Double])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      val pcm16 = fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16
      if (!pcm16) None
      else {
        val bytes = ais.readAllBytes()
        val ch = fmt.getChannels
        val frames = bytes.length / (2 * ch)
        val mono = new Array[Double](frames)
        val big = fmt.isBigEndian
        var f = 0
        while (f < frames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val i = (f * ch + c) * 2
            val s =
              if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
            acc += s / 32768.0
            c += 1
          }
          mono(f) = acc / ch
          f += 1
        }
        Some((fmt.getSampleRate, mono))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Sample-derived audio features: [durationSec, rms, zeroCrossPerSec,
    * peak] ++ 8-bin RMS envelope (energy over equal time slices) —
    * 12 doubles. The envelope is what audio dedup/quality filters key on
    * (silence detection, clipping, loudness drift).
    */
  def audioFeatures(sampleRate: Float, samples: Array[Double]): Array[Double] = {
    val n = samples.length
    if (n == 0 || sampleRate <= 0) return new Array[Double](12)
    var sumSq = 0.0
    var peak = 0.0
    var crossings = 0
    var i = 0
    while (i < n) {
      val s = samples(i)
      sumSq += s * s
      if (math.abs(s) > peak) peak = math.abs(s)
      if (i > 0 && (s >= 0) != (samples(i - 1) >= 0)) crossings += 1
      i += 1
    }
    val dur = n / sampleRate.toDouble
    val env = new Array[Double](8)
    var b = 0
    while (b < 8) {
      val lo = (n.toLong * b / 8).toInt
      val hi = (n.toLong * (b + 1) / 8).toInt
      var e = 0.0
      var j = lo
      while (j < hi) { e += samples(j) * samples(j); j += 1 }
      env(b) = if (hi > lo) math.sqrt(e / (hi - lo)) else 0.0
      b += 1
    }
    Array(dur, math.sqrt(sumSq / n), crossings / dur, peak) ++ env
  }

  /** Modality dispatch: image and WAV-audio mimes get real codecs (stub
    * fallback on undecodable bytes); everything else keeps the declared
    * stub (no JVM codec exists for video/compressed audio).
    */
  def decodeFeatures(mime: String, payload: Array[Byte]): Array[Double] =
    if (mime.startsWith("image/"))
      decodeImage(payload).map(imageFeatures).getOrElse(fakeDecode(payload))
    else if (mime.startsWith("audio/"))
      decodeWav(payload).map { case (sr, s) => audioFeatures(sr, s) }
        .getOrElse(fakeDecode(payload))
    else fakeDecode(payload)

  /** STUB decoder — deterministic stand-in for a real codec. Real
    * implementation would decode `payload` (e.g. JPEG → pixels) and emit
    * model-ready features; the 16-bin normalized byte histogram below keeps
    * the contract (payload → fixed-width Array[Double]) testable offline.
    */
  def fakeDecode(payload: Array[Byte]): Array[Double] = {
    val bins = new Array[Double](16)
    payload.foreach(b => bins((b & 0xff) >> 4) += 1.0)
    val total = math.max(payload.length, 1)
    bins.map(_ / total)
  }

  /** Per-partition decode + feature extraction — one stage, no shuffle.
    * Dispatches per item on mime: real `javax.imageio` decode for images,
    * byte-histogram stub otherwise.
    */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // per-partition init of a heavier decoder would go here (amortized)
      it.map { m =>
        MediaFeatures(m.media_id, m.mime, m.payload.length.toLong,
          decodeFeatures(m.mime, m.payload))
      }
    }
  }

  /** STUB resize — keeps the payload→payload contract of an image resize
    * (real impl: decode → scale → re-encode behind this same signature).
    * The deterministic stand-in keeps every `factor`-th byte, so output
    * size ≈ input/factor, mirroring a resolution downscale. Runs
    * per-partition, no shuffle — a resize stage slots into the same
    * scan→transform pipeline stage as decode.
    */
  /** Fixed-point bilinear downscale to `ow`×`oh`, returning packed RGB
    * ints row-major. PURE integer arithmetic (16.16 fixed-point sample
    * coordinates and weights, round-half-up on the final blend) — unlike
    * Java2D's `drawImage`, whose bilinear output is not specified
    * bit-exactly across JVM versions/platforms, this is deterministic by
    * construction on heterogeneous executors, which is what lets banded
    * Hamming joins over [[dHash]] keys computed on different machines
    * still collide exactly. Center-aligned sampling: target pixel t maps
    * to source coordinate (2t+1)·src/(2·dst) − 1/2, clamped to the image.
    */
  private[graft] def bilinearDownscale(
      img: java.awt.image.BufferedImage, ow: Int, oh: Int): Array[Int] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](ow * oh)
    var ty = 0
    while (ty < oh) {
      // sy in 16.16 fixed point: ((2·ty+1)·h − oh) / (2·oh), clamped ≥ 0
      val syN = (2L * ty + 1) * h - oh
      val sy16 = if (syN <= 0) 0L else (syN << 16) / (2L * oh)
      val y0 = (sy16 >> 16).toInt
      val fy = (sy16 & 0xffff).toInt
      val y1 = math.min(y0 + 1, h - 1)
      var tx = 0
      while (tx < ow) {
        val sxN = (2L * tx + 1) * w - ow
        val sx16 = if (sxN <= 0) 0L else (sxN << 16) / (2L * ow)
        val x0 = (sx16 >> 16).toInt
        val fx = (sx16 & 0xffff).toInt
        val x1 = math.min(x0 + 1, w - 1)
        val p00 = img.getRGB(x0, y0); val p10 = img.getRGB(x1, y0)
        val p01 = img.getRGB(x0, y1); val p11 = img.getRGB(x1, y1)
        var rgb = 0
        var s = 16
        while (s >= 0) {
          val c00 = (p00 >> s) & 0xff; val c10 = (p10 >> s) & 0xff
          val c01 = (p01 >> s) & 0xff; val c11 = (p11 >> s) & 0xff
          val top = c00.toLong * (65536 - fx) + c10.toLong * fx
          val bot = c01.toLong * (65536 - fx) + c11.toLong * fx
          // blend is ≤ 255·2^32 so the +2^31 rounding bias cannot overflow
          val v = ((top * (65536 - fy) + bot * fy + (1L << 31)) >> 32).toInt
          rgb = (rgb << 8) | math.min(255, v)
          s -= 8
        }
        out(ty * ow + tx) = rgb
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** 64-bit perceptual difference hash (dHash): decode → 9×8 bilinear
    * downscale → integer Rec.601 luma → bit (y·8+x) set iff
    * luma(x+1, y) > luma(x, y). Near-identical images (recompression,
    * small edits, localized noise) land within a few Hamming bits;
    * unrelated images differ in ~32 of 64 — the image-modality analog of
    * j10's SimHash, and the key a crawl-scale image dedup buckets on.
    * Fully deterministic ACROSS JVMs/platforms: the downscale is the
    * in-house fixed-point [[bilinearDownscale]] (not Java2D, whose
    * interpolated output is unspecified at the bit level), and the luma
    * is integer — so the same payload hashes identically on every
    * executor of a heterogeneous cluster. None ⇔ payload not decodable
    * as an image.
    */
  def dHash(payload: Array[Byte]): Option[Long] =
    decodeImage(payload).map { img =>
      val px = bilinearDownscale(img, 9, 8)
      def luma(p: Int): Int = {
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        r * 299 + g * 587 + b * 114
      }
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (luma(px(y * 9 + x + 1)) > luma(px(y * 9 + x)))
            bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      bits
    }

  /** Header-only media probe result: container format plus the dimensions
    * (images) or sample-rate/channels/bit-depth (WAV audio) read from the
    * leading bytes. -1 marks fields the format's header does not carry.
    */
  final case class MediaHeader(format: String, width: Int, height: Int,
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      durationMs: Long = -1L)

  /** Parse format + dimensions from the payload's HEADER BYTES ONLY — no
    * ImageIO/AudioSystem, no pixel or sample decode. At 100 TB this is
    * the difference between profiling a media column at scan speed and
    * paying a full codec per row (measured in MediaPipelineSpec: ~56× per
    * row vs a 256×256 PNG decode — and the gap widens with resolution,
    * since probe cost is flat while decode cost is O(pixels)): schema-on-read dimension stats, size/aspect
    * filters, and format routing need only these bytes. Formats: PNG
    * (IHDR, big-endian), GIF (87a/89a logical screen, little-endian), BMP
    * (BITMAPINFOHEADER, little-endian, |height| — negative means
    * top-down), JPEG (marker walk to the first SOFn frame header), WAV
    * (RIFF/fmt chunk walk), MP3 (ID3v2 syncsafe skip + MPEG frame-sync
    * field decode), MP4/ISO-BMFF (moov→mvhd duration, trak→tkhd video
    * dimensions — the two container formats the decode path has no JVM
    * codec for, probed by pure byte walks), FLAC (mandatory-first
    * STREAMINFO bit-packed fields, incl. duration from the 36-bit total
    * sample count), OGG first-page id packets (Vorbis / Opus rate +
    * channels; unknown codecs abstain). None ⇔ the payload matches
    * no known signature or is truncated/corrupt before the needed
    * fields; parity with the real decoders on every generated
    * image/WAV fixture is pinned in MediaPipelineSpec (MP3/MP4 have no
    * in-container decoder — their fixtures are hand-assembled bytes with
    * known ground truth).
    */
  def headerProbe(payload: Array[Byte]): Option[MediaHeader] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def sig(bytes: Int*): Boolean =
      payload.length >= bytes.length &&
        bytes.zipWithIndex.forall { case (b, i) => u8(i) == b }
    def img(fmt: String, w: Int, h: Int) =
      Some(MediaHeader(fmt, w, h, -1, -1, -1))
    try {
      if (sig(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) &&
          payload.length >= 24)
        img("png", be32(16), be32(20))
      else if ((sig('G', 'I', 'F', '8', '7', 'a') ||
          sig('G', 'I', 'F', '8', '9', 'a')) && payload.length >= 10)
        img("gif", le16(6), le16(8))
      else if (sig('B', 'M') && payload.length >= 26) {
        // dims at 18/22 are only valid for the BITMAPINFOHEADER family
        // (DIB header size 40/52/56/64/108/124 at offset 14); an OS/2
        // BITMAPCOREHEADER (size 12) packs 16-bit dims at 18/20 and would
        // decode here as plausible-looking garbage — route it to None
        // rather than feed wrong dimensions into size/aspect filters
        val dib = le32(14)
        if (Set(40, 52, 56, 64, 108, 124)(dib))
          img("bmp", le32(18), math.abs(le32(22)))
        else None
      }
      else if (sig(0xff, 0xd8)) {
        // marker walk: FF D8, then FF-prefixed segments with 2-byte
        // big-endian lengths (length includes itself); dimensions live in
        // the first SOFn (C0–CF except the non-frame C4/C8/CC) at
        // +2 len +1 precision, then height(2) width(2). Fill bytes (FF FF)
        // and stray non-marker bytes are skipped per the spec.
        var i = 2
        var out: Option[MediaHeader] = None
        while (out.isEmpty && i + 3 < payload.length) {
          if (u8(i) != 0xff) i += 1 // stray byte between segments
          else {
            val m = u8(i + 1)
            if (m == 0xff) i += 1 // fill byte
            else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01)
              i += 2 // parameterless markers
            else if (m == 0xda || m == 0xd9)
              // SOS/EOI before any SOFn: what follows is entropy-coded
              // data (not marker-structured) or the end of image — a
              // stray FF C0–CF in there would be misread as a frame
              // header and yield garbage dimensions. Stop: corrupt → None
              i = payload.length
            else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
                m != 0xcc) {
              if (i + 8 < payload.length)
                out = img("jpeg", be16(i + 7), be16(i + 5))
              i = payload.length
            } else i += 2 + be16(i + 2) // skip segment by declared length
          }
        }
        out
      } else if (sig('R', 'I', 'F', 'F') && payload.length >= 12 &&
          u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E') {
        // RIFF chunk walk to "fmt ": chunkId(4) size(4,LE) data(size,
        // word-aligned). channels@+2, sampleRate@+4, bitsPerSample@+14.
        // A corrupt NEGATIVE chunk size would make the advance zero or
        // backwards (le32 is signed) and spin this walk forever — a hang
        // is worse than the partition-kill this probe exists to prevent,
        // so any non-positive advance aborts to None.
        var i = 12
        var out: Option[MediaHeader] = None
        var corrupt = false
        while (out.isEmpty && !corrupt && i + 8 <= payload.length) {
          val isFmt = u8(i) == 'f' && u8(i + 1) == 'm' &&
            u8(i + 2) == 't' && u8(i + 3) == ' '
          val sz = le32(i + 4)
          if (sz < 0) corrupt = true
          else if (isFmt) {
            // the fields read at +10..+23 only exist when the chunk
            // DECLARES at least the 16 PCM-fmt bytes — a smaller sz with
            // enough trailing payload would hand back the NEXT chunk's
            // bytes as plausible-looking rate/channels. Corrupt → None
            if (sz >= 16 && i + 8 + 16 <= payload.length)
              out = Some(MediaHeader("wav", -1, -1,
                le32(i + 12), le16(i + 10), le16(i + 22)))
            else corrupt = true
          }
          else i += 8 + sz + (sz & 1)
        }
        out
      } else if (sig('I', 'D', '3') ||
          (payload.length >= 4 && u8(0) == 0xff && (u8(1) & 0xe0) == 0xe0)) {
        // MPEG audio (MP3): ID3v2 tag skip + first frame header. The tag
        // size is syncsafe (4 × 7 bits, high bit MUST be clear — a set bit
        // marks corruption, not a bigger tag); the frame sync must sit
        // EXACTLY at the post-tag offset (or offset 0 with no tag) — a
        // forward scan for FF Ex would false-positive on arbitrary binary
        // payloads, and a probe that mislabels bytes is worse than None.
        def mpegFrame(o: Int): Option[MediaHeader] =
          if (o < 0 || o + 4 > payload.length || u8(o) != 0xff ||
              (u8(o + 1) & 0xe0) != 0xe0) None
          else {
            val ver = (u8(o + 1) >> 3) & 3 // 0=MPEG2.5 1=reserved 2=v2 3=v1
            val layer = (u8(o + 1) >> 1) & 3 // 0=reserved
            val brIdx = (u8(o + 2) >> 4) & 0xf // 0xf=bad
            val srIdx = (u8(o + 2) >> 2) & 3 // 3=reserved
            val mode = (u8(o + 3) >> 6) & 3 // 3=mono
            if (ver == 1 || layer == 0 || brIdx == 0xf || srIdx == 3) None
            else {
              // rate table factorizes: MPEG1 = 4× the MPEG2.5 base row,
              // MPEG2 = 2× (11025/12000/8000 × {4,2,1})
              val base = Array(11025, 12000, 8000)
              val mult = ver match { case 3 => 4; case 2 => 2; case _ => 1 }
              Some(MediaHeader("mp3", -1, -1, base(srIdx) * mult,
                if (mode == 3) 1 else 2, -1))
            }
          }
        if (!sig('I', 'D', '3')) mpegFrame(0)
        else if (payload.length < 10 ||
            ((u8(6) | u8(7) | u8(8) | u8(9)) & 0x80) != 0) None
        else {
          val tagSz = ((u8(6) & 0x7f) << 21) | ((u8(7) & 0x7f) << 14) |
            ((u8(8) & 0x7f) << 7) | (u8(9) & 0x7f)
          val footer = if ((u8(5) & 0x10) != 0) 10 else 0
          mpegFrame(10 + tagSz + footer)
        }
      } else if (payload.length >= 12 && u8(4) == 'f' && u8(5) == 't' &&
          u8(6) == 'y' && u8(7) == 'p') {
        // MP4/ISO-BMFF: box walk [size(4,BE) type(4) payload...] — find
        // moov, read duration from mvhd (duration/timescale, version 0 and
        // 1 layouts) and dimensions from the first trak→tkhd carrying a
        // nonzero 16.16 fixed-point width (the video track; audio tracks
        // store 0×0). No codec, no mdat read — pure byte walks, same
        // corrupt-degrades-to-None discipline: undersized / oversized /
        // truncated boxes stop the walk.
        def be64(i: Int): Long =
          (be32(i).toLong << 32) | (be32(i + 4).toLong & 0xffffffffL)
        // first box named `name` in [lo, hi): content bounds after the
        // 8- or 16-byte header. size 0 = to-end-of-enclosure, size 1 =
        // 64-bit largesize; a size smaller than its header or overrunning
        // the enclosure is corrupt and stops the scan.
        def findBox(lo: Int, hi: Int, name: String): Option[(Int, Int)] = {
          var i = lo
          var out: Option[(Int, Int)] = None
          var corrupt = false
          while (out.isEmpty && !corrupt && i + 8 <= hi) {
            val sz32 = be32(i)
            var hdr = 8
            val sz: Long =
              if (sz32 == 0) (hi - i).toLong
              else if (sz32 == 1) {
                hdr = 16
                if (i + 16 <= hi) be64(i + 8) else -1L
              } else sz32.toLong & 0xffffffffL
            if (sz < hdr || i.toLong + sz > hi) corrupt = true
            else if (u8(i + 4) == name(0) && u8(i + 5) == name(1) &&
                u8(i + 6) == name(2) && u8(i + 7) == name(3))
              out = Some((i + hdr, i + sz.toInt))
            else i += sz.toInt
          }
          out
        }
        findBox(0, payload.length, "moov").map { case (mlo, mhi) =>
          val dur: Long = findBox(mlo, mhi, "mvhd").flatMap {
            case (blo, bhi) =>
              if (blo >= bhi) None
              else u8(blo) match {
                // content: verflags(4), then v0 ctime(4) mtime(4)
                // timescale(4) duration(4); v1 widens the times to 8.
                // All-ones duration is ISO 14496-12's "duration cannot be
                // determined" sentinel (live/streamed recordings) — both
                // versions must report it as not-carried, never as a real
                // ~49-day (v0) value
                case 0 if blo + 20 <= bhi =>
                  val ts = be32(blo + 12)
                  val du = be32(blo + 16).toLong & 0xffffffffL
                  if (ts > 0 && du != 0xffffffffL) Some(du * 1000L / ts)
                  else None
                case 1 if blo + 32 <= bhi =>
                  val ts = be32(blo + 20)
                  val du = be64(blo + 24)
                  if (ts > 0 && du >= 0 && du != -1L) Some(du * 1000L / ts)
                  else None
                case _ => None
              }
          }.getOrElse(-1L)
          var tl = mlo
          var dims: Option[(Int, Int)] = None
          var more = true
          var guard = 0 // sibling-scan bound: no real moov has 64 traks
          while (dims.isEmpty && more && guard < 64) {
            guard += 1
            findBox(tl, mhi, "trak") match {
              case None => more = false
              case Some((tlo, thi)) =>
                tl = thi
                findBox(tlo, thi, "tkhd").foreach { case (klo, khi) =>
                  // tkhd content: verflags, times/id/duration (v0: width
                  // at 76; v1: at 88), then 16.16 fixed-point dims
                  val (wOff, need) =
                    if (u8(klo) == 0) (76, 84) else (88, 96)
                  if (klo + need <= khi) {
                    val w = be32(klo + wOff) >>> 16
                    val h = be32(klo + wOff + 4) >>> 16
                    if (w > 0 && h > 0) dims = Some((w, h))
                  }
                }
            }
          }
          MediaHeader("mp4", dims.map(_._1).getOrElse(-1),
            dims.map(_._2).getOrElse(-1), -1, -1, -1, dur)
        }
      } else if (sig('f', 'L', 'a', 'C')) {
        // FLAC: the STREAMINFO metadata block is MANDATORY and FIRST
        // (spec §metadata) — a payload whose first block is any other
        // type is corrupt, not a different layout, so no block walk is
        // needed. Block header: 1 byte (bit7 last-flag, bits0-6 type=0),
        // 3-byte BE length which must be the fixed 34. The fields are
        // bit-packed at content bytes 10..17: sampleRate 20 bits,
        // channels-1 3 bits, bitsPerSample-1 5 bits, totalSamples 36
        // bits (0 = unknown; sampleRate 0 is explicitly invalid → None).
        if (payload.length < 8 + 18 || (u8(4) & 0x7f) != 0 ||
            ((u8(5) << 16) | (u8(6) << 8) | u8(7)) != 34) None
        else {
          val sr = (u8(18) << 12) | (u8(19) << 4) | (u8(20) >>> 4)
          val ch = ((u8(20) >>> 1) & 0x7) + 1
          val bps = (((u8(20) & 1) << 4) | (u8(21) >>> 4)) + 1
          val totalSamples = ((u8(21) & 0xf).toLong << 32) |
            (be32(22).toLong & 0xffffffffL)
          if (sr == 0) None
          else Some(MediaHeader("flac", -1, -1, sr, ch, bps,
            if (totalSamples > 0) totalSamples * 1000L / sr else -1L))
        }
      } else if (sig('O', 'g', 'g', 'S')) {
        // OGG: the FIRST page of a logical stream (version 0, BOS flag
        // 0x02 set — a mid-stream fragment has no identification header
        // to read, so anything else degrades to None) carries exactly
        // the codec's id packet: segment count at 26, segment table,
        // then the packet. Vorbis: \x01"vorbis" → channels(1)@11,
        // rate(4,LE)@12. Opus: "OpusHead" → channels(1)@9, original
        // input rate(4,LE)@12. Unknown codecs → None (mislabeling is
        // worse than abstaining — the MP3 sync rule).
        if (payload.length < 27 || u8(4) != 0 || (u8(5) & 0x02) == 0) None
        else {
          val segs = u8(26)
          val p = 27 + segs
          def at(off: Int, s: String): Boolean =
            p + off + s.length <= payload.length &&
              s.indices.forall(k => u8(p + off + k) == s(k))
          if (payload.length >= p + 7 && u8(p) == 0x01 && at(1, "vorbis") &&
              payload.length >= p + 16) {
            val sr = le32(p + 12)
            if (sr <= 0) None
            else Some(MediaHeader("ogg-vorbis", -1, -1, sr, u8(p + 11), -1))
          } else if (at(0, "OpusHead") && payload.length >= p + 16) {
            val sr = le32(p + 12)
            if (sr <= 0) None
            else Some(MediaHeader("ogg-opus", -1, -1, sr, u8(p + 9), -1))
          } else None
        }
      } else None
    } catch {
      // truncated payloads can index past the end mid-walk — a corrupt
      // file degrades to None, never kills the partition (decode rule)
      case _: ArrayIndexOutOfBoundsException => None
    }
  }

  /** Dataset-level header profiling: (media_id, mime, n_bytes, format,
    * width, height, sample_rate, channels, bits_per_sample) from header
    * bytes only — the scan-speed media profile stage. Same
    * partition-preserving `mapPartitions` shape as [[extractFeatures]],
    * but per-row cost is a few branches instead of a codec; nulls where
    * the payload is unrecognized (profiling must surface corrupt rows,
    * not drop them).
    */
  def headerProfile(items: Dataset[MediaItem]): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.map { m =>
      val h = headerProbe(m.payload)
      (m.media_id, m.mime, m.payload.length.toLong, h.map(_.format),
        h.map(_.width), h.map(_.height), h.map(_.sampleRate),
        h.map(_.channels), h.map(_.bitsPerSample), h.map(_.durationMs))
    }).toDF("media_id", "mime", "n_bytes", "format", "width", "height",
      "sample_rate", "channels", "bits_per_sample", "duration_ms")
  }

  /** Image near-dup pairs within Hamming ≤ `maxHamming` over dHash,
    * banded 4 × 16 bits — j10's SimHash discipline applied to the image
    * modality: by pigeonhole, ≤ 3 differing bits cannot touch all 4 bands,
    * so every qualifying pair collides in at least one band-key equi-join
    * bucket (exact recall at maxHamming ≤ 3 BY CONSTRUCTION, not
    * probabilistically); the exact `bit_count(xor)` verify runs on banded
    * candidates only — no O(n²) pair scan at any collection size.
    * Undecodable payloads and non-images drop out before the join.
    */
  def imageNeardupPairs(items: Dataset[MediaItem],
      maxHamming: Int = 3): DataFrame = {
    // the pigeonhole guarantee is a property of the FIXED 4-band split —
    // enforced, not doc-only (a wider threshold would silently lose pairs
    // whose differing bits touch all four bands)
    require(maxHamming <= 3,
      s"4x16-bit banding guarantees recall only for maxHamming <= 3, " +
        s"got $maxHamming")
    val spark = items.sparkSession
    import spark.implicits._
    // tiny shared subtree (media_id + one long per image) feeding BOTH
    // join sides — truncated, or every image ImageIO-decodes twice (the
    // j10 signature-table rule)
    val hashes = graft.Q.truncateLineage(
      items.mapPartitions(_.flatMap(m =>
          if (m.mime.startsWith("image/"))
            dHash(m.payload).map(h => (m.media_id, h))
          else None))
        .toDF("media_id", "h"))
    val keys = hashes.select(col("media_id"), col("h"), expr(
      """explode(transform(sequence(0, 3),
         b -> named_struct('b', b,
           'k', (h >> (b * 16)) & 65535)))""").as("s"))
      .select(col("media_id"), col("h"),
        col("s.b").as("b"), col("s.k").as("k"))
    keys.alias("x").join(keys.alias("y"),
        col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        expr("bit_count(x.h ^ y.h)").cast("long").as("hamming"))
      // verify BEFORE the dedup exchange: the Hamming filter is the
      // selective one, so the distinct shuffles only qualifying pairs
      // (a pair colliding in several bands dedups here)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  def fakeResize(payload: Array[Byte], factor: Int): Array[Byte] =
    // O(n/factor) copy, no per-byte boxing — this models the hot path
    Array.tabulate((payload.length + factor - 1) / factor)(k =>
      payload(k * factor))

  /** REAL image resize: decode → bilinear downscale by 1/factor →
    * re-encode PNG (lossless, deterministic). None ⇔ payload didn't decode
    * or is smaller than the factor; callers fall back to the stride stub.
    */
  def resizeImage(payload: Array[Byte], factor: Int): Option[Array[Byte]] =
    decodeImage(payload)
      .filter(i => i.getWidth >= factor && i.getHeight >= factor)
      .map { img =>
        val w = img.getWidth / factor
        val h = img.getHeight / factor
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }

  def resize(items: Dataset[MediaItem], factor: Int = 2): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { m =>
      val resized =
        if (m.mime.startsWith("image/")) resizeImage(m.payload, factor)
        else None
      m.copy(payload = resized.getOrElse(fakeResize(m.payload, factor)))
    })
  }

  /** REAL multi-frame decode for animated GIF — the one multi-frame
    * container format with a JDK-shipped reader (`javax.imageio`'s GIF
    * plugin reads every image in the stream). Returns the stored frames in
    * order; None ⇔ not a decodable multi-image payload. Caveat, stated:
    * GIF delta frames are returned as STORED (the sub-rectangle a frame
    * updates) without disposal-method compositing — keyframe-style
    * sampling is exactly the case where stored frames are full frames;
    * full video semantics need an external codec and stay out of scope.
    */
  def decodeFrames(
      payload: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        r.setInput(iis)
        val n = r.getNumImages(true)
        val frames = Vector.tabulate(n)(i => r.read(i))
        r.dispose()
        iis.close()
        Some(frames)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL video decode for MJPEG-in-AVI — the one video coding a bare JVM
    * can genuinely handle: every frame is an independent JPEG (no
    * inter-frame prediction), stored as `..db`/`..dc` chunks in a RIFF
    * container, and `javax.imageio` ships a JPEG reader. The walk below
    * parses the actual RIFF grammar (fourcc + LE32 size, LIST/RIFF nodes
    * carry a subtype then children, chunks pad to even offsets), so any
    * spec-conforming MJPEG AVI decodes — not just the test fixture.
    * Returns None ⇔ not a RIFF/AVI payload or no decodable frame chunks.
    * Inter-frame codecs (H.264/VP9/…) need external decoders and remain
    * out of scope, stated openly.
    */
  def decodeAviMjpeg(
      payload: Array[Byte]): Option[Vector[java.awt.image.BufferedImage]] = {
    def fourcc(o: Int): String =
      new String(payload.slice(o, o + 4), "US-ASCII")
    def le32(o: Int): Long =
      (payload(o) & 0xffL) | (payload(o + 1) & 0xffL) << 8 |
        (payload(o + 2) & 0xffL) << 16 | (payload(o + 3) & 0xffL) << 24
    if (payload.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return None
    val frames = Vector.newBuilder[java.awt.image.BufferedImage]
    // Iterative walk with an explicit heap range stack: a crafted payload
    // of ~len/12 nested 12-byte LIST headers would otherwise recurse that
    // deep and throw StackOverflowError, which NonFatal does NOT catch —
    // breaking the "None for bad payloads" contract on untrusted corpora.
    def walk(from0: Int, to0: Int): Unit = {
      var stack = List((from0, to0))
      while (stack.nonEmpty) {
        var (o, to) = stack.head
        stack = stack.tail
        var descended = false
        while (!descended && o + 8 <= to) {
          val id = fourcc(o)
          val sz = math.min(le32(o + 4), (to - o - 8).toLong).toInt
          val next = o + 8 + sz + (sz & 1) // chunks pad to even offsets
          if ((id == "LIST" || id == "RIFF") && sz >= 4) {
            // in-order: interior first, then the rest of this range —
            // frame order must match the depth-first file order
            stack = (o + 12, o + 8 + sz) :: (next, to) :: stack
            descended = true // skip the 4-byte list subtype via interior
          } else {
            if (id.length == 4 && (id.endsWith("db") || id.endsWith("dc"))
                && id.take(2).forall(_.isDigit) && sz > 0)
              try {
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(payload, o + 8, sz))
                if (img != null) frames += img
              } catch { case scala.util.control.NonFatal(_) => () }
            o = next
          }
        }
      }
    }
    try walk(12, payload.length)
    catch { case scala.util.control.NonFatal(_) => () }
    val out = frames.result()
    if (out.nonEmpty) Some(out) else None
  }

  /** Frame sampling — the 1:N generate stage of a video pipeline: keep
    * every `stride`-th frame. Multi-frame image payloads (animated GIF)
    * and MJPEG AVI video get a REAL decode via [[decodeFrames]] /
    * [[decodeAviMjpeg]], each sampled frame re-encoded as PNG (lossless,
    * deterministic); other mimes chop the payload into fixed-size
    * pseudo-frames (the declared stub — an external keyframe extractor
    * would slot behind the same signature). flatMap keeps it inside one
    * stage; output cardinality is bounded by frames / stride (or payload
    * size / (frameBytes × stride) on the stub path), so a skew-heavy
    * video corpus fans out proportionally to bytes, not rows.
    */
  def sampleFrames(
      items: Dataset[MediaItem], frameBytes: Int = 64,
      stride: Int = 4): Dataset[MediaFrame] = {
    import items.sparkSession.implicits._
    items.flatMap { m =>
      val real =
        if (m.mime.startsWith("image/")) decodeFrames(m.payload)
        else if (m.mime.startsWith("video/")) decodeAviMjpeg(m.payload)
        else None
      real match {
        case Some(frames) if frames.nonEmpty =>
          frames.zipWithIndex.collect {
            case (img, i) if i % stride == 0 =>
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(img, "png", bos)
              MediaFrame(m.media_id, i, bos.toByteArray)
          }
        case _ =>
          m.payload.grouped(frameBytes).zipWithIndex
            .collect { case (f, i) if i % stride == 0 =>
              MediaFrame(m.media_id, i, f) }.toSeq
      }
    }
  }

  /** Demo source: documents' text bytes as media payloads (the container has
    * no binary media fixtures; the column mechanics are identical).
    */
  def documentsAsMedia(
      spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        lit("text/plain").as("mime"),
        col("text").cast("binary").as("payload"))
      .as[MediaItem]
  }

  /** Streaming media ingest — the streaming twin of
    * `sources.Formats.readBinaryFiles`: watch a directory of raw asset
    * files (`binaryFile` source; new files = new micro-batches,
    * `Trigger.AvailableNow` = bounded-lag backfill over an existing asset
    * store), map each file to a `MediaItem` (id from the trailing digits
    * of the file name, mime from the extension), and feed the same
    * per-partition decode stages as the batch path. `pathGlobFilter`
    * prunes non-matching files at LISTING time, before any bytes move.
    *
    * Naming contract: asset files are `<anything><digits>.<ext>` — the
    * trailing digits are the media id. A file the glob admits but whose
    * name carries no id (e.g. a stray `README.txt` in the asset dir) is
    * SKIPPED with a filter here rather than killing the whole streaming
    * query when NULL hits MediaItem's non-nullable `media_id`.
    */
  def mediaFileStream(
      spark: SparkSession, dir: String,
      glob: String = "*"): Dataset[MediaItem] = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", glob)
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length BIGINT, content BINARY")
      .load(dir)
      .select(
        // try_cast: regexp_extract yields '' on no match, and an ANSI
        // cast('') would throw before the null-id filter can skip the row
        expr("""try_cast(regexp_extract(path, '([0-9]+)\\.[^.]+$', 1)
                as long)""").as("media_id"),
        expr("""CASE WHEN path LIKE '%.jpg' THEN 'image/jpeg'
                     WHEN path LIKE '%.wav' THEN 'audio/wav'
                     ELSE 'application/octet-stream' END""").as("mime"),
        col("content").as("payload"))
      .filter(col("media_id").isNotNull)
      .as[MediaItem]
  }
}
