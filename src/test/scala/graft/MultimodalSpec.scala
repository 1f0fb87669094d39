package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val assets = Seq(
    (1L, "image", "0123456789abcdef0123456789abcdef"), // 32 bytes = 2 frames
    (2L, "audio", "short"),                            // 5 bytes = 1 frame
  ).toDF("id", "modality", "payload")
    .withColumn("content", col("payload").cast("binary"))

  test("features: byte length, frame count, stub dimensions in range") {
    val f = Multimodal.features(assets, col("id"), col("content"), col("modality"))
      .collect().map(r => r.getLong(2) -> r).toMap
    val img = f(32L)
    assert(img.getLong(6) == 2) // n_frames
    assert(img.getInt(4) >= 1 && img.getInt(4) <= 64) // width
    assert(img.getInt(5) >= 1 && img.getInt(5) <= 64) // height
    assert(f(5L).getLong(6) == 1)
  }

  test("Column stub matches the driver-side decodeStub exactly") {
    val bytes = "0123456789abcdef0123456789abcdef".getBytes("UTF-8")
    val (w, h) = Multimodal.decodeStub(bytes)
    val row = Multimodal.features(assets.where($"id" === 1),
      col("id"), col("content"), col("modality")).head()
    assert(row.getInt(4) == w && row.getInt(5) == h)
  }

  test("mapPartitions decode path agrees with the Column projection") {
    val ds = assets.select($"id", $"modality", $"content")
      .as[(Long, String, Array[Byte])]
    val viaPartitions = Multimodal.decodePartitions(ds).collect()
      .map(m => m.id -> ((m.sha, m.width, m.height, m.n_frames))).toMap
    val viaColumns = Multimodal.features(assets, col("id"), col("content"),
      col("modality")).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getInt(4), r.getInt(5),
        r.getLong(6)))).toMap
    assert(viaPartitions == viaColumns)
  }

  // ---- dependency-free header parsers (BMP / PPM / WAV) ----

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"fixtures/multimodal/$name"))

  test("BMP headers parse: bottom-up, top-down (negative height), and " +
    "the legacy 12-byte core header") {
    assert(Multimodal.decode(fixture("img_24bit.bmp")) ==
      Multimodal.Decoded("image/bmp", 17, 9, 1L))
    assert(Multimodal.decode(fixture("img_topdown.bmp")) ==
      Multimodal.Decoded("image/bmp", 5, 7, 1L))
    assert(Multimodal.decode(fixture("img_core.bmp")) ==
      Multimodal.Decoded("image/bmp", 12, 3, 1L))
  }

  test("PPM/PGM headers parse, including comments between header tokens") {
    assert(Multimodal.decode(fixture("img_rgb.ppm")) ==
      Multimodal.Decoded("image/ppm", 6, 4, 1L))
    assert(Multimodal.decode(fixture("img_gray.pgm")) ==
      Multimodal.Decoded("image/ppm", 9, 2, 1L))
    assert(Multimodal.decode(fixture("img_plain.ppm")) ==
      Multimodal.Decoded("image/ppm", 3, 5, 1L))
  }

  test("PNG headers parse (big-endian IHDR dims); GIF logical screen " +
    "descriptors parse (little-endian, both spec versions)") {
    assert(Multimodal.decode(fixture("img_rgba.png")) ==
      Multimodal.Decoded("image/png", 21, 13, 1L))
    assert(Multimodal.decode(fixture("img_tall.png")) ==
      Multimodal.Decoded("image/png", 1, 999, 1L))
    assert(Multimodal.decode(fixture("img_anim.gif")) ==
      Multimodal.Decoded("image/gif", 31, 7, 1L))
    assert(Multimodal.decode(fixture("img_old.gif")) ==
      Multimodal.Decoded("image/gif", 4, 4, 1L))
    // near-misses fall to the stub, never throw: a truncated PNG
    // signature, an IHDR-less chunk stream, a GIF with a zero dimension
    assert(Multimodal.decode(fixture("not_a.png")).modality == "opaque")
    val noIhdr = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++
      Array[Byte](0, 0, 0, 13) ++ "XXXX".getBytes ++ Array.fill[Byte](17)(0)
    assert(Multimodal.decode(noIhdr).modality == "opaque")
    val zeroGif = "GIF89a".getBytes ++
      Array[Byte](0, 0, 5, 0, 0, 0, 0, 0x3b)
    assert(Multimodal.decode(zeroGif).modality == "opaque")
  }

  test("JPEG frame headers parse via the marker walk: baseline SOF0, " +
    "progressive SOF2, COM segments skipped; SOF-less streams fall to " +
    "the stub") {
    assert(Multimodal.decode(fixture("img_base.jpg")) ==
      Multimodal.Decoded("image/jpeg", 640, 480, 1L))
    assert(Multimodal.decode(fixture("img_prog.jpg")) ==
      Multimodal.Decoded("image/jpeg", 33, 77, 1L))
    // SOI + COM + EOI, never a SOF: opaque, not a throw
    assert(Multimodal.decode(fixture("not_a.jpg")).modality == "opaque")
    // adversarial segment length (0xFFFF) walks off the end harmlessly
    val evil = Array(0xff, 0xd8, 0xff, 0xe0, 0xff, 0xff).map(_.toByte) ++
      Array.fill[Byte](16)(0)
    assert(Multimodal.decode(evil).modality == "opaque")
    // DHT's C4 marker must NOT be mistaken for a SOF
    val dhtFirst = Array(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x04, 0x00, 0x00,
      0xff, 0xd9).map(_.toByte)
    assert(Multimodal.decode(dhtFirst).modality == "opaque")
  }

  test("MP4 box walk parses tkhd dimensions: the first NONZERO-dims trak " +
    "wins (audio traks carry zeros), 64-bit largesize boxes walk too") {
    assert(Multimodal.decode(fixture("vid_basic.mp4")) ==
      Multimodal.Decoded("video/mp4", 1920, 1080, 1L))
    assert(Multimodal.decode(fixture("vid_large.mp4")) ==
      Multimodal.Decoded("video/mp4", 64, 36, 1L))
    // ftyp with no moov: opaque, not a throw
    val noMoov = fixture("vid_basic.mp4").take(24)
    assert(Multimodal.decode(noMoov).modality == "opaque")
    // adversarial box size (0xFFFFFFFF) aborts the walk harmlessly
    val evil = fixture("vid_basic.mp4").take(24) ++
      Array(0xff, 0xff, 0xff, 0xff).map(_.toByte) ++ "moov".getBytes ++
      Array.fill[Byte](16)(0)
    assert(Multimodal.decode(evil).modality == "opaque")
    // version-1 tkhd (64-bit times/duration) shifts the dims by 12 bytes
    assert(Multimodal.decode(fixture("vid_v1.mp4")) ==
      Multimodal.Decoded("video/mp4", 256, 144, 1L))
    // largesize near Long.MaxValue must not wrap the cursor into
    // negative offsets (never-throw contract under adversarial sizes)
    val wrap = fixture("vid_basic.mp4").take(28) ++
      Array(0x00, 0x00, 0x00, 0x01).map(_.toByte) ++ "moov".getBytes ++
      Array(0x7f, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xf8).map(_.toByte) ++
      Array.fill[Byte](32)(0)
    assert(Multimodal.decode(wrap).modality == "opaque")
  }

  test("JPEG: a SOF segment whose declared length cannot hold the frame " +
    "parameters falls to the stub instead of reading the next segment") {
    val evil = Array(0xff, 0xd8, 0xff, 0xc0, 0x00, 0x02, 0x00, 0x10,
      0x00, 0x10).map(_.toByte) ++ Array.fill[Byte](8)(0)
    assert(Multimodal.decode(evil).modality == "opaque")
  }

  test("WebP headers parse: lossy 14-bit dims, lossless bit-packed " +
    "dims-1, extended 24-bit canvas; corrupt start codes fall to the stub") {
    assert(Multimodal.decode(fixture("img_lossy.webp")) ==
      Multimodal.Decoded("image/webp", 160, 120, 1L))
    assert(Multimodal.decode(fixture("img_lossless.webp")) ==
      Multimodal.Decoded("image/webp", 300, 200, 1L))
    assert(Multimodal.decode(fixture("img_ext.webp")) ==
      Multimodal.Decoded("image/webp", 70000, 3, 1L))
    // VP8 chunk with a corrupt start code: opaque, never dims from the tag
    assert(Multimodal.decode(fixture("not_a.webp")).modality == "opaque")
    // VP8L with nonzero version bits violates the spec -> stub
    val badVer = fixture("img_lossless.webp").clone()
    badVer(24) = (badVer(24) | 0xe0).toByte
    assert(Multimodal.decode(badVer).modality == "opaque")
    // unknown first chunk in a WEBP container -> stub
    val unk = fixture("img_lossy.webp").clone()
    unk(12) = 'X'.toByte
    assert(Multimodal.decode(unk).modality == "opaque")
    // truncated after the fourcc: opaque, never a throw
    assert(Multimodal.decode(
      fixture("img_lossy.webp").take(16)).modality == "opaque")
  }

  test("TIFF IFDs parse in both byte orders, SHORT and LONG dims, " +
    "unrelated tags skipped; bad magic or truncated IFDs fall to the stub") {
    assert(Multimodal.decode(fixture("img_le.tif")) ==
      Multimodal.Decoded("image/tiff", 88, 44, 1L))
    assert(Multimodal.decode(fixture("img_be.tif")) ==
      Multimodal.Decoded("image/tiff", 13, 57, 1L))
    assert(Multimodal.decode(fixture("img_wide.tif")) ==
      Multimodal.Decoded("image/tiff", 100000, 2, 1L))
    // "II" with magic 43: opaque
    assert(Multimodal.decode(fixture("not_a.tif")).modality == "opaque")
    // IFD offset pointing past the end: opaque, never a throw
    val farIfd = fixture("img_le.tif").clone()
    farIfd(4) = 0xff.toByte; farIfd(5) = 0xff.toByte
    assert(Multimodal.decode(farIfd).modality == "opaque")
    // IFD truncated after the width entry: the walk stops at the end
    // and (missing a height) degrades to opaque, never a throw
    val truncated = fixture("img_le.tif").take(8 + 2 + 12)
    assert(Multimodal.decode(truncated).modality == "opaque")
  }

  test("WAV headers parse: channels, bit depth, sample-frame count") {
    assert(Multimodal.decode(fixture("audio_stereo16.wav")) ==
      Multimodal.Decoded("audio/wav", 2, 16, 321L))
    assert(Multimodal.decode(fixture("audio_mono8.wav")) ==
      Multimodal.Decoded("audio/wav", 1, 8, 123L))
  }

  test("FLAC STREAMINFO parses: bit-packed channels, bit depth, total " +
    "samples; zero-rate or truncated blocks fall to the stub") {
    assert(Multimodal.decode(fixture("audio_stereo.flac")) ==
      Multimodal.Decoded("audio/flac", 2, 16, 4000L))
    assert(Multimodal.decode(fixture("audio_hires.flac")) ==
      Multimodal.Decoded("audio/flac", 1, 24, 3369L))
    assert(Multimodal.decode(fixture("audio_info.flac")) ==
      Multimodal.Decoded("audio/flac", 2, 16, 88200L))
    // truncated right after the magic: opaque, never a throw
    assert(Multimodal.decode("fLaC".getBytes).modality == "opaque")
    // a non-STREAMINFO first block violates the spec -> stub
    val badType = fixture("audio_stereo.flac").clone()
    badType(4) = (0x80 | 4).toByte // VORBIS_COMMENT first
    assert(Multimodal.decode(badType).modality == "opaque")
    // zero sample rate is invalid per spec -> stub
    val zeroRate = fixture("audio_stereo.flac").clone()
    zeroRate(18) = 0; zeroRate(19) = 0; zeroRate(20) = (zeroRate(20) & 0x0f).toByte
    assert(Multimodal.decode(zeroRate).modality == "opaque")
  }

  test("Ogg page walks parse Opus and Vorbis identification headers; " +
    "the final granule gives the duration; unknown codecs fall to the stub") {
    assert(Multimodal.decode(fixture("audio_voice.opus")) ==
      Multimodal.Decoded("audio/opus", 1, 0, 144000L))
    assert(Multimodal.decode(fixture("audio_music.opus")) ==
      Multimodal.Decoded("audio/opus", 2, 0, 960000L))
    // Vorbis fixture carries a >255-byte page (multi-segment lacing)
    assert(Multimodal.decode(fixture("audio_song.ogg")) ==
      Multimodal.Decoded("audio/vorbis", 2, 0, 220500L))
    // valid page, unknown codec payload -> stub
    assert(Multimodal.decode(fixture("not_an.ogg")).modality == "opaque")
    // truncating the stream mid-page keeps the last readable granule:
    // cutting the final (data) page of the voice fixture leaves the
    // header pages only -> granule 0, channels still parse
    val full = fixture("audio_voice.opus")
    assert(Multimodal.decode(full.take(full.length - 10)) ==
      Multimodal.Decoded("audio/opus", 1, 0, 0L))
    // truncated before the first page completes: opaque, never a throw
    assert(Multimodal.decode("OggS".getBytes).modality == "opaque")
    assert(Multimodal.decode(full.take(30)).modality == "opaque")
  }

  test("non-format and near-miss payloads fall to the documented stub, " +
    "never throw") {
    for (name <- Seq("payload.bin", "not_a.bmp")) {
      val bytes = fixture(name)
      val d = Multimodal.decode(bytes)
      assert(d.modality == "opaque")
      assert((d.width, d.height) == Multimodal.decodeStub(bytes))
      assert(d.nFrames ==
        math.ceil(bytes.length.toDouble / Multimodal.FrameBytes).toLong)
    }
    // truncated magics and malformed headers must not throw either
    for (b <- Seq(Array.empty[Byte], "BM".getBytes, "P6".getBytes,
        "RIFFxxxxWAVE".getBytes, "P6 0 0 255 ".getBytes)) {
      assert(Multimodal.decode(b).modality == "opaque")
    }
    // adversarial WAV chunk size (0xFFFFFFF8 = -8 as an Int): the chunk
    // walk must neither loop forever nor throw — the long cursor walks
    // off the end and the payload degrades to opaque
    val evil = "RIFF".getBytes ++ Array[Byte](0x24, 0, 0, 0) ++
      "WAVE".getBytes ++ "junk".getBytes ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte) ++
      Array.fill[Byte](32)(0)
    assert(Multimodal.decode(evil).modality == "opaque")
  }

  test("decodePartitions keeps the caller's modality hint for opaque " +
    "payloads and overrides it for recognized formats") {
    val rows = Seq(
      (1L, "text", "just some text".getBytes("UTF-8")),
      (2L, "image", fixture("img_24bit.bmp"))).toDS()
    val got = Multimodal.decodePartitions(rows).collect()
      .map(m => m.id -> ((m.modality, m.width, m.height, m.n_frames))).toMap
    assert(got(1L)._1 == "text")
    assert(got(2L) == (("image/bmp", 17, 9, 1L)))
  }

  // canonical pixel checksum, re-implemented here independently of the
  // (private) production helper: sha256 over R,G,B,A bytes row-major
  private def rgbaSha(w: Int, h: Int, argb: (Int, Int) => Int): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    for (y <- 0 until h; x <- 0 until w) {
      val p = argb(x, y)
      d.update(Array(((p >> 16) & 0xff).toByte, ((p >> 8) & 0xff).toByte,
        (p & 0xff).toByte, ((p >>> 24) & 0xff).toByte))
    }
    d.digest().map("%02x".format(_)).mkString
  }

  test("decodePixels routes each fixture to the right decoder: pure " +
    "PPM/PNG/BMP paths, ImageIO for paletted BMP, None for rasterless " +
    "payloads") {
    def src(name: String): Option[String] =
      Multimodal.decodePixels(fixture(name)).map(_.source)
    for (n <- Seq("img_rgba.png", "img_tall.png", "img_gray.png",
        "img_rgb.png", "img_pal.png", "img_grayalpha.png"))
      assert(src(n).contains("png-jdk"), n)
    for (n <- Seq("img_24bit.bmp", "img_topdown.bmp", "img_core.bmp"))
      assert(src(n).contains("bmp"), n)
    for (n <- Seq("img_rgb.ppm", "img_gray.pgm", "img_plain.ppm"))
      assert(src(n).contains("ppm"), n)
    assert(src("img_pal8.bmp").contains("imageio"))
    // header-only JPEG/GIF (no entropy/LZW data), audio, video, opaque,
    // truncated PNG: no decodable raster — None, never a throw
    for (n <- Seq("img_base.jpg", "img_anim.gif", "audio_stereo16.wav",
        "audio_stereo.flac", "vid_basic.mp4", "payload.bin", "not_a.png",
        "img_lossy.webp"))
      assert(src(n).isEmpty, n)
  }

  test("the pure PNG decoder (Inflater + defilter) agrees byte-for-byte " +
    "with the JDK ImageIO reader on the color fixtures (gray fixtures: " +
    "dims only — getRGB applies an ICC gray->sRGB transform, while the " +
    "canonical contract, shared by the manifest ground truth and the " +
    "pure decoder, is the identity v,v,v)") {
    for (n <- Seq("img_rgba.png", "img_tall.png", "img_gray.png",
        "img_rgb.png", "img_pal.png", "img_grayalpha.png")) {
      val b = fixture(n)
      val pure = Multimodal.decodePngPixels(b)
      val iio = Multimodal.decodePixelsImageIO(b)
      assert(pure.isDefined && iio.isDefined, n)
      assert(pure.get.width == iio.get.width &&
        pure.get.height == iio.get.height, n)
      if (!n.contains("gray"))
        assert(pure.get.sha == iio.get.sha,
          s"$n: pure-JDK defilter diverges from ImageIO")
    }
  }

  test("REAL JPEG and GIF rasters (written by ImageIO itself) decode " +
    "through the fallback: dims always, bit-exact pixels for the " +
    "lossless format") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(23, 17, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 17; x <- 0 until 23)
      img.setRGB(x, y, ((x * 7 + y * 13) % 256 << 16) |
        ((x * 31 + y * 3) % 256 << 8) | ((x * 5 + y * 11) % 256))
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    val jpg = Multimodal.decodePixels(enc("jpg"))
    assert(jpg.exists(p => p.width == 23 && p.height == 17 &&
      p.source == "imageio"))
    // GIF is lossless modulo palette quantization; decode dims + a sha
    // that matches re-reading ImageIO's own bytes (stability), and the
    // header walk agrees with the raster dims
    val gifBytes = enc("gif")
    val gif = Multimodal.decodePixels(gifBytes)
    assert(gif.exists(p => p.width == 23 && p.height == 17 &&
      p.source == "imageio"))
    val again = Multimodal.decodePixels(gifBytes)
    assert(gif.get.sha == again.get.sha)
    assert(Multimodal.decode(gifBytes).modality == "image/gif")
  }

  test("decodePixelPartitions yields null pixel fields for rasterless " +
    "assets and manifest-true checksums for decodable ones") {
    val rows = Seq(
      ("a.png", fixture("img_rgba.png")),
      ("b.wav", fixture("audio_stereo16.wav"))).toDS()
    val got = Multimodal.decodePixelPartitions(rows).collect()
      .map(m => m.name -> m).toMap
    assert(got("b.wav").pixel_sha.isEmpty &&
      got("b.wav").pixel_width.isEmpty)
    assert(got("a.png").pixel_width.contains(21) &&
      got("a.png").pixel_height.contains(13) &&
      got("a.png").pixel_source.contains("png-jdk"))
  }

  test("adversarial raster headers neither hang nor throw: zlib FDICT " +
    "IDAT, Int-overflow BMP width, Int-overflow PNG stride") {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] =
      be32(data.length) ++ typ.getBytes("US-ASCII") ++ data ++ be32(0L)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    // PNG 1x1 gray whose IDAT zlib header sets FDICT (0x78 0xBB + dict
    // id): Inflater returns 0 with needsDictionary — the decode loop
    // must bail, not spin forever
    val ihdr1 = chunk("IHDR", be32(1) ++ be32(1) ++
      Array[Byte](8, 0, 0, 0, 0))
    val fdict = sig ++ ihdr1 ++
      chunk("IDAT", Array(0x78, 0xbb, 1, 2, 3, 4, 0, 0).map(_.toByte)) ++
      chunk("IEND", Array.empty[Byte])
    assert(Multimodal.decodePngPixels(fdict).isEmpty)
    assert(Multimodal.decodePixels(fdict).isEmpty) // ImageIO also rejects
    // PNG with width ~6e8, color type 6: stride wraps Int if computed
    // narrow — must return None, never NegativeArraySizeException
    val ihdrWide = chunk("IHDR", be32(600000000L) ++ be32(2) ++
      Array[Byte](8, 6, 0, 0, 0))
    val widePng = sig ++ ihdrWide ++
      chunk("IDAT", Array[Byte](0x78, 0x9c.toByte, 3, 0, 0, 0, 0, 1)) ++
      chunk("IEND", Array.empty[Byte])
    assert(Multimodal.decodePngPixels(widePng).isEmpty)
    // BMP with width 2^29 (w*3 and w*4 wrap Int): bounds math must stay
    // in Long and fall through to None
    val w29 = 1 << 29
    val info = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40).putInt(w29).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(0).putInt(2835).putInt(2835).putInt(0).putInt(0)
      .array()
    val head = java.nio.ByteBuffer.allocate(14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put('B'.toByte).put('M'.toByte).putInt(100).putShort(0).putShort(0)
      .putInt(54).array()
    val evilBmp = head ++ info ++ Array.fill[Byte](64)(0)
    assert(Multimodal.decodeBmpPixels(evilBmp).isEmpty)
    assert(Multimodal.decodePixels(evilBmp).isEmpty)
    // a 24-byte PNG: passes every decodePng HEADER check (dims are
    // bounds-checked) but ends exactly before the depth/color-type
    // bytes the PIXEL path reads — must be None, not an out-of-bounds
    // throw through the never-throw contract
    val cut24 = sig ++ be32(13) ++ "IHDR".getBytes("US-ASCII") ++
      be32(3) ++ be32(2)
    assert(cut24.length == 24)
    assert(Multimodal.decodePng(cut24).nonEmpty) // header parse succeeds
    assert(Multimodal.decodePngPixels(cut24).isEmpty)
    assert(Multimodal.decodePixels(cut24).isEmpty)
  }

  test("decodeWavSamples verifies the raw PCM payload end-to-end and " +
    "stays None for every entropy-coded or non-audio payload") {
    val s = Multimodal.decodeWavSamples(fixture("audio_stereo16.wav"))
    assert(s.isDefined)
    assert(s.get.channels == 2 && s.get.bits == 16 && s.get.nFrames == 321L)
    assert(s.get.sha.length == 64)
    // the sha must equal a direct hash of the wave data chunk: re-read
    // via an independent parse of the fixture layout (data chunk is the
    // final chunk the python wave module writes)
    val mono = Multimodal.decodeWavSamples(fixture("audio_mono8.wav"))
    assert(mono.exists(m => m.channels == 1 && m.nFrames == 123L))
    for (n <- Seq("audio_stereo.flac", "audio_voice.opus", "vid_basic.mp4",
        "img_rgba.png", "payload.bin"))
      assert(Multimodal.decodeWavSamples(fixture(n)).isEmpty, n)
    // truncated WAV: clamped, never a throw
    val cut = fixture("audio_stereo16.wav").take(100)
    Multimodal.decodeWavSamples(cut) // must not throw; value unspecified
  }

  test("decodeFlacSamples losslessly decodes real FLAC frames (every " +
    "subframe type, all stereo modes) and verifies CRCs + STREAMINFO MD5") {
    val st = Multimodal.decodeFlacSamples(fixture("audio_stereo.flac"))
    assert(st.exists(s => s.channels == 2 && s.bits == 16 && s.nFrames == 4000L))
    val hi = Multimodal.decodeFlacSamples(fixture("audio_hires.flac"))
    assert(hi.exists(s => s.channels == 1 && s.bits == 24 && s.nFrames == 3369L))
    // the canonical PCM checksum matches the manifest's, which the
    // python encoder computed from its SOURCE samples — lossless
    // round-trip through constant/verbatim/fixed/LPC subframes, Rice
    // partitions incl. the escaped-raw path, and left-side/side-right/
    // mid-side decorrelation (the oracle row re-gates this vs the
    // manifest json; here we pin non-emptiness + shape + determinism)
    assert(st.get.sha == Multimodal.decodeFlacSamples(
      fixture("audio_stereo.flac")).get.sha)
    // header-only FLAC: no frames to verify -> honest None
    assert(Multimodal.decodeFlacSamples(fixture("audio_info.flac")).isEmpty)
    // a single flipped bit in frame data breaks the CRC/MD5 chain
    val corrupt = fixture("audio_stereo.flac").clone()
    corrupt(corrupt.length - 100) = (corrupt(corrupt.length - 100) ^ 0x10).toByte
    assert(Multimodal.decodeFlacSamples(corrupt).isEmpty)
    // truncation mid-frame: None, never a throw
    assert(Multimodal.decodeFlacSamples(
      fixture("audio_stereo.flac").dropRight(37)).isEmpty)
    // non-FLAC payloads: None through the dispatch
    for (n <- Seq("audio_voice.opus", "vid_basic.mp4", "payload.bin"))
      assert(Multimodal.decodeFlacSamples(fixture(n)).isEmpty, n)
    // the combined dispatch resolves WAV and FLAC, rejects the rest
    assert(Multimodal.decodeSamples(fixture("audio_stereo16.wav")).isDefined)
    assert(Multimodal.decodeSamples(fixture("audio_hires.flac")).isDefined)
    assert(Multimodal.decodeSamples(fixture("audio_song.ogg")).isEmpty)
  }

  test("streaming resize: identity dims reproduce the decode checksum " +
    "exactly (every pure decoder AND the imageio fallback feed the same " +
    "row sink), junk stays None, and resize support equals decode support") {
    for (n <- Seq("img_rgb.ppm", "img_rgba.png", "img_pal.png",
        "img_24bit.bmp", "img_topdown.bmp", "img_pal8.bmp")) {
      val b = fixture(n)
      val px = Multimodal.decodePixels(b).get
      val same = Multimodal.resizedPixelSha(b, px.width, px.height).get
      assert(same.sha == px.sha && same.source == px.source,
        s"identity resize must be a no-op for $n")
    }
    // a known-tiny upsample: 1x1 source -> every dst pixel is that pixel
    val one = ("P6\n1 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30))
    val up = Multimodal.resizedPixelSha(one, 3, 2).get
    val d = java.security.MessageDigest.getInstance("SHA-256")
    (0 until 6).foreach(_ => d.update(Array[Byte](10, 20, 30, 0xff.toByte)))
    assert(up.sha == d.digest().map("%02x".format(_)).mkString)
    // no raster -> no resize, never a throw; support sets are equal
    for (n <- Seq("payload.bin", "audio_stereo16.wav", "vid_basic.mp4",
        "not_a.png", "img_base.jpg")) {
      val b = fixture(n)
      assert(Multimodal.resizedPixelSha(b, 8, 8).isDefined ==
        Multimodal.decodePixels(b).isDefined, n)
    }
    intercept[IllegalArgumentException] {
      Multimodal.resizedPixelSha(one, 0, 8)
    }
  }

  test("frame sampling: slices cover the payload in order, last frame ragged") {
    val frames = Multimodal.sampleFrames(assets.where($"id" === 2),
      col("id"), col("content")).collect()
    assert(frames.length == 1)
    assert(new String(frames(0).getAs[Array[Byte]]("frame"), "UTF-8") == "short")
    val img = Multimodal.sampleFrames(assets.where($"id" === 1),
      col("id"), col("content"))
      .orderBy("frame_index").collect()
      .map(r => new String(r.getAs[Array[Byte]]("frame"), "UTF-8"))
    assert(img.toSeq == Seq("0123456789abcdef", "0123456789abcdef"))
  }
}
