package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column handling for training-data pipelines: image/audio/
  * video payloads ride as opaque BINARY columns with typed metadata
  * structs; decode/feature-extraction runs per partition over batches.
  *
  * The decode step parses REAL headers for the dependency-free formats —
  * BMP, PPM/PGM, PNG, GIF, JPEG, WebP, TIFF, MP4, WAV, FLAC, and
  * Ogg (Opus/Vorbis) headers parse with zero codec libraries (public
  * format specs; the reference has no multimodal handling at all) —
  * and falls back to `decodeStub` for every other payload.
  *
  * IMAGE RASTERS decode for REAL via [[decodePixels]]: pure-Scala
  * PPM/PGM, uncompressed 24-bit BMP, and full PNG (Inflater + the five
  * defilters — zero image libraries), with the JDK's `javax.imageio`
  * readers (JPEG, GIF, paletted BMP, interlaced/16-bit PNG — still
  * JDK-standard, zero EXTERNAL dependencies) as the fallback; decoded
  * dimensions and the canonical RGBA pixel checksum are oracle-gated
  * against the fixture manifest's INDEPENDENT python encoders
  * (`multimodal_decode_pixels`).
  *
  * AUDIO SAMPLES decode for REAL via [[decodeSamples]]: WAV PCM
  * verbatim, FLAC losslessly through the pure-JDK [[FlacDecoder]]
  * (full RFC 9639 frame decode, CRC + STREAMINFO-MD5 verified) —
  * both hashed in the same canonical interleaved-LE PCM layout and
  * oracle-gated against the manifest (`multimodal_decode_samples`).
  * Lossy payloads (Opus/Vorbis/MP4 media) return None there — honest
  * absence; this engine never fabricates sample values. The only
  * remaining use of `decodeStub` is payloads matching NO known format
  * ("opaque"), where the deterministic fake dims are the documented
  * contract of the `features` projection.
  * Everything around the dispatch — the binary column, the
  * metadata schema, the per-partition batch shape, the frame sampling
  * arithmetic — is identical for all paths; the header parsers are
  * oracle-gated against the same independently generated manifest
  * (`multimodal_decode_headers`, tools/make_multimodal.py).
  */
object Multimodal {

  /** Decoded-asset metadata (what a real image decode would emit). */
  final case class AssetMeta(id: Long, modality: String, n_bytes: Long,
                             sha: String, width: Int, height: Int,
                             n_frames: Long)

  val FrameBytes = 16

  /** Deterministic fake "decode" for payloads no dependency-free parser
    * covers: dimensions derived from the sha256 of the payload. REPLACE
    * with a real codec (e.g. javax.imageio / ffmpeg bindings) in
    * production — the signature is the contract. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val sha = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    (1 + (sha(0) & 0x3f), 1 + (sha(1) & 0x3f))
  }

  /** What [[decode]] returns. For images width/height are pixels and
    * n_frames = 1; for WAV width = channels, height = bits per sample,
    * n_frames = sample frames; for opaque payloads the stub dims and the
    * FrameBytes-slicing frame count. */
  final case class Decoded(modality: String, width: Int, height: Int,
                           nFrames: Long)

  // ---- little-endian readers (bounds-checked; None = not this format)
  private def u16(b: Array[Byte], o: Int): Option[Int] =
    if (o + 2 > b.length) None
    else Some((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8))
  private def u32(b: Array[Byte], o: Int): Option[Long] =
    if (o + 4 > b.length) None
    else Some(((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24))
  private def i32(b: Array[Byte], o: Int): Option[Int] =
    u32(b, o).map(_.toInt)
  // big-endian (network order) readers — PNG/TIFF-MM integer convention
  private def u16be(b: Array[Byte], o: Int): Option[Int] =
    if (o + 2 > b.length) None
    else Some(((b(o) & 0xff) << 8) | (b(o + 1) & 0xff))
  private def u32be(b: Array[Byte], o: Int): Option[Long] =
    if (o + 4 > b.length) None
    else Some(((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL))

  /** BMP: "BM" + BITMAPFILEHEADER(14) + info header. BITMAPINFOHEADER
    * (size >= 40, int32 dims — height < 0 means top-down and |height| is
    * the pixel height) and the legacy BITMAPCOREHEADER (size 12, uint16
    * dims) both parse. Public spec: Windows BITMAPFILEHEADER /
    * BITMAPINFOHEADER layout. */
  def decodeBmp(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 26 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    u32(b, 14).flatMap {
      case hs if hs >= 40 =>
        for {
          w <- i32(b, 18)
          h <- i32(b, 22)
          if w > 0 && h != 0 && h != Int.MinValue
        } yield Decoded("image/bmp", w, math.abs(h), 1L)
      case 12 =>
        for {
          w <- u16(b, 18)
          h <- u16(b, 20)
          if w > 0 && h > 0
        } yield Decoded("image/bmp", w, h, 1L)
      case _ => None
    }
  }

  /** PPM/PGM (netpbm): "P6"/"P5" magic, then ASCII width/height/maxval
    * tokens separated by whitespace, with `#` comments allowed between
    * any tokens. Public spec: netpbm format documentation. */
  def decodePpm(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 2 || b(0) != 'P'.toByte ||
        (b(1) != '5'.toByte && b(1) != '6'.toByte)) return None
    var i = 2
    def skip(): Unit = {
      var going = true
      while (going && i < b.length) {
        val c = b(i).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n'.toByte) i += 1 }
        else if (c.isWhitespace) i += 1
        else going = false
      }
    }
    def int(): Option[Int] = {
      skip()
      val start = i
      while (i < b.length && (b(i) >= '0'.toByte && b(i) <= '9'.toByte)) i += 1
      if (i == start || i - start > 9) None
      else Some(new String(b, start, i - start, "US-ASCII").toInt)
    }
    for {
      w <- int(); h <- int(); maxval <- int()
      if w > 0 && h > 0 && maxval > 0 && maxval < 65536
    } yield Decoded("image/ppm", w, h, 1L)
  }

  /** PNG: the fixed 8-byte signature, then the IHDR chunk — which the
    * spec requires FIRST: 4-byte big-endian length (13), "IHDR", 4-byte
    * big-endian width and height (valid range 1..2^31-1). Pixel data
    * needs zlib and stays stubbed; the header is dependency-free. Public
    * spec: PNG (ISO/IEC 15948) signature + IHDR layout. */
  def decodePng(b: Array[Byte]): Option[Decoded] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (b.length < 24 || !sig.indices.forall(i => b(i) == sig(i))) return None
    if (new String(b, 12, 4, "US-ASCII") != "IHDR") return None
    for {
      len <- u32be(b, 8)
      if len == 13L
      w <- u32be(b, 16)
      h <- u32be(b, 20)
      if w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue
    } yield Decoded("image/png", w.toInt, h.toInt, 1L)
  }

  /** GIF: "GIF87a"/"GIF89a" magic, then the logical screen descriptor's
    * little-endian uint16 width/height at offsets 6/8. (Counting
    * animation frames would need the full variable-length block walk —
    * the logical screen is the asset dimension, n_frames stays 1 like
    * the other image formats.) Public spec: GIF89a specification §18. */
  def decodeGif(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 10) return None
    val magic = new String(b, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    for {
      w <- u16(b, 6)
      h <- u16(b, 8)
      if w > 0 && h > 0
    } yield Decoded("image/gif", w, h, 1L)
  }

  /** JPEG: SOI (FFD8) then a marker-segment walk — each segment is
    * FF <marker> <u16 big-endian length incl. itself>; the frame header
    * (SOF0..SOF15, minus DHT/DAC/JPG) carries precision(1), height(2),
    * width(2) big-endian. Fill bytes (repeated FF) and standalone
    * markers (TEM, RSTn) are skipped; reaching SOS/EOI without a SOF, or
    * any structural violation, falls back to None. Only the entropy
    * stream needs a codec — the marker layer parses dependency-free.
    * Public spec: ITU-T T.81 §B.1-B.2. */
  // frame-header markers (SOF0..15 minus DHT C4 / JPG C8 / DAC CC) —
  // object-level: decodeJpeg runs per asset on the partition hot path
  private val SofMarkers = Set(0xc0, 0xc1, 0xc2, 0xc3, 0xc5, 0xc6, 0xc7,
    0xc9, 0xca, 0xcb, 0xcd, 0xce, 0xcf)

  def decodeJpeg(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var i = 2L
    while (i + 4 <= b.length) {
      val off = i.toInt
      if ((b(off) & 0xff) != 0xff) return None
      val m = b(off + 1) & 0xff
      if (m == 0xff) i += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
      else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
      else {
        val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
        if (len < 2) return None
        if (SofMarkers(m)) {
          // the segment's OWN declared length must cover the frame
          // parameters (2 len + 1 precision + 2 height + 2 width), or
          // the dims read would come from the NEXT segment's bytes
          if (len < 7 || off + 9 > b.length) return None
          val h = ((b(off + 5) & 0xff) << 8) | (b(off + 6) & 0xff)
          val w = ((b(off + 7) & 0xff) << 8) | (b(off + 8) & 0xff)
          return if (w > 0 && h > 0) Some(Decoded("image/jpeg", w, h, 1L))
                 else None
        }
        // LONG cursor: an adversarial length cannot wrap it negative
        i += 2L + len
      }
    }
    None
  }

  /** WebP: the RIFF container ("RIFF" <size> "WEBP") whose FIRST chunk
    * the spec pins to the image header — one of three variants, each
    * with its own dimension encoding:
    *   - "VP8 " (lossy): 3-byte frame tag, the 9D 01 2A start code,
    *     then 14-bit width/height in two little-endian uint16s;
    *   - "VP8L" (lossless): the 2F signature byte, then width−1 and
    *     height−1 as consecutive 14-bit fields of a little-endian
    *     32-bit word;
    *   - "VP8X" (extended): 4 flag/reserved bytes, then 24-bit
    *     little-endian canvas width−1 / height−1.
    * Only the compressed image data needs a codec — the header layer
    * parses dependency-free. Public spec: WebP container + VP8/VP8L
    * bitstream documentation (RFC 9649). */
  def decodeWebp(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 21 ||
        new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "WEBP") return None
    new String(b, 12, 4, "US-ASCII") match {
      case "VP8 " =>
        // payload at 20: frame tag (3), start code 9D 01 2A (3), dims
        if (b.length < 30 || (b(23) & 0xff) != 0x9d ||
            (b(24) & 0xff) != 0x01 || (b(25) & 0xff) != 0x2a) None
        else for {
          w0 <- u16(b, 26); h0 <- u16(b, 28)
          w = w0 & 0x3fff; h = h0 & 0x3fff
          if w > 0 && h > 0
        } yield Decoded("image/webp", w, h, 1L)
      case "VP8L" =>
        if (b.length < 25 || (b(20) & 0xff) != 0x2f) None
        else {
          val v = ((b(21) & 0xffL)) | ((b(22) & 0xffL) << 8) |
            ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 24)
          // bits 0-13 = width-1, 14-27 = height-1, 28 = alpha, 29-31 =
          // version (must be 0 per spec)
          if ((v >>> 29) != 0L) None
          else Some(Decoded("image/webp", (v & 0x3fff).toInt + 1,
            ((v >> 14) & 0x3fff).toInt + 1, 1L))
        }
      case "VP8X" =>
        if (b.length < 30) None
        else {
          val w = ((b(24) & 0xff) | ((b(25) & 0xff) << 8) |
            ((b(26) & 0xff) << 16)) + 1
          val h = ((b(27) & 0xff) | ((b(28) & 0xff) << 8) |
            ((b(29) & 0xff) << 16)) + 1
          Some(Decoded("image/webp", w, h, 1L))
        }
      case _ => None
    }
  }

  /** TIFF: a 2-byte endianness tag ("II" little / "MM" big), the magic
    * 42 in that byte order, then a u32 offset to the first IFD — a u16
    * entry count followed by 12-byte entries (tag, type, count, value).
    * Width is tag 256, height tag 257, each a count-1 SHORT(3) or
    * LONG(4) whose value sits left-justified in the entry's 4-byte
    * value field. Strip data needs no walk — the first IFD carries the
    * dims. Public spec: TIFF 6.0 §2 (image file header / IFD layout).
    * Multi-page files read page one, n_frames stays 1 like the other
    * image formats. */
  def decodeTiff(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 8) return None
    val le = b(0) == 'I'.toByte && b(1) == 'I'.toByte
    val be = b(0) == 'M'.toByte && b(1) == 'M'.toByte
    if (!le && !be) return None
    def rd16(o: Int): Option[Int] = if (le) u16(b, o) else u16be(b, o)
    def rd32(o: Int): Option[Long] = if (le) u32(b, o) else u32be(b, o)
    if (!rd16(2).contains(42)) return None
    for {
      ifdOff <- rd32(4)
      if ifdOff >= 8L && ifdOff + 2L <= b.length
      n <- rd16(ifdOff.toInt)
      dims <- {
        var width, height = -1L
        var i = 0
        while (i < n && ifdOff + 2L + 12L * (i + 1) <= b.length) {
          val e = (ifdOff + 2L + 12L * i).toInt
          (rd16(e), rd16(e + 2)) match {
            case (Some(tag), Some(typ)) if tag == 256 || tag == 257 =>
              // count-1 SHORT/LONG values are inline (left-justified)
              val v: Long =
                if (typ == 3) rd16(e + 8).map(_.toLong).getOrElse(-1L)
                else if (typ == 4) rd32(e + 8).getOrElse(-1L)
                else -1L
              if (tag == 256) width = v else height = v
            case _ => ()
          }
          i += 1
        }
        if (width > 0 && width <= Int.MaxValue &&
            height > 0 && height <= Int.MaxValue)
          Some((width.toInt, height.toInt))
        else None
      }
    } yield Decoded("image/tiff", dims._1, dims._2, 1L)
  }

  /** WAV: "RIFF....WAVE" then chunked; the "fmt " chunk carries channels
    * / bits per sample / block align, the "data" chunk's size gives the
    * sample-frame count. Public spec: RIFF WAVE format. */
  def decodeWav(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 12 ||
        new String(b, 0, 4, "US-ASCII") != "RIFF" ||
        new String(b, 8, 4, "US-ASCII") != "WAVE") return None
    var i = 12L
    var channels, bits, blockAlign = 0
    var dataSize = -1L
    while (i + 8 <= b.length && (channels == 0 || dataSize < 0)) {
      val off = i.toInt
      val cid = new String(b, off, 4, "US-ASCII")
      val sz = u32(b, off + 4).getOrElse(return None)
      if (cid == "fmt " && sz >= 16) {
        channels = u16(b, off + 8 + 2).getOrElse(0)
        blockAlign = u16(b, off + 8 + 12).getOrElse(0)
        bits = u16(b, off + 8 + 14).getOrElse(0)
      } else if (cid == "data") {
        // size may exceed the bytes present (streaming writers); clamp
        dataSize = math.min(sz, (b.length - i - 8))
      }
      // LONG cursor + unsigned size: a corrupt/adversarial size field
      // (e.g. 0xFFFFFFF8) must neither loop forever nor drive the cursor
      // negative — it just walks past the end and the loop stops
      i += 8L + sz + (sz & 1L) // chunks are word-aligned
    }
    if (channels <= 0 || bits <= 0 || dataSize < 0) return None
    val ba = if (blockAlign > 0) blockAlign else channels * ((bits + 7) / 8)
    Some(Decoded("audio/wav", channels, bits, dataSize / ba))
  }

  /** FLAC: "fLaC" magic, then metadata blocks — the spec requires
    * STREAMINFO first (type 0, 34 bytes). Sample rate (20 bits),
    * channels−1 (3), bits-per-sample−1 (5) and total samples (36) are
    * bit-packed big-endian at payload offset 10. Output contract matches
    * WAV: width = channels, height = bits per sample, n_frames = total
    * sample frames. Only the frame data needs a codec. Public spec:
    * FLAC format, STREAMINFO block. */
  def decodeFlac(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 42 || new String(b, 0, 4, "US-ASCII") != "fLaC") return None
    val btype = b(4) & 0x7f
    val blen = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (btype != 0 || blen < 34) return None
    val b20 = b(20) & 0xff
    val rate = ((b(18) & 0xff) << 12) | ((b(19) & 0xff) << 4) | (b20 >> 4)
    val channels = ((b20 >> 1) & 0x7) + 1
    val bps = (((b20 & 0x1) << 4) | ((b(21) & 0xff) >> 4)) + 1
    val samples = ((b(21) & 0xfL) << 32) | ((b(22) & 0xffL) << 24) |
      ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 8) | (b(25) & 0xffL)
    if (rate <= 0) None // 0 is invalid per spec; dims below are +1-coded
    else Some(Decoded("audio/flac", channels, bps, samples))
  }

  /** Ogg (Opus / Vorbis): "OggS" page walk — each page header carries a
    * signed 64-bit little-endian granule position, a 32-bit serial, and
    * a lacing table (n_segments + per-segment sizes) that gives the
    * payload length, so pages parse with zero codec work. The FIRST
    * page's payload identifies the codec: "OpusHead" (channel count at
    * offset 9) or the Vorbis identification header (packet type 1 +
    * "vorbis", channels at offset 11). Total duration is the LAST
    * readable page's granule position (PCM samples: at 48 kHz for Opus
    * per RFC 7845 §4, at the stream rate for Vorbis) — reported as
    * n_frames. Lossy codecs have no intrinsic bit depth, so height is 0
    * (the WAV/FLAC bits-per-sample slot does not apply). Page CRCs are
    * NOT validated — this is a header parse, not an integrity check.
    * Truncated or malformed trailing pages end the walk; the granule
    * seen so far stands. Public specs: RFC 3533 (Ogg), RFC 7845
    * (Ogg/Opus), Vorbis I specification §4.2.2. */
  def decodeOgg(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 28 || new String(b, 0, 4, "US-ASCII") != "OggS") return None
    // (payloadStart, payloadLen, granule, nextPage) for the page at off
    def page(off: Long): Option[(Long, Long, Long, Long)] = {
      if (off + 27 > b.length ||
          new String(b, off.toInt, 4, "US-ASCII") != "OggS" ||
          b(off.toInt + 4) != 0) return None // stream structure version 0
      val o = off.toInt
      var granule = 0L
      var i = 0
      while (i < 8) { granule |= (b(o + 6 + i) & 0xffL) << (8 * i); i += 1 }
      val nseg = b(o + 26) & 0xff
      if (off + 27 + nseg > b.length) return None
      var payloadLen = 0L
      var s = 0
      while (s < nseg) { payloadLen += (b(o + 27 + s) & 0xff); s += 1 }
      val payloadStart = off + 27 + nseg
      if (payloadStart + payloadLen > b.length) return None
      Some((payloadStart, payloadLen, granule, payloadStart + payloadLen))
    }
    val first = page(0L).getOrElse(return None)
    val (ps, pl, _, _) = first
    val p = ps.toInt
    val codec: Option[(String, Int)] =
      if (pl >= 19 && new String(b, p, 8, "US-ASCII") == "OpusHead")
        Some(("audio/opus", b(p + 9) & 0xff))
      else if (pl >= 16 && b(p) == 1.toByte &&
               new String(b, p + 1, 6, "US-ASCII") == "vorbis")
        Some(("audio/vorbis", b(p + 11) & 0xff))
      else None
    codec.flatMap { case (modality, channels) =>
      if (channels <= 0) None
      else {
        var lastGranule = 0L
        var cursor = 0L
        var going = true
        while (going) page(cursor) match {
          case Some((_, _, g, next)) =>
            // -1 marks a continuation page with no completed packet
            if (g >= 0L) lastGranule = g
            cursor = next
          case None => going = false
        }
        Some(Decoded(modality, channels, 0, lastGranule))
      }
    }
  }

  /** MP4 / ISO-BMFF: big-endian (size, fourcc) box walk — a top-level
    * `ftyp` brand box, then `moov` > `trak` > `tkhd`, whose 16.16
    * fixed-point width/height give the presentation dimensions (the
    * first trak with nonzero dims wins: audio traks carry zeros).
    * size == 1 reads the 64-bit largesize; size == 0 extends to the end
    * of the enclosure; a malformed size (smaller than its own header,
    * or overflowing) aborts to None. Only the sample DATA needs a codec
    * — the box layer parses dependency-free. Public spec: ISO/IEC
    * 14496-12 (box structure; tkhd layout). */
  def decodeMp4(b: Array[Byte]): Option[Decoded] = {
    if (b.length < 12 || new String(b, 4, 4, "US-ASCII") != "ftyp") return None
    // all child boxes of [start, end) with the given fourcc, as
    // (payloadStart, payloadEnd) ranges; malformed sizes end the walk
    def children(start: Long, end: Long, target: String): Seq[(Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var i = start
      var ok = true
      while (ok && i + 8 <= end) {
        val off = i.toInt
        (u32be(b, off), Some(new String(b, off + 4, 4, "US-ASCII"))) match {
          case (Some(sz0), Some(typ)) =>
            var hdr = 8L
            val sz: Long =
              if (sz0 == 1L) {
                hdr = 16L
                (u32be(b, off + 8), u32be(b, off + 12)) match {
                  case (Some(hi), Some(lo)) => (hi << 32) | lo
                  case _ => -1L
                }
              } else if (sz0 == 0L) end - i
              else sz0
            if (sz < hdr) ok = false
            else {
              if (typ == target) out += ((i + hdr, math.min(i + sz, end)))
              // advance ONLY when the whole box fits the enclosure: a
              // size past the end (or a largesize near Long.MaxValue)
              // would wrap the cursor and read garbage offsets
              if (sz > end - i) ok = false
              else i += sz
            }
          case _ => ok = false
        }
      }
      out.toSeq
    }
    def tkhdDims(ks: Long, ke: Long): Option[(Int, Int)] = {
      if (ks >= ke || ke > b.length) return None
      val version = b(ks.toInt) & 0xff
      // v1 widens creation/modification times AND duration to 8 bytes:
      // 4 version/flags + 36 times/id/reserved/duration + 8 reserved +
      // 8 layer/alt/volume/reserved + 36 matrix = 88 (v0: 76)
      val base = ks + (if (version == 1) 88L else 76L)
      if (base + 8L > ke) return None
      for {
        w <- u32be(b, base.toInt)
        h <- u32be(b, (base + 4L).toInt)
        if (w >> 16) > 0 && (h >> 16) > 0
      } yield ((w >> 16).toInt, (h >> 16).toInt)
    }
    (for {
      (ms, me) <- children(0L, b.length.toLong, "moov")
      (ts, te) <- children(ms, me, "trak")
      (ks, ke) <- children(ts, te, "tkhd")
      dims <- tkhdDims(ks, ke)
    } yield Decoded("video/mp4", dims._1, dims._2, 1L)).headOption
  }

  /** Dispatch: real header parse for the dependency-free formats, stub
    * for everything else ("opaque"). A payload whose magic matches but
    * whose header is malformed falls through to the stub — never a
    * throw, a decode pipeline must not die on one corrupt asset. */
  def decode(bytes: Array[Byte]): Decoded =
    decodeBmp(bytes).orElse(decodePpm(bytes)).orElse(decodePng(bytes))
      .orElse(decodeGif(bytes)).orElse(decodeJpeg(bytes))
      .orElse(decodeWebp(bytes)).orElse(decodeTiff(bytes))
      .orElse(decodeMp4(bytes)).orElse(decodeWav(bytes))
      .orElse(decodeFlac(bytes)).orElse(decodeOgg(bytes))
      .getOrElse {
        val (w, h) = decodeStub(bytes)
        Decoded("opaque", w, h,
          math.ceil(bytes.length.toDouble / FrameBytes).toLong)
      }

  // ======================= pixel decode =======================

  /** A fully decoded raster: true pixel dimensions plus the canonical
    * pixel checksum — sha256 over the pixels as R,G,B,A bytes,
    * row-major, top-down (the cross-implementation contract the fixture
    * manifest's INDEPENDENT python encoders compute from their source
    * arrays). `source` names the decode path that produced it:
    * "ppm" / "png-jdk" / "bmp" (pure-Scala, zero dependencies) or
    * "imageio" (the JDK's javax.imageio readers — JPEG/GIF/paletted
    * BMP/anything else the pure parsers skip). */
  final case class PixelDecoded(width: Int, height: Int, sha: String,
                                source: String)

  private def shaHex(d: java.security.MessageDigest): String =
    d.digest().map("%02x".format(_)).mkString

  /** Canonical checksum from an ARGB accessor (BufferedImage.getRGB
    * convention: 0xAARRGGBB, non-premultiplied sRGB). */
  private def pixelShaFromArgb(w: Int, h: Int,
                               argb: (Int, Int) => Int): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    val row = new Array[Byte](w * 4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = argb(x, y)
        row(x * 4) = ((p >> 16) & 0xff).toByte
        row(x * 4 + 1) = ((p >> 8) & 0xff).toByte
        row(x * 4 + 2) = (p & 0xff).toByte
        row(x * 4 + 3) = ((p >>> 24) & 0xff).toByte
        x += 1
      }
      d.update(row)
      y += 1
    }
    shaHex(d)
  }

  /** A pure-decoder raster as a ROW STREAM: dimensions up front, then
    * `play(sink)` emits RGBA rows top-down (display order) into the
    * sink as `(y, rowBytes)`. The row buffer is REUSED between calls —
    * a sink must consume what it needs before returning. `play` yields
    * false when the stream turns out malformed mid-decode (bad PNG
    * filter byte, palette index out of range) — the caller discards
    * whatever the sink absorbed, exactly the return-None contract of
    * the checksum decoders. This is the shape that lets checksum AND
    * resize share one decode with O(row) state — no full-raster
    * allocation ever happens on the pure paths. */
  final case class RasterRows(width: Int, height: Int, source: String,
                              play: ((Int, Array[Byte]) => Unit) => Boolean)

  /** PPM/PGM raster rows: the header tokens (with comments) as in
    * [[decodePpm]], then — per the netpbm spec — exactly ONE whitespace
    * byte and the raw samples (P6: RGB triples, P5: grey). maxval must
    * fit one byte (the 2-byte-sample variant falls through). */
  def decodePpmRows(b: Array[Byte]): Option[RasterRows] = {
    if (b.length < 2 || b(0) != 'P'.toByte ||
        (b(1) != '5'.toByte && b(1) != '6'.toByte)) return None
    val per = if (b(1) == '6'.toByte) 3 else 1
    var i = 2
    def skip(): Unit = {
      var going = true
      while (going && i < b.length) {
        val c = b(i).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n'.toByte) i += 1 }
        else if (c.isWhitespace) i += 1
        else going = false
      }
    }
    def int(): Option[Int] = {
      skip()
      val start = i
      while (i < b.length && (b(i) >= '0'.toByte && b(i) <= '9'.toByte)) i += 1
      if (i == start || i - start > 9) None
      else Some(new String(b, start, i - start, "US-ASCII").toInt)
    }
    for {
      w <- int(); h <- int(); maxval <- int()
      if w > 0 && h > 0 && maxval > 0 && maxval < 256
      body = i + 1 // exactly one whitespace byte after maxval
      if body + w.toLong * h * per <= b.length
      if w.toLong * 4 <= Int.MaxValue
    } yield RasterRows(w, h, "ppm", sink => {
      val row = new Array[Byte](w * 4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = body + (y * w + x) * per
          if (per == 3) {
            row(x * 4) = b(o); row(x * 4 + 1) = b(o + 1)
            row(x * 4 + 2) = b(o + 2)
          } else {
            row(x * 4) = b(o); row(x * 4 + 1) = b(o)
            row(x * 4 + 2) = b(o)
          }
          row(x * 4 + 3) = 0xff.toByte
          x += 1
        }
        sink(y, row)
        y += 1
      }
      true
    })
  }

  /** [[decodePpmRows]] reduced to the canonical checksum. */
  def decodePpmPixels(b: Array[Byte]): Option[PixelDecoded] =
    decodePpmRows(b).flatMap(shaOfRows)

  /** A row stream reduced to the canonical checksum; None if the
    * stream turned malformed mid-decode (the old return-None paths). */
  private def shaOfRows(r: RasterRows): Option[PixelDecoded] = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    if (!r.play((_, row) => d.update(row))) None
    else Some(PixelDecoded(r.width, r.height, shaHex(d), r.source))
  }

  /** Uncompressed 24-bit BMP raster rows, pure Scala: BGR triples in
    * 4-byte-padded rows, bottom-up unless the height was negative
    * (top-down) — emitted top-down either way. Paletted/16/32-bit
    * variants fall through (ImageIO covers them). */
  def decodeBmpRows(b: Array[Byte]): Option[RasterRows] = {
    val hdr = decodeBmp(b).getOrElse(return None)
    val (w, h) = (hdr.width, hdr.height)
    // ALL size arithmetic in Long: decodeBmp accepts any positive i32
    // width, and w*3 / w*4 wrap Int for crafted headers — a wrapped
    // size would defeat the bounds check and THROW instead of falling
    // through to None (the never-throw contract)
    if (w.toLong * 4 > Int.MaxValue) return None
    for {
      dataOff <- u32(b, 10)
      hs <- u32(b, 14)
      bpp <- if (hs >= 40) u16(b, 28) else u16(b, 24)
      if bpp == 24
      // info headers carry a compression field; require BI_RGB. The
      // 12-byte core header has none (always uncompressed).
      comp <- if (hs >= 40) u32(b, 30) else Some(0L)
      if comp == 0L
      topDown = hs >= 40 && i32(b, 22).exists(_ < 0)
      rowSz = ((w.toLong * 3 + 3) / 4 * 4).toInt
      if dataOff + rowSz.toLong * h <= b.length
    } yield RasterRows(w, h, "bmp", sink => {
      val row = new Array[Byte](w * 4)
      var y = 0
      while (y < h) {
        val srcRow = if (topDown) y else h - 1 - y
        val o = (dataOff + srcRow.toLong * rowSz).toInt
        var x = 0
        while (x < w) {
          row(x * 4) = b(o + x * 3 + 2)     // R
          row(x * 4 + 1) = b(o + x * 3 + 1) // G
          row(x * 4 + 2) = b(o + x * 3)     // B
          row(x * 4 + 3) = 0xff.toByte
          x += 1
        }
        sink(y, row)
        y += 1
      }
      true
    })
  }

  /** [[decodeBmpRows]] reduced to the canonical checksum. */
  def decodeBmpPixels(b: Array[Byte]): Option[PixelDecoded] =
    decodeBmpRows(b).flatMap(shaOfRows)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** PNG raster decode with ZERO image libraries: chunk walk (IHDR /
    * PLTE / IDAT… / IEND), `java.util.zip.Inflater` for the zlib
    * stream, then the five per-row defilters (None/Sub/Up/Average/
    * Paeth) — the full spec pipeline for the common shape: bit depth 8,
    * color types 0/2/3/4/6, non-interlaced. Anything else (16-bit,
    * sub-byte palettes, Adam7) returns None and the ImageIO fallback
    * takes it. Public spec: PNG (ISO/IEC 15948) §9-13. */
  def decodePngPixels(b: Array[Byte]): Option[PixelDecoded] =
    decodePngRows(b).flatMap(shaOfRows)

  /** PNG raster rows (see [[decodePngPixels]] for the supported
    * shape); the inflate + defilter run lazily inside `play`. */
  def decodePngRows(b: Array[Byte]): Option[RasterRows] = {
    val hdr = decodePng(b).getOrElse(return None)
    val (w, h) = (hdr.width, hdr.height)
    // decodePng guarantees only 24 bytes (through the IHDR dims); the
    // depth/color-type/compression/filter/interlace reads below need 29
    if (b.length < 29) return None
    val depth = b(24) & 0xff
    val ct = b(25) & 0xff
    val interlace = b(28) & 0xff
    if (depth != 8 || interlace != 0 || (b(26) & 0xff) != 0 ||
        (b(27) & 0xff) != 0) return None
    val bpp = ct match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    // chunk walk: concatenate IDAT payloads, keep PLTE
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8L
    var done = false
    while (!done && off + 8 <= b.length) {
      val o = off.toInt
      val len = u32be(b, o).getOrElse(return None)
      val typ = new String(b, o + 4, 4, "US-ASCII")
      if (off + 12 + len > b.length) return None
      typ match {
        case "PLTE" =>
          if (len % 3 != 0 || len == 0) return None
          palette = java.util.Arrays.copyOfRange(b, o + 8, o + 8 + len.toInt)
        case "IDAT" => idat.write(b, o + 8, len.toInt)
        case "IEND" => done = true
        case _ => ()
      }
      off += 12 + len // len + type(4) + crc(4); CRCs not validated
    }
    if (!done || idat.size() == 0) return None
    if (ct == 3 && palette == null) return None
    // size arithmetic in LONG before any allocation: decodePng allows
    // width up to Int.MaxValue, so w*bpp (and w*4 for the RGBA row)
    // wrap Int on crafted headers — a wrapped size would slip past the
    // guard and THROW instead of returning None
    val strideL = w.toLong * bpp
    val expect = h.toLong * (1 + strideL)
    if (expect > Int.MaxValue || w.toLong * 4 > Int.MaxValue) return None
    // bound the allocation against the COMPRESSED size before trusting
    // the header: zlib expands at most ~1032x (one symbol per bit at
    // the theoretical floor), so a tiny crafted IHDR declaring a 2 GB
    // raster over a 50-byte IDAT is rejected here instead of OOMing an
    // executor before the Inflater ever sees the stream
    if (expect > idat.size().toLong * 1032L + 64L) return None
    val stride = strideL.toInt
    val idatBytes = idat.toByteArray
    val pal = palette
    Some(RasterRows(w, h, "png-jdk", sink => {
      // STREAMING inflate: exactly one filtered row (filter byte +
      // stride samples) is pulled from the Inflater per iteration, so
      // play() holds O(row) state like the PPM/BMP paths — the full
      // defiltered raster (h * (1 + stride) bytes) is never
      // materialized (it was, until r19, making the "O(row) state"
      // claim overstate the PNG case).
      val inf = new java.util.zip.Inflater()
      var ok = true
      val rowRaw = new Array[Byte](1 + stride)
      def fillRow(): Boolean =
        try {
          var got = 0
          var stalled = false
          while (!stalled && got < rowRaw.length) {
            val n = inf.inflate(rowRaw, got, rowRaw.length - got)
            // n == 0 covers BOTH a truncated stream (needsInput with
            // the whole IDAT already provided) and a preset-dictionary
            // header (needsDictionary, which PNG forbids) — either
            // way, bail; looping would spin forever
            if (n == 0) stalled = true else got += n
          }
          !stalled
        } catch {
          case _: java.util.zip.DataFormatException => false
        }
      try {
      inf.setInput(idatBytes)
      // defilter row by row as rows stream out of the Inflater
      val cur = new Array[Int](stride)
      val prior = new Array[Int](stride)
      val out = new Array[Byte](w * 4)
      var y = 0
      while (ok && y < h) {
        if (!fillRow()) ok = false
        val f = if (ok) rowRaw(0) & 0xff else 0
        if (ok && f > 4) ok = false
        var i = 0
        while (ok && i < stride) {
          val v = rowRaw(1 + i) & 0xff
          val left = if (i >= bpp) cur(i - bpp) else 0
          val up = if (y > 0) prior(i) else 0
          val ul = if (y > 0 && i >= bpp) prior(i - bpp) else 0
          cur(i) = f match {
            case 0 => v
            case 1 => (v + left) & 0xff
            case 2 => (v + up) & 0xff
            case 3 => (v + (left + up) / 2) & 0xff
            case 4 => (v + paeth(left, up, ul)) & 0xff
          }
          i += 1
        }
        var x = 0
        while (ok && x < w) {
          val o = x * bpp
          ct match {
            case 0 =>
              val v = cur(o).toByte
              out(x * 4) = v; out(x * 4 + 1) = v; out(x * 4 + 2) = v
              out(x * 4 + 3) = 0xff.toByte
            case 2 =>
              out(x * 4) = cur(o).toByte; out(x * 4 + 1) = cur(o + 1).toByte
              out(x * 4 + 2) = cur(o + 2).toByte; out(x * 4 + 3) = 0xff.toByte
            case 3 =>
              val idx = cur(o)
              if (idx * 3 + 2 >= pal.length) ok = false
              else {
                out(x * 4) = pal(idx * 3); out(x * 4 + 1) = pal(idx * 3 + 1)
                out(x * 4 + 2) = pal(idx * 3 + 2); out(x * 4 + 3) = 0xff.toByte
              }
            case 4 =>
              val v = cur(o).toByte
              out(x * 4) = v; out(x * 4 + 1) = v; out(x * 4 + 2) = v
              out(x * 4 + 3) = cur(o + 1).toByte
            case 6 =>
              out(x * 4) = cur(o).toByte; out(x * 4 + 1) = cur(o + 1).toByte
              out(x * 4 + 2) = cur(o + 2).toByte; out(x * 4 + 3) = cur(o + 3).toByte
          }
          x += 1
        }
        if (ok) {
          sink(y, out)
          System.arraycopy(cur, 0, prior, 0, stride)
        }
        y += 1
      }
      ok
      } finally inf.end() // native zlib state — release even if a sink throws
    }))
  }

  /** Decoded audio SAMPLES: stream layout plus the canonical sample
    * checksum — sha256 over the raw PCM bytes exactly as stored (the
    * fixture manifest's python `wave` writer computes the same from the
    * frames it wrote). */
  final case class SamplesDecoded(channels: Int, bits: Int, nFrames: Long,
                                  sha: String)

  /** WAV PCM sample decode, pure Scala: the RIFF chunk walk of
    * [[decodeWav]] plus the data chunk's raw PCM bytes — WAV sample
    * data is UNCOMPRESSED, so unlike FLAC/Ogg/MP4 it needs no codec and
    * the audio payload verifies end-to-end just like the image rasters.
    * Oversized declared data sizes clamp to the bytes present (the
    * same streaming-writer tolerance as the header path). */
  def decodeWavSamples(b: Array[Byte]): Option[SamplesDecoded] = {
    val hdr = decodeWav(b).getOrElse(return None)
    // re-walk to the data chunk (decodeWav returns only derived fields)
    var i = 12L
    while (i + 8 <= b.length) {
      val off = i.toInt
      val cid = new String(b, off, 4, "US-ASCII")
      val sz = u32(b, off + 4).getOrElse(return None)
      if (cid == "data") {
        val len = math.min(sz, b.length - i - 8).toInt
        val d = java.security.MessageDigest.getInstance("SHA-256")
        d.update(b, off + 8, len)
        return Some(SamplesDecoded(hdr.width, hdr.height, hdr.nFrames,
          shaHex(d)))
      }
      i += 8L + sz + (sz & 1L)
    }
    None
  }

  /** FLAC sample decode — the REAL compressed-audio path
    * ([[FlacDecoder]]: full RFC 9639 frame decode, CRC-8/CRC-16/MD5
    * verified), emitting the same canonical interleaved little-endian
    * PCM checksum as the WAV path. None for header-only or failed
    * streams — honest absence, never fabricated values. */
  def decodeFlacSamples(b: Array[Byte]): Option[SamplesDecoded] =
    FlacDecoder.decode(b).map { a =>
      val d = java.security.MessageDigest.getInstance("SHA-256")
      d.update(a.pcm)
      SamplesDecoded(a.channels, a.bits, a.totalSamples, shaHex(d))
    }

  /** Uncompressed (WAV) or losslessly-decoded (FLAC) sample payload —
    * the dispatch the sample gate runs. Lossy codecs (Opus/Vorbis/MP4)
    * stay None by design: their sample data is not losslessly
    * recoverable without the codec, and this engine never fabricates
    * sample values. */
  def decodeSamples(b: Array[Byte]): Option[SamplesDecoded] =
    decodeWavSamples(b).orElse(decodeFlacSamples(b))

  // the ImageIO disk cache would write temp files per decode on every
  // executor — in-memory streams only
  private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** JDK `javax.imageio` raster decode — the fallback for everything
    * the pure parsers skip: JPEG entropy streams, GIF LZW, paletted
    * BMPs, interlaced/16-bit PNGs (all JDK-standard readers, still zero
    * EXTERNAL dependencies). Any reader failure — no registered format,
    * corrupt stream, header-only fixture — returns None, never throws:
    * a decode pipeline must not die on one corrupt asset. */
  def decodePixelsImageIO(bytes: Array[Byte]): Option[PixelDecoded] =
    try {
      imageIoInit
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(PixelDecoded(img.getWidth, img.getHeight,
        pixelShaFromArgb(img.getWidth, img.getHeight, img.getRGB), "imageio"))
    } catch {
      // NonFatal only: an OutOfMemoryError or interrupt must propagate,
      // not be swallowed as "no raster here"
      case scala.util.control.NonFatal(_) => None
    }

  /** The ImageIO fallback as a row stream (rows converted from the
    * decoded BufferedImage's ARGB accessor — the image itself is
    * materialized by ImageIO, as always on this path). */
  def decodeImageIoRows(bytes: Array[Byte]): Option[RasterRows] =
    try {
      imageIoInit
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        if (w.toLong * 4 > Int.MaxValue) None
        else Some(RasterRows(w, h, "imageio", sink => {
          val row = new Array[Byte](w * 4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              row(x * 4) = ((p >> 16) & 0xff).toByte
              row(x * 4 + 1) = ((p >> 8) & 0xff).toByte
              row(x * 4 + 2) = (p & 0xff).toByte
              row(x * 4 + 3) = ((p >>> 24) & 0xff).toByte
              x += 1
            }
            sink(y, row)
            y += 1
          }
          true
        }))
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    }

  /** Full raster decode: pure-Scala PPM / PNG / 24-bit-BMP first (zero
    * dependencies, bit-exact vs the fixture manifest's independent
    * encoders), then the JDK ImageIO readers, else None (audio/video/
    * opaque payloads have no raster — [[decode]] still yields their
    * header metadata). */
  def decodePixels(bytes: Array[Byte]): Option[PixelDecoded] =
    decodePpmPixels(bytes).orElse(decodePngPixels(bytes))
      .orElse(decodeBmpPixels(bytes)).orElse(decodePixelsImageIO(bytes))

  /** The raster row streams in [[decodePixels]]' exact probe order
    * (pure PPM/PNG/24-bit-BMP first, then the ImageIO fallback) — so a
    * row-sink consumer like the resize supports precisely the assets
    * [[decodePixels]] checksums. */
  def decodeRasterRows(bytes: Array[Byte]): Option[RasterRows] =
    decodePpmRows(bytes).orElse(decodePngRows(bytes))
      .orElse(decodeBmpRows(bytes)).orElse(decodeImageIoRows(bytes))

  /** Nearest-neighbor RESIZE to (dstW, dstH), streaming: source rows
    * play through the shared [[RasterRows]] sink and each is sampled
    * into the destination rows it maps to (src = floor(dst·srcDim /
    * dstDim) — the standard un-centered NN rule, integer-exact in any
    * engine, replayed by the fixture generator's python twin). Memory
    * is O(dstW·dstH·4) for the destination plus the decoder's own
    * O(row) state — on the pure paths the source raster is never
    * materialized, keeping their bounded-allocation contract (the
    * ImageIO fallback materializes its BufferedImage, as it always
    * did). Returns the canonical RGBA checksum of the resized raster
    * with the decode source tag; None exactly where [[decodePixels]]
    * has no raster. */
  def resizedPixelSha(bytes: Array[Byte], dstW: Int,
                      dstH: Int): Option[PixelDecoded] = {
    require(dstW > 0 && dstH > 0, "resize dims must be positive")
    require(dstW.toLong * dstH * 4 <= Int.MaxValue, "resize raster too large")
    decodeRasterRows(bytes).flatMap { r =>
      val dst = new Array[Byte](dstW * dstH * 4)
      val sxFor = Array.tabulate(dstW)(dx => (dx.toLong * r.width / dstW).toInt)
      // source row y feeds dst rows [dyStart(y), dyStart(y+1)) — the
      // dst→src map is monotone, so each dst row is filled exactly once
      val dyStart = new Array[Int](r.height + 1)
      var dy = 0
      var sy = 0
      while (sy <= r.height) {
        while (dy < dstH && (dy.toLong * r.height / dstH).toInt < sy) dy += 1
        dyStart(sy) = dy
        sy += 1
      }
      val played = r.play { (y, row) =>
        var d = dyStart(y)
        val end = if (y + 1 <= r.height) dyStart(y + 1) else dstH
        while (d < end) {
          val base = d * dstW * 4
          var x = 0
          while (x < dstW) {
            val s = sxFor(x) * 4
            dst(base + x * 4) = row(s)
            dst(base + x * 4 + 1) = row(s + 1)
            dst(base + x * 4 + 2) = row(s + 2)
            dst(base + x * 4 + 3) = row(s + 3)
            x += 1
          }
          d += 1
        }
      }
      if (!played) None
      else {
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        digest.update(dst)
        Some(PixelDecoded(dstW, dstH, shaHex(digest), r.source))
      }
    }
  }

  /** Per-asset resize metadata; null fields = no pure-decodable
    * raster. */
  final case class ResizeMeta(name: String, resize_width: Option[Int],
                              resize_height: Option[Int],
                              resize_sha: Option[String],
                              resize_source: Option[String])

  /** Per-partition streaming resize over (name, bytes) — the same
    * batched executor shape as [[decodePixelPartitions]] (what a
    * mapInPandas thumbnail stage looks like in Scala). */
  def resizePixelPartitions(ds: Dataset[(String, Array[Byte])],
                            dstW: Int, dstH: Int): Dataset[ResizeMeta] = {
    implicit val enc: Encoder[ResizeMeta] = Encoders.product[ResizeMeta]
    ds.mapPartitions(_.map { case (name, bytes) =>
      resizedPixelSha(bytes, dstW, dstH) match {
        case Some(p) =>
          ResizeMeta(name, Some(p.width), Some(p.height), Some(p.sha),
            Some(p.source))
        case None => ResizeMeta(name, None, None, None, None)
      }
    })
  }

  /** Per-asset pixel metadata for the per-partition decode path: null
    * fields = no decodable raster. */
  final case class PixelMeta(name: String, pixel_width: Option[Int],
                             pixel_height: Option[Int],
                             pixel_sha: Option[String],
                             pixel_source: Option[String])

  /** Per-partition raster decode over (name, bytes) — same batched
    * executor shape as [[decodePartitions]]; assets with no decodable
    * raster yield null pixel fields rather than failing the batch. */
  def decodePixelPartitions(ds: Dataset[(String, Array[Byte])]): Dataset[PixelMeta] = {
    implicit val enc: Encoder[PixelMeta] = Encoders.product[PixelMeta]
    ds.mapPartitions(_.map { case (name, bytes) =>
      decodePixels(bytes) match {
        case Some(p) =>
          PixelMeta(name, Some(p.width), Some(p.height), Some(p.sha),
            Some(p.source))
        case None => PixelMeta(name, None, None, None, None)
      }
    })
  }

  /** Column twin of decodeStub (same sha256-prefix arithmetic) so the
    * whole feature projection can also run without leaving codegen. */
  def fakeWidth(content: Column): Column =
    (conv(substring(sha2(content, 256), 1, 2), 16, 10).cast("int")
      .bitwiseAND(lit(0x3f)) + 1).cast("int")

  def fakeHeight(content: Column): Column =
    (conv(substring(sha2(content, 256), 3, 2), 16, 10).cast("int")
      .bitwiseAND(lit(0x3f)) + 1).cast("int")

  /** Feature projection over a binary `content` column: byte length,
    * content hash, stub-decoded dimensions, frame count (fixed-size
    * frame sampling arithmetic). Pure projection — scales as a scan. */
  def features(df: DataFrame, id: Column, content: Column,
               modality: Column): DataFrame =
    df.select(
      id.as("id"),
      modality.as("modality"),
      length(content).cast("long").as("n_bytes"),
      sha2(content, 256).as("sha"),
      fakeWidth(content).as("width"),
      fakeHeight(content).as("height"),
      ceil(length(content).cast("double") / FrameBytes).cast("long").as("n_frames"))

  /** Per-partition decode path (the Scala analog of a batched Pandas UDF):
    * the executor sees an iterator of rows per partition and can hold one
    * codec context per partition — the right shape for native decoders.
    * Dispatches through [[decode]]: real header parse for
    * BMP/PPM/PNG/GIF/JPEG/MP4/WAV, stub for everything else — where the
    * stub wins, the caller's modality string is kept as the hint (an
    * opaque payload tells us nothing better). */
  def decodePartitions(ds: Dataset[(Long, String, Array[Byte])]): Dataset[AssetMeta] = {
    implicit val enc: Encoder[AssetMeta] = Encoders.product[AssetMeta]
    ds.mapPartitions { rows =>
      // one digest instance per partition, reused across the batch
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      rows.map { case (id, modality, bytes) =>
        val d = decode(bytes)
        digest.reset()
        val sha = digest.digest(bytes).map("%02x".format(_)).mkString
        AssetMeta(id, if (d.modality == "opaque") modality else d.modality,
          bytes.length.toLong, sha, d.width, d.height, d.nFrames)
      }
    }
  }

  /** Fixed-size frame sampling: slice the payload into FrameBytes-wide
    * frames, exploded with their index — the plumbing a video
    * frame-sampler needs (slice boundaries, order, per-frame rows). */
  def sampleFrames(df: DataFrame, id: Column, content: Column): DataFrame = {
    val nFrames = ceil(length(content).cast("double") / FrameBytes).cast("int")
    val frames = when(col("n") > 0,
      transform(sequence(lit(0), col("n") - 1),
        i => col("content").substr(i * FrameBytes + lit(1), lit(FrameBytes))))
      .otherwise(array().cast("array<binary>"))
    df.select(id.as("id"), content.as("content"), nFrames.as("n"))
      .select(col("id"), posexplode(frames).as(Seq("frame_index", "frame")))
  }
}
