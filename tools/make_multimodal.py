#!/usr/bin/env python3
"""Generate fixtures/multimodal — small deterministic BMP / PPM / PNG /
GIF / JPEG / WebP / TIFF / MP4 / WAV / FLAC / Ogg(Opus,Vorbis) / opaque assets plus a manifest of their TRUE properties,
computed by an INDEPENDENT implementation (python struct packing and the
stdlib `wave`/`zlib` modules), so the Scala header parsers are
oracle-gated against ground truth they did not produce.

Layout:
  fixtures/multimodal/<name>            the asset bytes
  fixtures/multimodal/manifest.json     [{name, modality, width, height,
                                          n_frames}, ...]

Manifest semantics (mirrors graft.operators.Multimodal.decode):
  image/bmp, image/ppm, image/png, image/gif, image/jpeg,
  image/webp, image/tiff, video/mp4: width x height pixels, n_frames = 1
  audio/wav:            width = channels, height = bits per sample,
                        n_frames = sample frames (data bytes / block align)
  audio/flac:           width = channels, height = bits per sample,
                        n_frames = STREAMINFO total samples
  audio/opus, audio/vorbis: width = channels, height = 0 (lossy codecs
                        have no bit depth), n_frames = final page granule
  opaque:               sha256-derived stub dims (same arithmetic as
                        Multimodal.decodeStub), n_frames = ceil(bytes/16)

PIXEL ground truth (gates graft.operators.Multimodal.decodePixels): for
every asset whose RASTER is decodable losslessly, the manifest also
carries pixel_width / pixel_height / pixel_sha — sha256 over the
decoded pixels as RGBA bytes (R,G,B,A per pixel, row-major, top-down),
computed here from the SOURCE pixel arrays the encoders below were fed
(never by decoding — the decoder under test must reproduce the input).
Assets with no losslessly decodable raster (header-only JPEG/GIF,
audio, video, opaque, WebP/TIFF without strip data) carry nulls.
WAV assets additionally carry sample_sha — sha256 over the raw PCM
payload as written (WAV samples are uncompressed, so the audio payload
verifies end-to-end like the image rasters); everything else nulls.

Deterministic: fixed seeds, fixed payloads. Re-running reproduces the
identical bytes.
"""
import hashlib
import io
import json
import math
import pathlib
import random
import struct
import wave

OUT = pathlib.Path(__file__).resolve().parent.parent / "fixtures" / "multimodal"
FRAME_BYTES = 16


def rgb_at(x, y):
    """Deterministic per-pixel RGB pattern shared by the raster formats."""
    return ((x * 7 + y * 13) % 256, (x * 31 + y * 3) % 256,
            (x * 5 + y * 11) % 256)


def rgba_sha(rgba):
    """Canonical pixel checksum: sha256 over R,G,B,A bytes row-major."""
    return hashlib.sha256(bytes(rgba)).hexdigest()

RESIZE_W, RESIZE_H = 8, 8

def resize_nn_sha(rgba, w, h, dst_w=RESIZE_W, dst_h=RESIZE_H):
    """Nearest-neighbor resize ground truth (the Scala engine's twin):
    src = floor(dst * srcDim / dstDim), the standard un-centered rule —
    integer-exact, so both implementations agree byte-for-byte."""
    rgba = bytes(rgba)
    out = bytearray(dst_w * dst_h * 4)
    for y in range(dst_h):
        sy = (y * h) // dst_h
        for x in range(dst_w):
            sx = (x * w) // dst_w
            si = (sy * w + sx) * 4
            di = (y * dst_w + x) * 4
            out[di:di + 4] = rgba[si:si + 4]
    return hashlib.sha256(bytes(out)).hexdigest()


def bmp(width, height, bpp=24, top_down=False, header_size=40):
    """Minimal BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (or the legacy
    12-byte BITMAPCOREHEADER) + patterned 24-bit pixel data. Returns
    (bytes, rgba) — rgba is the top-down RGBA ground truth (the file
    stores rows bottom-up in BGR unless top_down)."""
    assert bpp == 24
    rowsz = (width * 3 + 3) // 4 * 4
    rows = []
    rgba = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            r, g, b = rgb_at(x, y)
            row += bytes((b, g, r))
            rgba += [r, g, b, 255]
        row += b"\x00" * (rowsz - len(row))
        rows.append(bytes(row))
    stored = rows if top_down else list(reversed(rows))
    data = b"".join(stored)
    if header_size == 40:
        h = -height if top_down else height
        info = struct.pack("<IiiHHIIiiII", 40, width, h, 1, bpp, 0,
                           len(data), 2835, 2835, 0, 0)
    else:  # BITMAPCOREHEADER: uint16 dims, always bottom-up
        assert not top_down
        info = struct.pack("<IHHHH", 12, width, height, 1, bpp)
    off = 14 + len(info)
    head = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return head + info + data, rgba


def bmp8(width, height):
    """8-bit paletted BMP (BITMAPINFOHEADER + 256-entry BGRA color
    table): the raster the pure-Scala 24bpp decoder does NOT cover, so
    it exercises the ImageIO fallback. Returns (bytes, rgba)."""
    palette = [((i * 3) % 256, (i * 7) % 256, (i * 11) % 256)
               for i in range(256)]
    table = b"".join(bytes((b, g, r, 0)) for (r, g, b) in palette)
    rowsz = (width + 3) // 4 * 4
    rows = []
    rgba = []
    for y in range(height):
        idx = [(x * 5 + y * 9) % 256 for x in range(width)]
        rows.append(bytes(idx) + b"\x00" * (rowsz - width))
        for i in idx:
            r, g, b = palette[i]
            rgba += [r, g, b, 255]
    data = b"".join(reversed(rows))  # bottom-up
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                       len(data), 2835, 2835, 256, 0)
    off = 14 + len(info) + len(table)
    head = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return head + info + table + data, rgba


def ppm(width, height, magic=b"P6", comment=True):
    """PPM/PGM with an optional comment line inside the header — the
    parser trap (comments may appear between any header tokens).
    Returns (bytes, rgba): P6 bytes are raw RGB triples; P5 grey v
    reads back as (v,v,v,255)."""
    per = 3 if magic == b"P6" else 1
    body = bytes((x * 7 + 13) % 256 for x in range(width * height * per))
    rgba = []
    if per == 3:
        for i in range(width * height):
            r, g, b = body[3 * i], body[3 * i + 1], body[3 * i + 2]
            rgba += [r, g, b, 255]
    else:
        for v in body:
            rgba += [v, v, v, 255]
    hdr = magic + b"\n"
    if comment:
        hdr += b"# generated fixture, do not edit\n"
    hdr += b"%d" % width
    if comment:
        hdr += b" # inline comment\n"
    else:
        hdr += b" "
    hdr += b"%d\n255\n" % height
    return hdr + body, rgba


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png(width, height, color_type=6, filters=None, palette=None):
    """PNG with REAL patterned raster data: signature, IHDR, optional
    PLTE, one zlib IDAT of per-row-filtered scanlines (filter types
    cycle through `filters`, exercising Sub/Up/Average/Paeth on the
    decoder side), IEND. color_type: 0 grey, 2 RGB, 3 palette,
    4 grey+alpha, 6 RGBA — all bit depth 8. Returns (bytes, rgba)."""
    import zlib

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    filters = filters or [0]
    raws = []
    rgba = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            r, g, b = rgb_at(x, y)
            a = (x * 17 + y * 29) % 256
            if color_type == 0:
                row.append(r)
                rgba += [r, r, r, 255]
            elif color_type == 2:
                row += bytes((r, g, b))
                rgba += [r, g, b, 255]
            elif color_type == 3:
                i = (x * 5 + y * 9) % len(palette)
                row.append(i)
                pr, pg, pb = palette[i]
                rgba += [pr, pg, pb, 255]
            elif color_type == 4:
                row += bytes((r, a))
                rgba += [r, r, r, a]
            else:
                row += bytes((r, g, b, a))
                rgba += [r, g, b, a]
        raws.append(bytes(row))
    stream = bytearray()
    for y, raw in enumerate(raws):
        f = filters[y % len(filters)]
        prior = raws[y - 1] if y > 0 else bytes(len(raw))
        out = bytearray()
        for i, v in enumerate(raw):
            left = raw[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if f == 0:
                out.append(v)
            elif f == 1:
                out.append((v - left) % 256)
            elif f == 2:
                out.append((v - up) % 256)
            elif f == 3:
                out.append((v - (left + up) // 2) % 256)
            else:
                out.append((v - _paeth(left, up, ul)) % 256)
        stream.append(f)
        stream += out
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    plte = (chunk(b"PLTE", b"".join(bytes(p) for p in palette))
            if color_type == 3 else b"")
    return (sig + chunk(b"IHDR", ihdr) + plte
            + chunk(b"IDAT", zlib.compress(bytes(stream)))
            + chunk(b"IEND", b"")), rgba


def jpeg(width, height, progressive=False):
    """Minimal JPEG header stream: SOI, JFIF APP0, a COM segment (walk
    exercise), SOF0/SOF2 with the big-endian dims, EOI. No entropy data
    — the parser under test stops at the frame header."""
    soi = b"\xff\xd8"
    jfif = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    app0 = b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    com = b"generated fixture, do not edit"
    comseg = b"\xff\xfe" + struct.pack(">H", 2 + len(com)) + com
    sof_payload = (struct.pack(">BHHB", 8, height, width, 3)
                   + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = marker + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return soi + app0 + comseg + sof + b"\xff\xd9"


def mp4(width, height, largesize=False, tkhd_version=0):
    """Minimal ISO-BMFF stream: ftyp + moov(mvhd + audio trak with zero
    dims + video trak whose tkhd carries the 16.16 fixed-point dims).
    The audio-first ordering exercises the first-nonzero-trak rule;
    largesize wraps moov in a 64-bit size=1 box header; tkhd_version=1
    exercises the widened 64-bit time/duration layout."""
    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def box64(typ, payload):
        return (struct.pack(">I", 1) + typ
                + struct.pack(">Q", 16 + len(payload)) + payload)

    def tkhd(w, h, volume, version=0):
        matrix = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                             0, 0, 0x40000000)
        if version == 1:
            # v1 widens creation/modification times AND duration to 64-bit
            head = (b"\x01\x00\x00\x07"
                    + struct.pack(">QQII", 0, 0, 1, 0)     # times, id, rsvd
                    + struct.pack(">Q", 1000))             # duration
        else:
            head = (b"\x00\x00\x00\x07"
                    + struct.pack(">IIII", 0, 0, 1, 0)     # times, id, rsvd
                    + struct.pack(">I", 1000))             # duration
        return box(b"tkhd", head
                   + b"\x00" * 8                           # reserved
                   + struct.pack(">hhhh", 0, 0, volume, 0) # layer/alt/vol/rsvd
                   + matrix
                   + struct.pack(">II", w << 16, h << 16))

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd = box(b"mvhd", b"\x00\x00\x00\x00"
               + struct.pack(">IIII", 0, 0, 1000, 3000)
               + struct.pack(">I", 0x00010000) + b"\x00" * 76)
    audio_trak = box(b"trak", tkhd(0, 0, 0x0100, version=tkhd_version))
    video_trak = box(b"trak", tkhd(width, height, 0, version=tkhd_version))
    payload = mvhd + audio_trak + video_trak
    moov = box64(b"moov", payload) if largesize else box(b"moov", payload)
    return ftyp + moov


def webp(width, height, variant="lossy"):
    """Minimal WebP: RIFF container with one image-header chunk — lossy
    (VP8 frame tag + start code + 14-bit dims), lossless (VP8L signature
    + bit-packed dims-1) or extended (VP8X 24-bit canvas dims-1)."""
    if variant == "lossy":
        payload = (b"\x30\x00\x00" + b"\x9d\x01\x2a"
                   + struct.pack("<HH", width, height))
        fourcc = b"VP8 "
    elif variant == "lossless":
        bits = (width - 1) | ((height - 1) << 14)  # version bits stay 0
        payload = b"\x2f" + struct.pack("<I", bits)
        fourcc = b"VP8L"
    else:  # extended
        payload = (b"\x00" + b"\x00\x00\x00"
                   + (width - 1).to_bytes(3, "little")
                   + (height - 1).to_bytes(3, "little"))
        fourcc = b"VP8X"
    chunk = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def tiff(width, height, big_endian=False, wide_width=False):
    """Minimal TIFF: header + one IFD whose entries carry the count-1
    SHORT (or LONG, for the wide_width trap) dims left-justified in the
    value field, plus an unrelated entry the walk must skip."""
    e = ">" if big_endian else "<"

    def entry(tag, typ, val):
        v = (struct.pack(e + "H", val) + b"\x00\x00" if typ == 3
             else struct.pack(e + "I", val))
        return struct.pack(e + "HHI", tag, typ, 1) + v

    wtype = 4 if wide_width else 3
    entries = (entry(256, wtype, width) + entry(257, 3, height)
               + entry(277, 3, 3))  # SamplesPerPixel: must be skipped
    ifd = struct.pack(e + "H", 3) + entries + struct.pack(e + "I", 0)
    hdr = ((b"MM" if big_endian else b"II") + struct.pack(e + "H", 42)
           + struct.pack(e + "I", 8))
    return hdr + ifd


def gif(width, height, version=b"89a"):
    """Minimal GIF: magic + logical screen descriptor (little-endian
    uint16 dims, no global color table) + trailer."""
    return (b"GIF" + version + struct.pack("<HH", width, height)
            + b"\x00\x00\x00" + b"\x3b")


def wav(channels, bits, rate, n_frames):
    """Returns (bytes, pcm) — pcm is the raw sample payload, whose
    sha256 is the manifest's sample ground truth (WAV PCM is
    uncompressed, so the audio payload verifies end-to-end like the
    image rasters)."""
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(bits // 8)
    w.setframerate(rate)
    rnd = random.Random(1234)
    pcm = bytes(rnd.randrange(256)
                for _ in range(n_frames * channels * (bits // 8)))
    w.writeframes(pcm)
    w.close()
    return buf.getvalue(), pcm


def flac(channels, bits, rate, n_samples):
    """Minimal FLAC: magic + a last-flagged STREAMINFO metadata block
    with the bit-packed rate/channels/bps/total-samples fields. No frame
    data — the parser under test reads STREAMINFO only."""
    streaminfo = (struct.pack(">HH", 4096, 4096)
                  + (0).to_bytes(3, "big") * 2)
    packed = ((rate << 44) | ((channels - 1) << 41)
              | ((bits - 1) << 36) | n_samples)
    streaminfo += packed.to_bytes(8, "big") + b"\x00" * 16
    return (b"fLaC" + bytes([0x80])
            + len(streaminfo).to_bytes(3, "big") + streaminfo)


# ---------------------------------------------------------------- FLAC
# A real (if small) FLAC encoder per RFC 9639, exercising every subframe
# type (constant / verbatim / fixed 0-4 / LPC), Rice residual coding with
# partitions and the escaped-raw path, and all four channel assignments.
# The Scala decoder under test must reproduce the SOURCE PCM bit-exactly;
# STREAMINFO's embedded MD5 (computed here from the source samples) is the
# in-band oracle, and the manifest's sample_sha (sha256 over the same
# canonical interleaved little-endian PCM) is the cross-engine gate.

class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val, bits):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, val, bits):
        self.write(val & ((1 << bits) - 1), bits)

    def write_unary(self, q):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        while self.n:
            self.write(0, 1)


def _crc8(data):
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16(data):
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_number(n):
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 5 * nbytes + 1:  # payload bits of an n-byte form
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _rice_k(residuals):
    """Pick a Rice parameter keeping the unary quotients small."""
    mx = max((2 * e if e >= 0 else -2 * e - 1) for e in residuals) if residuals else 0
    k = 0
    while (mx >> k) > 30:
        k += 1
    return min(k, 14)


def _fixed_residual(samples, order):
    res = list(samples)
    for _ in range(order):
        res = [res[i] - res[i - 1] for i in range(1, len(res))]
    return res


def _write_residual(bw, res, order, blocksize, po, escape_last=False):
    """Rice-coded residual, method 0 (4-bit parameters), partition order
    po; if escape_last, the final partition uses the escaped raw form."""
    bw.write(0, 2)
    bw.write(po, 4)
    nparts = 1 << po
    idx = 0
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        part = res[idx:idx + n]
        idx += n
        if escape_last and p == nparts - 1:
            raw_bits = max((abs(e).bit_length() + 1) for e in part) if part else 1
            bw.write(0xF, 4)
            bw.write(raw_bits, 5)
            for e in part:
                bw.write_signed(e, raw_bits)
        else:
            k = _rice_k(part)
            bw.write(k, 4)
            for e in part:
                u = 2 * e if e >= 0 else -2 * e - 1
                bw.write_unary(u >> k)
                bw.write(u & ((1 << k) - 1), k)
    assert idx == len(res)


def _write_subframe(bw, samples, depth, spec):
    """spec: ('constant',) | ('verbatim',) | ('fixed', order, po, escape)
    | ('lpc', order, precision, shift, coefs, po)."""
    bw.write(0, 1)  # reserved
    kind = spec[0]
    if kind == "constant":
        assert len(set(samples)) == 1
        bw.write(0b000000, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(samples[0], depth)
    elif kind == "verbatim":
        bw.write(0b000001, 6)
        bw.write(0, 1)
        for s in samples:
            bw.write_signed(s, depth)
    elif kind == "fixed":
        order, po, escape = spec[1], spec[2], spec[3]
        bw.write(0b001000 | order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, depth)
        _write_residual(bw, _fixed_residual(samples, order), order,
                        len(samples), po, escape)
    elif kind == "lpc":
        order, precision, shift, coefs, po = spec[1:6]
        bw.write(0b100000 | (order - 1), 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.write_signed(s, depth)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = [samples[i]
               - (sum(coefs[j] * samples[i - 1 - j] for j in range(order)) >> shift)
               for i in range(order, len(samples))]
        _write_residual(bw, res, order, len(samples), po)
    else:
        raise ValueError(kind)


_DEPTH_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}


def _flac_frame(frame_no, blocksize, bits, ch_assign, channel_data, specs):
    """One frame: sample-rate code 0b0000 (STREAMINFO), uncommon 16-bit
    blocksize, fixed blocking strategy."""
    header = bytearray(b"\xff\xf8")
    header.append((0b0111 << 4) | 0b0000)
    header.append((ch_assign << 4) | (_DEPTH_CODE[bits] << 1))
    header += _utf8_number(frame_no)
    header += struct.pack(">H", blocksize - 1)
    header.append(_crc8(header))
    bw = _BitWriter()
    for ch, (samples, spec) in enumerate(zip(channel_data, specs)):
        depth = bits
        if (ch_assign == 0b1000 and ch == 1) or \
           (ch_assign == 0b1001 and ch == 0) or \
           (ch_assign == 0b1010 and ch == 1):
            depth += 1  # side channel
        _write_subframe(bw, samples, depth, spec)
    bw.align()
    frame = bytes(header) + bytes(bw.buf)
    return frame + struct.pack(">H", _crc16(frame))


def flac_full(channels, bits, rate, frames):
    """Real FLAC stream. `frames` is a list of
    (ch_assign, [per-source-channel sample list], [per-subframe spec]).
    Returns (flac_bytes, canonical_pcm_bytes)."""
    all_samples = [[] for _ in range(channels)]
    encoded = []
    for no, (ch_assign, chans, specs) in enumerate(frames):
        blocksize = len(chans[0])
        if channels == 2:
            l, r = chans
            if ch_assign == 0b0001:
                data = [l, r]
            elif ch_assign == 0b1000:   # left/side
                data = [l, [a - b for a, b in zip(l, r)]]
            elif ch_assign == 0b1001:   # side/right
                data = [[a - b for a, b in zip(l, r)], r]
            elif ch_assign == 0b1010:   # mid/side
                data = [[(a + b) >> 1 for a, b in zip(l, r)],
                        [a - b for a, b in zip(l, r)]]
            else:
                raise ValueError(ch_assign)
        else:
            data = chans
        encoded.append(_flac_frame(no, blocksize, bits, ch_assign, data, specs))
        for ch in range(channels):
            all_samples[ch] += chans[ch]
    n_samples = len(all_samples[0])
    nbytes = bits // 8
    pcm = bytearray()
    for i in range(n_samples):
        for ch in range(channels):
            pcm += (all_samples[ch][i] & ((1 << bits) - 1)).to_bytes(
                nbytes, "little")
    pcm = bytes(pcm)
    md5 = hashlib.md5(pcm).digest()
    sizes = [len(f) for f in encoded]
    blocks = [len(f[1][0]) for f in frames]
    streaminfo = struct.pack(">HH", min(blocks), max(blocks))
    streaminfo += min(sizes).to_bytes(3, "big") + max(sizes).to_bytes(3, "big")
    packed = ((rate << 44) | ((channels - 1) << 41)
              | ((bits - 1) << 36) | n_samples)
    streaminfo += packed.to_bytes(8, "big") + md5
    return (b"fLaC" + bytes([0x80])
            + len(streaminfo).to_bytes(3, "big") + streaminfo
            + b"".join(encoded)), pcm


def ogg_page(payload, granule, serial=1, seq=0, header_type=0):
    """One Ogg page (RFC 3533): zeroed CRC — the parser under test reads
    headers only and documents that CRCs are not validated."""
    segs = []
    n = len(payload)
    while n >= 255:
        segs.append(255)
        n -= 255
    segs.append(n)
    return (b"OggS" + bytes([0, header_type]) + struct.pack("<q", granule)
            + struct.pack("<III", serial, seq, 0)
            + bytes([len(segs)]) + bytes(segs) + payload)


def ogg_opus(channels, rate, pre_skip, samples):
    """Minimal Ogg/Opus stream: OpusHead BOS page, OpusTags page, one
    data page whose granule position carries the total 48 kHz sample
    count (RFC 7845)."""
    head = (b"OpusHead" + bytes([1, channels]) + struct.pack("<H", pre_skip)
            + struct.pack("<I", rate) + struct.pack("<h", 0) + bytes([0]))
    tags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    return (ogg_page(head, 0, header_type=2)
            + ogg_page(tags, 0, seq=1)
            + ogg_page(b"\x00" * 20, samples, seq=2, header_type=4))


def ogg_vorbis(channels, rate, samples):
    """Minimal Ogg/Vorbis stream: identification-header BOS page plus a
    data page carrying the final granule (total samples at the stream
    rate). A >255-byte payload exercises multi-segment lacing."""
    ident = (bytes([1]) + b"vorbis" + struct.pack("<I", 0)
             + bytes([channels]) + struct.pack("<I", rate)
             + struct.pack("<iii", 0, 128000, 0) + bytes([0xB8, 0x01]))
    return (ogg_page(ident, 0, header_type=2)
            + ogg_page(b"\x00" * 300, samples, seq=1, header_type=4))


def stub_dims(data):
    sha = hashlib.sha256(data).digest()
    return 1 + (sha[0] & 0x3F), 1 + (sha[1] & 0x3F)


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    assets = []

    def put(name, data, modality, width, height, n_frames, rgba=None,
            pcm=None):
        (OUT / name).write_bytes(data)
        entry = {"name": name, "modality": modality, "width": width,
                 "height": height, "n_frames": n_frames,
                 "pixel_width": None, "pixel_height": None,
                 "pixel_sha": None, "resize_width": None,
                 "resize_height": None, "resize_sha": None,
                 "sample_sha": None}
        if rgba is not None:
            entry["pixel_width"] = width
            entry["pixel_height"] = height
            entry["pixel_sha"] = rgba_sha(rgba)
            entry["resize_width"] = RESIZE_W
            entry["resize_height"] = RESIZE_H
            entry["resize_sha"] = resize_nn_sha(rgba, width, height)
        if pcm is not None:
            entry["sample_sha"] = hashlib.sha256(pcm).hexdigest()
        assets.append(entry)

    def put_px(name, data_rgba, modality, width, height, n_frames):
        data, rgba = data_rgba
        put(name, data, modality, width, height, n_frames, rgba=rgba)

    put_px("img_24bit.bmp", bmp(17, 9), "image/bmp", 17, 9, 1)
    put_px("img_topdown.bmp", bmp(5, 7, top_down=True), "image/bmp", 5, 7, 1)
    put_px("img_core.bmp", bmp(12, 3, header_size=12), "image/bmp", 12, 3, 1)
    put_px("img_pal8.bmp", bmp8(11, 6), "image/bmp", 11, 6, 1)
    put_px("img_rgb.ppm", ppm(6, 4), "image/ppm", 6, 4, 1)
    put_px("img_gray.pgm", ppm(9, 2, magic=b"P5"), "image/ppm", 9, 2, 1)
    put_px("img_plain.ppm", ppm(3, 5, comment=False), "image/ppm", 3, 5, 1)
    put_px("img_rgba.png", png(21, 13, filters=[0, 1, 2, 3, 4]),
           "image/png", 21, 13, 1)
    put_px("img_tall.png", png(1, 999, filters=[2, 4]),
           "image/png", 1, 999, 1)
    put_px("img_gray.png", png(15, 8, color_type=0, filters=[1, 3]),
           "image/png", 15, 8, 1)
    put_px("img_rgb.png", png(19, 11, color_type=2, filters=[4, 1, 2]),
           "image/png", 19, 11, 1)
    put_px("img_pal.png",
           png(14, 9, color_type=3, filters=[0, 1],
               palette=[((i * 37) % 256, (i * 59) % 256, (i * 83) % 256)
                        for i in range(64)]),
           "image/png", 14, 9, 1)
    put_px("img_grayalpha.png", png(10, 12, color_type=4, filters=[3, 4, 2]),
           "image/png", 10, 12, 1)
    put("img_anim.gif", gif(31, 7), "image/gif", 31, 7, 1)
    put("img_old.gif", gif(4, 4, version=b"87a"), "image/gif", 4, 4, 1)
    put("img_base.jpg", jpeg(640, 480), "image/jpeg", 640, 480, 1)
    put("img_prog.jpg", jpeg(33, 77, progressive=True), "image/jpeg", 33, 77, 1)
    put("img_lossy.webp", webp(160, 120), "image/webp", 160, 120, 1)
    put("img_lossless.webp", webp(300, 200, variant="lossless"),
        "image/webp", 300, 200, 1)
    put("img_ext.webp", webp(70000, 3, variant="extended"),
        "image/webp", 70000, 3, 1)
    put("img_le.tif", tiff(88, 44), "image/tiff", 88, 44, 1)
    put("img_be.tif", tiff(13, 57, big_endian=True), "image/tiff", 13, 57, 1)
    put("img_wide.tif", tiff(100000, 2, wide_width=True),
        "image/tiff", 100000, 2, 1)
    put("vid_basic.mp4", mp4(1920, 1080), "video/mp4", 1920, 1080, 1)
    put("vid_large.mp4", mp4(64, 36, largesize=True), "video/mp4", 64, 36, 1)
    put("vid_v1.mp4", mp4(256, 144, tkhd_version=1), "video/mp4", 256, 144, 1)
    wav1, pcm1 = wav(2, 16, 44100, 321)
    put("audio_stereo16.wav", wav1, "audio/wav", 2, 16, 321, pcm=pcm1)
    wav2, pcm2 = wav(1, 8, 8000, 123)
    put("audio_mono8.wav", wav2, "audio/wav", 1, 8, 123, pcm=pcm2)
    # REAL FLAC streams (flac_full): every frame a different channel
    # assignment / subframe mix, so the decoder under test exercises
    # constant, verbatim, fixed 0-4, LPC, Rice partitions, the escaped
    # raw partition, and all stereo decorrelation modes. sample_sha is
    # computed from the SOURCE samples — the decoder must reproduce them
    # bit-exactly (and the embedded STREAMINFO MD5 must verify).
    import math as _math

    def _sig(i, amp, period, noise_seed):
        rnd = (noise_seed * (i + 1) * 2654435761) & 0xFFFF
        return int(amp * _math.sin(2 * _math.pi * i / period)) + (rnd % 33) - 16

    bs = 1024
    n_st = [bs, bs, bs, 928]
    off = [0, bs, 2 * bs, 3 * bs]
    left = [[_sig(off[f] + i, 8000, 97.0, 3) for i in range(n_st[f])]
            for f in range(4)]
    right = [[_sig(off[f] + i, 6000, 41.0, 7) for i in range(n_st[f])]
             for f in range(4)]
    st_frames = [
        (0b0001, [left[0], right[0]],
         [("fixed", 2, 2, False), ("verbatim",)]),
        (0b1000, [left[1], right[1]],          # left/side
         [("fixed", 3, 0, False), ("fixed", 1, 2, False)]),
        (0b1001, [left[2], right[2]],          # side/right
         [("fixed", 2, 1, True), ("lpc", 2, 12, 10,
                                  [2013, 29], 0)]),
        (0b1010, [left[3], right[3]],          # mid/side
         [("fixed", 4, 2, False), ("fixed", 0, 0, False)]),
    ]
    fl1, fpcm1 = flac_full(2, 16, 44100, st_frames)
    put("audio_stereo.flac", fl1, "audio/flac", 2, 16, 4000, pcm=fpcm1)

    n_hi = [bs, bs, bs, 297]
    mono = [[_sig(off[f] + i, 400000, 211.0, 11) for i in range(n_hi[f])]
            for f in range(4)]
    mono[0] = [-123456] * bs  # a genuinely constant block
    hi_frames = [
        (0b0000, [mono[0]], [("constant",)]),
        (0b0000, [mono[1]], [("fixed", 3, 3, False)]),
        (0b0000, [mono[2]], [("lpc", 3, 14, 11, [4021, -1968, 37], 2)]),
        (0b0000, [mono[3]], [("fixed", 4, 0, True)]),
    ]
    fl2, fpcm2 = flac_full(1, 24, 96000, hi_frames)
    put("audio_hires.flac", fl2, "audio/flac", 1, 24, 3369, pcm=fpcm2)
    # header-only FLAC (no frames): the decoder must return NO samples —
    # honest absence, never fabricated dims — while the header row still
    # carries STREAMINFO metadata
    put("audio_info.flac", flac(2, 16, 44100, 88200),
        "audio/flac", 2, 16, 88200)
    # lossy codecs have no bit depth: height = 0, n_frames = final granule
    put("audio_voice.opus", ogg_opus(1, 16000, 312, 144000),
        "audio/opus", 1, 0, 144000)
    put("audio_music.opus", ogg_opus(2, 48000, 312, 960000),
        "audio/opus", 2, 0, 960000)
    put("audio_song.ogg", ogg_vorbis(2, 44100, 220500),
        "audio/vorbis", 2, 0, 220500)

    rnd = random.Random(99)
    blob = bytes(rnd.randrange(256) for _ in range(1000))
    w, h = stub_dims(blob)
    put("payload.bin", blob, "opaque", w, h, math.ceil(len(blob) / FRAME_BYTES))
    # a near-miss: starts with 'B' but is not a BMP — must fall to opaque
    tricky = b"BX" + blob[:100]
    w, h = stub_dims(tricky)
    put("not_a.bmp", tricky, "opaque", w, h, math.ceil(len(tricky) / FRAME_BYTES))
    # PNG near-miss: valid signature, truncated before the IHDR dims —
    # must fall to opaque, never throw
    tricky_png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIH"
    w, h = stub_dims(tricky_png)
    put("not_a.png", tricky_png, "opaque", w, h,
        math.ceil(len(tricky_png) / FRAME_BYTES))
    # JPEG near-miss: SOI + a segment stream that hits EOI with no SOF
    tricky_jpg = b"\xff\xd8\xff\xfe" + struct.pack(">H", 6) + b"nope" + b"\xff\xd9"
    w, h = stub_dims(tricky_jpg)
    put("not_a.jpg", tricky_jpg, "opaque", w, h,
        math.ceil(len(tricky_jpg) / FRAME_BYTES))
    # WebP near-miss: valid RIFF/WEBP container, corrupt VP8 start code —
    # must fall to opaque, not misread dims from the frame tag bytes
    bad_webp = bytearray(webp(160, 120))
    bad_webp[23] = 0x00
    bad_webp = bytes(bad_webp)
    w, h = stub_dims(bad_webp)
    put("not_a.webp", bad_webp, "opaque", w, h,
        math.ceil(len(bad_webp) / FRAME_BYTES))
    # TIFF near-miss: "II" endian tag but magic 43 — must fall to opaque
    bad_tif = b"II" + struct.pack("<H", 43) + struct.pack("<I", 8) + b"\x00\x00"
    w, h = stub_dims(bad_tif)
    put("not_a.tif", bad_tif, "opaque", w, h,
        math.ceil(len(bad_tif) / FRAME_BYTES))
    # Ogg near-miss: a valid first page whose payload is neither OpusHead
    # nor a Vorbis identification header — must fall to opaque
    bad_ogg = ogg_page(b"FLACmeta" + b"\x00" * 16, 0, header_type=2)
    w, h = stub_dims(bad_ogg)
    put("not_an.ogg", bad_ogg, "opaque", w, h,
        math.ceil(len(bad_ogg) / FRAME_BYTES))

    (OUT / "manifest.json").write_text(json.dumps(assets, indent=2))
    print(f"wrote {len(assets)} assets to {OUT}")


if __name__ == "__main__":
    main()
