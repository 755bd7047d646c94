"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns
with struct metadata; the per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` stages — the same
operator shape as the text extractor, so partitioning / skew / lineage
handling is shared.

Decode tiers:

- **Raster formats decode FOR REAL, stdlib-only**: 24-bit BMP
  (``_decode_bmp``), binary/ascii PPM (``_decode_ppm``), non-interlaced
  8-bit grayscale/RGB/RGBA PNG (``_decode_png``: ``zlib`` inflate +
  all five PNG row filters + per-chunk CRC validation), GIF87a/89a
  (``_decode_gif``: GIF-variant LSB-first LZW, global/local palettes,
  interlace — first frame), baseline TIFF (``_decode_tiff``: both byte
  orders, strips, none/LZW/PackBits compression — the LZW is the SAME
  MSB-first EarlyChange filter as PDF's, reused from
  `extractor.pdf_extract` — horizontal predictor, 8-bit gray/RGB),
  and baseline sequential JPEG
  (`operators.jpegcodec`: Huffman entropy decode, dequant, IDCT,
  chroma upsampling, JFIF color convert), with deterministic
  nearest-neighbour grayscale thumbnailing as the resize stage
  (:func:`grayscale_thumb`).  :func:`image_features` is the
  oracle-checked Spark operator over them.
- **Container metadata parses for real where sample decode does not**:
  MPEG-1 Layer III frame headers (:func:`parse_mp3_headers` — rate/
  channels/duration) and ISO-BMFF/MP4 box walks
  (:func:`parse_mp4_boxes` — duration/tracks/resolution) feed
  `audio_features` / `video_features`; the compressed SAMPLE decode
  those containers carry (MP3 PCM synthesis, video codecs) stays
  behind ``decode_stub``.
- **The remaining capability gate is narrow and honest**: PNG variants
  outside the implemented profile (16-bit, palette, interlaced) and
  JPEG outside baseline (progressive, arithmetic, 12-bit) raise
  ``NotImplementedError``; per-row isolation turns them into
  ``unsupported`` feature rows instead of task failures.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Dict, Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

INSPECT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hash", T.StringType()),
    ]
)


def decode_stub(payload: bytes, media_type: str) -> object:
    """Placeholder for the codecs still outside the stdlib decoders'
    reach (MP3, video — ffmpeg-class libraries are not in this
    container).  Raster images decode for real — see
    :func:`decode_image` and `operators.jpegcodec`."""
    raise NotImplementedError(
        f"decoding media_type={media_type!r} requires codec libraries "
        "not present in this runtime"
    )


# ---------------------------------------------------------------------------
# real decoders: uncompressed raster formats (stdlib only)
# ---------------------------------------------------------------------------


def synth_bmp(seed: int, width: int = 24, height: int = 16) -> bytes:
    """Deterministic 24-bit bottom-up BMP — a pure function of ``seed``,
    used to give the decode path a real, reproducible corpus."""
    row_size = (width * 3 + 3) & ~3
    pixel_bytes = row_size * height
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            row += bytes(((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF))  # B,G,R
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def synth_ppm(seed: int, width: int = 20, height: int = 12) -> bytes:
    """Deterministic binary PPM (P6) twin of :func:`synth_bmp`."""
    raster = bytearray()
    for y in range(height):
        for x in range(width):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            raster += bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))
    return b"P6\n# synth\n%d %d\n255\n" % (width, height) + bytes(raster)


def _decode_bmp(payload: bytes) -> dict:
    """24-bit uncompressed BMP -> {width, height, rgb rows top-down}."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0 or planes != 1 or width <= 0 or height == 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    if len(payload) < data_offset + row_size * height:
        raise ValueError("truncated BMP")
    rows = []
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        base = data_offset + src_y * row_size
        row = []
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            row.append((r, g, b))
        rows.append(row)
    return {"media_type": "image/bmp", "width": width, "height": height, "rows": rows}


def _decode_ppm(payload: bytes) -> dict:
    """PPM P6 (binary) / P3 (ascii), maxval <= 255."""
    if payload[:2] not in (b"P6", b"P3"):
        raise ValueError("not a PPM")
    binary = payload[:2] == b"P6"
    # header tokens with '#' comments stripped
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    width, height, maxval = fields
    if maxval > 255 or width <= 0 or height <= 0:
        raise ValueError("unsupported PPM")
    pos += 1  # single whitespace after maxval
    if binary:
        raster = payload[pos : pos + width * height * 3]
        if len(raster) < width * height * 3:
            raise ValueError("truncated PPM")
        vals = list(raster)
    else:
        vals = [int(t) for t in payload[pos:].split()]
        if len(vals) < width * height * 3:
            raise ValueError("truncated PPM")
    rows = [
        [
            tuple(vals[(y * width + x) * 3 : (y * width + x) * 3 + 3])
            for x in range(width)
        ]
        for y in range(height)
    ]
    return {"media_type": "image/ppm", "width": width, "height": height, "rows": rows}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, RGB, RGBA (8-bit)


def _paeth(a: int, b: int, c: int) -> int:
    """The PNG Paeth predictor (RFC 2083 §6.6): nearest of left/up/
    up-left to the linear estimate, ties left > up > up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def synth_png(
    seed: int, width: int = 21, height: int = 14, color_type: int = 2
) -> bytes:
    """Deterministic non-interlaced 8-bit PNG — pure function of
    ``seed``, same pixel recurrence as :func:`synth_bmp`.  The per-row
    FILTER TYPE cycles ``(seed + y) % 5``, so a corpus of these
    exercises every one of the five unfilter paths in
    :func:`_decode_png`; the encoder applies the real filter transform
    (delta against left/up/average/Paeth), making encode→decode a
    meaningful round trip rather than a filter-0 tautology."""
    import zlib

    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"color_type must be one of 0/2/6, got {color_type}")
    nch = _PNG_CHANNELS[color_type]
    stride = width * nch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = bytearray()
        for x in range(width):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            px = ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF, (v >> 24) & 0xFF)
            if color_type == 0:
                line.append(px[0])
            else:
                line += bytes(px[:nch])
        ft = (seed + y) % 5
        filtered = bytearray(stride)
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            filtered[i] = (line[i] - pred) & 0xFF
        raw.append(ft)
        raw += filtered
        prev = bytes(line)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> dict:
    """Non-interlaced 8-bit grayscale/RGB/RGBA PNG -> the shared
    {width, height, rgb rows top-down} contract, stdlib-only: chunk
    walk with CRC validation, ``zlib`` inflate of the concatenated
    IDAT stream, and the five row unfilters (RFC 2083 §6).  RGBA drops
    alpha (feature math runs on channel sums); variants outside the
    profile (16-bit, palette, interlaced) raise ``NotImplementedError``
    — the honest capability gate, isolated per-row upstream."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    ihdr = None
    idat: list = []
    seen_iend = False
    while pos + 12 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        if pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            seen_iend = True
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) != 13 or not idat or not seen_iend:
        raise ValueError("PNG missing IHDR/IDAT/IEND")
    width, height, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt != 0:
        raise ValueError("bad PNG IHDR compression/filter method")
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={depth}, color_type={ctype}, "
            f"interlace={interlace}); implemented: 8-bit non-interlaced "
            "grayscale/RGB/RGBA"
        )
    if not (0 < width <= 1 << 15) or not (0 < height <= 1 << 15):
        raise ValueError("bad PNG dimensions")
    nch = _PNG_CHANNELS[ctype]
    stride = width * nch
    expected = (stride + 1) * height
    try:
        # bounded inflate: a decompression-bomb IDAT (tiny declared
        # dims, 1000:1 stream) must fail as a ValueError-sized check,
        # never materialize gigabytes before the size comparison —
        # MemoryError would escape the per-row isolation net upstream
        dec = zlib.decompressobj()
        raw = dec.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"bad PNG IDAT stream: {e}") from None
    if len(raw) != expected or dec.unconsumed_tail or dec.decompress(b"", 1):
        raise ValueError("PNG raster size mismatch")
    prev = bytes(stride)
    rows = []
    pos = 0
    for _y in range(height):
        ft = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                c = prev[i - nch] if i >= nch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        prev = bytes(line)
        if ctype == 0:
            row = [(v, v, v) for v in line]
        elif ctype == 2:
            row = [
                (line[3 * x], line[3 * x + 1], line[3 * x + 2])
                for x in range(width)
            ]
        else:
            row = [
                (line[4 * x], line[4 * x + 1], line[4 * x + 2])
                for x in range(width)
            ]
        rows.append(row)
    return {
        "media_type": "image/png",
        "width": width,
        "height": height,
        "rows": rows,
    }


# ---------------------------------------------------------------------------
# GIF (87a/89a): real stdlib decode — LSB-first variable-width LZW,
# global/local palettes, interlace; first frame surfaces as rows
# ---------------------------------------------------------------------------

_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_lzw_decode(data: bytes, mcs: int, n_pixels: int) -> List[int]:
    """GIF-variant LZW (LSB-first packing, variable 3..12-bit codes,
    CLEAR/END, table growth at ``1 << code_size``).  NOT the PDF
    variant (`pdf_extract._lzw_decode` is MSB-first with the
    early-change quirk) — the two formats genuinely differ.  Output is
    clamped to ``n_pixels`` (trailing junk ignored, truncation
    raises)."""
    if not 2 <= mcs <= 8:
        raise ValueError("bad GIF LZW min code size")
    clear = 1 << mcs
    end = clear + 1
    out: List[int] = []
    table: List[List[int]] = []

    def reset():
        nonlocal table, code_size
        table = [[i] for i in range(clear)] + [[], []]
        code_size = mcs + 1

    code_size = mcs + 1
    reset()
    prev: List[int] = []
    bitbuf = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            prev = []
            continue
        if code == end:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW code")
        out.extend(entry)
        if prev and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data short of image size")
    return out[:n_pixels]


def _decode_gif(payload: bytes) -> dict:
    """GIF87a/89a -> the shared {width, height, rows} contract: the
    FIRST image frame, palette-resolved to RGB, de-interlaced when
    flagged; animation frames beyond the first are ignored (the
    still-image semantics every thumbnailer uses).  Transparency is
    surfaced as the palette color (no compositing target exists)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(payload):
            raise ValueError("truncated GIF global color table")
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image frame")
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                sz = payload[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        if pos + 9 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        _left, _top, w, h = struct.unpack_from("<HHHH", payload, pos)
        ipacked = payload[pos + 8]
        pos += 9
        if w == 0 or h == 0 or w * h > (1 << 22):
            raise ValueError("bad GIF image dimensions")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(payload):
                raise ValueError("truncated GIF local color table")
            pal = payload[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        if pos >= len(payload):
            raise ValueError("truncated GIF (no LZW min code size)")
        mcs = payload[pos]
        pos += 1
        chunks = []
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image data")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            chunks.append(payload[pos : pos + sz])
            if len(chunks[-1]) < sz:
                raise ValueError("truncated GIF data sub-block")
            pos += sz
        idx = _gif_lzw_decode(b"".join(chunks), mcs, w * h)
        npal = len(pal) // 3
        if max(idx) >= npal:
            raise ValueError("GIF pixel index outside color table")
        flat = [
            (pal[3 * i], pal[3 * i + 1], pal[3 * i + 2]) for i in idx
        ]
        rows: List[List[Tuple[int, int, int]]] = [None] * h  # type: ignore
        if ipacked & 0x40:  # interlaced: 4-pass row order
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, h, step):
                    rows[y] = flat[src * w : (src + 1) * w]
                    src += 1
        else:
            for y in range(h):
                rows[y] = flat[y * w : (y + 1) * w]
        return {
            "media_type": "image/gif",
            "width": w,
            "height": h,
            "rows": rows,
        }
    raise ValueError("truncated GIF (no blocks)")


def _gif_lzw_compress(indices: List[int], mcs: int) -> bytes:
    """Independent GIF-LZW compressor (greedy longest match, growth and
    reset mirroring the format rules) — encoder and decoder share no
    state machinery, so round trips are genuine inversion checks."""
    clear = 1 << mcs
    end = clear + 1
    codes: List[Tuple[int, int]] = []  # (code, size at emission)

    table: Dict[Tuple[int, ...], int]

    def reset():
        nonlocal table, next_code, code_size
        table = {(i,): i for i in range(clear)}
        next_code = end + 1
        code_size = mcs + 1

    next_code = 0
    code_size = 0
    reset()
    codes.append((clear, code_size))
    w: Tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        codes.append((table[w], code_size))
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            codes.append((clear, code_size))
            reset()
        w = (k,)
    if w:
        codes.append((table[w], code_size))
    codes.append((end, code_size))
    # LSB-first pack
    buf = bytearray()
    acc = 0
    nbits = 0
    for code, size in codes:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def synth_gif(
    seed: int,
    width: int = 18,
    height: int = 11,
    n_colors: int = 8,
    interlace: bool = False,
    local_palette: bool = False,
) -> bytes:
    """Deterministic GIF: seed-derived palette + pixel indices through
    the real LZW compressor; optional interlace and local-palette
    layout so the decoder's variant paths get corpus coverage."""
    bits = max(1, (n_colors - 1).bit_length())
    pal_n = 1 << bits
    pal = bytes(
        (seed * 29 + i * 53 + c * 11) % 256
        for i in range(pal_n)
        for c in range(3)
    )
    idx = [
        (seed * 2654435761 + y * 97 + x * 31) % n_colors
        for y in range(height)
        for x in range(width)
    ]
    if interlace:
        order = []
        for start, step in _GIF_INTERLACE_PASSES:
            order.extend(range(start, height, step))
        stored = []
        for y in order:
            stored.extend(idx[y * width : (y + 1) * width])
    else:
        stored = idx
    mcs = max(2, bits)
    lzw = _gif_lzw_compress(stored, mcs)
    out = bytearray(b"GIF89a")
    gct_flag = 0 if local_palette else 0x80
    out += struct.pack("<HH", width, height)
    out += bytes((gct_flag | (bits - 1), 0, 0))
    if not local_palette:
        out += pal
    # a GCE extension block, exercising the skip path
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ipacked = (0x80 | (bits - 1)) if local_palette else 0
    if interlace:
        ipacked |= 0x40
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes((ipacked,))
    if local_palette:
        out += pal
    out += bytes((mcs,))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes((len(chunk),)) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF (baseline rev 6): real stdlib decode — the reference's batch CLI
# accepts .tif/.tiff uploads (SURVEY S3 suffix list), so the multimodal
# leg decodes them for real: both byte orders, strips, uncompressed /
# PackBits / LZW (the MSB-first EarlyChange variant — EXACTLY the PDF
# filter, reused from extractor.pdf_extract), horizontal predictor,
# 8-bit gray + RGB.
# ---------------------------------------------------------------------------

_TIFF_PIXEL_BUDGET = 1 << 22


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF PackBits RLE (spec §9): n<128 copies n+1 literals, n>128
    repeats the next byte 257-n times, 128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c < 128:
            if i + c + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            if i >= n:
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    return bytes(out)


def _decode_tiff(payload: bytes) -> dict:
    """Baseline TIFF -> the shared {width, height, rows} contract.

    First IFD only; 8-bit samples; photometric 0 (white-is-zero,
    inverted), 1 (gray), 2 (RGB); compression 1 (none), 5 (LZW —
    `extractor.pdf_extract._lzw_decode`, the SAME MSB-first
    EarlyChange code TIFF specifies), 32773 (PackBits); optional
    horizontal-differencing predictor (tag 317=2).  Anything outside
    raises ``NotImplementedError`` through the honest gate; malformed
    structure raises ``ValueError``."""
    from ..extractor.pdf_extract import _lzw_decode

    if len(payload) < 8:
        raise ValueError("not a TIFF (too short)")
    bom = payload[:2]
    if bom == b"II" and payload[2:4] == b"*\x00":
        end = "<"
    elif bom == b"MM" and payload[2:4] == b"\x00*":
        end = ">"
    else:
        raise ValueError("not a TIFF")
    (ifd_off,) = struct.unpack_from(end + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD offset")
    (n_tags,) = struct.unpack_from(end + "H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_tags > len(payload):
        raise ValueError("truncated TIFF IFD")

    _TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}

    def tag_values(pos):
        tag, typ, count = struct.unpack_from(end + "HHI", payload, pos)
        if typ not in _TYPE_SIZE:
            return tag, None  # rational/unknown types: not needed here
        size = _TYPE_SIZE[typ] * count
        if size <= 4:
            base = pos + 8
        else:
            (base,) = struct.unpack_from(end + "I", payload, pos + 8)
            if base + size > len(payload):
                raise ValueError("truncated TIFF tag data")
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        vals = list(
            struct.unpack_from(end + fmt * count, payload, base)
        )
        return tag, vals

    tags = {}
    for i in range(n_tags):
        tag, vals = tag_values(ifd_off + 2 + 12 * i)
        if vals is not None:
            tags[tag] = vals

    def one(tag, default=None):
        v = tags.get(tag)
        if not v:  # absent OR a malformed count=0 tag
            return default
        return v[0]

    w = one(256)
    h = one(257)
    if not w or not h:
        raise ValueError("TIFF missing dimensions")
    if w * h > _TIFF_PIXEL_BUDGET:
        raise ValueError(
            f"TIFF dimensions {w}x{h} exceed the decode pixel budget"
        )
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    photometric = one(262)
    compression = one(259, 1)
    predictor = one(317, 1)
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise NotImplementedError(
            f"unsupported TIFF sample layout (bits={bits}, spp={spp})"
        )
    if photometric not in (0, 1, 2) or (photometric == 2) != (spp == 3):
        raise NotImplementedError(
            f"unsupported TIFF photometric {photometric} with spp={spp}"
        )
    if compression not in (1, 5, 32773):
        raise NotImplementedError(
            f"unsupported TIFF compression {compression}"
        )
    if predictor not in (1, 2):
        raise NotImplementedError(f"unsupported TIFF predictor {predictor}")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing strip layout")
    rows_per_strip = one(278, h)
    if not rows_per_strip or rows_per_strip < 1:
        raise ValueError("bad TIFF RowsPerStrip")
    if len(offsets) != -(-h // rows_per_strip):
        # surplus strips would give a negative n_rows below AND each
        # would still be fully inflated — reject the malformed layout
        raise ValueError("TIFF strip count does not match image height")

    stride = w * spp
    raster = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise ValueError("truncated TIFF strip")
        chunk = payload[off : off + cnt]
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = stride * n_rows
        if compression == 5:
            try:
                # bound the inflate by the strip's raster size: a bomb
                # strip fails here instead of allocating attacker-sized
                # buffers (same guard class as PNG/JPEG/PackBits)
                data = _lzw_decode(chunk, max_out=expected)
            except (ValueError, KeyError) as e:
                raise ValueError(f"bad TIFF LZW strip: {e}") from None
        elif compression == 32773:
            data = _packbits_decode(chunk, expected)
        else:
            data = chunk
        if len(data) < expected:
            raise ValueError("TIFF strip short of row data")
        data = bytearray(data[:expected])
        if predictor == 2:
            for r in range(n_rows):
                base = r * stride
                for i in range(spp, stride):
                    data[base + i] = (
                        data[base + i] + data[base + i - spp]
                    ) & 0xFF
        raster += data
    if len(raster) < stride * h:
        raise ValueError("TIFF strips short of image size")

    rows = []
    for y in range(h):
        base = y * stride
        if spp == 3:
            row = [
                (raster[base + 3 * x], raster[base + 3 * x + 1],
                 raster[base + 3 * x + 2])
                for x in range(w)
            ]
        elif photometric == 0:  # white-is-zero
            row = [
                (255 - raster[base + x],) * 3 for x in range(w)
            ]
        else:
            row = [(raster[base + x],) * 3 for x in range(w)]
        rows.append(row)
    return {
        "media_type": "image/tiff",
        "width": w,
        "height": h,
        "rows": rows,
    }


def _tiff_lzw_compress(data: bytes) -> bytes:
    """Independent TIFF/PDF-variant LZW compressor (MSB-first, clear
    256 / EOD 257, EarlyChange code-width growth) — shares nothing with
    the decoder (`pdf_extract._lzw_decode`), so round trips are real
    inversion checks."""
    out_bits = []
    table = {bytes([i]): i for i in range(256)}
    next_code, code_len = 258, 9

    def emit(code):
        out_bits.append((code, code_len))

    emit(256)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # The encoder's table runs ONE insertion ahead of the
            # decoder's (the decoder learns entry k only while decoding
            # code k+1), so matching the decoder's EarlyChange growth
            # (next_code >= (1<<len) - 1 after ITS insertion) means the
            # encoder widens at (1<<len), one step later by its own
            # count — derived and pinned by the round-trip tests
            if next_code >= (1 << code_len) and code_len < 12:
                code_len += 1
        else:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code, code_len = 258, 9
        w = bytes([b])
    if w:
        emit(table[w])
        # the decoder performs ONE more insertion while decoding this
        # flush code and may widen before reading EOD — mirror it, or
        # EOD goes out one bit narrow when the stream ends exactly on a
        # width boundary (found by randomized round-trip fuzz)
        if next_code < 4096:
            next_code += 1
            if next_code >= (1 << code_len) and code_len < 12:
                code_len += 1
    emit(257)
    buf = bytearray()
    acc = nbits = 0
    for code, size in out_bits:
        acc = (acc << size) | code
        nbits += size
        while nbits >= 8:
            buf.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        buf.append((acc << (8 - nbits)) & 0xFF)
    return bytes(buf)


def _packbits_encode(data: bytes) -> bytes:
    """Independent PackBits encoder: literal runs + repeats >= 3."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes((257 - run, data[i]))
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (i - lit_start) < 128:
            nxt = 1
            while i + nxt < n and nxt < 3 and data[i + nxt] == data[i]:
                nxt += 1
            if nxt >= 3:
                break
            i += 1
        out += bytes((i - lit_start - 1,)) + data[lit_start:i]
    return bytes(out)


def synth_tiff(
    seed: int,
    width: int = 17,
    height: int = 9,
    gray: bool = False,
    compression: int = 1,
    big_endian: bool = False,
    predictor: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Deterministic TIFF (same pixel recurrence as :func:`synth_bmp`)
    through independent encoders for every supported layout axis:
    byte order, gray/RGB, none/LZW/PackBits compression, horizontal
    predictor, multi-strip."""
    end = ">" if big_endian else "<"
    spp = 1 if gray else 3
    stride = width * spp
    if rows_per_strip is None:
        rows_per_strip = height
    raster = bytearray()
    for y in range(height):
        for x in range(width):
            v = (seed * 2654435761 + y * 97 + x * 31) & 0xFFFFFFFF
            px = ((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
            raster += bytes((px[0],) if gray else px)

    strips = []
    for sy in range(0, height, rows_per_strip):
        n_rows = min(rows_per_strip, height - sy)
        chunk = bytearray(raster[sy * stride : (sy + n_rows) * stride])
        if predictor == 2:
            for r in range(n_rows - 1, -1, -1):
                base = r * stride
                for i in range(stride - 1, spp - 1, -1):
                    chunk[base + i] = (
                        chunk[base + i] - chunk[base + i - spp]
                    ) & 0xFF
        if compression == 5:
            strips.append(_tiff_lzw_compress(bytes(chunk)))
        elif compression == 32773:
            strips.append(_packbits_encode(bytes(chunk)))
        else:
            strips.append(bytes(chunk))

    n_strips = len(strips)
    entries = []  # (tag, type, count, value_or_bytes)

    def short(tag, v):
        entries.append((tag, 3, 1, v))

    short(256, width)
    short(257, height)
    if gray:
        short(258, 8)
    else:
        entries.append((258, 3, 3, (8, 8, 8)))  # BitsPerSample x3
    short(259, compression)
    short(262, 1 if gray else 2)
    entries.append((273, 4, n_strips, tuple(0 for _ in strips)))  # patched
    short(277, spp)
    short(278, rows_per_strip)
    entries.append((279, 4, n_strips, tuple(len(s) for s in strips)))
    if predictor == 2:
        short(317, predictor)
    entries.sort(key=lambda e: e[0])

    # layout: header(8) + IFD + overflow data + strips
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()
    fixed = []
    for tag, typ, count, val in entries:
        tsize = {3: 2, 4: 4}[typ] * count
        if count == 1:
            fixed.append((tag, typ, count, val, None))
        elif tsize <= 4:
            fixed.append((tag, typ, count, val, None))
        else:
            fixed.append((tag, typ, count, None, overflow_off + len(overflow)))
            fmt = {3: "H", 4: "I"}[typ]
            overflow += struct.pack(end + fmt * count, *val)
    strips_off = overflow_off + len(overflow)
    offs = []
    pos = strips_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    # patch StripOffsets values
    out_entries = []
    for tag, typ, count, val, ptr in fixed:
        if tag == 273:
            if count == 1:
                val = offs[0]
            else:
                # rewrite the overflow slice with real offsets
                fmt = {3: "H", 4: "I"}[typ]
                rel = ptr - overflow_off
                overflow[rel : rel + 4 * count] = struct.pack(
                    end + fmt * count, *offs
                )
        out_entries.append((tag, typ, count, val, ptr))

    buf = bytearray()
    buf += (b"MM\x00*" if big_endian else b"II*\x00")
    buf += struct.pack(end + "I", ifd_off)
    buf += struct.pack(end + "H", len(out_entries))
    for tag, typ, count, val, ptr in out_entries:
        buf += struct.pack(end + "HHI", tag, typ, count)
        if ptr is not None:
            buf += struct.pack(end + "I", ptr)
        elif count == 1:
            if isinstance(val, tuple):
                val = val[0]
            if typ == 3:
                buf += struct.pack(end + "H", val) + b"\x00\x00"
            else:
                buf += struct.pack(end + "I", val)
        else:  # inline multi-value that fits 4 bytes (3 shorts never fit)
            fmt = {3: "H", 4: "I"}[typ]
            packed = struct.pack(end + fmt * count, *val)
            buf += packed + b"\x00" * (4 - len(packed))
    buf += struct.pack(end + "I", 0)  # next IFD
    buf += overflow
    for s in strips:
        buf += s
    return bytes(buf)


def synth_wav(seed: int, n_samples: int = 800, rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV — pure function of ``seed``."""
    samples = bytearray()
    v = seed & 0x7FFFFFFF
    for _ in range(n_samples):
        v = (v * 1103515245 + 12345) & 0x7FFFFFFF
        samples += struct.pack("<h", (v % 65536) - 32768)
    data = bytes(samples)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> dict:
    """RIFF PCM WAV (8/16-bit) -> rate/channels/duration + exact integer
    energy (sum of abs sample values) — stdlib struct only."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits not in (8, 16):
                raise ValueError(f"unsupported WAV (fmt={fmt}, bits={bits})")
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None or not channels:
        raise ValueError("truncated WAV")
    if bits == 16:
        n = len(data) // 2
        vals = struct.unpack(f"<{n}h", data[: n * 2])
    else:
        vals = [b - 128 for b in data]
        n = len(vals)
    n_frames = n // channels
    return {
        "media_type": "audio/wav",
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": (n_frames * 1000) // rate if rate else 0,
        "energy": sum(abs(v) for v in vals),
        "n_samples": n,
    }


# MPEG-1 Layer III frame-header tables (ISO 11172-3)
_MP3_BITRATES = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
_MP3_RATES = [44100, 48000, 32000]
_MP3_SAMPLES_PER_FRAME = 1152


def parse_mp3_headers(payload: bytes) -> dict:
    """MPEG-1 Layer III FRAME-HEADER walk — real container metadata
    (sample rate, channel mode, exact frame count → duration) without
    PCM decode, which stays behind :func:`decode_stub` (a full Layer
    III synthesis filterbank is out of scope; header telemetry is what
    a corpus audit actually reads).  Optional ID3v2 prefix is skipped
    via its syncsafe size.  Returns the `decode_wav` contract with
    ``energy``/``n_samples`` None (no PCM was produced — the honest
    part of the row stays honest)."""
    pos = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        sz = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("bad ID3v2 syncsafe size")
            sz = (sz << 7) | b
        pos = 10 + sz
        if payload[5] & 0x10:
            # ID3v2.4 footer flag: the tag carries a trailing 10-byte
            # footer NOT counted in the syncsafe size — skipping it is
            # required or the frame-sync scan starts on the footer
            pos += 10
    n = len(payload)
    n_frames = 0
    rate = None
    channels = None
    while pos + 4 <= n:
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            if n_frames:
                break  # trailing junk after the last whole frame
            raise ValueError("no MP3 frame sync")
        version = (b1 >> 3) & 0x03
        layer = (b1 >> 1) & 0x03
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError(
                "only MPEG-1 Layer III frame headers are parsed"
            )
        bitrate_idx = (b2 >> 4) & 0x0F
        rate_idx = (b2 >> 2) & 0x03
        padding = (b2 >> 1) & 0x01
        if bitrate_idx in (0, 15) or rate_idx == 3:
            raise ValueError("bad MP3 frame header (bitrate/rate index)")
        frame_rate = _MP3_RATES[rate_idx]
        if rate is None:
            rate = frame_rate
        elif frame_rate != rate:
            raise ValueError("MP3 sample rate changes mid-stream")
        mode = (b3 >> 6) & 0x03
        ch = 1 if mode == 0b11 else 2
        if channels is None:
            channels = ch
        frame_len = (
            144 * _MP3_BITRATES[bitrate_idx] * 1000 // frame_rate + padding
        )
        if frame_len < 4 or pos + frame_len > n:
            if n_frames:
                break  # torn final frame: keep what fully parsed
            raise ValueError("truncated MP3 frame")
        n_frames += 1
        pos += frame_len
    if not n_frames:
        raise ValueError("no MP3 frames")
    return {
        "media_type": "audio/mpeg",
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": (n_frames * _MP3_SAMPLES_PER_FRAME * 1000) // rate,
        "energy": None,
        "n_samples": None,
    }


def synth_mp3(seed: int, n_frames: int = 5, with_id3: bool = True) -> bytes:
    """Deterministic MPEG-1 Layer III frame-header stream (headers are
    real and self-consistent; frame bodies are seed-derived junk — no
    PCM claim is made, matching what :func:`parse_mp3_headers` reads)."""
    out = bytearray()
    if with_id3:
        tag = b"synthtag%d" % (seed % 100)
        out += b"ID3\x04\x00\x00" + bytes(
            (len(tag) >> 21) & 0x7F if i == 0
            else (len(tag) >> 14) & 0x7F if i == 1
            else (len(tag) >> 7) & 0x7F if i == 2
            else len(tag) & 0x7F
            for i in range(4)
        ) + tag
    rate_idx = seed % 3
    rate = _MP3_RATES[rate_idx]
    for f in range(n_frames):
        bitrate_idx = 9 + ((seed + f) % 3)  # 128/160/192 kbps
        padding = (seed + f) % 2
        hdr = bytes(
            (
                0xFF,
                0xFB,  # MPEG-1 Layer III, no CRC
                (bitrate_idx << 4) | (rate_idx << 2) | (padding << 1),
                0xC0 if seed % 2 else 0x00,  # mono / stereo
            )
        )
        frame_len = 144 * _MP3_BITRATES[bitrate_idx] * 1000 // rate + padding
        body = bytes(
            ((seed * 31 + f * 7 + i) % 251) for i in range(frame_len - 4)
        )
        out += hdr + body
    return bytes(out)


def parse_mp4_boxes(payload: bytes) -> dict:
    """ISO-BMFF (MP4) container-METADATA probe — a top-level box walk
    plus one level into ``moov``: ``mvhd`` gives timescale/duration,
    ``trak``/``tkhd`` give track count and the first visual track's
    fixed-point width/height.  No sample decode (the codec payloads in
    ``mdat`` stay behind :func:`decode_stub` / the frame sampler) —
    this is the duration/track/resolution telemetry a corpus audit
    reads, the video analogue of :func:`parse_mp3_headers`."""

    def walk(data: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size = struct.unpack_from(">I", data, pos)[0]
            typ = data[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    raise ValueError("truncated MP4 largesize box")
                size = struct.unpack_from(">Q", data, pos + 8)[0]
                hdr = 16
            elif size == 0:  # box extends to end of file
                size = end - pos
            if size < hdr or pos + size > end:
                raise ValueError("bad MP4 box size")
            yield typ, pos + hdr, pos + size
            pos += size

    if len(payload) < 12:
        raise ValueError("not an MP4 (too short)")
    top = list(walk(payload, 0, len(payload)))
    if not any(t == b"ftyp" for t, _, _ in top):
        raise ValueError("not an MP4 (no ftyp)")
    moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
    if moov is None:
        raise ValueError("MP4 missing moov")
    timescale = duration = None
    n_tracks = 0
    width = height = None
    unknown_duration = False
    for typ, s, e in walk(payload, moov[0], moov[1]):
        if typ == b"mvhd":
            # bound every read by THIS box's extent — a short/lying
            # mvhd must fail loudly, not read the next sibling's bytes
            # as timescale/duration
            if e - s < 1:
                raise ValueError("empty MP4 mvhd box")
            ver = payload[s]
            if ver == 1:
                if e - s < 32:
                    raise ValueError("truncated MP4 mvhd (v1)")
                timescale = struct.unpack_from(">I", payload, s + 20)[0]
                duration = struct.unpack_from(">Q", payload, s + 24)[0]
                unknown_duration = duration == 0xFFFFFFFFFFFFFFFF
            else:
                if e - s < 20:
                    raise ValueError("truncated MP4 mvhd (v0)")
                timescale = struct.unpack_from(">I", payload, s + 12)[0]
                duration = struct.unpack_from(">I", payload, s + 16)[0]
                unknown_duration = duration == 0xFFFFFFFF
        elif typ == b"trak":
            n_tracks += 1
            for t2, s2, e2 in walk(payload, s, e):
                if t2 == b"tkhd" and width is None:
                    if e2 - s2 < 1:
                        continue
                    ver = payload[s2]
                    # v0: 4 ver/flags + 4+4 times + 4 id + 4 rsvd +
                    # 4 dur + 8 rsvd + 2+2+2+2 layer/group/vol/rsvd +
                    # 36 matrix = 76; v1's three 8-byte times add 12
                    off = s2 + (88 if ver == 1 else 76)
                    if off + 8 <= e2:
                        w_fx, h_fx = struct.unpack_from(">II", payload, off)
                        if w_fx and h_fx:  # audio tracks carry 0x0
                            width = w_fx >> 16
                            height = h_fx >> 16
    if timescale is None or not timescale or duration is None:
        raise ValueError("MP4 missing mvhd timing")
    return {
        "media_type": "video/mp4",
        # the all-ones duration is ISO-BMFF's 'unknown' sentinel
        # (fragmented/live captures) — surface None, not a bogus number
        "duration_ms": (
            None if unknown_duration else (duration * 1000) // timescale
        ),
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def _mp4_box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def synth_mp4(
    seed: int, n_tracks: int = 2, with_video_track: bool = True
) -> bytes:
    """Deterministic minimal ISO-BMFF container: real ftyp/moov/mvhd/
    trak/tkhd structure (the metadata the probe reads), mdat junk."""
    timescale = 1000
    duration = 2000 + (seed % 7) * 500
    mvhd = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", seed % 1000, seed % 1000)  # times
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80  # rate/volume/matrix/predefines/next-track
    )
    traks = b""
    for i in range(n_tracks):
        is_video = with_video_track and i == 0
        w = (320 + (seed % 5) * 16) if is_video else 0
        h = (240 + (seed % 3) * 16) if is_video else 0
        tkhd = (
            b"\x00\x00\x00\x07"
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", i + 1)  # track id
            + b"\x00" * 4
            + struct.pack(">I", duration)
            + b"\x00" * 52  # reserved/layer/volume/matrix
            + struct.pack(">II", w << 16, h << 16)
        )
        traks += _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd))
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + traks)
    mdat = _mp4_box(
        b"mdat", bytes(((seed * 13 + i) % 251) for i in range(64))
    )
    return _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + mdat


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        # LONG, not int: a v1 mvhd can legally carry durations past
        # 2^31 ms, and an int32 column would fail the whole Arrow batch
        # instead of isolating the row
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def video_feature_row(media_id: int, payload: Optional[bytes]) -> dict:
    try:
        v = parse_mp4_boxes(payload or b"")
    except (ValueError, struct.error, IndexError):
        return {
            "media_id": media_id,
            "media_type": "unsupported",
            "duration_ms": None,
            "n_tracks": None,
            "width": None,
            "height": None,
        }
    return {"media_id": media_id, **v}


def _video_features_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = [
            video_feature_row(mid, payload)
            for mid, payload in zip(
                pdf["media_id"].tolist(), pdf["payload"].tolist()
            )
        ]
        yield pd.DataFrame(rows, columns=VIDEO_FEATURES_SCHEMA.fieldNames())


def video_features(media_df: DataFrame) -> DataFrame:
    """``(media_id long, payload binary)`` -> container metadata rows:
    real ISO-BMFF box-walk probing (duration, track count, first visual
    track resolution); non-MP4 payloads isolate as 'unsupported'.
    Frame/sample DECODE stays with :func:`frame_samples` /
    :func:`decode_stub` — the honest boundary."""
    return media_df.select("media_id", "payload").mapInPandas(
        _video_features_batch, schema=VIDEO_FEATURES_SCHEMA
    )


def synth_media_payload(doc_id: int) -> bytes:
    """Deterministic mixed media corpus keyed by doc id: BMPs, PPMs,
    real PNGs (color type cycling gray/RGB/RGBA, filters cycling per
    row inside each), real baseline JPEGs (4:4:4 and 4:2:0 alternating,
    restart markers every third), real GIFs (interlace and
    local-palette variants), real TIFFs (gray/RGB x none/LZW/PackBits x
    byte order x predictor), and payloads that must become
    'unsupported' rows, not failures (truncated-JPEG junk, and a
    16-bit PNG that exercises the PNG profile gate)."""
    if doc_id % 41 == 0:
        return b"\xff\xd8\xff\xe0" + b"jpeg-truncated-junk"
    if doc_id % 31 == 0:
        from .jpegcodec import synth_jpeg

        k = doc_id // 31
        return synth_jpeg(
            doc_id,
            width=16 + (k % 3) * 4,
            height=12 + (k % 2) * 4,
            quality=85,
            subsample=bool(k % 2),
            restart_interval=2 if k % 3 == 0 else 0,
        )
    if doc_id % 37 == 0:
        # a structurally valid but out-of-profile PNG: 16-bit depth.
        # It carries a real IDAT so the decode reaches (and exercises)
        # the depth gate, not the missing-chunk check.
        import zlib as _z

        ihdr = struct.pack(">IIBBBBB", 2, 1, 16, 2, 0, 0, 0)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(b"\x00" * 13))
            + _png_chunk(b"IEND", b"")
        )
    if doc_id % 29 == 0:
        return synth_png(doc_id, color_type=(0, 2, 6)[(doc_id // 29) % 3])
    if doc_id % 43 == 0:
        k = doc_id // 43
        return synth_gif(
            doc_id,
            interlace=bool(k % 2),
            local_palette=bool(k % 3 == 0),
        )
    if doc_id % 53 == 0:
        k = doc_id // 53
        return synth_tiff(
            doc_id,
            gray=bool(k % 2),
            compression=(1, 5, 32773)[k % 3],
            big_endian=bool(k % 5 == 0),
            predictor=2 if k % 3 else 1,
        )
    if doc_id % 7 == 3:
        return synth_ppm(doc_id)
    return synth_bmp(doc_id)


def synth_audio_payload(doc_id: int) -> bytes:
    """Deterministic audio corpus: WAVs, real MP3 frame-header streams
    (metadata parses, PCM honestly absent), and junk that must isolate
    as 'unsupported'."""
    if doc_id % 47 == 0:
        return b"ID3\x04\x00compressed-mp3-not-decodable"
    if doc_id % 23 == 0:
        return synth_mp3(
            doc_id,
            n_frames=3 + doc_id % 4,
            with_id3=bool(doc_id % 2),
        )
    return synth_wav(doc_id, n_samples=400 + (doc_id % 5) * 100)


def decode_image(payload: bytes) -> dict:
    """Dispatch on magic bytes; real decode for uncompressed formats,
    honest ``NotImplementedError`` for compressed codecs."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] in (b"P6", b"P3"):
        return _decode_ppm(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(payload)
    if payload[:8] == _PNG_SIG:
        # stdlib decode unconditionally (never PIL, even when present):
        # the oracle math must be one implementation in every environment
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg

        # same rule as PNG: always the stdlib baseline decoder, so the
        # oracle math is one implementation everywhere; non-baseline
        # streams raise through its honest NotImplementedError gate
        return decode_jpeg(payload)
    raise ValueError("unknown image format")


def grayscale_thumb(img: dict, tw: int = 8, th: int = 8) -> bytes:
    """Deterministic nearest-neighbour resize to a ``tw x th`` grayscale
    thumbnail (integer BT.601 luma) — the 'resize' stage, exact math."""
    w, h, rows = img["width"], img["height"], img["rows"]
    out = bytearray()
    for ty in range(th):
        sy = (ty * h) // th
        for tx in range(tw):
            sx = (tx * w) // tw
            r, g, b = rows[sy][sx]
            out.append((r * 299 + g * 587 + b * 114) // 1000)
    return bytes(out)


def _inspect_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        texts = pdf["text"].tolist()
        n_bytes = []
        heads = []
        for t in texts:
            s = t if t is not None else ""
            n_bytes.append(len(s.encode("utf-8")))
            heads.append(hashlib.md5(s[:64].encode("utf-8")).hexdigest())
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].tolist(), "n_bytes": n_bytes, "head_hash": heads}
        )


def inspect_payloads(df: DataFrame) -> DataFrame:
    """Deterministic byte-level feature extraction over an opaque payload
    column — the vectorized-UDF plumbing the real decoders plug into.
    (Here the ``documents.text`` column stands in for the payload.)"""
    return df.select("doc_id", "text").mapInPandas(
        _inspect_batch, schema=INSPECT_SCHEMA
    )


# ---------------------------------------------------------------------------
# frame sampling / feature extraction over binary media columns
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

N_FRAMES = 4
FRAME_SIZE = 64


def _frame_sample_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per Arrow batch: emit ``N_FRAMES`` evenly spaced byte windows per
    payload — the exact batch shape a real video frame sampler has
    (1 input row -> N output rows, binary out, struct metadata), with the
    codec replaced by deterministic byte slicing."""
    for pdf in it:
        out = {k: [] for k in ("media_id", "frame_index", "frame_offset", "frame_bytes", "meta")}
        for mid, payload in zip(pdf["media_id"].tolist(), pdf["payload"].tolist()):
            data = payload or b""
            n = len(data)
            for k in range(N_FRAMES):
                offset = 0 if n == 0 else (k * max(n - FRAME_SIZE, 0)) // max(N_FRAMES - 1, 1)
                out["media_id"].append(mid)
                out["frame_index"].append(k)
                out["frame_offset"].append(offset)
                out["frame_bytes"].append(data[offset : offset + FRAME_SIZE])
                out["meta"].append(
                    {"media_type": "binary/fake", "width": None, "height": None, "duration_ms": n}
                )
        yield pd.DataFrame(out)


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("thumb_hash", T.StringType()),
    ]
)


def image_feature_row(media_id: int, payload: Optional[bytes]) -> dict:
    """Decode one payload into its feature row (pure function; failures
    and compressed codecs become 'unsupported' rows, never exceptions —
    per-row isolation, same contract as the text extractor)."""
    try:
        img = decode_image(payload or b"")
    except (ValueError, NotImplementedError, IndexError, struct.error):
        return {
            "media_id": media_id,
            "media_type": "unsupported",
            "width": None,
            "height": None,
            "sum_r": None,
            "sum_g": None,
            "sum_b": None,
            "thumb_hash": None,
        }
    sr = sg = sb = 0
    for row in img["rows"]:
        for r, g, b in row:
            sr += r
            sg += g
            sb += b
    return {
        "media_id": media_id,
        "media_type": img["media_type"],
        "width": img["width"],
        "height": img["height"],
        "sum_r": sr,
        "sum_g": sg,
        "sum_b": sb,
        "thumb_hash": hashlib.md5(grayscale_thumb(img)).hexdigest(),
    }


def _image_features_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = [
            image_feature_row(mid, payload)
            for mid, payload in zip(pdf["media_id"].tolist(), pdf["payload"].tolist())
        ]
        yield pd.DataFrame(rows, columns=IMAGE_FEATURES_SCHEMA.fieldNames())


def image_features(media_df: DataFrame) -> DataFrame:
    """``(media_id long, payload binary)`` -> decoded image feature rows.

    Real decode (BMP/PPM/PNG) + exact integer channel sums + md5 of the
    deterministic grayscale thumbnail; all math is integer so a DuckDB /
    pure-Python oracle reproduces it bit-for-bit.
    """
    return media_df.select("media_id", "payload").mapInPandas(
        _image_features_batch, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def audio_feature_row(media_id: int, payload: Optional[bytes]) -> dict:
    p = payload or b""
    try:
        if p[:3] == b"ID3" or (
            len(p) >= 2 and p[0] == 0xFF and (p[1] & 0xE0) == 0xE0
        ):
            a = parse_mp3_headers(p)
        else:
            a = decode_wav(p)
    except (ValueError, NotImplementedError, struct.error, IndexError):
        return {
            "media_id": media_id,
            "media_type": "unsupported",
            "sample_rate": None,
            "channels": None,
            "duration_ms": None,
            "energy": None,
            "n_samples": None,
        }
    return {"media_id": media_id, **{k: a[k] for k in (
        "media_type", "sample_rate", "channels", "duration_ms", "energy", "n_samples"
    )}}


def _audio_features_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = [
            audio_feature_row(mid, payload)
            for mid, payload in zip(pdf["media_id"].tolist(), pdf["payload"].tolist())
        ]
        yield pd.DataFrame(rows, columns=AUDIO_FEATURES_SCHEMA.fieldNames())


def audio_features(media_df: DataFrame) -> DataFrame:
    """``(media_id long, payload binary)`` -> audio feature rows: real
    stdlib RIFF/WAV PCM decode (exact integer energy), real MPEG-1
    Layer III frame-header metadata (`parse_mp3_headers` — rate/
    channels/duration with energy honestly None), everything else
    isolates as 'unsupported' rows."""
    return media_df.select("media_id", "payload").mapInPandas(
        _audio_features_batch, schema=AUDIO_FEATURES_SCHEMA
    )


def frame_samples(media_df: DataFrame) -> DataFrame:
    """``(media_id long, payload binary)`` -> sampled frame rows.

    The real decoder would replace the slicing inside
    ``_frame_sample_batch`` (see :func:`decode_stub`); partitioning,
    schema, and the 1->N row fan-out are production-shaped.
    """
    return media_df.select("media_id", "payload").mapInPandas(
        _frame_sample_batch, schema=FRAME_SCHEMA
    )
