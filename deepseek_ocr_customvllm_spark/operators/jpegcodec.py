"""Baseline JPEG (ITU-T T.81 sequential DCT, Huffman) — stdlib-only
encode + decode for the multimodal pipeline.

Round 7 closed the PNG gap with a real decoder; this module closes the
JPEG one for the baseline profile, which is what the overwhelming
majority of crawled web images use:

- :func:`decode_jpeg`: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/EOI marker
  walk, Huffman entropy decode with byte-unstuffing and restart
  markers, dequantization, zigzag, separable float IDCT (level shift +
  clamp), nearest-neighbour chroma upsampling for subsampled scans,
  and JFIF YCbCr→RGB.  Returns the shared ``{width, height, rows}``
  contract of `operators.multimodal`.
- Out-of-profile streams — progressive (SOF2), arithmetic coding
  (SOF9+), 12-bit precision, hierarchical — raise
  ``NotImplementedError``: the same honest capability gate the PNG
  path uses, isolated to 'unsupported' feature rows upstream.
  Malformed streams raise ``ValueError``.
- :func:`synth_jpeg`: a deterministic ENCODER (forward DCT, the
  Annex K example quantization/Huffman tables, optional 4:2:0
  subsampling, byte stuffing, DRI/RSTn emission) used to give the
  decode path a real, reproducible corpus.  Encoder and decoder share
  only the constant tables — the transforms, entropy coder, and bit
  I/O are independent implementations in each direction, so the
  round-trip tests in ``tests/`` are a genuine inversion check, not a
  tautology (lossless-bound asserted with flat quant tables, where the
  only error source is FDCT/IDCT rounding).

Float arithmetic here is IEEE-deterministic (same result on every
host), and the driver-side oracle twin calls this same module, so the
`image_features` VALUES oracle stays bit-stable.

Pure Python and therefore ~ms per small image — the pipeline uses it
inside Arrow-batched `mapInPandas` on thumbnails/synthetic corpora; a
production deployment swaps in a native codec behind the identical
{width, height, rows} contract.
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Tuple

# ---------------------------------------------------------------------------
# shared constant tables (T.81 Annex K examples — public standard text)
# ---------------------------------------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)]
    for x in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7

#: Decode pixel budget: SOF dimensions are attacker-declared, and the
#: component planes (plus the pure-Python rows structure) are allocated
#: from them BEFORE any entropy data validates — without a cap a
#: ~300-byte payload declaring 65535x65535 drives 100+ GB of
#: allocation, and MemoryError/OOM-kill escapes the per-row isolation
#: net upstream (same bomb class the PNG decoder guards).  4M pixels is
#: far above any thumbnail/test corpus and keeps worst-case allocation
#: in the tens of MB; a production native codec swaps in behind the
#: same contract with its own limits.
PIXEL_BUDGET = 1 << 22


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _build_huffman_decode(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(code_length, code) -> symbol, per T.81 C.2 canonical assignment."""
    table: Dict[Tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffs to 0xFF; any other
    0xFFxx is a marker — exposed via ``marker`` and never consumed as
    bits."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None  # set when the reader runs into 0xFFxx

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                return False
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = 0xFF00 | nxt
                return False
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy segment truncated")
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_consume_marker(self) -> int:
        """Byte-align, return the pending marker (for RSTn handling)."""
        self.bitbuf = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet reached: scan forward for it
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = 0xFF00 | self.data[self.pos + 1]
                    break
                self.pos += 1
        if self.marker is None:
            raise ValueError("expected JPEG marker, hit end of data")
        m = self.marker
        self.pos += 2
        self.marker = None
        return m


def _decode_huffman(reader: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coeffs: List[int]) -> List[List[int]]:
    """Separable 2-D inverse DCT + level shift + clamp.

    Natural-order layout follows the standard: index ``v*8 + u`` with
    ``v`` the VERTICAL frequency (pairs with pixel row ``y``) and ``u``
    the horizontal one — externally produced JPEGs decode un-transposed
    and our emitted streams are standard-compliant.

    Genuinely separable (two 1-D passes, ~4x fewer multiplies than the
    direct double sum — this is the codec's hottest loop)."""
    # pass 1: inverse over the horizontal frequency u, per frequency row
    tmp = []
    for v in range(8):
        base = v * 8
        trow = []
        for x in range(8):
            s = 0.0
            cx = _COS[x]
            for u in range(8):
                c = coeffs[base + u]
                if c:
                    s += _C[u] * cx[u] * c
            trow.append(s)
        tmp.append(trow)
    # pass 2: inverse over the vertical frequency v, per pixel column
    out = []
    for y in range(8):
        cy = _COS[y]
        row = []
        for x in range(8):
            s = 0.0
            for v in range(8):
                t = tmp[v][x]
                if t:
                    s += _C[v] * cy[v] * t
            val = int(round(s / 4.0)) + 128
            row.append(0 if val < 0 else 255 if val > 255 else val)
        out.append(row)
    return out


def decode_jpeg(payload: bytes) -> dict:
    """Baseline sequential JPEG -> ``{media_type, width, height, rows}``
    (rows of (r, g, b) tuples, top-down).  See the module docstring for
    profile and gates."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    n = len(payload)
    qtables: Dict[int, List[int]] = {}
    huff_dc: Dict[int, Dict[Tuple[int, int], int]] = {}
    huff_ac: Dict[int, Dict[Tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0

    while True:
        if pos + 4 > n:
            raise ValueError("truncated JPEG (no SOS)")
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # the marker code — skip them instead of misreading a fill
        # byte as marker id 0xFF
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            raise ValueError("truncated JPEG (fill bytes to EOF)")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM/RSTn: no length
            continue
        if marker == 0xD9:  # EOI is lengthless: reaching it pre-SOS is fatal
            raise ValueError("JPEG EOI before scan data")
        if marker == 0x00:
            raise ValueError("bad JPEG marker code 0x00")
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack_from(">H", payload, pos)[0]
        if seglen < 2 or pos + seglen > n:
            raise ValueError("bad JPEG segment length")
        seg = payload[pos + 2 : pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                if p + 64 > len(seg):
                    raise ValueError("truncated DQT")
                zz = list(seg[p : p + 64])
                p += 64
                nat = [0] * 64
                for i, z in enumerate(ZIGZAG):
                    nat[z] = zz[i]
                qtables[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if p + 16 > len(seg):
                    raise ValueError("truncated DHT")
                bits = list(seg[p : p + 16])
                p += 16
                nvals = sum(bits)
                if p + nvals > len(seg):
                    raise ValueError("truncated DHT values")
                vals = list(seg[p : p + nvals])
                p += nvals
                table = _build_huffman_decode(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = table
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline(+ext seq)
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            h, w = struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if w == 0 or h == 0 or ncomp not in (1, 3):
                raise ValueError("unsupported JPEG frame geometry")
            if w * h > PIXEL_BUDGET:
                raise ValueError(
                    f"JPEG dimensions {w}x{h} exceed the decode pixel "
                    f"budget ({PIXEL_BUDGET})"
                )
            comps = []
            for i in range(ncomp):
                cid = seg[6 + 3 * i]
                hv = seg[7 + 3 * i]
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 4) or not (1 <= cv <= 4):
                    # 0 would divide-by-zero the upsampler; >4 is
                    # out of spec
                    raise ValueError(
                        f"bad JPEG sampling factors {ch}x{cv}"
                    )
                comps.append(
                    {"id": cid, "h": ch, "v": cv, "tq": seg[8 + 3 * i]}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}: "
                "progressive/arithmetic/hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs = seg[1 + 2 * i]
                td_ta = seg[2 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append((comp, td_ta >> 4, td_ta & 0x0F))
            if len(scan) != len(frame["comps"]):
                raise NotImplementedError("multi-scan (non-interleaved) JPEG")
            if len(frame["comps"]) == 1:
                # T.81 A.2: a single-component scan is NON-interleaved —
                # one 8x8 data unit per MCU in the component's own block
                # raster; its declared sampling factors scale nothing
                # (there is no other component to scale against), so
                # normalize to 1x1 or an external grayscale JPEG with
                # h=v=2 would decode with scrambled MCU geometry
                frame = {
                    "w": frame["w"],
                    "h": frame["h"],
                    "comps": [dict(frame["comps"][0], h=1, v=1)],
                }
                scan = [(frame["comps"][0], scan[0][1], scan[0][2])]
            return _decode_scan(
                payload, pos, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skipped

    raise ValueError("unreachable")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list,
    qtables: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
) -> dict:
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component pixel planes at component resolution
    planes = []
    for c in comps:
        cw = mcux * 8 * c["h"]
        ch = mcuy * 8 * c["v"]
        planes.append([[0] * cw for _ in range(ch)])

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = reader.align_and_consume_marker()
                if not (0xFFD0 <= m <= 0xFFD7):
                    raise ValueError("expected JPEG restart marker")
                pred = [0] * len(comps)
            for ci, (comp, td, ta) in enumerate(scan):
                try:
                    dct = huff_dc[td]
                    act = huff_ac[ta]
                    qt = qtables[comp["tq"]]
                except KeyError:
                    raise ValueError("JPEG scan references missing table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = [0] * 64
                        t = _decode_huffman(reader, dct)
                        if t > 11:
                            raise ValueError("bad JPEG DC magnitude")
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci] * qt[0]
                        k = 1
                        while k < 64:
                            rs = _decode_huffman(reader, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            coeffs[ZIGZAG[k]] = (
                                _extend(reader.receive(s), s) * qt[ZIGZAG[k]]
                            )
                            k += 1
                        block = _idct_block(coeffs)
                        px = (mx * comp["h"] + bx) * 8
                        py = (my * comp["v"] + by) * 8
                        plane = planes[ci]
                        for yy in range(8):
                            row = plane[py + yy]
                            brow = block[yy]
                            row[px : px + 8] = brow
            mcu_count += 1

    # upsample to full resolution + color convert
    rows: List[List[Tuple[int, int, int]]] = []
    if len(comps) == 1:
        plane = planes[0]
        for y in range(h):
            rows.append([(v, v, v) for v in plane[y][:w]])
    else:
        for c in comps:
            if hmax % c["h"] or vmax % c["v"]:
                raise NotImplementedError(
                    "non-integer JPEG chroma sampling ratio"
                )
        yp, cbp, crp = planes
        ys_h = hmax // comps[0]["h"]
        ys_v = vmax // comps[0]["v"]
        cbs_h = hmax // comps[1]["h"]
        cbs_v = vmax // comps[1]["v"]
        crs_h = hmax // comps[2]["h"]
        crs_v = vmax // comps[2]["v"]
        for y in range(h):
            row = []
            yrow = yp[y // ys_v]
            cbrow = cbp[y // cbs_v]
            crrow = crp[y // crs_v]
            for x in range(w):
                Y = yrow[x // ys_h]
                Cb = cbrow[x // cbs_h] - 128
                Cr = crrow[x // crs_h] - 128
                r = int(round(Y + 1.402 * Cr))
                g = int(round(Y - 0.344136 * Cb - 0.714136 * Cr))
                b = int(round(Y + 1.772 * Cb))
                row.append(
                    (
                        0 if r < 0 else 255 if r > 255 else r,
                        0 if g < 0 else 255 if g > 255 else g,
                        0 if b < 0 else 255 if b > 255 else b,
                    )
                )
            rows.append(row)
    return {"media_type": "image/jpeg", "width": w, "height": h, "rows": rows}


# ---------------------------------------------------------------------------
# encoder (independent forward path — used to synthesize the test corpus)
# ---------------------------------------------------------------------------


def _build_huffman_encode(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length); the inverse orientation of the decode
    table, built independently (same canonical rule)."""
    table: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        # pad with 1-bits to a byte boundary (T.81 F.1.2.3)
        while self.nbits:
            self.write(1, 1)

    def marker(self, m: int) -> None:
        self.flush()
        self.out += bytes((0xFF, m))


def _fdct_block(block: List[List[int]]) -> List[float]:
    """Separable forward DCT over a level-shifted 8x8 block (natural
    order ``v*8 + u``, the standard layout — see :func:`_idct_block`).
    Two 1-D passes, like the inverse."""
    # pass 1: forward over x per pixel row -> t[y][u]
    tmp = []
    for y in range(8):
        row = block[y]
        trow = []
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += (row[x] - 128) * _COS[x][u]
            trow.append(s)
        tmp.append(trow)
    # pass 2: forward over y per horizontal frequency -> out[v*8+u]
    out = [0.0] * 64
    for v in range(8):
        cv = _C[v]
        for u in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y][u] * _COS[y][v]
            out[v * 8 + u] = s * cv * _C[u] / 4.0
    return out


def _magnitude(v: int) -> Tuple[int, int]:
    """value -> (category t, t-bit code) per T.81 F.1.2.1."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    if t == 0:
        return 0, 0
    return t, v if v >= 0 else v + (1 << t) - 1


def _scale_quant(table: List[int], quality: int) -> List[int]:
    """libjpeg-style linear quality scaling, clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for q in table:
        v = (q * scale + 50) // 100
        out.append(1 if v < 1 else 255 if v > 255 else v)
    return out


def encode_jpeg(
    rows: List[List[Tuple[int, int, int]]],
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode RGB rows as a baseline JFIF JPEG (Annex K tables scaled by
    ``quality``; ``subsample=True`` emits 4:2:0)."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    if w == 0 or h == 0:
        raise ValueError("empty image")
    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)

    # color convert to full-res planes
    yp = [[0] * w for _ in range(h)]
    cbp = [[0] * w for _ in range(h)]
    crp = [[0] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            r, g, b = rows[y][x]
            Y = 0.299 * r + 0.587 * g + 0.114 * b
            Cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
            Cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
            yp[y][x] = min(255, max(0, int(round(Y))))
            cbp[y][x] = min(255, max(0, int(round(Cb))))
            crp[y][x] = min(255, max(0, int(round(Cr))))

    if subsample:
        hy, vy = 2, 2
        # box-average chroma to half resolution
        cw, ch = (w + 1) // 2, (h + 1) // 2

        def _half(p):
            o = [[0] * cw for _ in range(ch)]
            for y2 in range(ch):
                for x2 in range(cw):
                    acc = cnt = 0
                    for dy in (0, 1):
                        for dx in (0, 1):
                            yy, xx = 2 * y2 + dy, 2 * x2 + dx
                            if yy < h and xx < w:
                                acc += p[yy][xx]
                                cnt += 1
                    o[y2][x2] = (acc + cnt // 2) // cnt
            return o

        cbp, crp = _half(cbp), _half(crp)
    else:
        hy, vy = 1, 1

    comps = [
        {"id": 1, "h": hy, "v": vy, "tq": 0, "plane": yp},
        {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cbp},
        {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": crp},
    ]
    hmax, vmax = hy, vy
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )  # APP0: version 1.1, aspect-ratio density 1x1, no thumbnail
    for tq, tbl in ((0, ql), (1, qc)):
        zz = bytes(tbl[ZIGZAG[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, h, w, 3)
    for c in comps:
        out += bytes((c["id"], (c["h"] << 4) | c["v"], c["tq"]))
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += (
            b"\xff\xc4"
            + struct.pack(">HB", 2 + 1 + 16 + len(vals), (tc << 4) | th)
            + bytes(bits)
            + bytes(vals)
        )
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    for c, td_ta in ((comps[0], 0x00), (comps[1], 0x11), (comps[2], 0x11)):
        out += bytes((c["id"], td_ta))
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl for sequential

    enc_dc = (
        _build_huffman_encode(DC_LUMA_BITS, DC_LUMA_VALS),
        _build_huffman_encode(DC_CHROMA_BITS, DC_CHROMA_VALS),
    )
    enc_ac = (
        _build_huffman_encode(AC_LUMA_BITS, AC_LUMA_VALS),
        _build_huffman_encode(AC_CHROMA_BITS, AC_CHROMA_VALS),
    )
    wtr = _BitWriter()
    pred = [0, 0, 0]
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.marker(0xD0 + rst)
                rst = (rst + 1) & 7
                pred = [0, 0, 0]
            for ci, c in enumerate(comps):
                plane = c["plane"]
                ph = len(plane)
                pw = len(plane[0])
                qt = ql if c["tq"] == 0 else qc
                dct_t = enc_dc[0 if ci == 0 else 1]
                act_t = enc_ac[0 if ci == 0 else 1]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        px = (mx * c["h"] + bx) * 8
                        py = (my * c["v"] + by) * 8
                        block = [
                            [
                                plane[min(py + yy, ph - 1)][min(px + xx, pw - 1)]
                                for xx in range(8)
                            ]
                            for yy in range(8)
                        ]
                        coeffs = _fdct_block(block)
                        q = [
                            int(round(coeffs[i] / qt[i])) for i in range(64)
                        ]
                        diff = q[0] - pred[ci]
                        pred[ci] = q[0]
                        t, code = _magnitude(diff)
                        hc, hl = dct_t[t]
                        wtr.write(hc, hl)
                        if t:
                            wtr.write(code, t)
                        # AC in zigzag order
                        run = 0
                        last_nz = 0
                        zz = [q[ZIGZAG[k]] for k in range(64)]
                        for k in range(63, 0, -1):
                            if zz[k]:
                                last_nz = k
                                break
                        for k in range(1, last_nz + 1):
                            v = zz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                hc, hl = act_t[0xF0]
                                wtr.write(hc, hl)
                                run -= 16
                            t, code = _magnitude(v)
                            hc, hl = act_t[(run << 4) | t]
                            wtr.write(hc, hl)
                            wtr.write(code, t)
                            run = 0
                        if last_nz < 63:
                            hc, hl = act_t[0x00]  # EOB
                            wtr.write(hc, hl)
            mcu_count += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def synth_jpeg(
    seed: int,
    width: int = 16,
    height: int = 16,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Deterministic JPEG corpus generator: a SMOOTH per-seed gradient
    (JPEG is a lossy transform codec — the synth pattern is low-
    frequency so the decoded image is visually the source; exactness is
    asserted by the round-trip tests at flat quant, not here)."""
    rows = []
    for y in range(height):
        row = []
        for x in range(width):
            r = (seed * 37 + x * 3 + y * 2) % 200 + 20
            g = (seed * 57 + x * 2 + y * 4) % 200 + 20
            b = (seed * 17 + x * 4 + y * 3) % 200 + 20
            row.append((r, g, b))
        rows.append(row)
    return encode_jpeg(
        rows,
        quality=quality,
        subsample=subsample,
        restart_interval=restart_interval,
    )
