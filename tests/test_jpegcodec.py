"""Baseline JPEG codec (`operators.jpegcodec`): genuine-inversion
round trips (encoder and decoder share only the constant tables),
profile gates, malformed isolation, and the multimodal wiring.

No Spark session here — the codec is pure Python; the Spark-side
plumbing is covered in test_spark_pipeline.py's image tests.
"""

import struct

import pytest

from deepseek_ocr_customvllm_spark.operators import jpegcodec as J
from deepseek_ocr_customvllm_spark.operators.multimodal import (
    decode_image,
    image_feature_row,
)


def _maxerr(rows_a, rows_b):
    return max(
        abs(a - b)
        for ra, rb in zip(rows_a, rows_b)
        for pa, pb in zip(ra, rb)
        for a, b in zip(pa, pb)
    )


def _gradient(w, h, seed=0):
    return [
        [
            (
                (seed * 37 + x * 3 + y * 2) % 200 + 20,
                (seed * 57 + x * 2 + y * 4) % 200 + 20,
                (seed * 17 + x * 4 + y * 3) % 200 + 20,
            )
            for x in range(w)
        ]
        for y in range(h)
    ]


class TestRoundTrip:
    def test_flat_color_is_near_lossless_at_flat_quant(self):
        # quality=100 scales every quant entry to 1: the only error
        # sources are FDCT/IDCT and color-convert rounding
        rows = [[(120, 64, 200)] * 16 for _ in range(16)]
        img = J.decode_jpeg(J.encode_jpeg(rows, quality=100))
        assert (img["width"], img["height"]) == (16, 16)
        assert img["media_type"] == "image/jpeg"
        assert _maxerr(rows, img["rows"]) <= 1

    def test_gradient_all_block_phases(self):
        # 24x17: partial MCUs on both axes; q=100 keeps the transform
        # round-trip within +-2 across every pixel
        rows = _gradient(24, 17)
        img = J.decode_jpeg(J.encode_jpeg(rows, quality=100))
        assert (img["width"], img["height"]) == (24, 17)
        assert _maxerr(rows, img["rows"]) <= 2

    def test_subsampled_with_restart_markers(self):
        # 4:2:0 + DRI/RSTn: lossy chroma, so assert dims + luma-level
        # closeness (the gradient is smooth; q=90 luma stays tight)
        rows = _gradient(20, 14, seed=7)
        img = J.decode_jpeg(
            J.encode_jpeg(rows, quality=90, subsample=True, restart_interval=2)
        )
        assert (img["width"], img["height"]) == (20, 14)

        def luma(rws):
            return [
                [(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in row]
                for row in rws
            ]

        la, lb = luma(rows), luma(img["rows"])
        err = max(
            abs(a - b) for ra, rb in zip(la, lb) for a, b in zip(ra, rb)
        )
        assert err <= 16, err

    def test_synth_deterministic(self):
        assert J.synth_jpeg(11) == J.synth_jpeg(11)
        assert J.synth_jpeg(11) != J.synth_jpeg(12)

    def test_grayscale_single_component_decodes(self):
        # hand-assemble a 1-component baseline stream from the codec's
        # own primitives: exercises the ncomp==1 decode path our
        # 3-component encoder never emits
        vals = [[(16 * ((x + y) % 2) + 100) for x in range(8)] for y in range(8)]
        wtr = J._BitWriter()
        dct = J._build_huffman_encode(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
        act = J._build_huffman_encode(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
        coeffs = J._fdct_block(vals)
        q = [int(round(coeffs[i])) for i in range(64)]  # quant all-1
        t, code = J._magnitude(q[0])
        hc, hl = dct[t]
        wtr.write(hc, hl)
        if t:
            wtr.write(code, t)
        zz = [q[J.ZIGZAG[k]] for k in range(64)]
        last = max((k for k in range(1, 64) if zz[k]), default=0)
        run = 0
        for k in range(1, last + 1):
            v = zz[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                hc, hl = act[0xF0]
                wtr.write(hc, hl)
                run -= 16
            t, code = J._magnitude(v)
            hc, hl = act[(run << 4) | t]
            wtr.write(hc, hl)
            wtr.write(code, t)
            run = 0
        if last < 63:
            hc, hl = act[0x00]
            wtr.write(hc, hl)
        wtr.flush()

        out = bytearray(b"\xff\xd8")
        qz = bytes(1 for _ in range(64))
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + qz
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        out += bytes((1, 0x11, 0))
        out += (
            b"\xff\xc4"
            + struct.pack(">HB", 2 + 1 + 16 + len(J.DC_LUMA_VALS), 0x00)
            + bytes(J.DC_LUMA_BITS)
            + bytes(J.DC_LUMA_VALS)
        )
        out += (
            b"\xff\xc4"
            + struct.pack(">HB", 2 + 1 + 16 + len(J.AC_LUMA_VALS), 0x10)
            + bytes(J.AC_LUMA_BITS)
            + bytes(J.AC_LUMA_VALS)
        )
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00))
        out += b"\x00\x3f\x00"
        out += wtr.out + b"\xff\xd9"

        img = J.decode_jpeg(bytes(out))
        assert (img["width"], img["height"]) == (8, 8)
        err = max(
            abs(img["rows"][y][x][0] - vals[y][x])
            for y in range(8)
            for x in range(8)
        )
        assert err <= 1, err
        # grayscale surfaces as (v, v, v)
        assert all(
            r == g == b for row in img["rows"] for r, g, b in row
        )
        # T.81 A.2: a single-component scan is NON-interleaved — its
        # declared sampling factors scale nothing.  The same stream
        # with the component declaring h=v=2 must decode identically
        # (review r7: interleaved geometry would scramble it).
        out2 = bytearray(out)
        sof_at = bytes(out2).index(b"\xff\xc0")
        assert out2[sof_at + 11] == 0x11
        out2[sof_at + 11] = 0x22
        img2 = J.decode_jpeg(bytes(out2))
        assert img2["rows"] == img["rows"]


class TestGatesAndMalformed:
    def test_profile_gates(self):
        sof = struct.pack(">HBHHB", 11, 8, 8, 8, 1) + bytes((1, 0x11, 0))
        for marker, err in (
            (0xC2, "progressive"),  # progressive
            (0xC9, "progressive"),  # arithmetic (same gate message class)
        ):
            p = b"\xff\xd8" + bytes((0xFF, marker)) + sof
            with pytest.raises(NotImplementedError):
                J.decode_jpeg(p)
        # 12-bit precision
        p12 = (
            b"\xff\xd8"
            + b"\xff\xc0"
            + struct.pack(">HBHHB", 11, 12, 8, 8, 1)
            + bytes((1, 0x11, 0))
        )
        with pytest.raises(NotImplementedError):
            J.decode_jpeg(p12)
        # 16-bit quant table
        pq = b"\xff\xd8" + b"\xff\xdb" + struct.pack(">HB", 3 + 128, 0x10)
        pq += bytes(128)
        with pytest.raises(NotImplementedError):
            J.decode_jpeg(pq)

    def test_malformed_raise_valueerror(self):
        good = J.synth_jpeg(3)
        for bad in (
            b"",
            b"PNG",
            b"\xff\xd8",
            b"\xff\xd8\xff\xee\x00\x04ab",  # APP segment then EOF
            good[:-10],  # torn entropy tail
            good[:40],  # torn header
        ):
            with pytest.raises((ValueError, NotImplementedError)):
                J.decode_jpeg(bad)

    def test_dimension_bomb_rejected_before_allocation(self):
        """A ~300-byte payload declaring huge SOF dimensions must fail
        at the budget check, never allocate attacker-sized planes
        (review r7: 16000x16000 drove 6+ GB before the entropy decode
        failed; MemoryError escapes per-row isolation)."""
        sof = struct.pack(">HBHHB", 17, 8, 16000, 16000, 3)
        sof += bytes((1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
        p = b"\xff\xd8" + b"\xff\xc0" + sof
        with pytest.raises(ValueError, match="pixel budget"):
            J.decode_jpeg(p)
        assert image_feature_row(1, p)["media_type"] == "unsupported"

    def test_zero_sampling_factor_rejected(self):
        """h=0 in a component must raise ValueError at SOF parse, not
        ZeroDivisionError in the upsampler (review r7, verified
        exploit)."""
        sof = struct.pack(">HBHHB", 17, 8, 8, 8, 3)
        sof += bytes((1, 0x01, 0, 2, 0x11, 1, 3, 0x11, 1))  # Y h=0,v=1
        p = b"\xff\xd8" + b"\xff\xc0" + sof
        with pytest.raises(ValueError, match="sampling"):
            J.decode_jpeg(p)
        assert image_feature_row(1, p)["media_type"] == "unsupported"

    def test_fill_bytes_before_marker_accepted(self):
        """T.81 B.1.1.2: 0xFF fill padding before a marker is legal and
        some encoders emit it — inject fills before DQT and SOS of a
        valid stream and the image must still decode identically."""
        good = J.synth_jpeg(5, 16, 12)
        ref = J.decode_jpeg(good)
        # insert two fill bytes before the first DQT marker
        i = good.index(b"\xff\xdb")
        padded = good[:i] + b"\xff\xff" + good[i:]
        img = J.decode_jpeg(padded)
        assert img["rows"] == ref["rows"]

    def test_feature_row_isolation(self):
        assert (
            image_feature_row(1, J.synth_jpeg(5)[:-10])["media_type"]
            == "unsupported"
        )
        row = image_feature_row(2, J.synth_jpeg(5))
        assert row["media_type"] == "image/jpeg"
        assert row["sum_r"] > 0 and row["thumb_hash"]


class TestMultimodalWiring:
    def test_decode_image_dispatches_jpeg(self):
        img = decode_image(J.synth_jpeg(9, 16, 12))
        assert img["media_type"] == "image/jpeg"
        assert (img["width"], img["height"]) == (16, 12)

    def test_corpus_plants_decode(self):
        from deepseek_ocr_customvllm_spark.operators.multimodal import (
            synth_media_payload,
        )

        # 31*k plants are real JPEGs (unless 41|doc or 37|doc or 29|doc
        # shadows them)
        seen = 0
        for doc_id in range(0, 2000, 31):
            if doc_id % 41 == 0 or doc_id % 37 == 0 or doc_id % 29 == 0:
                continue
            row = image_feature_row(doc_id, synth_media_payload(doc_id))
            assert row["media_type"] == "image/jpeg", doc_id
            seen += 1
        assert seen > 10
