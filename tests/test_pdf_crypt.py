"""Encrypted-PDF decryption: standard security handler, EMPTY password.

The write side (the encryptor in this file) implements the same public
ISO 32000 algorithms as the reader — Algorithm 3 for /O, Algorithms 4/5
for /U, per-object RC4/AES keys — so each fixture is a real
spec-conformant encrypted file, not a replay of the reader's own bytes.
The contract under test mirrors the reference's PyMuPDF behavior
(``app/utils/utils.py:70-102``): owner-password-only files (empty user
password) extract BYTE-IDENTICALLY to their unencrypted twins; files
that need a real password quarantine as FAILED-with-reason.
"""

import hashlib
import zlib

import pytest

from deepseek_ocr_customvllm_spark.extractor.engine import extract_document
from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
    _PAD,
    EncryptedPdfError,
    aes_cbc_encrypt,
    hash_2b,
    rc4,
)
from deepseek_ocr_customvllm_spark.extractor.pdf_extract import extract_pdf_pages

# ---------------------------------------------------------------------------
# write-side standard security handler (test fixture generator)
# ---------------------------------------------------------------------------

_ID0 = bytes(range(16))
_PERMS = -44  # print+extract denied: typical owner-locked document


def _md5(b: bytes) -> bytes:
    return hashlib.md5(b).digest()


def _algo3_o(user_pw: bytes, owner_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = _md5((owner_pw or user_pw) + _PAD[: 32 - len(owner_pw or user_pw)])
    if r >= 3:
        for _ in range(50):
            key = _md5(key[:n])
    key = key[:n]
    o = rc4(key, (user_pw + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def _algo2_key_w(user_pw: bytes, o: bytes, p: int, r: int, n: int) -> bytes:
    import struct

    h = hashlib.md5()
    h.update((user_pw + _PAD)[:32])
    h.update(o)
    h.update(struct.pack("<i", p))
    h.update(_ID0)
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = _md5(key[:n])
    return key[:n]


def _algo4_5_u(key: bytes, r: int) -> bytes:
    if r == 2:
        return rc4(key, _PAD)
    x = _md5(_PAD + _ID0)
    x = rc4(key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x + bytes(16)  # arbitrary 16-byte pad per spec


class _Cipher:
    """(enc dict body, per-object stream encryptor) for one variant."""

    def __init__(self, variant: str, user_pw: bytes = b""):
        self.variant = variant
        if variant == "rc4-40":
            r, v, n = 2, 1, 5
            extra = b""
        elif variant == "rc4-128":
            r, v, n = 3, 2, 16
            extra = b" /Length 128"
        elif variant in ("aes-128", "identity"):
            r, v, n = 4, 4, 16
            cfm = b"/AESV2" if variant == "aes-128" else b"/V2"
            stmf = b"/StdCF" if variant == "aes-128" else b"/Identity"
            extra = (
                b" /Length 128 /CF << /StdCF << /CFM " + cfm
                + b" /Length 16 >> >> /StmF " + stmf + b" /StrF " + stmf
            )
        elif variant == "aes-256":
            self._init_v5(user_pw)
            return
        else:
            raise AssertionError(variant)
        o = _algo3_o(user_pw, b"", r, n)
        key = _algo2_key_w(user_pw, o, _PERMS, r, n)
        u = _algo4_5_u(key, r)
        self.key = key
        self.enc_dict = (
            b"<< /Filter /Standard /V %d /R %d%s /O <%s> /U <%s> /P %d >>"
            % (v, r, extra, o.hex().encode(), u.hex().encode(), _PERMS)
        )

    def _init_v5(self, user_pw: bytes):
        file_key = bytes(range(100, 132))  # deterministic 32-byte file key
        vsalt, ksalt = b"VSALTusr", b"KSALTusr"
        u32 = hash_2b(user_pw, vsalt, b"")
        u = u32 + vsalt + ksalt
        ue = aes_cbc_encrypt(hash_2b(user_pw, ksalt, b""), bytes(16), file_key)
        ovsalt, oksalt = b"VSALTown", b"KSALTown"
        o32 = hash_2b(user_pw, ovsalt, u[:48])
        o = o32 + ovsalt + oksalt
        oe = aes_cbc_encrypt(hash_2b(user_pw, oksalt, u[:48]), bytes(16), file_key)
        self.key = file_key
        self.enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256"
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            b" /O <%s> /U <%s> /OE <%s> /UE <%s> /P %d >>"
            % (o.hex().encode(), u.hex().encode(), oe.hex().encode(),
               ue.hex().encode(), _PERMS)
        )

    def encrypt_stream(self, payload: bytes, num: int, gen: int) -> bytes:
        if self.variant == "identity":
            return payload  # /StmF /Identity: streams stay plaintext
        if self.variant == "aes-256":
            k, iv = self.key, _md5(b"iv%d" % num)
            pad = 16 - (len(payload) % 16)
            return iv + aes_cbc_encrypt(k, iv, payload + bytes([pad]) * pad)
        h = hashlib.md5()
        h.update(self.key)
        h.update(num.to_bytes(3, "little"))
        h.update(gen.to_bytes(2, "little"))
        if self.variant == "aes-128":
            h.update(b"sAlT")
        k = h.digest()[: min(len(self.key) + 5, 16)]
        if self.variant == "aes-128":
            iv = _md5(b"iv%d" % num)
            pad = 16 - (len(payload) % 16)
            return iv + aes_cbc_encrypt(k, iv, payload + bytes([pad]) * pad)
        return rc4(k, payload)


# ---------------------------------------------------------------------------
# fixture builder: same logical document, plain or encrypted
# ---------------------------------------------------------------------------

_TOUNICODE = (
    b"/CIDInit /ProcSet findresource begin 12 dict begin begincmap\n"
    b"1 begincodespacerange <00> <ff> endcodespacerange\n"
    b"2 beginbfchar <41> <0042> <42> <0041> endbfchar\n"
    b"endcmap end end"
)


def _build_doc(cipher=None, with_font_cmap=False):
    """A 2-page PDF (Flate-compressed content) built object by object;
    ``cipher`` encrypts every stream payload AFTER encoding (the spec's
    encode-then-encrypt order) and adds /Encrypt + /ID to the trailer."""

    def stream(num, raw, extra=b""):
        payload = zlib.compress(raw)
        if cipher is not None:
            payload = cipher.encrypt_stream(payload, num, 0)
        return (
            b"%d 0 obj\n<< /Length %d /Filter /FlateDecode%s >>\nstream\n"
            % (num, len(payload), extra)
            + payload
            + b"\nendstream\nendobj\n"
        )

    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    if with_font_cmap:
        font = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /ToUnicode 10 0 R >>"
        )
    pdf = b"%PDF-1.5\n"
    pdf += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    pdf += (
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2"
        b" /MediaBox [0 0 612 792] >>\nendobj\n"
    )
    for pnum, cref in ((3, 5), (4, 6)):
        pdf += (
            b"%d 0 obj\n<< /Type /Page /Parent 2 0 R /Contents %d 0 R"
            b" /Resources << /Font << /F1 9 0 R >> >> >>\nendobj\n" % (pnum, cref)
        )
    body1 = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (ABBA rocks) Tj ET"
    body2 = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (page two, owner-locked) Tj ET"
    pdf += stream(5, body1)
    pdf += stream(6, body2)
    pdf += b"9 0 obj\n" + font + b"\nendobj\n"
    if with_font_cmap:
        pdf += stream(10, _TOUNICODE)
    trailer_extra = b""
    n_objs = 11
    if cipher is not None:
        pdf += b"7 0 obj\n" + cipher.enc_dict + b"\nendobj\n"
        trailer_extra = b" /Encrypt 7 0 R /ID [<%s> <%s>]" % (
            _ID0.hex().encode(),
            _ID0.hex().encode(),
        )
    pdf += (
        b"trailer\n<< /Size %d /Root 1 0 R%s >>\nstartxref\n0\n%%%%EOF\n"
        % (n_objs, trailer_extra)
    )
    return pdf


_VARIANTS = ["rc4-40", "rc4-128", "aes-128", "aes-256", "identity"]


@pytest.mark.parametrize("variant", _VARIANTS)
def test_empty_password_extracts_byte_identically(variant):
    plain = _build_doc()
    enc = _build_doc(_Cipher(variant))
    assert enc != plain  # the fixture really is transformed
    expected = extract_pdf_pages(plain)
    assert expected == ["ABBA rocks", "page two, owner-locked"]
    assert extract_pdf_pages(enc) == expected


@pytest.mark.parametrize("variant", _VARIANTS)
def test_engine_success_row_matches_plain(variant):
    plain = _build_doc()
    enc = _build_doc(_Cipher(variant))
    r_plain = extract_document("https://ex.org/locked.pdf", plain)
    r_enc = extract_document("https://ex.org/locked.pdf", enc)
    assert r_enc.status == "SUCCESS"
    assert r_enc.markdown_raw == r_plain.markdown_raw
    assert r_enc.markdown == r_plain.markdown
    assert r_enc.n_pages == r_plain.n_pages == 2


@pytest.mark.parametrize("variant", ["rc4-40", "rc4-128", "aes-128", "aes-256"])
def test_real_user_password_quarantines(variant):
    enc = _build_doc(_Cipher(variant, user_pw=b"secret"))
    r = extract_document("https://ex.org/secret.pdf", enc)
    assert r.status == "FAILED"
    assert "encrypted" in (r.error or "")
    assert "password required" in (r.error or "")


def test_encrypted_tounicode_cmap_decodes():
    """The font's /ToUnicode CMap is itself an encrypted stream; the
    A<->B swap proves the cmap really decoded (not fallen back)."""
    plain = _build_doc(with_font_cmap=True)
    enc = _build_doc(_Cipher("aes-128"), with_font_cmap=True)
    expected = extract_pdf_pages(plain)
    assert expected[0] == "BAAB rocks"  # A<->B swapped by the cmap
    assert extract_pdf_pages(enc) == expected


def test_encrypted_objstm_members_extract():
    """Catalog/pages/font live in an ObjStm whose CONTAINER stream is
    encrypted; members must come out decrypted-by-container (spec
    §7.5.7: member objects are not re-encrypted)."""
    cipher = _Cipher("aes-128")

    def stream(num, raw, extra=b""):
        payload = cipher.encrypt_stream(zlib.compress(raw), num, 0)
        return (
            b"%d 0 obj\n<< /Length %d /Filter /FlateDecode%s >>\nstream\n"
            % (num, len(payload), extra)
            + payload
            + b"\nendstream\nendobj\n"
        )

    members = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R"
            b" /Resources << /Font << /F1 9 0 R >> >> >>"),
        (9, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    offsets, bodies, pos = [], b"", 0
    for num, body in members:
        offsets.append(b"%d %d" % (num, pos))
        bodies += body + b"\n"
        pos = len(bodies)
    header = b" ".join(offsets) + b"\n"
    objstm_raw = header + bodies

    pdf = b"%PDF-1.5\n"
    pdf += stream(
        8, objstm_raw,
        b" /Type /ObjStm /N %d /First %d" % (len(members), len(header)),
    )
    pdf += stream(5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (compressed+locked) Tj ET")
    pdf += b"7 0 obj\n" + cipher.enc_dict + b"\nendobj\n"
    pdf += (
        b"trailer\n<< /Size 10 /Root 1 0 R /Encrypt 7 0 R"
        b" /ID [<%s> <%s>] >>\nstartxref\n0\n%%%%EOF\n"
        % (_ID0.hex().encode(), _ID0.hex().encode())
    )
    assert extract_pdf_pages(pdf) == ["compressed+locked"]


def test_missing_encrypt_object_quarantines():
    """Trailer declares /Encrypt but the object is absent: FAILED with a
    reason, never an empty-SUCCESS row (the r3 behavior, preserved)."""
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"trailer\n<< /Size 9 /Root 1 0 R /Encrypt 7 0 R >>\n%%EOF\n"
    )
    r = extract_document("https://ex.org/broken.pdf", pdf)
    assert r.status == "FAILED"
    assert "encrypted" in (r.error or "")


def test_unsupported_handler_quarantines():
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"7 0 obj\n<< /Filter /FooSec /V 1 /R 2 /O <00> /U <00> >>\nendobj\n"
        b"trailer\n<< /Size 9 /Root 1 0 R /Encrypt 7 0 R >>\n%%EOF\n"
    )
    with pytest.raises(EncryptedPdfError):
        extract_pdf_pages(pdf)


def test_wrong_password_error_is_not_retried_as_plaintext():
    """A rejected file must NOT fall back to the byte-order scan (the
    streams are ciphertext — a fallback would emit garbage)."""
    enc = _build_doc(_Cipher("rc4-128", user_pw=b"secret"))
    with pytest.raises(EncryptedPdfError):
        extract_pdf_pages(enc)


def test_aes128_with_cf_level_byte_length_only():
    """Some writers put /Length only INSIDE /CF (16 = BYTES, not bits);
    the key must still derive as 128-bit (ranges are disjoint: bytes
    values <= 16, bits values >= 40)."""
    cipher = _Cipher("aes-128")
    assert b" /Length 128 " in cipher.enc_dict
    cipher.enc_dict = cipher.enc_dict.replace(b" /Length 128 ", b" ", 1)
    enc = _build_doc(cipher)
    assert extract_pdf_pages(enc) == ["ABBA rocks", "page two, owner-locked"]


def test_rc4_40_explicit_bits_length():
    """/Length 40 at the top level is BITS (the minimum legal bits value)
    and must not be misread as bytes."""
    cipher = _Cipher("rc4-40")
    cipher.enc_dict = cipher.enc_dict.replace(
        b" /O <", b" /Length 40 /O <", 1
    )
    enc = _build_doc(cipher)
    assert extract_pdf_pages(enc) == ["ABBA rocks", "page two, owner-locked"]


# ---------------------------------------------------------------------------
# known-answer tests: the primitives against PUBLISHED vectors (the
# fixture encryptor shares pdf_crypt's primitives, so round-trip tests
# alone could not catch a self-consistent-but-nonstandard implementation)
# ---------------------------------------------------------------------------


def test_aes_fips197_known_answers():
    from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
        _decrypt_block,
        _encrypt_block,
        _expand_key,
    )

    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    # FIPS-197 appendix C.1 (AES-128), C.2 (AES-192), C.3 (AES-256)
    vectors = [
        (bytes(range(16)), "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (bytes(range(24)), "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (bytes(range(32)), "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key, ct_hex in vectors:
        rks = _expand_key(key)
        ct = bytes(_encrypt_block(list(pt), rks))
        assert ct.hex() == ct_hex
        assert bytes(_decrypt_block(list(ct), rks)) == pt


def test_rc4_known_answers():
    # Published RC4 vectors (RFC 6229 lineage / original Usenet posting)
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert rc4(b"Secret", b"Attack at dawn").hex() == (
        "45a01f645fc35b383552544b9bf5"
    )


# ---------------------------------------------------------------------------
# review regressions (round-4 code-review findings)
# ---------------------------------------------------------------------------


def test_unsigned_p_value_authenticates():
    """Writers commonly emit /P as the unsigned 32-bit equivalent
    (4294963252 == -4044); key derivation must not crash and must hash
    the same 4 LE bytes, so the file still opens."""
    cipher = _Cipher("rc4-128")
    unsigned = _PERMS & 0xFFFFFFFF
    cipher.enc_dict = cipher.enc_dict.replace(
        b"/P %d" % _PERMS, b"/P %d" % unsigned
    )
    enc = _build_doc(cipher)
    assert extract_pdf_pages(enc) == ["ABBA rocks", "page two, owner-locked"]


def test_cfm_scoped_to_stmf_named_filter():
    """A file with TWO crypt filters (an RC4 one listed first, the
    AESV2 one that /StmF actually names) must dispatch on the NAMED
    entry, not the first /CFM in the dict."""
    cipher = _Cipher("aes-128")
    cipher.enc_dict = cipher.enc_dict.replace(
        b"/CF << /StdCF",
        b"/CF << /CryptA << /CFM /V2 /Length 16 >> /StdCF",
    )
    enc = _build_doc(cipher)
    assert extract_pdf_pages(enc) == ["ABBA rocks", "page two, owner-locked"]


def test_incremental_update_removing_encryption_wins():
    """An appended rewrite that supersedes every stream with plaintext
    and adds a new trailer WITHOUT /Encrypt must extract as plaintext —
    the stale /Encrypt of the superseded trailer is not consulted."""
    enc = _build_doc(_Cipher("rc4-128", user_pw=b"secret"))  # locked!
    update = b""
    for num, body in (
        (5, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (decrypted rewrite) Tj ET"),
        (6, b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (second page plain) Tj ET"),
    ):
        payload = zlib.compress(body)
        update += (
            b"%d 0 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
            % (num, len(payload))
            + payload
            + b"\nendstream\nendobj\n"
        )
    updated = enc + update + (
        b"trailer\n<< /Size 11 /Root 1 0 R /ID [<%s> <%s>] >>\n"
        b"startxref\n0\n%%%%EOF\n" % (_ID0.hex().encode(), _ID0.hex().encode())
    )
    assert extract_pdf_pages(updated) == [
        "decrypted rewrite", "second page plain",
    ]


def test_literal_string_line_continuation_unescapes_to_nothing():
    from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
        _unescape_pdf_string,
    )

    assert _unescape_pdf_string(b"ab\\\ncd") == b"abcd"
    assert _unescape_pdf_string(b"ab\\\r\ncd") == b"abcd"
    assert _unescape_pdf_string(b"ab\\\rcd") == b"abcd"


def test_encrypted_with_stray_trailer_bytes_still_quarantines():
    """A locked file whose structure is unusable must quarantine even if
    a stray 'trailer' byte-sequence appears later in the file — the
    encryption decision and the fallback guard share one trailer parse."""
    cipher = _Cipher("rc4-128", user_pw=b"secret")
    pdf = b"%PDF-1.5\n"
    pdf += b"7 0 obj\n" + cipher.enc_dict + b"\nendobj\n"
    pdf += (
        b"trailer\n<< /Size 9 /Root 1 0 R /Encrypt 7 0 R"
        b" /ID [<%s> <%s>] >>\nstartxref\n0\n%%%%EOF\n"
        % (_ID0.hex().encode(), _ID0.hex().encode())
    )
    # stray bytes AFTER the real trailer, mimicking binary that contains
    # the keyword but no /Encrypt — must not flip the decision
    pdf += b"garbage trailer garbage\n"
    r = extract_document("https://ex.org/stray.pdf", pdf)
    assert r.status == "FAILED"
    assert "encrypted" in (r.error or "")


def test_openssl_and_pure_python_aes_agree():
    """The libcrypto fast path must be byte-identical to the FIPS-197
    pure-Python implementation on every key size (skip-free: when
    libcrypto is absent _evp_cbc returns None and this test still pins
    the pure path against itself via the KATs above)."""
    import os as _os

    from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
        _decrypt_block,
        _encrypt_block,
        _evp_cbc,
        _expand_key,
    )

    rnd = bytes(range(256)) * 2  # deterministic 512-byte payload
    iv = bytes(range(16))
    for klen in (16, 24, 32):
        key = bytes(range(klen))
        rks = _expand_key(key)
        # pure-python CBC encrypt
        prev, ct = list(iv), bytearray()
        for base in range(0, len(rnd), 16):
            blk = [rnd[base + i] ^ prev[i] for i in range(16)]
            prev = _encrypt_block(blk, rks)
            ct += bytes(prev)
        fast_ct = _evp_cbc(key, iv, rnd, encrypt=True)
        fast_pt = _evp_cbc(key, iv, bytes(ct), encrypt=False)
        if fast_ct is None:
            continue  # no libcrypto in this environment: nothing to compare
        assert fast_ct == bytes(ct)
        assert fast_pt == rnd


def test_aes_stream_decrypt_throughput_is_not_pure_python_bound():
    """With libcrypto present, a 1 MiB AES stream must decrypt in well
    under a second (the pure-Python path alone costs ~3 s/MiB — a real
    cliff for corpora that contain encrypted PDFs)."""
    import time

    from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
        _OPENSSL,
        aes_cbc_decrypt,
    )

    if _OPENSSL is None:
        pytest.skip("libcrypto not available in this environment")
    data = bytes(1024) * 1024  # 1 MiB
    t0 = time.time()
    aes_cbc_decrypt(bytes(range(16)), bytes(16), data)
    assert time.time() - t0 < 1.0


def test_corrupt_startxref_encrypted_file_still_quarantines():
    """An encrypted xref-stream-style file (no `trailer` keyword) whose
    startxref offset is corrupted must still quarantine: the heuristic
    trailer regions find /Encrypt even when the chain is unparseable."""
    cipher = _Cipher("rc4-128", user_pw=b"secret")
    pdf = b"%PDF-1.6\ncapture-prefix garbage\n"
    pdf += b"7 0 obj\n" + cipher.enc_dict + b"\nendobj\n"
    # the /Encrypt-bearing dict lives in the tail; startxref points at a
    # bogus offset that maps to no object header
    pdf += (
        b"20 0 obj\n<< /Type /XRef /Size 9 /Root 1 0 R /Encrypt 7 0 R"
        b" /ID [<%s> <%s>] /Length 3 >>\nstream\nxyz\nendstream\nendobj\n"
        % (_ID0.hex().encode(), _ID0.hex().encode())
    )
    pdf += b"startxref\n5\n%%EOF\n"  # offset 5: mid-header garbage
    r = extract_document("https://ex.org/corrupt.pdf", pdf)
    assert r.status == "FAILED"
    assert "encrypted" in (r.error or "")


def test_literal_string_raw_eol_normalizes_to_lf():
    from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
        _unescape_pdf_string,
    )
    from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
        _unescape_literal,
    )

    for fn in (_unescape_pdf_string, _unescape_literal):
        assert fn(b"a\r\nb") == b"a\nb"
        assert fn(b"a\rb") == b"a\nb"
        assert fn(b"a\nb") == b"a\nb"


def test_unescape_implementations_agree_under_fuzz():
    """pdf_crypt._unescape_pdf_string and pdf_extract._unescape_literal
    implement the same spec clause (§7.3.4.2) independently — any
    divergence on arbitrary bytes is a bug in one of them."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
        _unescape_pdf_string,
    )
    from deepseek_ocr_customvllm_spark.extractor.pdf_extract import (
        _unescape_literal,
    )

    @given(
        st.binary(max_size=120).map(
            # bias toward the interesting alphabet: escapes, EOLs, octal
            lambda b: bytes(x % 0x90 for x in b)
        )
    )
    @settings(max_examples=400, deadline=None)
    def check(raw):
        assert _unescape_pdf_string(raw) == _unescape_literal(raw)

    check()


def test_nonzero_generation_number_object_key():
    """A content stream defined as `5 1 obj` must decrypt with gen=1 in
    its per-object key (Algorithm 1 hashes the generation number too)."""
    cipher = _Cipher("rc4-128")
    body = b"BT /F1 12 Tf 1 0 0 1 100 700 Tm (gen one) Tj ET"
    payload = cipher.encrypt_stream(zlib.compress(body), 5, 1)
    pdf = b"%PDF-1.5\n"
    pdf += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    pdf += (
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 612 792] >>\nendobj\n"
    )
    pdf += (
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 5 1 R"
        b" /Resources << /Font << /F1 9 0 R >> >> >>\nendobj\n"
    )
    pdf += (
        b"5 1 obj\n<< /Length %d /Filter /FlateDecode >>\nstream\n"
        % len(payload) + payload + b"\nendstream\nendobj\n"
    )
    pdf += (
        b"9 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
        b"\nendobj\n"
    )
    pdf += b"7 0 obj\n" + cipher.enc_dict + b"\nendobj\n"
    pdf += (
        b"trailer\n<< /Size 10 /Root 1 0 R /Encrypt 7 0 R"
        b" /ID [<%s> <%s>] >>\nstartxref\n0\n%%%%EOF\n"
        % (_ID0.hex().encode(), _ID0.hex().encode())
    )
    assert extract_pdf_pages(pdf) == ["gen one"]


# ---------------------------------------------------------------------------
# round-5 ADVICE regressions
# ---------------------------------------------------------------------------

class TestBalancedDictStrings:
    """_balanced_dict must treat <...> hex and (...) literal strings as
    opaque: their bytes are data, not dict delimiters (§7.3.4-7.3.5)."""

    def test_hex_string_abutting_dict_close(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
            _balanced_dict,
        )
        data = b"<< /X <AB>>>"
        assert _balanced_dict(data, 0) == data

    def test_nested_dict_with_abutting_hex(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
            _balanced_dict,
        )
        data = b"<< /StdCF << /X <AB>>>>>"
        assert _balanced_dict(data, 0) == data
        inner = _balanced_dict(data, data.index(b"<<", 2))
        assert inner == b"<< /X <AB>>>"

    def test_literal_string_with_delimiter_bytes(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
            _balanced_dict,
        )
        data = b"<< /S (a>>b<<c) /K 1 >>"
        assert _balanced_dict(data, 0) == data

    def test_literal_string_escaped_paren(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
            _balanced_dict,
        )
        data = rb"<< /S (x\)>>y) /K 1 >>"
        assert _balanced_dict(data, 0) == data

    def test_unterminated_hex_returns_none(self):
        from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
            _balanced_dict,
        )
        assert _balanced_dict(b"<< /X <AB", 0) is None

    def test_cfm_read_through_abutting_hex(self):
        """/CFM must resolve from a /CF whose StdCF entry carries a hex
        value whose '>' abuts the subdict close."""
        from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
            _crypt_filter_section,
            _name_of,
        )
        enc = (
            b"<< /Filter /Standard /V 4 /R 4"
            b" /CF << /StdCF << /CFM /AESV2 /Length 16 /X <AB>>>>>"
            b" /StmF /StdCF /StrF /StdCF >>"
        )
        section = _crypt_filter_section(enc, b"StdCF")
        assert section == b"<< /CFM /AESV2 /Length 16 /X <AB>>>"
        assert _name_of(section, b"CFM") == "AESV2"


def test_object_key_uses_low_order_bytes():
    """Algorithm 1 hashes the LOW-ORDER 3/2 bytes of num/gen: object
    numbers >= 2^24 must wrap, never raise OverflowError."""
    from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import (
        StandardDecryptor,
    )
    d = StandardDecryptor(bytes(range(16)), "rc4")
    big = d._object_key((1 << 24) + 5, (1 << 16) + 7)
    small = d._object_key(5, 7)
    assert big == small
    # and the decrypt path round-trips through the wrapped key
    from deepseek_ocr_customvllm_spark.extractor.pdf_crypt import rc4
    ct = rc4(small, b"payload bytes")
    assert d.decrypt_stream(ct, (1 << 24) + 5, (1 << 16) + 7) == b"payload bytes"
