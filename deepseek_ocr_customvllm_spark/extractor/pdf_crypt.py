"""Standard-security-handler PDF decryption (empty user password only).

The reference's PyMuPDF path (``app/utils/utils.py:70-102`` →
``fitz.open``) transparently decrypts PDFs protected by the *standard
security handler* when the user password is empty — a large fraction of
real-world "protected" files (owner-password-only documents).  This
module rebuilds that capability from the public spec alone
(ISO 32000-1 §7.6.2-7.6.4 / ISO 32000-2 §7.6.4) with stdlib crypto:

- RC4 (V 1/2, R 2/3; 40-128 bit keys) — Algorithm 2 key derivation,
  Algorithms 4/5 user-password verification, Algorithm 7 owner fallback
- AES-128-CBC (V 4 / R 4, crypt filter ``/AESV2``) — same key schedule
  plus the ``sAlT`` per-object suffix, 16-byte IV prefix, PKCS#7 pad
- AES-256-CBC (V 5 / R 5-6, ``/AESV3``) — SHA-256 validation (R5) and
  the iterated Algorithm 2.B hash (R6); the file key decrypts ``/UE``
  (or ``/OE`` via the owner path)

Only the EMPTY password is attempted: a wrong/required password raises
:class:`EncryptedPdfError`, which the engine turns into a quarantined
FAILED row (``extractor/engine.py``) — matching the reference, which
errors on files PyMuPDF cannot open without credentials.

AES is implemented from FIPS 197 directly (S-box generated from the
GF(2^8) inverse + affine transform) because the runtime has no
``cryptography``/``pycryptodome``; it only ever sees 16-byte-aligned
PDF payloads, so the pure-Python cost is a few µs per block and the
hot path stays in zlib afterwards.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Callable, Dict, List, Optional, Tuple


class EncryptedPdfError(ValueError):
    """Encrypted PDF that cannot be decrypted with the empty password."""


# ---------------------------------------------------------------------------
# RC4 (public domain algorithm; spec §7.6.2 note 2)
# ---------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES (FIPS 197) — encrypt needed only by the R6 Algorithm-2.B KDF
# ---------------------------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _build_tables() -> Tuple[List[int], List[int], List[int], List[int]]:
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= _xtime(x)  # multiply by generator 3
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    sbox = [0] * 256
    inv_sbox = [0] * 256
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        s = inv
        for shift in (1, 2, 3, 4):
            s ^= ((inv << shift) | (inv >> (8 - shift))) & 0xFF
        s ^= 0x63
        sbox[i] = s & 0xFF
        inv_sbox[s & 0xFF] = i
    return exp, log, sbox, inv_sbox


_EXP, _LOG, _SBOX, _INV_SBOX = _build_tables()


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _expand_key(key: bytes) -> List[List[int]]:
    """Round keys as flat 16-int lists, index = row + 4*col."""
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _xtime(rcon)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([words[i - nk][j] ^ t[j] for j in range(4)])
    return [
        [words[4 * r + c][j] for c in range(4) for j in range(4)]
        for r in range(nr + 1)
    ]
    # NOTE: round key layout must match the state layout below: state[i]
    # holds input byte i, i.e. column-major s[r][c] = state[r + 4c] with
    # i = r + 4c — words are columns, so word c bytes land at 4c..4c+3.


def _encrypt_block(state: List[int], rks: List[List[int]]) -> List[int]:
    nr = len(rks) - 1
    s = [state[i] ^ rks[0][i] for i in range(16)]
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows: row r rotates left by r; with i = r + 4c:
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd < nr:
            t = [0] * 16
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c : c + 4]
                t[c] = _gmul(2, a0) ^ _gmul(3, a1) ^ a2 ^ a3
                t[c + 1] = a0 ^ _gmul(2, a1) ^ _gmul(3, a2) ^ a3
                t[c + 2] = a0 ^ a1 ^ _gmul(2, a2) ^ _gmul(3, a3)
                t[c + 3] = _gmul(3, a0) ^ a1 ^ a2 ^ _gmul(2, a3)
            s = t
        s = [s[i] ^ rks[rnd][i] for i in range(16)]
    return s


def _decrypt_block(state: List[int], rks: List[List[int]]) -> List[int]:
    nr = len(rks) - 1
    s = [state[i] ^ rks[nr][i] for i in range(16)]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows: row r rotates right by r
        s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        s = [s[i] ^ rks[rnd][i] for i in range(16)]
        if rnd > 0:
            t = [0] * 16
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c : c + 4]
                t[c] = _gmul(14, a0) ^ _gmul(11, a1) ^ _gmul(13, a2) ^ _gmul(9, a3)
                t[c + 1] = _gmul(9, a0) ^ _gmul(14, a1) ^ _gmul(11, a2) ^ _gmul(13, a3)
                t[c + 2] = _gmul(13, a0) ^ _gmul(9, a1) ^ _gmul(14, a2) ^ _gmul(11, a3)
                t[c + 3] = _gmul(11, a0) ^ _gmul(13, a1) ^ _gmul(9, a2) ^ _gmul(14, a3)
            s = t
    return s


def _load_openssl():
    """OpenSSL EVP via ctypes, or None.  The pure-Python AES below is
    exact but ~50 µs/block — a 1 MB AES-encrypted PDF would cost ~3 s,
    a real throughput cliff for an extraction job that meets encrypted
    documents at corpus scale.  libcrypto does the same CBC in ~1 ms/MB;
    equivalence is pinned by a test that runs both paths."""
    try:
        import ctypes
        import ctypes.util
        import sys

        # versioned sonames only, tried first: on macOS the UNVERSIONED
        # /usr/lib/libcrypto.dylib is a system stub that calls abort()
        # when dlopen'd — a SIGABRT no try/except can catch — so the
        # find_library fallback is skipped on darwin entirely
        lib = None
        for cand in ("libcrypto.so.3", "libcrypto.so.1.1",
                     "libcrypto.3.dylib", "libcrypto.1.1.dylib"):
            try:
                lib = ctypes.CDLL(cand)
                break
            except OSError:
                continue
        if lib is None:
            if sys.platform == "darwin":
                return None
            name = ctypes.util.find_library("crypto")
            if not name:
                return None
            lib = ctypes.CDLL(name)
        needed = (
            "EVP_CIPHER_CTX_new", "EVP_CIPHER_CTX_free",
            "EVP_EncryptInit_ex", "EVP_DecryptInit_ex",
            "EVP_EncryptUpdate", "EVP_DecryptUpdate",
            "EVP_CIPHER_CTX_set_padding",
            "EVP_aes_128_cbc", "EVP_aes_192_cbc", "EVP_aes_256_cbc",
        )
        for fn in needed:
            if not hasattr(lib, fn):
                return None
        # restypes matter on 64-bit: the default c_int would truncate
        # the context/cipher pointers
        lib.EVP_CIPHER_CTX_new.restype = ctypes.c_void_p
        for fn in ("EVP_aes_128_cbc", "EVP_aes_192_cbc", "EVP_aes_256_cbc"):
            getattr(lib, fn).restype = ctypes.c_void_p
        lib.EVP_CIPHER_CTX_free.argtypes = [ctypes.c_void_p]
        for fn in ("EVP_EncryptInit_ex", "EVP_DecryptInit_ex"):
            getattr(lib, fn).argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_char_p, ctypes.c_char_p,
            ]
        for fn in ("EVP_EncryptUpdate", "EVP_DecryptUpdate"):
            getattr(lib, fn).argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int,
            ]
        lib.EVP_CIPHER_CTX_set_padding.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
        ]
        return lib
    except Exception:  # noqa: BLE001 — any load failure: pure-Python path
        return None


_OPENSSL = _load_openssl()


def _evp_cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> Optional[bytes]:
    """AES-CBC via OpenSSL EVP, padding off (callers manage PKCS#7).
    ``data`` must be block-aligned.  Returns None on any EVP failure so
    the caller falls back to the pure-Python implementation."""
    if _OPENSSL is None or len(data) % 16:
        return None
    import ctypes

    cipher_fn = {
        16: _OPENSSL.EVP_aes_128_cbc,
        24: _OPENSSL.EVP_aes_192_cbc,
        32: _OPENSSL.EVP_aes_256_cbc,
    }.get(len(key))
    if cipher_fn is None:
        return None
    ctx = _OPENSSL.EVP_CIPHER_CTX_new()
    if not ctx:
        return None
    try:
        init = (
            _OPENSSL.EVP_EncryptInit_ex if encrypt
            else _OPENSSL.EVP_DecryptInit_ex
        )
        if init(ctx, cipher_fn(), None, key, iv) != 1:
            return None
        _OPENSSL.EVP_CIPHER_CTX_set_padding(ctx, 0)
        out = ctypes.create_string_buffer(len(data) + 16)
        outl = ctypes.c_int(0)
        update = (
            _OPENSSL.EVP_EncryptUpdate if encrypt
            else _OPENSSL.EVP_DecryptUpdate
        )
        if update(ctx, out, ctypes.byref(outl), data, len(data)) != 1:
            return None
        return out.raw[: outl.value]
    finally:
        _OPENSSL.EVP_CIPHER_CTX_free(ctx)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """No padding — callers supply block-aligned input (the 2.B KDF does)."""
    fast = _evp_cbc(key, iv, data, encrypt=True)
    if fast is not None:
        return fast
    rks = _expand_key(key)
    prev = list(iv)
    out = bytearray()
    for base in range(0, len(data), 16):
        blk = [data[base + i] ^ prev[i] for i in range(16)]
        prev = _encrypt_block(blk, rks)
        out += bytes(prev)
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """No padding removal (see :func:`aes_cbc_decrypt_padded`)."""
    aligned = data[: len(data) - (len(data) % 16)]
    fast = _evp_cbc(key, iv, aligned, encrypt=False)
    if fast is not None:
        return fast
    rks = _expand_key(key)
    prev = list(iv)
    out = bytearray()
    for base in range(0, len(aligned), 16):
        blk = list(aligned[base : base + 16])
        plain = _decrypt_block(blk, rks)
        out += bytes(p ^ c for p, c in zip(plain, prev))
        prev = blk
    return bytes(out)


def aes_cbc_decrypt_padded(key: bytes, payload: bytes) -> bytes:
    """PDF AES stream layout (§7.6.2): 16-byte IV prefix, PKCS#7 pad."""
    if len(payload) < 32:
        return b""  # too short to hold IV + one block
    plain = aes_cbc_decrypt(key, payload[:16], payload[16:])
    if not plain:
        return plain
    pad = plain[-1]
    if 1 <= pad <= 16 and plain[-pad:] == bytes([pad]) * pad:
        return plain[:-pad]
    return plain  # lenient: malformed pad passes through (caller's zlib will judge)


# ---------------------------------------------------------------------------
# Standard security handler (§7.6.3)
# ---------------------------------------------------------------------------

# Algorithm 2 padding string (spec table "Password padding").
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)

_INT_RE = {
    name: re.compile(rb"/" + name + rb"\s+([+-]?\d+)")
    for name in (b"V", b"R", b"P", b"Length")
}
_STR_RE = re.compile(rb"/(O|U|OE|UE)\s*(?:\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]+)>)")
_NAME_RE = {
    name: re.compile(rb"/" + name + rb"\s*/(\w+)")
    for name in (b"Filter", b"StmF", b"StrF", b"CFM")
}
_ENCMETA_RE = re.compile(rb"/EncryptMetadata\s+(true|false)")


def _unescape_pdf_string(raw: bytes) -> bytes:
    """Minimal literal-string unescape for O/U entries (octal + specials)."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c == 0x5C and i + 1 < n:
            nxt = raw[i + 1]
            simple = {
                ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8,
                ord("f"): 12, ord("("): 40, ord(")"): 41, ord("\\"): 92,
            }
            if nxt in simple:
                out.append(simple[nxt])
                i += 2
                continue
            if nxt in (0x0A, 0x0D):  # backslash-EOL: line continuation,
                i += 2               # produces NO bytes (spec §7.3.4.2)
                if nxt == 0x0D and i < n and raw[i] == 0x0A:
                    i += 1
                continue
            if 0x30 <= nxt <= 0x37:
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    digits += bytes([raw[j]])
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            out.append(nxt)
            i += 2
            continue
        if c == 0x0D:  # un-escaped EOL reads as a single LF (§7.3.4.2)
            out.append(0x0A)
            i += 1
            if i < n and raw[i] == 0x0A:
                i += 1
            continue
        out.append(c)
        i += 1
    return bytes(out)


def _pw_string(enc_dict: bytes, which: bytes) -> Optional[bytes]:
    for m in _STR_RE.finditer(enc_dict):
        if m.group(1) == which:
            if m.group(2) is not None:
                return _unescape_pdf_string(m.group(2))
            hexs = re.sub(rb"\s", b"", m.group(3))
            if len(hexs) % 2:
                hexs += b"0"
            return bytes.fromhex(hexs.decode("ascii"))
    return None


def _int_of(enc_dict: bytes, name: bytes, default: int) -> int:
    m = _INT_RE[name].search(enc_dict)
    return int(m.group(1)) if m else default


def _name_of(section: bytes, name: bytes) -> Optional[str]:
    m = _NAME_RE[name].search(section)
    return m.group(1).decode("latin-1") if m else None


def _balanced_dict(data: bytes, open_pos: int) -> Optional[bytes]:
    """The ``<<...>>`` slice whose ``<<`` starts at ``open_pos``.

    Hex strings ``<...>`` and literal strings ``(...)`` are skipped
    wholesale: a hex string whose closing ``>`` abuts the dict close
    (``/X <AB>>>``) must not decrement depth early, and a literal
    string may contain ``<<``/``>>`` bytes that are data, not
    delimiters (§7.3.4-7.3.5)."""
    depth = 0
    i = open_pos
    n = len(data)
    while i < n:
        pair = data[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[open_pos:i]
        elif data[i : i + 1] == b"<":  # hex string: skip to its '>'
            end = data.find(b">", i + 1)
            if end < 0:
                return None
            i = end + 1
        elif data[i : i + 1] == b"(":  # literal string: balanced + escapes
            pdepth = 1
            i += 1
            while i < n and pdepth:
                c = data[i : i + 1]
                if c == b"\\":
                    i += 2
                    continue
                if c == b"(":
                    pdepth += 1
                elif c == b")":
                    pdepth -= 1
                i += 1
            if pdepth:
                return None
        else:
            i += 1
    return None


def _crypt_filter_section(enc_dict: bytes, cf_name: bytes) -> Optional[bytes]:
    """The sub-dictionary of ``/CF << ... /<cf_name> << ... >> ... >>``
    that ``/StmF`` names — /CFM and the byte-valued /Length must be read
    from THERE, not from the first match anywhere (a file may carry
    several crypt filters, e.g. an extra embedded-file filter, §7.6.5)."""
    m = re.search(rb"/CF\s*<<", enc_dict)
    if not m:
        return None
    cf_dict = _balanced_dict(enc_dict, m.end() - 2)
    if cf_dict is None:
        return None
    em = re.search(rb"/" + re.escape(cf_name) + rb"\s*<<", cf_dict)
    if not em:
        return None
    return _balanced_dict(cf_dict, em.end() - 2)


def _algo2_key(
    password: bytes, o: bytes, p: int, id0: bytes, r: int, n: int,
    encrypt_metadata: bool,
) -> bytes:
    """Algorithm 2: the file encryption key for R 2-4."""
    h = hashlib.md5()
    h.update((password + _PAD)[:32])
    h.update(o[:32])
    # /P is signed 32-bit per spec, but real writers emit the unsigned
    # equivalent (e.g. 4294963392 for -3904); both must hash to the same
    # 4 little-endian bytes, so mask instead of packing signed
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def _algo4_5_user_check(key: bytes, u: bytes, id0: bytes, r: int) -> bool:
    """Algorithms 4 (R2) / 5 (R≥3): does ``key`` reproduce /U?"""
    if r == 2:
        return rc4(key, _PAD) == u[:32]
    x = hashlib.md5(_PAD + id0).digest()
    x = rc4(key, x)
    for i in range(1, 20):
        x = rc4(bytes(b ^ i for b in key), x)
    return x[:16] == u[:16]


def _algo7_user_pw_from_owner(owner_pw: bytes, o: bytes, r: int, n: int) -> bytes:
    """Algorithm 7 (decryption side of Algorithm 3): recover the padded
    user password from /O with the owner password."""
    key = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    key = key[:n]
    data = o[:32]
    if r == 2:
        return rc4(key, data)
    for i in range(19, -1, -1):
        data = rc4(bytes(b ^ i for b in key), data)
    return data


def hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 iterated password hash."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class StandardDecryptor:
    """Bound to an authenticated file key; decrypts stream payloads.

    ``method`` is ``"rc4"`` / ``"aes"`` (V≤4: per-object keys via
    Algorithm 1) or ``"aes256"`` (V5: the file key used directly) or
    ``"identity"`` (/StmF /Identity: streams are NOT encrypted).
    """

    __slots__ = ("key", "method")

    def __init__(self, key: bytes, method: str):
        self.key = key
        self.method = method

    def _object_key(self, num: int, gen: int) -> bytes:
        h = hashlib.md5()
        h.update(self.key)
        # Algorithm 1 uses the LOW-ORDER 3 / 2 bytes, so object numbers
        # >= 2^24 (or generations >= 2^16) must wrap, not overflow
        h.update((num & 0xFFFFFF).to_bytes(3, "little"))
        h.update((gen & 0xFFFF).to_bytes(2, "little"))
        if self.method == "aes":
            h.update(b"sAlT")
        return h.digest()[: min(len(self.key) + 5, 16)]

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        if self.method == "identity":
            return data
        if self.method == "aes256":
            return aes_cbc_decrypt_padded(self.key, data)
        k = self._object_key(num, gen)
        if self.method == "aes":
            return aes_cbc_decrypt_padded(k, data)
        return rc4(k, data)

    def stream_decryptor(self, num: int, gen: int) -> Callable[[bytes], bytes]:
        return lambda data: self.decrypt_stream(data, num, gen)


def authenticate(enc_dict: bytes, id0: bytes) -> StandardDecryptor:
    """Empty-password authentication against the /Encrypt dictionary.

    Returns a bound :class:`StandardDecryptor` on success; raises
    :class:`EncryptedPdfError` when the handler is not /Standard, the
    revision is unsupported, or the empty password fails both the user
    (Algorithms 4/5, 2.A) and owner (Algorithm 7 / 2.A owner) checks.
    """
    handler = _name_of(enc_dict, b"Filter")
    if handler != "Standard":
        raise EncryptedPdfError(
            f"encrypted PDF: unsupported security handler /{handler}"
        )
    v = _int_of(enc_dict, b"V", 0)
    r = _int_of(enc_dict, b"R", 2)
    o = _pw_string(enc_dict, b"O")
    u = _pw_string(enc_dict, b"U")
    if o is None or u is None:
        raise EncryptedPdfError("encrypted PDF: /O or /U missing")

    if v in (1, 2) or (v == 4 and r <= 4):
        p = _int_of(enc_dict, b"P", -1)
        em = _ENCMETA_RE.search(enc_dict)
        encrypt_metadata = em is None or em.group(1) == b"true"
        method = "rc4"
        length_scope = enc_dict
        if v == 4:
            # crypt-filter dispatch: /StmF names the filter streams use
            # (/Identity means streams are plaintext even in an encrypted
            # file); /CFM and a byte-valued /Length are read from the
            # NAMED /CF entry, never the first match anywhere
            stmf = _name_of(enc_dict, b"StmF") or "Identity"
            if stmf == "Identity":
                method = "identity"
            else:
                cf = _crypt_filter_section(enc_dict, stmf.encode("latin-1"))
                cfm = _name_of(cf, b"CFM") if cf is not None else _name_of(
                    enc_dict, b"CFM"
                )
                if cfm == "AESV2":
                    method = "aes"
                elif cfm == "V2":
                    method = "rc4"
                else:
                    raise EncryptedPdfError(
                        f"encrypted PDF: unsupported crypt filter /{cfm}"
                    )
                if cf is not None and _INT_RE[b"Length"].search(cf):
                    length_scope = cf
        # /Length is BITS at the top level but BYTES inside a /CF crypt
        # filter dict; bytes values are <= 16 and bits values >= 40, so
        # the ranges are disjoint: interpret <= 16 as bytes (pdfminer
        # applies the same rule)
        length_raw = _int_of(length_scope, b"Length", 40)
        length_bits = length_raw * 8 if length_raw <= 16 else length_raw
        n = 5 if v == 1 else max(5, min(16, length_bits // 8))
        key = _algo2_key(b"", o, p, id0, r, n, encrypt_metadata)
        if _algo4_5_user_check(key, u, id0, r):
            return StandardDecryptor(key, method)
        # owner fallback: empty OWNER password recovering the user password.
        # Algorithm 7 yields the PADDED user password; feeding it back to
        # _algo2_key is exact because (padded + PAD)[:32] == padded.
        user_pw_padded = _algo7_user_pw_from_owner(b"", o, r, n)
        key = _algo2_key(user_pw_padded, o, p, id0, r, n, encrypt_metadata)
        if _algo4_5_user_check(key, u, id0, r):
            return StandardDecryptor(key, method)
        raise EncryptedPdfError(
            "encrypted PDF: password required (empty user/owner password rejected)"
        )

    if v == 5 and r in (5, 6):
        if len(u) < 48:
            raise EncryptedPdfError("encrypted PDF: /U too short for R5/R6")
        ue = _pw_string(enc_dict, b"UE")
        oe = _pw_string(enc_dict, b"OE")
        vsalt, ksalt = u[32:40], u[40:48]

        def _h(pw: bytes, salt: bytes, udata: bytes) -> bytes:
            if r == 5:
                return hashlib.sha256(pw + salt + udata).digest()
            return hash_2b(pw, salt, udata)

        if _h(b"", vsalt, b"") == u[:32] and ue is not None:
            ikey = _h(b"", ksalt, b"")
            file_key = aes_cbc_decrypt(ikey, b"\x00" * 16, ue)[:32]
            return StandardDecryptor(file_key, "aes256")
        if oe is not None and len(o) >= 48:
            ovsalt, oksalt = o[32:40], o[40:48]
            if _h(b"", ovsalt, u[:48]) == o[:32]:
                ikey = _h(b"", oksalt, u[:48])
                file_key = aes_cbc_decrypt(ikey, b"\x00" * 16, oe)[:32]
                return StandardDecryptor(file_key, "aes256")
        raise EncryptedPdfError(
            "encrypted PDF: password required (empty user/owner password rejected)"
        )

    raise EncryptedPdfError(f"encrypted PDF: unsupported /V {v} /R {r}")


# ---------------------------------------------------------------------------
# trailer-side discovery: /Encrypt reference + /ID
# ---------------------------------------------------------------------------

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*(?:<([0-9A-Fa-f\s]*)>|\(((?:[^()\\]|\\.)*)\))")
_TRAILER_ROOT_RE = re.compile(rb"/Root\s+\d+\s+\d+\s+R")


def declares_encrypt(payload: bytes) -> bool:
    """Cheap check: does the ACTIVE trailer declare /Encrypt?

    Scanned only in the trailer region — after the last ``trailer``
    keyword; for xref-stream files (no trailer keyword) the region
    starts at the last ``startxref`` offset (that is where the
    xref-stream dict carrying /Encrypt lives), with a 2 KiB tail as the
    last resort.  Page CONTENT that merely mentions the pattern cannot
    false-positive, and a superseded trailer whose encryption a later
    incremental update removed is not consulted."""
    t = payload.rfind(b"trailer")
    if t != -1:
        return bool(_ENCRYPT_REF_RE.search(payload[t:]))
    sx = payload.rfind(b"startxref")
    if sx != -1:
        m = re.match(rb"startxref\s+(\d+)", payload[sx:])
        if m:
            off = int(m.group(1))
            if 0 <= off < len(payload):
                return bool(_ENCRYPT_REF_RE.search(payload[off:]))
    return bool(_ENCRYPT_REF_RE.search(payload[-2048:]))


def is_trailer_dict(region: bytes) -> bool:
    """Does this region look like a real trailer dict (/Root or /Encrypt)?"""
    return bool(
        _TRAILER_ROOT_RE.search(region) or _ENCRYPT_REF_RE.search(region)
    )


def heuristic_trailer_regions(payload: bytes) -> List[bytes]:
    """Last-resort trailer regions for files whose startxref chain and
    ``trailer`` keywords cannot be located (corrupted offsets, prepended
    capture bytes — common in scraped corpora): the bytes from the last
    ``startxref`` offset, then the final 2 KiB.  Used only when the
    parsed regions contain no real trailer dict, so a well-formed file
    never consults these."""
    regions: List[bytes] = []
    sx = payload.rfind(b"startxref")
    if sx != -1:
        m = re.match(rb"startxref\s+(\d+)", payload[sx:])
        if m:
            off = int(m.group(1))
            if 0 <= off < len(payload):
                regions.append(payload[off:])
    regions.append(payload[-2048:])
    return regions


def find_encrypt_ref(trailer_regions: List[bytes]) -> Tuple[Optional[int], bytes]:
    """(encrypt object number, first /ID element) from trailer dicts,
    newest first.  Returns (None, id0) when the document is not encrypted.

    Encryption is decided by the ACTIVE trailer only — the newest region
    that is a real trailer dict (carries /Root or /Encrypt).  A
    superseded trailer whose encryption a later incremental update
    removed is NOT consulted (the r3 invariant `_is_encrypted_pdf`
    established); junk regions with neither key are skipped.  /ID is
    taken from the newest region that has one (the first element is
    permanent across updates, §14.4)."""
    id0 = b""
    for region in trailer_regions:
        im = _ID_RE.search(region)
        if im and not id0:
            if im.group(1) is not None:
                hexs = re.sub(rb"\s", b"", im.group(1))
                if len(hexs) % 2:
                    hexs += b"0"
                try:
                    id0 = bytes.fromhex(hexs.decode("ascii"))
                except ValueError:
                    id0 = b""
            else:
                id0 = _unescape_pdf_string(im.group(2))
    for region in trailer_regions:
        m = _ENCRYPT_REF_RE.search(region)
        if m:
            return int(m.group(1)), id0
        if _TRAILER_ROOT_RE.search(region):
            return None, id0  # active trailer, no /Encrypt: not encrypted
    return None, id0
