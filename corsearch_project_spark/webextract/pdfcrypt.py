"""Standard security handler for encrypted PDFs (public spec: PDF 1.7 /
ISO 32000-1 §7.6.2–7.6.4).

The overwhelmingly common crawl case is a document encrypted with the
standard handler and an EMPTY user password (permissions-restricted but
freely openable): RC4 (/V 1–2, /R 2–3) or AES-128-CBC (/V 4 /R 4 with
/CFM /AESV2). Both key-derivation and both ciphers are fully public
algorithms, implemented here stdlib-only (hashlib MD5 + a from-the-FIPS-197
-tables AES). Round-2 verdict item 5: converting these documents from
"detected and skipped" into extractions.

Password-protected documents (non-empty user password) stay skipped —
``authenticate_user_password`` returns None and the extractor emits empty
output, the same deterministic behavior as before.

Encryption helpers (``compute_o_value`` / ``compute_u_value`` /
``aes128_cbc_encrypt``) exist for the FIXTURE writer: the test corpus
generates its own encrypted documents (SURVEY §5.3 — we define the golden
corpus), and the frozen-golden suite then proves decryption reproduces
byte-identical extracted text.
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Optional

_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt). Dispatches to the
    self-tested OpenSSL legacy-provider fast path when available (~40x on
    the /V1-2 stream band); ``_rc4_py`` stays the always-tested reference
    (identical keystream either way — RFC-less but the de-facto test vector
    Key/Plaintext -> BBF316E8D940AF0AD3 gates the fast path at import)."""
    if _EVP_RC4:
        return _evp_rc4_lib(_EVP, key, data)
    return _rc4_py(key, data)


def _rc4_py(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), CBC mode — needed for /CFM /AESV2
# ---------------------------------------------------------------------------

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
    0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
    0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
    0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
    0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
    0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
    0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
    0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
    0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
    0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
    0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
    0xB0, 0x54, 0xBB, 0x16,
]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> List[List[int]]:
    """128-bit key -> 11 round keys of 16 bytes each."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _add_rk(s: List[int], rk: List[int]) -> None:
    for i in range(16):
        s[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: List[List[int]]) -> bytes:
    s = list(block)
    _add_rk(s, rks[0])
    for rnd in range(1, 10):
        s = [_SBOX[b] for b in s]
        s = [s[_SHIFT[i]] for i in range(16)]
        ns = [0] * 16
        for c in range(4):
            a = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = _mul(a[0], 2) ^ _mul(a[1], 3) ^ a[2] ^ a[3]
            ns[4 * c + 1] = a[0] ^ _mul(a[1], 2) ^ _mul(a[2], 3) ^ a[3]
            ns[4 * c + 2] = a[0] ^ a[1] ^ _mul(a[2], 2) ^ _mul(a[3], 3)
            ns[4 * c + 3] = _mul(a[0], 3) ^ a[1] ^ a[2] ^ _mul(a[3], 2)
        s = ns
        _add_rk(s, rks[rnd])
    s = [_SBOX[b] for b in s]
    s = [s[_SHIFT[i]] for i in range(16)]
    _add_rk(s, rks[10])
    return bytes(s)


def _decrypt_block(block: bytes, rks: List[List[int]]) -> bytes:
    s = list(block)
    _add_rk(s, rks[10])
    for rnd in range(9, 0, -1):
        s = [s[_INV_SHIFT[i]] for i in range(16)]
        s = [_INV_SBOX[b] for b in s]
        _add_rk(s, rks[rnd])
        ns = [0] * 16
        for c in range(4):
            a = s[4 * c : 4 * c + 4]
            ns[4 * c + 0] = (
                _mul(a[0], 14) ^ _mul(a[1], 11) ^ _mul(a[2], 13) ^ _mul(a[3], 9)
            )
            ns[4 * c + 1] = (
                _mul(a[0], 9) ^ _mul(a[1], 14) ^ _mul(a[2], 11) ^ _mul(a[3], 13)
            )
            ns[4 * c + 2] = (
                _mul(a[0], 13) ^ _mul(a[1], 9) ^ _mul(a[2], 14) ^ _mul(a[3], 11)
            )
            ns[4 * c + 3] = (
                _mul(a[0], 11) ^ _mul(a[1], 13) ^ _mul(a[2], 9) ^ _mul(a[3], 14)
            )
        s = ns
    s = [s[_INV_SHIFT[i]] for i in range(16)]
    s = [_INV_SBOX[b] for b in s]
    _add_rk(s, rks[0])
    return bytes(s)


# ---------------------------------------------------------------------------
# T-table fast path (the classic public rijndael construction — OpenSSL's
# Te/Td tables): one 32-bit lookup+xor per state byte per round, ~15× the
# byte-at-a-time reference implementation above. The reference functions
# stay as the cross-check oracle in tests. Measured: the naive path nearly
# doubled whole-corpus extraction cost once the fixture gained its
# encrypted-PDF arm; AES work is ~1.8% of docs × ~2 KB each, so the cipher
# must not dominate a document's extraction budget.
# ---------------------------------------------------------------------------


def _rotl(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF


_TE0 = []
for _x in range(256):
    _s = _SBOX[_x]
    _w = (_mul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _mul(_s, 3)
    _TE0.append(_w)
_TE1 = [_rotl(w, 24) for w in _TE0]
_TE2 = [_rotl(w, 16) for w in _TE0]
_TE3 = [_rotl(w, 8) for w in _TE0]

_TD0 = []
for _x in range(256):
    _s = _INV_SBOX[_x]
    _w = (_mul(_s, 14) << 24) | (_mul(_s, 9) << 16) | (_mul(_s, 13) << 8) | _mul(_s, 11)
    _TD0.append(_w)
_TD1 = [_rotl(w, 24) for w in _TD0]
_TD2 = [_rotl(w, 16) for w in _TD0]
_TD3 = [_rotl(w, 8) for w in _TD0]


def _sub_word(t: int) -> int:
    return (
        (_SBOX[(t >> 24) & 0xFF] << 24)
        | (_SBOX[(t >> 16) & 0xFF] << 16)
        | (_SBOX[(t >> 8) & 0xFF] << 8)
        | _SBOX[t & 0xFF]
    )


def _expand_key_words(key: bytes) -> List[int]:
    """AES-128 or AES-256 key -> big-endian 32-bit round-key words
    (44 words / 10 rounds for Nk=4; 60 words / 14 rounds for Nk=8 — the
    FIPS-197 §5.2 schedule, including the extra SubWord at i%Nk==4 that
    only the 256-bit schedule has)."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError(f"AES key must be 16 or 32 bytes, got {len(key)}")
    nr = nk + 6
    w = list(struct.unpack(f">{nk}I", key))
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = _sub_word(_rotl(t, 8)) ^ (_RCON[i // nk - 1] << 24)
        elif nk == 8 and i % nk == 4:
            t = _sub_word(t)
        w.append(w[i - nk] ^ t)
    return w


def _decrypt_key_words(rk: List[int]) -> List[int]:
    """Equivalent-inverse-cipher key schedule: reversed round order with
    InvMixColumns applied to the middle round keys (Td∘SBOX == pure
    InvMixColumns, the standard trick). Works for any round count."""
    nr = len(rk) // 4 - 1
    dk = list(rk[4 * nr : 4 * nr + 4])
    for r in range(nr - 1, 0, -1):
        for w in rk[4 * r : 4 * r + 4]:
            dk.append(
                _TD0[_SBOX[(w >> 24) & 0xFF]]
                ^ _TD1[_SBOX[(w >> 16) & 0xFF]]
                ^ _TD2[_SBOX[(w >> 8) & 0xFF]]
                ^ _TD3[_SBOX[w & 0xFF]]
            )
    dk.extend(rk[0:4])
    return dk


def _encrypt_words(s0, s1, s2, s3, rk: List[int]):
    """One block, 32-bit-word in/out — the CBC loops keep state as ints so
    per-block bytes slicing/xor never happens (measured 2-3× on the R6
    Algorithm-2.B hash, whose cost is thousands of chained blocks)."""
    nr = len(rk) // 4 - 1
    s0 ^= rk[0]; s1 ^= rk[1]; s2 ^= rk[2]; s3 ^= rk[3]
    k = 4
    for _ in range(nr - 1):
        t0 = _TE0[s0 >> 24] ^ _TE1[(s1 >> 16) & 0xFF] ^ _TE2[(s2 >> 8) & 0xFF] ^ _TE3[s3 & 0xFF] ^ rk[k]
        t1 = _TE0[s1 >> 24] ^ _TE1[(s2 >> 16) & 0xFF] ^ _TE2[(s3 >> 8) & 0xFF] ^ _TE3[s0 & 0xFF] ^ rk[k + 1]
        t2 = _TE0[s2 >> 24] ^ _TE1[(s3 >> 16) & 0xFF] ^ _TE2[(s0 >> 8) & 0xFF] ^ _TE3[s1 & 0xFF] ^ rk[k + 2]
        t3 = _TE0[s3 >> 24] ^ _TE1[(s0 >> 16) & 0xFF] ^ _TE2[(s1 >> 8) & 0xFF] ^ _TE3[s2 & 0xFF] ^ rk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    S = _SBOX
    return (
        ((S[s0 >> 24] << 24) | (S[(s1 >> 16) & 0xFF] << 16) | (S[(s2 >> 8) & 0xFF] << 8) | S[s3 & 0xFF]) ^ rk[k],
        ((S[s1 >> 24] << 24) | (S[(s2 >> 16) & 0xFF] << 16) | (S[(s3 >> 8) & 0xFF] << 8) | S[s0 & 0xFF]) ^ rk[k + 1],
        ((S[s2 >> 24] << 24) | (S[(s3 >> 16) & 0xFF] << 16) | (S[(s0 >> 8) & 0xFF] << 8) | S[s1 & 0xFF]) ^ rk[k + 2],
        ((S[s3 >> 24] << 24) | (S[(s0 >> 16) & 0xFF] << 16) | (S[(s1 >> 8) & 0xFF] << 8) | S[s2 & 0xFF]) ^ rk[k + 3],
    )


def _decrypt_words(s0, s1, s2, s3, dk: List[int]):
    nr = len(dk) // 4 - 1
    s0 ^= dk[0]; s1 ^= dk[1]; s2 ^= dk[2]; s3 ^= dk[3]
    k = 4
    for _ in range(nr - 1):
        t0 = _TD0[s0 >> 24] ^ _TD1[(s3 >> 16) & 0xFF] ^ _TD2[(s2 >> 8) & 0xFF] ^ _TD3[s1 & 0xFF] ^ dk[k]
        t1 = _TD0[s1 >> 24] ^ _TD1[(s0 >> 16) & 0xFF] ^ _TD2[(s3 >> 8) & 0xFF] ^ _TD3[s2 & 0xFF] ^ dk[k + 1]
        t2 = _TD0[s2 >> 24] ^ _TD1[(s1 >> 16) & 0xFF] ^ _TD2[(s0 >> 8) & 0xFF] ^ _TD3[s3 & 0xFF] ^ dk[k + 2]
        t3 = _TD0[s3 >> 24] ^ _TD1[(s2 >> 16) & 0xFF] ^ _TD2[(s1 >> 8) & 0xFF] ^ _TD3[s0 & 0xFF] ^ dk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    S = _INV_SBOX
    return (
        ((S[s0 >> 24] << 24) | (S[(s3 >> 16) & 0xFF] << 16) | (S[(s2 >> 8) & 0xFF] << 8) | S[s1 & 0xFF]) ^ dk[k],
        ((S[s1 >> 24] << 24) | (S[(s0 >> 16) & 0xFF] << 16) | (S[(s3 >> 8) & 0xFF] << 8) | S[s2 & 0xFF]) ^ dk[k + 1],
        ((S[s2 >> 24] << 24) | (S[(s1 >> 16) & 0xFF] << 16) | (S[(s0 >> 8) & 0xFF] << 8) | S[s3 & 0xFF]) ^ dk[k + 2],
        ((S[s3 >> 24] << 24) | (S[(s2 >> 16) & 0xFF] << 16) | (S[(s1 >> 8) & 0xFF] << 8) | S[s0 & 0xFF]) ^ dk[k + 3],
    )


def _encrypt_block_fast(block: bytes, rk: List[int]) -> bytes:
    s0, s1, s2, s3 = struct.unpack(">4I", block)
    return struct.pack(">4I", *_encrypt_words(s0, s1, s2, s3, rk))


def _decrypt_block_fast(block: bytes, dk: List[int]) -> bytes:
    s0, s1, s2, s3 = struct.unpack(">4I", block)
    return struct.pack(">4I", *_decrypt_words(s0, s1, s2, s3, dk))


# ---------------------------------------------------------------------------
# Optional OpenSSL fast path (stdlib ctypes -> libcrypto EVP). The R6
# password hash (Algorithm 2.B) is an intentionally expensive KDF —
# thousands of chained AES blocks per encrypted document — which costs
# ~300 ms/doc in pure Python but ~2 ms through EVP. ctypes is stdlib, the
# library is probed at import and SELF-TESTED against the FIPS-197 C.1/C.3
# vectors; any mismatch or absence falls back to the pure-Python word
# loops below, which remain the always-tested reference (identical
# ciphertext either way, so goldens are implementation-independent).
# Set CSP_PURE_AES=1 to force the pure path (used by the parity tests).
# ---------------------------------------------------------------------------


def _load_evp():
    import os as _os

    if _os.environ.get("CSP_PURE_AES"):
        return None, False
    try:
        import ctypes
        import ctypes.util

        name = ctypes.util.find_library("crypto") or "libcrypto.so.3"
        lib = ctypes.CDLL(name)
        lib.EVP_CIPHER_CTX_new.restype = ctypes.c_void_p
        lib.EVP_CIPHER_CTX_free.argtypes = [ctypes.c_void_p]
        lib.EVP_aes_128_cbc.restype = ctypes.c_void_p
        lib.EVP_aes_256_cbc.restype = ctypes.c_void_p
        lib.EVP_CipherInit_ex.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.EVP_CIPHER_CTX_set_padding.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.EVP_CipherUpdate.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int,
        ]
        lib.EVP_CipherFinal_ex.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)
        ]
        # self-test: FIPS-197 C.1 + C.3 single blocks with a zero IV
        # (CBC of one block under zero IV == raw ECB of that block)
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        if _evp_cbc_lib(
            lib, bytes(range(16)), b"\x00" * 16, pt, True
        ) != bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a"):
            return None, False
        if _evp_cbc_lib(
            lib, bytes(range(32)), b"\x00" * 16, pt, True
        ) != bytes.fromhex("8ea2b7ca516745bfeafc49904b496089"):
            return None, False
        # RC4 lives in OpenSSL 3's legacy provider. Explicitly activate
        # "default" BEFORE "legacy" (the documented pattern: an explicit
        # provider load disables implicit default activation), then
        # self-test RC4 against the de-facto vector and RE-verify AES so a
        # provider-state surprise can never ship a bad fast path.
        rc4_ok = False
        try:
            lib.EVP_rc4.restype = ctypes.c_void_p
            lib.EVP_CIPHER_CTX_set_key_length.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
            ]
            lib.OSSL_PROVIDER_load.restype = ctypes.c_void_p
            lib.OSSL_PROVIDER_load.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
            if lib.OSSL_PROVIDER_load(None, b"default") and lib.OSSL_PROVIDER_load(
                None, b"legacy"
            ):
                rc4_ok = (
                    _evp_rc4_lib(lib, b"Key", b"Plaintext").hex()
                    == "bbf316e8d940af0ad3"
                )
        except Exception:
            rc4_ok = False
        if _evp_cbc_lib(
            lib, bytes(range(16)), b"\x00" * 16, pt, True
        ) != bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a"):
            return None, False
        return lib, rc4_ok
    except Exception:
        return None, False


def _evp_rc4_lib(lib, key: bytes, data: bytes) -> bytes:
    import ctypes

    ctx = lib.EVP_CIPHER_CTX_new()
    if not ctx:
        raise OSError("EVP_CIPHER_CTX_new failed")
    try:
        if lib.EVP_CipherInit_ex(ctx, lib.EVP_rc4(), None, None, None, 1) != 1:
            raise OSError("EVP_CipherInit_ex(rc4) failed")
        # PDF RC4 keys are 5-16 bytes; EVP defaults to 16
        if lib.EVP_CIPHER_CTX_set_key_length(ctx, len(key)) != 1:
            raise OSError("EVP_CIPHER_CTX_set_key_length failed")
        if lib.EVP_CipherInit_ex(ctx, None, None, key, None, -1) != 1:
            raise OSError("EVP_CipherInit_ex(key) failed")
        out = ctypes.create_string_buffer(len(data) + 1)  # +1: len 0 is legal
        n1 = ctypes.c_int(0)
        if lib.EVP_CipherUpdate(ctx, out, ctypes.byref(n1), data, len(data)) != 1:
            raise OSError("EVP_CipherUpdate failed")
        return out.raw[: n1.value]
    finally:
        lib.EVP_CIPHER_CTX_free(ctx)


def _evp_cbc_lib(lib, key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    import ctypes

    cipher = lib.EVP_aes_128_cbc() if len(key) == 16 else lib.EVP_aes_256_cbc()
    ctx = lib.EVP_CIPHER_CTX_new()
    if not ctx:
        raise OSError("EVP_CIPHER_CTX_new failed")
    try:
        if lib.EVP_CipherInit_ex(ctx, cipher, None, key, iv, 1 if encrypt else 0) != 1:
            raise OSError("EVP_CipherInit_ex failed")
        lib.EVP_CIPHER_CTX_set_padding(ctx, 0)
        out = ctypes.create_string_buffer(len(data) + 16)
        n1 = ctypes.c_int(0)
        if lib.EVP_CipherUpdate(ctx, out, ctypes.byref(n1), data, len(data)) != 1:
            raise OSError("EVP_CipherUpdate failed")
        fin = ctypes.create_string_buffer(16)
        n2 = ctypes.c_int(0)
        if lib.EVP_CipherFinal_ex(ctx, fin, ctypes.byref(n2)) != 1:
            raise OSError("EVP_CipherFinal_ex failed")
        # padding disabled + block-aligned input -> Final emits nothing
        return out.raw[: n1.value] + fin.raw[: n2.value]
    finally:
        lib.EVP_CIPHER_CTX_free(ctx)


_EVP, _EVP_RC4 = _load_evp()


def _cbc_encrypt_words(rk, iv: bytes, data: bytes) -> bytes:
    """CBC over pre-expanded round keys with int-word state: the whole
    buffer is unpacked once, xor-chaining happens on ints, and ciphertext
    words are packed once at the end — no per-block bytes objects.
    Measured ~2.5x on the R6 Algorithm-2.B hash (thousands of chained
    blocks per encrypted document)."""
    n = len(data) // 4
    words = struct.unpack(f">{n}I", data)
    c0, c1, c2, c3 = struct.unpack(">4I", iv)
    out = []
    for i in range(0, n, 4):
        c0, c1, c2, c3 = _encrypt_words(
            words[i] ^ c0, words[i + 1] ^ c1, words[i + 2] ^ c2,
            words[i + 3] ^ c3, rk,
        )
        out.extend((c0, c1, c2, c3))
    return struct.pack(f">{n}I", *out)


def _cbc_decrypt_words(dk, iv: bytes, data: bytes) -> bytes:
    n = len(data) // 4
    words = struct.unpack(f">{n}I", data)
    p0, p1, p2, p3 = struct.unpack(">4I", iv)
    out = []
    for i in range(0, n, 4):
        d0, d1, d2, d3 = _decrypt_words(
            words[i], words[i + 1], words[i + 2], words[i + 3], dk
        )
        out.extend((d0 ^ p0, d1 ^ p1, d2 ^ p2, d3 ^ p3))
        p0, p1, p2, p3 = words[i], words[i + 1], words[i + 2], words[i + 3]
    return struct.pack(f">{n}I", *out)


def _cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw AES-CBC (128- or 256-bit key), no padding, no IV prefix —
    the building block the R6 hash loop and /UE//OE wrapping need (their
    inputs are always block-aligned)."""
    if _EVP is not None:
        return _evp_cbc_lib(_EVP, key, iv, data, True)
    return _cbc_encrypt_words(_expand_key_words(key), iv, data)


def _cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    if _EVP is not None:
        return _evp_cbc_lib(_EVP, key, iv, data, False)
    return _cbc_decrypt_words(_decrypt_key_words(_expand_key_words(key)), iv, data)


def aes128_cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """IV-prefixed AES-CBC with PKCS#7 padding (the /AESV2 and /AESV3
    stream layout: first 16 bytes of the stream are the IV). Despite the
    historical name, the key may be 16 (AESV2) or 32 (AESV3) bytes — the
    key schedule picks the round count."""
    pad = 16 - (len(plaintext) % 16)
    plaintext += bytes([pad]) * pad
    return iv + _cbc_encrypt_nopad(key, iv, plaintext)


def aes128_cbc_decrypt(key: bytes, data: bytes) -> Optional[bytes]:
    """Inverse of :func:`aes128_cbc_encrypt`; None on malformed input."""
    if len(data) < 32 or len(data) % 16:
        return None
    out = _cbc_decrypt_nopad(key, data[:16], data[16:])
    pad = out[-1]
    if not 1 <= pad <= 16:
        return None
    return out[:-pad]


# ---------------------------------------------------------------------------
# Standard security handler key derivation (§7.6.3)
# ---------------------------------------------------------------------------


def _p_bytes(p: int) -> bytes:
    return struct.pack("<i", p if p < 2**31 else p - 2**32)


def compute_encryption_key(
    password: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_bytes: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: password -> file encryption key."""
    h = hashlib.md5()
    h.update((password + _PAD)[:32])
    h.update(o[:32])
    h.update(_p_bytes(p))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_bytes]).digest()
    return key[:key_bytes]


def compute_o_value(owner_pw: bytes, user_pw: bytes, r: int, key_bytes: int) -> bytes:
    """Algorithm 3: the /O entry (fixture-writer direction)."""
    key = hashlib.md5((owner_pw + _PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_bytes]
    o = rc4(key, (user_pw + _PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u_value(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (r=2) / 5 (r>=3): the /U entry."""
    if r == 2:
        return rc4(file_key, _PAD)
    h = hashlib.md5(_PAD + id0).digest()
    u = rc4(file_key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + u  # 16 significant bytes + 16 bytes arbitrary padding


def authenticate_user_password(
    password: bytes,
    o: bytes,
    u: bytes,
    p: int,
    id0: bytes,
    r: int,
    key_bytes: int,
    encrypt_metadata: bool = True,
) -> Optional[bytes]:
    """Algorithm 6: return the file key iff ``password`` is the user
    password (only the first 16 bytes of /U are significant for r>=3)."""
    key = compute_encryption_key(
        password, o, p, id0, r, key_bytes, encrypt_metadata
    )
    want = compute_u_value(key, id0, r)
    got_ok = want[:16] == u[:16] if r >= 3 else want == u[:32]
    return key if got_ok else None


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: per-object key for RC4 / AESV2 content."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def decrypt_stream(file_key: bytes, num: int, gen: int, raw: bytes, aes: bool) -> bytes:
    """Decrypt one stream's raw bytes (before filters are undone).

    A 32-byte ``file_key`` means /V 5 (AES-256): the FILE key is used
    directly — ISO 32000-2 dropped the per-object MD5 derivation, which no
    longer exists at that revision. 16-byte-or-less keys go through the
    classic Algorithm-1 per-object key."""
    if aes and len(file_key) == 32:
        out = aes128_cbc_decrypt(file_key, raw)
        return out if out is not None else b""
    k = object_key(file_key, num, gen, aes)
    if aes:
        out = aes128_cbc_decrypt(k, raw)
        return out if out is not None else b""
    return rc4(k, raw)


# ---------------------------------------------------------------------------
# AES-256 revisions (/V 5): /R 6 per ISO 32000-2 §7.6.4 (PDF 2.0), plus the
# deprecated-but-crawled /R 5 (Acrobat 9 /AESV3 extension, same structure
# with a single-SHA-256 hash). All-public algorithms; the "udata" argument
# is the 48-byte /U value, used only when checking the OWNER password.
# ---------------------------------------------------------------------------


def hash_r6(password: bytes, salt: bytes, udata: bytes = b"", r: int = 6) -> bytes:
    """Algorithm 2.B (ISO 32000-2): the iterated SHA-256/384/512 +
    AES-128-CBC password hash. For /R 5 the hash is a single SHA-256.
    Passwords are UTF-8 truncated to 127 bytes per §7.6.4.3.3 (SASLprep
    is omitted: the crawl path only ever authenticates the EMPTY
    password, for which the normalization is the identity)."""
    password = password[:127]
    k = hashlib.sha256(password + salt + udata).digest()
    if r < 6:
        return k
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        # len(k1) is 64×n, always block-aligned -> no padding
        e = _cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def authenticate_r6_user(
    password: bytes, u: bytes, ue: bytes, r: int = 6
) -> Optional[bytes]:
    """Algorithm 11 + 2.A steps f-g: validate ``password`` as the USER
    password against the 48-byte /U and recover the 32-byte file key from
    /UE. Returns None when the password doesn't validate (document stays
    skipped, same policy as the RC4/AESV2 path)."""
    if len(u) < 48 or len(ue) < 32:
        return None
    vsalt, ksalt = u[32:40], u[40:48]
    if hash_r6(password, vsalt, b"", r) != u[:32]:
        return None
    ikey = hash_r6(password, ksalt, b"", r)
    return _cbc_decrypt_nopad(ikey, b"\x00" * 16, ue[:32])


def verify_perms_r6(file_key: bytes, perms: bytes, p: int) -> bool:
    """Algorithm 13 sanity check: /Perms decrypts (AES-256-ECB == CBC with
    a zero IV over one block) to the P value + the 'adb' tag."""
    if len(perms) < 16:
        return False
    dec = _cbc_decrypt_nopad(file_key, b"\x00" * 16, perms[:16])
    return dec[9:12] == b"adb" and dec[:4] == _p_bytes(p)


def compute_r6_values(
    user_pw: bytes,
    file_key: bytes,
    p: int,
    salts: bytes,
    r: int = 6,
    encrypt_metadata: bool = True,
) -> dict:
    """Fixture-writer direction: the /U, /UE, /O, /OE, /Perms entries for
    an R5/R6 document. ``salts`` supplies 32 deterministic bytes (4×8-byte
    salts — the spec says 'random'; the fixture corpus derives them from
    its seeded rng so goldens are stable). The owner entries are derived
    from a fixed fixture owner secret, like compute_o_value's caller."""
    assert len(salts) >= 32 and len(file_key) == 32
    uvs, uks, ovs, oks = salts[:8], salts[8:16], salts[16:24], salts[24:32]
    u = hash_r6(user_pw, uvs, b"", r) + uvs + uks
    ue = _cbc_encrypt_nopad(hash_r6(user_pw, uks, b"", r), b"\x00" * 16, file_key)
    owner_pw = b"fixture-owner-secret"
    o = hash_r6(owner_pw, ovs, u, r) + ovs + oks
    oe = _cbc_encrypt_nopad(hash_r6(owner_pw, oks, u, r), b"\x00" * 16, file_key)
    perms_plain = (
        _p_bytes(p)
        + b"\xff\xff\xff\xff"
        + (b"T" if encrypt_metadata else b"F")
        + b"adb"
        + b"fixt"  # bytes 12-15: arbitrary per spec; fixed for determinism
    )
    perms = _cbc_encrypt_nopad(file_key, b"\x00" * 16, perms_plain)
    return {"U": u, "UE": ue, "O": o, "OE": oe, "Perms": perms}
