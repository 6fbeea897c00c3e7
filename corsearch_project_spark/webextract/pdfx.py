"""Minimal deterministic PDF text extraction (SURVEY.md §2.2 E11–E16).

pdfminer.six-style architecture (the public LTChar→LTTextLine→LTTextBox
layout model), rewritten from scratch for this engine because pdfminer is
unavailable offline (SURVEY.md §0.1) and the byte-identity contract
(BASELINE.json:6) requires full control:

- E11 lexer/parser: dict/array/name/number/string/hex-string tokens,
  indirect refs, sequential body scan with regex recovery (no xref needed).
- E12 stream decode: FlateDecode (zlib), ASCIIHexDecode, ASCII85Decode,
  RunLengthDecode, LZWDecode, identity; TIFF/PNG predictors via
  /DecodeParms. PDF 1.5+ compressed layouts are supported: /ObjStm
  containers are unpacked and /XRef stream dicts supply the trailer.
- E13 content-stream interpreter: BT/ET, Tf, Tm, Td, TD, TL, T*, Tc, Tw,
  Tj, TJ, ', " — emits glyph runs (text, x, y, size) per page; fonts decoded
  via ToUnicode CMap (bfchar/bfrange) or WinAnsi (cp1252) or latin-1 for
  simple fonts, and 2-byte-CID Type0/Identity-H composite fonts (ToUnicode
  CMap, Identity fallback) — the dominant encoding in real crawl PDFs.
  Predefined CJK CMaps (GBK-EUC, RKSJ, B5, UHC, Uni*-UCS2/UTF16 families)
  decode via the public legacy charset each is defined over; embedded CMap
  stream encodings parse codespacerange/cidrange for mixed-width codes.
- E14 glyph→line clustering by y-coordinate bands (rule.pdf_line_tol × size).
- E15 line→block clustering by vertical gap (rule.pdf_block_gap × size).
- E16 reading-order sort: column detection by x-interval overlap, columns
  left→right, blocks top→bottom, pages in order.

Supported subset = exactly what fixtures/gen_pages.py's writer emits, which
is legitimate because this core *defines* the golden corpus (SURVEY §1.3).
Unsupported filters/operators are skipped deterministically (never raise);
encrypted documents (/Encrypt in the trailer) are detected and emit empty
text rather than ciphertext noise.

PDF spans index into the *emitted text* (there is no decoded char source for
binary PDFs); kind is ``pdf:p<page>`` so blocks remain page-attributable.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from corsearch_project_spark.webextract.rules import DEFAULT_RULE, Rule
from corsearch_project_spark.webextract.textnorm import normalize_ws

# ---------------------------------------------------------------------------
# E11: object lexer/parser
# ---------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Ref(tuple):
    """Indirect reference (num, gen)."""


@dataclass(slots=True)
class StreamObj:
    d: dict
    raw: bytes
    # owning object number/generation — the standard security handler's
    # per-object key (pdfcrypt.object_key) is derived from these
    num: int = 0
    gen: int = 0


# int-set membership: buf[i] yields an int in py3; avoids allocating a
# one-byte bytes object per scanned character (hot: ~300k calls/1k PDFs)
_WS_SET = frozenset(_WS)


def _skip_ws(buf: bytes, i: int) -> int:
    n = len(buf)
    while i < n:
        b = buf[i]
        if b == 0x25:  # '%' comment to EOL
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif b in _WS_SET:
            i += 1
        else:
            break
    return i


_NAME_RE = re.compile(rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)")
# Ref-then-number in ONE C-level alternation (ordered like the original
# two attempts): numbers dominate content streams, and the separate
# _REF_RE attempt per numeric token was pure overhead.
_REF_OR_NUM_RE = re.compile(
    rb"(\d+)\s+(\d+)\s+R(?![a-zA-Z])|[+-]?(?:\d+\.\d*|\.\d+|\d+)"
)
_KEYWORD_RE = re.compile(rb"[a-zA-Z'\"*]{1,32}")
# Interned ("op", str) tuples / "/Name" strings — content streams repeat a
# tiny operator and name vocabulary millions of times at crawl scale.
# Capped so fuzzed garbage cannot grow the maps unboundedly.
_OP_CACHE: Dict[bytes, tuple] = {}
_NAME_CACHE: Dict[bytes, str] = {}
_PARSE_CACHE_CAP = 4096


def parse_object(buf: bytes, i: int) -> Tuple[object, int]:
    """Parse one PDF value at offset i -> (value, next_offset)."""
    i = _skip_ws(buf, i)
    if i >= len(buf):
        return None, i
    c = buf[i]
    if c == 0x3C:  # '<'
        if buf[i : i + 2] == b"<<":
            return _parse_dict(buf, i)
        return _parse_hex_string(buf, i)
    if c == 0x28:  # '('
        return _parse_lit_string(buf, i)
    if c == 0x5B:  # '['
        i += 1
        arr: List[object] = []
        while True:
            i = _skip_ws(buf, i)
            if i >= len(buf) or buf[i] == 0x5D:  # ']'
                return arr, min(i + 1, len(buf))
            v, i = parse_object(buf, i)
            arr.append(v)
    if c == 0x2F:  # '/'
        m = _NAME_RE.match(buf, i)
        raw = m.group(1)
        v = _NAME_CACHE.get(raw)
        if v is None:
            v = "/" + raw.decode("latin-1")
            if len(_NAME_CACHE) < _PARSE_CACHE_CAP:
                _NAME_CACHE[raw] = v
        return v, m.end()
    m = _REF_OR_NUM_RE.match(buf, i)
    if m:
        g1 = m.group(1)
        if g1 is not None:
            return Ref((int(g1), int(m.group(2)))), m.end()
        s = m.group(0)
        v = float(s) if b"." in s else int(s)
        return v, m.end()
    if buf.startswith(b"true", i):
        return True, i + 4
    if buf.startswith(b"false", i):
        return False, i + 5
    if buf.startswith(b"null", i):
        return None, i + 4
    m = _KEYWORD_RE.match(buf, i)
    if m:
        raw = m.group(0)
        t = _OP_CACHE.get(raw)
        if t is None:
            t = ("op", raw.decode("latin-1"))
            if len(_OP_CACHE) < _PARSE_CACHE_CAP:
                _OP_CACHE[raw] = t
        return t, m.end()
    return None, i + 1  # skip unparseable byte deterministically


def _parse_dict(buf: bytes, i: int) -> Tuple[dict, int]:
    i += 2
    d: dict = {}
    while True:
        i = _skip_ws(buf, i)
        if buf[i : i + 2] == b">>":
            return d, i + 2
        if i >= len(buf):
            return d, i
        if buf[i : i + 1] != b"/":
            _, i = parse_object(buf, i)  # recover: skip junk value
            continue
        m = _NAME_RE.match(buf, i)
        key = "/" + m.group(1).decode("latin-1")
        v, i = parse_object(buf, m.end())
        d[key] = v


def _parse_hex_string(buf: bytes, i: int) -> Tuple[bytes, int]:
    j = buf.find(b">", i + 1)
    if j < 0:
        j = len(buf)
    hexs = re.sub(rb"[^0-9A-Fa-f]", b"", buf[i + 1 : j])
    if len(hexs) % 2:
        hexs += b"0"
    return bytes.fromhex(hexs.decode("ascii")), j + 1


_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\x0c",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


_LIT_SPECIAL_RE = re.compile(rb"[\\()]")


def _parse_lit_string(buf: bytes, i: int) -> Tuple[bytes, int]:
    """Bulk-copy scanner: plain runs between the three special bytes
    (backslash, parens) are appended as slices instead of byte-at-a-time —
    same output, ~an order of magnitude fewer Python-level iterations."""
    i += 1
    out = bytearray()
    depth = 1
    n = len(buf)
    while i < n:
        m = _LIT_SPECIAL_RE.search(buf, i)
        if m is None:
            out += buf[i:n]
            i = n
            break
        j = m.start()
        out += buf[i:j]
        c = buf[j]
        if c == 0x5C:  # backslash
            i = j
            nxt = buf[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():
                oct_s = buf[i + 1 : i + 4]
                om = re.match(rb"[0-7]{1,3}", oct_s)
                out.append(int(om.group(0), 8) & 0xFF)
                i += 1 + len(om.group(0))
            elif nxt in (b"\n", b"\r"):
                i += 2  # line continuation
                if nxt == b"\r" and buf[i : i + 1] == b"\n":
                    i += 1
            else:
                i += 1
        elif c == 0x28:  # '('
            depth += 1
            out.append(c)
            i = j + 1
        else:  # ')'
            depth -= 1
            if depth == 0:
                return bytes(out), j + 1
            out.append(c)
            i = j + 1
    return bytes(out), i


# ---------------------------------------------------------------------------
# Document body scan
# ---------------------------------------------------------------------------

_OBJ_HEADER_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _rle_decode(data: bytes) -> bytes:
    """PDF RunLengthDecode: length byte L — L<128: copy L+1 literal bytes;
    L>128: repeat next byte 257-L times; L==128: EOD. Tolerant: truncated
    input yields what decoded so far."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        l = data[i]
        if l == 128:
            break
        if l < 128:
            out += data[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            if i + 1 < n:
                out += data[i + 1 : i + 2] * (257 - l)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes) -> Optional[bytes]:
    """PDF LZWDecode (TIFF-style LZW, MSB-first variable code width 9-12,
    codes 256=clear, 257=EOD). Returns None on malformed input."""
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: Optional[bytes] = None
    acc = nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    return None
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                return None
            out += entry
            prev = entry
            # Width bump must track the ENCODER's next-code counter, which
            # runs one ahead of this table (the first code after a clear
            # emits without adding an entry) — hence len(table) + 1.
            if len(table) + 1 >= (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


def _unpredict(data: bytes, pred: int, columns: int, colors: int, bpc: int) -> bytes:
    """Undo TIFF (2) / PNG (10-15) predictors — real xref/ObjStm streams
    are near-universally Flate + PNG Up (12). Tolerant of a ragged tail."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if pred == 2:  # TIFF horizontal differencing (byte-aligned case only)
        out = bytearray(data)
        for r0 in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(r0 + bpp, r0 + rowlen):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    if pred < 10:
        return data
    # PNG: each row is 1 tag byte + rowlen filtered bytes
    out = bytearray()
    prior = bytearray(rowlen)
    i, n = 0, len(data)
    while i + 1 <= n:
        tag = data[i]
        row = bytearray(data[i + 1 : i + 1 + rowlen])
        i += 1 + rowlen
        if len(row) < rowlen:
            row += bytes(rowlen - len(row))
        if tag == 1:  # Sub
            for j in range(bpp, rowlen):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif tag == 2:  # Up
            for j in range(rowlen):
                row[j] = (row[j] + prior[j]) & 0xFF
        elif tag == 3:  # Average
            for j in range(rowlen):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prior[j]) >> 1)) & 0xFF
        elif tag == 4:  # Paeth
            for j in range(rowlen):
                a = row[j - bpp] if j >= bpp else 0
                b = prior[j]
                c = prior[j - bpp] if j >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[j] = (row[j] + pr) & 0xFF
        out += row
        prior = row
    return bytes(out)


class PdfDoc:
    def __init__(self, data: bytes):
        self.data = data
        self.objects: Dict[int, object] = {}
        self.trailer: dict = {}
        self._scan()

    def _scan(self) -> None:
        """Sequential scan of indirect objects; stream /Length resolved after
        first pass (fixture writer emits direct Lengths; refs re-resolved)."""
        buf = self.data
        for m in _OBJ_HEADER_RE.finditer(buf):
            num = int(m.group(1))
            gen = int(m.group(2))
            try:
                val, j = parse_object(buf, m.end())
            except Exception:
                continue
            if isinstance(val, dict):
                j = _skip_ws(buf, j)
                if buf.startswith(b"stream", j):
                    j += 6
                    if buf[j : j + 2] == b"\r\n":
                        j += 2
                    elif buf[j : j + 1] == b"\n":
                        j += 1
                    length = val.get("/Length")
                    if isinstance(length, Ref):
                        length = None  # resolve by endstream search
                    if isinstance(length, int):
                        raw = buf[j : j + length]
                    else:
                        e = buf.find(b"endstream", j)
                        raw = buf[j : e if e >= 0 else len(buf)]
                        raw = raw.rstrip(b"\r\n")
                    val = StreamObj(val, raw, num, gen)
            if num not in self.objects:  # first definition wins (linear file)
                self.objects[num] = val
        for tm in re.finditer(rb"trailer", buf):
            try:
                d, _ = parse_object(buf, tm.end())
                if isinstance(d, dict):
                    self.trailer.update(d)
            except Exception:
                pass
        # PDF 1.5+ compressed layouts (the dominant shape in real crawl
        # PDFs): most objects — catalog, page tree, fonts — hide inside
        # FlateDecode /ObjStm containers, and the trailer dict lives in the
        # /XRef stream's own dict instead of a `trailer` keyword. The
        # sequential scan above only sees the containers; merge the XRef
        # trailer FIRST (it may carry /Encrypt), then set up decryption,
        # then unpack — ObjStm container streams are themselves encrypted.
        for o in self.objects.values():
            if isinstance(o, StreamObj) and o.d.get("/Type") == "/XRef":
                for k, v in o.d.items():
                    self.trailer.setdefault(k, v)
        self._setup_decryption()
        for o in list(self.objects.values()):
            if isinstance(o, StreamObj) and o.d.get("/Type") == "/ObjStm":
                self._load_objstm(o)

    def _setup_decryption(self) -> None:
        """Standard security handler (public specs, ISO 32000-1 §7.6.3 and
        ISO 32000-2 §7.6.4): authenticate the EMPTY user password — the
        overwhelmingly common crawl case (permissions-restricted but freely
        openable) — and hold the file key for stream_bytes. Supported:
        RC4 (/V 1-2), AES-128 /AESV2 (/V 4), and AES-256 /AESV3 (/V 5,
        /R 5-6). Anything else (non-Standard filter, a real password)
        leaves ``encrypted_unsupported`` set and the extractor emits
        deterministic empty output as before."""
        self.crypt_key: Optional[bytes] = None
        self.crypt_aes = False
        self.encrypted_unsupported = False
        enc = self.resolve(self.trailer.get("/Encrypt"))
        if enc is None:
            return
        self.encrypted_unsupported = True  # until proven decryptable
        if not isinstance(enc, dict) or enc.get("/Filter") != "/Standard":
            return
        v = self.resolve(enc.get("/V", 0))
        r = self.resolve(enc.get("/R", 2))
        o = self.resolve(enc.get("/O"))
        u = self.resolve(enc.get("/U"))
        p = self.resolve(enc.get("/P"))
        if not (
            isinstance(v, int) and isinstance(r, int)
            and isinstance(o, bytes) and isinstance(u, bytes)
            and isinstance(p, int)
        ):
            return
        length = self.resolve(enc.get("/Length", 40))
        key_bytes = (length // 8) if isinstance(length, int) else 5
        encrypt_metadata = self.resolve(enc.get("/EncryptMetadata", True))
        aes = False
        if v == 4:
            cf = self.resolve(enc.get("/CF")) or {}
            stmf = self.resolve(enc.get("/StmF", "/Identity"))
            if stmf == "/Identity":
                # streams not encrypted at all — nothing to do
                self.encrypted_unsupported = False
                return
            cfd = self.resolve(cf.get(stmf)) if isinstance(cf, dict) else None
            cfm = self.resolve(cfd.get("/CFM")) if isinstance(cfd, dict) else None
            if cfm == "/AESV2":
                aes = True
                key_bytes = 16
            elif cfm != "/V2":
                return  # unknown crypt filter → unsupported
        elif v == 5 and r in (5, 6):
            # AES-256: /U is 48 bytes (hash + validation salt + key salt),
            # the file key is wrapped in /UE; no per-object key derivation.
            stmf = self.resolve(enc.get("/StmF", "/Identity"))
            if stmf == "/Identity":
                self.encrypted_unsupported = False
                return
            cf = self.resolve(enc.get("/CF")) or {}
            cfd = self.resolve(cf.get(stmf)) if isinstance(cf, dict) else None
            cfm = self.resolve(cfd.get("/CFM")) if isinstance(cfd, dict) else None
            if cfm != "/AESV3":
                return  # V5 with a non-AESV3 crypt filter: malformed, skip
            ue = self.resolve(enc.get("/UE"))
            if not isinstance(ue, bytes):
                return
            from corsearch_project_spark.webextract.pdfcrypt import (
                authenticate_r6_user,
            )

            key = authenticate_r6_user(b"", u, ue, r)
            if key is None:
                return  # real user password: stays skipped
            self.crypt_key = key
            self.crypt_aes = True
            self.encrypted_unsupported = False
            return
        elif v not in (1, 2):
            return  # unknown /V → unsupported
        ids = self.resolve(self.trailer.get("/ID"))
        id0 = b""
        if isinstance(ids, list) and ids:
            first = self.resolve(ids[0])
            if isinstance(first, bytes):
                id0 = first
        from corsearch_project_spark.webextract.pdfcrypt import (
            authenticate_user_password,
        )

        key = authenticate_user_password(
            b"", o, u, p, id0, r, key_bytes, bool(encrypt_metadata)
        )
        if key is None:
            return  # real user password: stays skipped
        self.crypt_key = key
        self.crypt_aes = aes
        self.encrypted_unsupported = False

    def _load_objstm(self, obj: StreamObj) -> None:
        """Unpack a compressed object stream: decoded body starts with N
        pairs of (object number, byte offset relative to /First)."""
        data = self.stream_bytes(obj)
        n = self.resolve(obj.d.get("/N"))
        first = self.resolve(obj.d.get("/First"))
        if not data or not isinstance(n, int) or not isinstance(first, int):
            return
        ints = [int(t) for t in re.findall(rb"\d+", data[:first])]
        for k in range(min(n, len(ints) // 2)):
            objnum, off = ints[2 * k], ints[2 * k + 1]
            try:
                val, _ = parse_object(data, first + off)
            except Exception:
                continue
            # first definition wins, same convention as the body scan
            # (objects in streams cannot themselves be streams)
            if objnum not in self.objects and not isinstance(val, StreamObj):
                self.objects[objnum] = val

    def resolve(self, v, depth: int = 0):
        while isinstance(v, Ref) and depth < 32:
            v = self.objects.get(v[0])
            depth += 1
        return v

    # -- E12: stream decode ------------------------------------------------
    def stream_bytes(self, obj) -> bytes:
        obj = self.resolve(obj)
        if not isinstance(obj, StreamObj):
            return b""
        raw = obj.raw
        # Decryption happens BEFORE filters (§7.6.2: encryption is applied
        # to the already-encoded stream data). XRef streams are never
        # encrypted (they must be readable to find /Encrypt itself).
        if getattr(self, "crypt_key", None) and obj.d.get("/Type") != "/XRef":
            from corsearch_project_spark.webextract.pdfcrypt import decrypt_stream

            raw = decrypt_stream(
                self.crypt_key, obj.num, obj.gen, raw, self.crypt_aes
            )
        filt = self.resolve(obj.d.get("/Filter"))
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        parms = self.resolve(obj.d.get("/DecodeParms", obj.d.get("/DP")))
        parms_list = parms if isinstance(parms, list) else [parms] * max(
            len(filters), 1
        )
        for idx, f in enumerate(filters):
            f = self.resolve(f)
            p = self.resolve(parms_list[idx]) if idx < len(parms_list) else None
            if f == "/FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except Exception:
                    try:
                        raw = zlib.decompressobj().decompress(raw)
                    except Exception:
                        return b""
            elif f == "/ASCIIHexDecode":
                hexs = re.sub(rb"[^0-9A-Fa-f]", b"", raw.split(b">")[0])
                if len(hexs) % 2:
                    hexs += b"0"
                raw = bytes.fromhex(hexs.decode("ascii"))
            elif f == "/ASCII85Decode":
                import base64

                body = raw.split(b"~>")[0]
                body = re.sub(rb"[\x00\t\n\x0c\r ]", b"", body)
                if body.startswith(b"<~"):
                    body = body[2:]
                try:
                    raw = base64.a85decode(body, adobe=False)
                except Exception:
                    return b""
            elif f == "/RunLengthDecode":
                raw = _rle_decode(raw)
            elif f == "/LZWDecode":
                raw = _lzw_decode(raw)
                if raw is None:
                    return b""
            else:
                return b""  # unsupported filter: deterministic empty
            if isinstance(p, dict):
                pred = self.resolve(p.get("/Predictor", 1))
                if isinstance(pred, int) and pred > 1:
                    raw = _unpredict(
                        raw,
                        pred,
                        int(self.resolve(p.get("/Columns", 1)) or 1),
                        int(self.resolve(p.get("/Colors", 1)) or 1),
                        int(self.resolve(p.get("/BitsPerComponent", 8)) or 8),
                    )
        return raw

    # -- page tree ----------------------------------------------------------
    def pages(self) -> List[dict]:
        root = self.resolve(self.trailer.get("/Root"))
        out: List[dict] = []

        def walk(node, depth=0):
            node = self.resolve(node)
            if not isinstance(node, (dict, StreamObj)) or depth > 64:
                return
            d = node.d if isinstance(node, StreamObj) else node
            t = d.get("/Type")
            if t == "/Pages" or (t is None and "/Kids" in d):
                for kid in self.resolve(d.get("/Kids")) or []:
                    walk(kid, depth + 1)
            elif t == "/Page":
                out.append(d)

        if isinstance(root, dict):
            walk(root.get("/Pages"))
        if not out:  # recovery: any object that looks like a page
            for o in self.objects.values():
                d = o.d if isinstance(o, StreamObj) else o
                if isinstance(d, dict) and d.get("/Type") == "/Page":
                    out.append(d)
        return out


# ---------------------------------------------------------------------------
# Fonts
# ---------------------------------------------------------------------------

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>")

# Embedded CMap streams used as a Type0 /Encoding (PDF 32000-1 §9.7.5.3):
# codespace ranges give the (possibly mixed 1-/2-byte) code widths, cid
# ranges/chars give code → CID.
_CODESPACE_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_CIDRANGE_RE = re.compile(rb"begincidrange(.*?)endcidrange", re.S)
_CIDCHAR_RE = re.compile(rb"begincidchar(.*?)endcidchar", re.S)
_CIDRANGE_ENT_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\d+)")
_CIDCHAR_ENT_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*(\d+)")

# Predefined CJK CMaps (PDF 32000-1 §9.7.5.2, Table 118). Shipping Adobe's
# CMap data files offline is impractical, but it is also unnecessary for
# TEXT extraction: each predefined encoding CMap is defined over a public
# legacy charset (or UCS-2/UTF-16 itself), so decoding the raw show-string
# bytes with the matching stdlib codec yields exactly the Unicode text the
# codes denote — including correct variable 1-/2-byte segmentation, which
# the legacy codecs handle natively. Keys are the CMap name minus the
# writing-mode suffix (-H/-V). "utf-16-be" marks the Uni*-UCS2/UTF16
# families where the code IS the Unicode value.
_PREDEF_CMAP_CODECS = {
    # Simplified Chinese (Adobe-GB1)
    "GB-EUC": "gb2312", "GBpc-EUC": "gb2312", "GBK-EUC": "gbk",
    "GBKp-EUC": "gbk", "GBK2K": "gb18030",
    "UniGB-UCS2": "utf-16-be", "UniGB-UTF16": "utf-16-be",
    # Traditional Chinese (Adobe-CNS1)
    "B5pc": "big5", "ETen-B5": "big5", "ETenms-B5": "big5",
    "HKscs-B5": "big5hkscs",
    "UniCNS-UCS2": "utf-16-be", "UniCNS-UTF16": "utf-16-be",
    # Japanese (Adobe-Japan1)
    "90ms-RKSJ": "shift_jis", "90msp-RKSJ": "shift_jis",
    "90pv-RKSJ": "shift_jis", "Add-RKSJ": "shift_jis",
    "Ext-RKSJ": "shift_jis", "EUC": "euc_jp",
    "UniJIS-UCS2": "utf-16-be", "UniJIS-UCS2-HW": "utf-16-be",
    "UniJIS-UTF16": "utf-16-be", "UniJIS2004-UTF16": "utf-16-be",
    # Korean (Adobe-Korea1 / KR)
    "KSC-EUC": "euc_kr", "KSCpc-EUC": "euc_kr",
    "KSCms-UHC": "cp949", "KSCms-UHC-HW": "cp949",
    "UniKS-UCS2": "utf-16-be", "UniKS-UTF16": "utf-16-be",
}


def _utf16be(hexs: bytes) -> str:
    b = bytes.fromhex(hexs.decode("ascii"))
    return b.decode("utf-16-be", errors="replace")


# Adobe Glyph List subset for /Differences arrays (public AGL): ASCII names,
# Latin-1 letters, and the typographic set real simple-font subsets remap.
# Single-character names map to themselves; uniXXXX / uXXXX(XX) names are
# handled algorithmically in _glyph_to_unicode per the AGL specification.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "aacute": "á", "agrave": "à", "acircumflex": "â", "adieresis": "ä",
    "aring": "å", "atilde": "ã", "ae": "æ", "ccedilla": "ç",
    "eacute": "é", "egrave": "è", "ecircumflex": "ê", "edieresis": "ë",
    "iacute": "í", "igrave": "ì", "icircumflex": "î", "idieresis": "ï",
    "ntilde": "ñ", "oacute": "ó", "ograve": "ò", "ocircumflex": "ô",
    "odieresis": "ö", "otilde": "õ", "oslash": "ø", "uacute": "ú",
    "ugrave": "ù", "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "ydieresis": "ÿ", "thorn": "þ", "eth": "ð", "germandbls": "ß",
    "Aacute": "Á", "Agrave": "À", "Acircumflex": "Â", "Adieresis": "Ä",
    "Aring": "Å", "Atilde": "Ã", "AE": "Æ", "Ccedilla": "Ç",
    "Eacute": "É", "Egrave": "È", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Iacute": "Í", "Igrave": "Ì", "Icircumflex": "Î", "Idieresis": "Ï",
    "Ntilde": "Ñ", "Oacute": "Ó", "Ograve": "Ò", "Ocircumflex": "Ô",
    "Odieresis": "Ö", "Otilde": "Õ", "Oslash": "Ø", "Uacute": "Ú",
    "Ugrave": "Ù", "Ucircumflex": "Û", "Udieresis": "Ü", "Yacute": "Ý",
    "Thorn": "Þ", "Eth": "Ð",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "guillemotleft": "«",
    "guillemotright": "»", "florin": "ƒ", "fraction": "⁄",
    "trademark": "™", "copyright": "©", "registered": "®",
    "degree": "°", "plusminus": "±", "mu": "µ", "paragraph": "¶",
    "periodcentered": "·", "cedilla": "¸", "onesuperior": "¹",
    "twosuperior": "²", "threesuperior": "³", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾", "questiondown": "¿",
    "exclamdown": "¡", "multiply": "×", "divide": "÷",
    "logicalnot": "¬", "brokenbar": "¦", "section": "§",
    "dieresis": "¨", "macron": "¯", "ordfeminine": "ª",
    "ordmasculine": "º", "acute": "´", "currency": "¤", "cent": "¢",
    "sterling": "£", "yen": "¥", "Euro": "€", "euro": "€",
    "fi": "ﬁ", "fl": "ﬂ",
    "dotlessi": "ı", "circumflex": "ˆ", "caron": "ˇ",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "tilde": "˜", "hungarumlaut": "˝",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž", "zcaron": "ž",
    "OE": "Œ", "oe": "œ", "Ydieresis": "Ÿ", "Lslash": "Ł",
    "lslash": "ł",
}


def _glyph_to_unicode(name: str) -> str:
    """AGL lookup with the spec's algorithmic fallbacks: single-character
    names are themselves; uniXXXX and uXXXX(XX) decode their hex code
    point; anything unknown is U+FFFD (deterministic, never raises)."""
    if len(name) == 1:
        return name
    got = _AGL.get(name)
    if got is not None:
        return got
    try:
        if name.startswith("uni") and len(name) >= 7:
            return chr(int(name[3:7], 16))
        if name.startswith("u") and 5 <= len(name) <= 7:
            return chr(int(name[1:], 16))
    except ValueError:
        pass
    return "�"


# Simple-font base encodings with stdlib codecs; /StandardEncoding and
# anything unknown fall back to latin-1 (deterministic superset decode).
_BASE_CODECS = {"/WinAnsiEncoding": "cp1252", "/MacRomanEncoding": "mac_roman"}


class FontDecoder:
    """Font decoder: ToUnicode CMap > WinAnsi > latin-1 for single-byte
    simple fonts, plus composite Type0/Identity-H fonts (2-byte CIDs, the
    encoding real Common-Crawl PDFs overwhelmingly use for subset-embedded
    TrueType/CJK fonts): codes are consumed big-endian two bytes at a time,
    mapped through the ToUnicode CMap when present, else Identity
    (CID == code point — the deterministic no-CMap fallback)."""

    def __init__(self, doc: PdfDoc, font_dict: dict):
        self.cmap: Optional[Dict[int, str]] = None
        self.byte_table: Optional[List[str]] = None
        self.cjk_codec: Optional[str] = None
        self.space_ranges: Optional[List[tuple]] = None
        self.cid_ranges: List[tuple] = []
        self.cid_chars: Dict[int, int] = {}
        enc = doc.resolve(font_dict.get("/Encoding")) if font_dict else None
        subtype = font_dict.get("/Subtype") if font_dict else None
        self.code_bytes = (
            2
            if subtype == "/Type0" or enc in ("/Identity-H", "/Identity-V")
            else 1
        )
        # Simple-font /Differences arrays (§9.6.6.3): an /Encoding DICT with
        # a /BaseEncoding and [code /name /name code /name ...] overrides —
        # the most common remaining real-crawl font shape after Type0
        # (round-2 verdict item 8). Build the full 256-entry table up front
        # so decode stays a flat per-byte lookup.
        if isinstance(enc, dict):
            base = doc.resolve(enc.get("/BaseEncoding"))
            codec = _BASE_CODECS.get(base, "latin-1")
            table = [
                bytes([b]).decode(codec, errors="replace") for b in range(256)
            ]
            diffs = doc.resolve(enc.get("/Differences"))
            if isinstance(diffs, list):
                code = 0
                for item in diffs:
                    item = doc.resolve(item)
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, str) and item.startswith("/"):
                        if 0 <= code < 256:
                            table[code] = _glyph_to_unicode(item[1:])
                        code += 1
            self.byte_table = table
            enc = base  # codec fallback below keys on the base encoding
        tu = doc.resolve(font_dict.get("/ToUnicode")) if font_dict else None
        if isinstance(tu, StreamObj):
            data = doc.stream_bytes(tu)
            cmap: Dict[int, str] = {}
            for m in _BFCHAR_RE.finditer(data):
                pairs = _HEXPAIR_RE.findall(m.group(1))
                for a, b in zip(pairs[0::2], pairs[1::2]):
                    cmap[int(a, 16)] = _utf16be(b)
            for m in _BFRANGE_RE.finditer(data):
                trip = _HEXPAIR_RE.findall(m.group(1))
                for lo, hi, dst in zip(trip[0::3], trip[1::3], trip[2::3]):
                    lo_i, hi_i = int(lo, 16), int(hi, 16)
                    base = int(dst, 16)
                    for k in range(lo_i, min(hi_i, lo_i + 255) + 1):
                        cmap[k] = chr(base + (k - lo_i))
            if cmap:
                self.cmap = cmap
        # Predefined CJK CMap named as /Encoding (§9.7.5.2): decode the raw
        # code bytes with the charset the CMap is defined over. For the
        # legacy multibyte charsets this ALWAYS wins — it is the only path
        # that segments mixed 1-/2-byte codes correctly (a fixed 2-byte
        # ToUnicode lookup would split shift_jis/gbk ASCII runs mid-code).
        # For the Uni*-UCS2/UTF16 families the code units are already
        # UTF-16BE, so a present ToUnicode CMap (authoritative per §9.10.2,
        # and correctly 2-byte-segmented here) keeps precedence.
        if isinstance(enc, str) and enc.startswith("/"):
            name = enc[1:-2] if enc.endswith(("-H", "-V")) else enc[1:]
            codec = _PREDEF_CMAP_CODECS.get(name)
            if codec == "utf-16-be":
                if self.cmap is None:
                    self.cjk_codec = codec
            elif codec:
                self.cjk_codec = codec
        # Embedded CMap stream as /Encoding (§9.7.5.3): parse codespace
        # ranges for variable-width code segmentation and cidchar/cidrange
        # for code → CID; text comes from ToUnicode when present, else the
        # deterministic chr(CID) / chr(code) fallback.
        elif isinstance(enc, StreamObj):
            data = doc.stream_bytes(enc)
            spaces: List[tuple] = []
            for m in _CODESPACE_RE.finditer(data):
                pairs = _HEXPAIR_RE.findall(m.group(1))
                for lo, hi in zip(pairs[0::2], pairs[1::2]):
                    w = (len(lo) + 1) // 2
                    if 1 <= w <= 4:
                        spaces.append((w, int(lo, 16), int(hi, 16)))
            if spaces:
                # shortest width first: 1-byte ASCII ranges must claim their
                # byte before any wider range is tried
                self.space_ranges = sorted(spaces)
            for m in _CIDRANGE_RE.finditer(data):
                for lo, hi, cid in _CIDRANGE_ENT_RE.findall(m.group(1)):
                    self.cid_ranges.append(
                        (int(lo, 16), int(hi, 16), int(cid))
                    )
            for m in _CIDCHAR_RE.finditer(data):
                for code, cid in _CIDCHAR_ENT_RE.findall(m.group(1)):
                    self.cid_chars[int(code, 16)] = int(cid)
        self.codec = (
            _BASE_CODECS.get(enc, "latin-1")
            if isinstance(enc, str)
            else "latin-1"
        )

    def _code_to_cid(self, code: int) -> int:
        hit = self.cid_chars.get(code)
        if hit is not None:
            return hit
        for lo, hi, cid in self.cid_ranges:
            if lo <= code <= hi:
                return cid + (code - lo)
        return code

    def _decode_embedded(self, raw: bytes) -> str:
        """Variable-width decode driven by the embedded CMap's codespace
        ranges: at each position the shortest range whose span contains the
        next bytes claims the code (spec matches by byte prefix; shortest-
        first is the deterministic simplification). Unmatched bytes are
        skipped one at a time, never raised."""
        out: List[str] = []
        cmap = self.cmap
        i, n = 0, len(raw)
        while i < n:
            for w, lo, hi in self.space_ranges:  # type: ignore[union-attr]
                if i + w <= n:
                    v = int.from_bytes(raw[i : i + w], "big")
                    if lo <= v <= hi:
                        if cmap is not None:
                            out.append(cmap.get(v, "�"))
                        else:
                            out.append(chr(self._code_to_cid(v)))
                        i += w
                        break
            else:
                i += 1
        return "".join(out)

    def decode(self, raw: bytes) -> str:
        if self.cjk_codec is not None:
            return raw.decode(self.cjk_codec, errors="replace")
        if self.space_ranges is not None:
            return self._decode_embedded(raw)
        if self.code_bytes == 2:
            # big-endian 2-byte CIDs; a dangling odd byte is dropped
            # deterministically (malformed show string, never raise)
            if self.cmap is not None:
                return "".join(
                    self.cmap.get((raw[k] << 8) | raw[k + 1], "�")
                    for k in range(0, len(raw) - 1, 2)
                )
            return "".join(
                chr((raw[k] << 8) | raw[k + 1]) for k in range(0, len(raw) - 1, 2)
            )
        if self.cmap is not None:
            return "".join(self.cmap.get(b, "�") for b in raw)
        if self.byte_table is not None:
            table = self.byte_table
            return "".join(table[b] for b in raw)
        return raw.decode(self.codec, errors="replace")


# ---------------------------------------------------------------------------
# E13: content-stream interpreter
# ---------------------------------------------------------------------------


@dataclass(slots=True)
class Run:
    text: str
    x: float
    y: float
    size: float


def _fonts_from_res(doc: PdfDoc, res: dict) -> Dict[str, "FontDecoder"]:
    fonts_d = doc.resolve(res.get("/Font"))
    fonts: Dict[str, FontDecoder] = {}
    if isinstance(fonts_d, dict):
        for name, fobj in fonts_d.items():
            fd = doc.resolve(fobj)
            if isinstance(fd, StreamObj):
                fd = fd.d
            if isinstance(fd, dict):
                fonts[name] = FontDecoder(doc, fd)
    return fonts


def _xobjects_from_res(doc: PdfDoc, res: dict) -> dict:
    xo = doc.resolve(res.get("/XObject"))
    return xo if isinstance(xo, dict) else {}


def _skip_inline_image(content: bytes, i: int) -> int:
    """Position just past the EI of a BI…ID…EI inline image. The binary
    payload can contain byte sequences that look like text operators, so
    the interpreter must jump over it, never tokenize it. Returns end of
    content on malformed input (skip-don't-raise)."""
    n = len(content)
    j = content.find(b"ID", i)
    if j < 0:
        return n
    j += 2
    if j < n and content[j] in _WS_SET:
        j += 1
    while True:
        k = content.find(b"EI", j)
        if k < 0:
            return n
        before_ok = k == 0 or content[k - 1] in _WS_SET
        after = content[k + 2 : k + 3]
        after_ok = not after or after[0] in _WS_SET or after[0] in _DELIM
        if before_ok and after_ok:
            return k + 2
        j = k + 2


def interpret_content(
    doc: PdfDoc,
    content: bytes,
    fonts: Dict[str, FontDecoder],
    xobjects: Optional[dict] = None,
    depth: int = 0,
) -> List[Run]:
    """Content-stream interpreter (E13). ``xobjects`` maps names to
    /Subtype /Form stream objects so `Do` recurses into form content —
    real crawl PDFs routinely put body text inside Form XObjects (headers,
    stamped pages, pdftex groups); without recursion that text is silently
    lost. Depth-capped at 8 (forms referencing forms; cycles impossible
    beyond the cap). A form's /Matrix translate+scale components map its
    runs into page space; skew terms are ignored (never emitted by the
    text-document generators this targets)."""
    runs: List[Run] = []
    i = 0
    n = len(content)
    stack: List[object] = []
    font: Optional[FontDecoder] = None
    size = 12.0
    tl = 0.0  # leading
    # text line matrix translation (text space; CTM ignored — fixtures use identity)
    lx = ly = 0.0  # line start
    cx = cy = 0.0  # current point
    sx = sy = 1.0  # Tm scale components (a, d)

    def est_width(s: str) -> float:
        return 0.5 * size * sx * len(s)

    def show(raw: bytes) -> None:
        nonlocal cx
        if font is None or not raw:
            txt = raw.decode("latin-1", errors="replace") if raw else ""
        else:
            txt = font.decode(raw)
        if txt:
            runs.append(Run(txt, cx, cy, size * sy))
            cx += est_width(txt)

    while i < n:
        v, i = parse_object(content, i)
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "op":
            op = v[1]
            a = stack
            if op == "Tf" and len(a) >= 2:
                name = a[-2]
                size = float(a[-1]) if isinstance(a[-1], (int, float)) else 12.0
                font = fonts.get(name if isinstance(name, str) else "")
            elif op == "Tm" and len(a) >= 6:
                try:
                    sx = float(a[-6])
                    sy = float(a[-3])
                    lx = cx = float(a[-2])
                    ly = cy = float(a[-1])
                except Exception:
                    pass
            elif op in ("Td", "TD") and len(a) >= 2:
                try:
                    tx, ty = float(a[-2]), float(a[-1])
                    lx += tx * sx
                    ly += ty * sy
                    cx, cy = lx, ly
                    if op == "TD":
                        tl = -ty
                except Exception:
                    pass
            elif op == "TL" and a:
                try:
                    tl = float(a[-1])
                except Exception:
                    pass
            elif op == "T*":
                ly -= tl * sy
                cx, cy = lx, ly
            elif op == "BT":
                lx = ly = cx = cy = 0.0
                sx = sy = 1.0
            elif op == "Tj" and a:
                if isinstance(a[-1], bytes):
                    show(a[-1])
            elif op in ("'", '"'):
                ly -= tl * sy
                cx, cy = lx, ly
                if a and isinstance(a[-1], bytes):
                    show(a[-1])
            elif op == "TJ" and a and isinstance(a[-1], list):
                for el in a[-1]:
                    if isinstance(el, bytes):
                        show(el)
                    elif isinstance(el, (int, float)):
                        cx -= el / 1000.0 * size * sx
            elif op == "BI":
                i = _skip_inline_image(content, i)
            elif op == "Do" and a and depth < 8:
                xo = (xobjects or {}).get(a[-1] if isinstance(a[-1], str) else "")
                xo = doc.resolve(xo)
                if isinstance(xo, StreamObj) and xo.d.get("/Subtype") == "/Form":
                    xres = doc.resolve(xo.d.get("/Resources")) or {}
                    if isinstance(xres, StreamObj):
                        xres = xres.d
                    xfonts = _fonts_from_res(doc, xres) if isinstance(xres, dict) else {}
                    xxobjs = _xobjects_from_res(doc, xres) if isinstance(xres, dict) else {}
                    child = interpret_content(
                        doc,
                        doc.stream_bytes(xo),
                        xfonts or fonts,  # forms often inherit page fonts
                        xxobjs or xobjects,
                        depth + 1,
                    )
                    m = doc.resolve(xo.d.get("/Matrix"))
                    ma, md, me, mf = 1.0, 1.0, 0.0, 0.0
                    if isinstance(m, list) and len(m) == 6:
                        try:
                            ma, md = float(m[0]), float(m[3])
                            me, mf = float(m[4]), float(m[5])
                        except Exception:
                            pass
                    if (ma, md, me, mf) == (1.0, 1.0, 0.0, 0.0):
                        runs.extend(child)
                    else:
                        runs.extend(
                            Run(r.text, ma * r.x + me, md * r.y + mf, r.size * md)
                            for r in child
                        )
            # Tc/Tw/ET/other operators: state tracked implicitly or ignored
            stack = []
        else:
            stack.append(v)
            if len(stack) > 64:
                stack = stack[-64:]
    return runs


# ---------------------------------------------------------------------------
# E14–E16: layout analysis
# ---------------------------------------------------------------------------


@dataclass(slots=True)
class Line:
    y: float
    x0: float
    x1: float
    size: float
    texts: List[Tuple[float, str]] = field(default_factory=list)

    def text(self) -> str:
        return " ".join(t for _, t in sorted(self.texts, key=lambda p: p[0]))


def cluster_lines(runs: List[Run], tol_frac: float) -> List[Line]:
    lines: List[Line] = []
    for r in sorted(runs, key=lambda r: (-r.y, r.x)):
        tol = tol_frac * max(r.size, 1.0)
        target: Optional[Line] = None
        for ln in lines:
            if abs(ln.y - r.y) <= tol:
                target = ln
                break
        if target is None:
            target = Line(r.y, r.x, r.x, r.size)
            lines.append(target)
        target.texts.append((r.x, r.text))
        target.x0 = min(target.x0, r.x)
        target.x1 = max(target.x1, r.x + 0.5 * r.size * len(r.text))
        target.size = max(target.size, r.size)
    return lines


def cluster_columns(runs: List[Run], col_gap: float) -> List[List[Run]]:
    """E16 column detection at the run level: project runs to x-intervals,
    merge intervals separated by less than ``col_gap`` points into column
    bands, assign each run to its band. Bands ordered left→right."""
    if not runs:
        return []
    ivals = sorted(
        (r.x, r.x + 0.5 * r.size * max(len(r.text), 1)) for r in runs
    )
    bands: List[List[float]] = [list(ivals[0])]
    for x0, x1 in ivals[1:]:
        if x0 <= bands[-1][1] + col_gap:
            bands[-1][1] = max(bands[-1][1], x1)
        else:
            bands.append([x0, x1])
    out: List[List[Run]] = [[] for _ in bands]
    starts = [b[0] for b in bands]
    for r in runs:
        # rightmost band whose start <= r.x (bisect, deterministic)
        lo, hi = 0, len(starts) - 1
        idx = 0
        while lo <= hi:
            mid = (lo + hi) // 2
            if starts[mid] <= r.x:
                idx = mid
                lo = mid + 1
            else:
                hi = mid - 1
        out[idx].append(r)
    return [band for band in out if band]


def lines_to_blocks(lines: List[Line], gap_frac: float) -> List[List[Line]]:
    blocks: List[List[Line]] = []
    cur: List[Line] = []
    prev: Optional[Line] = None
    for ln in sorted(lines, key=lambda l: (-l.y, l.x0)):
        if prev is not None and (prev.y - ln.y) > gap_frac * max(prev.size, 1.0):
            if cur:
                blocks.append(cur)
            cur = []
        cur.append(ln)
        prev = ln
    if cur:
        blocks.append(cur)
    return blocks


def _page_runs(doc: "PdfDoc", page: dict) -> List[Run]:
    """Resolve a page's resources + content stream(s) into positioned text
    runs — the shared front half of extract_pdf and pdf_tables."""
    res = doc.resolve(page.get("/Resources")) or {}
    if isinstance(res, StreamObj):
        res = res.d
    fonts = _fonts_from_res(doc, res) if isinstance(res, dict) else {}
    xobjs = _xobjects_from_res(doc, res) if isinstance(res, dict) else {}
    contents = doc.resolve(page.get("/Contents"))
    parts = contents if isinstance(contents, list) else [contents]
    content = b"\n".join(doc.stream_bytes(p) for p in parts if p is not None)
    return interpret_content(doc, content, fonts, xobjs)


def extract_pdf(data: bytes, rule: Rule = DEFAULT_RULE):
    """PDF bytes -> (text, spans). Spans index into the emitted text,
    kind = 'pdf:p<page_index>'."""
    try:
        doc = PdfDoc(data)
    except Exception:
        return "", []
    if getattr(doc, "encrypted_unsupported", False):
        # Standard-handler documents with an empty user password (the
        # common crawl case) are decrypted transparently in stream_bytes
        # (pdfcrypt: RC4, AES-128 /AESV2, AES-256 /AESV3 R5-6). Everything
        # else — real passwords, non-Standard handlers — is ciphertext:
        # emitting it would be deterministic NOISE, poison in a training
        # corpus. Detect and emit empty instead (skip-don't-raise).
        return "", []
    out_blocks: List[Tuple[str, str]] = []  # (block_text, kind)
    for pageno, page in enumerate(doc.pages(), start=1):
        runs = _page_runs(doc, page)
        if not runs:
            continue
        for col_runs in cluster_columns(runs, rule.pdf_col_gap):
            lines = cluster_lines(col_runs, rule.pdf_line_tol)
            for block in lines_to_blocks(lines, rule.pdf_block_gap):
                btxt = normalize_ws(" ".join(ln.text() for ln in block))
                if btxt:
                    out_blocks.append((btxt, f"pdf:p{pageno}"))
    text_parts: List[str] = []
    spans: List[Tuple[int, int, str]] = []
    pos = 0
    for btxt, kind in out_blocks:
        spans.append((pos, pos + len(btxt), kind))
        text_parts.append(btxt)
        pos += len(btxt) + 1  # joiner
    return "\n".join(text_parts), spans


# ---------------------------------------------------------------------------
# E24: ruling-free table detection (stream mode) over the layout runs
# ---------------------------------------------------------------------------
# Classic whitespace-alignment table recovery (the Tabula/Camelot "stream"
# family, from the published heuristics — no ruling lines needed, which
# crawl-PDF tables routinely lack once filters strip vector graphics):
# a table is a maximal group of >=3 consecutive text lines whose short
# fragments left-align into the same >=min_cols x-positions at uniform
# vertical pitch. Precision-oriented by design: 2-column groups are NOT
# reported by default because ruling-free stream mode cannot distinguish
# a 2-column table from 2-column prose (the same documented limitation the
# public stream-mode extractors carry); callers that know their domain has
# no multi-column prose can lower min_cols.


def _line_cells(ln: Line, cell_gap: float) -> List[Tuple[float, str]]:
    """Merge a line's x-sorted fragments into cells: a new cell starts when
    the gap from the previous fragment's estimated right edge exceeds
    cell_gap (TJ kerning splits sit ~3 pt apart and re-merge; genuine cell
    gutters are tens of points). Width estimate matches cluster_columns'."""
    frags = sorted(ln.texts, key=lambda p: p[0])
    cells: List[List[object]] = []  # [x0, right_edge, parts]
    for x, txt in frags:
        w = 0.5 * ln.size * max(len(txt), 1)
        if cells and x - cells[-1][1] <= cell_gap:
            cells[-1][1] = max(cells[-1][1], x + w)
            cells[-1][2].append(txt)
        else:
            cells.append([x, x + w, [txt]])
    return [(c[0], " ".join(c[2])) for c in cells]


def pdf_tables(
    data: bytes,
    rule: Rule = DEFAULT_RULE,
    min_cols: int = 3,
    min_rows: int = 3,
    cell_gap: float = 18.0,
    align_tol: float = 3.0,
    pitch_tol: float = 1.5,
    max_cell_tokens: int = 3,
) -> List[dict]:
    """PDF bytes -> detected tables, each
    ``{"page", "n_rows", "n_cols", "rows": [[cell, ...], ...]}``
    in reading order. Body streams of supported encrypted documents are
    decrypted transparently (same path as extract_pdf); unsupported
    encryption returns [] (skip-don't-raise)."""
    try:
        doc = PdfDoc(data)
    except Exception:
        return []
    if getattr(doc, "encrypted_unsupported", False):
        return []
    out: List[dict] = []
    for pageno, page in enumerate(doc.pages(), start=1):
        runs = _page_runs(doc, page)
        if not runs:
            continue
        lines = sorted(
            cluster_lines(runs, rule.pdf_line_tol), key=lambda l: (-l.y, l.x0)
        )
        cells_per_line = [_line_cells(ln, cell_gap) for ln in lines]

        def flush(group: List[int]) -> None:
            if len(group) < min_rows:
                return
            rows = [[txt for _, txt in cells_per_line[i]] for i in group]
            out.append(
                {
                    "page": pageno,
                    "n_rows": len(rows),
                    "n_cols": len(rows[0]),
                    "rows": rows,
                }
            )

        group: List[int] = []
        for i, cells in enumerate(cells_per_line):
            ok_shape = len(cells) >= min_cols and all(
                len(txt.split(" ")) <= max_cell_tokens for _, txt in cells
            )
            if ok_shape and group:
                prev = cells_per_line[group[-1]]
                aligned = len(cells) == len(prev) and all(
                    abs(a[0] - b[0]) <= align_tol for a, b in zip(cells, prev)
                )
                pitch = lines[group[-1]].y - lines[i].y
                if len(group) >= 2:
                    pitch0 = lines[group[0]].y - lines[group[1]].y
                    uniform = abs(pitch - pitch0) <= pitch_tol
                else:
                    uniform = True
                if aligned and uniform and pitch > 0:
                    group.append(i)
                    continue
            flush(group)
            group = [i] if ok_shape else []
        flush(group)
    return out


# ---------------------------------------------------------------------------
# Document assets: /Info metadata, link annotations, outline (bookmarks)
# ---------------------------------------------------------------------------
# The extraction tier's sibling outputs (SURVEY.md §2 E23): beyond body
# text, a crawl pipeline wants the document-level metadata PDF writers
# embed (the /Info dictionary), the outbound link targets carried by
# /Subtype /Link annotations (the PDF analogue of <a href> — the link
# discovery channel for documents, feeding the same host-graph/frontier
# relations HTML anchors do), and the /Outlines bookmark tree (the
# document's own table of contents — a structure signal body text loses).
#
# Policy for encrypted documents: strings in encrypted PDFs are themselves
# ciphertext (ISO 32000-1 §7.6.2; /StrF governs them under /V 4+). Body
# text decryption is stream-scoped and implemented (pdfcrypt); string-level
# decryption needs the *containing indirect object's* number for the
# per-object key, which the recovery-oriented scan does not track per
# nested value. Assets extraction therefore SKIPS encrypted documents
# deterministically (same skip-don't-raise stance as extract_pdf's
# unsupported-handler branch): emitting undecrypted metadata strings would
# be ciphertext noise in a catalog.

_PDF_DATE_RE = re.compile(
    rb"^D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?"
    rb"(?:([+\-Z])(?:(\d{2})'?(\d{2})?'?)?)?"
)


def _pdf_text_string(b: object) -> Optional[str]:
    """PDF text-string bytes -> str per ISO 32000-1 §7.9.2.2: UTF-16BE with
    BOM, UTF-8 with BOM (PDF 2.0), else PDFDocEncoding (decoded here as
    latin-1 — identical over the printable range fixtures and real crawl
    metadata use; the 8 PDFDocEncoding-specific punctuation codes in
    0x18–0x1F/0x80–0x9F are out of scope and decode to their latin-1
    cognates deterministically)."""
    if not isinstance(b, bytes):
        return None
    if b.startswith(b"\xfe\xff"):
        return b[2:].decode("utf-16-be", errors="replace")
    if b.startswith(b"\xef\xbb\xbf"):
        return b[3:].decode("utf-8", errors="replace")
    return b.decode("latin-1", errors="replace")


def _parse_pdf_date(b: object) -> Optional[str]:
    """``D:YYYYMMDDHHmmSS(+|-|Z)HH'mm'`` -> ISO-8601 string (date-only
    fields default per the spec: month/day to 01, time to 00). Returns
    None on anything that does not start with a plausible D:YYYY."""
    if not isinstance(b, bytes):
        return None
    m = _PDF_DATE_RE.match(b.strip())
    if not m:
        return None
    y = int(m.group(1))
    if not (1000 <= y <= 9999):
        return None
    mo = int(m.group(2) or 1)
    d = int(m.group(3) or 1)
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    if not (1 <= mo <= 12 and 1 <= d <= 31 and hh < 24 and mi < 60 and ss < 61):
        return None
    iso = f"{y:04d}-{mo:02d}-{d:02d}T{hh:02d}:{mi:02d}:{ss:02d}"
    tz = m.group(7)
    if tz == b"Z":
        iso += "+00:00"
    elif tz in (b"+", b"-"):
        iso += f"{tz.decode()}{int(m.group(8) or 0):02d}:{int(m.group(9) or 0):02d}"
    return iso


def pdf_info(doc: PdfDoc) -> dict:
    """Trailer /Info dictionary -> {title, author, subject, producer,
    created}; absent or malformed fields are None."""
    info = doc.resolve(doc.trailer.get("/Info"))
    if isinstance(info, StreamObj):
        info = info.d
    if not isinstance(info, dict):
        return {"title": None, "author": None, "subject": None,
                "producer": None, "created": None}
    return {
        "title": _pdf_text_string(doc.resolve(info.get("/Title"))),
        "author": _pdf_text_string(doc.resolve(info.get("/Author"))),
        "subject": _pdf_text_string(doc.resolve(info.get("/Subject"))),
        "producer": _pdf_text_string(doc.resolve(info.get("/Producer"))),
        "created": _parse_pdf_date(doc.resolve(info.get("/CreationDate"))),
    }


def pdf_links(doc: PdfDoc, max_links: int = 512) -> List[Tuple[int, str]]:
    """(page_number, uri) for every /Subtype /Link annotation whose action
    is /S /URI, in page order then /Annots array order. ``max_links`` caps
    adversarial annotation floods (crawl-safety bound, like the DOM depth
    cap)."""
    out: List[Tuple[int, str]] = []
    for pageno, page in enumerate(doc.pages(), start=1):
        annots = doc.resolve(page.get("/Annots"))
        if not isinstance(annots, list):
            continue
        for a in annots:
            a = doc.resolve(a)
            if not isinstance(a, dict) or a.get("/Subtype") != "/Link":
                continue
            act = doc.resolve(a.get("/A"))
            if not isinstance(act, dict) or act.get("/S") != "/URI":
                continue
            uri = _pdf_text_string(doc.resolve(act.get("/URI")))
            if uri:
                out.append((pageno, uri))
                if len(out) >= max_links:
                    return out
    return out


def pdf_outline(doc: PdfDoc, max_items: int = 256) -> List[Tuple[int, str]]:
    """Flattened /Outlines bookmark tree as (depth, title) in document
    order (pre-order walk over /First → /Next chains). Cycle-safe: each
    outline object is visited at most once; depth capped at 32."""
    root = doc.resolve(doc.trailer.get("/Root"))
    if not isinstance(root, dict):
        return []
    out: List[Tuple[int, str]] = []
    seen: set = set()

    def walk(ref, depth: int) -> None:
        while ref is not None and len(out) < max_items and depth <= 32:
            key = ref[0] if isinstance(ref, Ref) else id(ref)
            if key in seen:
                return
            seen.add(key)
            node = doc.resolve(ref)
            if not isinstance(node, dict):
                return
            title = _pdf_text_string(doc.resolve(node.get("/Title")))
            if title is not None:
                out.append((depth, title))
            if node.get("/First") is not None:
                walk(node.get("/First"), depth + 1)
            ref = node.get("/Next")

    outlines = doc.resolve(root.get("/Outlines"))
    if isinstance(outlines, dict):
        walk(outlines.get("/First"), 0)
    return out


def extract_pdf_assets(data: bytes) -> dict:
    """PDF bytes -> document assets for the catalog table: Info metadata +
    link-annotation URIs + flattened outline. Encrypted documents and parse
    failures yield the deterministic empty shape (never raises) so the
    Arrow kernel's output arrays stay total over the input batch."""
    empty = {"title": None, "author": None, "subject": None, "producer": None,
             "created": None, "links": [], "outline": []}
    try:
        doc = PdfDoc(data)
    except Exception:
        return empty
    if getattr(doc, "encrypted_unsupported", False) or getattr(
        doc, "crypt_key", None
    ):
        return empty
    try:
        out = dict(pdf_info(doc))
        out["links"] = pdf_links(doc)
        out["outline"] = pdf_outline(doc)
        return out
    except Exception:
        return empty
