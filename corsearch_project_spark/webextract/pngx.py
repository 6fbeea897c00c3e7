"""Minimal pure-stdlib PNG codec (public spec: W3C PNG / RFC 2083).

Round-3 verdict item 6: the multimodal operators' real-codec arm could
never execute in-sandbox because no image library ships here. PNG is the
one raster format that needs nothing beyond ``zlib`` + ``struct``, so this
module implements the subset a crawl pipeline's image plumbing needs —
8-bit greyscale/RGB/greyscale-alpha/RGBA, non-interlaced, all five row
filters — and becomes the ``decoder='png'`` arm of
``operators/multimodal.py``. JPEG/WebP still require the PIL seam.

Scope is deliberate: decode (full un-filter), IHDR-only metadata probe
(cheap path for ``decode_image_meta`` — no inflate), nearest-neighbor
resize, and encode (filter-0 rows). Unsupported variants (16-bit,
palette, interlaced) raise ``ValueError`` deterministically, which the
operator layer maps to ``decode_ok=False`` — never garbage pixels.
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIG


def png_meta(data: bytes) -> Tuple[int, int, int]:
    """(width, height, channels) from IHDR alone — no inflate, no pixel
    pass; the metadata probe costs a 33-byte header parse regardless of
    payload size."""
    if not is_png(data) or len(data) < 33:
        raise ValueError("not a PNG")
    length, typ = struct.unpack(">I4s", data[8:16])
    if typ != b"IHDR" or length != 13:
        raise ValueError("IHDR not first chunk")
    w, h, depth, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data[16:29])
    if zlib.crc32(data[12:29]) != struct.unpack(">I", data[29:33])[0]:
        raise ValueError("IHDR CRC mismatch")
    if depth != 8 or inter != 0 or comp != 0 or filt != 0:
        raise ValueError("unsupported PNG variant (need 8-bit non-interlaced)")
    c = _CHANNELS.get(ctype)
    if c is None:
        raise ValueError(f"unsupported color type {ctype}")
    if not (0 < w < 1 << 24 and 0 < h < 1 << 24):
        raise ValueError("bad dimensions")
    return w, h, c


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa = p - a if p >= a else a - p
    pb = p - b if p >= b else b - p
    pc = p - c if p >= c else c - p
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes, max_pixels: int = 64 << 20) -> Tuple[int, int, int, bytes]:
    """(width, height, channels, row-major 8-bit pixel bytes). Verifies
    chunk CRCs; ``max_pixels`` bombs out decompression-bomb headers before
    allocating (crawl payloads are untrusted)."""
    w, h, c = png_meta(data)
    if w * h > max_pixels:
        raise ValueError("image exceeds max_pixels")
    idat = bytearray()
    pos = 33  # after IHDR
    while pos + 8 <= len(data):
        length, typ = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        crc = data[pos + 8 + length : pos + 12 + length]
        if len(crc) == 4 and zlib.crc32(typ + body) != struct.unpack(">I", crc)[0]:
            raise ValueError(f"CRC mismatch in {typ!r}")
        if typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if not idat:
        raise ValueError("no IDAT")
    stride = w * c
    expect = (stride + 1) * h
    # cap inflation at the declared pixel size: a payload whose compressed
    # stream expands past IHDR's promise is malformed (or a bomb) either way
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expect)
    if dec.unconsumed_tail or dec.decompress(b"", 1):
        raise ValueError("IDAT inflates past declared dimensions")
    if len(raw) != expect:
        raise ValueError("pixel data length mismatch")
    out = bytearray(stride * h)
    prev = bytes(stride)
    for y in range(h):
        base = y * (stride + 1)
        f = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        if f == 1:  # Sub
            for i in range(c, stride):
                row[i] = (row[i] + row[i - c]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - c] if i >= c else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = row[i - c] if i >= c else 0
                ul = prev[i - c] if i >= c else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter byte {f}")
        out[y * stride : (y + 1) * stride] = row
        prev = bytes(row)
    return w, h, c, bytes(out)


def encode_png(pixels: bytes, width: int, height: int, channels: int) -> bytes:
    """Row-major 8-bit pixels -> PNG bytes (filter 0 every row, one IDAT).
    Deterministic: fixed zlib level, no ancillary chunks — the fixture
    generator and the resize stage both rely on byte-stable output."""
    ctype = _COLOR_TYPE.get(channels)
    if ctype is None:
        raise ValueError(f"channels must be 1/2/3/4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample (the deterministic choice: no float
    filtering, so output is reproducible across platforms)."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("target dimensions must be positive")
    out = bytearray(new_w * new_h * channels)
    src_stride = width * channels
    dst_stride = new_w * channels
    for y in range(new_h):
        sy = y * height // new_h
        srow = sy * src_stride
        drow = y * dst_stride
        for x in range(new_w):
            s = srow + (x * width // new_w) * channels
            d = drow + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)
