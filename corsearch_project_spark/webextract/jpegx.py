"""Pure-stdlib JPEG header probe (JFIF/EXIF marker scan -> dimensions).

The multimodal metadata path (``operators/multimodal.decode_image_meta``)
needs image dimensions without shipping a codec library to executors. For
PNG the repo carries a full stdlib codec (``pngx``); JPEG pixel decode
(Huffman + DCT) is out of scope and stays behind the PIL seam, but the
*metadata* lives in plain marker segments that ISO/IEC 10918-1 (ITU T.81
§B) defines publicly: scan SOI -> marker segments until a Start-Of-Frame
(SOFn) marker, whose fixed-layout payload carries height, width and the
component count.

Bomb-safe by construction: the scan walks marker *headers* only (never
entropy-coded data — it stops at SOS), touches at most ``_SCAN_CAP`` bytes,
and a malformed stream raises ``ValueError`` (callers map that to
``decode_ok=False``).
"""

from __future__ import annotations

from typing import Tuple

# SOFn markers that carry frame dimensions. 0xC4 (DHT), 0xC8 (JPG
# extension), 0xCC (DAC) sit in the same numeric range but are not frames.
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
# Standalone markers with no length field.
_NO_PAYLOAD = frozenset({0x01, 0xD8}) | frozenset(range(0xD0, 0xD8))

_SCAN_CAP = 1 << 16  # metadata lives in the first segments; never scan MBs


def is_jpeg(data: bytes) -> bool:
    return data[:2] == b"\xff\xd8"


def jpeg_meta(data: bytes) -> Tuple[int, int, int]:
    """-> (width, height, channels) from the first SOFn segment.

    Raises ValueError on anything that is not a well-formed JPEG header
    stream (missing SOI, bad marker alignment, truncation, SOS/EOI before
    any SOF).
    """
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    n = min(len(data), _SCAN_CAP)
    i = 2
    while i + 2 <= n:
        if data[i] != 0xFF:
            raise ValueError(f"bad marker alignment at {i}")
        j = i + 1
        while j < n and data[j] == 0xFF:  # fill bytes are legal padding
            j += 1
        if j >= n:
            break
        marker = data[j]
        i = j + 1
        if marker in _NO_PAYLOAD:
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if i + 2 > n:
            break
        seglen = (data[i] << 8) | data[i + 1]
        if seglen < 2:
            raise ValueError(f"bad segment length {seglen} at {i}")
        if marker in _SOF_MARKERS:
            if seglen < 8 or i + 8 > n:
                raise ValueError("truncated SOF segment")
            height = (data[i + 3] << 8) | data[i + 4]
            width = (data[i + 5] << 8) | data[i + 6]
            channels = data[i + 7]
            if width == 0 or height == 0 or channels == 0:
                raise ValueError("zero dimension in SOF")
            return width, height, channels
        if marker == 0xDA:  # SOS: entropy-coded data follows; no SOF seen
            break
        i += seglen
    raise ValueError("no SOF marker found")


def make_jpeg_header_fixture(width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic header-only JPEG (SOI + JFIF APP0 + DQT stub + SOF0 +
    EOI) for testing the metadata probe. NOT a decodable image — the probe
    under test never reads entropy-coded data, so none is emitted."""
    if not (0 < width < 65536 and 0 < height < 65536 and 0 < channels < 256):
        raise ValueError("fixture dims out of range")
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof_body = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof_body += bytes([channels])
    for c in range(channels):
        sof_body += bytes([c + 1, 0x11, 0])
    out = b"\xff\xd8"
    out += b"\xff\xe0" + (len(app0) + 2).to_bytes(2, "big") + app0
    out += b"\xff\xc0" + (len(sof_body) + 2).to_bytes(2, "big") + sof_body
    out += b"\xff\xd9"
    return out
