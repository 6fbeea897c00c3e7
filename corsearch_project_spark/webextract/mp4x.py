"""Minimal ISO-BMFF (MP4) box parser — stdlib-only, metadata only.

The video arm of the multimodal surface needs container METADATA (brand,
duration, track layout, frame size) without any codec: the ISO base media
file format (ISO/IEC 14496-12, public) is a pure box tree, so the probe is
~100 lines of struct reads. Pixel/frame DECODE stays behind the
library/ffmpeg seam in operators/multimodal.py — this module never touches
sample data, only `ftyp`/`moov` headers, mirroring what a crawl-scale
media-metadata pass actually does (codec work is dispatched later, on the
tiny surviving fraction).

Box grammar: [size:u32BE][type:4bytes][payload]; size==1 -> u64 largesize
follows; size==0 -> box extends to end of enclosing scope. Parsed boxes:
  ftyp  major_brand
  moov  container
  mvhd  timescale + duration (version 0 and 1 layouts)
  trak  container
  tkhd  width/height as 16.16 fixed point (v0/v1 layouts)
  mdia/hdlr  handler_type ('vide' / 'soun')
Everything else is skipped by size. Malformed input raises ValueError (the
caller maps that to decode_ok=False — never fabricated metadata).
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional, Tuple

_CONTAINERS = {b"moov", b"trak", b"mdia"}


def _iter_boxes(data: bytes, start: int, end: int) -> Iterator[Tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in [start, end)."""
    i = start
    while i + 8 <= end:
        size = struct.unpack_from(">I", data, i)[0]
        btype = data[i + 8 - 4 : i + 8]
        payload = i + 8
        if size == 1:
            if payload + 8 > end:
                raise ValueError("truncated largesize")
            size = struct.unpack_from(">Q", data, payload)[0]
            payload += 8
            if size < 16:
                raise ValueError("bad largesize")
        elif size == 0:
            size = end - i
        elif size < 8:
            raise ValueError("bad box size")
        box_end = i + size
        if box_end > end:
            raise ValueError("box overruns scope")
        yield btype, payload, box_end
        i = box_end


def _parse_mvhd(data: bytes, s: int, e: int) -> Tuple[int, int]:
    version = data[s]
    if version == 1:
        timescale = struct.unpack_from(">I", data, s + 4 + 16)[0]
        duration = struct.unpack_from(">Q", data, s + 4 + 20)[0]
    else:
        timescale = struct.unpack_from(">I", data, s + 4 + 8)[0]
        duration = struct.unpack_from(">I", data, s + 4 + 12)[0]
    return timescale, duration


def _parse_tkhd(data: bytes, s: int, e: int) -> Tuple[int, int]:
    version = data[s]
    # after version+flags: v0 times/ids/duration = 20 bytes, v1 = 32;
    # then reserved8, layer2, alt_group2, volume2, reserved2, matrix36.
    base = s + 4 + (32 if version == 1 else 20) + 8 + 2 + 2 + 2 + 2 + 36
    width = struct.unpack_from(">I", data, base)[0] >> 16
    height = struct.unpack_from(">I", data, base + 4)[0] >> 16
    return width, height


def probe_mp4(data: bytes) -> dict:
    """Parse container metadata from MP4/ISO-BMFF bytes.

    Returns dict(major_brand, timescale, duration_ms, n_tracks, width,
    height, has_video, has_audio); width/height come from the first video
    track. Raises ValueError on anything that is not a well-formed box
    tree with a moov/mvhd."""
    major_brand: Optional[str] = None
    timescale = duration = None
    n_tracks = 0
    width = height = None
    has_video = has_audio = False

    def walk(start: int, end: int, in_trak_dims) -> None:
        nonlocal major_brand, timescale, duration, n_tracks
        nonlocal width, height, has_video, has_audio
        for btype, s, e in _iter_boxes(data, start, end):
            if btype == b"ftyp" and major_brand is None:
                if e - s < 8:
                    raise ValueError("short ftyp")
                major_brand = data[s : s + 4].decode("latin-1")
            elif btype == b"mvhd":
                timescale, duration = _parse_mvhd(data, s, e)
            elif btype == b"trak":
                n_tracks += 1
                walk(s, e, [None, None])
            elif btype == b"tkhd" and in_trak_dims is not None:
                in_trak_dims[0], in_trak_dims[1] = _parse_tkhd(data, s, e)
            elif btype == b"hdlr" and in_trak_dims is not None:
                handler = data[s + 8 : s + 12]
                if handler == b"vide":
                    has_video = True
                    if width is None:
                        width, height = in_trak_dims
                elif handler == b"soun":
                    has_audio = True
            elif btype in _CONTAINERS:
                walk(s, e, in_trak_dims)

    walk(0, len(data), None)
    if timescale is None or not timescale:
        raise ValueError("no mvhd")
    return {
        "major_brand": major_brand or "",
        "timescale": timescale,
        "duration_ms": (duration * 1000) // timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "has_video": has_video,
        "has_audio": has_audio,
    }


# ----------------------------------------------------------- fixture writer


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4(
    timescale: int,
    duration: int,
    video: Optional[Tuple[int, int]] = None,
    audio: bool = False,
    brand: bytes = b"isom",
) -> bytes:
    """Serialize a minimal valid box tree (ftyp + moov with mvhd and one
    trak per track) — enough for probe_mp4 and for any standards-compliant
    box walker; carries no sample data."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0x200) + brand)
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IH2x8x36x24xI", 0x00010000, 0x0100, 2 + (1 if video else 0) + (1 if audio else 0)),
    )
    traks = b""

    def trak(handler: bytes, w: int = 0, h: int = 0, track_id: int = 1) -> bytes:
        tkhd = _box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIIxxxxI", 0, 0, track_id, duration)
            + b"\x00" * 8
            + struct.pack(">HHHxx", 0, 0, 0x0100 if handler == b"soun" else 0)
            + b"\x00" * 36
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _box(b"hdlr", struct.pack(">B3x4x", 0) + handler + b"\x00" * 13)
        return _box(b"trak", tkhd + _box(b"mdia", hdlr))

    tid = 1
    if video is not None:
        traks += trak(b"vide", video[0], video[1], tid)
        tid += 1
    if audio:
        traks += trak(b"soun", track_id=tid)
    return ftyp + _box(b"moov", mvhd + traks)
