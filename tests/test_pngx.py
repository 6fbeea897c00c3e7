"""Pure-stdlib PNG codec (webextract/pngx.py): encode/decode round-trips,
all five row filters un-filter correctly, metadata probe, resize, and
deterministic rejection of unsupported/corrupt input. No Spark session —
these are plain unit tests."""

import struct
import zlib

import pytest

from corsearch_project_spark.webextract import pngx


def _pattern(w, h, c, salt=0):
    return bytes(
        (x * 7 + y * 13 + ch * 31 + salt) & 0xFF
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_roundtrip_all_channel_counts(c):
    w, h = 13, 9  # odd sizes: no accidental stride alignment
    px = _pattern(w, h, c)
    data = pngx.encode_png(px, w, h, c)
    assert pngx.is_png(data)
    assert pngx.png_meta(data) == (w, h, c)
    assert pngx.decode_png(data) == (w, h, c, px)


def test_encode_deterministic():
    px = _pattern(20, 20, 3)
    assert pngx.encode_png(px, 20, 20, 3) == pngx.encode_png(px, 20, 20, 3)


def _encode_with_filters(px, w, h, c, filters):
    """Hand-build a PNG whose rows use the given filter types (forward
    transform per the spec) — exercises every un-filter branch, which
    encode_png (filter 0 only) cannot."""
    stride = w * c
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = px[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        raw.append(f)
        for i in range(stride):
            left = row[i - c] if i >= c else 0
            up = prev[i]
            ul = prev[i - c] if i >= c else 0
            if f == 0:
                v = row[i]
            elif f == 1:
                v = (row[i] - left) & 0xFF
            elif f == 2:
                v = (row[i] - up) & 0xFF
            elif f == 3:
                v = (row[i] - ((left + up) >> 1)) & 0xFF
            else:
                v = (row[i] - pngx._paeth(left, up, ul)) & 0xFF
            raw.append(v)
        prev = row

    def chunk(typ, body):
        return struct.pack(">I", len(body)) + typ + body + struct.pack(
            ">I", zlib.crc32(typ + body)
        )

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        pngx.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_all_filter_types_unfilter(filters):
    w, h, c = 11, 10, 3
    px = _pattern(w, h, c, salt=5)
    data = _encode_with_filters(px, w, h, c, filters)
    assert pngx.decode_png(data) == (w, h, c, px)


def test_resize_nearest_exact():
    # 2x2 checkerboard upscaled 2x: each source pixel becomes a 2x2 block
    px = bytes([0, 255, 255, 0])
    out = pngx.resize_nearest(px, 2, 2, 1, 4, 4)
    assert out == bytes(
        [0, 0, 255, 255,
         0, 0, 255, 255,
         255, 255, 0, 0,
         255, 255, 0, 0]
    )
    # identity resize is a no-op
    assert pngx.resize_nearest(px, 2, 2, 1, 2, 2) == px


def test_rejects_corrupt_and_unsupported():
    px = _pattern(8, 8, 3)
    good = pngx.encode_png(px, 8, 8, 3)
    # flipped bit in IDAT -> CRC mismatch
    bad = bytearray(good)
    bad[41] ^= 0x01
    with pytest.raises(ValueError):
        pngx.decode_png(bytes(bad))
    # not a PNG at all
    with pytest.raises(ValueError):
        pngx.png_meta(b"IMG!" + b"\x00" * 40)
    # 16-bit depth header -> unsupported, deterministically
    deep = bytearray(good)
    deep[24] = 16  # bit-depth byte inside IHDR
    # fix the IHDR CRC so the depth check (not CRC) rejects it
    deep[29:33] = struct.pack(">I", zlib.crc32(bytes(deep[12:29])))
    with pytest.raises(ValueError):
        pngx.png_meta(bytes(deep))
    # bomb guard: huge declared dims rejected before inflate
    bomb = bytearray(good)
    bomb[16:20] = struct.pack(">I", 1 << 20)
    bomb[20:24] = struct.pack(">I", 1 << 20)
    bomb[29:33] = struct.pack(">I", zlib.crc32(bytes(bomb[12:29])))
    with pytest.raises(ValueError):
        pngx.decode_png(bytes(bomb))


def test_fuzz_never_crashes_only_valueerror():
    """Crawl payloads are untrusted: arbitrary junk — including
    truncations and bit-flips of a VALID file — must raise ValueError (or
    zlib/struct errors wrapped upstream as decode_ok=False), never hang or
    return garbage silently. Seeded, deterministic."""
    import random
    import zlib as _z

    rng = random.Random(1234)
    good = pngx.encode_png(_pattern(12, 7, 3), 12, 7, 3)
    for trial in range(300):
        kind = trial % 3
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        elif kind == 1:
            data = good[: rng.randrange(0, len(good))]
        else:
            b = bytearray(good)
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            data = bytes(b)
        try:
            w, h, c, px = pngx.decode_png(data)
            # a surviving mutation must still produce a shape-consistent
            # result (e.g. an IDAT bit-flip caught by CRC can't get here)
            assert len(px) == w * h * c
        except (ValueError, _z.error, EOFError, struct.error):
            pass


def _pil_or_none():
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


@pytest.mark.skipif(_pil_or_none() is None, reason="PIL not installed")
def test_parity_with_pil():
    """On codec-equipped hosts: our decode agrees with PIL pixel-for-pixel
    and our encode is readable by PIL."""
    import io

    Image = _pil_or_none()
    w, h, c = 17, 11, 3
    px = _pattern(w, h, c)
    data = pngx.encode_png(px, w, h, c)
    with Image.open(io.BytesIO(data)) as im:
        assert im.size == (w, h)
        assert im.tobytes() == px
    # and PIL-written PNGs decode with our codec
    im2 = Image.frombytes("RGB", (w, h), px)
    buf = io.BytesIO()
    im2.save(buf, format="PNG")
    assert pngx.decode_png(buf.getvalue())[3] == px
