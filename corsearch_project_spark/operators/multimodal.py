"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata (SURVEY training-data mandate).

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested. Decoders run through a
``decoder`` seam ("auto" | "pil" | "png" | "stub"):

  * ``png`` — a REAL codec: the pure-stdlib PNG decode/resize/encode in
    ``webextract/pngx.py`` (zlib inflate + un-filter; round-4 addition, so
    the real-codec path executes in this codec-less sandbox);
  * ``pil`` — the library seam for every other format (JPEG/WebP); raises
    when PIL is absent;
  * ``stub`` — the clearly-marked deterministic fake, for
    codec-independent oracles;
  * ``auto`` — PIL when importable, else the stdlib PNG codec for PNG
    payloads, else the stub.

At cluster scale you install the codec libraries on executors and flip
the seam — every plan stays identical.

Design notes for 100 TB of media:
  * payloads stay in Parquet binary columns co-partitioned with their
    metadata — no separate blob fetches on the hot path;
  * all decode/feature stages are iterator-of-batches mapInPandas so codec
    contexts initialize once per task, and Arrow moves bytes JVM↔Python
    zero-copy;
  * arrow.maxRecordsPerBatch must be sized down for fat rows (a 4 MB image
    × 10k-row default batch = 40 GB of Arrow buffer — use 64-256).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source_url", T.StringType(), True),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)

FEATURE_DIM = 64

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ]
)


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _decode_image_stub(payload: bytes):
    """Deterministic fake decode: dimensions derived from a fixed-width
    header we also use in the synthetic fixture ('IMG!' + w + h + c as
    big-endian u16/u16/u8), else from the payload hash. CLEARLY A STUB —
    swap for PIL/Image.open at deployment."""
    if payload[:4] == b"IMG!" and len(payload) >= 9:
        w, h = struct.unpack(">HH", payload[4:8])
        c = payload[8]
        return int(w), int(h), int(c)
    d = hashlib.md5(payload).digest()
    return 64 + d[0] % 192, 64 + d[1] % 192, 3


def decode_image_meta(
    media: DataFrame, batch_size_hint: int = 256, decoder: str = "auto"
) -> DataFrame:
    """Image header decode as an iterator-of-batches stage (U2 shape).

    ``decoder``: "auto" (PIL when importable, else the stdlib PNG codec
    for PNG payloads / the stdlib JPEG marker probe for JPEG payloads,
    else stub), "pil" (require the real library), "png" (require the
    stdlib codec — non-PNG payloads report ``decode_ok=False``), "jpeg"
    (require the stdlib SOF marker probe, metadata only), or "stub"
    (force the deterministic fake — what the codec-independent oracle
    replays). The seam is the argument, not the code: deploying with real
    codecs changes only this flag. The PNG metadata probe parses IHDR
    only — no inflate — and the JPEG probe walks marker headers only, so
    a 4 MB payload costs a few-byte header read either way."""
    if decoder not in ("auto", "pil", "png", "jpeg", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    pil = _try_pil() if decoder in ("auto", "pil") else None
    if decoder == "pil" and pil is None:
        raise NotImplementedError("decoder='pil' requires PIL on executors")
    mode = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from corsearch_project_spark.webextract import jpegx, pngx

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [],
                   "decode_ok": [], "decoder": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload or b"")
                try:
                    if pil:
                        import io

                        with pil.open(io.BytesIO(data)) as im:
                            w, h = im.size
                            c = len(im.getbands())
                        used, ok = "pil", True
                    elif mode == "png" or (mode == "auto" and pngx.is_png(data)):
                        used = "png"
                        w, h, c = pngx.png_meta(data)
                        ok = True
                    elif mode == "jpeg" or (
                        mode == "auto" and jpegx.is_jpeg(data)
                    ):
                        used = "jpeg"
                        w, h, c = jpegx.jpeg_meta(data)
                        ok = True
                    else:
                        used = "stub"
                        w, h, c = _decode_image_stub(data)
                        ok = True
                except Exception:
                    w = h = c = None
                    ok = False
                    used = "pil" if pil else mode
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["decode_ok"].append(ok)
                out["decoder"].append(used)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        run, IMAGE_META_SCHEMA
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction: real path would run a vision/audio encoder per
    Arrow batch (GPU-friendly batch shape); the stub emits a deterministic
    unit-norm vector seeded by the payload digest so downstream similarity
    plumbing (operators.simsearch) is testable end-to-end."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                seed = int.from_bytes(
                    hashlib.sha256(bytes(payload or b"")).digest()[:8], "big"
                )
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(FEATURE_DIM).astype(np.float32)
                v /= np.linalg.norm(v) or 1.0
                ids.append(mid)
                feats.append(v.tolist())
            yield pd.DataFrame(
                {"media_id": ids, "feature": feats, "decoder": ["stub"] * len(ids)}
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 4) -> DataFrame:
    """Video frame sampling. A real implementation seeks keyframes with a
    demuxer; the stub slices the payload into fixed-size pseudo-frames so
    the (1 video row → N frame rows) fan-out plumbing is real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_index": [], "frame_payload": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload or b"")
                chunk = max(1, len(data) // (every_n * max_frames) or 1)
                for k in range(max_frames):
                    off = k * every_n * chunk
                    if off >= len(data):
                        break
                    out["media_id"].append(mid)
                    out["frame_index"].append(k)
                    out["frame_payload"].append(data[off : off + chunk])
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        run, FRAME_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)


def resize_images(
    media: DataFrame, width: int, height: int, decoder: str = "auto"
) -> DataFrame:
    """Decode → resize → re-encode, the fat-row transform stage. The PNG
    arm is a REAL transform (stdlib decode → nearest-neighbor resample →
    re-encode, webextract/pngx.py); PIL covers other formats when
    installed; the stub arm emits a deterministic fixed-size surface —
    'IMG!' header with the new dimensions plus payload-hash-derived bytes
    sized width*height (bounded 4 KiB) — so the end-to-end plumbing
    (binary in, binary out, batch sizing for fat rows) runs and is
    testable without any codec. The plan is identical across arms."""
    if decoder not in ("auto", "pil", "png", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    pil = _try_pil() if decoder in ("auto", "pil") else None
    if decoder == "pil" and pil is None:
        raise NotImplementedError("decoder='pil' requires PIL on executors")
    mode = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from corsearch_project_spark.webextract import pngx

        for pdf in batches:
            out = {"media_id": [], "payload": [], "width": [], "height": [],
                   "decoder": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload or b"")
                if pil:
                    import io

                    with pil.open(io.BytesIO(data)) as im:
                        im = im.resize((width, height))
                        buf = io.BytesIO()
                        im.save(buf, format="PNG")
                        body = buf.getvalue()
                    dec = "pil"
                elif mode == "png" or (mode == "auto" and pngx.is_png(data)):
                    w0, h0, c0, px = pngx.decode_png(data)
                    body = pngx.encode_png(
                        pngx.resize_nearest(px, w0, h0, c0, width, height),
                        width, height, c0,
                    )
                    dec = "png"
                else:
                    n = min(width * height, 4096)
                    seed = hashlib.sha256(data).digest()
                    body = (
                        b"IMG!"
                        + struct.pack(">HH", width, height)
                        + bytes([3])
                        + (seed * (n // len(seed) + 1))[:n]
                    )
                    dec = "stub"
                out["media_id"].append(mid)
                out["payload"].append(body)
                out["width"].append(width)
                out["height"].append(height)
                out["decoder"].append(dec)
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, RESIZED_SCHEMA)
    )


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_width", T.IntegerType(), True),  # bytes/sample
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)


def _decode_audio_stub(payload: bytes):
    d = hashlib.md5(payload).digest()
    return 8000 * (1 + d[0] % 6), 1 + d[1] % 2, 2, 256 + d[2]


def decode_audio_meta(media: DataFrame, decoder: str = "auto") -> DataFrame:
    """Audio header decode (same iterator-of-batches shape as the image
    stage). The ``wav`` arm is a REAL codec: stdlib ``wave`` parses the
    RIFF/PCM container (rate, channels, sample width, frame count) — like
    the PNG arm, it needs nothing the sandbox lacks. Compressed formats
    (mp3/ogg/flac) stay behind the library seam; under ``auto`` a non-RIFF
    payload falls to the stub, and under ``decoder='wav'`` it reports
    ``decode_ok=False`` — never fabricated metadata."""
    if decoder not in ("auto", "wav", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    mode = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "channels": [],
                   "sample_width": [], "n_frames": [], "decode_ok": [],
                   "decoder": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload or b"")
                try:
                    if mode == "wav" or (mode == "auto" and data[:4] == b"RIFF"):
                        used = "wav"
                        with wave.open(io.BytesIO(data)) as w:
                            rate, ch = w.getframerate(), w.getnchannels()
                            sw, nf = w.getsampwidth(), w.getnframes()
                        ok = True
                    else:
                        used = "stub"
                        rate, ch, sw, nf = _decode_audio_stub(data)
                        ok = True
                except Exception:
                    rate = ch = sw = nf = None
                    ok, used = False, mode
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["channels"].append(ch)
                out["sample_width"].append(sw)
                out["n_frames"].append(nf)
                out["decode_ok"].append(ok)
                out["decoder"].append(used)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        run, AUDIO_META_SCHEMA
    )


def wav_fixture_params(i: int, seed: int = 83) -> tuple:
    """(sample_rate, channels, n_frames) for fixture clip ``i`` — the
    pure-Python replay the VALUES oracle uses."""
    import random

    rng = random.Random((seed << 21) ^ i)
    return (
        rng.choice([8000, 16000, 22050, 44100]),
        rng.choice([1, 2]),
        rng.randint(64, 2048),
    )


def gen_wav_fixture(spark, n: int = 30, seed: int = 83) -> DataFrame:
    """Deterministic REAL-WAV media table: every payload is a valid
    RIFF/PCM-16 file (stdlib ``wave`` writer) with seeded params and a
    position-derived sample pattern."""
    import io
    import struct as _struct
    import wave

    rows = []
    for i in range(n):
        rate, ch, nf = wav_fixture_params(i, seed)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(2)
            w.setframerate(rate)
            samples = [
                ((k * 257 + c * 1031 + i * 7) % 32768) - 16384
                for k in range(nf)
                for c in range(ch)
            ]
            w.writeframes(_struct.pack(f"<{len(samples)}h", *samples))
        rows.append(
            (i, "audio", buf.getvalue(), "audio/wav",
             f"https://media.example.com/wav/{i}")
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def png_fixture_dims(i: int, seed: int = 71) -> tuple:
    """(width, height, channels) for fixture image ``i`` — the pure-Python
    replay the VALUES oracle uses (no Spark, no codec)."""
    import random

    rng = random.Random((seed << 20) ^ i)
    return rng.randint(8, 48), rng.randint(8, 48), rng.choice([1, 3, 4])


def gen_png_fixture(spark, n: int = 40, seed: int = 71) -> DataFrame:
    """Deterministic REAL-PNG media table: every payload is a valid PNG
    (encoded by webextract/pngx.py) with seeded dimensions/channels and a
    position-derived pixel pattern, so the real-codec decode arm has an
    executable, byte-stable corpus in this codec-less sandbox."""
    from corsearch_project_spark.webextract.pngx import encode_png

    rows = []
    for i in range(n):
        w, h, c = png_fixture_dims(i, seed)
        px = bytes(
            (x * 7 + y * 13 + ch * 31 + i) & 0xFF
            for y in range(h)
            for x in range(w)
            for ch in range(c)
        )
        rows.append(
            (i, "image", encode_png(px, w, h, c), "image/png",
             f"https://media.example.com/png/{i}")
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def jpeg_fixture_dims(i: int, seed: int = 53) -> tuple:
    """Seeded (width, height, channels) for the JPEG header fixtures."""
    import random

    rng = random.Random(seed * 100003 + i)
    return rng.randint(16, 4096), rng.randint(16, 4096), rng.choice((1, 3))


def gen_jpeg_fixture(spark, n: int = 30, seed: int = 53) -> DataFrame:
    """Deterministic JPEG *header* media table: every payload is a
    well-formed JPEG marker stream (SOI/APP0/SOF0/EOI, built by
    webextract/jpegx.py) with seeded dimensions. Header-only — the stdlib
    probe under test never reads entropy-coded data, so none is emitted;
    full pixel decode stays behind the PIL seam."""
    from corsearch_project_spark.webextract.jpegx import make_jpeg_header_fixture

    rows = []
    for i in range(n):
        w, h, c = jpeg_fixture_dims(i, seed)
        rows.append(
            (i, "image", make_jpeg_header_fixture(w, h, c), "image/jpeg",
             f"https://media.example.com/jpg/{i}")
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def gen_media_fixture(spark, n: int = 60, seed: int = 99) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA, including
    stub-decodable 'IMG!' headers."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random(seed ^ i)
        kind = rng.choice(["image", "image", "audio", "video"])
        if kind == "image":
            w, h, c = rng.randint(16, 512), rng.randint(16, 512), rng.choice([1, 3, 4])
            payload = b"IMG!" + struct.pack(">HH", w, h) + bytes([c]) + bytes(
                rng.getrandbits(8) for _ in range(rng.randint(64, 256))
            )
            mime = "image/x-stub"
        else:
            payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(256, 2048)))
            mime = f"{kind}/x-stub"
        rows.append((i, kind, payload, mime, f"https://media.example.com/{kind}/{i}"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ------------------------------------------------------------------ video

VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("major_brand", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_tracks", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("has_audio", T.BooleanType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)


def _decode_video_stub(payload: bytes):
    d = hashlib.md5(payload).digest()
    return ("stub", 1000 * (1 + d[0] % 120), 1 + d[1] % 3,
            160 * (1 + d[2] % 8), 90 * (1 + d[2] % 8), bool(d[3] % 2))


def decode_video_meta(media: DataFrame, decoder: str = "auto") -> DataFrame:
    """Video container-metadata decode — same iterator-of-batches shape as
    the image/audio stages. The ``mp4`` arm is a REAL parser: stdlib
    ISO-BMFF box walking (webextract/mp4x.py) reads brand, duration,
    track layout and frame size from ftyp/moov — which is all a
    crawl-scale media-metadata pass needs; SAMPLE decode (frames/pixels)
    stays behind the ffmpeg seam (sample_frames). Under ``auto`` a
    payload without an ftyp/moov signature falls to the stub; under
    ``decoder='mp4'`` it reports decode_ok=False — never fabricated
    metadata."""
    if decoder not in ("auto", "mp4", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    mode = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from corsearch_project_spark.webextract.mp4x import probe_mp4

        cols = ("media_id", "major_brand", "duration_ms", "n_tracks",
                "width", "height", "has_audio", "decode_ok", "decoder")
        for pdf in batches:
            out = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload or b"")
                looks_bmff = data[4:8] in (b"ftyp", b"moov")
                brand = dur = nt = w = h = ha = None
                try:
                    if mode == "mp4" or (mode == "auto" and looks_bmff):
                        used = "mp4"
                        m = probe_mp4(data)
                        brand, dur, nt = (m["major_brand"],
                                          m["duration_ms"], m["n_tracks"])
                        w, h, ha = m["width"], m["height"], m["has_audio"]
                    else:
                        used = "stub"
                        used_, dur, nt, w, h, ha = _decode_video_stub(data)
                        brand = ""
                    ok = True
                except Exception:
                    ok, used = False, mode
                out["media_id"].append(mid)
                out["major_brand"].append(brand)
                out["duration_ms"].append(dur)
                out["n_tracks"].append(nt)
                out["width"].append(w)
                out["height"].append(h)
                out["has_audio"].append(ha)
                out["decode_ok"].append(ok)
                out["decoder"].append(used)
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        run, VIDEO_META_SCHEMA
    )


def mp4_fixture_params(i: int, seed: int = 67) -> tuple:
    """(timescale, duration, width, height, has_audio) for fixture clip i
    — the pure-Python replay the VALUES oracle uses."""
    import random

    rng = random.Random((seed << 23) ^ i)
    timescale = rng.choice([600, 1000, 90000])
    duration = rng.randint(1, 600) * timescale // rng.choice([1, 2, 4])
    w16 = rng.randint(4, 120)
    return (timescale, duration, w16 * 16, (w16 * 9 // 16) * 16 or 16,
            rng.random() < 0.7)


def gen_mp4_fixture(spark, n: int = 30, seed: int = 67) -> DataFrame:
    """Deterministic REAL-MP4 media table: every payload is a valid
    ISO-BMFF box tree (ftyp + moov/mvhd/trak) built by
    webextract/mp4x.build_mp4 — no sample data, container only."""
    from corsearch_project_spark.webextract.mp4x import build_mp4

    rows = []
    for i in range(n):
        ts, dur, w, h, ha = mp4_fixture_params(i, seed)
        payload = build_mp4(ts, dur, video=(w, h), audio=ha)
        rows.append(
            (i, "video", payload, "video/mp4",
             f"https://media.example.com/mp4/{i}")
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ------------------------------------------------- image dHash near-dup

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), False),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("decoder", T.StringType(), False),
    ]
)


def _luma(px: bytes, channels: int) -> bytes:
    """8-bit luma plane from an interleaved surface (Rec.601 integer
    weights for RGB(A); gray(+alpha) takes the gray channel)."""
    if channels == 1:
        return px
    out = bytearray(len(px) // channels)
    if channels == 2:
        out[:] = px[0::2]
        return bytes(out)
    for i in range(len(out)):
        o = i * channels
        out[i] = (299 * px[o] + 587 * px[o + 1] + 114 * px[o + 2]) // 1000
    return bytes(out)


def _dhash_bits(gray: bytes, w: int, h: int) -> int:
    """Row-wise gradient hash: bit (y*(w-1)+x) set iff g[y][x] > g[y][x+1].
    Returned as a SIGNED 64-bit value (two's complement) so it lands in a
    Spark LongType and XOR/bit_count distance math works unchanged."""
    v = 0
    for y in range(h):
        row = y * w
        for x in range(w - 1):
            if gray[row + x] > gray[row + x + 1]:
                v |= 1 << (y * (w - 1) + x)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_dhash(media: DataFrame, decoder: str = "auto") -> DataFrame:
    """64-bit difference hash per image — the perceptual fingerprint for
    image-level near-dup detection (Krawetz's dHash; the standard cheap
    screen against resized/re-encoded duplicates in multimodal training
    sets). Pipeline per payload: decode → luma → nearest-resample to 9×8
    → row-wise gradient bits. The PNG arm is REAL (stdlib codec,
    webextract/pngx.py); PIL covers other formats when installed; the
    stub arm hashes payload bytes (decode_ok=false) so the plumbing runs
    codec-less. Downstream, the (media_id, dhash) relation reuses
    operators/dedup.simhash_pairs(bits=64) — pigeonhole chunk banding,
    linear shuffle, no all-pairs — so image near-dup rides the exact
    plan shape already proven for text SimHash."""
    if decoder not in ("auto", "pil", "png", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    pil = _try_pil() if decoder in ("auto", "pil") else None
    if decoder == "pil" and pil is None:
        raise NotImplementedError("decoder='pil' requires PIL on executors")
    mode = decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from corsearch_project_spark.webextract import pngx

        for pdf in batches:
            out = {"media_id": [], "dhash": [], "decode_ok": [], "decoder": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload or b"")
                if mode in ("png", "auto") and pngx.is_png(data):
                    w0, h0, c0, px = pngx.decode_png(data)
                    gray = _luma(px, c0)
                    small = pngx.resize_nearest(gray, w0, h0, 1, 9, 8)
                    hv, ok, dec = _dhash_bits(small, 9, 8), True, "png"
                elif pil:
                    import io

                    with pil.open(io.BytesIO(data)) as im:
                        g = im.convert("L").resize((9, 8))
                        small = g.tobytes()
                    hv, ok, dec = _dhash_bits(small, 9, 8), True, "pil"
                else:
                    d = hashlib.sha256(data).digest()[:8]
                    raw = int.from_bytes(d, "big")
                    hv = raw - (1 << 64) if raw >= (1 << 63) else raw
                    ok, dec = False, "stub"
                out["media_id"].append(mid)
                out["dhash"].append(hv)
                out["decode_ok"].append(ok)
                out["decoder"].append(dec)
            yield pd.DataFrame(out)

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, DHASH_SCHEMA)
    )


def _staircase_row(bits_row: list[int]) -> bytes:
    """9 luma values realizing the 8 requested gradient bits exactly:
    bit=1 -> strictly descending step, bit=0 -> strictly ascending step
    (never equal, so g[x] > g[x+1] is unambiguous). Start 128, step 8:
    range stays within [64, 192]."""
    g = [128]
    for b in bits_row:
        g.append(g[-1] - 8 if b else g[-1] + 8)
    return bytes(g)


def neardup_cluster_patterns(n_clusters: int, seed: int = 41):
    """Deterministic 64-bit dhash bit patterns per cluster, pairwise far
    apart (LCG-scrambled; any two differ in ~32 bits >> any sane
    threshold), each given as 8 rows x 8 bits."""
    pats = []
    for k in range(n_clusters):
        v = (seed * 2654435761 + k * 40503 + 12345) & ((1 << 64) - 1)
        v = (v ^ (v >> 29)) * 0x9E3779B97F4A7C15 & ((1 << 64) - 1)
        v ^= v >> 32
        pats.append([[(v >> (y * 8 + x)) & 1 for x in range(8)] for y in range(8)])
    return pats


def gen_png_neardup_fixture(spark, n_clusters: int = 12, seed: int = 41):
    """(media_id, kind, payload) of REAL 9x8 grayscale PNGs in known
    near-dup clusters: member 0 = base pattern, member 1 = byte-identical
    re-encode (distance 0), member 2 (even clusters only) = base with
    TWO gradient bits flipped (distance exactly 2). Expected pair
    relation is computable from the construction without running any
    hash — see png_neardup_expected_pairs."""
    from corsearch_project_spark.webextract.pngx import encode_png

    rows = []
    for k, pat in enumerate(neardup_cluster_patterns(n_clusters, seed)):
        def img(p):
            return encode_png(
                b"".join(_staircase_row(r) for r in p), 9, 8, 1
            )

        base = img(pat)
        rows.append((k * 10 + 0, "image", bytearray(base)))
        rows.append((k * 10 + 1, "image", bytearray(base)))
        if k % 2 == 0:
            p2 = [list(r) for r in pat]
            p2[1][3] ^= 1
            p2[6][5] ^= 1
            rows.append((k * 10 + 2, "image", bytearray(img(p2))))
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )


def png_neardup_expected_pairs(n_clusters: int = 12):
    """The by-construction truth for gen_png_neardup_fixture under
    max_hamming >= 2: per cluster (a=k*10) pairs (a,a+1,0), and for even
    k also (a,a+2,2) and (a+1,a+2,2). Cross-cluster patterns differ by
    ~32 bits — never candidates."""
    out = []
    for k in range(n_clusters):
        a = k * 10
        out.append((a, a + 1, 0))
        if k % 2 == 0:
            out.append((a, a + 2, 2))
            out.append((a + 1, a + 2, 2))
    return out
