"""Multimodal column support: image/audio/video as opaque ``binary``
columns with typed metadata (SURVEY training-data mandate).

The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested. The *decoders* are stubs:
the container ships no image/audio libraries (no PIL/ffmpeg/librosa), so
every decode/resize stage takes a ``decoder`` seam ("auto" | "pil" |
"stub"): auto tries the real library and falls back to a clearly-marked
deterministic fake; "stub" pins the fake for codec-independent oracles. At
cluster scale you install the codec libraries on executors and flip the
seam — every plan stays identical.

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

    ``decoder``: "auto" (PIL when importable, else stub), "pil" (require the
    real codec), or "stub" (force the deterministic fake — what the oracle
    replays, codec-independent). The seam is the argument, not the code:
    deploying with real codecs changes only this flag."""
    if decoder not in ("auto", "pil", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    pil = _try_pil() if decoder in ("auto", "pil") else None
    if decoder == "pil" and pil is None:
        raise NotImplementedError("decoder='pil' requires PIL on executors")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [],
                   "decode_ok": [], "decoder": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                decoder = "pil" if pil else "stub"
                try:
                    if pil:
                        import io

                        with pil.open(io.BytesIO(payload)) as im:
                            w, h = im.size
                            c = len(im.getbands())
                    else:
                        w, h, c = _decode_image_stub(bytes(payload or b""))
                    ok = True
                except Exception:
                    w = h = c = None
                    ok = False
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["decode_ok"].append(ok)
                out["decoder"].append(decoder)
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
    """Decode → resize → re-encode, the fat-row transform stage. Real path
    uses PIL per Arrow batch; the stub arm (same fallback shape as
    decode_image_meta) emits a deterministic fixed-size surface — 'IMG!'
    header with the new dimensions plus payload-hash-derived bytes sized
    width*height (bounded 4 KiB) — so the end-to-end plumbing (binary in,
    binary out, batch sizing for fat rows) runs and is testable without
    codecs. Deploying swaps decoder='auto'→real PIL; the plan is identical."""
    if decoder not in ("auto", "pil", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    pil = _try_pil() if decoder in ("auto", "pil") else None
    if decoder == "pil" and pil is None:
        raise NotImplementedError("decoder='pil' requires PIL on executors")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
