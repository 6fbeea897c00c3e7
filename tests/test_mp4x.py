"""ISO-BMFF box parser (webextract/mp4x.py) and the multimodal video arm.

The registry parity gate checks q_multimodal_mp4 against its VALUES
oracle; this file pins the parser itself: round-trips through the fixture
writer, v1 box layouts, largesize, malformed-input rejection, and the
decode_ok=False path of decode_video_meta.
"""

import struct

import pytest

from corsearch_project_spark.webextract.mp4x import _box, build_mp4, probe_mp4


def test_round_trip_video_audio():
    m = probe_mp4(build_mp4(90000, 270000, video=(1280, 720), audio=True))
    assert m == {
        "major_brand": "isom", "timescale": 90000, "duration_ms": 3000,
        "n_tracks": 2, "width": 1280, "height": 720,
        "has_video": True, "has_audio": True,
    }


def test_audio_only_and_zero_duration():
    m = probe_mp4(build_mp4(1000, 5000, audio=True))
    assert (m["n_tracks"], m["width"], m["has_video"], m["has_audio"]) == (
        1, None, False, True)
    assert probe_mp4(build_mp4(600, 0, video=(64, 48)))["duration_ms"] == 0


def test_version1_mvhd_and_tkhd():
    # hand-build v1 boxes (64-bit times/duration) — the writer emits v0
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQIQ", 0, 0, 48000, 96000)
        + b"\x00" * (4 + 2 + 2 + 8 + 36 + 24 + 4),
    )
    tkhd = _box(
        b"tkhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQIxxxxQ", 0, 0, 1, 96000)
        + b"\x00" * (8 + 2 + 2 + 2 + 2 + 36)
        + struct.pack(">II", 320 << 16, 240 << 16),
    )
    hdlr = _box(b"hdlr", struct.pack(">B3x4x", 0) + b"vide" + b"\x00" * 13)
    trak = _box(b"trak", tkhd + _box(b"mdia", hdlr))
    m = probe_mp4(_box(b"moov", mvhd + trak))
    assert (m["timescale"], m["duration_ms"], m["width"], m["height"]) == (
        48000, 2000, 320, 240)


def test_largesize_box():
    payload = struct.pack(">B3x", 0) + struct.pack(">IIII", 0, 0, 1000, 4000) \
        + b"\x00" * (4 + 2 + 2 + 8 + 36 + 24 + 4)
    large_mvhd = struct.pack(">I", 1) + b"mvhd" + struct.pack(
        ">Q", 16 + len(payload)) + payload
    m = probe_mp4(_box(b"moov", large_mvhd))
    assert (m["timescale"], m["duration_ms"]) == (1000, 4000)


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"\x00\x00\x00\x04xxxx",            # size < 8
        b"\x00\x00\x00\xffmoovshort",        # overruns scope
        b"RIFF\x00\x00\x00\x00WAVE",        # not BMFF at all
        build_mp4(1000, 10)[:20],            # truncated
    ],
)
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        probe_mp4(bad)


def test_decode_video_meta_strict_mode_flags_non_mp4(spark):
    from corsearch_project_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_video_meta, gen_mp4_fixture,
    )

    good = gen_mp4_fixture(spark, n=4, seed=67)
    junk = spark.createDataFrame(
        [(99, "video", b"definitely not an mp4", "video/mp4", "u")],
        MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r
            for r in decode_video_meta(good.union(junk), decoder="mp4").collect()}
    assert len(rows) == 5
    assert rows[99]["decode_ok"] is False and rows[99]["duration_ms"] is None
    assert all(rows[i]["decode_ok"] for i in range(4))


def test_decode_video_meta_auto_falls_to_stub(spark):
    from corsearch_project_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_video_meta,
    )

    junk = spark.createDataFrame(
        [(1, "video", b"no box signature here....", "video/x-stub", "u")],
        MEDIA_SCHEMA,
    )
    r = decode_video_meta(junk, decoder="auto").collect()[0]
    assert r["decoder"] == "stub" and r["decode_ok"] is True
