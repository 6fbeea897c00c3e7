"""Multimodal plumbing tests: schemas, Arrow batch shapes, fan-out, and
stub-decoder determinism (the decode bodies are stubs by design — no codec
libs in the container; see operators/multimodal.py docstring)."""

import pytest

from pyspark.sql import functions as F

from corsearch_project_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    df = M.gen_media_fixture(spark, n=60, seed=99).cache()
    df.count()
    return df


def test_image_meta_decode(spark, media):
    meta = M.decode_image_meta(media)
    rows = meta.collect()
    n_images = media.where(F.col("kind") == "image").count()
    assert len(rows) == n_images
    assert all(r["decode_ok"] for r in rows)
    # stub-decodable header: dimensions must round-trip exactly
    assert all(16 <= r["width"] <= 512 and 16 <= r["height"] <= 512 for r in rows)
    assert all(r["channels"] in (1, 3, 4) for r in rows)
    assert meta.schema == M.IMAGE_META_SCHEMA


def test_feature_extraction_deterministic_and_normed(spark, media):
    f1 = {r["media_id"]: r["feature"] for r in M.extract_features(media).collect()}
    f2 = {r["media_id"]: r["feature"] for r in M.extract_features(media).collect()}
    assert f1 == f2, "stub features must be deterministic"
    assert all(len(v) == M.FEATURE_DIM for v in f1.values())
    norms = [sum(x * x for x in v) for v in f1.values()]
    assert all(abs(n - 1.0) < 1e-3 for n in norms)


def test_features_feed_similarity_search(spark, media):
    """The media feature column plugs straight into the simsearch operator
    (same array<float> shape as the embeddings table)."""
    from corsearch_project_spark.operators.simsearch import brute_force_topk

    feats = M.extract_features(media).select(
        F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    qid = feats.select(F.min("vec_id")).first()[0]
    top = brute_force_topk(feats, query_vec_id=qid, k=5)
    rows = top.collect()
    assert len(rows) == 5
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in rows)


def test_frame_sampling_fanout(spark, media):
    frames = M.sample_frames(media, every_n=4, max_frames=3)
    rows = frames.collect()
    n_videos = media.where(F.col("kind") == "video").count()
    assert n_videos > 0
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {
        r["media_id"] for r in media.where(F.col("kind") == "video").collect()
    }
    for mid, fr in by_id.items():
        assert 1 <= len(fr) <= 3
        assert sorted(f["frame_index"] for f in fr) == list(range(len(fr)))
        assert all(len(f["frame_payload"]) > 0 for f in fr)


def test_resize_stub_arm_end_to_end(spark, media):
    """resize_images now has a stub arm (same seam as decode_image_meta):
    binary in -> binary out with the requested dims, deterministic, and the
    emitted surface is itself stub-decodable (round-trips through
    decode_image_meta)."""
    out = M.resize_images(media, 224, 224, decoder="stub").collect()
    n_images = media.where(F.col("kind") == "image").count()
    assert len(out) == n_images
    for r in out:
        assert (r["width"], r["height"], r["decoder"]) == (224, 224, "stub")
        assert bytes(r["payload"][:4]) == b"IMG!"
    # determinism: second run bit-identical
    again = M.resize_images(media, 224, 224, decoder="stub").collect()
    assert sorted(bytes(r["payload"]) for r in out) == sorted(
        bytes(r["payload"]) for r in again
    )
    # the resized surface round-trips through the stub meta decoder
    resized_media = M.resize_images(media, 224, 224, decoder="stub").select(
        "media_id", "payload"
    ).withColumn("kind", F.lit("image"))
    meta = M.decode_image_meta(resized_media, decoder="stub").collect()
    assert all((m["width"], m["height"]) == (224, 224) for m in meta)


def test_resize_pil_decoder_requires_pil(spark, media):
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            M.resize_images(media, 224, 224, decoder="pil")


def _pil_or_none():
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


@pytest.mark.skipif(_pil_or_none() is None, reason="PIL not installed (offline container)")
def test_real_codec_pil_arm_decodes_and_resizes(spark):
    """Exercises the decoder='pil' seam wherever codecs exist (round-2
    verdict item 7): real PNG bytes decode to their true dimensions and
    resize re-encodes decodable PNGs at the target size. In this container
    the test auto-skips; on any codec-equipped machine it runs."""
    import io

    Image = _pil_or_none()
    rows = []
    for i, (w, h) in enumerate([(32, 16), (64, 64), (120, 40)]):
        im = Image.new("RGB", (w, h), (i * 40, 10, 200))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        rows.append((f"m{i}", "image", buf.getvalue()))
    media = spark.createDataFrame(rows, "media_id string, kind string, payload binary")

    meta = {m["media_id"]: m for m in M.decode_image_meta(media, decoder="pil").collect()}
    assert meta["m0"]["width"] == 32 and meta["m0"]["height"] == 16
    assert all(m["decoder"] == "pil" and m["decode_ok"] for m in meta.values())

    out = M.resize_images(media, 224, 224, decoder="pil").collect()
    for r in out:
        with Image.open(io.BytesIO(bytes(r["payload"]))) as im2:
            assert im2.size == (224, 224)
