"""Multimodal plumbing tests (operators/multimodal.py): binary payload
construction, Arrow-batched feature extraction, frame-sampling fan-out —
all verified against independent Python recomputations."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from tests.conftest import SF_SMALL


def _expected_payload(doc_id: int) -> bytes:
    blocks = 1 + doc_id % 8
    return b"".join(
        bytes.fromhex(hashlib.md5(f"media|{doc_id}|{j}".encode()).hexdigest())
        for j in range(blocks)
    )


def test_media_payload_construction(spark):
    from cs686_big_data_p1_spark.operators.multimodal import media_df

    rows = media_df(spark, SF_SMALL).orderBy("doc_id").limit(20).collect()
    assert rows
    for r in rows:
        assert bytes(r.payload) == _expected_payload(r.doc_id)
        kind = ("image", "audio", "video")[r.doc_id % 3]
        assert r.media_type == kind
        assert (r.width is not None) == (kind == "image")
        assert (r.sample_rate is not None) == (kind == "audio")
        assert (r.n_frames is not None) == (kind == "video")


def test_media_features_match_python(spark, registry):
    feats = {
        r.doc_id: r
        for r in registry.QUERIES["media_features"](spark, SF_SMALL).collect()
    }
    assert feats
    for doc_id in list(feats)[:10]:
        buf = _expected_payload(doc_id)
        a = np.frombuffer(buf, np.uint8).astype(np.float64)
        r = feats[doc_id]
        assert r.n_bytes == len(buf)
        assert abs(r.mean_val - a.mean()) < 1e-12
        assert abs(r.rms - math.sqrt((a**2).mean())) < 1e-12
        hist = np.histogram(a, bins=4, range=(0, 256))[0] / a.size
        assert np.allclose(np.array(r.feature, dtype=np.float64), hist, atol=1e-6)
        assert len(r.feature) == 4


def test_sample_frames_fanout(spark):
    from cs686_big_data_p1_spark.operators.multimodal import (
        FRAME_BYTES,
        media_df,
        sample_frames,
    )

    media = media_df(spark, SF_SMALL)
    frames = sample_frames(media)
    per_doc = {r.doc_id: r.n_frames for r in media.where("n_frames IS NOT NULL").collect()}
    got = frames.groupBy("doc_id").count().collect()
    assert {r.doc_id: r["count"] for r in got} == per_doc
    sample = frames.limit(5).collect()
    assert all(len(bytes(r.frame)) == FRAME_BYTES for r in sample)


def test_decode_stubs_raise(spark):
    import pytest

    from cs686_big_data_p1_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"x", 4, 4)
    with pytest.raises(NotImplementedError):
        decode_audio(b"x", 8000)
