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
    """Feature rows must match an independent Python recompute that
    decodes through the codecs directly; every modality's features must
    DIFFER from a raw byte-reinterpretation of the same payload
    (proof a genuine decode ran, not a reinterpretation)."""
    from cs686_big_data_p1_spark.operators.multimodal import (
        decoded_signal,
        media_encoded_df,
    )

    feats = {
        r.doc_id: r
        for r in registry.QUERIES["media_features"](spark, SF_SMALL).collect()
    }
    assert feats
    payloads = {
        r.doc_id: (r.media_type, bytes(r.payload))
        for r in media_encoded_df(spark, SF_SMALL).limit(50).collect()
    }
    checked = set()
    for doc_id, (mt, buf) in payloads.items():
        r = feats[doc_id]
        a, rng = decoded_signal(mt, buf)
        assert r.n_bytes == len(buf)
        assert abs(r.mean_val - a.mean()) < 1e-12
        assert abs(r.rms - math.sqrt((a**2).mean())) < 1e-12
        hist = np.histogram(a, bins=4, range=rng)[0] / a.size
        assert np.allclose(np.array(r.feature, dtype=np.float64), hist, atol=1e-6)
        assert len(r.feature) == 4
        raw = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
        assert abs(r.mean_val - raw.mean()) > 1e-9, (
            f"{mt} features identical to raw bytes - no real decode ran"
        )
        checked.add(mt)
    assert checked == {"image", "audio", "video"}


def test_bmp_round_trip():
    from cs686_big_data_p1_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
    )

    rng = np.random.RandomState(686)
    for w, h in [(5, 4), (6, 3), (7, 2), (8, 5)]:  # odd widths: padding
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_bmp(px)), px)


def test_wav_round_trip():
    from cs686_big_data_p1_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    rng = np.random.RandomState(686)
    samples = rng.randint(-32768, 32768, size=257, dtype=np.int16)
    wave, rate = decode_audio(encode_wav(samples, 12000))
    assert rate == 12000
    assert np.array_equal((wave * 32768.0).astype(np.int16), samples)


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


def test_decoders_reject_garbage(spark):
    import pytest

    from cs686_big_data_p1_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )

    with pytest.raises(ValueError):
        decode_image(b"xx" + b"\x00" * 60)
    with pytest.raises(ValueError):
        decode_audio(b"nope" + b"\x00" * 60)


def test_bmp_round_trip_property():
    """Property: encode->decode is the identity for ANY (H, W) pixel
    array, including widths whose stride needs 1-3 padding bytes."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cs686_big_data_p1_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=19),
        h=st.integers(min_value=1, max_value=13),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, seed):
        px = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        assert np.array_equal(decode_image(encode_bmp(px)), px)

    check()


def test_wav_round_trip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cs686_big_data_p1_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=999),
        rate=st.sampled_from([8000, 12000, 16000, 44100]),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(n, rate, seed):
        samples = np.random.RandomState(seed).randint(
            -32768, 32768, size=n, dtype=np.int16
        )
        wave, got_rate = decode_audio(encode_wav(samples, rate))
        assert got_rate == rate
        assert np.array_equal((wave * 32768.0).astype(np.int16), samples)

    check()


def test_y4m_round_trip():
    from cs686_big_data_p1_spark.operators.multimodal import (
        decode_video,
        encode_y4m,
    )

    rng = np.random.RandomState(686)
    for t, h, w in [(1, 4, 5), (4, 6, 3), (7, 2, 9)]:
        frames = rng.randint(0, 256, size=(t, h, w), dtype=np.uint8)
        assert np.array_equal(decode_video(encode_y4m(frames)), frames)


def test_y4m_round_trip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cs686_big_data_p1_spark.operators.multimodal import (
        decode_video,
        encode_y4m,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        t=st.integers(min_value=1, max_value=9),
        h=st.integers(min_value=1, max_value=13),
        w=st.integers(min_value=1, max_value=19),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(t, h, w, seed):
        frames = np.random.RandomState(seed).randint(
            0, 256, size=(t, h, w), dtype=np.uint8
        )
        assert np.array_equal(decode_video(encode_y4m(frames)), frames)

    check()


def test_y4m_rejects_garbage_and_wrong_colorspace():
    import pytest

    from cs686_big_data_p1_spark.operators.multimodal import decode_video

    with pytest.raises(ValueError):
        decode_video(b"nope" + b"\x00" * 60)
    with pytest.raises(ValueError):  # chroma-carrying colorspace unsupported
        decode_video(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n" + b"\x00" * 64)
    with pytest.raises(ValueError):  # truncated plane
        decode_video(b"YUV4MPEG2 W4 H4 Cmono\nFRAME\n" + b"\x00" * 7)


def test_sample_decoded_frames(spark):
    """Every-2nd-frame sampling over the real Y4M payloads: fan-out
    count is ceil(n_frames/2) per video doc and each emitted frame is
    the exact decoded luma plane."""
    from cs686_big_data_p1_spark.operators.multimodal import (
        decode_video,
        media_encoded_df,
        sample_decoded_frames,
    )

    media = media_encoded_df(spark, SF_SMALL)
    sampled = sample_decoded_frames(media, every_k=2)
    got = {
        (r.doc_id, r.frame_no): (r.height, r.width, bytes(r.frame))
        for r in sampled.collect()
    }
    assert got
    vids = media.where("media_type = 'video'").limit(10).collect()
    assert vids
    for v in vids:
        frames = decode_video(bytes(v.payload))
        expect_nos = list(range(0, frames.shape[0], 2))
        have_nos = sorted(no for (d, no) in got if d == v.doc_id)
        assert have_nos == expect_nos
        for no in expect_nos:
            h, w, buf = got[(v.doc_id, no)]
            assert (h, w) == frames.shape[1:]
            assert buf == frames[no].tobytes()


def test_phash_dedup_catches_brightness_shift(spark):
    """A +40 brightness-shifted copy of a BMP changes every payload
    byte (exact fingerprint dedup misses it) but preserves every
    horizontal gradient sign, so dHash must collapse the pair into one
    class while keeping a genuinely different image separate."""
    from cs686_big_data_p1_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _pseudo_bytes,
        dhash64,
        encode_bmp,
        image_dhash,
        payload_fingerprint,
        phash_dedup,
    )

    h, w = 12, 10
    base = (
        np.frombuffer(_pseudo_bytes(1, h * w * 3), np.uint8).astype(np.int32) % 200
    ).astype(np.uint8).reshape(h, w, 3)
    shifted = (base.astype(np.int32) + 40).astype(np.uint8)  # no clipping
    other = (
        np.frombuffer(_pseudo_bytes(2, h * w * 3), np.uint8).astype(np.int32) % 200
    ).astype(np.uint8).reshape(h, w, 3)
    payloads = [encode_bmp(p) for p in (base, shifted, other)]
    assert len({payload_fingerprint(p) for p in payloads}) == 3  # exact misses
    assert dhash64(base) == dhash64(shifted) != dhash64(other)

    rows = [
        (i + 1, "image", bytearray(p), w, h, None, None)
        for i, p in enumerate(payloads)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = {r.doc_id: r.dhash for r in image_dhash(media).collect()}
    assert hashes[1] == hashes[2] != hashes[3]
    classes = {
        r.dhash: (r.keeper_doc_id, r.n_copies)
        for r in phash_dedup(media).collect()
    }
    assert classes[hashes[1]] == (1, 2)  # shifted copy deduped, keeper=min
    assert classes[hashes[3]] == (3, 1)


def test_media_phash_dedup_query(spark, registry):
    """Registered query: one class per fixture image (pseudo-random
    pixels don't collide), keeper == doc_id, image rows only."""
    out = registry.QUERIES["media_phash_dedup"](spark, SF_SMALL).collect()
    n_images = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .where("doc_id % 3 = 0")
        .count()
    )
    assert sum(r.n_copies for r in out) == n_images
    assert all(len(r.dhash) == 16 for r in out)


def test_dhash_properties():
    """Pure-function properties of the perceptual hash, hypothesis-
    driven: (a) ANY exact brightness shift without clipping leaves the
    dHash unchanged — a theorem of the integer cross-multiplied
    comparison (a float-mean version fails this on rounding ties, which
    hypothesis found); (b) exact 2x pixel repetition preserves the hash
    when the source dims are grid multiples (boundaries scale exactly);
    (c) the hash is a valid 64-bit value."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cs686_big_data_p1_spark.operators.multimodal import (
        PHASH_GRID,
        _block_stats,
        _pseudo_bytes,
        dhash64,
    )

    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        seed=st.integers(0, 10_000),
        h=st.integers(9, 24),
        w=st.integers(10, 24),
        shift=st.integers(1, 55),
        hk=st.integers(1, 3),
        wk=st.integers(1, 2),
    )
    def check(seed, h, w, shift, hk, wk):
        base = (
            np.frombuffer(_pseudo_bytes(seed, h * w * 3), np.uint8).astype(
                np.int32
            )
            % 200
        ).astype(np.uint8).reshape(h, w, 3)
        d = dhash64(base)
        assert 0 <= d < (1 << 64)
        shifted = (base.astype(np.int32) + shift).astype(np.uint8)
        assert dhash64(shifted) == d  # brightness invariance (exact)

        # 2x repetition invariance on grid-aligned dims
        gh, gw = PHASH_GRID * hk, (PHASH_GRID + 1) * wk
        ali = (
            np.frombuffer(_pseudo_bytes(seed + 1, gh * gw * 3), np.uint8)
            .astype(np.int32) % 200
        ).astype(np.uint8).reshape(gh, gw, 3)
        doubled = np.repeat(np.repeat(ali, 2, axis=0), 2, axis=1)
        assert dhash64(doubled) == dhash64(ali)

        # block stats partition the image exactly
        gray = base.astype(np.int64).sum(axis=2)
        sums, counts = _block_stats(gray, PHASH_GRID, PHASH_GRID + 1)
        assert counts.min() >= 1
        if h >= PHASH_GRID and w >= PHASH_GRID + 1:
            assert counts.sum() == h * w
            assert sums.sum() == gray.sum()

    check()


def test_audio_fphash_catches_volume_shift(spark):
    """A half-amplitude copy of a WAV changes every payload byte but
    not the band-energy gradient fingerprint (power-of-2 scaling is
    exact in IEEE floats, so every energy comparison is preserved
    bit-for-bit); distinct content gets distinct fingerprints."""
    import numpy as np

    from cs686_big_data_p1_spark.operators.multimodal import (
        audio_fphash64,
        encode_wav,
        payload_fingerprint,
    )

    rng = np.random.default_rng(11)
    samples = (rng.integers(-2**14, 2**14, 4096) * 2).astype(np.int16)
    original = encode_wav(samples, 8000)
    quiet = encode_wav((samples // 2).astype(np.int16), 8000)
    other = encode_wav(
        (rng.integers(-2**14, 2**14, 4096) * 2).astype(np.int16), 8000
    )
    assert payload_fingerprint(original) != payload_fingerprint(quiet)
    assert audio_fphash64(original) == audio_fphash64(quiet)
    assert audio_fphash64(original) != audio_fphash64(other)


def test_media_audio_dedup_query(spark, registry):
    """Registered query: one class per fixture audio doc (pseudo-random
    content doesn't collide), keeper == doc_id, audio rows only."""
    out = registry.QUERIES["media_audio_dedup"](spark, SF_SMALL).collect()
    n_audio = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .where("doc_id % 3 = 1")
        .count()
    )
    assert sum(r.n_copies for r in out) == n_audio
    assert all(len(r.afp) == 16 for r in out)


def test_video_phash_catches_brightness_shift(spark):
    """A +30-brightness re-encode of a Y4M clip changes every payload
    byte but not the middle-frame dHash (integer gradient comparisons
    are shift-invariant when no pixel clips)."""
    import numpy as np

    from cs686_big_data_p1_spark.operators.multimodal import (
        encode_y4m,
        payload_fingerprint,
        video_phash64,
    )

    rng = np.random.default_rng(13)
    frames = rng.integers(40, 180, (5, 24, 32)).astype(np.uint8)
    original = encode_y4m(frames)
    brighter = encode_y4m(frames + 30)  # stays < 256: no clipping
    other = encode_y4m(rng.integers(40, 180, (5, 24, 32)).astype(np.uint8))
    assert payload_fingerprint(original) != payload_fingerprint(brighter)
    assert video_phash64(original) == video_phash64(brighter)
    assert video_phash64(original) != video_phash64(other)


def test_media_video_dedup_query(spark, registry):
    """Registered query: one class per fixture video doc, keeper ==
    doc_id, video rows only."""
    out = registry.QUERIES["media_video_dedup"](spark, SF_SMALL).collect()
    n_video = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .where("doc_id % 3 = 2")
        .count()
    )
    assert sum(r.n_copies for r in out) == n_video
    assert all(len(r.vhash) == 16 for r in out)
