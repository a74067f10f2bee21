"""Video tower over the MPNG motion-PNG container (functions/minivid.py):
container roundtrip, REAL sampled frame bytes, real decoded-pixel features,
and the undecodable-payload fallback."""

from __future__ import annotations

import numpy as np
import pytest

from entity_resolution_pipeline_spark.functions import minipng, minivid
from entity_resolution_pipeline_spark.operators import multimodal


def _frames(seed: int, n: int, h: int = 4, w: int = 6) -> list[np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(seed))
    return [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)
    ]


def test_mpng_roundtrip_and_index():
    px = _frames(7, 4)
    enc = [minipng.encode_png(p) for p in px]
    payload = minivid.encode_mpng(enc, 250)
    idx = minivid.index_mpng(payload)
    assert idx is not None and idx[0] == 250 and len(idx[1]) == 4
    for i, (off, ln) in enumerate(idx[1]):
        assert payload[off : off + ln] == enc[i]
        assert np.array_equal(minipng.decode_png(enc[i]), px[i])
    # frame_at covering semantics: frame i covers [i*interval, (i+1)*interval)
    assert minivid.frame_at(payload, idx, 0) == enc[0]
    assert minivid.frame_at(payload, idx, 249) == enc[0]
    assert minivid.frame_at(payload, idx, 250) == enc[1]
    assert minivid.frame_at(payload, idx, 10_000) == enc[3]  # clamped to last


def test_mpng_rejects_garbage_and_truncation():
    assert minivid.index_mpng(b"") is None
    assert minivid.index_mpng(b"\x00" * 64) is None
    payload = minivid.encode_mpng([minipng.encode_png(_frames(1, 1)[0])], 100)
    assert minivid.index_mpng(payload[:-5]) is None  # truncated frame section
    with pytest.raises(ValueError):
        minivid.encode_mpng([], 100)
    with pytest.raises(ValueError):
        minivid.encode_mpng([b"x"], 0)


def test_sample_video_frames_returns_real_decodable_frames(spark):
    media = multimodal.synthetic_media_df(spark, 45)
    rows = multimodal.sample_video_frames(media, every_ms=500).collect()
    src = {r["media_id"]: r for r in media.collect() if r["kind"] == "video"}
    assert set(r["media_id"] for r in rows) == set(src)
    n_real = n_null = 0
    for r in rows:
        payload = bytes(src[r["media_id"]]["bytes"])
        idx = minivid.index_mpng(payload)
        if idx is None:  # the seeded undecodable video rows
            assert r["frame_bytes"] is None
            n_null += 1
            continue
        n_real += 1
        # the emitted bytes ARE the covering frame, standalone-decodable,
        # at the row's advertised true dimensions
        assert bytes(r["frame_bytes"]) == minivid.frame_at(
            payload, idx, r["frame_ts_ms"]
        )
        px = minipng.decode_png(bytes(r["frame_bytes"]))
        assert px.shape == (src[r["media_id"]]["height"], src[r["media_id"]]["width"], 3)
    assert n_real > 0 and n_null > 0  # both branches exercised
    # MPNG rows sample one frame per 500ms of true duration
    mpng_ids = [m for m, r in src.items() if minivid.index_mpng(bytes(r["bytes"]))]
    per = {m: sum(1 for r in rows if r["media_id"] == m) for m in mpng_ids}
    for m in mpng_ids:
        assert per[m] == src[m]["duration_ms"] // 500


def test_video_features_are_real_decoded_pixels(spark):
    """extract_media_features featurizes MPNG videos from DECODED frames —
    recompute the expected vector per row from the container bytes."""
    media = multimodal.synthetic_media_df(spark, 45)
    feats = {
        r["media_id"]: np.array(r["feature"])
        for r in multimodal.extract_media_features(media, dim=16).collect()
        if r["kind"] == "video"
    }
    for r in media.collect():
        if r["kind"] != "video":
            continue
        payload = bytes(r["bytes"])
        fr = multimodal._decode_video(payload)
        if fr is None:
            expected = multimodal._fake_feature(payload, 16)
        else:
            expected = multimodal._video_feature(fr, 16)
            # a real feature is a function of pixels: must differ from the
            # content-hash stand-in
            assert not np.allclose(expected, multimodal._fake_feature(payload, 16))
        assert np.allclose(feats[r["media_id"]], expected, atol=1e-6)


def test_video_feature_motion_energy():
    """Static clip → zero motion term; changing clip → positive."""
    still = [_frames(3, 1)[0]] * 4
    moving = _frames(4, 4)
    v_still = minivid.video_features(still)
    v_move = minivid.video_features(moving)
    assert v_still[-1] == 0.0
    assert v_move[-1] > 0.0
