"""Pins for the raw-corpus multimodal ops (media_catalog / resize_media /
sample_frames / extract_media_features).

These ops left ``queries()`` in round 4 (their value-exact ``*_flat``
twins stay driver-checked); this suite keeps the raw-RNG variants
executed and — crucially — value-pins the stub derivations the flat
twins do NOT cover: ``sample_frames``'s per-frame ``frame_feature``
(floor-micro contract, round-4 ADVICE fix) and the feature vector of
``extract_media_features``, both re-derived here independently from
``media_ref`` alone (payload = repeat(md5(ref), 4) by construction).
"""

import hashlib
import math

import numpy as np
import pytest

import __spark_entry__ as entry_mod
from deepdoc_api_spark.ops.multimodal import (
    FEATURE_DIM,
    decode_media,
    fit_box,
    frame_timestamps_ms,
    media_catalog,
    resize_media,
    sample_frames,
    extract_media_features,
)


def _payload(media_ref: str) -> bytes:
    return (hashlib.md5(media_ref.encode()).hexdigest() * 4).encode()


def _floor_micro_feature(digest: bytes) -> list:
    return [
        math.floor((digest[i % len(digest)] - 128) / 128.0 * 1000000.0)
        / 1000000.0
        for i in range(FEATURE_DIM)
    ]


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    df = media_catalog(entry_mod._spans_cached(spark, sf_dir))
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


def test_decode_media_real_path_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "image", fake=False)


def test_catalog_payload_is_ref_derivable(media):
    rows = media.limit(50).collect()
    assert rows
    for r in rows:
        assert bytes(r.payload) == _payload(r.media_ref)
        assert r.n_bytes == len(_payload(r.media_ref))


def test_resize_media_raw_corpus_value_pinned(media):
    out = {
        (r.doc_id, r.media_ref): r
        for r in resize_media(media, max_w=256, max_h=256).collect()
    }
    assert out
    sample = media.limit(200).collect()
    for m in sample:
        r = out[(m.doc_id, m.media_ref)]
        w, h, _ = decode_media(_payload(m.media_ref), m.media_kind, fake=True)
        assert (r.width, r.height) == (w, h)
        assert (r.resized_w, r.resized_h, r.scale_milli) == fit_box(
            w, h, 256, 256
        )
        # invariants: never upscale, fits the box
        assert r.resized_w <= max(w, 256) and r.resized_w <= 256
        assert r.resized_h <= 256 and r.scale_milli <= 1000


def test_sample_frames_frame_feature_floor_micro(media):
    """frame_feature switched round(x, 6) -> floor-micro in round 4; this
    is the only value pin of that derivation (the flat frames twin
    checks the schedule, not the feature)."""
    out = sample_frames(media, every_ms=1000).collect()
    assert out, "no video frames sampled"
    by_ref = {}
    for r in out:
        by_ref.setdefault((r.doc_id, r.media_ref), []).append(r)
    checked_frames = 0
    for (doc_id, ref), frames in list(by_ref.items())[:50]:
        h = hashlib.md5(_payload(ref)).digest()
        duration_ms = 1000 + int.from_bytes(h[:2], "big") * 2
        expect_ts = frame_timestamps_ms(duration_ms, 1000)
        frames.sort(key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in frames] == list(range(len(expect_ts)))
        assert [r.ts_ms for r in frames] == expect_ts
        for r in frames:
            fh = hashlib.md5(h + int(r.ts_ms).to_bytes(8, "big")).digest()
            # the column is array<float> (float32): the pin is exact at
            # float32 width, so cast the expectation, not the tolerance
            expect = [float(np.float32(x)) for x in _floor_micro_feature(fh)]
            got = [float(x) for x in r.frame_feature]
            assert got == expect, (doc_id, ref)
            checked_frames += 1
    assert checked_frames > 100


def test_extract_media_features_value_pinned(media):
    out = {
        (r.doc_id, r.media_ref): r
        for r in extract_media_features(media).collect()
    }
    assert out
    for m in media.limit(100).collect():
        r = out[(m.doc_id, m.media_ref)]
        w, h, feat = decode_media(
            _payload(m.media_ref), m.media_kind, fake=True
        )
        assert (r.width, r.height) == (w, h)
        assert [float(x) for x in r.feature] == [
            float(np.float32(v)) for v in feat
        ]
