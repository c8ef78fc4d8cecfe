"""Multimodal plumbing: schema contract, determinism, error isolation."""

from __future__ import annotations

from rsmetacheck_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    synth_media,
)


def test_media_features_end_to_end(spark):
    feats = extract_features(synth_media(spark, n=60)).collect()
    assert len(feats) == 60
    by_id = {r.media_id: r for r in feats}
    assert set(by_id) == set(range(60))
    r0 = by_id[0]
    assert r0.feat_error is None and len(r0.sha1) == 40 and r0.n_bytes > 0
    # images decode to exactly one frame; audio/video to size-derived counts
    for r in feats:
        if r.kind == "image":
            assert r.frame_count == 1
        else:
            assert r.frame_count >= 1


def test_media_determinism(spark):
    a = sorted((r.media_id, r.sha1) for r in extract_features(synth_media(spark, n=20)).collect())
    b = sorted((r.media_id, r.sha1) for r in extract_features(synth_media(spark, n=20)).collect())
    assert a == b


def test_decode_error_isolation(spark):
    import pandas as pd
    bad = spark.createDataFrame(
        pd.DataFrame({
            "media_id": [1, 2], "kind": ["image", "hologram"],
            "payload": [b"ok-bytes", b"x"], "width": [1, 1], "height": [1, 1],
        })
    )
    rows = {r.media_id: r for r in extract_features(bad).collect()}
    assert rows[1].feat_error is None
    assert "unknown media kind" in rows[2].feat_error
    assert rows[2].sha1 == ""  # failed row keeps defaults, task survives


def test_decode_stub_pure():
    a = decode_stub(b"abc", "image")
    assert a == decode_stub(b"abc", "image")
    assert decode_stub(b"", "audio")["mean_byte"] == 0.0
