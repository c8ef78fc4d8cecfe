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
    assert r0.feat_error is None and len(r0.sha256) == 64 and r0.n_bytes > 0
    # images decode to exactly one frame; audio/video to size-derived counts
    for r in feats:
        if r.kind == "image":
            assert r.frame_count == 1
        else:
            assert r.frame_count >= 1


def test_media_determinism(spark):
    a = sorted((r.media_id, r.sha256) for r in extract_features(synth_media(spark, n=20)).collect())
    b = sorted((r.media_id, r.sha256) for r in extract_features(synth_media(spark, n=20)).collect())
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
    assert rows[2].sha256 == ""  # failed row keeps defaults, task survives


def test_decode_stub_pure():
    a = decode_stub(b"abc", "image")
    assert a == decode_stub(b"abc", "image")
    assert decode_stub(b"", "audio")["mean_byte"] == 0.0


def test_payload_hex_chain_matches_python_reference():
    """The content-defined payload is exactly the md5 chain (the contract
    the DuckDB oracle rebuilds in SQL)."""
    import hashlib
    from rsmetacheck_spark.operators.multimodal import payload_hex_chain

    phex, size = payload_hex_chain(7)
    assert len(phex) == 2 * size
    h = int(hashlib.md5(b"5:7:sz").hexdigest()[:8], 16)
    assert size == 64 + h % 1985
    assert phex.startswith(hashlib.md5(b"5:7:0").hexdigest()[: min(32, 2 * size)])


def test_media_from_docs_features(spark):
    from rsmetacheck_spark.operators.multimodal import (
        extract_features,
        payload_hex_chain,
        synth_media_from_docs,
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = {r.media_id: r for r in
             extract_features(synth_media_from_docs(docs)).collect()}
    assert len(feats) == docs.count()
    phex, size = payload_hex_chain(0)
    b = bytes.fromhex(phex)
    assert feats[0].n_bytes == size and feats[0].sum_bytes == sum(b)
