"""Synth determinism + extraction byte-identity (the per-row invariant from
BASELINE.json input_hint)."""

from __future__ import annotations

from rsmetacheck_spark import synth
from rsmetacheck_spark.operators.extract import extract_text


def test_roundtrip_byte_identical():
    df = synth.gen_pages(300, seed=42)
    for rec in df.itertuples(index=False):
        ext = extract_text(rec.html)
        assert ext == rec.text
        assert ext.encode("utf-8") == rec.text.encode("utf-8")


def test_deterministic():
    a = synth.gen_pages(50, seed=42)
    b = synth.gen_pages(50, seed=42)
    assert a.equals(b)
    c = synth.gen_pages(50, seed=43)
    assert not a["text"].equals(c["text"])


def test_class_mix_and_schema():
    df = synth.gen_pages(500, seed=42, with_class=True)
    assert set(df.columns) == {"url", "warc_ts", "html", "text", "lang", "_class"}
    shares = df["_class"].value_counts(normalize=True)
    assert shares["clean"] > 0.4
    assert df["url"].is_unique
    assert df["lang"].isin(["en", "de", "fr", "es", "zz"]).all()
    assert (df.loc[df["_class"] == "nonlang", "lang"] == "zz").all()
