"""Streaming exact dedup: the incremental-refresh path of dd01.

Batch dd01_exact_groups collapses documents by content hash in one
groupBy; a continuously-ingesting pipeline needs the same semantics over
a stream without unbounded state. `dropDuplicatesWithinWatermark` keys
state by the content hash and evicts entries once the event-time
watermark passes them — state is bounded by (dup-arrival window x ingest
rate), not corpus size, which is the only formulation that survives
10^12 documents. Mirrors how the reference would dedupe repeated SoMEF
extractions of the same repository if it ran continuously.

First-wins semantics per content hash within the watermark horizon; a
duplicate arriving after eviction starts a new group (the documented
trade of bounded state — identical to every production streaming dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_key(text: F.Column | str) -> F.Column:
    """Same canonical content hash as batch dd01 (md5 of lower/trim)."""
    return F.md5(F.lower(F.trim(text)))


def dedup_stream(pages_stream: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """pages(url, warc_ts, text, ...) stream -> first row per content
    hash within the event-time horizon."""
    return (
        pages_stream
        .withColumn("text_md5", content_key("text"))
        .withWatermark("warc_ts", horizon)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )
