"""Verdict assembly + keep/drop gate.

Per-document `findings` column: array<struct<rule,hit,severity,metric,
evidence>> — the Spark analog of the reference's per-rule verdict dicts
(p001.py:70-77) with `pitfall_code` stamping (detect_pitfalls_main.py:331).
`keep` mirrors the any-issue reduce gating JSON-LD emission
(detect_pitfalls_main.py:360-366): keep = no drop-severity hit.

Plan shape: metric/hit expressions are materialized as NAMED columns first,
and the findings structs reference them as attribute refs — CollapseProject
will not re-inline a non-cheap expression referenced multiple times, so
each metric is computed exactly once per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import thresholds as TH
from . import rules as R

FINDING_SCHEMA = (
    "array<struct<rule:string,hit:boolean,severity:string,metric:double,evidence:string>>"
)


def with_findings(df: DataFrame) -> DataFrame:
    """Expects model-stage columns; adds findings + keep."""
    cols = {name: F.col(name) for name in df.columns}
    # the model stage emits extracted_text SPARSELY (null == identical to
    # scrubbed_text); rules that read the raw text get the restored value
    lowtext = None
    if "extracted_text" in cols and "scrubbed_text" in cols:
        cols["extracted_text"] = F.coalesce("extracted_text", "scrubbed_text")
        # boilerplate scans a LOWERED copy of the text per phrase; name
        # it once (attribute refs are not re-inlined, see module doc) so
        # the row pays one lowercase pass instead of |PHRASES|
        lowtext = F.lower(cols["extracted_text"])
        df = df.withColumn("__lowtext", lowtext)
        cols["__lowtext"] = F.col("__lowtext")
    metrics = R.rule_metrics(cols)

    metric_cols, hit_cols = {}, {}
    for rule, _sev in TH.RULES:
        metric, hit = metrics[rule]
        metric_cols[f"__m_{rule}"] = F.coalesce(metric.cast("double"), F.lit(0.0))
        hit_cols[f"__h_{rule}"] = F.coalesce(hit, F.lit(False))
    df = df.withColumns({**metric_cols, **hit_cols})

    # per-rule evidence template (the reference renders a distinct template
    # per detector, json_ld_utils.py:144-333): the rule's description from
    # the static lookup is baked in as a literal, so each struct's evidence
    # is a one-format_string codegen expression. Evidence text is rendered
    # ONLY for hits — the reference renders evidence only for flagged
    # verdicts (json_ld_utils.py:447-493), and null evidence for the ~13
    # non-hit rules per doc saves ~1 KB/row at the sink.
    finding_structs = [
        F.struct(
            F.lit(rule).alias("rule"),
            F.col(f"__h_{rule}").alias("hit"),
            F.lit(severity).alias("severity"),
            F.col(f"__m_{rule}").alias("metric"),
            F.when(
                F.col(f"__h_{rule}"),
                F.format_string(
                    f"%s: {TH.RULE_INFO[rule][1]} (metric=%s)",
                    F.lit(rule), F.col(f"__m_{rule}").cast("string"),
                ),
            ).alias("evidence"),
        )
        for rule, severity in TH.RULES
    ]
    drop_hits = [
        F.col(f"__h_{rule}") for rule, sev in TH.RULES if sev == TH.DROP
    ]
    dropped = drop_hits[0]
    for h in drop_hits[1:]:
        dropped = dropped | h
    df = df.withColumn("findings", F.array(*finding_structs))
    df = df.withColumn("keep", ~dropped)
    drop_helpers = list(metric_cols.keys()) + list(hit_cols.keys())
    if lowtext is not None:
        drop_helpers.append("__lowtext")
    return df.drop(*drop_helpers)
