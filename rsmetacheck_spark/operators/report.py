"""Report sinks — the JSON-LD-shaped outputs of the reference recast as
Spark-native JSON assembly (S6/S7, SURVEY §2.1):

 - per-document verdict report for every FLAGGED doc (the any-issue gate,
   detect_pitfalls_main.py:360-366), one JSON string per row via
   to_json(struct(...)) (json_ld_utils.py:447-493 analog), with
   * first failing drop-rule = first-match-wins (F4 shape, p004.py:78)
   * evidence truncated to 3 entries (O3 shape, json_ld_utils.py:201-202)
 - run summary assembled from the tiny metrics table (S7,
   analysis_results.json analog, detect_pitfalls_main.py:385-398) —
   driver-side collect of ~15 rows is the sanctioned exception.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import thresholds as TH


def _rule_lookup(idx: int) -> F.Column:
    """Literal map rule -> RULE_INFO[idx] (the reference's static
    description/category/suggestion tables, json_ld_utils.py:53-91,
    336-376, 379-418 — broadcast-free: a create_map literal folds into
    the plan as a constant)."""
    entries: list[F.Column] = []
    for rule, info in TH.RULE_INFO.items():
        entries.extend([F.lit(rule), F.lit(info[idx])])
    return F.create_map(*entries)


def per_doc_reports(pages_out: DataFrame) -> DataFrame:
    """Flagged docs -> (url, bucket, report:string JSON). Each hit rule
    renders a CheckResult-shaped entry (checkId/category/process/
    suggestion/evidence, json_ld_utils.py:447-493)."""
    hits = F.filter("findings", lambda f: f["hit"])
    first_drop = F.try_element_at(
        F.filter("findings", lambda f: f["hit"] & (f["severity"] == TH.DROP)), F.lit(1)
    )
    cat_m, desc_m, sugg_m = _rule_lookup(0), _rule_lookup(1), _rule_lookup(2)
    checks = F.transform(
        hits,
        lambda f: F.struct(
            f["rule"].alias("checkId"),
            cat_m[f["rule"]].alias("category"),
            desc_m[f["rule"]].alias("process"),
            sugg_m[f["rule"]].alias("suggestion"),
            f["evidence"].alias("evidence"),
        ),
    )
    report = F.to_json(
        F.struct(
            F.col("url").alias("url"),
            F.col("lang_pred").alias("lang"),
            F.col("keep").alias("keep"),
            F.col("first_drop_rule").alias("firstDropRule"),
            F.col("hit_rules").alias("checkIds"),
            F.col("evidence3").alias("evidence"),
            F.col("checks").alias("checks"),
        )
    )
    return (
        pages_out
        .withColumn("hit_rules", F.transform(hits, lambda f: f["rule"]))
        .withColumn("first_drop_rule", first_drop["rule"])
        .withColumn(
            "evidence3",
            F.slice(F.transform(hits, lambda f: f["evidence"]), 1, 3),
        )
        .withColumn("checks", checks)
        .filter(F.size("hit_rules") > 0)
        .select("url", "bucket", report.alias("report"))
    )


def summary_report(metrics: DataFrame, total_docs: int, kept: int) -> str:
    rows = sorted(
        (r.asDict(recursive=True) for r in metrics.collect()),
        key=lambda r: r["rule"],
    )
    return json.dumps(
        {
            "total_docs": total_docs,
            "kept": kept,
            "dropped": total_docs - kept,
            "rules": rows,
        },
        default=str,
    )
