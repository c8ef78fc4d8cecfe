"""Round-6 optimization contracts.

Each test pins an equivalence an optimization relies on:
  - the DuckDB-in-mapInArrow shingle builder produces the same per-doc
    DISTINCT shingle SET as the round-5 JVM zip_with expression
    (element order inside one doc's array is explicitly NOT part of the
    contract — every consumer is set-based);
  - _docs_par's size-adaptive floor skips the exchange on a small input
    and fans out on a large one;
  - the one-pass rule_metrics_table still counts a hit finding whose
    doc has an EMPTY lang list (model-error rows) in `hits`.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rsmetacheck_spark import queries as Q
from rsmetacheck_spark.session import get_spark

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = get_spark("t_r6opt", cores=4, shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


ADVERSARIAL_DOCS = [
    (1, ""),                                  # empty
    (2, "one"),                               # < 3 tokens
    (3, "a b"),
    (4, "a b c"),                             # exactly one shingle
    (5, "a b c a b c a b c"),                 # repeated shingles -> distinct
    (6, "  Leading;;and--trailing??  "),      # delimiter runs at both ends
    (7, "UPPER Case MiXeD 123 abc123"),       # lowering + digits
    (8, "x " * 200),                          # long single-token repeat
    (9, "tok" + "q" * 300 + " b c d"),        # very long token
]


def test_duck_shingle_builder_matches_jvm_expression(spark):
    df = spark.createDataFrame(ADVERSARIAL_DOCS, "doc_id long, text string")
    import tempfile

    path = tempfile.mkdtemp(prefix="t_r6_docs_")
    df.repartition(3).write.mode("overwrite").parquet(path)

    # JVM reference: the round-5 expression chain
    toks = Q._TOKS_SPARK.format(c="text")
    jvm = (
        spark.read.parquet(path)
        .selectExpr("doc_id", f"{toks} AS t")
        .selectExpr("doc_id", f"{Q._SHINGLES_SPARK.format(t='t')} AS sh")
        .filter(F.expr("size(sh) > 0"))
        .selectExpr("doc_id", "explode(sh) AS s")
    )
    # DuckDB builder under test, via the real entry point (fresh fake
    # sf dir so the session checkpoint cache cannot serve testdata)
    import os
    import shutil

    sfdir = tempfile.mkdtemp(prefix="t_r6_sf_")
    shutil.copytree(path, os.path.join(sfdir, "documents.parquet"))
    duck = Q._shingle_mat(spark, sfdir).selectExpr("doc_id", "explode(sh) AS s")

    a = {(r.doc_id, r.s) for r in jvm.collect()}
    b = {(r.doc_id, r.s) for r in duck.collect()}
    assert a == b
    # per-doc arrays are DISTINCT in both builders
    dup = (
        Q._shingle_mat(spark, sfdir)
        .selectExpr("size(sh) AS n", "size(array_distinct(sh)) AS nd")
        .filter("n != nd").count()
    )
    assert dup == 0


def test_docs_par_is_size_adaptive(spark):
    # sf0.001 documents are far below the per-task byte target -> the
    # exchange must be SKIPPED (plan has no Exchange above the scan)
    small = Q._docs_par(spark, SF001)
    plan_small = small._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" not in plan_small
    # a fake large input (size reported via the real file) is emulated by
    # lowering the per-task target instead of shipping a big fixture
    orig = Q._DOCS_PAR_BYTES
    try:
        Q._DOCS_PAR_BYTES = 1  # every byte its own task -> cap at cores
        big = Q._docs_par(spark, SF001)
        plan_big = big._jdf.queryExecution().optimizedPlan().toString()
        assert "RepartitionByExpression" in plan_big
    finally:
        Q._DOCS_PAR_BYTES = orig


def test_metrics_one_pass_counts_empty_lang_hits(spark):
    from rsmetacheck_spark.operators.metrics import rule_metrics_table
    from rsmetacheck_spark import thresholds as TH

    rule0, _sev = TH.RULES[0]
    finding = (
        f"array(named_struct('rule', '{rule0}', 'hit', true,"
        "'severity', 'drop', 'metric', CAST(0.0 AS DOUBLE),"
        "'evidence', CAST(NULL AS STRING)))"
    )
    rows = spark.range(3).selectExpr(
        "id AS doc_id",
        # doc 0: normal two-lang doc; doc 1: EMPTY langs (model error);
        # doc 2: no hit at all
        "CASE WHEN id = 0 THEN array('en', 'fr') ELSE array() END AS lang_top2",
        f"CASE WHEN id < 2 THEN {finding} ELSE array() END"
        " AS findings",
    ).withColumn(
        "findings", F.col("findings").cast(
            "array<struct<rule:string,hit:boolean,severity:string,"
            "metric:double,evidence:string>>"
        )
    )
    out = {r.rule: r for r in rule_metrics_table(rows).collect()}
    # both hit docs count, INCLUDING the empty-langs one
    assert out[rule0].hits == 2
    assert dict(out[rule0].lang_counts) == {"en": 1, "fr": 1}
    # every registered rule appears; non-hit rules are zero
    assert len(out) == len(TH.RULES)
    assert all(r.hits == 0 for name, r in out.items() if name != rule0)
