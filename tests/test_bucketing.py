"""Bucketed-table co-located join (SURVEY §4 / guide partitioning notes):
bucketBy on the join key lets later joins skip the exchange entirely —
the physical strategy for repeated large-large joins at 100 TB. Broadcast
is disabled for the check because at test scale AQE would (correctly)
broadcast instead; at 100 TB both sides are too big to broadcast and the
bucketed sort-merge path is what runs."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark):
    sfx = uuid.uuid4().hex[:8]
    li_t, o_t = f"li_b_{sfx}", f"o_b_{sfx}"
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable(li_t))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable(o_t))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(li_t)
            .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # neither join side shuffles: bucket layout satisfies the
        # distribution requirement (only the final agg exchanges)
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Bucketed: true" in plan

        want = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority").agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        for t in (li_t, o_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree("spark-warehouse", ignore_errors=True)
