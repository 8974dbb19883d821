"""Bucketed-table co-located joins: the evidence behind every
"shuffle-free when both sides are bucketed on the key" claim in the
relational layer (merge_upsert, the carve chunk-range join at scale,
SURVEY scale notes).

Spark's bucketing (`write.bucketBy(n, key).saveAsTable`) hash-splits
each side into n files per partition by the join key at WRITE time;
a join of two tables bucketed on the same key with the same n then
satisfies both children's distribution requirements from the file
layout — the plan contains NO Exchange under the join. On 100 TB this
is the difference between re-shuffling the fact table per query and
shuffling it once at ingest.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark, tmp_path):
    names = ["b_left", "b_right"]
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(0, 10_000, 7).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("b_left")
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("b_right")

    l, r = spark.table("b_left"), spark.table("b_right")
    # force the shuffle-join path (a broadcast would be vacuous here):
    # the merge join's hash-distribution requirement must be satisfied
    # by the BUCKET layout, not by an Exchange
    joined = l.hint("merge").join(r.hint("merge"), "k")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan

    got = {(row["k"], row["lv"], row["rv"]) for row in joined.collect()}
    want = {(k, k * 2, k * 3) for k in range(0, 10_000, 7)}
    assert got == want


def test_bucketed_aggregation_has_no_exchange(spark, warehouse):
    """groupBy on the bucket key also satisfies its distribution from
    the layout — partial+final aggregation with zero shuffle."""
    df = spark.range(0, 5_000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    df.write.bucketBy(8, "k").mode("overwrite").saveAsTable("b_left")
    agg = spark.table("b_left").groupBy("k").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert agg.count() == 50
