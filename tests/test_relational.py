"""asof_join (relational.py) and count-min sketch (sketch.py) tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from swiftbeaver_spark.relational import asof_join
from swiftbeaver_spark.sketch import countmin_build, countmin_estimate


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, ts, px): the "state" side
    rows = [
        ("a", _ts(0), 1.0),
        ("a", _ts(10), 2.0),
        ("a", _ts(20), 3.0),
        ("b", _ts(5), 10.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, px double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("a", _ts(0)),   # exact tie with a quote -> inclusive match
        ("a", _ts(15)),  # between quotes -> ts(10)
        ("a", _ts(99)),  # after all -> ts(20)
        ("b", _ts(4)),   # before first quote -> no match
        ("c", _ts(50)),  # key with no quotes -> no match
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp")


def _collect(df):
    return {
        (r["k"], r["ts"]): (r["ts_right"], r["px_right"])
        for r in df.collect()
    }


def test_asof_backward_semantics(spark, trades, quotes):
    got = _collect(asof_join(trades, quotes, on="k"))
    assert got[("a", _ts(0))] == (_ts(0), 1.0)     # inclusive at equality
    assert got[("a", _ts(15))] == (_ts(10), 2.0)   # latest at-or-before
    assert got[("a", _ts(99))] == (_ts(20), 3.0)
    assert got[("b", _ts(4))] == (None, None)      # nothing before
    assert got[("c", _ts(50))] == (None, None)     # unseen key
    assert asof_join(trades, quotes, on="k").count() == trades.count()


def test_asof_forward_semantics(spark, trades, quotes):
    got = _collect(asof_join(trades, quotes, on="k", direction="forward"))
    assert got[("a", _ts(0))] == (_ts(0), 1.0)     # inclusive at equality
    assert got[("a", _ts(15))] == (_ts(20), 3.0)   # earliest at-or-after
    assert got[("a", _ts(99))] == (None, None)     # nothing after
    assert got[("b", _ts(4))] == (_ts(5), 10.0)


def test_asof_tolerance(spark, trades, quotes):
    got = _collect(
        asof_join(
            trades, quotes, on="k", tolerance=F.expr("INTERVAL 6 SECONDS")
        )
    )
    assert got[("a", _ts(15))] == (_ts(10), 2.0)   # 5s back: within
    assert got[("a", _ts(99))] == (None, None)     # 79s back: out
    assert got[("a", _ts(0))] == (_ts(0), 1.0)     # 0s back: within


def test_asof_takes_right_row_atomically(spark):
    """A newer right row with a NULL carried field must not splice in
    the older row's value for that field."""
    left = spark.createDataFrame([("a", _ts(20))], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("a", _ts(0), 1.0, "old"), ("a", _ts(10), None, "new")],
        "k string, ts timestamp, px double, tag string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["tag_right"] == "new"
    assert row["px_right"] is None  # NOT 1.0 from the older row


def test_asof_no_row_multiplication_plan(spark, trades, quotes):
    """The plan must be union + window — no join node at all (the
    naive range-join formulation explodes at scale)."""
    plan = asof_join(trades, quotes, on="k")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_asof_bucketed_matches_unbucketed(spark, trades, quotes):
    """Hot-key pre-split path (bucket_span) must reproduce the plain
    path exactly — including cross-bucket matches (the fix-up pass) and
    unmatched rows, in both directions and under tolerance."""
    for direction in ("backward", "forward"):
        want = _collect(asof_join(trades, quotes, on="k", direction=direction))
        for span in (1, 7, 1000):  # tiny buckets force cross-bucket fix-ups
            got = _collect(
                asof_join(
                    trades, quotes, on="k", direction=direction, bucket_span=span
                )
            )
            assert got == want, (direction, span)
    want = _collect(
        asof_join(trades, quotes, on="k", tolerance=F.expr("INTERVAL 6 SECONDS"))
    )
    got = _collect(
        asof_join(
            trades,
            quotes,
            on="k",
            tolerance=F.expr("INTERVAL 6 SECONDS"),
            bucket_span=3,
        )
    )
    assert got == want


def test_asof_bucketed_hot_key(spark):
    """One key holding every row: the bucketed path still matches the
    plain path (this is the skew scenario the pre-split exists for),
    and its main window partitions on (key, bucket) — the plan's
    windowspec must include the bucket column."""
    from swiftbeaver_spark.relational import _BUCK

    left = spark.createDataFrame(
        [("hot", _ts(i)) for i in range(0, 400, 2)], "k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("hot", _ts(i), float(i)) for i in range(0, 400, 7)],
        "k string, ts timestamp, px double",
    )
    out = asof_join(left, right, on="k", bucket_span=30)
    assert _collect(out) == _collect(asof_join(left, right, on="k"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert _BUCK in plan
    # the bucket-granularity fix-up join is allowed; a cartesian/range
    # join (the naive formulation) is not
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# --- count-min sketch --------------------------------------------------------


@pytest.fixture(scope="module")
def value_stream(spark):
    # skewed frequencies: value i appears i+1 times, 0..49
    rows = [(f"v{i:02d}",) for i in range(50) for _ in range(i + 1)]
    return spark.createDataFrame(rows, "v string")


def test_countmin_never_underestimates(spark, value_stream):
    sketch = countmin_build(value_stream, "v", depth=4, prefix_len=3)
    true = value_stream.groupBy("v").agg(F.count("*").alias("true_c"))
    est = countmin_estimate(sketch, true.select("v"), "v", depth=4, prefix_len=3)
    joined = true.join(est, "v").collect()
    assert len(joined) == 50
    for r in joined:
        assert r["cms_est"] >= r["true_c"], r


def test_countmin_exact_when_sparse(spark, value_stream):
    """50 distinct values into 4096 buckets x 4 rows: collisions in
    ALL four rows for the same value are vanishingly unlikely, so the
    min over rows recovers the exact counts."""
    sketch = countmin_build(value_stream, "v", depth=4, prefix_len=3)
    true = value_stream.groupBy("v").agg(F.count("*").alias("true_c"))
    est = countmin_estimate(sketch, true.select("v"), "v", depth=4, prefix_len=3)
    exact = true.join(est, "v").where(F.col("cms_est") == F.col("true_c")).count()
    assert exact == 50


def test_countmin_sketch_size_bounded(spark, value_stream):
    """The sketch's row count is capped by depth * width regardless of
    input size — the mergeable-sketch property."""
    sketch = countmin_build(value_stream, "v", depth=2, prefix_len=1)
    assert sketch.count() <= 2 * 16
    total = sketch.groupBy("j").agg(F.sum("cnt").alias("s")).collect()
    n = value_stream.count()
    assert all(r["s"] == n for r in total)  # every row sees every instance


# --- histogram quantile sketch ----------------------------------------------


def test_histogram_quantiles_accuracy(spark):
    """Estimates land within one bin width of the exact quantiles."""
    from swiftbeaver_spark.sketch import histogram_quantiles

    rows = [("g", float(i)) for i in range(1, 1001)]  # uniform 1..1000
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["quantile"]: r["q_value"]
        for r in histogram_quantiles(df, "v", ["g"], [0.5, 0.95], nbins=100).collect()
    }
    width = (1000.0 - 1.0) / 100
    assert abs(got[0.5] - 500.0) <= width + 1e-9
    assert abs(got[0.95] - 950.0) <= width + 1e-9


def test_histogram_quantiles_degenerate_range(spark):
    from swiftbeaver_spark.sketch import histogram_quantiles

    df = spark.createDataFrame([("g", 7.0)] * 5, "g string, v double")
    got = histogram_quantiles(df, "v", ["g"], [0.5]).collect()
    assert len(got) == 1 and got[0]["q_value"] == 7.0


def test_histogram_quantiles_monotone_per_group(spark):
    from swiftbeaver_spark.sketch import histogram_quantiles

    rows = [("a", float(i % 97)) for i in range(500)] + [
        ("b", 100.0 + i % 13) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = histogram_quantiles(df, "v", ["g"], [0.5, 0.95, 0.99]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append((r["quantile"], r["q_value"]))
    for g, pairs in by_g.items():
        vals = [v for _, v in sorted(pairs)]
        assert vals == sorted(vals), (g, vals)


def test_histogram_quantiles_single_pass_plan(spark):
    """k quantiles cost ONE aggregation over the binned table — the
    plan must not union k per-quantile re-aggregations (VERDICT r2 #3)."""
    from swiftbeaver_spark.sketch import histogram_quantiles

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(100)], "g string, v double"
    )
    out = histogram_quantiles(df, "v", ["g"], [0.1, 0.5, 0.9, 0.99], nbins=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan, plan
    # two scans are inherent (global min/max pre-pass + binning); the
    # old per-quantile implementation had k+1 for k quantiles
    assert plan.count("Scan ExistingRDD") <= 2, plan


# --- linear quality scorer ---------------------------------------------------


def test_linear_quality_bounds_and_determinism(spark):
    from swiftbeaver_spark.llm.text import linear_quality_score

    df = spark.createDataFrame(
        [(1, "good text here"), (2, "good text here"), (3, "other words entirely")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in linear_quality_score(df).collect()}
    # same text -> identical score; scores normalized into [-1, 1]
    assert got[1]["quality_score"] == got[2]["quality_score"]
    for r in got.values():
        assert -1.0 <= r["quality_score"] <= 1.0
        assert r["n_tokens"] == 3


def test_linear_quality_empty_text_excluded(spark):
    from swiftbeaver_spark.llm.text import linear_quality_score

    df = spark.createDataFrame([(1, ""), (2, "a b")], "doc_id long, text string")
    got = {r["doc_id"] for r in linear_quality_score(df).collect()}
    assert got == {2}


# --- interval join (batch, bucket-decomposed) --------------------------------


def test_interval_join_matches_naive(spark):
    """Bucket decomposition must produce exactly the naive range-join
    pairs, including rows sitting exactly on window edges."""
    import itertools

    lrows = [("k", _ts(s)) for s in (0, 100, 3600, 7200)]
    rrows = [("k", _ts(s)) for s in range(0, 7300, 50)]
    left = spark.createDataFrame(lrows, "k string, lts timestamp")
    right = spark.createDataFrame(rrows, "k string, rts timestamp")
    from swiftbeaver_spark.relational import interval_join

    got = {
        (r["lts"], r["rts"])
        for r in interval_join(left, right, "k", "lts", "rts", -3600, 0).collect()
    }
    want = {
        (lt, rt)
        for (_, lt), (_, rt) in itertools.product(lrows, rrows)
        if lt - dt.timedelta(seconds=3600) <= rt <= lt
    }
    assert got == want and len(got) > 0


def test_interval_join_left_fanout_bounded(spark):
    """Each left row explodes into at most 2 bucket copies — the plan
    must not contain a nested-loop/cartesian join."""
    from swiftbeaver_spark.relational import interval_join

    left = spark.createDataFrame([("k", _ts(0))], "k string, lts timestamp")
    right = spark.createDataFrame([("k", _ts(1))], "k string, rts timestamp")
    df = interval_join(left, right, "k", "lts", "rts", -60, 60)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


# --- salted join -------------------------------------------------------------


def test_salted_join_matches_plain_join(spark):
    from swiftbeaver_spark.relational import salted_join

    left = spark.createDataFrame(
        [(i % 3, f"l{i}") for i in range(100)], "k long, lv string"
    )
    right = spark.createDataFrame(
        [(0, "r0"), (1, "r1"), (9, "r9")], "k long, rv string"
    )
    got = salted_join(left, right, on="k").orderBy("lv", "rv").collect()
    want = left.join(right, "k").orderBy("lv", "rv").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # left rows with unmatched keys drop in inner mode; k=2 has no right
    assert all(r["k"] != 2 for r in got)


def test_salted_join_left_outer(spark):
    from swiftbeaver_spark.relational import salted_join

    left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, lv string")
    right = spark.createDataFrame([(1, "r")], "k long, rv string")
    got = {
        (r["k"], r["rv"]) for r in salted_join(left, right, on="k", how="left").collect()
    }
    assert got == {(1, "r"), (2, None)}


def test_salted_join_semi_anti_match_plain(spark):
    from swiftbeaver_spark.relational import salted_join

    left = spark.createDataFrame(
        [(i % 3, f"l{i}") for i in range(30)], "k long, lv string"
    )
    right = spark.createDataFrame([(1, "r1a"), (1, "r1b")], "k long, rv string")
    for how in ("left_semi", "left_anti"):
        got = sorted(
            tuple(r) for r in salted_join(left, right, on="k", how=how).collect()
        )
        want = sorted(tuple(r) for r in left.join(right, "k", how).collect())
        assert got == want, how


def test_salted_join_rejects_outer_modes(spark):
    """Right/full outer would emit each unmatched right row `salt`
    times (one per replicated sub-key) — the operator must refuse."""
    import pytest

    from swiftbeaver_spark.relational import salted_join

    left = spark.createDataFrame([(1, "a")], "k long, lv string")
    right = spark.createDataFrame([(2, "r")], "k long, rv string")
    for how in ("right", "right_outer", "full", "full_outer", "outer", "cross"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(left, right, on="k", how=how)


# --- incremental dedup -------------------------------------------------------


def test_incremental_exact_dedup(spark):
    from swiftbeaver_spark.llm.dedup import incremental_exact_dedup

    seen = spark.createDataFrame(
        [("already ingested",)], "text string"
    ).select(F.md5("text").alias("content_hash"))
    new = spark.createDataFrame(
        [
            (10, "already ingested"),   # collides with seen -> dropped
            (11, "fresh one"),
            (12, "fresh one"),          # batch dup -> collapses to 11
            (13, "another"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_batch_copies"]
        for r in incremental_exact_dedup(new, seen).collect()
    }
    assert got == {11: 2, 13: 1}
