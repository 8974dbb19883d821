"""Time-series relational operators: as-of join.

The reference engine's relational layer is equi-join only (SURVEY
§2.4 — browser history joins); `asof_join` extends the surface with
the event-stream alignment op that DuckDB spells ASOF JOIN and pandas
spells merge_asof: each left row picks the single most recent right
row at-or-before its timestamp (per key), never multiplying rows.

Scale design. The naive formulation — join on key with a `l.ts >=
r.ts` range predicate plus a per-left-row argmax — plans as an
exploding range join (every left row matches every earlier right row
before the argmax prunes). This implementation is the
union-tag-carry-forward pattern:

  1. tag each side, union them (narrow, shuffle-free),
  2. ONE shuffle on the join key,
  3. sort within the key partition by (ts, side) — right rows sort
     before left rows at equal timestamps, making the match inclusive,
  4. carry the latest right row forward with `last(ignorenulls)` over
     a running frame, packed as a single struct so a right row whose
     carried columns contain NULLs is still taken whole (not spliced
     with older rows' values).

Cost is one shuffle + one sort — a sort-merge join's shape with no row
multiplication, and Catalyst sees a plain window over the union.
Skew: WindowExec buffers one (key) partition at a time and spills; for
a pathologically hot key pass `bucket_span` (seconds) to pre-split by
coarse time bucket — in-bucket match windows over (key, bucket), then
ONE fix-up pass carries each bucket's latest right row ("tail") into
later buckets for left rows that found no in-bucket match. No
partition ever holds more than one (key, bucket)'s rows.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from swiftbeaver_spark.parsers.timeconv import (
    ntz_from_unix_micros,
    ts_unix_micros,
    ts_unix_micros_sql,
)

_TS, _SIDE, _ROW = "_sb_asof_ts", "_sb_asof_side", "_sb_asof_row"
_ORD, _BUCK = "_sb_asof_ord", "_sb_asof_bucket"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_right",
    bucket_span: int | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row, plus the columns of the
    single matching `right` row (NULLs when no right row qualifies).

    `direction='backward'` matches the latest right row with
    `right_ts <= left_ts`; `'forward'` the earliest with
    `right_ts >= left_ts` (both inclusive, DuckDB ASOF semantics).
    `tolerance` (an interval/duration Column, e.g. `F.expr("INTERVAL 1
    HOUR")`) unmatches right rows further than that from the left
    timestamp. Right columns come back as `{name}{suffix}`; the
    matched right timestamp as `{right_ts}{suffix}`.

    Ties between right rows sharing (key, timestamp) resolve to the
    row that is last in the union sort — callers needing full
    determinism there should pre-dedup the right side to one row per
    (key, timestamp); with event data carrying unique ids this is a
    `groupBy(key, ts).agg(max_by(...))`.

    `bucket_span` (seconds, optional): hot-key pre-split. Partitions
    the carry-forward window by (key, time-bucket) instead of key, so
    a key holding 10^9 rows spreads over rows/span partitions; a
    single boundary fix-up pass (per-bucket right tails, carried
    forward at bucket granularity — O(#buckets) rows) resolves left
    rows whose match lies in an earlier bucket. Same results as the
    unbucketed path (tested).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    rcols = (
        list(right_cols)
        if right_cols is not None
        else [c for c in right.columns if c not in (*keys, right_ts)]
    )
    for c in rcols:
        if f"{c}{suffix}" in left.columns:
            raise ValueError(f"output column {c}{suffix} collides with left")

    # pack the carried right row into ONE struct so last(ignorenulls)
    # takes it atomically (a NULL field inside a newer right row must
    # not fall through to an older row's value)
    packed = F.struct(
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
    )
    right_part = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        packed.alias(_ROW),
        F.lit(0).alias(_SIDE),
    )
    left_part = left.select(
        "*", F.col(left_ts).alias(_TS), F.lit(1).alias(_SIDE)
    )
    u = left_part.unionByName(right_part, allowMissingColumns=True)

    if bucket_span is not None:
        out = _asof_bucketed(u, keys, direction, bucket_span)
    else:
        order = (
            [F.col(_TS).asc(), F.col(_SIDE).asc()]
            if direction == "backward"
            else [F.col(_TS).desc(), F.col(_SIDE).asc()]
        )
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last(_ROW, ignorenulls=True).over(w)
        out = (
            u.withColumn(_ROW, matched)
            .where(F.col(_SIDE) == 1)
            .drop(_TS, _SIDE)
        )
    if tolerance is not None:
        rt = F.col(_ROW)[f"{right_ts}{suffix}"]
        in_tol = (
            (F.col(left_ts) <= rt + tolerance)
            if direction == "backward"
            else (rt <= F.col(left_ts) + tolerance)
        )
        out = out.withColumn(
            _ROW, F.when(in_tol, F.col(_ROW)).otherwise(F.lit(None))
        )
    for c in [f"{right_ts}{suffix}", *[f"{c}{suffix}" for c in rcols]]:
        out = out.withColumn(c, F.col(_ROW)[c])
    return out.drop(_ROW)


def _asof_bucketed(
    u: DataFrame, keys: list[str], direction: str, bucket_span: int
) -> DataFrame:
    """Hot-key pre-split body for `asof_join`: the tagged union `u`
    (left rows _SIDE=1 with all their columns, right rows _SIDE=0 with
    the packed _ROW struct) windows over (key, coarse time bucket),
    then ONE bucket-granularity fix-up pass carries each bucket's last
    right row into later buckets for in-bucket misses.

    Both sides map time to an ordered axis `o` (negated for forward so
    "most recent at-or-before" is always "largest o' <= o") and bucket
    = o div span. Integer `div` truncation is monotone in o, which is
    all bucketing needs — both sides use the identical mapping.
    """
    span_us = bucket_span * 1_000_000
    sign = 1 if direction == "backward" else -1
    o = ts_unix_micros(F.col(_TS)) * sign
    u = u.withColumn(_ORD, o).withColumn(
        _BUCK, F.expr(f"`{_ORD}` div {span_us}L")
    )
    # pass 1: in-bucket carry-forward — partitions are (key, bucket),
    # never a whole hot key
    w_in = (
        Window.partitionBy(*keys, _BUCK)
        .orderBy(F.col(_ORD).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn(_ROW, F.last(_ROW, ignorenulls=True).over(w_in))
        .where(F.col(_SIDE) == 1)
    )
    # pass 2 (boundary fix-up): per-(key, bucket) right tails — the
    # right row with the largest o in its bucket — carried forward at
    # BUCKET granularity. Left-need rows sort before same-bucket tails
    # (side 0 < 1) so a left bucket only sees strictly-earlier tails:
    # an in-bucket miss means every same-bucket right row is later in o.
    tails = (
        u.where(F.col(_SIDE) == 0)
        .groupBy(*keys, _BUCK)
        .agg(F.max_by(_ROW, F.col(_ORD)).alias(_ROW))
        .select(*keys, _BUCK, _ROW, F.lit(1).alias(_SIDE))
    )
    need = (
        matched.select(*keys, _BUCK).distinct().withColumn(_SIDE, F.lit(0))
    )
    w_carry = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_BUCK).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        tails.unionByName(need, allowMissingColumns=True)
        .withColumn("_sb_carry", F.last(_ROW, ignorenulls=True).over(w_carry))
        .where(F.col(_SIDE) == 0)
        .select(*keys, _BUCK, "_sb_carry")
    )
    return (
        matched.join(carry, [*keys, _BUCK], "left")
        .withColumn(_ROW, F.coalesce(F.col(_ROW), F.col("_sb_carry")))
        .drop(_TS, _SIDE, _ORD, _BUCK, "_sb_carry")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
) -> DataFrame:
    """Batch interval join: pairs (l, r) sharing the key with
    `l.left_ts + lower <= r.right_ts <= l.left_ts + upper` (bounds in
    seconds, inclusive). The q53 stream-stream join's batch twin.

    Scale design: Catalyst plans a raw `BETWEEN` range predicate as an
    exploding theta-join (every key-pair compared). This instead
    decomposes time into buckets of span = (upper - lower): each LEFT
    row lands in the <= 2 buckets its window can touch, each RIGHT row
    in exactly one — so the join is a plain EQUI-join on (key, bucket)
    followed by the exact range filter. One hash shuffle, no range
    explosion, AQE-splittable; the row multiplication is bounded at 2x
    on the left side regardless of data.
    """
    if upper <= lower:
        raise ValueError("upper must be > lower")
    keys = [on] if isinstance(on, str) else list(on)
    span_us = (upper - lower) * 1_000_000
    # integer `div` end to end — a float floor could misplace a row
    # sitting exactly on a bucket edge. Left window [ts+lower,
    # ts+upper] spans exactly bucket(ts+lower) and possibly the next
    # (its width equals the bucket span); right row sits in one bucket.
    lb = F.expr(
        f"({ts_unix_micros_sql(left_ts)} + {lower * 1_000_000}L) div {span_us}L"
    )
    rb = F.expr(f"{ts_unix_micros_sql(right_ts)} div {span_us}L")
    lbuck = F.explode(F.array_distinct(F.array(lb, lb + 1)))
    l = left.withColumn("_sb_bucket", lbuck)
    r = right.withColumn("_sb_bucket", rb)
    lo_us, hi_us = lower * 1_000_000, upper * 1_000_000
    cond = (
        (ts_unix_micros(F.col(right_ts)) >= ts_unix_micros(F.col(left_ts)) + lo_us)
        & (ts_unix_micros(F.col(right_ts)) <= ts_unix_micros(F.col(left_ts)) + hi_us)
    )
    return l.join(r, [*keys, "_sb_bucket"]).where(cond).drop("_sb_bucket")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting for skew: the LEFT (large, skewed)
    side scatters each row to one of `salt` sub-keys by a
    deterministic hash of its whole row; the RIGHT side replicates
    every row to all `salt` sub-keys. A key holding 10^9 left rows
    then spreads over `salt` reducers instead of one straggler task.

    Same results as a plain join (verified by the q57 oracle); use
    when AQE's skew-join split can't help — e.g. the skew is in a
    groupBy-like self-join, or the planner lacks runtime stats. Right
    side should be the smaller input (it is replicated salt-fold).

    Supported `how`: inner, left (left_outer), left_semi, left_anti —
    the modes where right-side replication cannot surface in the
    output. right/full/cross are REJECTED: an unmatched right row
    would appear once per salt sub-key (salt copies), silently
    corrupting the result; pre-aggregate or use a plain join there."""
    keys = [on] if isinstance(on, str) else list(on)
    mode = how.lower().replace("_", "")
    if mode not in ("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated right "
            "side would emit unmatched right rows once per salt sub-key. "
            "Supported: inner, left, left_semi, left_anti."
        )
    l = left.withColumn(
        "_sb_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), salt)
    )
    r = right.withColumn(
        "_sb_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_sb_salt", F.col("_sb_salt").cast("bigint"))
    # Force a SHUFFLE join: the planner's size estimate ignores the
    # salt-fold explode, so it happily broadcasts the replicated side
    # (salt x the pre-explode estimate) — which OOMs the driver at
    # scale AND defeats the operator (a broadcastable right side never
    # needed salting; the scatter over sub-keys only happens in a
    # shuffle). shuffle_hash keeps the per-reducer build local.
    return l.join(r.hint("shuffle_hash"), [*keys, "_sb_salt"], how).drop("_sb_salt")


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    order_cols: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one row per
    (key, fixed time bucket) with OHLC-shaped aggregates — open/close
    (first/last value ordered by (ts, *order_cols) inside the bucket),
    lo/hi, sum, count — plus the bucket start timestamp.

    Scale: count/min/max/sum and the open/close (min/max over an
    ordering struct) are ALL algebraic aggregates, so Catalyst plans
    map-side partial aggregation: each map task ships at most one row
    per (key, bucket) into the single shuffle, regardless of input
    size. This is the TimescaleDB continuous-aggregate shape on plain
    DataFrame ops. `order_cols` must make (ts, *order_cols) unique per
    key for deterministic open/close (an event id column does).
    """
    span_us = bucket_seconds * 1_000_000
    bucket = F.expr(f"({ts_unix_micros_sql(ts_col)}) div {span_us}L")
    ordk = F.struct(
        ts_unix_micros(F.col(ts_col)).alias("_o"),
        *[F.col(c).alias(f"_t{i}") for i, c in enumerate(order_cols)],
        F.col(value_col).alias("_v"),
    )
    return (
        df.groupBy(*key_cols, bucket.alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
            F.sum(value_col).alias("sum_value"),
            F.min(ordk).getField("_v").alias("open_value"),
            F.max(ordk).getField("_v").alias("close_value"),
        )
        .withColumn(
            "bucket_start", ntz_from_unix_micros(F.col("bucket") * span_us)
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the greedy earliest
    completion of `steps` — step_i's timestamp is the MIN event time of
    type steps[i] strictly after step_{i-1}'s timestamp. One row per
    user who reached step 1: step_{i}_ts columns (NULL once the funnel
    breaks) and `funnel_depth` = number of steps reached.

    Scale: k-1 equi-joins on the user key, each preceded by a
    type-filter that pushes down to the scan — no window over a user's
    whole history, no per-user iteration. All joins share the user-key
    partitioning, so AQE coalesces them onto one exchange lineage; a
    hot user costs only its per-type event count, not a cross product.
    Greedy-earliest is the standard funnel semantics: it maximizes the
    chance of completing later steps, so depth is well-defined.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    out = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"step_{i - 1}_ts"
        nxt = (
            events.where(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("_sb_ts"))
            .join(out.select(user_col, prev), user_col)
            .where(F.col("_sb_ts") > F.col(prev))
            .groupBy(user_col)
            .agg(F.min("_sb_ts").alias(f"step_{i}_ts"))
        )
        out = out.join(nxt, user_col, "left")
    depth = sum(
        (F.col(f"step_{i}_ts").isNotNull().cast("int") for i in range(1, len(steps) + 1)),
        start=F.lit(0),
    )
    return out.withColumn("funnel_depth", depth)


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Change-log -> SCD2 (slowly-changing-dimension type 2) history:
    collapse consecutive rows whose attributes are unchanged, then emit
    validity intervals per key — valid_from = the change's timestamp,
    valid_to = the NEXT change's timestamp (NULL on the current row),
    is_current flag.

    Scale: two windows, both partitioned by the dimension key —
    partition size is one key's change count, never the table. The
    no-op-change collapse (lag compare on the attribute struct) runs
    before the interval window, so churn-heavy change logs shrink
    before the second sort. Requires unique (key, ts): pre-dedup
    upstream (`groupBy(key, ts).agg(max_by(...))`) if the log has
    same-instant writes.
    """
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    changed = (
        changes.withColumn("_sb_prev", F.lag(attrs).over(w))
        .where(F.col("_sb_prev").isNull() | (attrs != F.col("_sb_prev")))
        .drop("_sb_prev")
    )
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def skew_profile(
    df: DataFrame,
    key_cols: list[str],
    topn: int = 10,
) -> DataFrame:
    """Key-distribution diagnostics for join/agg planning: the `topn`
    heaviest keys with their counts, integer per-mille share of all
    rows, plus total-row and distinct-key counts on every row. The
    operator you run BEFORE choosing a join strategy — a share_milli
    in the hundreds on one key is the signal to salt (salted_join) or
    pre-split (asof_join bucket_span).

    Scale: per-key counts are one partial-agg shuffle; the top-n is
    TakeOrdered (no global sort materializes); the rank window runs
    over <= topn rows; totals broadcast. All-integer output — exact on
    any engine. Ties break by key ascending for determinism.
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").cast("long").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("n_keys"),
    )
    order = [F.col("cnt").desc(), *[F.col(c).asc() for c in key_cols]]
    top = counts.orderBy(*order).limit(topn)
    w = Window.orderBy(*order)  # <= topn rows: the global window is bounded
    return (
        top.join(F.broadcast(totals))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .withColumn("share_milli", F.expr("(1000 * cnt) div total_rows"))
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str] | None = None,
    validate: bool = False,
) -> DataFrame:
    """Delta/Iceberg-style MERGE as a pure DataFrame op: rows matched
    on `key_cols` take the source's values for `update_cols` (source
    NULLs overwrite, per MERGE UPDATE semantics), unmatched source
    rows INSERT, unmatched target rows carry through unchanged. Output
    schema = target schema.

    `update_cols` defaults to every non-key column the source shares
    with the target; target columns absent from the source stay
    untouched on updates and NULL on inserts.

    Scale: ONE full-outer equi-join on the key — co-partitioned if
    both sides are bucketed/pre-partitioned on it, in which case the
    merge is shuffle-free (the table-format MERGE fast path).

    Precondition (CALLER's responsibility, like SQL MERGE's "source
    must not match a target row twice"): source keys are non-null and
    unique. Null-key rows pass through the full-outer join unmatched
    (a null-key source row always INSERTs); duplicate source keys fan
    out the matched target row. Pass `validate=True` to enforce the
    precondition eagerly — it runs one extra aggregation job over the
    source (key-count groupBy, shuffle bounded by distinct keys), so
    it is off by default on the 100 TB path.
    """
    if validate:
        bad = (
            source.groupBy(*key_cols)
            .agg(F.count("*").alias("_sb_n"))
            .where(
                (F.col("_sb_n") > 1)
                | functools.reduce(
                    lambda a, b: a | b, [F.col(c).isNull() for c in key_cols]
                )
            )
            .limit(1)
            .collect()
        )
        if bad:
            row = bad[0]
            raise ValueError(
                f"merge_upsert: source keys must be non-null and unique; "
                f"offending key={tuple(row[c] for c in key_cols)} "
                f"(count={row['_sb_n']})"
            )
    shared = [c for c in source.columns if c in target.columns and c not in key_cols]
    update_cols = shared if update_cols is None else list(update_cols)
    for c in update_cols:
        if c not in source.columns or c not in target.columns:
            raise ValueError(f"update column {c!r} must exist on both sides")
    marker = "_sb_matched"
    s = source.withColumn(marker, F.lit(1))
    j = target.alias("t").join(s.alias("s"), key_cols, "full")
    out_cols: list[Column] = [F.col(c) for c in key_cols]
    for c in target.columns:
        if c in key_cols:
            continue
        if c in update_cols:
            out_cols.append(
                F.when(F.col(marker).isNotNull(), F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return j.select(*out_cols)


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration weighted PageRank (simplified variant: dangling
    mass is NOT redistributed — nodes with no in-edges hold the
    (1-d)/N base). The web-graph quality-propagation shape used in
    corpus filtering, unrolled to a bounded number of join+aggregate
    rounds so the whole computation stays one declarative plan.

    Scale per iteration (r15): ONE exchange — the partial-agg shuffle
    of contributions on dst. The old shape additionally LEFT-joined the
    aggregated contributions back to the node table every round (its
    own shuffle-or-broadcast pair) to give contribution-less nodes the
    (1-d)/N base; instead the node table is unioned in as zero
    contributions BEFORE the aggregate, so one groupBy produces the
    full next-round rank vector directly (adding 0.0 to a float sum is
    exact, and dangling nodes sum to base as before — rows identical;
    pinned by tests/test_relational.py against an unrolled reference).
    The join of ranks to edges on src carries no exchange of the edge
    table: `e` persists already hash-partitioned on src (the outw join
    leaves it clustered on src at scale) and only narrow (src, dst,
    frac) columns — w/outw are projected away before the persist so
    iteration shuffles never carry them (guide §2.3). Every round
    localCheckpoints the rank table — without the lineage cut each
    round's plan contains every prior round's subtree and per-round
    Catalyst cost GROWS (the q36 connected-components loop measured
    0.7 -> 3.7 s/round from exactly this; see llm/cluster.py), so
    `iterations` can be raised freely.

    The EDGE table, by contrast, is the largest input at target scale
    and is only persist()-ed (MEMORY_AND_DISK), never
    localCheckpoint-ed: localCheckpoint blocks are non-recomputable,
    so an executor loss (or dynamic-allocation decommission) during
    the iteration would fail the whole job, where a persisted frame
    recomputes the lost partitions from lineage. Its subtree is
    static — it does not participate in the per-round plan growth the
    rank-table cuts exist for.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    e = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("frac"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()  # one scalar; the driver holds a single long
    base = (1.0 - damping) / n_nodes
    ranks = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    zero = nodes.select(F.col("node").alias("dst"), F.lit(0.0).alias("c"))
    for _ in range(iterations):
        contrib = e.join(ranks, e.src == ranks.node).select(
            "dst", (F.col("pr") * F.col("frac")).alias("c")
        )
        ranks = (
            contrib.unionByName(zero)
            .groupBy("dst")
            .agg((F.lit(base) + damping * F.sum("c")).alias("pr"))
            .select(F.col("dst").alias("node"), "pr")
            .localCheckpoint()
        )
    if iterations == 0:
        ranks = ranks.localCheckpoint()  # sever lineage before freeing inputs
    e.unpersist()
    nodes.unpersist()
    return ranks


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profiler (the ANALYZE-statistics op): per
    column — non-null count, exact distinct count, min and max as
    strings. All aggregates compute in ONE aggregation over one scan
    (Catalyst plans the multiple count-distincts with expand); output
    unpivots to a row per column.

    For 100 TB profiling swap the exact distincts for the KMV sketch
    (sketch.py) — same output shape, bounded shuffle; exact mode is
    the oracle-friendly default.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).cast("long").alias(f"{c}__n"),
            F.count_distinct(F.col(c)).cast("long").alias(f"{c}__d"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__n`, `{c}__d`, `{c}__min`, `{c}__max`" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) as "
        "(column, n_nonnull, n_distinct, min_value, max_value)"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data report between two snapshots of the same table:
    per key, 'inserted' (new only), 'deleted' (old only), or
    'updated' (both sides, any compared column differs) — unchanged
    rows drop out. The CDC diff a lakehouse emits between versions.

    Scale: rows reduce to (key, md5-of-compared-columns) BEFORE the
    full outer join, so the shuffle moves fixed-width digests, never
    payload columns; the join co-partitions on the key (or AQE
    broadcasts a small side). Null-safe: compared columns hash via
    coalesce with a type-tagged sentinel, so NULL != '' != 'NULL'."""
    compare_cols = compare_cols or [
        c for c in new.columns if c not in key_cols
    ]

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        cells = [
            F.coalesce(F.concat(F.lit("s:"), F.col(c).cast("string")), F.lit("\x00null"))
            for c in compare_cols
        ]
        return df.select(
            *[F.col(k) for k in key_cols],
            F.md5(F.concat_ws("\x01", *cells)).alias(alias),
        )

    o = hashed(old, "_old_h")
    n = hashed(new, "_new_h")
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_old_h").isNull(), F.lit("inserted"))
        .when(F.col("_new_h").isNull(), F.lit("deleted"))
        .when(F.col("_old_h") != F.col("_new_h"), F.lit("updated"))
    )
    return (
        joined.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def grouped_weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tiebreak_cols: list[str],
    block_width: int | None = None,
) -> DataFrame:
    """Exact per-group WEIGHTED median — the robust-statistics member
    completing q115's unweighted discrete median / q116's mode: the
    first value (in (value, tiebreak) order) whose running weight
    reaches half the group's total, i.e. the 50% point of the weight
    distribution rather than the row-count distribution. All-integer:
    the pick condition is the cross-multiplication
    2 * cum_weight >= total_weight, no interpolation, and the result
    is always an actual row's value.

    Scale: with `block_width` set (an INTEGER value-axis width), the
    running weight is a TWO-LEVEL distributed prefix sum — the
    q38/q165 block idiom applied inside each group: rows sort only
    within (group, value-div-width) blocks, per-block totals roll up
    through a window over the tiny block summary, and the row's
    cumulative weight is block offset + within-block running sum.
    Exact for integer weights because the block key is derived from
    the value itself, so block order IS coarse value order and ties
    never cross blocks. This removes the one-sort-partition-per-group
    bottleneck (a 3-group table funnels everything through 3 tasks at
    ANY scale; measured at sf0.1: 3.13 s -> 1.90 s, rows identical) at
    the cost of a broadcast of the (group, block) summary — size it so
    groups x blocks stays broadcast-small. With block_width=None the
    running weight is the classic single window per group.

    The median pick itself is a min_by aggregate over the qualified
    rows, NOT a second window: (value, tiebreaks) is a total order, so
    "first qualified row" = argmin, which partial-aggregates map-side
    instead of re-sorting ~half the group through a second
    one-partition-per-group sort (r14; was row_number over a second
    identical window). Weights must be non-negative integers."""
    tot = df.groupBy(group_col).agg(
        F.sum(F.col(weight_col)).alias("_tot")
    )
    if block_width is not None:
        blocked = df.withColumn(
            "_blk", F.floor(F.col(value_col) / F.lit(block_width)).cast("long")
        )
        wb = Window.partitionBy(group_col, "_blk").orderBy(
            value_col, *tiebreak_cols
        )
        inblk = blocked.withColumn(
            "_bcum",
            F.sum(F.col(weight_col)).over(
                wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        bsum = blocked.groupBy(group_col, "_blk").agg(
            F.sum(F.col(weight_col)).alias("_bw")
        )
        wo = (
            Window.partitionBy(group_col)
            .orderBy("_blk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        boff = bsum.withColumn(
            "_off", F.coalesce(F.sum("_bw").over(wo), F.lit(0))
        )
        cum_rows = inblk.join(
            F.broadcast(boff.select(group_col, "_blk", "_off")),
            [group_col, "_blk"],
        ).withColumn("_cum", F.col("_off") + F.col("_bcum"))
    else:
        w = Window.partitionBy(group_col).orderBy(
            value_col, *tiebreak_cols
        )
        cum = F.sum(F.col(weight_col)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum_rows = df.withColumn("_cum", cum)
    qualified = (
        cum_rows.join(F.broadcast(tot), group_col)
        .where(F.lit(2) * F.col("_cum") >= F.col("_tot"))
    )
    picked = qualified.groupBy(group_col).agg(
        F.min_by(
            F.struct(F.col(value_col).alias("v"), F.col("_cum").alias("c")),
            F.struct(value_col, *tiebreak_cols),
        ).alias("_m"),
        F.min("_tot").alias("_tot"),
    )
    return picked.select(
        group_col,
        F.col("_m.v").alias("weighted_median"),
        F.col("_tot").cast("long").alias("total_weight"),
        F.col("_m.c").cast("long").alias("cum_at_median"),
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_dist: int,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Minimum-hop BFS distances from a seed set — the iterative
    frontier-expansion primitive behind graph reachability/diffusion
    features (Pregel's canonical example), run as `max_dist` rounds of
    (frontier JOIN edges) with an anti-join against the settled set.
    BFS order guarantees the first time a node is reached IS its
    minimum distance, so no re-relaxation round is needed.

    Scale per level (r15): ONE exchange — the settled set and the
    newly reached candidates union into a per-node MIN(dist)
    aggregate, which both folds duplicates (the old `distinct`) and
    keeps already-settled nodes at their earlier level (the old
    anti-join) in a single map-side-combinable pass; the next frontier
    is then just the filter dist == level over the aggregated (and
    checkpointed) table, no extra job. BFS min-dist semantics are
    identical: a node's first-reach level IS its min over all reaches,
    and nodes with dist == level are exactly the newly settled set
    (pinned by tests/test_relational.py). The frontier-to-edges join
    itself adds no edge-table exchange: `e` persists hash-partitioned
    on the source key (explicit repartition — the (src, dst) distinct
    alone would leave it clustered on the PAIR, re-shuffling the whole
    graph every level at scale), and the frontier arrives clustered on
    node from the aggregate. Every level localCheckpoints the settled
    table — the earlier persist + isEmpty() version left each level's
    cache PARTIALLY populated (isEmpty is a limit-1 scan) and kept the
    full lineage, so later levels recomputed through every prior
    level's plan (the q36 connected-components pathology,
    llm/cluster.py; measured there 0.7 -> 3.7 s/round).
    The EDGE table — the largest input at target scale — is only
    persist()-ed (recomputable from lineage on executor loss), never
    localCheckpoint-ed: non-recomputable blocks on the biggest frame
    would turn any executor decommission into a whole-job failure,
    and its static subtree plays no part in per-level plan growth.
    The loop exits early on an empty frontier (one bounded driver-side
    emptiness check per level over the already-checkpointed table,
    <= max_dist actions); checkpoint snapshots are freed by the
    ContextCleaner as levels go unreferenced. Deterministic — set
    semantics, no ordering dependence."""
    dist = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint()
    )
    frontier = dist.select("node")
    e = (
        edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d"))
        .distinct()
        .repartition("_s")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for level in range(1, max_dist + 1):
        reached = (
            frontier.join(e, frontier["node"] == e["_s"])
            .select(F.col("_d").alias("node"))
            .withColumn("dist", F.lit(level))
        )
        dist = dist.unionByName(reached).groupBy("node").agg(
            F.min("dist").alias("dist")
        ).localCheckpoint()
        frontier = dist.where(F.col("dist") == level).select("node")
        if frontier.isEmpty():
            break
    e.unpersist()  # dist is checkpoint-backed; safe to free the edges
    return dist.select("node", F.col("dist").cast("int").alias("dist"))
