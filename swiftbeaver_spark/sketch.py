"""Mergeable frequency sketches: count-min.

Companion to the KMV distinct sketch (q46): a count-min sketch whose
every arithmetic step is engine-neutral (md5-prefix bucket keys,
integer sums, min over rows), so the APPROXIMATE estimates themselves
can sit under a cross-engine hash gate — unlike opaque
`approx_count_distinct`-style sketches that only admit rows-only
checks.

Scale design: the sketch is a `(row, bucket) -> count` table of at
most `depth * 16^prefix_len` cells. Token instances explode by
`depth` before the shuffle, but partial aggregation collapses each
map task's output to at most the sketch size, so the shuffle moves
O(depth * width) rows per task regardless of corpus size — the
classic mergeable-sketch property, expressed as a plain groupBy.
Estimation for a probe set is a broadcast join against the sketch
(the sketch is small by construction) followed by a min over rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(col: Column, row: int, prefix_len: int) -> Column:
    """Bucket key = first `prefix_len` hex chars of md5('{row}:' + v):
    a string key both Spark and any SQL oracle compute identically —
    no hex->int conversion, no engine-specific hash."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{row}:"), col)), 1, prefix_len
    )


def countmin_build(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    prefix_len: int = 3,
) -> DataFrame:
    """Build a count-min sketch over the instances of `value_col`:
    one output row per (sketch row j, bucket) with the instance count.
    Width = 16^prefix_len buckets per row (4096 at the default)."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(value_col), j, prefix_len).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.j", "cell.bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def countmin_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    prefix_len: int = 3,
) -> DataFrame:
    """Estimate each probe's frequency: min over the sketch rows of
    the probe's bucket count. Guaranteed >= the true count; the
    overestimate is other values colliding into the same buckets.
    `probes` must be distinct on `value_col`."""
    keyed = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(value_col), j, prefix_len).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select("*", "cell.j", "cell.bucket")
    est = (
        keyed.join(F.broadcast(sketch.alias("sk")), ["j", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )
    return est


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: list[float],
    nbins: int = 1000,
) -> DataFrame:
    """Fixed-bin histogram quantile sketch per group: an equi-width
    histogram over the GLOBAL [min, max] of `value_col`, quantile
    estimate = lower edge of the bin where the cumulative count first
    reaches ceil(q * n). Third member of the engine-neutral sketch
    family (KMV distinct, count-min frequency): every step — the exact
    min/max pre-pass, integer bin indices, cumulative integer counts,
    one closed-form edge expression — replays identically in SQL, so
    the APPROXIMATE quantiles themselves can sit under a hash gate
    (unlike approx_percentile's opaque GK sketch).

    Scale: pass 1 is a global min/max (map-side combined to one row);
    pass 2 shuffles at most nbins rows per group per task (partial
    agg), and the per-group cumulative window runs over <= nbins rows.
    The histogram is trivially mergeable across partitions/datasets.
    """
    lo, hi = F.min(value_col), F.max(value_col)
    bounds = df.select(
        lo.cast("double").alias("lo"), hi.cast("double").alias("hi")
    )
    # bin width: (hi - lo) / nbins, degenerate all-equal range -> 1.0
    width = F.when(F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / nbins).otherwise(
        F.lit(1.0)
    )
    binned = (
        df.join(F.broadcast(bounds.withColumn("w", width)))
        .withColumn(
            "bin",
            F.least(
                F.floor((F.col(value_col) - F.col("lo")) / F.col("w")),
                F.lit(nbins - 1),
            ).cast("long"),
        )
        .groupBy(*group_cols, "bin", "lo", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_grp = Window.partitionBy(*group_cols)
    cum = binned.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "n", F.sum("cnt").over(w_grp)
    )
    # all quantiles in ONE aggregation (VERDICT r2 #3): explode the
    # quantile list against the <= nbins cumulative rows (bounded k*nbins
    # fan-out), keep rows at-or-past each target, take the min bin —
    # k quantiles cost one shuffle instead of k re-aggregations
    q_lit = F.array(*[F.lit(float(q)) for q in quantiles])
    return (
        cum.select(
            *group_cols,
            "bin",
            "lo",
            "w",
            "cum",
            "n",
            F.explode(q_lit).alias("quantile"),
        )
        .where(F.col("cum") >= F.ceil(F.col("quantile") * F.col("n")))
        .groupBy(*group_cols, "quantile")
        .agg((F.min("bin") * F.first("w") + F.first("lo")).alias("q_value"))
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    nbuckets: int = 8,
    block_width: int = 100_000,
) -> DataFrame:
    """EQUI-DEPTH (equal-frequency) histogram over an exact-integer
    value column — the optimizer-statistics companion to q54's
    equi-width bins: bucket boundaries fall at equal ROW-count
    cutoffs, so skewed distributions get fine buckets where the mass
    is. The canonical construction sorts the whole column and cuts at
    rank i*n/B; here the sort never touches the row set:

    1. distinct-value table (v -> cnt): ONE partial-aggregating
       shuffle, |distinct| rows — the only corpus-keyed stage.
    2. rows-before-v prefix sum, DISTRIBUTED two-level (the q38
       pack_sequences idiom): per-block cumulative window (block =
       v div `block_width`, monotone in v so block order IS value
       order) + a broadcast block-offset table computed by the only
       global window — over the tiny per-block summary.
    3. bucket_id = (rows_before * B) div n, all-integer. Every row of
       one value lands in one bucket (heavy hitters never split), so
       depths are equal up to heavy-hitter granularity — the standard
       compromise (DB2/Postgres equi-depth stats behave the same).

    Returns (bucket_id, lo, hi, n_rows, n_distinct), SQL-replayable
    end to end."""
    dv = df.groupBy(F.col(value_col).cast("long").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    dv = dv.withColumn("blk", F.floor(F.col("v") / block_width).cast("long"))
    w_in = (
        Window.partitionBy("blk")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = dv.withColumn("cum_in", F.sum("cnt").over(w_in))
    w_blk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    blk_off = (
        dv.groupBy("blk")
        .agg(F.sum("cnt").alias("blk_tot"))
        .withColumn("blk_off", F.coalesce(F.sum("blk_tot").over(w_blk), F.lit(0)))
        .select("blk", "blk_off")
    )
    tot = dv.agg(F.sum("cnt").alias("n"))  # single row, broadcast
    ranked = within.join(F.broadcast(blk_off), "blk").crossJoin(F.broadcast(tot))
    bucket = F.expr(f"CAST(((blk_off + cum_in - cnt) * {nbuckets}) DIV n AS INT)")
    return (
        ranked.withColumn("bucket_id", bucket)
        .groupBy("bucket_id")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count("*").cast("long").alias("n_distinct"),
        )
        .orderBy("bucket_id")
    )


def bloom_build(
    df: DataFrame,
    value_col: str,
    k: int = 4,
    prefix_len: int = 4,
) -> DataFrame:
    """Build an engine-neutral Bloom filter over `value_col`: the set
    of SET BITS as rows (hash row j 0..k-1, bucket = md5-prefix key,
    width 16^prefix_len per row). Same md5-prefix bucketing as the
    count-min sketch, so any SQL engine reproduces membership exactly.

    Scale: output is bounded at k * 16^prefix_len rows no matter the
    input (distinct collapses map-side first); the filter is mergeable
    across datasets by unioning + distinct. The probe side broadcasts
    it (bloom_probe), giving a shuffle-free membership pre-filter —
    the classic use: drop non-members before an expensive join.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(value_col), j, prefix_len).alias("bucket"),
                    )
                    for j in range(k)
                ]
            )
        ).alias("cell")
    )
    return cells.select("cell.j", "cell.bucket").distinct()


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    value_col: str,
    k: int = 4,
    prefix_len: int = 4,
) -> DataFrame:
    """Membership test for each probe row: `maybe_member` is true iff
    ALL k bucket bits are set (Bloom semantics — no false negatives,
    false positives at the classic (1-e^{-kn/m})^k rate). The filter is
    broadcast; the probe side never shuffles."""
    keyed = probes.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(value_col), j, prefix_len).alias("bucket"),
                    )
                    for j in range(k)
                ]
            )
        ).alias("cell"),
    ).select("*", "cell.j", "cell.bucket")
    hit = F.broadcast(bloom.withColumn("_sb_set", F.lit(1)))
    # count DISTINCT set hash indices, not set rows: a probe value
    # appearing r times in `probes` contributes r rows per index, so a
    # plain count would be r*k for true members (false negative) and
    # could hit exactly k for a duplicated non-member (spurious
    # positive). Distinct j restores Bloom's no-false-negative bound.
    return (
        keyed.join(hit, ["j", "bucket"], "left")
        .groupBy(value_col)
        .agg(
            (
                F.count_distinct(
                    F.when(F.col("_sb_set").isNotNull(), F.col("j"))
                )
                == k
            ).alias("maybe_member")
        )
    )


def hll_registers(df: DataFrame, value_col: str, p: int = 9) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) with every step
    engine-neutral: h = 60-bit integer from the md5 hex prefix,
    bucket = h mod 2^p, and rho = leading-zero rank of the remaining
    (60 - p) bits computed EXACTLY as (60 - p) - len(binary(w)) + 1 —
    binary-string length, not float log2. Returns one (bucket,
    max_rho) row per non-empty register.

    Mergeable: registers of two corpus halves combine by MAX — the
    groupBy here IS the merge, so partial aggregation bounds the
    shuffle at 2^p rows per map task regardless of corpus size."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    h = F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    m = 1 << p
    w = F.shiftright(h, p)  # exact integer shift: h < 2^60 fits a long
    width = 60 - p
    # len(bin(w)) = floor(log2 w) + 1 exactly; w == 0 -> all zero -> width+1
    rho = F.when(w > 0, F.lit(width) - F.length(F.conv(w, 10, 2)) + 1).otherwise(
        F.lit(width + 1)
    )
    return (
        df.select((h % m).cast("long").alias("bucket"), rho.cast("long").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 9) -> DataFrame:
    """Raw HLL cardinality estimate from a register table: the
    harmonic sum uses EXACT integer arithmetic — with rmax = 60-p+1
    (the largest possible rho), S = sum over all 2^p registers of
    2^(rmax - M_j), zero registers contributing 2^rmax — bounded by
    m * 2^rmax < 2^63, no overflow — and the one float division
    happens once on the aggregated values, so ROUND(estimate, 3) is
    bit-identical on any engine/partitioning. Emits
    (n_zero_registers, harmonic_scaled, estimate) in one row.
    alpha_m for m >= 128 is the published 0.7213/(1 + 1.079/m)."""
    m = 1 << p
    rmax = 60 - p + 1
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.agg(
        F.count("*").cast("long").alias("n_filled"),
        # shiftleft with a COLUMN bit count only exists in SQL form
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), cast({rmax} - max_rho as int))"))
        .cast("long")
        .alias("s_filled"),
    )
    n_zero = F.lit(m) - F.col("n_filled")
    s_total = F.col("s_filled") + n_zero * F.lit(1 << rmax).cast("long")
    return agg.select(
        n_zero.cast("long").alias("n_zero_registers"),
        s_total.cast("long").alias("harmonic_scaled"),
        F.round(
            F.lit(alpha * m * m) * F.lit(float(1 << rmax)) / s_total.cast("double"), 3
        ).alias("estimate"),
    )


def kmv_pairwise_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    mult: int = 2654435761,
    space: int = 1 << 32,
) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS between per-group KMV sketches
    (Dasgupta et al., the Apache DataSketches theta model): for every
    unordered pair of groups, estimate |A∩B|, |A∪B| and the Jaccard
    from the SKETCHES ALONE — the stream is scanned once to build k
    minimum hash values per group, then every pairwise estimate is
    O(k) arithmetic on sketch rows, never a rescan. This is the
    mergeable-summary property that makes cross-partition / cross-day
    audience-overlap queries tractable at 100 TB.

    Estimator (every step integer, engine-replayable): with
    theta_g = k-th smallest hash (or the full hash space when the
    group has < k distinct values, i.e. the sketch is exact) and
    theta = min(theta_a, theta_b):
      est_inter = floor(|S_a ∩ S_b under theta| * space / theta)
      est_union = floor(|S_a ∪ S_b under theta| * space / theta)
      jaccard_milli = floor(1000 * inter_ct / union_ct)
    'Under theta' is the strict h < theta — hashes below theta are a
    uniform sample of each set at rate theta/space, so counts scale by
    space/theta.

    Scale: ONE shuffle over the stream (distinct (group, hash)); the
    per-group row_number window ranks within groups only; everything
    after operates on k-row sketches (broadcast-sized)."""
    g = F.col(group_col)
    # pmod, not %: Spark's % keeps the dividend's sign, so negative
    # values would hash negative and corrupt the k-min order / theta.
    hashed = df.select(
        g.alias("g"), F.pmod(F.col(value_col) * mult, F.lit(space)).alias("h")
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    sk = hashed.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    stats = sk.groupBy("g").agg(
        F.max("h").alias("hk"), F.count("*").alias("k_seen")
    )
    stats = stats.withColumn(
        "theta",
        F.when(F.col("k_seen") < k, F.lit(space)).otherwise(F.col("hk")),
    ).select("g", "theta")
    pairs = (
        stats.alias("a")
        .join(stats.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(
            F.col("a.g").alias("ga"),
            F.col("b.g").alias("gb"),
            F.least(F.col("a.theta"), F.col("b.theta")).alias("theta"),
        )
    )
    m = sk.select("g", "h")
    inter = (
        m.alias("x")
        .join(m.alias("y"), (F.col("x.h") == F.col("y.h")) & (F.col("x.g") < F.col("y.g")))
        .select(F.col("x.g").alias("ga"), F.col("y.g").alias("gb"), F.col("x.h").alias("h"))
        .join(pairs, ["ga", "gb"])
        .where(F.col("h") < F.col("theta"))
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("inter_ct"))
    )
    # union candidates per pair: distinct sketch hashes of either side
    union = (
        pairs.join(m.alias("u"), (F.col("u.g") == F.col("ga")) | (F.col("u.g") == F.col("gb")))
        .where(F.col("u.h") < F.col("theta"))
        .select("ga", "gb", "theta", F.col("u.h").alias("h"))
        .distinct()
        .groupBy("ga", "gb", "theta")
        .agg(F.count("*").alias("union_ct"))
    )
    out = (
        union.join(inter, ["ga", "gb"], "left")
        .withColumn("inter_ct", F.coalesce(F.col("inter_ct"), F.lit(0)))
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            F.col("inter_ct").cast("long").alias("inter_ct"),
            F.col("union_ct").cast("long").alias("union_ct"),
            F.floor(F.col("inter_ct") * F.lit(space) / F.col("theta"))
            .cast("long")
            .alias("est_inter"),
            F.floor(F.col("union_ct") * F.lit(space) / F.col("theta"))
            .cast("long")
            .alias("est_union"),
            F.floor(F.lit(1000) * F.col("inter_ct") / F.greatest(F.col("union_ct"), F.lit(1)))
            .cast("long")
            .alias("jaccard_milli"),
        )
    )
    return out
