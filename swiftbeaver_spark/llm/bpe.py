"""Distributed BPE vocabulary induction (Sennrich et al. 2016).

The training trick that makes BPE corpus-size-independent: merges
operate on the WORD-FREQUENCY table, not the corpus. A 100 TB corpus
collapses to its distinct-word table (|V| rows, bounded by language,
not data size) in one map-side-combined groupBy; every merge
iteration then costs one aggregation over |V| rows plus a map, with
the corpus never re-read.

Iteration shape (classic BPE):
  1. explode each word's adjacent symbol pairs, weighted by the
     word's corpus count,
  2. pick the globally best pair (max total count, ties broken
     lexicographically — fully deterministic),
  3. rewrite every word, merging that pair leftmost-first
     (non-overlapping) via an array fold.

The per-iteration argmax is a 1-row collect — the standard driver
sync of iterative algorithms (same shape as MLlib's k-means). Lineage
is truncated with localCheckpoint each iteration so the plan doesn't
nest one fold per merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_MARK = "▁"  # end-of-word sentinel appended to each word


def words_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """corpus -> (word, cnt): the only corpus-sized pass."""
    from swiftbeaver_spark.llm.dedup import normalized_text

    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(normalized_text(F.col(text_col)), " "),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _merge_pair_expr(a: str, b: str):
    """Fold that rewrites a symbol array, merging adjacent (a, b)
    leftmost-first without overlap: "a a a" under (a,a) -> [aa, a]."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        F.col("syms"),
        F.expr("CAST(array() AS array<string>)"),
        # leftmost-first non-overlap falls out of the fold: a merge
        # writes `a+b` into the slot, which can never equal `a` again
        # (b is non-empty), so "a a a" under (a,a) -> [aa, a]
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (s == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_learn(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn `num_merges` BPE merges over the corpus; returns
    [(rank, left_sym, right_sym, pair_count)]. Deterministic: ties on
    pair count break lexicographically."""
    words = words_table(df, text_col).withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),  # single characters
            F.array(F.lit(END_MARK)),
        ),
    )
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        pairs = words.select(
            "cnt",
            F.explode(
                F.transform(
                    # a fully-merged single-symbol word has no pairs;
                    # sequence(1, 0) would yield [1, 0] and blow up
                    # element_at — emit an empty index list instead
                    F.when(
                        F.size("syms") >= 2,
                        F.sequence(F.lit(1), F.size("syms") - 1),
                    ).otherwise(F.expr("array()").cast("array<int>")),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("cnt").cast("long").alias("total"))
            .orderBy(F.desc("total"), "a", "b")
            .limit(1)
            .collect()
        )
        if not best or best[0]["total"] <= 0:
            break
        a, b, total = best[0]["a"], best[0]["b"], best[0]["total"]
        merges.append((rank, a, b, int(total)))
        words = words.withColumn("syms", _merge_pair_expr(a, b))
        # truncate lineage: one fold per iteration would otherwise nest
        words = words.localCheckpoint(eager=True)
    return merges


def bpe_segment(words: DataFrame, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Apply a learned merge list to a (word, ...) table, adding a
    `syms` array column — the tokenizer side of BPE."""
    out = words.withColumn(
        "syms",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END_MARK))),
    )
    for _, a, b, _ in merges:
        out = out.withColumn("syms", _merge_pair_expr(a, b))
    return out


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus tokenization with a learned merge list — the encode side
    that actually runs over 100 TB. The trick is the same one training
    uses: segmentation is a pure function of the WORD, so the merge
    fold runs once per DISTINCT word (|V| rows, language-bounded), and
    the corpus-sized side only pays a join on the word key plus an
    ordered per-doc reassembly.

    Shape: (1) distinct-word table -> bpe_segment (the |V|-row fold,
    one plan — lineage does not grow with corpus size); (2) per-doc
    word instances (posexplode, normalized like training) join the
    word->symbols map on `word` — a narrow-key shuffle, and AQE turns
    it into a broadcast join whenever the segmented vocab is small
    enough to ship; (3) groupBy doc: sort_array(collect_list) by
    position, flatten — token order is exactly document word order.
    Output: (doc_id, tokens array<string>, n_tokens)."""
    from swiftbeaver_spark.llm.dedup import normalized_text

    inst = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(
            F.filter(
                F.split(normalized_text(F.col(text_col)), " "),
                lambda t: t != "",
            )
        ).alias("pos", "word"),
    )
    vocab = bpe_segment(inst.select("word").distinct(), merges).select("word", "syms")
    joined = inst.join(vocab, "word")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                    lambda s: s["syms"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens").cast("long"))
    )
