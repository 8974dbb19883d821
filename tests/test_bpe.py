"""BPE vocabulary induction: the distributed learner must match an
independent single-node reference implementation merge-for-merge
(this is q59's oracle — the op is iterative, so the driver gate is
rows-only and THIS test carries the correctness burden)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from swiftbeaver_spark.llm.bpe import END_MARK, bpe_learn, bpe_segment, words_table

SF_DIR = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict[str, int], num_merges: int):
    """Textbook single-node BPE (Sennrich et al. 2016 alg. 1):
    dict-of-tuples, no Spark — deliberately a different shape from the
    distributed fold."""
    vocab = {
        tuple(list(w) + [END_MARK]): c for w, c in word_counts.items()
    }
    merges = []
    for rank in range(num_merges):
        pairs: dict[tuple[str, str], int] = collections.defaultdict(int)
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, ties lexicographic — must match the Spark orderBy
        (a, b), total = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, total))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .limit(200)
        .cache()
    )


def test_bpe_matches_reference(spark, corpus):
    got = bpe_learn(corpus, num_merges=10)
    wc = {
        r["word"]: r["cnt"] for r in words_table(corpus, "text").collect()
    }
    want = _reference_bpe(wc, 10)
    assert got == want


def _reference_tokenize(text: str, merges) -> list[str]:
    """Apply learned merges to one document, word by word — the
    single-node encode twin of _reference_bpe."""
    toks: list[str] = []
    for w in " ".join(text.lower().split()).split(" "):
        if not w:
            continue
        syms = list(w) + [END_MARK]
        for _, a, b, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


def test_bpe_tokenize_matches_reference(spark, corpus):
    """bpe_tokenize (distinct-word segmentation + ordered per-doc
    reassembly) must produce exactly the reference encoder's token
    stream for every document, in document word order."""
    from swiftbeaver_spark.llm.bpe import bpe_tokenize

    merges = bpe_learn(corpus, num_merges=8)
    docs = corpus.limit(40).withColumn(
        "doc_id", F.monotonically_increasing_id()
    ).cache()
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_tokenize(docs, merges).collect()
    }
    for r in docs.collect():
        want = _reference_tokenize(r["text"], merges)
        if not want:
            assert r["doc_id"] not in got  # empty docs drop (no words)
            continue
        assert got[r["doc_id"]] == (want, len(want)), r["doc_id"]
    # lossless segmentation: concatenated tokens reconstruct the
    # normalized words (END_MARK-separated)
    some = next(iter(got.values()))[0]
    assert END_MARK in "".join(some)


def test_bpe_merges_monotone_nonincreasing_counts_not_required(spark, corpus):
    """BPE pair counts are NOT monotone (later merges can create more
    frequent pairs) — but ranks must be sequential and symbols grow."""
    got = bpe_learn(corpus, num_merges=6)
    assert [m[0] for m in got] == list(range(len(got)))
    for _, a, b, total in got:
        assert total > 0 and len(a + b) >= 2


def test_bpe_segment_applies_merges(spark):
    df = spark.createDataFrame(
        [("low low low lower lowest",)], "text string"
    )
    merges = bpe_learn(df, num_merges=4)
    words = words_table(df, "text")
    seg = {r["word"]: r["syms"] for r in bpe_segment(words, merges).collect()}
    # 'low' appears 3x -> its merges dominate; the full word + end mark
    # must be reassembled from <= 3 symbols after 4 merges
    assert "".join(seg["low"]) == "low" + END_MARK
    assert len(seg["low"]) <= 3
    for w, syms in seg.items():
        assert "".join(syms) == w + END_MARK


def test_bpe_oracle_chain_survives_early_break(spark):
    """A corpus whose words fully merge before the 12-merge budget runs
    out: Spark's bpe_learn BREAKS and keeps the words table; the
    unrolled DuckDB oracle chain must pass words through its remaining
    iterations (LEFT JOIN + coalesce) instead of annihilating them
    (the old CROSS JOIN made every later CTE empty). Compares the q59
    merge list AND the q92 segmented vocabulary engine-vs-oracle on
    the degenerate corpus."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as em
    from swiftbeaver_spark.llm.bpe import bpe_learn

    # two 2-char words: ~5 learnable merges, then no pairs remain
    docs_pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["ab ab cd", "ab cd", "cd cd ab"]}
    )
    docs = spark.createDataFrame(docs_pdf)
    merges = bpe_learn(docs, num_merges=em.BPE_MERGES)
    assert 0 < len(merges) < em.BPE_MERGES  # the break actually fired

    con = duckdb.connect()
    con.register("documents", docs_pdf)
    oracle = con.execute(em.q59_sql()).df()
    got = [
        (int(r["rank"]), r["left_sym"], r["right_sym"], int(r["pair_count"]))
        for _, r in oracle.iterrows()
    ]
    assert got == merges

    # the final words CTE must still hold every word, fully segmented
    wn = con.execute(
        em._bpe_sql_ctes(em.BPE_MERGES) + f" SELECT word, s FROM w{em.BPE_MERGES}"
    ).df()
    assert sorted(wn["word"]) == ["ab", "cd"]
    assert all(s.count("\x01") == 1 for s in wn["s"])  # one symbol per word
