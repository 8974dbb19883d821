"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure Catalyst column expressions (regexp counts, array ops,
hashes) — language ID and quality scoring over a trillion tokens must
never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny stopword marker sets per language — heuristic n-gram/stopword
# language ID in the spirit of langid's feature voting
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "los", "las", "que", "de", "y", "es", "en", "por"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased text."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def token_count_whitespace(col: Column) -> Column:
    return F.size(tokens(col))


def token_count_bpe_like(col: Column) -> Column:
    """BPE-ish subword estimate: word pieces + digits + punctuation
    (a GPT-style regex pre-tokenizer count)."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]{1,8}|[0-9]|[^A-Za-z0-9\s]"), F.lit(0))
    )


def lang_scores(col: Column) -> Column:
    """Map<lang, marker-hit-count> per document."""
    toks = tokens(col)
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in LANG_MARKERS]),
        F.array(
            *[
                F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in words])))
                for words in LANG_MARKERS.values()
            ]
        ),
    )


def detect_language(col: Column) -> Column:
    """argmax over marker votes; 'und' (undetermined) when no marker hits."""
    toks = F.array_distinct(tokens(col))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, words in LANG_MARKERS.items():
        score = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        improves = score > best_score
        best_lang = F.when(improves, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(improves, score).otherwise(best_score)
    return best_lang


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition features + a composite
    quality score in [0,1] (Gopher/C4-style filters as columns)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    stop_list = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    return df.select(
        "*",
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        (n_chars / F.greatest(n_tokens, F.lit(1))).alias("mean_token_len"),
        (
            F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0)))
            / F.greatest(n_chars, F.lit(1))
        ).alias("punct_ratio"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(stop_list, t)))
            / F.greatest(n_tokens, F.lit(1))
        ).alias("stopword_ratio"),
        (F.size(F.array_distinct(toks)) / F.greatest(n_tokens, F.lit(1))).alias(
            "distinct_token_ratio"
        ),
    ).withColumn(
        "quality_score",
        F.round(
            F.least(
                F.lit(1.0),
                (F.when(F.col("n_tokens") >= 10, 0.25).otherwise(0.0))
                + (
                    F.when(
                        (F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 12), 0.25
                    ).otherwise(0.0)
                )
                + (F.when(F.col("punct_ratio") <= 0.2, 0.25).otherwise(0.0))
                + (F.when(F.col("distinct_token_ratio") >= 0.3, 0.25).otherwise(0.0)),
            ),
            2,
        ),
    )


def fingerprint(col: Column, num_shingles: int = 8, shingle_k: int = 16) -> Column:
    """Winnowing-style document fingerprint: the num_shingles smallest
    xxhash64 values over k-char shingles, hashed into one 64-bit id.
    Robust to small edits; collision-resistant enough for blocking."""
    from swiftbeaver_spark.llm.dedup import char_shingles

    mins = F.slice(
        F.array_sort(F.transform(char_shingles(col, shingle_k), lambda s: F.xxhash64(s))),
        1,
        num_shingles,
    )
    return F.xxhash64(F.concat_ws(",", F.transform(mins, lambda h: h.cast("string"))))


def content_digest(col: Column) -> Column:
    """Stable md5 digest of normalized content (exact-dup key)."""
    from swiftbeaver_spark.llm.dedup import normalized_text

    return F.md5(normalized_text(col))


def linear_quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_len: int = 3,
) -> DataFrame:
    """fastText/CCNet-shaped linear quality scorer: hash each token
    into 16^prefix_len feature buckets, dot the document's bag of
    features with a weight vector, normalize by length. The weights
    here are a deterministic md5-derived stand-in (integers in
    [-1000, 1000], so partial sums are EXACT in any aggregation order
    — no float drift between engines); a real classifier's weights
    would arrive as a broadcast lookup table in exactly this shape.

    Scale: explode -> map-side-combinable sum on the doc key; one
    shuffle, weights never materialize as a table (closed-form md5
    expression, JVM-side)."""
    from swiftbeaver_spark.llm.dedup import normalized_text

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(normalized_text(F.col(text_col)), " "),
                lambda t: t != "",
            )
        ).alias("token"),
    )
    bucket = F.substring(F.md5(F.concat(F.lit("f:"), F.col("token"))), 1, prefix_len)
    weight = (
        F.conv(F.substring(F.md5(F.concat(F.lit("w:"), bucket)), 1, 8), 16, 10)
        .cast("long")
        % 2001
        - 1000
    )
    return (
        toks.select("doc_id", weight.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.sum("w").cast("double") / (1000.0 * F.count("*")), 6
            ).alias("quality_score"),
        )
    )
