"""Deduplication operators for document corpora.

Five strategies, all DataFrame-native:

- exact_dedup:       hash-groupBy on content digest (one shuffle)
- minhash_signatures/minhash_lsh_pairs: shingle -> k minhashes (xxhash64
  with per-function seeds, JVM-side) -> banding -> bucket equi-join.
  The classic MinHash+LSH near-dup pipeline; candidate verification via
  exact shingle Jaccard.
- simhash: 64-bit sign-aggregated token hashes per doc; near-dups share
  simhash within small Hamming distance
- ngram_jaccard_pairs: exact n-gram Jaccard on candidate pairs
- embedding_near_dup: cosine >= threshold over LSH-bucketed embeddings

Scale notes: every strategy shuffles on narrow keys (band hash, bucket
id, digest), never on document text; signatures are fixed-width arrays
computed in whole-stage codegen (xxhash64 + higher-order array
functions, no Python). Banding keeps the candidate join linear in
near-duplicate count rather than O(n^2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shr(col: Column, bits: Column) -> Column:
    """shiftright with a Column bit count (the Python wrapper only
    accepts int)."""
    return F.call_function("shiftright", col, bits)


def _shl(col: Column, bits: Column) -> Column:
    return F.call_function("shiftleft", col, bits)


def normalized_text(col: Column) -> Column:
    """Lowercase, collapse whitespace — the usual near-dup canonicalizer."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def char_shingles(col: Column, k: int = 9) -> Column:
    """Distinct k-char shingles of the normalized text (JVM-side:
    sequence + transform + substring)."""
    norm = normalized_text(col)
    n = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(norm, i, k))
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per content digest."""
    return (
        df.withColumn("content_hash", F.md5(F.col(text_col)))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 9,
) -> DataFrame:
    """doc -> minhash signature array<bigint> of length num_hashes.

    Hash family: xxhash64(seed_i, shingle) — independent 64-bit hashes,
    computed entirely in codegen (no UDF)."""
    shingles = char_shingles(F.col(text_col), shingle_k)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(F.col("_shingles"), lambda s: F.xxhash64(i, s))
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), shingles.alias("_shingles"))
        .where(F.size("_shingles") > 0)
        .withColumn("signature", sig)
        .drop("_shingles")
    )


def minhash_lsh_pairs(
    signatures: DataFrame,
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: equal band-slice -> candidate pair (classic b×r
    scheme). One shuffle on (band, band_hash); self-join inside buckets."""
    banded = signatures.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 9,
    num_bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates verified by exact shingle
    Jaccard >= threshold."""
    rows_per_band = num_hashes // num_bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    pairs = minhash_lsh_pairs(sigs, num_bands, rows_per_band)
    shingled = df.select(
        F.col(id_col).alias("doc_id"), char_shingles(F.col(text_col), shingle_k).alias("sh")
    )
    verified = (
        pairs.join(shingled.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(shingled.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """Per-doc SimHash: sign-aggregate token hashes per bit position,
    entirely with array expressions (tokens -> xxhash64 -> bit votes)."""
    tokens = F.split(normalized_text(F.col(text_col)), " ")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    bit_votes = F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda b: F.aggregate(
            F.col("_hashes"),
            F.lit(0),
            lambda acc, h: acc
            + F.when(_shr(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            F.col("_votes"),
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, b: F.when(v > 0, _shl(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), hashes.alias("_hashes"))
        .withColumn("_votes", bit_votes)
        .select("doc_id", sim.alias("simhash"))
    )


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of xor via bit_count (JVM built-in)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    block_bits: int = 16,
) -> DataFrame:
    """Near-dups within Hamming distance: block on 16-bit slices (a pair
    within distance 3 shares at least one of 4 exact slices — pigeonhole),
    verify with bit_count."""
    sims = simhash(df, text_col, id_col)
    n_blocks = 64 // block_bits
    blocked = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_blocks - 1)),
                lambda b: F.struct(
                    b.alias("block"),
                    _shr(F.col("simhash"), b * block_bits)
                    .bitwiseAND(F.lit((1 << block_bits) - 1))
                    .alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.block", "bk.key")
    l, r = blocked.alias("l"), blocked.alias("r")
    return (
        l.join(
            r,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            hamming64(F.col("l.simhash"), F.col("r.simhash")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams (JVM-side)."""
    tokens = F.split(normalized_text(col), " ")
    cnt = F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.array_join(F.slice(tokens, i + 1, n), " "),
        )
    )


def ngram_jaccard(a: Column, b: Column, n: int = 3) -> Column:
    ga, gb = word_ngrams(a, n), word_ngrams(b, n)
    return F.size(F.array_intersect(ga, gb)) / F.size(F.array_union(ga, gb))


def embedding_near_dups(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
) -> DataFrame:
    """Embedding near-dup: random-hyperplane LSH bucket (deterministic
    hash-derived planes) then exact cosine verify inside buckets."""
    from swiftbeaver_spark.llm.similarity import cosine_similarity, hyperplane_bucket

    vecs = embeddings.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    ).withColumn("bucket", hyperplane_bucket(F.col("vec"), num_planes))
    l, r = vecs.alias("l"), vecs.alias("r")
    return (
        l.join(
            r,
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            cosine_similarity(F.col("l.vec"), F.col("r.vec")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
