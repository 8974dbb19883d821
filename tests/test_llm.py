"""LLM-pipeline operator tests over the driver-generated testdata."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from swiftbeaver_spark.llm.dedup import (
    exact_dedup,
    minhash_near_dups,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    simhash_near_dups,
)
from swiftbeaver_spark.llm.multimodal import extract_media_meta, fake_feature
from swiftbeaver_spark.llm.similarity import brute_force_topk, lsh_topk
from swiftbeaver_spark.llm.text import (
    detect_language,
    fingerprint,
    quality_features,
    token_count_bpe_like,
    token_count_whitespace,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_dedup_with_planted_dupes(spark, documents):
    dup = documents.limit(5).withColumn("doc_id", F.col("doc_id") + 10_000)
    with_dupes = documents.unionByName(dup)
    groups = exact_dedup(with_dupes)
    assert groups.where(F.col("n_copies") == 2).count() == 5
    # keep_id is always the original (lower) id
    assert groups.where(F.col("n_copies") == 2).where(F.col("keep_id") >= 10_000).count() == 0


def test_minhash_finds_planted_near_dup(spark, documents):
    base = documents.limit(20)
    # planted near-dup: same text with one word appended
    mutated = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended")).alias("text"),
    )
    corpus = base.select("doc_id", "text").unionByName(mutated)
    pairs = minhash_near_dups(corpus, threshold=0.5).collect()
    found = {(p.doc_a, p.doc_b) for p in pairs}
    planted = {(i, i + 10_000) for i in [r.doc_id for r in base.select("doc_id").collect()]}
    assert planted <= found  # every planted pair recovered
    for p in pairs:
        assert p.jaccard >= 0.5


def test_minhash_signature_shape(documents):
    sig = minhash_signatures(documents.limit(3), num_hashes=32).collect()
    assert all(len(r.signature) == 32 for r in sig)


def test_simhash_hamming_near_dup(spark, documents):
    base = documents.limit(10)
    mutated = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    corpus = base.select("doc_id", "text").unionByName(mutated)
    pairs = simhash_near_dups(corpus, max_hamming=8)
    found = {(p.doc_a, p.doc_b) for p in pairs.collect()}
    planted = {(i, i + 10_000) for i in [r.doc_id for r in base.select("doc_id").collect()]}
    # simhash is approximate: expect most planted pairs within hamming 8
    assert len(planted & found) >= 7


def test_simhash_identical_texts_equal(spark):
    df = spark.createDataFrame(
        [(1, "spark query engine"), (2, "spark query engine"), (3, "totally different words")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_ngram_jaccard_expr(spark):
    df = spark.createDataFrame(
        [("a b c d e", "a b c d e"), ("a b c d e", "v w x y z")], ["t1", "t2"]
    )
    vals = df.select(ngram_jaccard(F.col("t1"), F.col("t2"), 3).alias("j")).collect()
    assert vals[0].j == 1.0
    assert vals[1].j == 0.0


def test_brute_force_topk_self_nearest(embeddings):
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = brute_force_topk(embeddings, queries, k=5).collect()
    by_query = {}
    for r in top:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        assert len(rows) == 5
        best = min(rows, key=lambda r: r.rank)
        assert best.vec_id == qid  # self is nearest
        assert math.isclose(best.cosine, 1.0, abs_tol=1e-9)


def test_lsh_topk_recall(embeddings):
    queries = embeddings.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = lsh_topk(embeddings, queries, k=1, num_planes=6).collect()
    # self must land in its own bucket -> rank-1 hit is the query itself
    assert {r.query_id for r in approx} == {r.vec_id for r in approx}


def test_ivf_full_probe_is_exact(embeddings):
    """nprobe == nlist scores every cell -> identical to brute force
    (whatever the trained centroids are)."""
    from swiftbeaver_spark.llm.similarity import ivf_topk

    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id, r.rank)
        for r in brute_force_topk(embeddings, queries, k=5).collect()
    }
    full = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivf_topk(embeddings, queries, k=5, nlist=8, nprobe=8, iters=1).collect()
    }
    assert full == exact


def test_ivf_self_in_own_cell(embeddings):
    """nprobe=1: a query drawn from the corpus probes its own cell, so
    its rank-1 hit is itself (cosine 1.0)."""
    from swiftbeaver_spark.llm.similarity import ivf_topk

    queries = embeddings.limit(4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top1 = ivf_topk(embeddings, queries, k=1, nlist=8, nprobe=1, iters=2).collect()
    assert {r.query_id for r in top1} == {r.vec_id for r in top1}


def test_ivf_cells_partition_corpus(embeddings):
    """Every vector lands in exactly one cell within [0, nlist)."""
    from swiftbeaver_spark.llm.similarity import ivf_cell, ivf_train

    c = embeddings.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    cents = ivf_train(c, nlist=8, iters=1, id_col="vec_id", vec_col="vec")
    assert len(cents) == 8
    cells = c.select(ivf_cell(F.col("vec"), cents).alias("cell"))
    stats = cells.agg(
        F.count("*").alias("n"), F.min("cell").alias("lo"), F.max("cell").alias("hi")
    ).collect()[0]
    assert stats.n == c.count() and 0 <= stats.lo and stats.hi < 8


def test_ivf_pinned_quantizer_candidates_subset(embeddings):
    """Pinned-quantizer IVF returns a candidate ranking whose hits are a
    subset of the corpus restricted to probed cells — and increasing
    nprobe only grows the candidate pool (monotone recall)."""
    from swiftbeaver_spark.llm.similarity import ivf_topk, md5_centroids

    cents = md5_centroids(8, 64)
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(embeddings, queries, k=5).collect()
    }
    hits = {}
    for nprobe in (2, 8):
        hits[nprobe] = {
            (r.query_id, r.vec_id)
            for r in ivf_topk(
                embeddings, queries, k=5, nprobe=nprobe, centroids=cents, quantizer="dot"
            ).collect()
        }
    assert len(hits[2] & exact) <= len(hits[8] & exact)
    assert hits[8] == exact  # all 8 cells probed == brute force


def test_connected_components_chain_cycle_fork(spark):
    from swiftbeaver_spark.llm.cluster import connected_components

    pairs = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4),        # chain: component 1
            (10, 11), (11, 12), (12, 10),  # cycle: component 10
            (20, 21), (20, 22), (20, 23),  # star: component 20
            (30, 31),                      # pair: component 30
        ],
        "doc_a long, doc_b long",
    )
    comps = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert comps == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20, 22: 20, 23: 20,
        30: 30, 31: 30,
    }


def test_dedup_keep_canonical(spark):
    from swiftbeaver_spark.llm.cluster import dedup_keep_canonical

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (6, 7)], "doc_a long, doc_b long"
    )
    kept = {r.doc_id for r in dedup_keep_canonical(docs, pairs).collect()}
    # clusters {1,2,5} -> keep 1; {6,7} -> keep 6; unpaired 0,3,4 kept
    assert kept == {0, 1, 3, 4, 6}


def test_language_detection(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy"),
            (2, "der Hund ist nicht mit der Katze"),
            (3, "el perro y la casa en que vivimos"),
            (4, "xyzzy qwerty zzz"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.lang for r in df.select("doc_id", detect_language(F.col("text")).alias("lang")).collect()}
    assert rows[1] == "en" and rows[2] == "de" and rows[3] == "es" and rows[4] == "und"


def test_quality_features(documents):
    rows = quality_features(documents.limit(10)).collect()
    for r in rows:
        assert 0.0 <= r.quality_score <= 1.0
        assert r.n_tokens > 0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.distinct_token_ratio <= 1.0


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello world, this is 42 tokens?")], ["id", "text"])
    r = df.select(
        token_count_whitespace(F.col("text")).alias("ws"),
        token_count_bpe_like(F.col("text")).alias("bpe"),
    ).collect()[0]
    assert r.ws == 6
    assert r.bpe >= r.ws  # subword count >= word count


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 4)], ["id", "text"]
    )
    a = df.select(fingerprint(F.col("text")).alias("fp")).collect()[0].fp
    b = df.select(fingerprint(F.col("text")).alias("fp")).collect()[0].fp
    assert a == b


def test_fingerprint_pinned_blocking(spark):
    from swiftbeaver_spark.llm.text import fingerprint_pinned

    base = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact copy -> identical fingerprint
            (3, "  THE   quick brown fox jumps over the lazy dog " * 4),
            (4, "completely different text about spark catalyst optimizer engines"),
        ],
        ["id", "text"],
    )
    fps = {
        r.id: r.fp
        for r in df.select("id", fingerprint_pinned(F.col("text")).alias("fp")).collect()
    }
    assert fps[1] == fps[2]
    # normalization (case + whitespace collapse) folds 3 into 1... except
    # the leading-token difference: norm(3) == 'the quick...' == norm(1)
    assert fps[3] == fps[1]
    assert fps[4] != fps[1]


def test_embedding_near_dups_pinned_planes(spark):
    from swiftbeaver_spark.llm.dedup import embedding_near_dups
    from swiftbeaver_spark.llm.similarity import md5_plane_matrix

    rows = [
        (1, [1.0, 0.0, 0.5, -0.25]),
        (2, [2.0, 0.0, 1.0, -0.5]),  # exact 2x of 1 -> cosine 1.0, same bucket
        (3, [-1.0, 0.5, -0.5, 0.25]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    pairs = {
        (r.doc_a, r.doc_b): r.cosine
        for r in embedding_near_dups(
            df,
            threshold=0.95,
            plane_matrix=md5_plane_matrix(4, 4),
            round_cosine=6,
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert all(a != 3 and b != 3 for a, b in pairs)


def test_incremental_minhash_probe(spark):
    from swiftbeaver_spark.llm.dedup import (
        incremental_minhash_near_dups,
        minhash_band_index,
        minhash_signatures,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "completely unrelated text about catalyst query optimization"),
        ],
        ["doc_id", "text"],
    )
    index = minhash_band_index(minhash_signatures(corpus))
    batch = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog again and again tail"),
            (101, "nothing like anything already ingested whatsoever here"),
        ],
        ["doc_id", "text"],
    )
    hits = incremental_minhash_near_dups(batch, index, corpus, threshold=0.5).collect()
    assert {(r.new_doc_id, r.doc_id) for r in hits} == {(100, 1)}
    assert all(0.5 <= r.jaccard <= 1.0 for r in hits)


def test_multimodal_meta(spark):
    media = spark.createDataFrame(
        [
            (1, "image", "image/jpeg", b"\xff\xd8\xff" + b"j" * 100, None),
            (2, "audio", "audio/mpeg", b"ID3" + b"a" * 200, None),
            (3, "video", "video/mp4", b"\x00\x00\x00\x14ftyp" + b"v" * 300, None),
        ],
        "media_id LONG, modality STRING, mime STRING, payload BINARY, source_uri STRING",
    )
    meta = {r.media_id: r for r in extract_media_meta(media).collect()}
    img = meta[1]
    assert img.width is not None and img.height is not None and img.duration_ms is None
    aud = meta[2]
    assert aud.duration_ms is not None and aud.width is None
    vid = meta[3]
    assert vid.width is not None and vid.duration_ms is not None
    for r in meta.values():
        assert len(r.feature) == 8
        assert math.isclose(sum(v * v for v in r.feature), 1.0, rel_tol=1e-6)
        assert r.byte_size > 0


def test_decode_image_is_stubbed():
    from swiftbeaver_spark.llm.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def _mk_png(w: int, h: int) -> bytes:
    import struct as _s
    import zlib

    def chunk(t: bytes, d: bytes) -> bytes:
        return _s.pack(">I", len(d)) + t + d + _s.pack(">I", zlib.crc32(t + d))

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return b"\x89PNG\r\n\x1a\x0a" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")


def _mk_gif(w: int, h: int) -> bytes:
    import struct as _s

    return b"GIF89a" + _s.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def _mk_bmp(w: int, h: int) -> bytes:
    import struct as _s

    dib = _s.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, 4, 0, 0, 0, 0)
    return b"BM" + _s.pack("<I", 14 + 40 + 4) + b"\x00" * 4 + _s.pack("<I", 54) + dib


def _mk_jpeg_sof(w: int, h: int) -> bytes:
    import struct as _s

    app0 = b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + _s.pack(">H", 11) + b"\x08" + _s.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_header_image_dims_true_values():
    """Carve-native formats (BMP/PNG/GIF/JPEG) yield their REAL declared
    dims codec-free (VERDICT r2 #6); non-image bytes yield None."""
    from swiftbeaver_spark.llm.multimodal import header_image_dims

    assert header_image_dims(_mk_png(640, 480)) == (640, 480)
    assert header_image_dims(_mk_gif(320, 200)) == (320, 200)
    assert header_image_dims(_mk_bmp(800, 600)) == (800, 600)  # abs(-h)
    assert header_image_dims(_mk_jpeg_sof(1024, 768)) == (1024, 768)
    assert header_image_dims(b"doc:some text payload") is None
    assert header_image_dims(b"BM" + b"text that merely starts with BM!") is None
    assert header_image_dims(b"") is None
    assert header_image_dims(_mk_png(640, 480)[:12]) is None  # truncated


def test_extract_media_meta_real_dims(spark):
    """extract_media_meta prefers true header dims over the fake for
    image payloads; codec-requiring payloads keep the stub path."""
    media = spark.createDataFrame(
        [
            (1, "image", "image/png", _mk_png(640, 480), None),
            (2, "image", "image/gif", _mk_gif(320, 200), None),
            (3, "image", "image/bmp", _mk_bmp(800, 600), None),
            (4, "image", "image/jpeg", _mk_jpeg_sof(1024, 768), None),
            (5, "image", "image/webp", b"RIFF\x10\x00\x00\x00WEBPVP8 ", None),
        ],
        "media_id LONG, modality STRING, mime STRING, payload BINARY, source_uri STRING",
    )
    meta = {r.media_id: (r.width, r.height) for r in extract_media_meta(media).collect()}
    assert meta[1] == (640, 480)
    assert meta[2] == (320, 200)
    assert meta[3] == (800, 600)
    assert meta[4] == (1024, 768)
    assert meta[5][0] is not None  # webp: deterministic stand-in dims


def test_bm25_ranking(spark):
    from swiftbeaver_spark.llm.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),          # high tf on 'spark'
            (2, "spark engine"),                      # one hit each
            (3, "engine engine engine engine"),       # only 'engine' (common)
            (4, "nothing relevant here at all"),      # no hits
            (5, "database engine"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bm25_scores(docs, ["spark", "engine"]).collect()}
    assert 4 not in got                     # no matching term -> no row
    assert got[1]["bm25"] > got[2]["bm25"]  # higher tf wins
    # 'spark' is rarer than 'engine' -> doc with spark outranks engine-only
    assert got[2]["bm25"] > got[3]["bm25"]
    assert got[2]["n_terms_hit"] == 2 and got[3]["n_terms_hit"] == 1


def test_bm25_no_transcendentals_reproducible(spark):
    """Two runs produce bit-identical doubles (ratio idf, no log)."""
    from swiftbeaver_spark.llm.text import bm25_scores

    docs = spark.createDataFrame(
        [(i, f"term{i % 7} term{i % 3} filler words {i}") for i in range(100)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["term1", "term2"]).collect()}
    b = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, ["term1", "term2"]).collect()}
    assert a == b and len(a) > 0


def test_token_rarity_integer_exact(spark):
    from swiftbeaver_spark.llm.text import token_rarity

    docs = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common common"),
        ],
        "doc_id long, text string",
    )
    # corpus: common x5, rare x1, total 6
    got = {r["doc_id"]: r for r in token_rarity(docs).collect()}
    # doc1: 3*(6000 div 5) + (6000 div 1) = 3*1200 + 6000 = 9600; /4 = 2400
    assert got[1]["rarity_sum_milli"] == 9600
    assert got[1]["mean_rarity_milli"] == 2400.0
    # doc2: 2*1200/2 = 1200
    assert got[2]["mean_rarity_milli"] == 1200.0


def test_edit_distance_near_dups(spark):
    from swiftbeaver_spark.llm.dedup import edit_distance_near_dups

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dot"),   # dist 1
            (3, "the quick brown fox jumped over the lazy dog!"), # dist <= 3
            (4, "a completely different sentence that shares nothing"),
            (5, "short"),
        ],
        "doc_id long, text string",
    )
    got = {(r["doc_a"], r["doc_b"]): r["dist"] for r in edit_distance_near_dups(docs, 3).collect()}
    assert got[(1, 2)] == 1
    assert (1, 3) in got and got[(1, 3)] <= 3
    assert all(a != 4 and b != 4 for a, b in got)
    assert all(a != 5 and b != 5 for a, b in got)


def test_edit_distance_pairs_emitted_once(spark):
    """Same-band pairs appear in two shared bands; the
    max(base)-band filter must emit each exactly once."""
    from swiftbeaver_spark.llm.dedup import edit_distance_near_dups

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaab"), (3, "aaba")],  # identical lengths
        "doc_id long, text string",
    )
    rows = edit_distance_near_dups(docs, 2).collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in rows]
    assert sorted(pairs) == [(1, 2), (1, 3), (2, 3)]  # no duplicates


def test_edit_distance_cross_band_pair_found(spark):
    """A pair whose lengths straddle a band edge (bands differ by 1)
    must still be found via the +1 band copy."""
    from swiftbeaver_spark.llm.dedup import edit_distance_near_dups

    # w = 3: len 5 -> band 1, len 6 -> band 2
    docs = spark.createDataFrame(
        [(1, "abcde"), (2, "abcdex")], "doc_id long, text string"
    )
    got = edit_distance_near_dups(docs, 2).collect()
    assert [(r["doc_a"], r["doc_b"], r["dist"]) for r in got] == [(1, 2, 1)]


def _mk_wav_dur(seconds: int, byte_rate: int = 16000) -> bytes:
    import struct as _s

    data = b"\x00" * (seconds * byte_rate)
    fmt = _s.pack("<HHIIHH", 1, 1, 8000, byte_rate, 2, 16)
    body = b"WAVE" + b"fmt " + _s.pack("<I", len(fmt)) + fmt
    body += b"data" + _s.pack("<I", len(data)) + data
    return b"RIFF" + _s.pack("<I", len(body)) + body


def _mk_mp4_dur(ms: int, version: int = 0) -> bytes:
    import struct as _s

    timescale = 1000
    if version == 1:
        mvhd_body = b"\x01\x00\x00\x00" + b"\x00" * 16 + _s.pack(
            ">IQ", timescale, ms
        )
    else:
        mvhd_body = b"\x00\x00\x00\x00" + b"\x00" * 8 + _s.pack(
            ">II", timescale, ms
        )
    mvhd = _s.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = _s.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = _s.pack(">I", 16) + b"ftyp" + b"isom\x00\x00\x02\x00"
    return ftyp + moov


def test_header_media_duration():
    from swiftbeaver_spark.llm.multimodal import header_media_duration_ms

    assert header_media_duration_ms(_mk_wav_dur(3)) == 3000
    assert header_media_duration_ms(_mk_mp4_dur(4500)) == 4500
    assert header_media_duration_ms(_mk_mp4_dur(7250, version=1)) == 7250
    assert header_media_duration_ms(b"doc:not media at all") is None
    assert header_media_duration_ms(b"RIFF\x04\x00\x00\x00WAVE") is None  # no chunks
    # truncated mvhd: an 8-byte mvhd box ending exactly at end-of-payload
    # has an EMPTY body — payload[body] used to raise IndexError and kill
    # the whole mapInPandas task instead of returning None
    import struct as _s

    trunc = (
        _s.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
        + _s.pack(">I", 16) + b"moov"
        + _s.pack(">I", 8) + b"mvhd"
    )
    assert header_media_duration_ms(trunc) is None


def test_extract_media_meta_real_duration(spark):
    media = spark.createDataFrame(
        [
            (1, "audio", "audio/wav", _mk_wav_dur(2), None),
            (2, "video", "video/mp4", _mk_mp4_dur(9000), None),
            (3, "audio", "audio/mpeg", b"ID3" + b"x" * 50, None),  # stub path
        ],
        "media_id LONG, modality STRING, mime STRING, payload BINARY, source_uri STRING",
    )
    meta = {r.media_id: r.duration_ms for r in extract_media_meta(media).collect()}
    assert meta[1] == 2000
    assert meta[2] == 9000
    assert meta[3] is not None  # deterministic stand-in for codec formats


def _mk_tar_shard(samples: dict[str, dict[str, bytes]]) -> bytes:
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key, parts in samples.items():
            for ext, data in parts.items():
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_webdataset_roundtrip(spark, tmp_path):
    from swiftbeaver_spark.llm.webdataset import read_webdataset, samples

    shard_a = _mk_tar_shard(
        {
            "00001": {"png": _mk_png(32, 16), "json": b'{"lbl": 1}'},
            "00002": {"png": _mk_png(8, 8), "json": b'{"lbl": 2}', "txt": b"cap"},
        }
    )
    shard_b = _mk_tar_shard({"00003": {"wav": b"RIFFxxxx", "json": b"{}"}})
    (tmp_path / "s-000.tar").write_bytes(shard_a)
    (tmp_path / "s-001.tar").write_bytes(shard_b)

    members = read_webdataset(spark, str(tmp_path))
    rows = members.collect()
    assert {(r["sample_key"], r["ext"]) for r in rows} == {
        ("00001", "png"), ("00001", "json"),
        ("00002", "png"), ("00002", "json"), ("00002", "txt"),
        ("00003", "wav"), ("00003", "json"),
    }
    smp = {r["sample_key"]: r for r in samples(members).collect()}
    assert smp["00002"]["n_parts"] == 3
    assert bytes(smp["00001"]["parts"]["json"]) == b'{"lbl": 1}'

    # the member rows feed the multimodal pipeline directly: real dims
    from swiftbeaver_spark.llm.multimodal import header_image_dims

    png1 = next(r for r in rows if r["sample_key"] == "00001" and r["ext"] == "png")
    assert header_image_dims(bytes(png1["payload"])) == (32, 16)


def test_webdataset_dotted_ext(spark, tmp_path):
    from swiftbeaver_spark.llm.webdataset import read_webdataset

    shard = _mk_tar_shard({"k": {"seg.png": b"abc"}})
    (tmp_path / "x.tar").write_bytes(shard)
    r = read_webdataset(spark, str(tmp_path)).collect()[0]
    assert r["sample_key"] == "k" and r["ext"] == "seg.png"


def test_pq_encode_shape_and_determinism(embeddings):
    from swiftbeaver_spark.llm.similarity import pq_encode, pq_train

    books = pq_train(embeddings, m=8, k=16, iters=1)
    assert len(books) == 8 and all(len(b[0]) == 8 for b in books)
    enc = pq_encode(embeddings.limit(20), books)
    rows = enc.select("vec_id", "pq_code").collect()
    for r in rows:
        assert len(r["pq_code"]) == 8
        assert all(0 <= c < 16 for c in r["pq_code"])
    again = {r["vec_id"]: list(r["pq_code"]) for r in pq_encode(embeddings.limit(20), books).select("vec_id", "pq_code").collect()}
    assert {r["vec_id"]: list(r["pq_code"]) for r in rows} == again


def test_pq_adc_matches_python_reference(spark, embeddings):
    """ADC score == sum of exact subspace distances to the assigned
    sub-centroids, checked against a plain-Python replay."""
    from swiftbeaver_spark.llm.similarity import pq_encode, pq_topk, pq_train

    books = pq_train(embeddings, m=8, k=8, iters=1)
    corpus = pq_encode(embeddings.limit(30), books)
    queries = embeddings.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = pq_topk(corpus, queries, books, k=30)
    qvecs = {
        r["query_id"]: [float(x) for x in r["query_vec"]] for r in queries.collect()
    }
    code_map = {r["vec_id"]: list(r["pq_code"]) for r in corpus.select("vec_id", "pq_code").collect()}
    dsub = len(books[0][0])
    for r in got.collect():
        q = qvecs[r["query_id"]]
        want = 0.0
        for j, c in enumerate(code_map[r["vec_id"]]):
            sub = q[j * dsub : (j + 1) * dsub]
            cent = books[j][c]
            want += sum((a - b) ** 2 for a, b in zip(sub, cent))
        assert abs(r["adc_dist"] - want) < 1e-9


def test_pq_recall_beats_random(embeddings):
    """PQ top-10 must overlap the exact sq-L2 top-10 far above the
    random baseline (10/1000): sanity that the quantization preserves
    neighborhood structure on the real embedding table."""
    from swiftbeaver_spark.llm.similarity import pq_encode, pq_topk, pq_train

    books = pq_train(embeddings, m=8, k=16, iters=2)
    corpus = pq_encode(embeddings, books)
    queries = embeddings.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = pq_topk(corpus, queries, books, k=10)
    got = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])

    # exact squared-L2 top-10 via brute force in python on the driver
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in embeddings.collect()}
    hits = 0
    for qid in got:
        q = vecs[qid]
        exact = sorted(
            vecs, key=lambda v: (sum((a - b) ** 2 for a, b in zip(vecs[v], q)), v)
        )[:10]
        hits += len(got[qid] & set(exact))
    assert hits >= 10  # >= 20% recall@10 over 5 queries; random ~ 0.5


def test_ivfpq_recall_beats_random(embeddings):
    """IVF-PQ (cell pruning + ADC over probed cells only) must keep
    recall@10 at or above the q85 full-scan-PQ bar — pruning with
    nprobe=4/8 cells should cost little recall on top of the
    quantization error."""
    from swiftbeaver_spark.llm.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        md5_centroids,
    )

    cents = md5_centroids(8, 64, tag="ivfpqcent")
    books = [md5_centroids(16, 8, tag=f"pqbook{j}") for j in range(8)]
    codes = ivfpq_encode(embeddings, cents, books, round_dp=6)
    queries = embeddings.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = ivfpq_topk(codes, queries, cents, books, k=10, nprobe=4)
    got = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert all(len(v) == 10 for v in got.values())

    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in embeddings.collect()}
    hits = 0
    for qid in got:
        q = vecs[qid]
        exact = sorted(
            vecs, key=lambda v: (sum((a - b) ** 2 for a, b in zip(vecs[v], q)), v)
        )[:10]
        hits += len(got[qid] & set(exact))
    assert hits >= 10  # same bar as test_pq_recall_beats_random


def test_ivfpq_prunes_to_probed_cells(spark, embeddings):
    """The composition's point: only codes in probed cells are scored.
    Candidate sets must equal {vectors whose cell is probed}, strictly
    smaller than the corpus, and the plan must broadcast the query side
    (one BroadcastHashJoin on cell, no SortMergeJoin)."""
    from swiftbeaver_spark.llm.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        md5_centroids,
    )

    cents = md5_centroids(8, 64, tag="ivfpqcent")
    books = [md5_centroids(16, 8, tag=f"pqbook{j}") for j in range(8)]
    codes = ivfpq_encode(embeddings, cents, books, round_dp=6).cache()
    queries = embeddings.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    n = codes.count()
    # k > corpus so the window keeps EVERY scored candidate
    out = ivfpq_topk(codes, queries, cents, books, k=n + 1, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    cand = {}
    for r in out.collect():
        cand.setdefault(r["query_id"], set()).add(r["vec_id"])
    cell_of = {r["vec_id"]: r["cell"] for r in codes.select("vec_id", "cell").collect()}
    cells_present = set(cell_of.values())
    for qid, ids in cand.items():
        probed = {cell_of[v] for v in ids}
        assert len(probed) <= 2
        # pruning really dropped the unprobed cells' vectors
        assert ids == {v for v, c in cell_of.items() if c in probed}
        if len(cells_present) > 2:
            assert len(ids) < n
    codes.unpersist()


def test_coarse_refine_exact_when_shortlist_covers_corpus(spark, embeddings):
    """shortlist >= |corpus| degenerates to exact brute force: the
    re-ranked top-k must equal exact cosine top-k."""
    from swiftbeaver_spark.llm.similarity import (
        bq_thresholds,
        coarse_refine_topk,
        cosine_similarity,
    )

    mids = bq_thresholds(embeddings)
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    n = embeddings.count()
    got = coarse_refine_topk(embeddings, queries, mids, k=5, shortlist=n)
    exact = {}
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in embeddings.collect()}
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for r in queries.collect():
        q = [float(x) for x in r["query_vec"]]
        top = sorted(vecs, key=lambda v: (-cos(vecs[v], q), v))[:5]
        exact[r["query_id"]] = top
    for r in got.collect():
        assert exact[r["query_id"]][r["rank"] - 1] == r["vec_id"]


def test_coarse_refine_recall_with_small_shortlist(embeddings):
    """A 50-vector Hamming shortlist out of ~1000 must still recover
    most of the exact top-10 — the 1-bit codes preserve neighborhoods
    well enough to be the coarse stage."""
    from swiftbeaver_spark.llm.similarity import bq_thresholds, coarse_refine_topk

    mids = bq_thresholds(embeddings)
    queries = embeddings.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {}
    for r in coarse_refine_topk(embeddings, queries, mids, k=10, shortlist=50).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    import math

    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in embeddings.collect()}
    hits = 0
    for qid in got:
        q = vecs[qid]

        def cs(v):
            dot = sum(x * y for x, y in zip(vecs[v], q))
            na = math.sqrt(sum(x * x for x in vecs[v]))
            nb = math.sqrt(sum(x * x for x in q))
            return dot / (na * nb)

        exact = sorted(vecs, key=lambda v: (-cs(v), v))[:10]
        hits += len(got[qid] & set(exact))
    assert hits >= 15  # >=30% recall@10 over 5 queries; random ~ 0.5


def test_sq8_roundtrip_error_bound(spark, embeddings):
    """Dequantized midpoints reconstruct within step/2 per dimension;
    codes are in [0, 255]; encoding is deterministic."""
    from swiftbeaver_spark.llm.similarity import sq8_decode, sq8_encode, sq8_train

    lo, hi = sq8_train(embeddings)
    assert len(lo) == 64 and all(l <= h for l, h in zip(lo, hi))
    enc = sq8_encode(embeddings.limit(50), lo, hi)
    dec = sq8_decode(enc, lo, hi)
    rows = dec.select("vec_id", "embedding", "sq8", "dequant").collect()
    assert len(rows) == 50
    for r in rows:
        assert all(0 <= c <= 255 for c in r["sq8"])
        for d, (v, q) in enumerate(zip(r["embedding"], r["dequant"])):
            step = (hi[d] - lo[d]) / 256.0
            # clamp means values at the max edge sit in the top bin;
            # within-range values reconstruct to within step/2 + eps
            if step > 0 and lo[d] <= v <= hi[d]:
                assert abs(float(v) - q) <= step / 2 + 1e-9, (d, v, q, step)


def test_bq_encode_and_hamming(spark, embeddings):
    from swiftbeaver_spark.llm.similarity import bq_encode, bq_thresholds, bq_topk

    mids = bq_thresholds(embeddings)
    assert len(mids) == 64
    enc = bq_encode(embeddings, mids, out_col="bq")
    rows = enc.select("vec_id", "bq", "embedding").collect()
    # python replay: bit d set iff v[d] > mid[d]
    for r in rows[:10]:
        want = 0
        for d, v in enumerate(r["embedding"]):
            if float(v) > mids[d]:
                want |= 1 << d
        if want >= 1 << 63:  # two's-complement view of bit 63
            want -= 1 << 64
        assert r["bq"] == want
    # self-query: hamming 0 -> rank 1 is self
    queries = enc.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("bq").alias("query_bq")
    )
    top1 = bq_topk(enc, queries, k=1)
    got = {r["query_id"]: (r["vec_id"], r["hamming"]) for r in top1.collect()}
    for qid, (vid, h) in got.items():
        assert h == 0
        # hamming-0 ties resolve to the lowest id; self is always at distance 0
        assert vid <= qid


def _box(name: bytes, payload: bytes) -> bytes:
    import struct as _s

    return _s.pack(">I", 8 + len(payload)) + name + payload


def _mk_mp4_with_samples(frames: list[bytes], timescale: int = 1000, delta: int = 40) -> bytes:
    """Minimal ISO-BMFF file whose stbl tables really describe the mdat
    frame spans — the fixture for codec-free frame sampling."""
    import struct as _s

    ftyp = _box(b"ftyp", b"isom" + b"\x00" * 8)
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    mdat_off = len(ftyp) + 8  # first frame's absolute offset
    stts = _box(b"stts", b"\x00" * 4 + _s.pack(">III", 1, len(frames), delta))
    stsz = _box(
        b"stsz",
        b"\x00" * 4 + _s.pack(">II", 0, len(frames))
        + b"".join(_s.pack(">I", len(f)) for f in frames),
    )
    stsc = _box(b"stsc", b"\x00" * 4 + _s.pack(">I", 1) + _s.pack(">III", 1, len(frames), 1))
    stco = _box(b"stco", b"\x00" * 4 + _s.pack(">I", 1) + _s.pack(">I", mdat_off))
    stbl = _box(b"stbl", stts + stsz + stsc + stco)
    minf = _box(b"minf", stbl)
    mdhd = _box(
        b"mdhd", b"\x00" * 4 + _s.pack(">II", 0, 0) + _s.pack(">II", timescale, len(frames) * delta) + b"\x00" * 4
    )
    mdia = _box(b"mdia", mdhd + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    return ftyp + mdat + moov


def _mk_bmp24(width: int, height: int, pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """24-bit bottom-up BMP; pixels[y][x] = (b, g, r) in top-down order."""
    import struct as _s

    stride = (width * 3 + 3) & ~3
    body = b""
    for y in range(height - 1, -1, -1):  # bottom-up rows
        row = b"".join(bytes(pixels[y][x]) for x in range(width))
        body += row + b"\x00" * (stride - len(row))
    dib = _s.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 0, 0, 0, 0)
    return (
        b"BM" + _s.pack("<I", 54 + len(body)) + b"\x00" * 4 + _s.pack("<I", 54) + dib + body
    )


def test_resize_bmp_real_pixels():
    from swiftbeaver_spark.llm.multimodal import header_image_dims, resize_bmp

    # 4x2 image, distinct pixels; nearest-neighbor to 2x1 picks
    # logical row 0, columns 0 and 2
    pix = [
        [(1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 4, 4)],
        [(5, 5, 5), (6, 6, 6), (7, 7, 7), (8, 8, 8)],
    ]
    src = _mk_bmp24(4, 2, pix)
    out = resize_bmp(src, 2, 1)
    assert out is not None and header_image_dims(out) == (2, 1)
    reparsed = resize_bmp(out, 2, 1)  # output is itself a valid BMP
    assert reparsed is not None
    body = out[54:]
    assert body[0:3] == bytes((1, 1, 1)) and body[3:6] == bytes((3, 3, 3))
    assert resize_bmp(b"\xff\xd8notabmp", 2, 2) is None


def test_mp4_sample_index_and_frames(spark):
    from swiftbeaver_spark.llm.multimodal import mp4_sample_index, sample_video_frames

    frames = [b"AA", b"BBB", b"CCCC"]
    blob = _mk_mp4_with_samples(frames)
    idx = mp4_sample_index(blob)
    assert idx is not None and len(idx) == 3
    assert [t for _, t, _, _ in idx] == [0, 40, 80]
    for (si, _t, off, size), expect in zip(idx, frames):
        assert blob[off : off + size] == expect
    media = spark.createDataFrame(
        [(1, blob), (2, b"not a video")], "media_id LONG, payload BINARY"
    )
    rows = sample_video_frames(media, stride=2).collect()
    got = {(r.media_id, r.frame_idx): r for r in rows}
    assert bytes(got[(1, 0)].frame_bytes) == b"AA"
    assert bytes(got[(1, 2)].frame_bytes) == b"CCCC"
    assert (1, 1) not in got  # stride 2 skips the middle frame
    assert got[(2, -1)].status == "unsupported"


def test_wav_audio_windows(spark):
    import struct as _s

    from swiftbeaver_spark.llm.multimodal import sample_audio_windows

    # 8 bytes/sec, block_align 2 -> 1s windows = 8 bytes
    pcm = bytes(range(20))
    fmt = _s.pack("<HHIIHH", 1, 1, 4, 8, 2, 16)
    wav = (
        b"RIFF" + _s.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm)) + b"WAVE"
        + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", len(pcm)) + pcm
    )
    media = spark.createDataFrame([(7, wav)], "media_id LONG, payload BINARY")
    rows = sorted(sample_audio_windows(media, window_ms=1000).collect(), key=lambda r: r.window_idx)
    assert [r.t_ms for r in rows] == [0, 1000, 2000]
    assert bytes(rows[0].pcm) == pcm[0:8]
    assert bytes(rows[2].pcm) == pcm[16:20]  # final partial window


def test_gopher_and_c4_filters(spark):
    from swiftbeaver_spark.llm.text import c4_clean_lines, gopher_quality_flags

    good = " ".join(["word"] * 60)
    df = spark.createDataFrame(
        [(1, good), (2, "too short"), (3, good + " ###" * 20)], ["doc_id", "text"]
    )
    flags = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert flags[1].passes_gopher
    assert not flags[2].word_count_ok
    assert not flags[3].symbol_ratio_ok

    doc = spark.createDataFrame(
        [
            (1, "a good long sentence.\nno punct line\ntwo words.\nanother good line!"),
            (2, "fine sentence here.\nbut it has lorem ipsum inside."),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in c4_clean_lines(doc).collect()}
    assert out[1].n_kept == 2 and "no punct" not in out[1].clean_text
    assert out[2].n_kept == 0 and out[2].clean_text == ""


def test_ivfpq_residual_matches_python_reference(spark):
    """Residual IVF-PQ (encode residual=True + topk residual=True) on a
    tiny pinned fixture must reproduce an exact Python replay of the
    whole index: cell assignment, residual sub-codes, per-cell query
    LUTs, and ADC sums."""
    from pyspark.sql import functions as F

    from swiftbeaver_spark.llm.similarity import (
        ivfpq_encode,
        ivfpq_topk,
        md5_centroids,
        md5_plane_matrix,
    )

    dim, m, kk, nlist = 8, 2, 4, 4
    cents = md5_centroids(nlist, dim)
    books = [
        [row[:4] for row in md5_plane_matrix(kk, dim)],
        [row[4:8] for row in md5_plane_matrix(kk, dim)],
    ]
    vecs = [
        [((i * 7 + j * 3) % 11 - 5) / 4.0 for j in range(dim)] for i in range(6)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    codes = ivfpq_encode(df, cents, books, round_dp=6, residual=True)
    queries = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = {
        (r.query_id, r.vec_id): round(r.adc_dist, 6)
        for r in ivfpq_topk(
            codes, queries, cents, books, k=6, nprobe=nlist, residual=True
        ).collect()
    }

    # pure-Python replay
    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    def cell_of(v):
        ds = [round(dot(v, c), 6) for c in cents]
        return max(range(nlist), key=lambda p: (ds[p], -p))

    def encode(v):
        cell = cell_of(v)
        r = [x - c for x, c in zip(v, cents[cell])]
        code = []
        for j in range(m):
            sub = r[j * 4 : j * 4 + 4]
            dists = [
                round(sum((s - c) ** 2 for s, c in zip(sub, book)), 6)
                for book in books[j]
            ]
            code.append(min(range(kk), key=lambda p: (dists[p], p)))
        return cell, code

    enc = {i: encode(v) for i, v in enumerate(vecs)}
    for (qid, vid), adc in got.items():
        qv = vecs[qid]
        cell, code = enc[vid]
        qr = [x - c for x, c in zip(qv, cents[cell])]
        want = 0.0
        for j in range(m):
            sub = qr[j * 4 : j * 4 + 4]
            book = books[j][code[j]]
            want += sum((s - c) ** 2 for s, c in zip(sub, book))
        assert abs(adc - want) < 1e-6, (qid, vid, adc, want)
    # full probe -> every vector is a candidate for every query
    assert len(got) == 12


def test_semantic_dedup_drops_planted_copy(spark, embeddings):
    from swiftbeaver_spark.llm.similarity import md5_centroids, semantic_dedup

    planted = embeddings.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(3.0)).alias("embedding"),
    )
    corpus = embeddings.select("vec_id", "embedding").unionByName(planted)
    cents = md5_centroids(8, 64, tag="semdedup")
    out = {r.vec_id: r for r in semantic_dedup(corpus, cents, threshold=0.95).collect()}
    assert len(out) == corpus.count()
    for vid in range(5):
        orig, copy = out[vid], out[vid + 1_000_000]
        # scale-covariant cell + scale-invariant centroid cosine
        assert orig.cell == copy.cell
        assert orig.centroid_cos == copy.centroid_cos
        # id tiebreak drops exactly the planted (higher-id) copy
        assert copy.dropped and not orig.dropped


def test_semantic_dedup_no_cross_cell_pairs(spark):
    from swiftbeaver_spark.llm.similarity import md5_centroids, semantic_dedup

    # two IDENTICAL vectors forced into different rows but the same
    # cell are a dup pair; a third orthogonal-ish vector in another
    # cell must never be dropped even though the corpus is tiny
    cents = md5_centroids(4, 4, tag="sdtest")
    v_a = cents[0]
    v_b = [-x for x in cents[0]]
    df = spark.createDataFrame(
        [(1, v_a), (2, v_a), (3, v_b)], ["vec_id", "embedding"]
    )
    out = {r.vec_id: r for r in semantic_dedup(df, cents, threshold=0.99).collect()}
    assert not out[1].dropped and out[2].dropped
    assert out[3].cell != out[1].cell and not out[3].dropped


def test_prefix_filter_join_complete_vs_bruteforce(spark, documents):
    from swiftbeaver_spark.llm.dedup import normalized_text, prefix_filter_near_dups

    docs = documents.limit(40).select("doc_id", "text")
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_filter_near_dups(docs, threshold_num=7, threshold_den=10).collect()
    }
    # brute force over all pairs: exact word-set Jaccard >= 0.7
    toks = {
        r.doc_id: set(
            t for t in r.norm.split(" ") if t
        )
        for r in docs.select(
            "doc_id", normalized_text(F.col("text")).alias("norm")
        ).collect()
    }
    ids = sorted(toks)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(toks[a] & toks[b])
            if 10 * inter >= 7 * len(toks[a] | toks[b]):
                want.add((a, b))
    assert got == want  # prefix filter is EXACT: no loss, no extras


def test_prefix_filter_planted_pair_scores(spark):
    from swiftbeaver_spark.llm.dedup import prefix_filter_near_dups

    base = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, base), (2, base + " iota"), (3, "totally different words here now")],
        ["doc_id", "text"],
    )
    rows = {(r.doc_a, r.doc_b): r for r in prefix_filter_near_dups(df, threshold_num=7, threshold_den=10).collect()}
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert (r.inter, r.na, r.nb) == (8, 8, 9)
    assert r.jaccard_bp == 8888  # floor(10000*8/9)


def test_html_extract_text_semantics(spark):
    from swiftbeaver_spark.llm.text import html_extract_text

    cases = [
        # script body with raw '<' must vanish BEFORE tag stripping
        ("<p>a</p><script>if (1 < 2) { x(); }</script><p>b</p>", "a b"),
        ("<style>p > a { }</style>hello", "hello"),
        ("<!-- note -->x<!-- two\nlines -->y", "x y"),
        # adjacent blocks must not weld words
        ("<div>one</div><div>two</div>", "one two"),
        # &amp; decoded last: literal '&lt;' survives as text
        ("a &amp;lt; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f", 'a &lt; b <c> "d" \'e\' f'),
        ("  lots   of\n\nspace  ", "lots of space"),
    ]
    df = spark.createDataFrame(cases, ["html", "want"])
    rows = df.select(html_extract_text(F.col("html")).alias("got"), "want").collect()
    for r in rows:
        assert r.got == r.want, (r.got, r.want)


def test_bigram_lm_score_discriminates_broken_transitions(spark):
    from swiftbeaver_spark.llm.text import bigram_lm_score

    # 20 copies of a fixed sentence make its transitions near-certain;
    # one probe doc uses the SAME words in an order never seen
    # elsewhere -> its conditionals are 1/C1 fractions, far lower
    template = "the cat sat on the mat"
    rows = [(i, template) for i in range(20)]
    rows.append((999, "mat the on sat cat the"))
    out = {
        r.doc_id: r.mean_cond_milli
        for r in bigram_lm_score(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[0] > 700  # near-deterministic transitions
    assert out[999] < out[0] / 2  # broken transitions score far lower


def test_bigram_lm_score_exact_tiny(spark):
    from swiftbeaver_spark.llm.text import bigram_lm_score

    # corpus: "a b" x2 and "a c" x1 -> C1(a)=3, C2(a,b)=2, C2(a,c)=1
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in bigram_lm_score(df).collect()}
    assert rows[1].mean_cond_milli == 666  # floor(1000*2/3)
    assert rows[3].mean_cond_milli == 333  # floor(1000*1/3)
    assert rows[1].n_bigrams == 1


def test_bigram_lm_score_weighted_repeats(spark):
    """The r14 doc-bigram restructure sums m-weighted conditionals; a
    doc REPEATING a bigram (m>1) must score every instance, exactly as
    the old instance-level join did. 'a b a b a b' has instances
    (a,b)x3 and (b,a)x2; corpus counts C1(a)=4, C1(b)=2, C2(a,b)=4,
    C2(b,a)=2 with doc 2's 'a b' -> per-instance milli: (a,b)=1000,
    (b,a)=1000; doc 1 sum = 3*1000 + 2*1000 = 5000 over 5 bigrams."""
    from swiftbeaver_spark.llm.text import bigram_lm_score

    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in bigram_lm_score(df).collect()}
    assert rows[1].n_bigrams == 5
    assert rows[1].sum_cond_milli == 5000
    assert rows[1].mean_cond_milli == 1000
    assert rows[2].n_bigrams == 1


def test_bigram_lm_score_reuses_instance_exchange(spark):
    """All three model consumers (C2, C1, the scoring join) must hang
    off the canonically identical doc-bigram exchange so the runtime
    plan evaluates the tokenize+explode subtree once — the r14
    restructure's reuse contract (ReusedExchange appears only in the
    FINAL adaptive plan, so this executes the frame first)."""
    from swiftbeaver_spark.llm.text import bigram_lm_score

    df = spark.createDataFrame(
        [(i, f"w{i} x y z w{i % 3}") for i in range(50)], ["doc_id", "text"]
    )
    out = bigram_lm_score(df)
    out.collect()
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "isFinalPlan=true" in plan, plan
    assert "ReusedExchange" in plan, plan


def test_temperature_sample_sqrt_scaling(spark):
    from swiftbeaver_spark.llm.pipeline import temperature_sample

    # groups sized 100 / 400 / 10000: sqrt scaling keeps ~all of the
    # smallest, ~half of 4x, ~10% of 100x
    rows = (
        [(i, "small") for i in range(100)]
        + [(1000 + i, "mid") for i in range(400)]
        + [(10_000 + i, "big") for i in range(10_000)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = temperature_sample(df).groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in kept}
    # expected keep rates: 1.0, 0.5, 0.1 (md5 gate ~ binomial)
    assert by["small"] > 85
    assert 120 < by["mid"] < 280
    assert 700 < by["big"] < 1350
    # stability: membership is a pure function of the id set
    again = temperature_sample(df).groupBy("lang").count().collect()
    assert {r.lang: r["count"] for r in again} == by


def test_exact_substring_dedup_semantics(spark):
    from swiftbeaver_spark.llm.pipeline import exact_substring_dedup

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, shared),                          # canonical -> untouched
        (2, "pre " + shared + " post"),       # copy -> interior removed
        (3, "totally different words with no duplicated spans at all"),
    ]
    out = {
        r.doc_id: r
        for r in exact_substring_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), ngram_n=8
        ).collect()
    }
    assert out[1].n_removed == 0 and out[1].cleaned == shared
    # doc 2: all 10 shared tokens covered by duplicated windows;
    # sentinels survive
    assert out[2].cleaned == "pre post"
    assert out[2].n_removed == 10
    assert out[3].n_removed == 0


def test_exact_substring_dedup_short_docs_untouched(spark):
    from swiftbeaver_spark.llm.pipeline import exact_substring_dedup

    # < n tokens -> no windows -> duplicated SHORT texts stay (this is
    # substring dedup with threshold n, not exact-doc dedup)
    rows = [(1, "a b c"), (2, "a b c")]
    out = exact_substring_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]), ngram_n=8
    ).collect()
    assert all(r.n_removed == 0 for r in out)


def test_kmeans_micro_partitions_and_improves(spark, embeddings):
    from swiftbeaver_spark.llm.similarity import kmeans_micro

    one = kmeans_micro(embeddings, k=8, iters=0)
    two = kmeans_micro(embeddings, k=8, iters=2)
    n0 = {r.cell: r.n_members for r in one.collect()}
    rows2 = two.collect()
    n2 = {r.cell: r.n_members for r in rows2}
    total = embeddings.count()
    assert sum(n0.values()) == total and sum(n2.values()) == total
    # Lloyd iterations never increase inertia on the same data
    inertia0 = sum(r.inertia for r in one.collect())
    inertia2 = sum(r.inertia for r in rows2)
    assert inertia2 <= inertia0
    # deterministic: identical rerun
    again = {(r.cell, r.n_members, r.inertia, r.centroid_md5) for r in kmeans_micro(embeddings, k=8, iters=2).collect()}
    assert again == {(r.cell, r.n_members, r.inertia, r.centroid_md5) for r in rows2}


def test_kmeans_micro_separated_clusters(spark):
    from swiftbeaver_spark.llm.similarity import kmeans_micro

    # two far-apart blobs -> k=2 must split them exactly
    rows = [(i, [10.0 + 0.001 * i, 10.0]) for i in range(10)]
    rows += [(100 + i, [-10.0 - 0.001 * i, -10.0]) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = kmeans_micro(df, k=2, iters=2).collect()
    assert sorted(r.n_members for r in out) == [10, 10]


def test_bmp_patch_means_exact_and_edge_cases(spark):
    import struct

    from swiftbeaver_spark.llm.multimodal import bmp_patch_means

    def bmp(w, h, px_rows):
        # px_rows: top-down [[(b,g,r),...]]; serialize bottom-up
        stride = (w * 3 + 3) & ~3
        body = b""
        for row in reversed(px_rows):
            line = b"".join(bytes(p) for p in row)
            body += line + b"\x00" * (stride - len(line))
        dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
        return (
            b"BM" + struct.pack("<I", 54 + stride * h) + b"\x00" * 4
            + struct.pack("<I", 54) + dib + body
        )

    # 2x2 image, patch=2 -> one patch, floor means
    img = bmp(2, 2, [[(0, 10, 20), (1, 11, 21)], [(2, 12, 22), (4, 13, 23)]])
    rows = bmp_patch_means(
        spark.createDataFrame([(1, img), (2, b"not a bmp"), (3, bmp(3, 2, [[(0, 0, 0)] * 3] * 2))],
                              ["media_id", "payload"]),
        2,
    ).collect()
    by = {(r.media_id, r.patch_row, r.patch_col): r for r in rows}
    ok = by[(1, 0, 0)]
    assert (ok.mean_b, ok.mean_g, ok.mean_r) == (1, 11, 21)  # floor(7/4)=1
    assert by[(2, None, None)].status == "unsupported"       # not a BMP
    assert by[(3, None, None)].status == "unsupported"       # 3 % 2 != 0


def test_resize_images_mixed_bmp_png_junk(spark):
    import struct
    import zlib

    from swiftbeaver_spark.llm.multimodal import resize_images

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    # 2x2 PNG, solid red (RGB ff0000)
    raw = bytes([0]) + b"\xff\x00\x00" * 2 + bytes([0]) + b"\xff\x00\x00" * 2
    png = (
        b"\x89PNG\r\n\x1a\x0a"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    stride = 8  # 2 px * 3 B rounded to 4
    bmp = (
        b"BM" + struct.pack("<I", 54 + stride * 2) + b"\x00" * 4 + struct.pack("<I", 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, stride * 2, 0, 0, 0, 0)
        + (b"\x00\x00\xff" * 2 + b"\x00\x00") * 2  # BGR red rows + pad
    )
    df = spark.createDataFrame(
        [(1, png), (2, bmp), (3, b"not an image")], ["media_id", "payload"]
    )
    rows = {r.media_id: r for r in resize_images(df, 1, 1).collect()}
    # both real formats decode to the same 1x1 red BMP
    assert rows[1].status == "resized" and rows[2].status == "resized"
    assert bytes(rows[1].payload) == bytes(rows[2].payload)
    assert bytes(rows[1].payload)[54:57] == b"\x00\x00\xff"  # BGR red
    assert rows[3].status == "unsupported"


def test_audio_window_energy_exact(spark):
    import struct

    from swiftbeaver_spark.llm.multimodal import audio_window_energy

    def wav(byte_rate, block_align, pcm):
        fmt = struct.pack("<HHIIHH", 1, 1, byte_rate // block_align, byte_rate,
                          block_align, 8 * block_align)
        return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
                + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(pcm)) + pcm)

    # 8-bit: samples 128,130,126 -> amplitudes 0,+2,-2: energy 8, peak 2
    w8 = wav(3, 1, bytes([128, 130, 126]))
    # 16-bit LE: +5, -3 -> energy 34, peak 5
    w16 = wav(4, 2, struct.pack("<hh", 5, -3))
    df = spark.createDataFrame(
        [(1, w8), (2, w16), (3, b"junk")], ["media_id", "payload"]
    )
    rows = {r.media_id: r for r in audio_window_energy(df, window_ms=1000).collect()}
    assert (rows[1].energy, rows[1].peak, rows[1].n_samples) == (8, 2, 3)
    assert (rows[2].energy, rows[2].peak, rows[2].n_samples) == (34, 5, 2)
    assert rows[3].status == "unsupported"


def test_cdc_chunks_resync_after_insertion(spark, documents):
    from swiftbeaver_spark.llm.pipeline import cdc_chunks

    docs = documents.limit(10).select("doc_id", "text")
    shifted = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lit("inserted prefix text goes here "), F.col("text")).alias("text"),
    )
    ch = cdc_chunks(docs.unionByName(shifted), k=8).collect()
    by_doc = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, set()).add(r.chunk_md5)
    resync = 0
    for i in range(10):
        if i in by_doc and i + 1_000_000 in by_doc:
            shared = by_doc[i] & by_doc[i + 1_000_000]
            # CDC resynchronizes: the shifted copy shares a majority
            # of the ORIGINAL's chunks despite the prefix insertion
            if len(shared) * 2 > len(by_doc[i]):
                resync += 1
    assert resync >= 7  # boundary luck may cost a couple of docs


def test_cdc_chunks_cover_text_exactly(spark):
    from swiftbeaver_spark.llm.pipeline import cdc_chunks

    text = "the quick brown fox jumps over the lazy dog repeatedly and often"
    rows = sorted(
        cdc_chunks(
            spark.createDataFrame([(1, text)], ["doc_id", "text"]), k=8
        ).collect(),
        key=lambda r: r.start,
    )
    # spans tile the normalized text exactly: no gaps, no overlap
    pos = 0
    for r in rows:
        assert r.start == pos
        pos += r.length
    assert pos == len(text)


def test_gif_decode_canonical_public_fixture():
    """The widely-published minimal 1x1 white GIF — an INDEPENDENT
    fixture (not this module's own encoder) — must decode to one
    white pixel."""
    from swiftbeaver_spark.llm.multimodal import gif_pixels

    gif = bytes.fromhex(
        "474946383961" "01000100" "80" "0000" "ffffff" "000000"
        "2c" "00000000" "0100" "0100" "00" "02" "02" "4401" "00" "3b"
    )
    px = gif_pixels(gif)
    assert px is not None and px.shape == (1, 1, 3)
    assert (px[0, 0] == [255, 255, 255]).all()  # BGR white


def test_gif_decode_compressed_runs():
    """A stream exercising genuine LZW COMPRESSION codes (not just
    literals): dictionary entries referenced back, including the
    code==next special case (cScSc pattern)."""
    from swiftbeaver_spark.llm.multimodal import gif_pixels

    # 1 color-bit image, 4x1, pixels [0,0,0,0] encoded as
    # [clear(4), 0, 6, 0] with code 6 = "0,0" referenced while being
    # defined (the KwKwK case), then EOI
    # min_code=2: clear=4, eoi=5; widths: 3,3,3,3,3 -> 15 bits
    val = 4 | (0 << 3) | (6 << 6) | (0 << 9) | (5 << 12)
    data = bytes([val & 0xFF, (val >> 8) & 0xFF])
    gif = (
        bytes.fromhex("474946383961") + bytes.fromhex("04000100")
        + bytes.fromhex("800000") + bytes.fromhex("ffffff000000")
        + bytes.fromhex("2c00000000" + "0400" + "0100" + "00")
        + bytes([2, len(data)]) + data + bytes.fromhex("003b")
    )
    px = gif_pixels(gif)
    assert px is not None and px.shape == (1, 4, 3)
    assert (px == 255).all()  # four white pixels via the KwKwK entry


def test_bitext_margin_prefers_planted_clone(spark, embeddings):
    import __spark_entry__ as em

    out = {r.x_id: r for r in em.q157_bitext_mining(
        spark.sparkSession if hasattr(spark, "sparkSession") else spark,
        "/root/testdata/sf0.001",
    ).collect()}
    planted_sources = sorted(out)[:5]
    for x in planted_sources:
        r = out[x]
        # the 1.5x clone is cosine-1.0 and must be the best target
        assert r.best_y == x + 1_000_000
        assert r.cos_micro == 1_000_000
        assert r.mined


def test_tiff_decode_both_byte_orders_and_grayscale():
    import struct

    from swiftbeaver_spark.llm.multimodal import tiff_pixels

    def tiff(e, spp, data, w, h):
        def tag(t, typ, cnt, val):
            # inline values are LEFT-justified in the 4-byte field:
            # a SHORT occupies the first two bytes in either byte order
            payload = (
                struct.pack(e + "H", val) + b"\x00\x00"
                if typ == 3
                else struct.pack(e + "I", val)
            )
            return struct.pack(e + "HHI", t, typ, cnt) + payload

        tags = [
            tag(256, 3, 1, w), tag(257, 3, 1, h), tag(259, 3, 1, 1),
            tag(262, 3, 1, 2 if spp == 3 else 1),
            tag(273, 4, 1, 8), tag(277, 3, 1, spp), tag(279, 4, 1, len(data)),
        ]
        ifd = struct.pack(e + "H", len(tags)) + b"".join(tags) + struct.pack(e + "I", 0)
        magic = b"II*\x00" if e == "<" else b"MM\x00*"
        return magic + struct.pack(e + "I", 8 + len(data)) + data + ifd

    rgb = bytes([10, 20, 30, 40, 50, 60])  # 2x1 RGB
    for e in ("<", ">"):
        px = tiff_pixels(tiff(e, 3, rgb, 2, 1))
        assert px is not None and px.shape == (1, 2, 3)
        assert list(px[0, 0]) == [30, 20, 10]  # BGR
    gray = bytes([7, 200])
    px = tiff_pixels(tiff("<", 1, gray, 2, 1))
    assert list(px[0, 1]) == [200, 200, 200]
    assert tiff_pixels(b"II*\x00garbage") is None


def test_mmr_rerank_diversifies(spark):
    """The first pick is the most relevant candidate; later picks must
    trade relevance for diversity — verify MMR's defining property on
    the real output: pick 2 is NOT simply the second-most-relevant
    when that candidate is near-identical to pick 1."""
    import __spark_entry__ as em

    rows = em.q160_mmr_rerank(spark, "/root/testdata/sf0.001").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, picks in by_q.items():
        picks.sort(key=lambda r: r.pick_order)
        assert len(picks) == 5
        assert len({p.vec_id for p in picks}) == 5  # no repeats
        # pick 1 = argmax relevance (tie by id); the query vector
        # itself is in the corpus, so rel_micro == 1_000_000
        assert picks[0].vec_id == qid and picks[0].rel_micro == 1_000_000
        # relevance along picks is NOT forced monotone (diversity term)
        rels = [p.rel_micro for p in picks]
        assert rels[0] == max(rels)


def test_prefix_cache_groups_and_boundary(spark):
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    rows = em.q163_prefix_cache_plan(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 7  # at least one group per template
    for r in rows:
        assert r.n_prompts >= 2
        assert r.tokens_saved == (r.n_prompts - 1) * 8
    # groups are disjoint doc sets: total grouped prompts <= corpus+...
    total = sum(r.n_prompts for r in rows)
    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert total <= corpus


def test_bitext_ivf_recall_vs_brute(spark, embeddings):
    """bitext_mine_ivf vs an independent brute-force margin miner
    (numpy, all-pairs): planted exact clones MUST be mined, and the
    index miner must recover most of the brute miner's mined pairs
    (recall loss is bounded by nprobe/nlist coarse pruning)."""
    import numpy as np

    from swiftbeaver_spark.llm.similarity import bitext_mine_ivf, md5_centroids

    emb = embeddings
    src = emb.where("label = 0").selectExpr(
        "vec_id AS x_id", "CAST(embedding AS array<double>) AS xv"
    )
    tgt_real = emb.where("label = 1").selectExpr(
        "vec_id AS y_id", "CAST(embedding AS array<double>) AS yv"
    )
    planted = src.orderBy("x_id").limit(5).selectExpr(
        "x_id + 1000000 AS y_id", "transform(xv, v -> v * 1.5D) AS yv"
    )
    tgt = tgt_real.unionByName(planted)
    mined = bitext_mine_ivf(
        src, tgt, md5_centroids(8, 64, tag="ivfpqcent"), k=4, nprobe=3
    ).collect()
    got = {(r.x_id, r.best_y) for r in mined if r.mined}

    # planted clones: same direction -> same cell, cosine exactly 1.0
    planted_ids = [r.x_id for r in src.orderBy("x_id").limit(5).collect()]
    by_x = {r.x_id: r for r in mined}
    for xid in planted_ids:
        assert by_x[xid].best_y == xid + 1_000_000
        assert by_x[xid].cos_micro == 1_000_000
        assert by_x[xid].mined

    # brute-force margin miner (true k-NN both sides, same integer math)
    srows = sorted(src.collect(), key=lambda r: r.x_id)
    trows = sorted(tgt.collect(), key=lambda r: r.y_id)
    X = np.array([r.xv for r in srows])
    Y = np.array([r.yv for r in trows])
    xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    yn = Y / np.linalg.norm(Y, axis=1, keepdims=True)
    cm = np.rint(1_000_000 * xn @ yn.T).astype(np.int64)
    k = 4
    sx = np.sort(cm, axis=1)[:, -k:].sum(axis=1)
    sy = np.sort(cm, axis=0)[-k:, :].sum(axis=0)
    brute = set()
    for i, xr in enumerate(srows):
        j = int(np.argmax(cm[i]))  # ties: lowest y index == lowest y_id
        margin = (1000 * 2 * k * cm[i, j]) // int(sx[i] + sy[j])
        if margin >= 1050:
            brute.add((xr.x_id, trows[j].y_id))
    assert brute, "brute miner found nothing — test data changed?"
    recall = len(got & brute) / len(brute)
    assert recall >= 0.6, (recall, len(brute), len(got))


def test_domain_cap_two_stage_equals_single_window(spark, documents):
    """The salted two-stage rank must return EXACTLY the plain
    single-window top-cap (any global top-cap member is in its salt
    bucket's top-cap), including the final keep_rank."""
    from pyspark.sql import Window

    from swiftbeaver_spark.llm.pipeline import domain_cap

    docs = documents.select("doc_id", "source", "n_chars")
    got = {
        (r.doc_id, r.keep_rank)
        for r in domain_cap(docs, cap=7, salt_buckets=4).collect()
    }
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    want = {
        (r.doc_id, r.rn)
        for r in docs.withColumn("rn", F.row_number().over(w))
        .where("rn <= 7")
        .collect()
    }
    assert got == want and len(got) > 0


def test_domain_cap_binds_per_domain(spark, documents):
    from swiftbeaver_spark.llm.pipeline import domain_cap

    kept = domain_cap(
        documents.select("doc_id", "source", "n_chars"), cap=5
    )
    per = kept.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per)
    # every domain with >= 5 docs is capped exactly at 5
    big = {
        r.source
        for r in documents.groupBy("source").count().where("count >= 5").collect()
    }
    capped = {r.source for r in per if r["count"] == 5}
    assert big == capped


def test_jpeg_roundtrip_flat_blocks_exact():
    """Flat 8x8 blocks produce DC-only streams whose decode is EXACT
    (IDCT of a lone DC coefficient is a constant block) — the q167
    oracle property."""
    import numpy as np

    from swiftbeaver_spark.llm.multimodal import encode_jpeg_gray, jpeg_pixels

    g = np.zeros((8, 16), dtype=np.uint8)
    g[:, :8], g[:, 8:] = 37, 201
    px = jpeg_pixels(encode_jpeg_gray(g))
    assert px is not None and px.shape == (8, 16, 3)
    assert (px[:, :, 0] == g).all()
    assert (px == px[:, :, :1]).all()  # gray replicated to BGR


def test_jpeg_roundtrip_noise_bounded_error():
    """Arbitrary content exercises the FULL AC path (runs, ZRL, EOB,
    byte stuffing) plus edge-padded partial blocks; with quant=1 the
    only loss is coefficient rounding — error bounded by 1."""
    import hashlib

    import numpy as np

    from swiftbeaver_spark.llm.multimodal import encode_jpeg_gray, jpeg_pixels

    blob = b"".join(hashlib.sha256(b"jpeg%d" % i).digest() for i in range(16))
    img = np.frombuffer(blob, dtype=np.uint8)[: 23 * 17].reshape(23, 17)
    px = jpeg_pixels(encode_jpeg_gray(img))
    assert px is not None and px.shape == (23, 17, 3)
    assert np.abs(px[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_jpeg_decoder_rejects_out_of_scope():
    """Truncated data, non-JPEG bytes, and unsupported shapes return
    None instead of raising — the documented codec-stub boundary."""
    import numpy as np

    from swiftbeaver_spark.llm.multimodal import (
        encode_jpeg_gray,
        image_pixels,
        jpeg_pixels,
    )

    g = np.full((8, 8), 99, dtype=np.uint8)
    payload = encode_jpeg_gray(g)
    assert jpeg_pixels(payload[:20]) is None  # truncated pre-SOS
    # truncated tail: tolerated as either a rejection (None) or a
    # well-formed decode of whatever blocks completed before the cut
    tail = jpeg_pixels(payload[:-4])
    assert tail is None or tail.shape == (8, 8, 3)
    assert jpeg_pixels(b"\x00" * 16) is None
    assert jpeg_pixels(b"\xff\xd8" + b"\xff\xd9") is None  # no frame
    # dispatcher picks the JPEG leg
    px = image_pixels(payload)
    assert px is not None and (px[:, :, 0] == 99).all()


def test_jpeg_decoder_quant_table_applied():
    """quant=4 coarsens coefficients; flat blocks still decode exactly
    when the DC is a multiple of the step (8*(g-128) divisible by 4)."""
    import numpy as np

    from swiftbeaver_spark.llm.multimodal import encode_jpeg_gray, jpeg_pixels

    g = np.full((8, 8), 128 + 10, dtype=np.uint8)  # DC = 80, /4 exact
    px = jpeg_pixels(encode_jpeg_gray(g, quant=4))
    assert px is not None and (px[:, :, 0] == 138).all()


def test_jpeg_decoder_fill_bytes_and_standalone_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker, and
    TEM (0x01) / RSTn (0xD0-0xD7) are standalone (no length segment).
    A strictly-conforming third-party file using either pre-SOS must
    still decode."""
    import numpy as np

    from swiftbeaver_spark.llm.multimodal import encode_jpeg_gray, jpeg_pixels

    g = np.full((8, 8), 42, dtype=np.uint8)
    payload = encode_jpeg_gray(g)
    assert payload[:2] == b"\xff\xd8"
    # inject after SOI: a fill byte before the first real marker, and
    # a standalone TEM marker
    patched = payload[:2] + b"\xff" + b"\xff\x01" + payload[2:]
    px = jpeg_pixels(patched)
    assert px is not None and (px[:, :, 0] == 42).all()


def test_mp3_frame_spans(spark):
    from swiftbeaver_spark.llm.multimodal import mp3_frame_header, mp3_frame_spans

    # MPEG1 L3 128kbps@44100 (417 B), padded variant (418 B),
    # MPEG2 L3 64kbps@22050 (208 B, 576 samples/frame)
    f1 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\xaa" * 413
    f1p = bytes([0xFF, 0xFB, 0x92, 0x00]) + b"\xbb" * 414
    f2 = bytes([0xFF, 0xF2, 0x80, 0x00]) + b"\xcc" * 204
    assert mp3_frame_header(f1[:4]) == (417, 128, 44100, 1152)
    assert mp3_frame_header(f1p[:4]) == (418, 128, 44100, 1152)
    assert mp3_frame_header(f2[:4]) == (208, 64, 22050, 576)
    assert mp3_frame_header(bytes([0xFF, 0xFB, 0x00, 0x00])) is None  # free bitrate
    assert mp3_frame_header(bytes([0xFF, 0xFD, 0x90, 0x00])) is None  # Layer II

    id3 = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 5]) + b"\x00" * 5
    rows = mp3_frame_spans(
        spark.createDataFrame(
            [
                (1, id3 + f1 + f1p + f1 + b"\x00garbage"),  # tag + 3 frames + junk
                (2, f2 + f2[: len(f2) - 1]),  # walk stops at truncated 2nd frame
                (3, b"RIFFxxxxWAVE"),  # not an mp3
                (4, None),  # NULL payload must not fail the task
            ],
            "media_id LONG, payload BINARY",
        )
    ).collect()
    assert [r.status for r in rows if r.media_id == 4] == ["unsupported"]
    by = {(r.media_id, r.frame_idx): r for r in rows}
    assert len([r for r in rows if r.media_id == 1]) == 3
    assert by[(1, 0)].byte_off == 15 and by[(1, 0)].byte_size == 417
    assert by[(1, 1)].byte_off == 15 + 417 and by[(1, 1)].byte_size == 418
    # sample-accurate timeline: 1152 samples/frame @44100
    assert [by[(1, i)].t_ms for i in range(3)] == [0, 1152 * 1000 // 44100, 2304 * 1000 // 44100]
    assert len([r for r in rows if r.media_id == 2]) == 1  # truncated tail dropped
    assert by[(2, 0)].sample_rate == 22050
    assert by[(3, -1)].status == "unsupported"


def test_vorbis_stream_meta(spark):
    import struct as _s

    from swiftbeaver_spark.llm.multimodal import vorbis_meta, vorbis_stream_meta

    def idpkt(ch, sr):
        return (
            b"\x01vorbis" + _s.pack("<I", 0) + _s.pack("<B", ch) + _s.pack("<I", sr)
            + _s.pack("<i", 0) + _s.pack("<i", 96000) + _s.pack("<i", 0)
            + bytes([0xB8, 0x01])
        )

    def page(flags, granule, seq, body):
        return (
            b"OggS" + bytes([0, flags]) + _s.pack("<q", granule) + _s.pack("<I", 1)
            + _s.pack("<I", seq) + b"\x00" * 4 + bytes([1, len(body)]) + body
        )

    good = page(0x02, 0, 0, idpkt(2, 48000)) + page(0x00, -1, 1, b"\x01" * 9) \
        + page(0x04, 96000, 2, b"\x02" * 7)
    # -1 granule (no completed packet) must not clobber the duration
    assert vorbis_stream_meta(good) == (2, 48000, 96000, 2000, 3)
    # missing EOS: duration from the last intact page's granule
    no_eos = page(0x02, 0, 0, idpkt(1, 44100)) + page(0x00, 44100, 1, b"\x03" * 5)
    assert vorbis_stream_meta(no_eos) == (1, 44100, 96000, 1000, 2)
    # truncated final page keeps the previous granule
    trunc = no_eos + page(0x04, 88200, 2, b"\x04" * 50)[:-20]
    assert vorbis_stream_meta(trunc) == (1, 44100, 96000, 1000, 2)
    assert vorbis_stream_meta(b"OggS" + b"\x00" * 54) is None  # no BOS flag
    assert vorbis_stream_meta(page(0x02, 0, 0, b"\x03vorbis" + b"\x00" * 23)) is None

    rows = vorbis_meta(
        spark.createDataFrame(
            [(1, good), (2, b"RIFFxxxxWAVE"), (3, None)],
            "media_id LONG, payload BINARY",
        )
    ).collect()
    by = {r.media_id: r for r in rows}
    assert (by[1].channels, by[1].duration_ms, by[1].n_pages) == (2, 2000, 3)
    assert by[2].status == "unsupported"
    assert by[3].status == "unsupported"  # NULL payload must not fail


def test_header_duration_mp3_and_vorbis():
    import struct as _s

    from swiftbeaver_spark.llm.multimodal import header_media_duration_ms

    f1 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\xaa" * 413  # 1152 samples @44100
    id3 = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 0])
    # ID3 start validates with one frame; bare sync needs >= 3
    assert header_media_duration_ms(id3 + f1) == 1152 * 1000 // 44100
    assert header_media_duration_ms(f1 + f1) is None
    assert header_media_duration_ms(f1 * 3) == 3456 * 1000 // 44100
    assert header_media_duration_ms(b"\xff\xfb\x90") is None

    idpkt = (
        b"\x01vorbis" + _s.pack("<I", 0) + _s.pack("<B", 1) + _s.pack("<I", 8000)
        + _s.pack("<i", 0) + _s.pack("<i", 0) + _s.pack("<i", 0) + bytes([0xB8, 1])
    )
    bos = (
        b"OggS" + bytes([0, 0x02]) + _s.pack("<q", 0) + _s.pack("<I", 1)
        + _s.pack("<I", 0) + b"\x00" * 4 + bytes([1, len(idpkt)]) + idpkt
    )
    eos = (
        b"OggS" + bytes([0, 0x04]) + _s.pack("<q", 20000) + _s.pack("<I", 1)
        + _s.pack("<I", 1) + b"\x00" * 4 + bytes([1, 4]) + b"\x00" * 4
    )
    assert header_media_duration_ms(bos + eos) == 20000 * 1000 // 8000
    assert header_media_duration_ms(b"OggS" + b"\x00" * 60) is None


def test_mp3_walk_id3v24_footer_and_mixed_rates():
    from swiftbeaver_spark.llm.multimodal import _mp3_duration_ms, _mp3_walk

    f44 = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\xaa" * 413  # 1152 @44100
    f22 = bytes([0xFF, 0xF2, 0x80, 0x00]) + b"\xcc" * 204  # 576 @22050
    # ID3v2.4 with the footer flag (0x10): syncsafe size excludes the
    # 10-byte footer, so the first frame sits at 10 + size + 10
    id3f = b"ID3" + bytes([4, 0, 0x10]) + bytes([0, 0, 0, 4]) + b"\x00" * 4 + b"3DI" + b"\x00" * 7
    id3, frames, _ = _mp3_walk(id3f + f44)
    assert id3 and len(frames) == 1 and frames[0][0] == len(id3f)
    assert _mp3_duration_ms(id3f + f44) == 1152 * 1000 // 44100

    # mixed-rate concatenation: per-rate sums, not first-rate scaling
    blob = f44 + f44 + f22 + f22
    _, frames, by_rate = _mp3_walk(blob)
    assert [f[4] for f in frames] == [
        0,
        1152 * 1000 // 44100,
        2304 * 1000 // 44100,
        2304 * 1000 // 44100 + 576 * 1000 // 22050,
    ]
    assert by_rate == {44100: 2304, 22050: 1152}


def test_semantic_dedup_arrow_kernel_matches_expr(spark):
    """kernel='arrow' (blockwise numpy gram per cell) must reproduce the
    expression kernel row-for-row — including the HALF_UP rounding and
    the keep-the-edge-points drop policy — on the gated q122
    configuration (planted exact dups included)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from swiftbeaver_spark.llm.similarity import md5_centroids, semantic_dedup

    emb = em._t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    planted = emb.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(3.0)).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    cents = md5_centroids(em.SEMDEDUP_NLIST, 64, tag="semdedup")
    expr_rows = sorted(map(tuple, semantic_dedup(corpus, cents).collect()))
    arrow_rows = sorted(
        map(tuple, semantic_dedup(corpus, cents, kernel="arrow").collect())
    )
    assert expr_rows == arrow_rows
    assert any(r[3] for r in arrow_rows)  # the planted dups actually drop
    # full production form (gated q122): arrow assignment + arrow gram
    full_arrow = sorted(
        map(
            tuple,
            semantic_dedup(
                corpus, cents, kernel="arrow", assign="arrow"
            ).collect(),
        )
    )
    assert expr_rows == full_arrow


def test_assign_cells_arrow_degenerate_vectors_are_null(spark):
    """Degenerate vectors (zero-norm or NaN-valued) yield NULL
    centroid_cos on the arrow path — the documented TOTAL behavior:
    Spark's Arrow ingestion cannot carry a NaN (from_pandas nulls it,
    measured on this stack), so no NaN can ever emerge to out-sort
    real values (ADVICE r9's concern), and the expr path under
    Spark 4's default ANSI mode instead RAISES DIVIDE_BY_ZERO for
    zero-norm vectors — the arrow kernel deliberately degrades to
    NULL where the expr form fails the job."""
    from swiftbeaver_spark.llm.similarity import assign_cells_arrow, md5_centroids

    cents = md5_centroids(4, 8, tag="zeronorm")
    df = spark.createDataFrame(
        [
            (0, [0.0] * 8),
            (1, [1.0] + [0.0] * 7),
            (2, [float("nan")] + [1.0] * 7),
        ],
        "vec_id long, vec array<double>",
    )
    rows = {
        r.vec_id: r.centroid_cos
        for r in assign_cells_arrow(df, cents, vec_col="vec").collect()
    }
    assert rows[0] is None and rows[2] is None  # NULL, never NaN
    assert rows[1] is not None and rows[1] == rows[1]  # real value, not NaN


def test_assign_cells_arrow_matches_expr(spark):
    """The Arrow assignment kernel must reproduce ivf_cell_dot cell for
    cell over the full embeddings table (rounding + lowest-cell ties)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from swiftbeaver_spark.llm.similarity import (
        assign_cells_arrow,
        ivf_cell_dot,
        md5_centroids,
    )

    emb = em._t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = md5_centroids(16, 64, tag="semdedup")
    expr_cells = {
        r.vec_id: r.cell
        for r in emb.select(
            "vec_id",
            ivf_cell_dot(F.col("embedding").cast("array<double>"), cents).alias("cell"),
        ).collect()
    }
    arrow_cells = {
        r.vec_id: r.cell for r in assign_cells_arrow(emb, cents).collect()
    }
    assert expr_cells == arrow_cells and len(arrow_cells) == 500


def test_extract_media_meta_null_payload_stays_null(spark):
    """A NULL-payload row must keep NULL size/sha/dims/feature — never
    the shared empty-bytes digest a downstream dedup would cluster on."""
    from swiftbeaver_spark.llm.multimodal import extract_media_meta

    media = spark.createDataFrame(
        [(1, "image", bytearray(b"BM")), (2, "image", None)],
        "media_id long, modality string, payload binary",
    )
    out = {r.media_id: r for r in extract_media_meta(media).collect()}
    assert out[1].byte_size == 2 and out[1].sha256 is not None
    r = out[2]
    assert r.byte_size is None and r.sha256 is None
    assert r.width is None and r.duration_ms is None and r.feature is None


def test_spark_round_half_up_matches_f_round(spark):
    """_spark_round_half_up must equal Spark's F.round bit-for-bit,
    INCLUDING shortest-decimal .5-boundary doubles where the pure
    binary floor mirror diverges (ADVICE r6 medium: 0.0001245 ->
    Spark 0.000125 but floor-mirror 0.000124)."""
    import numpy as np

    from swiftbeaver_spark.llm.similarity import _spark_round_half_up

    rng = np.random.default_rng(7)
    fuzz = rng.uniform(-2.0, 2.0, 4000)
    # adversarial: doubles whose shortest repr ends exactly on the .5
    # boundary at 6 dp, both signs, several magnitudes — plus the
    # exact ADVICE reproducer and zero/tiny values
    grid = np.array(
        [
            k * 1e-7 + 5e-8
            for k in range(-40, 40)
        ]
        + [0.0001245, -0.0001245, 1.0000005, -1.0000005, 0.0, 5e-7, -5e-7]
    )
    vals = np.concatenate([fuzz, grid])
    for dp in (4, 6):
        ours = _spark_round_half_up(vals, dp)
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "x double"
        ).select(F.round("x", dp).alias("r"))
        theirs = np.array([r.r for r in df.collect()])
        mism = np.nonzero(ours != theirs)[0]
        assert mism.size == 0, (
            f"dp={dp}: {mism.size} mismatches, first "
            f"{vals[mism[:3]]} -> {ours[mism[:3]]} vs {theirs[mism[:3]]}"
        )


def test_auto_segments_thresholds():
    """VERDICT r8 task 2: thresholds pinned to the measured keep-regime
    sweep (tools/bench_simhash_scale100.py — keep=2 won or tied at
    5e4/5e5/5e6 docs, keep=3 superlinearly worse), so keep=2 holds
    for the whole measurable k<=4 range and keep=3 waits for the
    published ~1e9-doc regime; always keep=1 past k=4 (measured
    optimal regardless of size — SCALE.md q27 note)."""
    from swiftbeaver_spark.llm.dedup import _auto_segments

    assert _auto_segments(3, 5_000) == 5       # keep=2 (measured best)
    assert _auto_segments(3, 5_000_000) == 5
    assert _auto_segments(3, 10**9 - 1) == 5
    assert _auto_segments(3, 10**9) == 6       # keep=3, published regime
    assert _auto_segments(4, 1_000) == 6
    for n in (0, 5_000, 10**9):
        assert _auto_segments(8, n) == 9       # k>4: keep=1 always


def test_simhash_auto_layout_same_pairs(spark, documents):
    """Auto-derived layout must produce the IDENTICAL pair set as every
    explicit layout (exact recall by pigeonhole at any n_segments) —
    the oracle-rows-unchanged guarantee for the q27 family."""
    corpus = documents.limit(120).select("doc_id", "text")
    auto = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dups(corpus, max_hamming=3).collect()
    }
    for nseg in (4, 5, 6):
        explicit = {
            (r.doc_a, r.doc_b)
            for r in simhash_near_dups(corpus, max_hamming=3, n_segments=nseg).collect()
        }
        assert explicit == auto
    # the n_docs hint skips the count job and picks the same layout
    hinted = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_dups(corpus, max_hamming=3, n_docs=120).collect()
    }
    assert hinted == auto


def test_spark_round_half_up_large_magnitudes(spark):
    """Round-7 review: magnitudes where the ulp band covers every value
    must neither crash (the old per-element quantize raised
    decimal.InvalidOperation past ~1e22) nor diverge from F.round;
    doubles >= 2^52 are integers whose shortest repr has no fractional
    digits, so Spark ROUND returns them unchanged."""
    import numpy as np

    from swiftbeaver_spark.llm.similarity import _spark_round_half_up

    vals = np.array(
        [
            3e8 + 0.7,
            3e8 + 0.1234565,
            1e12 + 0.5,
            4.5e15,
            2.0**52,
            -(2.0**52),
            2.0**52 + 2,
            1e22,
            -1e22,
            1e300,
            -1e300,
        ]
    )
    for dp in (2, 6):
        ours = _spark_round_half_up(vals, dp)
        df = spark.createDataFrame(
            [(float(v),) for v in vals], "x double"
        ).select(F.round("x", dp).alias("r"))
        theirs = np.array([r.r for r in df.collect()])
        mism = np.nonzero(ours != theirs)[0]
        assert mism.size == 0, (
            f"dp={dp}: {vals[mism]} -> {ours[mism]} vs {theirs[mism]}"
        )


def test_auto_minhash_layout_thresholds():
    """VERDICT r8 task 2a: the b x r layout thresholds pinned to the
    band sweep (tools/bench_minhash_bands.py — blocking favors r=8
    from ~5e5 docs but the doubled signature pass costs 3.7x linear;
    the end-to-end crossover, measured to 5.5e6 and modeled beyond,
    sits at ~5e8 — the published web-dedup regime)."""
    from swiftbeaver_spark.llm.dedup import _auto_minhash_layout

    assert _auto_minhash_layout(0) == (64, 16)
    assert _auto_minhash_layout(55_000) == (64, 16)
    assert _auto_minhash_layout(5_500_000) == (64, 16)
    assert _auto_minhash_layout(500_000_000 - 1) == (64, 16)
    assert _auto_minhash_layout(500_000_000) == (128, 16)  # r=8 wide regime


def test_minhash_auto_layout_matches_explicit(spark, documents):
    """Below the crossover the auto path must reproduce the historical
    explicit (64, 16) layout bit-for-bit — the oracle-rows-unchanged
    guarantee for q26 — and the n_docs hint must skip the count job
    without changing the pick."""
    from swiftbeaver_spark.llm.dedup import minhash_near_dups

    corpus = documents.limit(80).select("doc_id", "text")
    explicit = sorted(
        map(
            tuple,
            minhash_near_dups(
                corpus, num_hashes=64, num_bands=16, threshold=0.5
            ).collect(),
        )
    )
    auto = sorted(map(tuple, minhash_near_dups(corpus, threshold=0.5).collect()))
    hinted = sorted(
        map(tuple, minhash_near_dups(corpus, threshold=0.5, n_docs=80).collect())
    )
    assert auto == explicit
    assert hinted == explicit


def test_auto_nlist_thresholds():
    """VERDICT r8 task 2b: cell-count laws pinned to the round-9 nlist
    sweep (tools/bench_ivf_nlist.py + the post-ccos-fix re-sweep —
    dedup shape: nlist* ~ sqrt(n)/2, occ* ~ 2.2*sqrt(n) at both 5e5
    and 5e6; topk shape: optimum corpus-size-independent at
    ~8*sqrt(n_q*nprobe))."""
    from swiftbeaver_spark.llm.similarity import auto_nlist

    assert auto_nlist(500_000) == 354          # measured best 256-512
    assert auto_nlist(5_000_000) == 1118       # measured best 1024
    assert auto_nlist(10_000) == 50
    assert auto_nlist(1_000) == 16             # floor
    # topk shape: 50 queries x nprobe 4 -> ~113 at ANY corpus size
    assert auto_nlist(500_000, n_queries=50, nprobe=4) == 113
    assert auto_nlist(5_000_000, n_queries=50, nprobe=4) == 113
    assert auto_nlist(5_000_000, n_queries=3, nprobe=4) == 28
    # n/32 cap: cells below ~32 vectors waste assignment
    assert auto_nlist(1_000, n_queries=10_000, nprobe=16) == 31


def test_semantic_dedup_arrow_ccos_over_budget_matches_expr(spark, monkeypatch):
    """Past _CENTROID_LITERAL_BUDGET the arrow path reads centroid_cos
    off the assignment matmul instead of the O(nlist x dim) plan
    literal (the round-9 OOM fix). Forcing the budget to 1 must leave
    the full semantic_dedup output identical to the literal path on
    the real embeddings table."""
    import __spark_entry__ as em
    import swiftbeaver_spark.llm.similarity as S

    emb = em._t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = S.md5_centroids(16, 64, tag="semdedup")
    want = sorted(
        map(
            tuple,
            S.semantic_dedup(
                emb, cents, threshold=0.95, kernel="arrow", assign="arrow"
            ).collect(),
        )
    )
    monkeypatch.setattr(S, "_CENTROID_LITERAL_BUDGET", 1)
    got = sorted(
        map(
            tuple,
            S.semantic_dedup(
                emb, cents, threshold=0.95, kernel="arrow", assign="arrow"
            ).collect(),
        )
    )
    assert got == want and len(got) == 500


def test_assign_cells_hier_full_probe_equals_flat(spark):
    """Two-level assignment probing ALL super-cells evaluates the exact
    argmax over every centroid — must be bit-identical to the flat
    path (proves the hier machinery changes candidates, never the
    rule: rounding, tie-breaks, own-dot ccos all shared)."""
    import __spark_entry__ as em
    from swiftbeaver_spark.llm.similarity import assign_cells_arrow, md5_centroids

    emb = em._t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = md5_centroids(32, 64, tag="hierparity")
    flat = {
        (r.vec_id, r.cell, r.centroid_cos)
        for r in assign_cells_arrow(emb, cents, hier=False).collect()
    }
    hier = {
        (r.vec_id, r.cell, r.centroid_cos)
        for r in assign_cells_arrow(
            emb, cents, hier=True, probe_super=32
        ).collect()
    }
    assert flat == hier and len(flat) == 500


def test_assign_cells_hier_autoswitch_warns(spark):
    """hier=None crossing the nlist auto-switch moves from exact to
    approximate assignment — that must emit a RuntimeWarning (ADVICE
    r10: a silent behavior change for non-gated callers), while
    explicit hier=True and below-threshold defaults stay silent."""
    import warnings

    import __spark_entry__ as em
    from swiftbeaver_spark.llm import similarity as sim

    emb = em._t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    ).limit(20)
    cents = sim.md5_centroids(sim._HIER_NLIST_MIN, 64, tag="warnprobe")
    with pytest.warns(RuntimeWarning, match="auto-enables two-level"):
        sim.assign_cells_arrow(emb, cents).count()
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> failure
        sim.assign_cells_arrow(emb, cents, hier=True, probe_super=4).count()
        sim.assign_cells_arrow(emb, cents[:64]).count()  # below threshold


def test_assign_cells_hier_trained_quantizer_agreement(spark):
    """With a TRAINED quantizer (the production path at the scales the
    auto-switch fires), probe_super=8 must agree with flat on nearly
    every vector — the documented coarse-quantizer approximation
    bound. Random md5 quantizers route far worse (documented in the
    assign_cells_arrow docstring), which is why the bound is pinned on
    the trained shape."""
    import __spark_entry__ as em
    from swiftbeaver_spark.llm.similarity import assign_cells_arrow, ivf_train

    emb = em._t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    cents = ivf_train(emb, nlist=64, vec_col="embedding", id_col="vec_id", iters=2)
    flat = {r.vec_id: r.cell for r in assign_cells_arrow(emb, cents, hier=False).collect()}
    hier = {
        r.vec_id: r.cell
        for r in assign_cells_arrow(emb, cents, hier=True, probe_super=8).collect()
    }
    agree = sum(flat[k] == hier[k] for k in flat) / len(flat)
    assert agree >= 0.97, agree


def test_hyperplane_bucket_sql_path_matches_column_path(spark):
    """r15: the pinned-matrix bucket built as ONE parsed SQL string
    (name arg; O(1) py4j round trips per plan build) must equal the
    Column-operator fold term for term — same left-to-right IEEE sum,
    same CASE thresholds — on real embeddings."""
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from swiftbeaver_spark.llm.similarity import hyperplane_bucket, md5_plane_matrix

    emb = em._t(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    planes = md5_plane_matrix(6, 64)
    both = emb.select(
        "vec_id",
        hyperplane_bucket("vec", 6, planes).alias("b_sql"),
        hyperplane_bucket(F.col("vec"), 6, planes).alias("b_col"),
    )
    bad = both.where(F.col("b_sql") != F.col("b_col")).count()
    assert bad == 0
    assert both.where(F.col("b_sql") > 0).count() > 0  # nondegenerate
