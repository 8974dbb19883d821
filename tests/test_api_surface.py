"""Smoke tests for the thin public-API wrappers (reader entry points
and column helpers) that compose already-tested internals — every
public function in the package is exercised by at least one test or
gated query."""

import numpy as np
from pyspark.sql import functions as F


def test_read_chunks_roundtrip(spark, tmp_path):
    from swiftbeaver_spark.chunking import (
        chunks_from_bytes,
        materialize_chunks,
        read_chunks,
    )

    blob = bytes(range(256)) * 40  # 10,240 bytes
    chunks = chunks_from_bytes(spark, blob, chunk_size=4096, overlap=16)
    out = str(tmp_path / "chunks")
    materialize_chunks(chunks, out)
    back = read_chunks(spark, out)
    a = sorted(map(tuple, chunks.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b and len(a) >= 3


def test_read_tfrecord_directory(spark, tmp_path):
    from swiftbeaver_spark.llm.tfrecord import pack_tfrecord, read_tfrecord

    recs = [b"alpha", b"", b"\x00\xffbinary payload"]
    (tmp_path / "shard-0.tfrecord").write_bytes(pack_tfrecord(recs[:2]))
    (tmp_path / "shard-1.tfrecord").write_bytes(pack_tfrecord(recs[2:]))
    rows = read_tfrecord(spark, str(tmp_path)).collect()
    assert sorted(bytes(r.payload) for r in rows) == sorted(recs)
    assert all(r.crc_ok for r in rows)


def test_read_warc_directory(spark, tmp_path):
    from swiftbeaver_spark.llm.warc import read_warc, serialize_record

    blob = serialize_record(
        "response", "<urn:uuid:1>", "http://example.com/a", b"hello world"
    ) + serialize_record(
        "response", "<urn:uuid:2>", "http://example.com/b", b"second"
    )
    (tmp_path / "crawl-0.warc").write_bytes(blob)
    rows = read_warc(spark, str(tmp_path)).collect()
    assert {r.target_uri for r in rows} == {
        "http://example.com/a",
        "http://example.com/b",
    }
    assert {bytes(r.payload) for r in rows} == {b"hello world", b"second"}


def test_content_digest_normalization(spark):
    from swiftbeaver_spark.llm.text import content_digest

    df = spark.createDataFrame(
        [("  Hello   WORLD  ",), ("hello world",), ("different",)], ["t"]
    )
    d = [r.d for r in df.select(content_digest(F.col("t")).alias("d")).collect()]
    assert d[0] == d[1] != d[2]  # whitespace/case-normalized exact-dup key


def test_lang_scores_map(spark):
    from swiftbeaver_spark.llm.text import lang_scores

    df = spark.createDataFrame(
        [("the quick brown fox and the lazy dog",)], ["t"]
    )
    m = df.select(lang_scores(F.col("t")).alias("m")).collect()[0].m
    assert m["en"] >= 2  # 'the'/'and' marker hits
    assert all(v >= 0 for v in m.values())


def test_hilbert_layout_sorted_within_partitions(spark):
    from swiftbeaver_spark.layout import hilbert_layout

    rng = np.random.default_rng(5)
    pts = [(int(x), int(y)) for x, y in rng.integers(0, 200, size=(300, 2))]
    df = spark.createDataFrame(pts, ["x", "y"])
    out = hilbert_layout(df, "x", "y", bits=6, num_partitions=4, key_name="_h")
    parts = out.select(F.spark_partition_id().alias("p"), "_h").collect()
    by_part = {}
    for r in parts:
        by_part.setdefault(r.p, []).append(r._h)
    assert sum(len(v) for v in by_part.values()) == 300
    for keys in by_part.values():
        assert keys == sorted(keys)  # sortWithinPartitions on the key
    # range partitioning: partition key ranges do not interleave
    spans = sorted((min(v), max(v)) for v in by_part.values())
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2


def test_carved_files_as_media_bridge(spark, tmp_path):
    from swiftbeaver_spark.llm.multimodal import carved_files_as_media

    from fixtures import mk_jpeg, mk_wav

    jpeg, wav = mk_jpeg(), mk_wav()
    blob = b"\x00" * 100 + jpeg + b"\x00" * 50 + wav + b"\x00" * 25
    ev = tmp_path / "evidence.raw"
    ev.write_bytes(blob)
    carved = spark.createDataFrame(
        [
            (100, len(jpeg), "jpeg"),
            (100 + len(jpeg) + 50, len(wav), "wav"),
            (0, 10, "sqlite"),  # non-media type must be filtered out
        ],
        "global_start LONG, size LONG, file_type STRING",
    )
    rows = {r.media_id: r for r in carved_files_as_media(carved, str(ev)).collect()}
    assert set(rows) == {100, 100 + len(jpeg) + 50}
    assert rows[100].modality == "image" and bytes(rows[100].payload) == jpeg
    r2 = rows[100 + len(jpeg) + 50]
    assert r2.modality == "audio" and bytes(r2.payload) == wav
