"""WARC reader/writer (llm/warc.py): spec framing, damage tolerance."""

import pandas as pd

from swiftbeaver_spark.llm.warc import (
    parse_warc_bytes,
    serialize_record,
    warc_archives,
    warc_records,
)


def _rec(i: int, body: bytes = b"hello") -> bytes:
    return serialize_record(
        "response", f"<urn:uuid:{i}>", f"http://x/{i}", body
    )


def test_parse_roundtrip_offsets():
    blob = _rec(1, b"aaa") + _rec(2, b"bbbb") + _rec(3, b"")
    rows = parse_warc_bytes("a.warc", blob)
    assert len(rows) == 3
    assert [r[1] for r in rows] == [0, len(_rec(1, b"aaa")), len(_rec(1, b"aaa")) + len(_rec(2, b"bbbb"))]
    assert [r[5] for r in rows] == [3, 4, 0]
    assert [r[6] for r in rows] == [b"aaa", b"bbbb", b""]
    assert all(r[7] is None for r in rows)
    assert rows[0][2] == "response" and rows[0][4] == "http://x/1"


def test_parse_payload_containing_separator():
    # Content-Length self-delimits: a payload holding the record
    # separator bytes must NOT split the record
    body = b"x\r\n\r\nWARC/1.0\r\n\r\ny"
    rows = parse_warc_bytes("a.warc", _rec(1, body) + _rec(2, b"z"))
    assert len(rows) == 2
    assert rows[0][6] == body and rows[1][6] == b"z"


def test_parse_truncated_payload_flags_not_raises():
    whole = _rec(1, b"0123456789")
    rows = parse_warc_bytes("a.warc", whole[: len(whole) - 9])  # cut into payload
    assert len(rows) == 1
    assert rows[0][7] == "length"
    assert len(rows[0][6]) < 10


def test_parse_garbage_header_flags_not_raises():
    rows = parse_warc_bytes("a.warc", _rec(1) + b"not a warc header at all")
    assert len(rows) == 2
    assert rows[0][7] is None and rows[1][7] == "header"


def test_parse_missing_final_separator():
    blob = _rec(1, b"abc")
    rows = parse_warc_bytes("a.warc", blob[:-4])  # writer separator stripped
    assert len(rows) == 1 and rows[0][6] == b"abc" and rows[0][7] is None


def test_spark_roundtrip(spark):
    recs = spark.createDataFrame(
        pd.DataFrame(
            {
                "archive": ["w0", "w0", "w1"],
                "order_key": [2, 1, 3],
                "warc_type": ["response"] * 3,
                "record_id": ["<urn:uuid:2>", "<urn:uuid:1>", "<urn:uuid:3>"],
                "target_uri": ["http://x/2", "http://x/1", "http://x/3"],
                "payload": [b"two", b"one", b"three"],
            }
        )
    )
    out = warc_records(warc_archives(recs)).collect()
    by_id = {r.record_id: r for r in out}
    assert len(out) == 3
    # order_col ordering: record 1 serializes before record 2 in w0
    assert by_id["<urn:uuid:1>"].rec_offset == 0
    assert by_id["<urn:uuid:2>"].rec_offset == len(
        serialize_record("response", "<urn:uuid:1>", "http://x/1", b"one")
    )
    assert bytes(by_id["<urn:uuid:3>"].payload) == b"three"
    assert all(r.truncated is None for r in out)


def test_null_target_uri_omits_header(spark):
    import pandas as pd

    recs = spark.createDataFrame(
        pd.DataFrame(
            {
                "archive": ["w0", "w0"],
                "order_key": [1, 2],
                "warc_type": ["metadata", "response"],
                "record_id": ["<urn:uuid:1>", "<urn:uuid:2>"],
                "target_uri": [None, "http://x/2"],
                "payload": [b"m", b"r"],
            }
        )
    )
    out = {r.record_id: r for r in warc_records(warc_archives(recs)).collect()}
    # null URI (None or pandas NaN) omits the header entirely — the
    # parser must see no WARC-Target-URI, never the string 'nan'
    assert out["<urn:uuid:1>"].target_uri is None
    assert out["<urn:uuid:2>"].target_uri == "http://x/2"
