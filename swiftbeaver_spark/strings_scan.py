"""String span scan + artefact extraction (URLs / emails / phones).

Reference parity: src/strings/cpu.rs (ascii/utf8/utf16 span scans,
hint flags), src/strings/mod.rs:100-322 (regexes, normalizers,
decode_span, artefact building).

Spark design: the span scan is a single Arrow mapInPandas pass over
chunks (same pass shape as the signature scan — at scale the two can
share one cached chunk read). Artefact extraction is *gated by the
cheap hint flags* exactly like the reference (predicate gating,
SURVEY §4): the regex only runs on spans whose flag is set, expressed
as a DataFrame `where` before the extraction UDF so Catalyst prunes
early.
"""

from __future__ import annotations

import functools
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swiftbeaver_spark import schemas
from swiftbeaver_spark.config import PY_SCAN_GRANULE, EngineConfig
from swiftbeaver_spark.parallel import spread

_ASCII_RE_TMPL = rb"[\t\x20-\x7E]{%d,}"

URL_RE = re.compile(r"\b(?:https?://|www\.)[^\s\"'<>]+", re.IGNORECASE)
EMAIL_RE = re.compile(r"\b[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]{2,}\b", re.IGNORECASE)
# verbatim reference regex (src/strings/mod.rs:122-123) INCLUDING the
# \b-before-\+? quirk: after a space there is no word boundary before
# '+', so E.164 numbers match from their first digit (no '+' captured).
# Intentional parity — do not "fix" without diverging from the reference.
PHONE_RE = re.compile(r"\b\+?\d[\d\s().-]{6,}\d\b")

_TRAILING_PUNCT = ".,;:)]}\"'><"


def trim_trailing_punct(value: str) -> str:
    return value.rstrip(_TRAILING_PUNCT)


def normalize_url(value: str) -> str | None:
    """Scheme/host validation (reference src/strings/mod.rs:261-290)."""
    trimmed = trim_trailing_punct(value)
    if not (8 <= len(trimmed) <= 2048):
        return None
    lower = trimmed.lower()
    if lower.startswith("http://"):
        rest = trimmed[7:]
    elif lower.startswith("https://"):
        rest = trimmed[8:]
    elif lower.startswith("www."):
        rest = trimmed[4:]
    else:
        return None
    host_port = rest.split("/", 1)[0]
    host = host_port.split(":", 1)[0]
    if not host or len(host) > 253 or "." not in host:
        return None
    for part in host.split("."):
        if not part or len(part) > 63:
            return None
    return trimmed


def normalize_email(value: str) -> str | None:
    """Local/domain validation (reference src/strings/mod.rs:292-313)."""
    trimmed = trim_trailing_punct(value)
    if not (6 <= len(trimmed) <= 254):
        return None
    if "@" not in trimmed:
        return None
    local, domain = trimmed.split("@", 1)
    if not local or len(local) > 64:
        return None
    if len(domain) > 253 or "." not in domain:
        return None
    if not any(c.isalpha() for c in domain):
        return None
    for part in domain.split("."):
        if not part or len(part) > 63:
            return None
    return trimmed


def is_plausible_phone(value: str) -> bool:
    """10..15 digits with >=4 unique (reference src/strings/mod.rs:194-210)."""
    digits = [c for c in value if c.isdigit()]
    return 10 <= len(digits) <= 15 and len(set(digits)) >= 4


def _flags(content: bytes) -> tuple[bool, bool, bool]:
    low = content.lower()
    url_like = b"http" in low or b"www." in low
    email_like = b"@" in content
    phone_like = sum(1 for b in content if 0x30 <= b <= 0x39) >= 10
    return url_like, email_like, phone_like


def _scan_ascii(data: bytes, min_len: int, max_len: int) -> list[tuple[int, bytes]]:
    """Printable runs [\\t\\x20-\\x7E], split at max_len
    (reference src/strings/cpu.rs:42-80)."""
    out = []
    for m in re.finditer(_ASCII_RE_TMPL % 1, data):
        s, e = m.start(), m.end()
        pos = s
        while pos < e:
            piece = data[pos : min(pos + max_len, e)]
            if len(piece) >= min_len:
                out.append((pos, piece))
            pos += max_len
    return out


_UTF8_MB = rb"(?:[\xC2-\xDF][\x80-\xBF]|[\xE0-\xEF][\x80-\xBF]{2}|[\xF0-\xF4][\x80-\xBF]{3})"
_UTF8_RUN = re.compile(rb"(?:[\t\x20-\x7E]|%s)+" % _UTF8_MB)
_HAS_MB = re.compile(_UTF8_MB)


def _scan_utf8(data: bytes, min_len: int, max_len: int) -> list[tuple[int, bytes]]:
    """Validated UTF-8 printable runs containing >=1 multibyte char;
    min/max are char counts (reference src/strings/cpu.rs:82-141)."""
    out = []
    for m in _UTF8_RUN.finditer(data):
        raw = m.group(0)
        if not _HAS_MB.search(raw):
            continue
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if not all(c == "\t" or c.isprintable() for c in text):
            continue
        # split at max_len chars
        pos_chars = 0
        byte_pos = m.start()
        while pos_chars < len(text):
            piece = text[pos_chars : pos_chars + max_len]
            piece_bytes = piece.encode("utf-8")
            if len(piece) >= min_len and _HAS_MB.search(piece_bytes):
                out.append((byte_pos, piece_bytes))
            byte_pos += len(piece_bytes)
            pos_chars += max_len
    return out


_UTF16LE_RUN = re.compile(rb"(?:[\t\x20-\x7E]\x00)+")
_UTF16BE_RUN = re.compile(rb"(?:\x00[\t\x20-\x7E])+")


def _scan_utf16(
    data: bytes, min_len: int, max_len: int, little_endian: bool
) -> list[tuple[int, bytes]]:
    """Byte-pair runs at both alignments; span bytes = 2x chars
    (reference src/strings/cpu.rs:143-216).

    One regex pass replaces the earlier per-byte Python state machine
    (round-7 10x measurement: q35 ran ~1.5 MB/s with the loop — the
    whole strings family's bottleneck). Equivalence to the two-
    alignment state machine is structural: within ONE endianness two
    runs can never overlap across alignments (an LE pair ends in 0x00
    and 0x00 is not printable, so no byte can simultaneously end one
    pair and start the next; mirror argument for BE), hence maximal
    regex matches over the whole blob are exactly the union of the
    even- and odd-alignment maximal runs. Long runs split into
    consecutive max_len-char segments, each emitted iff >= min_len —
    the same segmentation the loop produced (pytest + the q35 oracle
    pin it)."""
    out = []
    pat = _UTF16LE_RUN if little_endian else _UTF16BE_RUN
    step = 2 * max_len
    for m in pat.finditer(data):
        s, e = m.start(), m.end()
        pos = s
        while pos < e:
            piece = data[pos : min(pos + step, e)]
            if len(piece) // 2 >= min_len:
                out.append((pos, piece))
            pos += step
    return out


def _decode_span(raw: bytes, encoding: str) -> str:
    if encoding == "utf-16le":
        return raw[0::2].decode("utf-8", "replace")
    if encoding == "utf-16be":
        return raw[1::2].decode("utf-8", "replace")
    return raw.decode("utf-8", "replace")


@functools.lru_cache(maxsize=1)
def _printable_intervals() -> str:
    """Python's str.isprintable() truth for codepoints >= 0x80, as hex
    'lo-hi' ranges — exported to the JVM kernel in the spec string so
    UTF-8 printability parity can never drift with JVM Unicode versions
    (ASCII and \\t are handled structurally on both sides)."""
    parts = []
    lo = None
    for cp in range(0x80, 0x110000):
        if chr(cp).isprintable():
            if lo is None:
                lo = cp
        elif lo is not None:
            parts.append(f"{lo:x}-{cp - 1:x}")
            lo = None
    if lo is not None:
        parts.append(f"{lo:x}-{0x10FFFF:x}")
    return ",".join(parts)


def _strings_spec(cfg: EngineConfig) -> str:
    """JVM kernel spec (see java/src/sbspark/Strs.java)."""
    return (
        f"{cfg.string_min_len};{cfg.string_max_len};"
        f"{1 if cfg.string_scan_utf16 else 0};{cfg.chunk_size};{cfg.overlap};"
        f"{_printable_intervals()}"
    )


def scan_string_spans(chunks: DataFrame, cfg: EngineConfig) -> DataFrame:
    """chunks -> string spans with hint flags, overlap-deduped.

    Dispatches to the JVM span kernel when it registers into this
    session (chunk bytes never cross into Python; ~an order of
    magnitude over the Python kernel — see SCALE.md r10); the Python
    mapInPandas pass below is the pinned fallback
    (SPARK_GRAFT_NO_VEC_KERNEL=1 forces it)."""
    from swiftbeaver_spark.jvm import vec_kernel_active

    min_len, max_len = cfg.string_min_len, cfg.string_max_len
    scan_utf16 = cfg.string_scan_utf16
    if vec_kernel_active(chunks.sparkSession):
        rows = F.call_udf(
            "sb_scan_strings_bytes",
            F.col("data"),
            F.col("start").cast("long"),
            F.col("valid_length").cast("long"),
            F.lit(_strings_spec(cfg)),
        )
        return spread(chunks).select(F.inline(rows))
    # spread the compute-dense scan across cores when the chunk source
    # collapsed to fewer input splits than the cluster has slots
    # (measured 2 of 32 cores busy on the 10x q35 corpus, whose 100 MB
    # of synthesized chunks arrive as 2 file splits); a no-op at scale
    # where splits >> cores
    chunks = spread(chunks)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for start, vlen, data in zip(pdf["start"], pdf["valid_length"], pdf["data"]):
                rows.extend(
                    _blob_spans(bytes(data), int(start), int(vlen), min_len, max_len, scan_utf16)
                )
            yield pd.DataFrame(rows, columns=_SPAN_COLUMNS)

    return chunks.mapInPandas(scan, schemas.STRING_SPANS)


_SPAN_COLUMNS = [
    "global_start",
    "byte_length",
    "content",
    "encoding",
    "url_like",
    "email_like",
    "phone_like",
]


def _blob_spans(
    blob: bytes, start: int, vlen: int, min_len: int, max_len: int, scan_utf16: bool
) -> list[tuple]:
    """All span rows for one chunk blob (shared by the chunk-table and
    fused-evidence paths so their semantics cannot drift)."""
    found: list[tuple[int, bytes, str]] = []
    for pos, raw in _scan_ascii(blob, min_len, max_len):
        found.append((pos, raw, "ascii"))
    for pos, raw in _scan_utf8(blob, min_len, max_len):
        found.append((pos, raw, "utf-8"))
    if scan_utf16:
        for pos, raw in _scan_utf16(blob, min_len, max_len, True):
            found.append((pos, raw, "utf-16le"))
        for pos, raw in _scan_utf16(blob, min_len, max_len, False):
            found.append((pos, raw, "utf-16be"))
    rows = []
    for pos, raw, enc in found:
        if pos >= vlen:  # overlap dedup, same rule as hits
            continue
        rows.append(_span_row(start + pos, raw, enc))
    return rows


def _span_row(global_start: int, raw: bytes, enc: str) -> tuple:
    """One STRING_SPANS row: decode + hint flags (shared by every path)."""
    if enc.startswith("utf-16"):
        flag_src = raw[0::2] if enc == "utf-16le" else raw[1::2]
    else:
        flag_src = raw
    url_like, email_like, phone_like = _flags(flag_src)
    return (
        global_start,
        len(raw),
        _decode_span(raw, enc),
        enc,
        url_like,
        email_like,
        phone_like,
    )


_ARTEFACT_COLUMNS = [f.name for f in schemas.STRING_ARTEFACTS.fields]


def _extract_kind(pdf: pd.DataFrame, kind: str) -> list[tuple]:
    rows = []
    for gstart, content, encoding in zip(pdf["global_start"], pdf["content"], pdf["encoding"]):
        text = str(content)
        if kind == "Url":
            matches = ((m, normalize_url(m.group(0))) for m in URL_RE.finditer(text))
        elif kind == "Email":
            matches = ((m, normalize_email(m.group(0))) for m in EMAIL_RE.finditer(text))
        else:
            matches = (
                (m, m.group(0) if is_plausible_phone(m.group(0)) else None)
                for m in PHONE_RE.finditer(text)
            )
        for m, value in matches:
            if value is None:
                continue
            # byte offset of the match within the decoded text (reference
            # uses the Rust &str byte offset, src/strings/mod.rs:137-146)
            off = len(text[: m.start()].encode("utf-8"))
            a_start = int(gstart) + off
            blen = len(value.encode("utf-8"))
            a_end = a_start if blen == 0 else a_start + blen - 1
            rows.append((kind, value, str(encoding), a_start, a_end))
    return rows


def scan_string_artefacts(spans: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Hint-gated regex extraction over spans -> string_artefacts.

    ONE pass: every enabled kind extracts inside a single mapInPandas
    over the flag-filtered spans. The earlier form built one
    filter+mapInPandas branch PER KIND and unioned them — three
    branches each re-evaluating the whole spans subtree, which for the
    fused evidence path means three full evidence scans (measured:
    the 64 MiB full-pipeline stress spent ~3x its span-scan cost
    here; same pathology classify_documents_subword's four-branch
    weight union had in round 8). Row content is identical — the
    per-kind extraction loops are unchanged and output order was
    never part of the contract (union semantics)."""
    kinds = [
        (kind, flag)
        for kind, flag, enabled in (
            ("Url", "url_like", cfg.enable_url_scan),
            ("Email", "email_like", cfg.enable_email_scan),
            ("Phone", "phone_like", cfg.enable_phone_scan),
        )
        if enabled
    ]
    if not kinds:
        return spans.sparkSession.createDataFrame([], schemas.STRING_ARTEFACTS)
    keep = functools.reduce(
        lambda a, b: a | b, [F.col(flag) for _, flag in kinds]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for kind, flag in kinds:
                rows.extend(_extract_kind(pdf[pdf[flag]], kind))
            yield pd.DataFrame(rows, columns=_ARTEFACT_COLUMNS)

    return spans.where(keep).mapInPandas(extract, schemas.STRING_ARTEFACTS)


def enrich_urls(artefacts: DataFrame) -> DataFrame:
    """URL component split (reference src/metadata/parquet.rs:1635-1688):
    www.-prefixed URLs are treated as http. Pure Catalyst expressions."""
    urls = artefacts.where(F.col("artefact_kind") == "Url")
    full = F.when(
        F.lower(F.col("content")).startswith("www."), F.concat(F.lit("http://"), F.col("content"))
    ).otherwise(F.col("content"))
    return urls.select(
        "content",
        F.lower(F.split(full, "://")[0]).alias("scheme"),
        F.lower(F.parse_url(full, F.lit("HOST"))).alias("host"),
        F.parse_url(full, F.lit("USERINFO")).alias("_ui"),
        F.parse_url(full, F.lit("PATH")).alias("path"),
        F.parse_url(full, F.lit("QUERY")).alias("query"),
        F.parse_url(full, F.lit("REF")).alias("fragment"),
        "encoding",
        "global_start",
        "global_end",
    ).withColumn(
        # reference takes the authority's trailing :digits (rfind after
        # stripping path/query/fragment), so www.-prefixed URLs and
        # userinfo@host forms keep their port — extract from `full`'s
        # authority, not the raw content
        "port",
        F.regexp_extract(
            F.regexp_extract(full, r"^[a-zA-Z]+://([^/?#]*)", 1), r":(\d+)$", 1
        ).cast("int"),
    ).select(
        "content",
        "scheme",
        "host",
        "port",
        "path",
        "query",
        "fragment",
        "encoding",
        "global_start",
        "global_end",
        F.lit("string_scan").alias("source_kind"),
        F.lit("span").alias("source_detail"),
        F.lit(1.0).alias("certainty"),
    )


def enrich_emails(artefacts: DataFrame) -> DataFrame:
    """local_part/domain split (reference src/metadata/parquet.rs:1691+)."""
    emails = artefacts.where(F.col("artefact_kind") == "Email")
    return emails.select(
        "content",
        F.substring_index(F.col("content"), "@", 1).alias("local_part"),
        F.substring_index(F.col("content"), "@", -1).alias("domain"),
        "encoding",
        "global_start",
        "global_end",
        F.lit("string_scan").alias("source_kind"),
        F.lit("span").alias("source_detail"),
        F.lit(1.0).alias("certainty"),
    )


def enrich_phones(artefacts: DataFrame) -> DataFrame:
    """phone_raw + e164/country placeholders, certainty 1.0
    (reference src/metadata/parquet.rs:951-963,1591-1631)."""
    phones = artefacts.where(F.col("artefact_kind") == "Phone")
    return phones.select(
        "content",
        F.col("content").alias("phone_raw"),
        F.lit(None).cast("string").alias("phone_e164"),
        F.lit(None).cast("string").alias("country"),
        "encoding",
        "global_start",
        "global_end",
        F.lit("string_scan").alias("source_kind"),
        F.lit("span").alias("source_detail"),
        F.lit(1.0).alias("certainty"),
    )


# --- continuation-aware sub-chunk scanning ---------------------------------
#
# The fused evidence path plans at a PYTHON-KERNEL granule (16 MiB), not
# the 512 MiB I/O chunk size — a 1 GiB image planned at cfg.chunk_size
# is TWO plan rows, two busy cores of 32 (round-9 measurement: 121 s vs
# 11 s). Row SEMANTICS, however, stay pinned to cfg.chunk_size geometry
# (the chunk-table path and the reference's build_chunks both anchor run
# detection and max_len piece grids at chunk starts): a sub-chunk whose
# start is mid-run must NOT re-emit the run's tail as a fresh fragment,
# and must anchor piece splits at the TRUE run start. Each sub-chunk
# therefore (a) extends its scan window backward to a position no run
# can cross (a byte outside every run alphabet, or a 00 00 pair — no
# encoding's run contains two consecutive NULs — capped at the parent
# chunk start, where the parent blob itself re-anchors), (b) scans the
# extended window with the SAME run/piece functions, and (c) emits only
# pieces whose start falls in its ownership range [start, start+vlen).
# UTF-8 runs additionally carry run-GLOBAL properties (whole-run strict
# decode + printability) and a char-grid, so a run touching the window
# end extends forward to its true structural end (capped at the parent
# read end, where the parent blob truncates it too).

# bytes that can appear INSIDE some encoding's run: \t + printable ascii
# (all encodings), utf-8 continuations \x80-\xBF + leads \xC2-\xF4, and
# (utf-16 only) \x00. Anything else is a barrier: no run crosses it.
@functools.lru_cache(maxsize=4)
def _runish_table(utf16: bool):
    import numpy as np

    t = np.zeros(256, dtype=bool)
    t[0x09] = True
    t[0x20:0x7F] = True
    t[0x80:0xC0] = True
    t[0xC2:0xF5] = True
    if utf16:
        t[0x00] = True
    return t


def _find_window_start(reader, p: int, lo_cap: int, utf16: bool) -> int:
    """Largest w0 in [lo_cap, p] such that no run crosses w0-1 -> w0:
    byte w0-1 is outside every run alphabet, or bytes (w0-1, w0) are
    both NUL (no encoding's run contains 00 00 — utf-16 pairs alternate
    printable/NUL). Backward block scan, vectorized; real content hits
    a barrier within a few bytes (newlines, zero fill, high bytes)."""
    import numpy as np

    table = _runish_table(utf16)
    block = 256 * 1024
    hi = p
    while hi > lo_cap:
        lo = max(lo_cap, hi - block)
        # one extra byte past hi so the 00 00 pair rule sees (hi-1, hi)
        buf = np.frombuffer(reader.read_at(lo, hi - lo + 1), dtype=np.uint8)
        cur = buf[: hi - lo]
        bad = ~table[cur]
        if utf16 and buf.size > cur.size:
            nxt = buf[1 : cur.size + 1]
            bad |= (cur[: nxt.size] == 0) & (nxt == 0)
        idx = np.flatnonzero(bad)
        if idx.size:
            return lo + int(idx[-1]) + 1
        hi = lo
        block = min(block * 2, 64 * 1024 * 1024)
    return lo_cap


def _extend_utf8_run(reader, run_g: int, tail: bytes, e_cap: int) -> bytes:
    """Extend a structural UTF-8 run that touches the window end forward
    to its true end (capped at the parent read end e_cap). Doubling
    blocks + re-match keep total work ~2x the final run length.

    A re-match that stops short of the buffer end is only a structural
    run end when the remainder is NOT a dangling multibyte prefix: a
    read boundary that cuts a unit in half leaves a lead byte
    (0xC2-0xF4) with < 4 bytes after it, and the run may continue once
    the unit reassembles from the next read — truncating there made the
    run-global printability check cover only a prefix (ADVICE r10: a
    >1 MiB run with a Cf char past the cut emitted pieces the other
    kernels reject). JVM parity: Strs.extendRun's truncated-trailing-
    unit re-read (Strs.java:298-300)."""
    buf = bytearray(tail)
    step = 1 << 20
    end = len(buf)  # `tail` arrives as a structural match
    while run_g + len(buf) < e_cap:
        more = reader.read_at(run_g + len(buf), min(step, e_cap - run_g - len(buf)))
        if not more:
            break
        buf += more
        m = _UTF8_RUN.match(bytes(buf))
        end = m.end() if m else 0
        if end < len(buf):
            dangling = (
                len(buf) - end < 4
                and 0xC2 <= buf[end] <= 0xF4
                and all(0x80 <= c <= 0xBF for c in buf[end + 1 :])
            )
            if not dangling:
                break  # the run's true structural end
            # else: read more — the re-match reassembles the unit (an
            # invalid reassembly just ends the match here next round,
            # when >= 4 remainder bytes flip `dangling` off)
        step = min(step * 2, 64 << 20)
    # truncate any unverified remainder (true end, or a dangling prefix
    # left at e_cap/EOF — the parent-geometry scan drops it there too)
    return bytes(buf[:end])


def _utf8_owned_rows(
    blob: bytes,
    w0: int,
    p: int,
    own_end: int,
    e_cap: int,
    reader,
    min_len: int,
    max_len: int,
) -> list[tuple]:
    """UTF-8 pieces owned by [p, own_end), with run-global checks over
    the FULL run (same checks as _scan_utf8, anchored at true starts)."""
    rows: list[tuple] = []
    for m in _UTF8_RUN.finditer(blob):
        rs, re_ = m.span()
        if w0 + rs >= own_end:
            break
        if w0 + re_ <= p:
            continue
        # owned pieces start >= p, so their bytes (and any multibyte
        # char that could make them emittable) lie in [p, run end);
        # no multibyte lead there => nothing to emit => skip before
        # paying for forward extension (kills the all-ASCII flood case)
        if not _HAS_MB.search(blob[max(rs, p - w0) : re_]):
            continue
        raw = m.group(0)
        run_g = w0 + rs
        # forward-extend when the run reaches the window end OR ends
        # within 3 bytes of it: a multibyte unit STRADDLING the window
        # cut leaves a dangling lead/continuation prefix the structural
        # match excludes, but the parent-geometry run continues through
        # it — the extension re-reads from the file so the straddling
        # unit reassembles (an invalid dangling tail just ends the
        # re-match where the run truly ends)
        if w0 + len(blob) < e_cap and len(blob) - re_ <= 3:
            raw = _extend_utf8_run(reader, run_g, raw, e_cap)
        if not _HAS_MB.search(raw):
            continue
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if not all(c == "\t" or c.isprintable() for c in text):
            continue
        pos_chars = 0
        byte_pos = run_g
        while pos_chars < len(text) and byte_pos < own_end:
            piece = text[pos_chars : pos_chars + max_len]
            piece_bytes = piece.encode("utf-8")
            if byte_pos >= p and len(piece) >= min_len and _HAS_MB.search(piece_bytes):
                rows.append(_span_row(byte_pos, piece_bytes, "utf-8"))
            byte_pos += len(piece_bytes)
            pos_chars += max_len
    return rows


def _subchunk_spans(
    reader, p: int, vlen: int, total: int, cfg: EngineConfig
) -> list[tuple]:
    """All span rows owned by sub-chunk [p, p+vlen), bit-identical to
    the rows a cfg.chunk_size-geometry _blob_spans scan would emit for
    starts in that range (pytest parity + differential fuzz).

    Pathological bound (barrier-free content — e.g. one newline-less
    printable region spanning a whole parent chunk): the backward
    extension walks to the parent start, so per-task window memory
    tops out at chunk_size+overlap — the SAME per-task bound the
    chunk-table path always has — and the parent's bytes are re-read/
    re-scanned up to n_sub times (32x at the default geometry; ~4 s of
    vectorized numpy per 512 MiB parent). Real evidence terminates the
    walk in a few bytes (newlines, NULs, and ~17% of random bytes are
    barriers). A correct sub-chunk scan cannot avoid knowing the true
    run start — only the parent-sized-task fallback (granule >=
    chunk_size) trades the amplification back for parallelism."""
    min_len, max_len = cfg.string_min_len, cfg.string_max_len
    utf16 = cfg.string_scan_utf16
    s_par, v_par = cfg.chunk_size, cfg.overlap
    c_par = (p // s_par) * s_par
    e_cap = min(c_par + s_par + v_par, total)
    own_end = p + vlen
    # forward margin: any owned piece fits (utf-8 worst case 4 bytes per
    # char); max(overlap) keeps the degenerate one-sub-chunk-per-parent
    # case reading exactly the parent blob
    w1 = min(own_end + max(v_par, 4 * max_len), e_cap)
    w0 = _find_window_start(reader, p, c_par, utf16) if p > c_par else p
    blob = reader.read_at(w0, w1 - w0)
    rows: list[tuple] = []
    for pos, raw in _scan_ascii(blob, min_len, max_len):
        g = w0 + pos
        if p <= g < own_end:
            rows.append(_span_row(g, raw, "ascii"))
    rows.extend(
        _utf8_owned_rows(blob, w0, p, own_end, e_cap, reader, min_len, max_len)
    )
    if utf16:
        for le in (True, False):
            enc = "utf-16le" if le else "utf-16be"
            for pos, raw in _scan_utf16(blob, min_len, max_len, le):
                g = w0 + pos
                if p <= g < own_end:
                    rows.append(_span_row(g, raw, enc))
    return rows


def subchunk_plan(
    spark, total: int, chunk_size: int, granule: int
) -> DataFrame:
    """Sub-chunks tiling each parent chunk exactly (pure range
    arithmetic): ragged last sub-chunk when granule does not divide
    chunk_size, so ownership ranges never straddle a parent boundary."""
    import math

    n_sub = max(1, math.ceil(chunk_size / granule))
    g2 = math.ceil(chunk_size / n_sub)
    n_parents = max(0, math.ceil(total / chunk_size))
    ids = spark.range(0, n_parents * n_sub)
    j = F.col("id") % n_sub
    start = F.floor(F.col("id") / n_sub).cast("long") * chunk_size + j * g2
    return (
        ids.select(
            start.alias("start"),
            F.least(
                F.lit(g2), F.lit(chunk_size) - j * g2, F.lit(total) - start
            ).alias("valid_length"),
        )
        .where(F.col("valid_length") > 0)
    )


def spans_from_evidence(
    spark, path: str, cfg: EngineConfig, granule: int | None = None
) -> DataFrame:
    """Fused fetch+span-scan off the evidence file (no chunk bytes across
    the JVM boundary; see scanner.scan_evidence for the rationale).
    Plans at the Python-kernel granule for parallelism; row semantics
    stay pinned to cfg.chunk_size geometry via the continuation-aware
    sub-chunk scan above (identical rows to the chunk-table path).
    Dispatches to the JVM kernel (sb_scan_strings — positioned read +
    scan inside the executor JVM, same continuation semantics) when
    registered; Python below is the pinned fallback."""
    from swiftbeaver_spark.jvm import vec_kernel_active
    from swiftbeaver_spark.source import evidence_length, open_evidence

    total = evidence_length(path)
    g = granule if granule is not None else PY_SCAN_GRANULE
    plan = subchunk_plan(spark, total, cfg.chunk_size, min(cfg.chunk_size, g))
    # scan limits: the chunk-table path derives spans from the truncated
    # chunk table, so the evidence path filters sub-chunks by the same
    # PARENT rules (a parent whose start clears max_bytes is scanned
    # whole; sub-chunks never straddle parents by construction) —
    # previously limits silently applied to hits but not spans (r12)
    if cfg.max_bytes is not None:
        plan = plan.where(
            F.floor(F.col("start") / cfg.chunk_size) * cfg.chunk_size
            < int(cfg.max_bytes)
        )
    if cfg.max_chunks is not None:
        plan = plan.where(F.floor(F.col("start") / cfg.chunk_size) < int(cfg.max_chunks))
    # partition count scales with scan bytes, floored at parallelism
    # (r14, the shared evidence-path rule — config.
    # EVIDENCE_PARTITION_BYTES)
    from swiftbeaver_spark.config import EVIDENCE_PARTITION_BYTES

    horizon = total
    if cfg.max_bytes is not None:
        horizon = min(
            horizon, -(-int(cfg.max_bytes) // cfg.chunk_size) * cfg.chunk_size
        )
    if cfg.max_chunks is not None:
        horizon = min(horizon, int(cfg.max_chunks) * cfg.chunk_size)
    n_parts = max(
        spark.sparkContext.defaultParallelism,
        1,
        -(-horizon // EVIDENCE_PARTITION_BYTES),
    )
    if vec_kernel_active(spark):
        rows = F.call_udf(
            "sb_scan_strings",
            F.lit(path),
            F.col("start").cast("long"),
            F.col("valid_length").cast("long"),
            F.lit(_strings_spec(cfg)),
        )
        return plan.repartition(n_parts).select(F.inline(rows))

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        reader = open_evidence(path)
        try:
            for pdf in batches:
                rows = []
                for start, vlen in zip(pdf["start"], pdf["valid_length"]):
                    rows.extend(
                        _subchunk_spans(reader, int(start), int(vlen), total, cfg)
                    )
                yield pd.DataFrame(rows, columns=_SPAN_COLUMNS)
        finally:
            reader.close()

    return plan.repartition(n_parts).mapInPandas(fused, schemas.STRING_SPANS)
