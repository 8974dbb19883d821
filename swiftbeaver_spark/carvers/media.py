"""Media-format carve handlers: RIFF (webp/wav/avi), mp4/mov, mp3, ogg,
webm/mkv, wmv/asf.

Parity: reference src/carve/{riff,webp,wav,avi,mp4,mov,mp3,ogg,webm,wmv}.rs.
"""

from __future__ import annotations

import struct

from swiftbeaver_spark.carvers.base import CarveOutcome, Reader


def _carve_riff(reader: Reader, offset: int, max_size: int, form: bytes) -> CarveOutcome | None:
    """RIFF declared size (+8) gated on the form tag
    (reference src/carve/riff.rs:25-41)."""
    head = reader.read_exact(offset, 12)
    if head is None or head[:4] != b"RIFF" or head[8:12] != form:
        return None
    declared = struct.unpack_from("<I", head, 4)[0] + 8
    out = CarveOutcome(end=offset + declared, validated=True)
    if max_size > 0 and declared > max_size:
        out.end = offset + max_size
        out.truncated = True
        out.errors.append("max_size reached before riff end")
    return out


def carve_webp(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    return _carve_riff(reader, offset, max_size, b"WEBP")


def carve_wav(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    return _carve_riff(reader, offset, max_size, b"WAVE")


def carve_avi(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    return _carve_riff(reader, offset, max_size, b"AVI ")


def _walk_boxes(
    reader: Reader, offset: int, max_size: int, require_qt_brand: bool, allow_quicktime: bool
) -> CarveOutcome | None:
    """ISO-BMFF box walk shared by mp4 and mov handlers
    (reference src/carve/mp4.rs:44-213, mov.rs:41-160).

    Ends at `last_good` — the end of the last box whose header parsed;
    trailing bytes that still parse as boxes are absorbed (reference
    behavior), a bogus box after ftyp+moov stops the walk cleanly.
    """
    pos = offset
    last_good = offset
    seen_ftyp = False
    seen_moov = False
    truncated = False
    errors: list[str] = []
    evidence_len = reader.length()

    while True:
        if max_size > 0 and pos - offset >= max_size:
            truncated = True
            errors.append("max_size reached before last box")
            break
        header = reader.read_exact(pos, 8)
        if header is None:
            if not (seen_ftyp and seen_moov and pos + 8 > evidence_len):
                truncated = True
                errors.append("eof before last box")
            break
        size32 = struct.unpack(">I", header[:4])[0]
        box_type = header[4:8]
        if size32 == 1:
            ext = reader.read_exact(pos, 16)
            if ext is None:
                if not (seen_ftyp and seen_moov):
                    truncated = True
                    errors.append("eof in extended box size")
                break
            box_size = struct.unpack(">Q", ext[8:16])[0]
            header_len = 16
        elif size32 == 0:
            if not (seen_ftyp and seen_moov):
                truncated = True
                errors.append("box size 0 encountered")
            break
        else:
            box_size = size32
            header_len = 8
        if box_size < header_len:
            if seen_ftyp and seen_moov:
                break
            return None
        if pos == offset:
            if box_type != b"ftyp":
                return None
            brand = reader.read_exact(pos + header_len, 4)
            if require_qt_brand and brand != b"qt  ":
                return None
            if not require_qt_brand and brand == b"qt  " and not allow_quicktime:
                return None
            seen_ftyp = True
        if box_type == b"moov":
            seen_moov = True
        if max_size > 0 and (pos - offset) + box_size > max_size:
            truncated = True
            errors.append("max_size reached before last box end")
            break
        pos += box_size
        last_good = pos

    if not (seen_ftyp and seen_moov):
        return None
    end = last_good
    if max_size > 0 and end - offset > max_size:
        end = offset + max_size
    return CarveOutcome(end=end, validated=True, truncated=truncated, errors=errors)


def carve_mp4(
    reader: Reader, offset: int, max_size: int, quicktime_mode: str = "mov", **_
) -> CarveOutcome | None:
    return _walk_boxes(
        reader, offset, max_size, require_qt_brand=False, allow_quicktime=quicktime_mode == "mp4"
    )


def carve_mov(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    return _walk_boxes(reader, offset, max_size, require_qt_brand=True, allow_quicktime=True)


# --- MP3 -------------------------------------------------------------------

_BITRATES_V1_L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
_BITRATES_V2_L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
_SAMPLE_RATES = (
    (11025, 12000, 8000, 0),  # MPEG 2.5
    (0, 0, 0, 0),  # reserved
    (22050, 24000, 16000, 0),  # MPEG 2
    (44100, 48000, 32000, 0),  # MPEG 1
)
_MIN_SYNC_FRAMES = 3
_MAX_FRAMES = 100_000


def _mp3_frame_size(header: bytes) -> int | None:
    if len(header) < 4 or header[0] != 0xFF or (header[1] & 0xE0) != 0xE0:
        return None
    version = (header[1] >> 3) & 0x03
    layer = (header[1] >> 1) & 0x03
    bitrate_idx = (header[2] >> 4) & 0x0F
    rate_idx = (header[2] >> 2) & 0x03
    padding = (header[2] >> 1) & 0x01
    if version == 1 or layer == 0 or bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    sample_rate = _SAMPLE_RATES[version][rate_idx]
    if sample_rate == 0:
        return None
    bitrate = (_BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3)[bitrate_idx]
    if bitrate == 0:
        return None
    if layer == 3:  # Layer I
        return (12 * bitrate * 1000 // sample_rate + padding) * 4
    slot = 144 if version == 3 else 72
    return slot * bitrate * 1000 // sample_rate + padding


def carve_mp3(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """Optional ID3v2 + frame walk + optional trailing ID3v1
    (reference src/carve/mp3.rs:79-330)."""
    header = reader.read_at(offset, 10)
    if len(header) < 4:
        return None
    limit = max_size if max_size > 0 else 500 * 1024 * 1024
    started_with_id3 = False
    total = 0
    frames = 0
    truncated = False
    errors: list[str] = []

    if header[:3] == b"ID3" and len(header) >= 10:
        tag_size = (
            ((header[6] & 0x7F) << 21)
            | ((header[7] & 0x7F) << 14)
            | ((header[8] & 0x7F) << 7)
            | (header[9] & 0x7F)
        )
        total = 10 + tag_size
        started_with_id3 = True
        if offset + total > reader.length():
            return CarveOutcome(
                end=reader.length(), validated=True, truncated=True, errors=["eof in id3v2 tag"]
            )
    else:
        first = _mp3_frame_size(header[:4])
        if first is None:
            return None
        total = first
        frames = 1

    while frames < _MAX_FRAMES and total < limit:
        fh = reader.read_exact(offset + total, 4)
        if fh is None:
            break
        if fh[:3] == b"TAG":
            total += 128
            break
        size = _mp3_frame_size(fh)
        if size is None:
            break
        total += size
        frames += 1

    validated = started_with_id3 or frames >= _MIN_SYNC_FRAMES
    if not validated:
        return None
    if total >= limit and max_size > 0:
        truncated = True
        errors.append("max_size reached")
        total = limit
    return CarveOutcome(end=offset + total, validated=True, truncated=truncated, errors=errors)


def carve_ogg(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """Walk OggS pages via lacing table to the EOS page
    (reference src/carve/ogg.rs)."""
    pos = offset
    pages = 0
    limit = offset + max_size if max_size > 0 else None
    while True:
        header = reader.read_exact(pos, 27)
        if header is None:
            if pos == offset:
                return None
            return CarveOutcome(
                end=reader.length(), validated=False, truncated=True, errors=["eof in ogg page"]
            )
        if header[:4] != b"OggS" or header[4] != 0:
            return None if pos == offset else CarveOutcome(end=pos, validated=False)
        header_type = header[5]
        n_segments = header[26]
        lacing = reader.read_exact(pos + 27, n_segments)
        if lacing is None:
            return CarveOutcome(
                end=reader.length(), validated=False, truncated=True, errors=["eof in ogg lacing"]
            )
        page_size = 27 + n_segments + sum(lacing)
        pos += page_size
        pages += 1
        if limit is not None and pos - offset > max_size:
            return CarveOutcome(
                end=limit, validated=False, truncated=True, errors=["max_size reached in ogg"]
            )
        if header_type & 0x04:
            return CarveOutcome(end=pos, validated=True)
        if pages > 1_000_000:
            return None


# --- EBML / webm -----------------------------------------------------------


def _vint_len(first_byte: int) -> int:
    for i in range(8):
        if first_byte & (0x80 >> i):
            return i + 1
    return 0


def _read_vint_id(reader: Reader, pos: int) -> tuple[int, int] | None:
    b = reader.read_exact(pos, 1)
    if b is None:
        return None
    n = _vint_len(b[0])
    if n == 0 or n > 8:
        return None
    raw = reader.read_exact(pos, n)
    if raw is None:
        return None
    return int.from_bytes(raw, "big"), n


def _read_vint_size(reader: Reader, pos: int) -> tuple[int, int, bool] | None:
    b = reader.read_exact(pos, 1)
    if b is None:
        return None
    n = _vint_len(b[0])
    if n == 0 or n > 8:
        return None
    raw = reader.read_exact(pos, n)
    if raw is None:
        return None
    value = (raw[0] & (0xFF >> n)) if n < 8 else 0
    for byte in raw[1:]:
        value = (value << 8) | byte
    unknown = value == (1 << (7 * n)) - 1
    return value, n, unknown


def carve_webm(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """EBML header (DocType webm/matroska) + Segment declared size
    (reference src/carve/webm.rs:41-160)."""
    ebml = _read_vint_id(reader, offset)
    if ebml is None or ebml[0] != 0x1A45DFA3:
        return None
    sz = _read_vint_size(reader, offset + ebml[1])
    if sz is None:
        return None
    head_size, head_len, _ = sz
    body_start = offset + ebml[1] + head_len
    body = reader.read_exact(body_start, head_size)
    if body is None:
        return None
    # find DocType (id 0x4282) inside the EBML header body
    doc_type = None
    idx = 0
    while idx < len(body):
        n = _vint_len(body[idx])
        if n == 0 or idx + n > len(body):
            break
        elem_id = int.from_bytes(body[idx : idx + n], "big")
        idx += n
        if idx >= len(body):
            break
        m = _vint_len(body[idx])
        if m == 0 or idx + m > len(body):
            break
        raw = body[idx : idx + m]
        size = raw[0] & (0xFF >> m) if m < 8 else 0
        for byte in raw[1:]:
            size = (size << 8) | byte
        idx += m
        if idx + size > len(body):
            break
        if elem_id == 0x4282:
            doc_type = body[idx : idx + size].decode("ascii", "ignore")
        idx += size
    if doc_type not in ("webm", "matroska"):
        return None

    # scan (bounded 1 MiB) for the Segment element
    pos = body_start + head_size
    scan_limit = pos + 1024 * 1024
    segment = None
    while pos < scan_limit:
        elem = _read_vint_id(reader, pos)
        if elem is None:
            break
        size_info = _read_vint_size(reader, pos + elem[1])
        if size_info is None:
            break
        size, size_len, unknown = size_info
        payload = pos + elem[1] + size_len
        if elem[0] == 0x18538067:
            segment = (payload, size, unknown)
            break
        pos = payload + size
    if segment is None:
        return None
    payload, size, unknown = segment
    truncated = False
    errors: list[str] = []
    if unknown:
        end = offset + max_size if max_size > 0 else reader.length()
        truncated = True
        errors.append("segment with unknown size")
    else:
        end = payload + size
    out = CarveOutcome(end=end, validated=not unknown, truncated=truncated, errors=errors)
    if max_size > 0 and end - offset >= max_size:
        out.end = offset + max_size
        out.truncated = True
        if "max_size reached" not in out.errors:
            out.errors.append("max_size reached")
    return out


_ASF_HEADER_GUID = bytes.fromhex("3026B2758E66CF11A6D900AA0062CE6C")
_ASF_FILE_PROP_GUID = bytes.fromhex("A1DCAB8C47A9CF118EE400C00C205365")


def carve_wmv(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """ASF header objects -> File Properties declared size
    (reference src/carve/wmv.rs:46-120)."""
    head = reader.read_exact(offset, 30)
    if head is None or head[:16] != _ASF_HEADER_GUID:
        return None
    header_size = struct.unpack_from("<Q", head, 16)[0]
    header_end = offset + header_size
    pos = offset + 30
    file_size = None
    while pos + 24 <= header_end:
        obj = reader.read_exact(pos, 24)
        if obj is None:
            return None
        obj_size = struct.unpack_from("<Q", obj, 16)[0]
        if obj_size < 24:
            break
        if obj[:16] == _ASF_FILE_PROP_GUID:
            body = reader.read_exact(pos + 24, 24)
            if body is not None:
                file_size = struct.unpack_from("<Q", body, 16)[0]
            break
        pos += obj_size
    if file_size is None or file_size < header_size:
        return None
    out = CarveOutcome(end=offset + file_size, validated=True)
    if max_size > 0 and file_size > max_size:
        out.end = offset + max_size
        out.truncated = True
        out.errors.append("max_size reached before asf end")
    return out
