"""Image-format carve handlers: jpeg, png, gif, bmp, tiff, ico.

Semantics parity with reference src/carve/{jpeg,png,gif,bmp,tiff,ico}.rs
(structure-walk end detection, validation gates, truncation flags).
"""

from __future__ import annotations

import struct

from swiftbeaver_spark.carvers.base import IO_BUF, CarveOutcome, Reader, scan_forward


def carve_jpeg(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """Scan for the EOI marker FF D9 (reference src/carve/jpeg.rs:34-141)."""
    max_end = offset + max_size if max_size > 0 else reader.length()
    pos = scan_forward(reader, offset, b"\xff\xd9", max_end)
    if pos is not None:
        return CarveOutcome(end=pos + 2, validated=True)
    if max_size > 0 and reader.length() >= max_end:
        return CarveOutcome(end=max_end, truncated=True, errors=["max_size reached before EOI"])
    return CarveOutcome(end=reader.length(), truncated=True, errors=["eof before EOI"])


_PNG_SIG = b"\x89PNG\r\n\x1a\x0a"


def carve_png(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """Walk length-prefixed chunks to IEND (reference src/carve/png.rs:35-125)."""
    sig = reader.read_exact(offset, 8)
    if sig != _PNG_SIG:
        return None
    pos = offset + 8
    limit = offset + max_size if max_size > 0 else None

    def _trunc(reason: str) -> CarveOutcome:
        end = limit if (limit is not None and reader.length() >= limit) else reader.length()
        return CarveOutcome(end=end, truncated=True, errors=[reason])

    while True:
        hdr = reader.read_exact(pos, 8)
        if hdr is None:
            return _trunc("eof in png chunk header")
        (length,) = struct.unpack(">I", hdr[:4])
        ctype = hdr[4:8]
        if not all(65 <= b <= 90 or 97 <= b <= 122 for b in ctype):
            return None  # invalid chunk type -> reject hit
        if max_size > 0 and length > max_size:
            return None
        new_pos = pos + 8 + length + 4  # data + crc
        if limit is not None and new_pos - offset > max_size:
            return _trunc("max_size reached before IEND")
        if new_pos > reader.length():
            return _trunc("eof in png chunk data")
        pos = new_pos
        if ctype == b"IEND":
            return CarveOutcome(end=pos, validated=True)


def _gif_sub_blocks(reader: Reader, pos: int, hard_end: int) -> int | None:
    """Advance past length-prefixed sub-blocks until a 0 terminator."""
    while True:
        if pos >= hard_end:
            return None
        b = reader.read_exact(pos, 1)
        if b is None:
            return None
        pos += 1
        n = b[0]
        if n == 0:
            return pos
        pos += n


def carve_gif(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """Header + LSD + color tables + block loop to 0x3B trailer
    (reference src/carve/gif.rs:36-152)."""
    head = reader.read_exact(offset, 13)
    if head is None:
        return None
    if head[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    pos = offset + 13
    packed = head[10]
    if packed & 0x80:
        pos += 3 * (1 << ((packed & 0x07) + 1))
    hard_end = offset + max_size if max_size > 0 else reader.length() + 1

    def _trunc(reason: str) -> CarveOutcome:
        end = hard_end if reader.length() >= hard_end else reader.length()
        return CarveOutcome(end=end, truncated=True, errors=[reason])

    while True:
        if pos >= hard_end:
            return _trunc("max_size reached before gif trailer")
        b = reader.read_exact(pos, 1)
        if b is None:
            return _trunc("eof before gif trailer")
        pos += 1
        block_id = b[0]
        if block_id == 0x3B:
            return CarveOutcome(end=pos, validated=True)
        if block_id == 0x21:  # extension: label + sub-blocks
            pos += 1
            nxt = _gif_sub_blocks(reader, pos, hard_end)
            if nxt is None:
                return _trunc("eof in gif extension")
            pos = nxt
        elif block_id == 0x2C:  # image descriptor
            desc = reader.read_exact(pos, 9)
            if desc is None:
                return _trunc("eof in gif image descriptor")
            pos += 9
            if desc[8] & 0x80:
                pos += 3 * (1 << ((desc[8] & 0x07) + 1))
            pos += 1  # LZW minimum code size
            nxt = _gif_sub_blocks(reader, pos, hard_end)
            if nxt is None:
                return _trunc("eof in gif image data")
            pos = nxt
        else:
            return None  # invalid block id -> reject


_VALID_DIB_SIZES = {12, 40, 52, 56, 108, 124}
_BMP_MAX_DIM = 32768


def carve_bmp(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """Declared size with deep header validation
    (reference src/carve/bmp.rs:54-192)."""
    header = reader.read_at(offset, 58)
    if len(header) < 18 or header[:2] != b"BM":
        return None
    file_size = struct.unpack_from("<I", header, 2)[0]
    pixel_offset = struct.unpack_from("<I", header, 10)[0]
    if file_size < 14 or file_size < pixel_offset:
        return None
    dib = struct.unpack_from("<I", header, 14)[0]
    if dib not in _VALID_DIB_SIZES:
        return None
    if pixel_offset < 14 + dib:
        return None
    if dib >= 40 and len(header) >= 26:
        width, height = struct.unpack_from("<ii", header, 18)
        aw, ah = abs(width), abs(height)
        if width <= 0 or aw > _BMP_MAX_DIM or ah > _BMP_MAX_DIM:
            return None
        if len(header) >= 30:
            bpp = struct.unpack_from("<H", header, 28)[0]
            if bpp not in (1, 4, 8, 16, 24, 32):
                return None
            row = ((aw * bpp + 31) // 32) * 4
            if file_size < max(0, pixel_offset + row * ah - 1024):
                return None
    out = CarveOutcome(end=offset + file_size, validated=True)
    if max_size > 0 and file_size > max_size:
        out.end = offset + max_size
        out.truncated = True
        out.errors.append("max_size reached before bmp end")
    return out


_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TIFF_SUBIFD_TAGS = (330, 34665, 34853)
_MAX_IFD_ENTRIES = 4096
_MAX_TIFF_ARRAY = 1_000_000
_MAX_TIFF_DATA = 16 * 1024 * 1024


def carve_tiff(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """BFS over the IFD chain; end = max extent of any IFD / value array /
    strip / tile (reference src/carve/tiff.rs:139-467)."""
    head = reader.read_exact(offset, 8)
    if head is None:
        return None
    if head[:4] == b"II\x2a\x00":
        endian = "<"
    elif head[:4] == b"MM\x00\x2a":
        endian = ">"
    else:
        return None
    first_ifd = struct.unpack(endian + "I", head[4:8])[0]
    if first_ifd < 8:
        return None

    def _u(fmt: str, data: bytes, off: int = 0):
        return struct.unpack_from(endian + fmt, data, off)[0]

    def _read_array(tag_type: int, count: int, value_field: bytes, max_allowed: int) -> list[int]:
        """Values of a SHORT/LONG array entry (inline or at offset)."""
        size = _TIFF_TYPE_SIZES.get(tag_type, 0) * count
        if size == 0 or count > _MAX_TIFF_ARRAY or size > _MAX_TIFF_DATA:
            return []
        fmt = "H" if tag_type == 3 else "I"
        width = 2 if tag_type == 3 else 4
        if size <= 4:
            raw = value_field[:size]
        else:
            data_off = _u("I", value_field)
            raw = reader.read_at(offset + data_off, size)
            if len(raw) < size:
                return []
        return [struct.unpack_from(endian + fmt, raw, i * width)[0] for i in range(count)]

    extent = 8
    queue = [first_ifd]
    seen: set[int] = set()
    any_valid = False
    truncated = False
    errors: list[str] = []

    while queue:
        ifd_off = queue.pop(0)
        if ifd_off in seen or len(seen) > 64:
            continue
        seen.add(ifd_off)
        raw = reader.read_exact(offset + ifd_off, 2)
        if raw is None:
            truncated = True
            errors.append("eof reading tiff ifd")
            continue
        count = _u("H", raw)
        if count == 0 or count > _MAX_IFD_ENTRIES:
            continue
        entries = reader.read_at(offset + ifd_off + 2, count * 12 + 4)
        if len(entries) < count * 12 + 4:
            truncated = True
            errors.append("eof reading tiff ifd entries")
            continue
        any_valid = True
        extent = max(extent, ifd_off + 2 + count * 12 + 4)
        strip_offsets: list[int] = []
        strip_counts: list[int] = []
        tile_offsets: list[int] = []
        tile_counts: list[int] = []
        for i in range(count):
            e = entries[i * 12 : i * 12 + 12]
            tag = _u("H", e, 0)
            tag_type = _u("H", e, 2)
            n = _u("I", e, 4)
            value_field = e[8:12]
            elem = _TIFF_TYPE_SIZES.get(tag_type)
            if elem is None or n > _MAX_TIFF_ARRAY:
                continue
            data_size = elem * n
            if data_size > 4:
                data_off = _u("I", value_field)
                if data_size <= _MAX_TIFF_DATA:
                    extent = max(extent, data_off + data_size)
            if tag in _TIFF_SUBIFD_TAGS and tag_type in (3, 4):
                for sub in _read_array(tag_type, n, value_field, _MAX_TIFF_ARRAY):
                    if sub >= 8:
                        queue.append(sub)
            elif tag == 273 and tag_type in (3, 4):
                strip_offsets = _read_array(tag_type, n, value_field, _MAX_TIFF_ARRAY)
            elif tag == 279 and tag_type in (3, 4):
                strip_counts = _read_array(tag_type, n, value_field, _MAX_TIFF_ARRAY)
            elif tag == 324 and tag_type in (3, 4):
                tile_offsets = _read_array(tag_type, n, value_field, _MAX_TIFF_ARRAY)
            elif tag == 325 and tag_type in (3, 4):
                tile_counts = _read_array(tag_type, n, value_field, _MAX_TIFF_ARRAY)
        for offs, cnts in ((strip_offsets, strip_counts), (tile_offsets, tile_counts)):
            for o, c in zip(offs, cnts):
                extent = max(extent, o + c)
        next_ifd = _u("I", entries, count * 12)
        if next_ifd >= 8:
            queue.append(next_ifd)

    if not any_valid:
        return None
    out = CarveOutcome(end=offset + extent, validated=True, truncated=truncated, errors=errors)
    if max_size > 0 and extent > max_size:
        out.end = offset + max_size
        out.truncated = True
        out.errors.append("max_size reached before tiff end")
    return out


_ICO_MAX_ENTRIES = 64
_ICO_MAX_IMAGE = 512 * 1024
_ICO_MAX_TOTAL = 4 * 1024 * 1024


def carve_ico(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """Directory-entry extents with embedded BMP/PNG validation
    (reference src/carve/ico.rs:16-30,44+)."""
    header = reader.read_exact(offset, 6)
    if header is None or header[0] != 0 or header[1] != 0:
        return None
    icon_type = struct.unpack_from("<H", header, 2)[0]
    if icon_type not in (1, 2):
        return None
    count = struct.unpack_from("<H", header, 4)[0]
    if count == 0 or count > _ICO_MAX_ENTRIES:
        return None
    dir_size = 6 + count * 16
    directory = reader.read_exact(offset + 6, count * 16)
    if directory is None:
        return None
    end = dir_size
    for i in range(count):
        size = struct.unpack_from("<I", directory, i * 16 + 8)[0]
        img_off = struct.unpack_from("<I", directory, i * 16 + 12)[0]
        if size == 0 or img_off < dir_size or size > _ICO_MAX_IMAGE:
            return None
        head = reader.read_at(offset + img_off, 8)
        if len(head) < 8:
            return None
        if head[:8] == b"\x89PNG\r\n\x1a\x0a":
            pass
        elif head[:2] == b"\x28\x00":
            width = struct.unpack_from("<i", head, 4)[0]
            if not (0 < width <= 256):
                return None
        else:
            return None
        end = max(end, img_off + size)
    if end > _ICO_MAX_TOTAL:
        return None
    out = CarveOutcome(end=offset + end, validated=True)
    if max_size > 0 and end > max_size:
        out.end = offset + max_size
        out.truncated = True
        out.errors.append("max_size reached before ico end")
    return out
