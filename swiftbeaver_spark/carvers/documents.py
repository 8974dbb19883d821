"""Document/database/binary carve handlers: pdf, rtf, ole (+doc/xls/ppt),
eml, fb2, lrf, mobi, sqlite, elf, generic footer.

Parity: reference src/carve/{pdf,rtf,ole,eml,fb2,lrf,mobi,sqlite,elf,footer}.rs.
"""

from __future__ import annotations

import struct

from swiftbeaver_spark.carvers.base import IO_BUF, CarveOutcome, Reader, scan_forward


def carve_pdf(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """Stream to the first %%EOF, then absorb one trailing newline
    (\\n or \\r or \\r\\n). Reference: src/carve/pdf.rs:37-201."""
    head = reader.read_exact(offset, 5)
    if head != b"%PDF-":
        return None
    max_end = offset + max_size if max_size > 0 else reader.length()
    pos = scan_forward(reader, offset, b"%%EOF", max_end)
    if pos is None:
        if max_end < reader.length():
            return CarveOutcome(
                end=max_end, truncated=True, errors=["max_size reached before EOF"]
            )
        return CarveOutcome(end=reader.length(), truncated=True, errors=["eof before %%EOF"])
    end = pos + 5
    nxt = reader.read_at(end, 1)
    if nxt == b"\n":
        end += 1
    elif nxt == b"\r":
        end += 1
        if reader.read_at(end, 1) == b"\n":
            end += 1
    return CarveOutcome(end=end, validated=True)


def carve_rtf(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """Brace-depth counter with \\ escapes and \\binN raw-byte skips
    (reference src/carve/rtf.rs)."""
    head = reader.read_exact(offset, 5)
    if head != b"{\\rtf":
        return None
    limit = offset + max_size if max_size > 0 else reader.length()
    depth = 1
    pos = offset + 5
    escape = False
    control = bytearray()
    reading_bin_len = False
    bin_len = 0
    while pos < limit:
        buf = reader.read_at(pos, min(IO_BUF, limit - pos))
        if not buf:
            return CarveOutcome(
                end=reader.length(), truncated=True, errors=["eof before rtf end"]
            )
        i = 0
        n = len(buf)
        while i < n:
            if bin_len > 0:
                skip = min(bin_len, n - i)
                bin_len -= skip
                i += skip
                continue
            byte = buf[i]
            if escape:
                # control word like \bin123 ; single-char escapes \{ \} \\
                if byte in (0x7B, 0x7D, 0x5C) and not control:
                    escape = False
                elif 0x61 <= byte <= 0x7A or 0x41 <= byte <= 0x5A:
                    control.append(byte)
                elif bytes(control) == b"bin" and 0x30 <= byte <= 0x39:
                    reading_bin_len = True
                    bin_len = bin_len * 10 + (byte - 0x30)
                else:
                    if reading_bin_len:
                        reading_bin_len = False
                        # bin_len raw bytes follow; the delimiter byte is
                        # re-processed with bin_len active and so counts
                        # into the skip — exactly the reference's
                        # pending-byte semantics (rtf.rs:98-104), kept
                        # for parity even though the RTF spec consumes
                        # the delimiter separately
                    escape = False
                    control.clear()
                    continue  # re-process this byte outside escape mode
                i += 1
                continue
            if byte == 0x5C:  # backslash
                escape = True
                control.clear()
                reading_bin_len = False
                i += 1
                continue
            if byte == 0x7B:
                depth += 1
            elif byte == 0x7D:
                depth -= 1
                if depth <= 0:
                    return CarveOutcome(end=pos + i + 1, validated=True)
            i += 1
        pos += n
    return CarveOutcome(
        end=limit, truncated=True, errors=["max_size reached before rtf end"]
    )


# --- OLE / CFB --------------------------------------------------------------

_OLE_SIG = bytes.fromhex("D0CF11E0A1B11AE1")
_OLE_FREE = 0xFFFFFFFF
_OLE_SPECIAL = 0xFFFFFFFA


def _ole_fat_sectors(header: bytes) -> list[int]:
    out = []
    for i in range(109):
        sid = struct.unpack_from("<I", header, 76 + i * 4)[0]
        if sid < _OLE_SPECIAL:
            out.append(sid)
        else:
            break
    return out


def _ole_read_fat(reader: Reader, base: int, header: bytes, sector_size: int, max_size: int) -> list[int]:
    entries: list[int] = []
    for sid in _ole_fat_sectors(header):
        file_off = 512 + sid * sector_size
        if file_off + sector_size > max_size:
            break
        buf = reader.read_exact(base + file_off, sector_size)
        if buf is None:
            break
        entries.extend(struct.unpack_from(f"<{sector_size // 4}I", buf))
    return entries


def _ole_classify(
    reader: Reader, base: int, header: bytes, sector_size: int, max_size: int
) -> str | None:
    """Directory-chain walk for WordDocument/Workbook/PowerPoint streams
    (reference src/carve/ole.rs:300-369)."""
    first_dir = struct.unpack_from("<I", header, 48)[0]
    if first_dir >= _OLE_SPECIAL:
        return None
    fat = _ole_read_fat(reader, base, header, sector_size, max_size)
    if not fat:
        return None
    current = first_dir
    visited = 0
    found = {"doc": False, "xls": False, "ppt": False}
    while current < _OLE_SPECIAL and visited < 1024:
        off = base + 512 + current * sector_size
        buf = reader.read_exact(off, sector_size)
        if buf is None:
            break
        for e in range(0, sector_size, 128):
            entry = buf[e : e + 128]
            if len(entry) < 128:
                continue
            name_len = struct.unpack_from("<H", entry, 64)[0]
            if name_len < 2 or name_len > 64 or entry[66] != 2:
                continue
            name = entry[: name_len - 2].decode("utf-16-le", "ignore")
            if name == "WordDocument":
                found["doc"] = True
            elif name in ("Workbook", "Book"):
                found["xls"] = True
            elif name == "PowerPoint Document":
                found["ppt"] = True
        nxt = fat[current] if current < len(fat) else 0xFFFFFFFE
        if nxt >= _OLE_SPECIAL:
            break
        current = nxt
        visited += 1
    for kind in ("doc", "xls", "ppt"):
        if found[kind]:
            return kind
    return None


def carve_ole(
    reader: Reader,
    offset: int,
    max_size: int,
    ole_allowed_kinds: tuple[str, ...] | None = None,
    **_,
) -> CarveOutcome | None:
    """CFB size from FAT high-water mark + directory-based classification
    (reference src/carve/ole.rs:74-298)."""
    header = reader.read_exact(offset, 512)
    if header is None or header[:8] != _OLE_SIG:
        return None
    major = struct.unpack_from("<H", header, 26)[0]
    sector_power = struct.unpack_from("<H", header, 30)[0]
    if major == 3:
        if sector_power != 9:
            return None
        sector_size = 512
    elif major == 4:
        if sector_power != 12:
            return None
        sector_size = 4096
    else:
        return None

    effective_max = max_size if max_size > 0 else 512 * 1024 * 1024
    fat_sectors = _ole_fat_sectors(header)
    if not fat_sectors:
        return CarveOutcome(end=offset + 512 + sector_size, validated=False)
    highest = max(fat_sectors)
    first_dir = struct.unpack_from("<I", header, 48)[0]
    if first_dir < _OLE_SPECIAL:
        highest = max(highest, first_dir)
    entries_per = sector_size // 4
    for fat_index, sid in enumerate(fat_sectors):
        file_off = 512 + sid * sector_size
        if file_off + sector_size > effective_max:
            break
        buf = reader.read_exact(offset + file_off, sector_size)
        if buf is None:
            break
        base_id = fat_index * entries_per
        for idx, entry in enumerate(struct.unpack_from(f"<{entries_per}I", buf)):
            if entry != _OLE_FREE:
                sector_index = base_id + idx
                if sector_index < _OLE_SPECIAL:
                    highest = max(highest, sector_index)
                if entry < _OLE_SPECIAL:
                    highest = max(highest, entry)
    total = min(512 + (highest + 1) * sector_size, effective_max)
    kind = _ole_classify(reader, offset, header, sector_size, effective_max)
    out = CarveOutcome(end=offset + total, validated=True)
    if kind is not None:
        out.file_type = kind
        out.extension = kind
    final_type = out.file_type or "ole"
    if ole_allowed_kinds is not None and final_type not in ole_allowed_kinds:
        return None
    return out


# --- EML --------------------------------------------------------------------

_EML_MARKERS = (b"From:", b"To:", b"Subject:", b"Date:", b"Message-ID:", b"MIME-Version:")
_EML_TEMPLATES = (b"%s", b"%d", b"{}", b"<%s>", b"${")


def carve_eml(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """RFC-822 header-marker validation, end at mbox boundary `\\nFrom `
    (reference src/carve/eml.rs:16-160)."""
    head = reader.read_at(offset, 2048)
    if not head:
        return None
    if sum(1 for m in _EML_MARKERS if m in head) < 2:
        return None
    if any(t in head for t in _EML_TEMPLATES):
        return None
    if b"@" not in head or b"\n" not in head:
        return None
    max_end = offset + max_size if max_size > 0 else reader.length()
    pos = scan_forward(reader, offset, b"\nFrom ", max_end, search_after=offset + 1)
    if pos is not None:
        return CarveOutcome(end=pos, validated=True)
    if max_end >= reader.length():
        return CarveOutcome(end=reader.length(), validated=True)
    return CarveOutcome(
        end=max_end, validated=True, truncated=True, errors=["max_size reached before mbox boundary"]
    )


def carve_fb2(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """<?xml + FictionBook marker in first 4 KiB; end at </FictionBook>
    case-insensitive (reference src/carve/fb2.rs)."""
    preview = reader.read_at(offset, 4096)
    if len(preview) < 5 or preview[:5] != b"<?xml":
        return None
    if b"fictionbook" not in preview.lower():
        return None
    tag = b"</fictionbook>"
    max_end = offset + max_size if max_size > 0 else reader.length()
    # case-insensitive scan: buffered lowercase search
    overlap = len(tag) - 1
    pos = offset
    prev_tail = b""
    found = None
    while pos < max_end and found is None:
        buf = reader.read_at(pos, min(IO_BUF, max_end - pos))
        if not buf:
            break
        hay = (prev_tail + buf).lower()
        base = pos - len(prev_tail)
        idx = hay.find(tag)
        if idx != -1:
            found = base + idx
            break
        pos += len(buf)
        prev_tail = buf[-overlap:]
    if found is not None:
        return CarveOutcome(end=found + len(tag), validated=True)
    if max_end < reader.length():
        return CarveOutcome(
            end=max_end, truncated=True, errors=["max_size reached before fb2 end"]
        )
    return CarveOutcome(end=reader.length(), truncated=True, errors=["eof before fb2 end"])


def carve_lrf(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """LRF\\0 magic; heuristic u32 size field at offset 8, fallback max_size
    (reference src/carve/lrf.rs)."""
    header = reader.read_exact(offset, 12)
    if header is None or header[:4] != b"LRF\x00":
        return None
    declared = struct.unpack_from("<I", header, 8)[0]
    size = declared if declared > 0 else 0
    if max_size > 0 and (size == 0 or size > max_size):
        size = max_size
    if size == 0:
        size = 1024
    return CarveOutcome(end=offset + size, validated=True)


_PDB_HEADER_LEN = 78
_MOBI_OFFSET = 60


def carve_mobi(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """BOOKMOBI PDB: size from record offsets, last record sized by the
    previous record's stride (reference src/carve/mobi.rs)."""
    if offset < _MOBI_OFFSET:
        return None
    start = offset - _MOBI_OFFSET
    header = reader.read_exact(start, _PDB_HEADER_LEN)
    if header is None or header[60:68] != b"BOOKMOBI":
        return None
    record_count = struct.unpack_from(">H", header, 76)[0]
    if record_count == 0 or record_count > 4096:
        return None
    record_list = reader.read_exact(start + _PDB_HEADER_LEN, record_count * 8)
    if record_list is None:
        return None
    offsets = sorted(
        struct.unpack_from(">I", record_list, i * 8)[0] for i in range(record_count)
    )
    if offsets[0] < _PDB_HEADER_LEN + record_count * 8:
        return None
    last = offsets[-1]
    est_last = max(last - offsets[-2], 1) if len(offsets) >= 2 else 4096
    total = last + est_last
    if max_size > 0:
        total = min(total, max_size)
    return CarveOutcome(end=start + total, validated=True, start_override=start)


_SQLITE_HEADER = b"SQLite format 3\x00"


def carve_sqlite(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """page_size x page_count from the 100-byte header
    (reference src/carve/sqlite.rs:35-151)."""
    header = reader.read_exact(offset, 100)
    if header is None or header[:16] != _SQLITE_HEADER:
        return None
    raw = struct.unpack_from(">H", header, 16)[0]
    page_size = 65536 if raw == 1 else raw
    if page_size < 512 or page_size > 65536 or page_size & (page_size - 1):
        return None
    page_count = struct.unpack_from(">I", header, 28)[0]
    total = page_size if page_count == 0 else page_size * page_count
    if total < 100:
        return None
    out = CarveOutcome(end=offset + total, validated=True)
    if max_size > 0 and total >= max_size:
        out.end = offset + max_size
        out.truncated = True
        out.errors.append("max_size reached")
    return out


def carve_elf(reader: Reader, offset: int, max_size: int, **_) -> CarveOutcome | None:
    """End = max extent of program/section header tables, 32/64-bit, both
    endians (reference src/carve/elf.rs:60-83)."""
    header = reader.read_exact(offset, 64)
    if header is None or header[:4] != b"\x7fELF":
        return None
    ei_class, ei_data = header[4], header[5]
    if ei_class not in (1, 2) or ei_data not in (1, 2):
        return None
    endian = "<" if ei_data == 1 else ">"

    def _u(fmt: str, off: int) -> int:
        return struct.unpack_from(endian + fmt, header, off)[0]

    if ei_class == 1:
        e_phoff, e_shoff = _u("I", 28), _u("I", 32)
        e_phentsize, e_phnum = _u("H", 42), _u("H", 44)
        e_shentsize, e_shnum = _u("H", 46), _u("H", 48)
    else:
        e_phoff, e_shoff = _u("Q", 32), _u("Q", 40)
        e_phentsize, e_phnum = _u("H", 54), _u("H", 56)
        e_shentsize, e_shnum = _u("H", 58), _u("H", 60)
    size = 0
    if e_phoff > 0 and e_phentsize > 0 and e_phnum > 0:
        size = max(size, e_phoff + e_phentsize * e_phnum)
    if e_shoff > 0 and e_shentsize > 0 and e_shnum > 0:
        size = max(size, e_shoff + e_shentsize * e_shnum)
    if size == 0:
        return None
    out = CarveOutcome(end=offset + size, validated=True)
    if max_size > 0 and size > max_size:
        out.end = offset + max_size
        out.truncated = True
        out.errors.append("max_size reached before elf end")
    return out


def carve_footer(
    reader: Reader,
    offset: int,
    max_size: int,
    header_patterns: tuple[bytes, ...] = (),
    footer_patterns: tuple[bytes, ...] = (),
    **_,
) -> CarveOutcome | None:
    """Generic configurable header/footer carve: end at the earliest footer
    match (reference src/carve/footer.rs:59-217)."""
    if header_patterns:
        head = reader.read_at(offset, max(len(p) for p in header_patterns))
        if not any(head.startswith(p) for p in header_patterns if p):
            return None
    max_end = offset + max_size if max_size > 0 else reader.length()
    best = None
    for pat in footer_patterns:
        if not pat:
            continue
        pos = scan_forward(reader, offset, pat, max_end)
        if pos is not None and (best is None or pos < best[0]):
            best = (pos, len(pat))
    if best is not None:
        return CarveOutcome(end=best[0] + best[1], validated=True)
    if max_end < reader.length():
        return CarveOutcome(
            end=max_end, truncated=True, errors=["max_size reached before footer"]
        )
    return CarveOutcome(end=reader.length(), truncated=True, errors=["eof before footer"])
