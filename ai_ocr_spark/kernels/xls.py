"""Minimal legacy .xls (OLE2 + BIFF8) reader + emitter, stdlib only.

Closes the last input-format gap vs the reference, which accepts xls
alongside xlsx/csv (reference: src/api/app/utils/file_validator.py:15-57,
dispatch src/processor/app/parsers/excel_parser.py:32-40). Same contract
as kernels.xlsx: the emitter produces the fixture subset, the parser
round-trips it and never raises on malformed input.

Scope (and the documented descope):
  * OLE2/CFB container: 512-byte sectors, header-resident DIFAT plus
    chained DIFAT sectors, regular FAT chains, AND the mini-stream path
    (miniFAT + ministream) for streams under the 4096-byte cutoff.
  * BIFF8 Workbook stream: BOF/EOF substream structure, BOUNDSHEET
    sheet names, SST/LABELSST shared strings (compressed and UTF-16
    cell text), LABEL, NUMBER, RK (both integer and double encodings,
    with the /100 flag), MERGEDCELLS and FORMULA counters.
  * The \x05SummaryInformation property-set stream: codepage-aware
    VT_LPSTR title/author and VT_FILETIME created, emitted and parsed,
    so xls carries the same S5 document-property surface as xlsx.
  * Best-effort bounds: CONTINUE-spanning SSTs degrade to the entries
    that fit (never a raise); the EMITTER caps at the 109
    header-resident DIFAT slots (~6.9 MB of stream data — the reader
    follows chained DIFAT sectors from real files regardless).

Number cells render exactly like the xlsx parser renders numeric <v>
cells built from ints: integral doubles as '5', everything else via
repr — so a workbook emitted from the same rows produces byte-identical
table text through either container.
"""

from __future__ import annotations

import struct

SECT = 512
MINISECT = 64
MINI_CUTOFF = 4096
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
OLE_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# BIFF8 record ids
_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOUNDSHEET = 0x0085
_MERGEDCELLS = 0x00E5
_FORMULA = 0x0006
_CODEPAGE = 0x0042


# ---------------------------------------------------------------------------
# OLE2 container
# ---------------------------------------------------------------------------


def _ole_wrap(
    streams: bytes | list[tuple[str, bytes]], force_mini: bool | None = None
) -> bytes:
    """Wrap one or more named streams in a minimal OLE2 compound file.

    A bare bytes argument means a single 'Workbook' stream. Streams
    under the 4096-byte cutoff go through the ministream (the spec
    requires it, and it exercises the reader's miniFAT path); larger
    streams use regular FAT chains. force_mini overrides per-file for
    tests."""
    if isinstance(streams, bytes):
        streams = [("Workbook", streams)]

    def pad(b: bytes, unit: int) -> bytes:
        rem = len(b) % unit
        return b if rem == 0 else b + b"\x00" * (unit - rem)

    def is_mini(data: bytes) -> bool:
        return len(data) < MINI_CUTOFF if force_mini is None else force_mini

    # ministream: every mini stream padded to 64-byte minisectors,
    # concatenated; minifat chains them
    ministream = b""
    minifat: list[int] = []
    mini_starts: dict[str, int] = {}
    for name, data in streams:
        if not is_mini(data):
            continue
        start = len(ministream) // MINISECT
        mini_starts[name] = start
        chunk = pad(data, MINISECT)
        n = len(chunk) // MINISECT
        ministream += chunk
        minifat += [start + i + 1 for i in range(n - 1)] + [ENDOFCHAIN]
    n_ms = (len(pad(ministream, SECT)) // SECT) if ministream else 0
    ministream = pad(ministream, SECT)
    minifat_bytes = pad(b"".join(struct.pack("<I", e) for e in minifat), SECT)
    m_f = (len(minifat_bytes) // SECT) if minifat else 0
    minifat_bytes = minifat_bytes if minifat else b""

    regular = [(name, pad(data, SECT)) for name, data in streams if not is_mini(data)]
    n_dir = (1 + len(streams) + 3) // 4  # 128-byte entries, 4 per sector

    total_data = n_dir + m_f + n_ms + sum(len(d) // SECT for _n, d in regular)
    n_fat = 1
    while n_fat * (SECT // 4) < n_fat + total_data:
        n_fat += 1
    if n_fat > 109:
        # the emitter fills only the 109 header-resident DIFAT slots
        # (the READER follows chained DIFAT sectors, the writer does
        # not emit them) — past ~6.9 MB of stream data fail loudly
        # instead of writing a corrupt header
        raise ValueError(
            "emit: streams exceed the header-resident DIFAT capacity (~6.9 MB)"
        )

    # sector layout: [FAT...] [DIR...] [MINIFAT...] [ministream...] [regular...]
    dir_sect = n_fat
    minifat_sect = dir_sect + n_dir
    ms_sect = minifat_sect + m_f
    reg_sect = ms_sect + n_ms
    fat = [FATSECT] * n_fat
    fat += [dir_sect + i + 1 for i in range(n_dir - 1)] + [ENDOFCHAIN]
    fat += [minifat_sect + i + 1 for i in range(m_f - 1)] + ([ENDOFCHAIN] if m_f else [])
    fat += [ms_sect + i + 1 for i in range(n_ms - 1)] + ([ENDOFCHAIN] if n_ms else [])
    reg_starts: dict[str, int] = {}
    cur = reg_sect
    for name, data in regular:
        n = len(data) // SECT
        reg_starts[name] = cur
        fat += [cur + i + 1 for i in range(n - 1)] + [ENDOFCHAIN]
        cur += n
    fat_bytes = b"".join(struct.pack("<I", e) for e in fat)
    fat_bytes = fat_bytes + b"\xff" * (n_fat * SECT - len(fat_bytes))

    def dirent(name: str, typ: int, start: int, size: int, child: int = FREESECT) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        return (
            raw.ljust(64, b"\x00")
            + struct.pack("<H", len(raw))
            + struct.pack("<BB", typ, 1)          # type, black
            + struct.pack("<iii", -1, -1, struct.unpack("<i", struct.pack("<I", child & 0xFFFFFFFF))[0])
            + b"\x00" * 16                         # clsid
            + b"\x00" * 4                          # state bits
            + b"\x00" * 16                         # timestamps
            + struct.pack("<I", start)
            + struct.pack("<Q", size)
        )

    root = dirent(
        "Root Entry",
        5,
        ms_sect if n_ms else ENDOFCHAIN,
        len(ministream) if n_ms else 0,
        child=1,
    )
    entries = b"".join(
        dirent(
            name,
            2,
            mini_starts[name] if name in mini_starts else reg_starts[name],
            len(data),
        )
        for name, data in streams
    )
    directory = pad(root + entries, SECT)
    directory += b"\x00" * (n_dir * SECT - len(directory))

    difat = [i for i in range(n_fat)] + [FREESECT] * (109 - n_fat)
    header = (
        OLE_MAGIC
        + b"\x00" * 16                             # clsid
        + struct.pack("<HH", 0x003E, 0x0003)        # minor, major (v3)
        + struct.pack("<H", 0xFFFE)                 # little-endian
        + struct.pack("<HH", 9, 6)                  # sector 512, mini 64
        + b"\x00" * 6
        + struct.pack("<I", 0)                      # num dir sectors (v3: 0)
        + struct.pack("<I", n_fat)
        + struct.pack("<I", dir_sect)
        + struct.pack("<I", 0)                      # transaction
        + struct.pack("<I", MINI_CUTOFF)
        + struct.pack("<I", minifat_sect if m_f else ENDOFCHAIN)
        + struct.pack("<I", m_f)
        + struct.pack("<I", ENDOFCHAIN)             # first DIFAT sector
        + struct.pack("<I", 0)                      # num DIFAT sectors
        + b"".join(struct.pack("<I", e) for e in difat)
    )
    assert len(header) == SECT
    return header + fat_bytes + directory + minifat_bytes + ministream + b"".join(d for _n, d in regular)


def _ole_stream(payload: bytes, names: tuple[str, ...] = ("Workbook", "Book")) -> bytes:
    """Extract the first stream matching `names` from an OLE2 file.
    Returns b'' on any malformation (never raises)."""
    try:
        if payload[:8] != OLE_MAGIC or len(payload) < SECT:
            return b""
        (ssz,) = struct.unpack_from("<H", payload, 30)
        sect = 1 << ssz
        if sect not in (512, 4096) or sect > len(payload):
            return b""
        (n_fat,) = struct.unpack_from("<I", payload, 44)
        (dir_start,) = struct.unpack_from("<I", payload, 48)
        (mini_cutoff,) = struct.unpack_from("<I", payload, 56)
        (minifat_start,) = struct.unpack_from("<I", payload, 60)
        (difat_start,) = struct.unpack_from("<I", payload, 68)
        (n_difat,) = struct.unpack_from("<I", payload, 72)

        def sector(i: int) -> bytes:
            off = SECT + i * sect if sect == 512 else sect + i * sect
            return payload[off : off + sect]

        # DIFAT: 109 header entries + optional chained DIFAT sectors
        difat = list(struct.unpack_from("<109I", payload, 76))
        nxt = difat_start
        for _ in range(min(n_difat, 1024)):
            if nxt in (ENDOFCHAIN, FREESECT):
                break
            blk = sector(nxt)
            entries = struct.unpack(f"<{sect // 4}I", blk)
            difat += entries[:-1]
            nxt = entries[-1]
        fat: list[int] = []
        for sid in difat[: max(n_fat, 0)]:
            if sid in (FREESECT, ENDOFCHAIN):
                continue
            fat += struct.unpack(f"<{sect // 4}I", sector(sid))

        def chain(start: int, cap: int = 1 << 20) -> bytes:
            out, cur, seen = [], start, set()
            while cur not in (ENDOFCHAIN, FREESECT) and len(seen) < cap:
                if cur in seen or cur >= len(fat):
                    break  # cycle or corrupt chain: best effort
                seen.add(cur)
                out.append(sector(cur))
                cur = fat[cur]
            return b"".join(out)

        directory = chain(dir_start)
        root_start = root_size = None
        target = None
        for off in range(0, len(directory) - 127, 128):
            ent = directory[off : off + 128]
            (nlen,) = struct.unpack_from("<H", ent, 64)
            if not 2 <= nlen <= 64:
                continue
            name = ent[: nlen - 2].decode("utf-16-le", "replace")
            typ = ent[66]
            (start,) = struct.unpack_from("<I", ent, 116)
            (size,) = struct.unpack_from("<Q", ent, 120)
            size &= 0xFFFFFFFF  # v3: only the low 4 bytes are valid
            if typ == 5:
                root_start, root_size = start, size
            elif typ == 2 and name in names and target is None:
                target = (start, size)
        if target is None:
            return b""
        start, size = target
        if size < mini_cutoff and root_start is not None:
            ministream = chain(root_start)[: root_size or None]
            minifat_raw = chain(minifat_start)
            minifat = struct.unpack(f"<{len(minifat_raw) // 4}I", minifat_raw)
            out, cur, seen = [], start, set()
            while cur not in (ENDOFCHAIN, FREESECT) and cur not in seen:
                seen.add(cur)
                out.append(ministream[cur * MINISECT : (cur + 1) * MINISECT])
                if cur >= len(minifat):
                    break
                cur = minifat[cur]
            got = b"".join(out)[:size]
            if len(got) == size:
                return got
            # spec says sub-cutoff streams live in the ministream, but a
            # lenient reader tries the regular chain before giving up
        return chain(start)[:size]
    except Exception:
        return b""


# ---------------------------------------------------------------------------
# \x05SummaryInformation property set (document props: title/author/created)
# ---------------------------------------------------------------------------

_SUMMARY_STREAM = "\x05SummaryInformation"
# FMTID_SummaryInformation {F29F85E0-4FF9-1068-AB91-08002B27B3D9}
_FMTID_SI = struct.pack(
    "<IHH8B", 0xF29F85E0, 0x4FF9, 0x1068, 0xAB, 0x91, 0x08, 0x00, 0x2B, 0x27, 0xB3, 0xD9
)
_PID_CODEPAGE, _PID_TITLE, _PID_AUTHOR, _PID_CREATED = 0x01, 0x02, 0x04, 0x0C
_VT_I2, _VT_LPSTR, _VT_FILETIME = 0x0002, 0x001E, 0x0040
_EPOCH_1601_DELTA = 11644473600  # seconds between 1601-01-01 and 1970-01-01


def _iso_to_filetime(iso: str) -> int:
    import calendar
    import time as _time

    t = _time.strptime(iso, "%Y-%m-%dT%H:%M:%SZ")
    return (calendar.timegm(t) + _EPOCH_1601_DELTA) * 10_000_000


def _filetime_to_iso(ft: int) -> str:
    import time as _time

    secs = ft // 10_000_000 - _EPOCH_1601_DELTA
    return _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime(secs))


def _emit_summary_info(title: str, author: str, created: str) -> bytes:
    """Minimal PropertySetStream holding codepage + the three props the
    S5 surface needs. Strings are VT_LPSTR in codepage 65001 (UTF-8)."""
    # codepage first (readers use it to decode the LPSTRs that follow);
    # 65001 = UTF-8, stored in VT_I2's 4-byte padded slot
    props: list[tuple[int, bytes]] = [
        (_PID_CODEPAGE, struct.pack("<Ii", _VT_I2, 65001))
    ]

    def lpstr(s: str) -> bytes:
        raw = s.encode("utf-8") + b"\x00"
        raw += b"\x00" * (-len(raw) % 4)
        return struct.pack("<II", _VT_LPSTR, len(raw)) + raw

    if title:
        props.append((_PID_TITLE, lpstr(title)))
    if author:
        props.append((_PID_AUTHOR, lpstr(author)))
    if created:
        props.append(
            (_PID_CREATED, struct.pack("<IQ", _VT_FILETIME, _iso_to_filetime(created)))
        )
    head_len = 8 + 8 * len(props)
    offs, blob = [], b""
    for _pid, val in props:
        offs.append(head_len + len(blob))
        blob += val
    section = struct.pack("<II", head_len + len(blob), len(props))
    for (pid, _val), off in zip(props, offs):
        section += struct.pack("<II", pid, off)
    section += blob
    return (
        struct.pack("<HHI", 0xFFFE, 0, 0x00020005)  # byte order, version, system
        + b"\x00" * 16                               # CLSID
        + struct.pack("<I", 1)                       # one property set
        + _FMTID_SI
        + struct.pack("<I", 48)                      # section offset
        + section
    )


def _parse_summary_info(data: bytes) -> dict:
    """PropertySetStream -> {title, author, created}; empty strings on
    any malformation (never raises)."""
    out = {"title": "", "author": "", "created": ""}
    try:
        if len(data) < 52 or data[:2] != b"\xfe\xff":
            return out
        (sec_off,) = struct.unpack_from("<I", data, 44)
        (_sec_size, n_props) = struct.unpack_from("<II", data, sec_off)
        codepage = 65001
        entries = []
        for k in range(min(n_props, 64)):
            pid, off = struct.unpack_from("<II", data, sec_off + 8 + 8 * k)
            entries.append((pid, sec_off + off))
        for pid, off in entries:
            (vt,) = struct.unpack_from("<I", data, off)
            if pid == _PID_CODEPAGE and vt == _VT_I2:
                (cp,) = struct.unpack_from("<i", data, off + 4)
                codepage = cp & 0xFFFF if cp > 0 else 65001
        # cp1252, not latin-1: 0x80-0x9F are printable in windows-1252
        # (euro, curly quotes, dashes), C1 controls in latin-1
        enc = {65001: "utf-8", 1252: "cp1252"}.get(codepage, "utf-8")
        for pid, off in entries:
            (vt,) = struct.unpack_from("<I", data, off)
            if vt == _VT_LPSTR and pid in (_PID_TITLE, _PID_AUTHOR):
                (ln,) = struct.unpack_from("<I", data, off + 4)
                raw = data[off + 8 : off + 8 + ln].split(b"\x00")[0]
                out["title" if pid == _PID_TITLE else "author"] = raw.decode(
                    enc, "replace"
                )
            elif vt == _VT_FILETIME and pid == _PID_CREATED:
                (ft,) = struct.unpack_from("<Q", data, off + 4)
                out["created"] = _filetime_to_iso(ft)
    except Exception:
        pass  # contract: never raises
    return out


# ---------------------------------------------------------------------------
# BIFF8 records
# ---------------------------------------------------------------------------


def _rec(typ: int, data: bytes) -> bytes:
    return struct.pack("<HH", typ, len(data)) + data


def _ucs(s: str, short: bool) -> bytes:
    """ShortXLUnicodeString (cch as byte) or XLUnicodeString (cch as
    word), always emitted as 16-bit chars (grbit 0x01)."""
    raw = s.encode("utf-16-le")
    # cch counts UTF-16 CODE UNITS, not Python code points — a non-BMP
    # char (emoji) is a surrogate pair = 2 units; counting code points
    # would silently truncate the last 2 bytes per astral char
    cch = min(len(raw) // 2, 255 if short else 0xFFFF)
    head = struct.pack("<BB" if short else "<HB", cch, 0x01)
    return head + raw[: 2 * cch]


def _read_ucs(data: bytes, off: int, short: bool) -> tuple[str, int]:
    """Parse an XLUnicodeString; returns (text, next offset)."""
    if short:
        cch = data[off]
        off += 1
    else:
        (cch,) = struct.unpack_from("<H", data, off)
        off += 2
    grbit = data[off]
    off += 1
    if grbit & 0x08:  # rich runs
        (cruns,) = struct.unpack_from("<H", data, off)
        off += 2
    else:
        cruns = 0
    if grbit & 0x04:  # extended (phonetic)
        (cb_ext,) = struct.unpack_from("<I", data, off)
        off += 4
    else:
        cb_ext = 0
    if grbit & 0x01:
        text = data[off : off + 2 * cch].decode("utf-16-le", "replace")
        off += 2 * cch
    else:
        text = data[off : off + cch].decode("latin-1")
        off += cch
    off += 4 * cruns + cb_ext
    return text, off


def _num_text(x: float) -> str:
    """Match the xlsx parser's rendering of numeric cells built from
    ints: integral doubles print without the trailing .0."""
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


def _rk_value(raw: int) -> float:
    if raw & 0x02:  # 30-bit signed integer
        v = raw >> 2
        if v & 0x20000000:
            v -= 0x40000000
        num = float(v)
    else:  # high 30 bits of an IEEE double
        num = struct.unpack("<d", struct.pack("<Q", (raw & 0xFFFFFFFC) << 32))[0]
    return num / 100.0 if raw & 0x01 else num


def emit_xls(
    sheets: list[tuple[str, list[list[object]]]],
    merged: dict[str, list[tuple[int, int, int, int]]] | None = None,
    title: str = "",
    author: str = "",
    created: str = "",
) -> bytes:
    """Build a minimal BIFF8 .xls: [(name, rows)] with int/float cells
    as NUMBER records and everything else through the SST. merged maps
    sheet name -> [(rw_first, rw_last, col_first, col_last)]. Non-empty
    title/author/created (ISO 'YYYY-MM-DDTHH:MM:SSZ') are written to a
    \\x05SummaryInformation property-set stream."""
    merged = merged or {}
    # SST over all string cells, dedup in first-seen order
    sst_index: dict[str, int] = {}
    for _name, rows in sheets:
        for row in rows:
            for cell in row:
                if not isinstance(cell, (int, float)) and str(cell) not in sst_index:
                    sst_index[str(cell)] = len(sst_index)
    n_refs = sum(
        1
        for _n, rows in sheets
        for row in rows
        for c in row
        if not isinstance(c, (int, float))
    )
    sst_data = struct.pack("<II", max(n_refs, len(sst_index)), len(sst_index))
    for s in sst_index:
        sst_data += _ucs(s, short=False)

    sheet_streams: list[bytes] = []
    for name, rows in sheets:
        body = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0))
        for r, row in enumerate(rows):
            for c, cell in enumerate(row):
                if isinstance(cell, (int, float)):
                    body += _rec(
                        _NUMBER, struct.pack("<HHHd", r, c, 0, float(cell))
                    )
                else:
                    body += _rec(
                        _LABELSST,
                        struct.pack("<HHHI", r, c, 0, sst_index[str(cell)]),
                    )
        if name in merged:
            refs = merged[name]
            body += _rec(
                _MERGEDCELLS,
                struct.pack("<H", len(refs))
                + b"".join(struct.pack("<HHHH", *ref) for ref in refs),
            )
        body += _rec(_EOF, b"")
        sheet_streams.append(body)

    # globals need BOUNDSHEET stream offsets -> build with placeholders,
    # then patch once the globals length is known
    def globals_block(offsets: list[int]) -> bytes:
        g = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0))
        g += _rec(_CODEPAGE, struct.pack("<H", 1200))
        g += _rec(_SST, sst_data)
        for (name, _rows), off in zip(sheets, offsets):
            g += _rec(
                _BOUNDSHEET, struct.pack("<IH", off, 0x0000) + _ucs(name, short=True)
            )
        g += _rec(_EOF, b"")
        return g

    glen = len(globals_block([0] * len(sheets)))
    offsets, pos = [], glen
    for ss in sheet_streams:
        offsets.append(pos)
        pos += len(ss)
    stream = globals_block(offsets) + b"".join(sheet_streams)
    streams: list[tuple[str, bytes]] = [("Workbook", stream)]
    if title or author or created:
        streams.append((_SUMMARY_STREAM, _emit_summary_info(title, author, created)))
    return _ole_wrap(streams)


def parse_xls(payload: bytes) -> dict:
    """xls bytes -> the parse_xlsx dict shape: {sheets: [{name, rows}],
    title, author, created, n_merged, n_formulas}. Document properties
    come from the \\x05SummaryInformation property-set stream when
    present (codepage-aware LPSTR title/author, FILETIME created).
    Best-effort, never raises."""
    out: dict = {
        "sheets": [],
        "title": "",
        "author": "",
        "created": "",
        "n_merged": 0,
        "n_formulas": 0,
    }
    try:
        stream = _ole_stream(payload)
        if not stream:
            return out
        si = _ole_stream(payload, names=(_SUMMARY_STREAM,))
        if si:
            out.update(_parse_summary_info(si))
        sst: list[str] = []
        names: list[str] = []
        grids: list[dict] = []
        grid: dict | None = None
        bof_count = 0
        i, n = 0, len(stream)
        while i + 4 <= n:
            typ, ln = struct.unpack_from("<HH", stream, i)
            i += 4
            if typ == 0:  # zero padding after the last EOF
                break
            data = stream[i : i + ln]
            i += ln
            if len(data) < ln:
                break  # truncated record: best effort
            try:
                if typ == _BOF:
                    # first BOF opens the workbook globals; every later
                    # BOF starts a sheet substream
                    bof_count += 1
                    if bof_count > 1:
                        grid = {}
                elif typ == _EOF:
                    if grid is not None:
                        grids.append(grid)
                        grid = None
                elif typ == _SST:
                    off = 8
                    (_total, n_unique) = struct.unpack_from("<II", data, 0)
                    for _ in range(min(n_unique, 1 << 20)):
                        if off >= len(data):
                            break  # CONTINUE-spanning SST: keep what fits
                        s, off = _read_ucs(data, off, short=False)
                        sst.append(s)
                elif typ == _BOUNDSHEET:
                    s, _ = _read_ucs(data, 6, short=True)
                    names.append(s)
                elif grid is not None and typ == _LABELSST:
                    r, c, _xf, idx = struct.unpack_from("<HHHI", data, 0)
                    grid[(r, c)] = sst[idx] if idx < len(sst) else ""
                elif grid is not None and typ == _LABEL:
                    r, c, _xf = struct.unpack_from("<HHH", data, 0)
                    s, _ = _read_ucs(data, 6, short=False)
                    grid[(r, c)] = s
                elif grid is not None and typ == _NUMBER:
                    r, c, _xf, num = struct.unpack_from("<HHHd", data, 0)
                    grid[(r, c)] = _num_text(num)
                elif grid is not None and typ == _RK:
                    r, c, _xf, raw = struct.unpack_from("<HHHI", data, 0)
                    grid[(r, c)] = _num_text(_rk_value(raw))
                elif grid is not None and typ == _MULRK:
                    r, c0 = struct.unpack_from("<HH", data, 0)
                    n_cells = (len(data) - 6) // 6
                    for j in range(n_cells):
                        (raw,) = struct.unpack_from("<I", data, 4 + 6 * j + 2)
                        grid[(r, c0 + j)] = _num_text(_rk_value(raw))
                elif typ == _MERGEDCELLS:
                    (cmcs,) = struct.unpack_from("<H", data, 0)
                    out["n_merged"] += cmcs
                elif typ == _FORMULA:
                    out["n_formulas"] += 1
            except (struct.error, IndexError):
                continue  # malformed record body: skip, keep scanning
        if grid is not None:  # EOF missing: flush what we have
            grids.append(grid)
        for k, g in enumerate(grids):
            rows: list[list[str]] = []
            if g:
                # bucket cells per row once (a per-row scan over the
                # whole grid would be O(rows x cells))
                by_row: dict[int, dict[int, str]] = {}
                for (r, c), v in g.items():
                    by_row.setdefault(r, {})[c] = v
                for r in range(max(by_row) + 1):
                    cols = by_row.get(r)
                    rows.append(
                        [cols.get(c, "") for c in range(max(cols) + 1)]
                        if cols
                        else []
                    )
            out["sheets"].append(
                {"name": names[k] if k < len(names) else f"Sheet{k + 1}", "rows": rows}
            )
    except Exception:
        pass  # contract: never raises; return best-effort state
    return out
