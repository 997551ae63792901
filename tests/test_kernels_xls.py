"""Legacy .xls kernel: OLE2 container + BIFF8 records (VERDICT r2
next-round #4)."""

import struct

from ai_ocr_spark.kernels.xls import (
    OLE_MAGIC,
    _ole_stream,
    _ole_wrap,
    _rec,
    _rk_value,
    emit_xls,
    parse_xls,
)


def _wb():
    return emit_xls(
        [
            ("Items", [["sku", "qty", "price"], ["PRD-1", 5, 120], ["PRD-2", 3, 77]]),
            ("Summary", [["metric", "value", "rank"], ["total", 831, 1]]),
        ],
        merged={"Summary": [(0, 0, 0, 2)]},
        title="Workbook T",
        author="clerk-3",
        created="2025-03-01T00:00:00Z",
    )


def test_emit_parse_roundtrip():
    wb = parse_xls(_wb())
    assert [s["name"] for s in wb["sheets"]] == ["Items", "Summary"]
    assert wb["sheets"][0]["rows"] == [
        ["sku", "qty", "price"],
        ["PRD-1", "5", "120"],
        ["PRD-2", "3", "77"],
    ]
    assert wb["sheets"][1]["rows"][1] == ["total", "831", "1"]
    assert wb["n_merged"] == 1 and wb["n_formulas"] == 0
    # props round-trip through the SummaryInformation property set
    assert (wb["title"], wb["author"], wb["created"]) == (
        "Workbook T",
        "clerk-3",
        "2025-03-01T00:00:00Z",
    )


def test_props_absent_when_not_emitted():
    wb = parse_xls(emit_xls([("S", [["a", 1]])]))
    assert (wb["title"], wb["author"], wb["created"]) == ("", "", "")
    assert wb["sheets"][0]["rows"] == [["a", "1"]]


def test_props_unicode_and_filetime_roundtrip():
    wb = parse_xls(
        emit_xls(
            [("S", [["a"]])],
            title="売上レポート",
            author="担当者",
            created="1999-12-31T23:59:59Z",
        )
    )
    assert wb["title"] == "売上レポート"
    assert wb["author"] == "担当者"
    assert wb["created"] == "1999-12-31T23:59:59Z"


def test_ole_wrap_mini_and_regular_streams():
    small = b"HELLO BIFF" * 30          # < 4096: ministream layout
    big = b"0123456789abcdef" * 400     # >= 4096: regular FAT chains
    assert _ole_stream(_ole_wrap(small, force_mini=True)) == small
    assert _ole_stream(_ole_wrap(big, force_mini=False)) == big
    # spec-violating small regular stream still read (lenient fallback)
    assert _ole_stream(_ole_wrap(small, force_mini=False)) == small


def test_malformed_never_raises():
    good = _wb()
    for junk in (
        b"",
        b"\xd0\xcf\x11\xe0",                  # magic prefix only
        OLE_MAGIC + b"\x00" * 100,            # truncated header
        good[:300],                           # truncated mid-directory
        good[:-50],                           # truncated stream tail
        good[:512] + b"\xff" * (len(good) - 512),  # FAT garbage
        b"PK\x03\x04not-ole",
    ):
        out = parse_xls(junk)
        assert isinstance(out, dict) and isinstance(out["sheets"], list)


def test_rk_encodings():
    # integer RK: value << 2 | fInt
    assert _rk_value((42 << 2) | 0x02) == 42.0
    assert _rk_value(((-7 & 0x3FFFFFFF) << 2 | 0x02) & 0xFFFFFFFF) == -7.0
    # double RK: top 30 bits of an IEEE double
    (bits,) = struct.unpack("<Q", struct.pack("<d", 2.5))
    assert _rk_value((bits >> 32) & 0xFFFFFFFC) == 2.5
    # /100 flag
    assert _rk_value((1234 << 2) | 0x02 | 0x01) == 12.34


def test_rk_mulrk_and_label_records_via_handcrafted_stream():
    """The emitter writes NUMBER/LABELSST only; RK, MULRK and inline
    LABEL come from real Excel writers, so cover them with a
    hand-built stream."""
    bof = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
    sheet_bof = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    bs = _rec(0x0085, struct.pack("<IH", 0, 0) + bytes([1, 1]) + "S".encode("utf-16-le"))
    eof = _rec(0x000A, b"")
    rk = _rec(0x027E, struct.pack("<HHHI", 0, 0, 0, (9 << 2) | 0x02))
    mulrk = _rec(
        0x00BD,
        struct.pack("<HH", 1, 0)
        + struct.pack("<HI", 0, (7 << 2) | 0x02)
        + struct.pack("<HI", 0, (8 << 2) | 0x02)
        + struct.pack("<H", 1),
    )
    label = _rec(
        0x0204,
        struct.pack("<HHH", 2, 0, 0)
        + struct.pack("<HB", 2, 0x00)  # compressed 8-bit chars
        + b"hi",
    )
    stream = bof + bs + eof + sheet_bof + rk + mulrk + label + eof
    wb = parse_xls(_ole_wrap(stream))
    assert wb["sheets"][0]["name"] == "S"
    assert wb["sheets"][0]["rows"] == [["9"], ["7", "8"], ["hi"]]


def test_unicode_sheet_and_cells():
    wb = parse_xls(emit_xls([("資料", [["名前", "値"], ["あ", 1]])]))
    assert wb["sheets"][0]["name"] == "資料"
    assert wb["sheets"][0]["rows"] == [["名前", "値"], ["あ", "1"]]


def test_non_bmp_chars_roundtrip():
    """BIFF8 cch counts UTF-16 code units, not code points — an emoji
    (surrogate pair) must not truncate the string tail."""
    wb = parse_xls(emit_xls([("Sh😀eet", [["emoji 😀 end", 1]])],
                            title="T 😀 tail"))
    assert wb["sheets"][0]["name"] == "Sh😀eet"
    assert wb["sheets"][0]["rows"] == [["emoji 😀 end", "1"]]
    assert wb["title"] == "T 😀 tail"


def test_oversized_emitter_raises_cleanly():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="DIFAT"):
        _ole_wrap(b"x" * (8 * 1024 * 1024))


def test_ole_but_not_spreadsheet_degrades_to_binary():
    """A .doc/.ppt-style compound file (OLE magic, SummaryInformation,
    no Workbook stream) must NOT fabricate 'Sheets: 0' workbook
    metadata — it extracts as opaque binary."""
    from ai_ocr_spark.kernels.oracle import extract_one
    from ai_ocr_spark.kernels.xls import _emit_summary_info

    doc_like = _ole_wrap(
        [
            ("WordDocument", b"\x00" * 600),
            ("\x05SummaryInformation",
             _emit_summary_info("A Word Doc", "author", "")),
        ]
    )
    res = extract_one("https://x.example.com/file.doc", doc_like)
    assert res["content_kind"] == "binary"
    assert res["main_text"] == "" and res["fields"] == []


def test_extract_one_routes_xls():
    from ai_ocr_spark.kernels.oracle import extract_one

    res = extract_one("https://x.example.com/wb.xls", _wb())
    assert res["content_kind"] == "xls"
    assert res["main_text"].startswith("Workbook\nTitle: Workbook T\n")
    by_name = {f["name"]: f for f in res["fields"]}
    assert by_name["title"]["value"] == "Workbook T"
    assert by_name["author"]["value"] == "clerk-3"
    assert by_name["created"]["value"] == "2025-03-01T00:00:00Z"
    assert by_name["n_sheets"]["value"] == "2"
    assert by_name["n_merged_cells"]["value"] == "1"
    assert by_name["n_formulas"]["value"] == "0"
    t = by_name["title"]
    assert res["main_text"][t["span_start"] : t["span_end"]] == "Workbook T"
    assert len(res["tables"]) == 2
    assert res["tables"][0]["headers"] == ["sku", "qty", "price"]
    assert res["valid"] is True


def test_extract_one_xls_without_props_omits_empty_lines():
    """Empty props must not render as 'Title: ' lines (the labeled-field
    extractor would swallow the next label as the value)."""
    from ai_ocr_spark.kernels.oracle import extract_one

    res = extract_one(
        "https://x.example.com/bare.xls", emit_xls([("S", [["h"], ["v"]])])
    )
    assert res["main_text"].startswith("Workbook\nSheets: 1\n")
    assert "Title:" not in res["main_text"]
