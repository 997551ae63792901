"""xlsx kernel: emit/parse round-trip, sniffing, extraction branch."""

from ai_ocr_spark.kernels.html import sniff_kind
from ai_ocr_spark.kernels.oracle import extract_one
from ai_ocr_spark.kernels.xlsx import col_letter, emit_xlsx, parse_xlsx


def _wb(**kw) -> bytes:
    return emit_xlsx(
        [
            ("Items", [["sku", "qty", "price"], ["PRD-1", 3, 10], ["PRD-2", 5, 7]]),
            ("Summary", [["metric", "value", "rank"], ["total", 65, 1], ["rows", 2, 2]]),
        ],
        title="Workbook T",
        author="clerk-3",
        merged={"Summary": ["A1:C1"]},
        formulas={"Summary": {"B2": ("SUM(Items!C:C)", 65)}},
        **kw,
    )


def test_col_letters():
    assert [col_letter(i) for i in (0, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_roundtrip_sheets_props_counters():
    wb = parse_xlsx(_wb())
    assert [s["name"] for s in wb["sheets"]] == ["Items", "Summary"]
    assert wb["sheets"][0]["rows"] == [
        ["sku", "qty", "price"], ["PRD-1", "3", "10"], ["PRD-2", "5", "7"]
    ]
    # formula cell surfaces its cached value
    assert wb["sheets"][1]["rows"][1] == ["total", "65", "1"]
    assert (wb["title"], wb["author"]) == ("Workbook T", "clerk-3")
    assert wb["created"] == "2025-03-01T00:00:00Z"
    assert wb["n_merged"] == 1 and wb["n_formulas"] == 1


def test_sniff_xlsx_vs_plain_zip():
    assert sniff_kind(_wb()) == "xlsx"
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("readme.txt", "not a workbook")
    assert sniff_kind(buf.getvalue()) == "binary"
    assert sniff_kind(b"PK\x03\x04truncated-junk") == "binary"


def test_parse_never_raises_on_malformed():
    assert parse_xlsx(b"")["sheets"] == []
    assert parse_xlsx(b"PK\x03\x04junk")["sheets"] == []
    # valid zip, broken sheet xml -> empty rows, no raise
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            "<workbook xmlns:r='http://schemas.openxmlformats.org/officeDocument/2006/relationships'>"
            "<sheets><sheet name='S' r:id='rId1'/></sheets></workbook>",
        )
        z.writestr("xl/_rels/workbook.xml.rels", "<Relationships><Relationship Id='rId1' Target='worksheets/sheet1.xml'/></Relationships>")
        z.writestr("xl/worksheets/sheet1.xml", "<worksheet><sheetData><row")
    wb = parse_xlsx(buf.getvalue())
    assert wb["sheets"] == [{"name": "S", "rows": []}]


def test_out_of_order_and_duplicate_cell_refs_land_in_their_column():
    """ADVICE r2: a duplicate or out-of-order cell ref (ci < len(cells))
    must overwrite its own column slot, not silently append at the end
    (which shifted the value into the wrong column)."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            "xl/workbook.xml",
            "<workbook xmlns:r='http://schemas.openxmlformats.org/officeDocument/2006/relationships'>"
            "<sheets><sheet name='S' r:id='rId1'/></sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            "<Relationships><Relationship Id='rId1' Target='worksheets/sheet1.xml'/></Relationships>",
        )
        # C1 before A1 (out of order), then a duplicate A1 (last wins)
        z.writestr(
            "xl/worksheets/sheet1.xml",
            "<worksheet><sheetData><row>"
            "<c r='C1' t='inlineStr'><is><t>cee</t></is></c>"
            "<c r='A1' t='inlineStr'><is><t>aye-old</t></is></c>"
            "<c r='A1' t='inlineStr'><is><t>aye</t></is></c>"
            "</row></sheetData></worksheet>",
        )
    wb = parse_xlsx(buf.getvalue())
    assert wb["sheets"][0]["rows"] == [["aye", "", "cee"]]


def test_extract_one_workbook_metadata_fields():
    res = extract_one("https://x.example.com/wb/1", _wb())
    assert res["content_kind"] == "xlsx"
    lines = res["main_text"].split("\n")
    assert lines[0] == "Workbook"
    by_name = {f["name"]: f for f in res["fields"]}
    assert by_name["title"]["value"] == "Workbook T"
    assert by_name["author"]["value"] == "clerk-3"
    assert by_name["n_sheets"]["value"] == "2"
    assert by_name["n_merged_cells"]["value"] == "1"
    assert by_name["n_formulas"]["value"] == "1"
    # spans are real offsets into main_text
    t = by_name["title"]
    assert res["main_text"][t["span_start"] : t["span_end"]] == "Workbook T"
    # both sheets became tables with the header heuristic applied
    assert len(res["tables"]) == 2
    assert res["tables"][0]["headers"] == ["sku", "qty", "price"]
    assert res["valid"] is True


def test_whitespace_and_quotes_roundtrip_exactly():
    """\\r \\n \\t survive text AND attribute position via charrefs (a
    conforming parser normalizes the literals); quotes survive names."""
    sheets = [('My "Q1"\r\n\tdata', [["x\r\ny", "a\tb", 'q"w']])]
    wb = parse_xlsx(
        emit_xlsx(sheets, title='T "t"\r\nnext', author="a\tb\rc")
    )
    assert wb["sheets"][0]["name"] == 'My "Q1"\r\n\tdata'
    assert wb["sheets"][0]["rows"] == [["x\r\ny", "a\tb", 'q"w']]
    assert wb["title"] == 'T "t"\r\nnext'
    assert wb["author"] == "a\tb\rc"
