"""docx kernel: emit/parse round-trip, body-vs-cell paragraph scoping,
sniff routing, malformed degradation."""

from ai_ocr_spark.kernels.docx import emit_docx, parse_docx
from ai_ocr_spark.kernels.html import sniff_kind
from ai_ocr_spark.kernels.oracle import analyze_payload


def test_roundtrip_paragraphs_tables_props():
    payload = emit_docx(
        [
            "First paragraph.",
            "Tabbed\tand\nbroken.",
            [["h1", "h2"], ["a", "b"], ["c", "d"]],
            "After the table.",
        ],
        title="T <&> 'q'",
        author="au\"thor",
        created="2025-03-01T00:00:00Z",
    )
    d = parse_docx(payload)
    assert d["paragraphs"] == [
        "First paragraph.",
        "Tabbed\tand\nbroken.",
        "After the table.",
    ]
    assert d["tables"] == [[["h1", "h2"], ["a", "b"], ["c", "d"]]]
    assert d["title"] == "T <&> 'q'"
    assert d["author"] == 'au"thor'
    assert d["created"] == "2025-03-01T00:00:00Z"


def test_cell_paragraphs_stay_in_cells():
    # a multi-line cell must not leak its paragraphs into the body list
    payload = emit_docx([[["one\ntwo"]], "body para"])
    d = parse_docx(payload)
    assert d["paragraphs"] == ["body para"]
    assert d["tables"] == [[["one\ntwo"]]]


def test_sniff_routes_zip_members():
    payload = emit_docx(["x"])
    assert payload[:4] == b"PK\x03\x04"
    assert sniff_kind(payload) == "docx"
    kind, text, tables, _ = analyze_payload(payload)
    assert kind == "docx"
    assert text.startswith("Document\n")
    assert "Paragraphs: 1" in text


def test_empty_docx_degrades_to_binary():
    # zero paragraphs and zero tables: opaque binary, not a fabricated
    # 'Paragraphs: 0' document
    assert analyze_payload(emit_docx([]))[0] == "binary"


def test_malformed_members_never_raise():
    assert parse_docx(b"not a zip at all") == {
        "paragraphs": [],
        "tables": [],
        "title": "",
        "author": "",
        "created": "",
    }
    # valid zip, truncated XML member
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("word/document.xml", "<w:document><w:body><w:p>")
    d = parse_docx(buf.getvalue())
    assert d["paragraphs"] == [] and d["tables"] == []
