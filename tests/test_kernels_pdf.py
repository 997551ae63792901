"""Tier-1: PDF emitter/parser round-trip + x-y-cut ordering."""

from ai_ocr_spark.kernels.pdf import (
    GlyphRun,
    emit_pdf,
    extract_pdf_text,
    page_runs,
    xy_cut_blocks,
)


def test_roundtrip_single_page_uncompressed():
    pdf = emit_pdf([[(72, 700, "Hello World"), (72, 680, "Second line")]])
    assert pdf.startswith(b"%PDF-")
    assert extract_pdf_text(pdf) == "Hello World\nSecond line"


def test_roundtrip_flate():
    pdf = emit_pdf([[(72, 700, "Compressed content here")]], compress=True)
    assert extract_pdf_text(pdf) == "Compressed content here"


def test_multi_page_order():
    pdf = emit_pdf(
        [
            [(72, 700, "Page one text")],
            [(72, 700, "Page two text")],
        ]
    )
    assert extract_pdf_text(pdf) == "Page one text\nPage two text"


def test_xy_cut_blocks_vertical_gap():
    # two paragraphs separated by a big vertical gap -> two blocks
    runs = [
        GlyphRun(72, 700, "top a"),
        GlyphRun(72, 686, "top b"),
        GlyphRun(72, 600, "bottom a"),
        GlyphRun(72, 586, "bottom b"),
    ]
    blocks = xy_cut_blocks(runs)
    assert len(blocks) == 2
    assert [r.text for r in blocks[0]] == ["top a", "top b"]
    assert [r.text for r in blocks[1]] == ["bottom a", "bottom b"]


def test_xy_cut_columns_reading_order():
    # two columns: left read before right
    runs = [
        GlyphRun(320, 700, "right one"),
        GlyphRun(72, 700, "left one"),
        GlyphRun(72, 686, "left two"),
        GlyphRun(320, 686, "right two"),
    ]
    blocks = xy_cut_blocks(runs)
    texts = [" ".join(r.text for r in b) for b in blocks]
    assert texts == ["left one left two", "right one right two"]


def test_escaped_parens():
    pdf = emit_pdf([[(72, 700, "with (parens) and \\ backslash")]])
    assert extract_pdf_text(pdf) == "with (parens) and \\ backslash"


def test_corrupt_pdf_degrades():
    assert extract_pdf_text(b"%PDF-1.4 garbage no objects") == ""
    runs = page_runs(b"%PDF-1.4\nnothing")
    assert runs == []


def test_deterministic():
    pdf = emit_pdf([[(72, 700, "A"), (300, 700, "B"), (72, 650, "C")]])
    assert extract_pdf_text(pdf) == extract_pdf_text(pdf)


def test_form_xobject_recursion():
    """A page whose text lives in a Form XObject invoked by `Do` must
    extract the same text as inline content (SURVEY §2.8 kernel 2)."""
    import zlib

    from ai_ocr_spark.kernels.pdf import extract_pdf_text

    form = b"BT\n/F1 12 Tf\n1 0 0 1 72 700 Tm\n(Hello from form) Tj\nET"
    form = zlib.compress(form)
    content = b"q\n/Fm1 Do\nQ"
    objs = [
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",         # 1
        b"<< /Subtype /Form /Length %d /Filter /FlateDecode >>\nstream\n" % len(form)
        + form + b"\nendstream",                                           # 2
        b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream",  # 3
        b"<< /Type /Page /Parent 5 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 1 0 R >> /XObject << /Fm1 2 0 R >> >> "
        b"/Contents 3 0 R >>",                                             # 4
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",                      # 5
        b"<< /Type /Catalog /Pages 5 0 R >>",                              # 6
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 6 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1, xref)

    assert extract_pdf_text(bytes(out)) == "Hello from form"
