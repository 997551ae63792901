"""Round-2 roundtrip queries: invoice fields/validation and PDF path."""

SF = "/root/testdata/sf0.001"


def test_invoice_roundtrip_fault_families(spark):
    from ai_ocr_spark.operators.roundtrip_fields import pipeline_invoice_roundtrip

    df = pipeline_invoice_roundtrip(spark, SF).toPandas()
    assert len(df) > 0
    assert (df["doc_type"] == "invoice").all()
    assert (df["schema_type"] == "invoice").all()
    k = df["o_orderkey"]
    # %7 family: missing Date -> required error, invalid
    assert (df["valid"] == (k % 7 != 0)).all()
    assert (df["n_errors"] == (k % 7 == 0).astype("int64")).all()
    # %5 family: total != sum(items) -> warning, still valid
    assert (df["n_warnings"] == (k % 5 == 0).astype("int64")).all()
    clean = df[(k % 5 != 0) & (k % 7 != 0)]
    assert (clean["confidence"] == 1.0).all()
    assert (clean["n_checks"] == clean["n_passed"]).all()
    # spans point at the actual values
    assert (df["inv_end"] - df["inv_start"] == df["invoice_number"].str.len()).all()
    assert (
        df["cust_end"] - df["cust_start"] == df["customer"].str.len()
    ).all()


def test_pdf_roundtrip_reading_order_and_flate(spark):
    from ai_ocr_spark.operators.roundtrip_pdf import pipeline_pdf_roundtrip

    df = pipeline_pdf_roundtrip(spark, SF).toPandas()
    assert len(df) > 0
    assert (df["content_kind"] == "pdf").all()
    # every page recovered text (the FlateDecode half included)
    assert (df["main_text"].str.len() > 0).all()
    even = df[df["l_orderkey"] % 2 == 0]
    assert len(even) > 0 and (even["main_text"].str.len() > 0).all()
    # x-y-cut reading order: title block, left column, right column
    for t in df["main_text"].head(5):
        lines = t.split("\n")
        assert lines[0].startswith("Order Summary ")
        items = [ln for ln in lines[1:] if ln.startswith("Item ")]
        amts = [ln for ln in lines[1:] if ln.startswith("Amt ")]
        assert len(items) == len(amts) and len(items) + len(amts) == len(lines) - 1
        # left column fully precedes right column
        assert lines[1 : 1 + len(items)] == items


def test_sections_golden():
    from ai_ocr_spark.kernels.html import parse_blocks, sections_from_arena

    html = (
        "<html><body><p>preamble text here</p>"
        "<h1>Alpha</h1><p>a one</p><p>a two</p>"
        "<h2>Beta</h2><p>b one</p>"
        "<h3>Empty</h3></body></html>"
    )
    secs = sections_from_arena(parse_blocks(html))
    assert secs == [
        {"title": "", "content": "preamble text here"},
        {"title": "Alpha", "content": "a one\na two"},
        {"title": "Beta", "content": "b one"},
        {"title": "Empty", "content": ""},
    ]
    # no headings -> single untitled section; no content -> none
    assert sections_from_arena(parse_blocks("<html><body><p>x y z</p></body></html>")) == [
        {"title": "", "content": "x y z"}
    ]
    assert sections_from_arena(parse_blocks("<html><body></body></html>")) == []


def test_pipeline_sections_query(spark):
    from ai_ocr_spark.operators.roundtrip import pipeline_sections

    df = pipeline_sections(spark, SF).toPandas()
    assert set(df["sec_idx"]) == {0, 1}
    stats = df[df["sec_idx"] == 1]
    assert (stats["title"] == "Stats").all()
    assert stats["content"].str.startswith("chars ").all()


def test_flate_stream_trailing_cr_roundtrip():
    """Regression: compressed data ending in 0x0d must not lose that byte
    to the `\\r?\\nendstream` delimiter (1/256 of FlateDecode streams)."""
    import zlib

    from ai_ocr_spark.kernels.pdf import emit_pdf, extract_pdf_text

    runs = [
        (72.0, 750.0, "Order Summary 0"),
        (72.0, 700.0, "Item 1 qty 44"), (400.0, 700.0, "Amt 43683"),
        (72.0, 685.0, "Item 2 qty 6"), (400.0, 685.0, "Amt 34009"),
        (72.0, 670.0, "Item 4 qty 10"), (400.0, 670.0, "Amt 45727"),
    ]
    stream = b"\n".join(
        [b"BT", b"/F1 12 Tf"]
        + [
            op
            for x, y, t in runs
            for op in (
                f"1 0 0 1 {x:.2f} {y:.2f} Tm".encode(),
                b"(" + t.encode() + b") Tj",
            )
        ]
        + [b"ET"]
    )
    assert zlib.compress(stream).endswith(b"\r")  # the hostile case
    text = extract_pdf_text(emit_pdf([runs], compress=True))
    assert text.startswith("Order Summary 0\n")
    assert "Amt 45727" in text
