"""Tier-1: field extraction, validation, normalizers, oracle goldens.

Mirrors the reference test suite's assertions
(reference: src/processor/app/tests/test_extraction.py:186-325).
"""

import pytest

from ai_ocr_spark.datagen import make_page
from ai_ocr_spark.kernels.fields import detect_doc_type, extract_fields
from ai_ocr_spark.kernels.normalize import (
    clamp_score,
    detect_language,
    is_numeric,
    is_valid_date,
    normalize_amount,
    normalize_date,
)
from ai_ocr_spark.kernels.oracle import extract_one
from ai_ocr_spark.kernels.validate import confidence_score, validate_fields


# --- normalizers (F4-F7, F14) -------------------------------------------------

def test_is_valid_date():
    assert is_valid_date("2025-03-26")
    assert is_valid_date("03/26/2025")
    assert is_valid_date("26.03.2025")
    assert not is_valid_date("2025-13-40")
    assert not is_valid_date("March 26, 2025")
    assert not is_valid_date(None)


def test_normalize_date_precedence():
    assert normalize_date("2025-03-26") == "2025-03-26"
    # reference precedence: %m/%d/%Y before %d.%m.%Y (schema_validator.py:249-261)
    assert normalize_date("03/26/2025") == "2025-03-26"
    assert normalize_date("26.03.2025") == "2025-03-26"
    assert normalize_date("garbage") == "garbage"


def test_normalize_amount():
    assert normalize_amount("$12,345.67") == 12345.67
    assert normalize_amount("¥1,000") == 1000.0
    assert normalize_amount(5) == 5.0
    assert normalize_amount("not a number") == "not a number"
    assert normalize_amount("-42.5") == -42.5


def test_is_numeric():
    assert is_numeric("1,234.5")
    assert is_numeric(3)
    assert not is_numeric("abc")
    assert not is_numeric(True)  # bools are not numbers in the reference checks


def test_detect_language():
    assert detect_language("hello world") == "en"
    assert detect_language("売上データ") == "ja"
    assert detect_language("mixed ひらがな text") == "ja"
    assert detect_language("") == "en"


def test_clamp():
    assert clamp_score(1.5) == 1.0
    assert clamp_score(-0.1) == 0.0
    assert clamp_score(0.42) == 0.42


# --- golden invoice (FIXTURES.md §2 == test_extraction.py:56-104) ---------------

@pytest.fixture(scope="module")
def golden_invoice():
    page = make_page(0)
    assert page["family"] == "invoice"
    return extract_one(page["url"], page["html"])


def test_golden_invoice_fields(golden_invoice):
    r = golden_invoice
    assert r["doc_type"] == "invoice"
    fields = {f["name"]: f["value"] for f in r["fields"]}
    assert fields["invoice_number"] == "INV-2025-001"
    assert fields["date"] == "2025-03-26"
    assert fields["due_date"] == "2025-04-25"
    assert fields["customer"] == "ACME Corporation"
    assert fields["vendor.name"] == "Example Vendor Inc."
    assert fields["total_amount"] == "$12,345.67"
    n_items = len({k for k in fields if k.startswith("line_items[")}) // 4
    assert n_items >= 3  # test_extraction.py:211-213


def test_golden_invoice_valid(golden_invoice):
    r = golden_invoice
    assert r["valid"] is True  # test_extraction.py:216-222
    assert r["validation"]["schema_type"] == "invoice"
    assert r["confidence"] > 0.7
    # line items sum equals total (golden values)
    sums = [c for c in r["validation"]["checks"] if c["name"] == "invoice:line_items_sum_total"]
    assert sums and sums[0]["passed"] is True


def test_golden_invoice_spans(golden_invoice):
    r = golden_invoice
    text_bytes = r["main_text"].encode("utf-8")
    for f in r["fields"]:
        assert text_bytes[f["span_start"]:f["span_end"]].decode("utf-8") == f["value"]


def test_chrome_stripped(golden_invoice):
    mt = golden_invoice["main_text"]
    assert "Home" not in mt and "Terms" not in mt and "Buy now" not in mt
    assert mt.startswith("INVOICE")


# --- golden report ------------------------------------------------------------

def test_golden_report():
    page = make_page(1)
    assert page["family"] == "report"
    r = extract_one(page["url"], page["html"])
    assert r["doc_type"] == "report"
    assert r["validation"]["schema_type"] == "report"
    assert r["valid"] is True
    fields = {f["name"]: f["value"] for f in r["fields"]}
    assert fields["title"] == "Monthly Sales Report"
    assert fields["date"] == "2025-03-01"
    assert "Electronics 10000 12000 15000 20000 57000" in r["main_text"]


# --- edge cases (FIXTURES.md §5) ------------------------------------------------

def test_empty_doc():
    r = extract_one("https://x/empty/9", b"")
    assert r["content_kind"] == "empty"
    assert r["main_text"] == ""
    assert r["valid"] is False
    assert r["confidence"] < 0.5  # test_extraction.py:279


def test_invalid_fields_fail_validation():
    fields = extract_fields("Invoice Number: X-1", "invoice")
    res = validate_fields(fields, "invoice")
    assert res.valid is False  # missing date + total_amount
    assert any(e["path"] == "total_amount" for e in res.errors)


def test_japanese_doc():
    page_html = "<html><body><h1>売上レポート</h1><p>請求書の合計金額。</p></body></html>"
    r = extract_one("https://x/ja/1", page_html.encode("utf-8"))
    assert r["lang"] == "ja"


def test_bad_date_invoice():
    text = "Invoice Number: INV-1\nDate: 13/45/2025\nTotal Amount: 10.00"
    fields = extract_fields(text, "invoice")
    res = validate_fields(fields, "invoice")
    assert res.valid is False
    assert any("date" == e["path"] for e in res.errors)


def test_confidence_bands():
    assert confidence_score([], validate_fields([], "generic"), "") == 0.2
    fields = extract_fields(
        "Invoice Number: INV-9\nDate: 2025-01-01\nTotal Amount: 5.00", "invoice"
    )
    res = validate_fields(fields, "invoice")
    assert confidence_score(fields, res, "nonempty") == 1.0


def test_malformed_binary_never_raises():
    import random

    rng = random.Random(7)
    for _ in range(50):
        payload = bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 300)))
        r = extract_one("https://x/junk", payload)
        assert r["error"] is None
        assert isinstance(r["main_text"], str)


def test_doc_type_detection():
    assert detect_doc_type("INVOICE Invoice Number: 1") == "invoice"
    assert detect_doc_type("Monthly Sales Report summary") == "report"
    assert detect_doc_type("product_id stock inventory list") == "inventory"
    assert detect_doc_type("random words nothing special") == "generic"
