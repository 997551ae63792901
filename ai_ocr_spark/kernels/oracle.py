"""Single-document oracle: the E2-equivalent synchronous path.

``extract_one(url, payload)`` runs the full parse -> extract -> validate
pipeline on one document with zero Spark involvement (reference analogue:
the synchronous process endpoint, src/api/app/api/endpoints/
documents.py:131-217). It is the byte-identity arbiter: Tier-2 Spark
parity tests assert the distributed pipeline's per-url output equals this
function's output exactly (BASELINE.json north_rule).
"""

from __future__ import annotations

from typing import Any

from .csvkern import csv_main_text, parse_csv
from .fields import detect_doc_type, extract_fields, language_of
from .html import (
    collapse_ws,
    main_text_from_arena,
    parse_document_links,
    sections_from_arena,
    sniff_kind,
)
from .pdf import extract_pdf_text
from .validate import confidence_score, validate_fields

_GZIP_MAX_BYTES = 64 * 1024 * 1024  # decompression cap (zip-bomb guard)


def analyze_payload_full(
    payload: bytes, base_url: str = ""
) -> tuple[str, str, list[dict], list[dict], list[dict]]:
    """-> (content_kind, canonical main_text, structured tables,
    heading-delimited sections, outlinks).

    Outlinks (the WAT triple: href, resolved-vs-base_url, anchor text)
    are recorded only for HTML payloads — every other kind returns [].

    Never raises on bad input; malformed payloads degrade to
    ('binary'|'text', best-effort text, []) the way the reference
    captures per-doc errors instead of crashing the worker
    (src/processor/app/main.py:145-149). Tables carry the reference's
    canonical tabular shape (headers + data rows,
    excel_validator.py:394-429): HTML <table>s, or the single logical
    table of a CSV payload."""
    # transport unwrapping (gzip + WARC records, possibly nested — a
    # gzipped WARC holding gzipped pages is real Common-Crawl shape).
    # ITERATIVE with a depth cap: recursing per layer would let a
    # crafted 1000x-nested gzip raise RecursionError through the
    # documented never-raises contract.
    for _ in range(8):
        if payload[:2] == b"\x1f\x8b":
            # bounded decompression: beyond the cap (zip bomb) the
            # payload degrades to opaque binary instead of OOMing
            import gzip as _gzip
            import io as _io

            try:
                with _gzip.GzipFile(fileobj=_io.BytesIO(payload)) as gz:
                    inner = gz.read(_GZIP_MAX_BYTES + 1)
                if len(inner) > _GZIP_MAX_BYTES:
                    return "binary", "", [], [], []
            except Exception:
                return "binary", "", [], [], []
            payload = inner
            continue
        # WARC record stream: version line + a WARC-Type header, not
        # just the 5-char prefix (a text page QUOTING 'WARC/1.0' must
        # not be swallowed as a container)
        if (
            payload[:5] == b"WARC/"
            and b"\r\n" in payload[:32]
            and b"WARC-Type:" in payload[:2048]
        ):
            from .warc import first_response_body

            inner = first_response_body(payload)
            if not inner:
                return "binary", "", [], [], []
            payload = inner
            continue
        break
    kind = sniff_kind(payload)
    if kind == "empty":
        return kind, "", [], [], []
    if kind == "pdf":
        try:
            return kind, extract_pdf_text(payload), [], [], []
        except Exception:
            return kind, "", [], [], []
    if kind in ("xlsx", "xls"):
        # multi-sheet scan + workbook metadata (S5): props/counters are
        # rendered as 'Label: value' lines so the standard labeled-field
        # extractor yields them as fields WITH real spans; each sheet
        # becomes one table through the same header heuristic as HTML
        # (reference: excel_parser.py:40-113 sheet scan, :331-392 props).
        # Legacy BIFF8 .xls flows through the same block — parse_xls
        # returns the parse_xlsx dict shape (props from the
        # SummaryInformation stream when present).
        if kind == "xls":
            from .xls import parse_xls as _parse_wb
        else:
            from .xlsx import parse_xlsx as _parse_wb

        wb = _parse_wb(payload)
        if kind == "xls" and not wb["sheets"]:
            # every OLE2 compound file shares the d0cf11e0 magic
            # (.doc, .ppt, .msg, .msi ...) and most carry a
            # SummaryInformation stream, so only an actual Workbook
            # stream with sheets proves a spreadsheet — anything else
            # degrades to opaque binary instead of fabricating
            # 'Sheets: 0' workbook metadata
            return "binary", "", [], [], []
        lines = ["Workbook"]
        # empty prop lines are omitted, not rendered as 'Title: ' — a
        # label with no value makes the labeled-field extractor capture
        # the NEXT label as its value (xls has no props by scope)
        for label, val in (
            ("Title", wb["title"]),
            ("Author", wb["author"]),
            ("Created", wb["created"]),
        ):
            if val:
                lines.append(f"{label}: {val}")
        lines += [
            f"Sheets: {len(wb['sheets'])}",
            f"Merged Cells: {wb['n_merged']}",
            f"Formulas: {wb['n_formulas']}",
        ]
        lines += [f"Sheet: {s['name']}" for s in wb["sheets"]]
        from .html import _split_header

        tables = []
        for i, s in enumerate(wb["sheets"]):
            if not s["rows"]:
                continue
            split = _split_header(s["rows"])
            tables.append(
                {"table_index": i, "headers": split["headers"], "rows": split["rows"]}
            )
        return kind, "\n".join(lines), tables, [], []
    if kind == "docx":
        # wordprocessing main part: props + counters as labeled lines
        # (same span-bearing layout as the workbook path), body
        # paragraphs as the document text, tables through the same
        # header heuristic as HTML/xlsx. Fills the reference's pinned-
        # but-unused python-docx branch (requirements.txt:26).
        from .docx import parse_docx

        doc = parse_docx(payload)
        if not doc["paragraphs"] and not doc["tables"]:
            # a zip that mentions word/document.xml but parses to
            # nothing is opaque binary, not an empty Word document
            return "binary", "", [], [], []
        lines = ["Document"]
        for label, val in (
            ("Title", doc["title"]),
            ("Author", doc["author"]),
            ("Created", doc["created"]),
        ):
            if val:
                lines.append(f"{label}: {val}")
        lines += [
            f"Paragraphs: {len(doc['paragraphs'])}",
            f"Tables: {len(doc['tables'])}",
        ]
        lines += [p for p in doc["paragraphs"] if p]
        from .html import _split_header

        tables = []
        for i, rows in enumerate(doc["tables"]):
            if not rows:
                continue
            split = _split_header(rows)
            tables.append(
                {"table_index": i, "headers": split["headers"], "rows": split["rows"]}
            )
        return kind, "\n".join(lines), tables, [], []
    if kind == "csv":
        header, rows = parse_csv(payload)
        tables = (
            [{"table_index": 0, "headers": header, "rows": rows}] if rows else []
        )
        return kind, csv_main_text(payload), tables, [], []
    if kind == "binary":
        return kind, "", [], [], []
    text = payload.decode("utf-8", errors="replace")
    if kind == "html":
        arena, tables, links = parse_document_links(text, base_url)
        return (
            kind,
            main_text_from_arena(arena),
            tables,
            sections_from_arena(arena),
            links,
        )
    # plain text: canonical whitespace per line
    lines = [collapse_ws(ln) for ln in text.splitlines()]
    return kind, "\n".join(ln for ln in lines if ln), [], [], []


def analyze_payload(payload: bytes) -> tuple[str, str, list[dict], list[dict]]:
    """4-tuple view of analyze_payload_full (links dropped) — the
    stable shape existing callers and tests pin."""
    kind, main_text, tables, sections, _links = analyze_payload_full(payload)
    return kind, main_text, tables, sections


def main_text_of(payload: bytes) -> tuple[str, str]:
    """-> (content_kind, canonical main_text) — see analyze_payload."""
    kind, main_text, _tables, _sections = analyze_payload(payload)
    return kind, main_text


def extract_one(url: str, payload: bytes) -> dict[str, Any]:
    """Full per-document pipeline -> plain dict (fixture-golden shape)."""
    kind, main_text, tables, sections, links = analyze_payload_full(
        payload or b"", base_url=url
    )
    doc_type = detect_doc_type(main_text) if main_text else "generic"
    lang = language_of(main_text, url)
    fields = extract_fields(main_text, doc_type) if main_text else []
    vres = validate_fields(fields, doc_type, tables=tables)
    conf = confidence_score(fields, vres, main_text)
    return {
        "url": url,
        "content_kind": kind,
        "main_text": main_text,
        "tables": tables,
        "sections": sections,
        "links": links,
        "doc_type": doc_type,
        "lang": lang,
        "fields": [
            {
                "name": f.name,
                "value": f.value,
                "span_start": f.span_start,
                "span_end": f.span_end,
            }
            for f in fields
        ],
        "valid": vres.valid and bool(main_text),
        "validation": {
            "schema_type": vres.schema_type,
            "errors": vres.errors,
            "warnings": vres.warnings,
            "checks": vres.checks,
        },
        "confidence": conf,
        "error": None,
    }
