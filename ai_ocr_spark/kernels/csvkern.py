"""CSV payload kernel: encoding sniff + delimiter sniff + canonical text.

Reproduces the reference's CSV handling without chardet:
  * encoding detection over the first 1 MB (reference:
    src/api/app/parsers/excel_parser.py:239-258) — BOM check, strict
    UTF-8 probe, CP932 (Shift-JIS) probe, latin-1 fallback
  * delimiter detection by counting , ; \t | in a 4 KB sample and taking
    the argmax (reference: excel_parser.py:260-284); tie-break follows
    candidate order
"""

from __future__ import annotations

from .html import collapse_ws

_DELIMS = (",", ";", "\t", "|")


def detect_encoding(payload: bytes) -> str:
    head = payload[:1048576]
    if head.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if head.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "utf-16"
    try:
        head.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    try:
        head.decode("cp932")
        return "cp932"
    except UnicodeDecodeError:
        pass
    return "latin-1"


def detect_delimiter(sample: str) -> str:
    sample = sample[:4096]
    counts = [(sample.count(d), -i) for i, d in enumerate(_DELIMS)]
    best = max(range(len(_DELIMS)), key=lambda i: counts[i])
    return _DELIMS[best] if counts[best][0] > 0 else ","


def _split_row(line: str, delim: str) -> list[str]:
    """Minimal RFC-4180 split: double-quoted cells may contain the delim."""
    if '"' not in line:
        return line.split(delim)
    cells: list[str] = []
    cur: list[str] = []
    in_q = False
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if in_q:
            if c == '"':
                if i + 1 < n and line[i + 1] == '"':
                    cur.append('"')
                    i += 1
                else:
                    in_q = False
            else:
                cur.append(c)
        elif c == '"':
            in_q = True
        elif c == delim:
            cells.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    cells.append("".join(cur))
    return cells


def parse_csv(payload: bytes) -> tuple[list[str], list[list[str]]]:
    """-> (header, rows). Header detection follows the reference heuristic
    (api excel_parser.py:394-418): first row is a header if its cells are
    non-numeric while the body is numeric for more than half the columns."""
    enc = detect_encoding(payload)
    text = payload.decode(enc, errors="replace")
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines:
        return [], []
    delim = detect_delimiter("\n".join(lines[:20]))
    rows = [[collapse_ws(c) for c in _split_row(ln, delim)] for ln in lines]

    def _is_num(s: str) -> bool:
        try:
            float(s.replace(",", ""))
            return True
        except ValueError:
            return False

    header: list[str] = []
    if len(rows) >= 2:
        first, body = rows[0], rows[1:]
        ncols = max(len(first), 1)
        numeric_cols = 0
        for ci in range(len(first)):
            col_vals = [r[ci] for r in body[:50] if ci < len(r) and r[ci]]
            if col_vals and all(_is_num(v) for v in col_vals):
                numeric_cols += 1
        if not any(_is_num(c) for c in first if c) and numeric_cols * 2 > ncols:
            header = first
            rows = body
    return header, rows


def csv_main_text(payload: bytes) -> str:
    """Canonical CSV text: one block per row, cells joined by ' | '."""
    header, rows = parse_csv(payload)
    out = []
    if header:
        out.append(" | ".join(header))
    out.extend(" | ".join(r) for r in rows)
    return "\n".join(s for s in (collapse_ws(x) for x in out) if s)
