"""Scalar normalizers mirroring the reference's semantics (SURVEY.md §2.7).

Each function documents the reference behavior it reproduces; precedence
orders are preserved exactly (SURVEY.md §7.3 hard-part #6).
"""

from __future__ import annotations

import re
from datetime import datetime

# F4 — date format check (reference: src/processor/app/validators/
# schema_validator.py:110-137): regex pass for ISO / US / EU dotted, then
# strptime fallback in that exact order.
_DATE_PATTERNS = (
    re.compile(r"^\d{4}-\d{2}-\d{2}$"),
    re.compile(r"^\d{2}/\d{2}/\d{4}$"),
    re.compile(r"^\d{2}\.\d{2}\.\d{4}$"),
)
_DATE_FORMATS = ("%Y-%m-%d", "%m/%d/%Y", "%d.%m.%Y")


def is_valid_date(v: object) -> bool:
    if not isinstance(v, str):
        return False
    if any(p.match(v) for p in _DATE_PATTERNS):
        # regex alone is what the reference's fast path accepts; strptime
        # double-checks calendar validity
        for fmt in _DATE_FORMATS:
            try:
                datetime.strptime(v, fmt)
                return True
            except ValueError:
                continue
        return False
    for fmt in _DATE_FORMATS:
        try:
            datetime.strptime(v, fmt)
            return True
        except ValueError:
            continue
    return False


# F5 — date normalize -> ISO (reference: schema_validator.py:249-261):
# try %m/%d/%Y first, then %d.%m.%Y; already-ISO passes through; anything
# unparseable passes through unchanged.
def normalize_date(v: str) -> str:
    if not isinstance(v, str):
        return v
    if _DATE_PATTERNS[0].match(v):
        return v
    for fmt in ("%m/%d/%Y", "%d.%m.%Y"):
        try:
            return datetime.strptime(v, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return v


# F6 — amount normalize (reference: schema_validator.py:241-247):
# strip every char outside [0-9.\-], then float(); failures pass through.
_AMOUNT_STRIP_RE = re.compile(r"[^\d.\-]")


def normalize_amount(v: object) -> object:
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    if not isinstance(v, str):
        return v
    stripped = _AMOUNT_STRIP_RE.sub("", v)
    try:
        return float(stripped)
    except ValueError:
        return v


# F7 — numeric-parse predicate (reference: excel_validator.py:710,785,889):
# float(str(v).replace(',', '')) success test.
def is_numeric(v: object) -> bool:
    if isinstance(v, bool):
        return False
    if isinstance(v, (int, float)):
        return True
    try:
        float(str(v).replace(",", ""))
        return True
    except (ValueError, TypeError):
        return False


# F8 — datetime -> ISO string (reference: api excel_parser.py:193).
def iso_datetime(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S")


# F1 — language detect (reference: langchain_extractor.py:245-294):
# any char in the kana or CJK ranges -> 'ja', else 'en'.
_JA_RE = re.compile(r"[぀-ヿ一-鿿]")


def detect_language(sample: str) -> str:
    return "ja" if _JA_RE.search(sample or "") else "en"


# F14 — clamp score (reference: langchain_extractor.py:657).
def clamp_score(x: float) -> float:
    return max(0.0, min(1.0, x))
