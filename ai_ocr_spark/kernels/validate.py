"""Schema-driven field validation + deterministic confidence.

Reproduces the reference's validator semantics:
  * required-field presence per schema type (reference:
    src/processor/app/validators/schema_validator.py:23-103)
  * date format/normalization checks (:110-137, :249-261)
  * amount coercion (:241-247)
  * row-level custom checks — all-numeric, qty >= 0, hours in range
    (excel_validator.py:701-903)
  * result dict shape {valid, schema_type, errors[], warnings[],
    details.checks[]} (schema_validator.py:172-189)

Confidence is the deterministic re-spec of assess_confidence
(langchain_extractor.py:582-665): empty -> 0.2 (:588-589), otherwise
clamp(0.5*required_ratio + 0.5*checks_ratio) — same bands, reproducible.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from .fields import Field
from .normalize import (
    clamp_score,
    is_numeric,
    is_valid_date,
    normalize_amount,
    normalize_date,
)

# required / optional field names per schema type
# (reference: schema_validator.py:23-103 invoice/report/form required lists)
SCHEMAS: dict[str, dict[str, tuple[str, ...]]] = {
    "invoice": {
        "required": ("invoice_number", "date", "total_amount"),
        "dates": ("date", "due_date"),
        "amounts": ("total_amount",),
    },
    "report": {
        "required": ("title", "date"),
        "dates": ("date",),
        "amounts": (),
    },
    "form": {
        "required": ("form_type",),
        "dates": (),
        "amounts": (),
    },
    "inventory": {
        "required": (),
        "dates": (),
        "amounts": (),
    },
    "generic": {
        "required": (),
        "dates": (),
        "amounts": (),
    },
}


@dataclass
class ValidationResult:
    schema_type: str
    valid: bool
    errors: list[dict] = dc_field(default_factory=list)  # {path, message}
    warnings: list[str] = dc_field(default_factory=list)
    checks: list[dict] = dc_field(default_factory=list)  # {name, passed, severity}


def _schema_type_for(doc_type: str) -> str:
    """Key-presence fallback mirrors _determine_schema_type
    (schema_validator.py:199-222): unknown types fall back to 'form'."""
    return doc_type if doc_type in SCHEMAS else "form"


def _table_checks(res: ValidationResult, tables: list[dict]) -> None:
    """Tabular custom checks mirroring the reference's excel validator:
    row-length consistency (excel_validator.py:527-536) and all-numeric
    columns where the column is numeric-majority (:701-724). Warning
    severity — NORMAL level gating means they never flip `valid`."""
    for t in tables:
        rows = t["rows"]
        if not rows:
            continue
        i = t["table_index"]
        width = len(t["headers"]) or len(rows[0])
        consistent = all(len(r) == width for r in rows)
        res.checks.append(
            {"name": f"table{i}:rows_consistent", "passed": consistent,
             "severity": "warning"}
        )
        if not consistent:
            res.warnings.append(f"table {i}: ragged rows")
        clean = True
        for ci in range(width):
            vals = [r[ci] for r in rows if ci < len(r) and r[ci]]
            if not vals:
                continue
            n_num = sum(1 for v in vals if is_numeric(v))
            if n_num * 2 > len(vals) and n_num != len(vals):
                clean = False
        res.checks.append(
            {"name": f"table{i}:numeric_columns_clean", "passed": clean,
             "severity": "warning"}
        )
        if not clean:
            res.warnings.append(
                f"table {i}: non-numeric values in numeric-majority column"
            )


def validate_fields(
    fields: list[Field], doc_type: str, tables: list[dict] | None = None
) -> ValidationResult:
    schema_type = _schema_type_for(doc_type)
    spec = SCHEMAS[schema_type]
    by_name: dict[str, str] = {}
    for f in fields:
        by_name.setdefault(f.name, f.value)

    res = ValidationResult(schema_type=schema_type, valid=True)

    # required presence (error severity — fails validation)
    for req in spec["required"]:
        present = req in by_name
        res.checks.append(
            {"name": f"required:{req}", "passed": present, "severity": "error"}
        )
        if not present:
            res.errors.append(
                {"path": req, "message": f"required field '{req}' missing"}
            )

    # date format checks (error) — reference precedence: regex then strptime
    for dname in spec["dates"]:
        if dname in by_name:
            ok = is_valid_date(normalize_date(by_name[dname]))
            res.checks.append(
                {"name": f"date_format:{dname}", "passed": ok, "severity": "error"}
            )
            if not ok:
                res.errors.append(
                    {"path": dname, "message": f"invalid date format: {by_name[dname]!r}"}
                )

    # amount coercion checks (error)
    for aname in spec["amounts"]:
        if aname in by_name:
            ok = isinstance(normalize_amount(by_name[aname]), float)
            res.checks.append(
                {"name": f"amount_numeric:{aname}", "passed": ok, "severity": "error"}
            )
            if not ok:
                res.errors.append(
                    {"path": aname, "message": f"non-numeric amount: {by_name[aname]!r}"}
                )

    # line-item custom checks (excel_validator.py:776-799 qty>=0; :701-724
    # all-numeric) — warning severity, matching NORMAL level gating
    # (excel_validator.py:141-167: custom-check failures don't flip valid)
    qty_ok = True
    num_ok = True
    has_items = False
    for f in fields:
        if f.name.endswith(".quantity"):
            has_items = True
            if not is_numeric(f.value) or float(str(f.value).replace(",", "")) < 0:
                qty_ok = False
        if f.name.endswith((".unit_price", ".amount")):
            if not is_numeric(f.value):
                num_ok = False
    if has_items:
        res.checks.append(
            {"name": "line_items:qty_nonnegative", "passed": qty_ok, "severity": "warning"}
        )
        res.checks.append(
            {"name": "line_items:amounts_numeric", "passed": num_ok, "severity": "warning"}
        )
        if not qty_ok:
            res.warnings.append("negative or non-numeric quantity in line_items")
        if not num_ok:
            res.warnings.append("non-numeric unit_price/amount in line_items")

    # invoice cross-check: sum(line amounts) == total_amount (warning)
    if schema_type == "invoice" and has_items and "total_amount" in by_name:
        total = normalize_amount(by_name["total_amount"])
        s = 0.0
        coercible = isinstance(total, float)
        for f in fields:
            if f.name.endswith(".amount"):
                a = normalize_amount(f.value)
                if isinstance(a, float):
                    s += a
                else:
                    coercible = False
        passed = coercible and abs(s - total) < 0.01
        res.checks.append(
            {"name": "invoice:line_items_sum_total", "passed": passed, "severity": "warning"}
        )
        if not passed:
            res.warnings.append("line_items amounts do not sum to total_amount")

    if tables:
        _table_checks(res, tables)

    res.valid = not res.errors
    return res


def confidence_score(fields: list[Field], res: ValidationResult, main_text: str) -> float:
    """Deterministic confidence (SURVEY.md §2.8.5).

    empty doc -> 0.2 (reference fallback, langchain_extractor.py:588-589);
    else 0.5 * required-present ratio + 0.5 * checks-passed ratio, clamped.
    """
    if not main_text.strip() or not fields:
        return 0.2
    spec = SCHEMAS[res.schema_type]
    req = spec["required"]
    names = {f.name for f in fields}
    req_ratio = (
        sum(1 for r in req if r in names) / len(req) if req else 1.0
    )
    checks_ratio = (
        sum(1 for c in res.checks if c["passed"]) / len(res.checks)
        if res.checks
        else 0.8  # no checks ran: mirror the reference's 0.7-0.8 fallback band
    )
    return clamp_score(round(0.5 * req_ratio + 0.5 * checks_ratio, 4))
