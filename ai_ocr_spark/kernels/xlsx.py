"""From-scratch minimal xlsx (OOXML spreadsheet) reader + fixture emitter.

Covers the reference's primary input format with stdlib only (zipfile +
xml.etree): multi-sheet scan in workbook order, inline/shared/cached
cell values, merged-cell ranges, formula detection, and core document
properties (author/created/title) — the reference's Excel parser surface
(reference: src/api/app/parsers/excel_parser.py:40-113 multi-sheet scan,
:331-392 workbook metadata/merged-cells/formula sampling).

Same contract as kernels.pdf: the emitter produces the fixture subset the
parser must round-trip byte-for-byte; parse never raises on malformed
input (callers get best-effort content + the capture-never-abort rule of
the fused kernel stage).

Scope: worksheet XML with inline strings (`t="inlineStr"`), shared
strings (`t="s"`), cached numeric/string values (`<v>`), formulas
(`<f>` — the cached `<v>` is used as the cell text), `mergeCells`, and
`docProps/core.xml` Dublin-Core properties. Cell refs (`r="BC12"`) place
values in their true columns; gaps fill with ''.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

# ---------------------------------------------------------------------------
# Emitter (datagen + tests; the parser must round-trip its output)
# ---------------------------------------------------------------------------

_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '{sheet_overrides}'
    '<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>'
    "</Relationships>"
)

_CORE = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
    'xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:dcterms="http://purl.org/dc/terms/" '
    'xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">'
    "<dc:title>{title}</dc:title><dc:creator>{author}</dc:creator>"
    '<dcterms:created xsi:type="dcterms:W3CDTF">{created}</dcterms:created>'
    "</cp:coreProperties>"
)


_ILLEGAL_XML = re.compile(
    # XML 1.0 cannot represent these at all (not even as entities):
    # C0 controls except \t\n\r, plus the noncharacters FFFE/FFFF
    "[\x00-\x08\x0b\x0c\x0e-\x1f￾￿]"
)


def _xml_escape(s: str) -> str:
    """Escape for BOTH text and attribute position (sheet name="...") —
    an unescaped quote would emit invalid XML that parse_xlsx silently
    degrades to zero sheets. Characters XML 1.0 cannot represent are
    dropped (openpyxl raises IllegalCharacterError here; we sanitize —
    the emitter must always produce a parseable workbook)."""
    return (
        _ILLEGAL_XML.sub("", str(s))
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&apos;")
        # whitespace as charrefs: literal \r is normalized to \n by any
        # conforming parser, and \n/\t collapse to spaces in attribute
        # values — charrefs survive both positions byte-exactly
        .replace("\r", "&#13;")
        .replace("\n", "&#10;")
        .replace("\t", "&#9;")
    )


def col_letter(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def emit_xlsx(
    sheets: list[tuple[str, list[list[object]]]],
    title: str = "",
    author: str = "",
    created: str = "2025-03-01T00:00:00Z",
    merged: dict[str, list[str]] | None = None,
    formulas: dict[str, dict[str, tuple[str, object]]] | None = None,
) -> bytes:
    """Build a minimal valid xlsx.

    sheets: [(name, rows)] — int/float cells become numeric <v> cells,
    everything else inline strings. merged: sheet name -> ["A1:B1", ...].
    formulas: sheet name -> {"C2": ("A2*B2", cached_value)}.
    """
    merged = merged or {}
    formulas = formulas or {}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            for i in range(len(sheets))
        )
        z.writestr("[Content_Types].xml", _CT.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr(
            "docProps/core.xml",
            _CORE.format(
                title=_xml_escape(title),
                author=_xml_escape(author),
                created=_xml_escape(created),
            ),
        )
        sheet_tags = "".join(
            f'<sheet name="{_xml_escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, (name, _rows) in enumerate(sheets)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rels}</Relationships>",
        )
        for i, (name, rows) in enumerate(sheets):
            fmap = formulas.get(name, {})
            parts = ["<sheetData>"]
            for ri, row in enumerate(rows, start=1):
                parts.append(f'<row r="{ri}">')
                for ci, val in enumerate(row):
                    ref = f"{col_letter(ci)}{ri}"
                    if ref in fmap:
                        f_expr, cached = fmap[ref]
                        parts.append(
                            f'<c r="{ref}"><f>{_xml_escape(f_expr)}</f>'
                            f"<v>{_xml_escape(cached)}</v></c>"
                        )
                    elif isinstance(val, bool) or not isinstance(val, (int, float)):
                        parts.append(
                            f'<c r="{ref}" t="inlineStr"><is><t>'
                            f"{_xml_escape(val)}</t></is></c>"
                        )
                    else:
                        parts.append(f'<c r="{ref}"><v>{val}</v></c>')
                parts.append("</row>")
            parts.append("</sheetData>")
            if name in merged:
                cells = "".join(f'<mergeCell ref="{r}"/>' for r in merged[name])
                parts.append(
                    f'<mergeCells count="{len(merged[name])}">{cells}</mergeCells>'
                )
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                + "".join(parts)
                + "</worksheet>",
            )
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_COLREF_RE = re.compile(r"([A-Z]+)(\d+)")


def _ln(tag: str) -> str:
    """Local name of a possibly-namespaced XML tag."""
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    m = _COLREF_RE.match(ref or "")
    if not m:
        return -1
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_text(cell, shared: list[str]) -> tuple[str, bool]:
    """-> (cell text, is_formula). Formula cells surface their cached
    <v> (the reference reads computed values the same way)."""
    ctype = cell.get("t", "")
    has_formula = False
    v = None
    inline = None
    for child in cell:
        name = _ln(child.tag)
        if name == "f":
            has_formula = True
        elif name == "v":
            v = child.text or ""
        elif name == "is":
            inline = "".join(t.text or "" for t in child.iter() if _ln(t.tag) == "t")
    if ctype == "inlineStr":
        return inline or "", has_formula
    if ctype == "s":
        try:
            return shared[int(v)], has_formula
        except (TypeError, ValueError, IndexError):
            return "", has_formula
    return v if v is not None else "", has_formula


def parse_xlsx(payload: bytes) -> dict:
    """xlsx bytes -> {sheets: [{name, rows}], title, author, created,
    n_merged, n_formulas}. Best-effort, never raises: malformed members
    degrade to empty sheets/props."""
    out: dict = {
        "sheets": [],
        "title": "",
        "author": "",
        "created": "",
        "n_merged": 0,
        "n_formulas": 0,
    }
    try:
        z = zipfile.ZipFile(io.BytesIO(payload))
    except Exception:
        return out
    names = set(z.namelist())

    def read_xml(member: str):
        if member not in names:
            return None
        try:
            return ElementTree.fromstring(z.read(member))
        except Exception:
            return None

    # core properties (S5 workbook metadata)
    core = read_xml("docProps/core.xml")
    if core is not None:
        for el in core:
            name = _ln(el.tag)
            if name == "title":
                out["title"] = el.text or ""
            elif name == "creator":
                out["author"] = el.text or ""
            elif name == "created":
                out["created"] = el.text or ""

    # shared strings (emitted xlsx uses inline strings; real files use these)
    shared: list[str] = []
    ss = read_xml("xl/sharedStrings.xml")
    if ss is not None:
        for si in ss:
            shared.append(
                "".join(t.text or "" for t in si.iter() if _ln(t.tag) == "t")
            )

    # sheet order from workbook.xml, targets from its rels
    rels = {}
    relroot = read_xml("xl/_rels/workbook.xml.rels")
    if relroot is not None:
        for rel in relroot:
            rels[rel.get("Id", "")] = rel.get("Target", "")
    wb = read_xml("xl/workbook.xml")
    sheet_refs: list[tuple[str, str]] = []  # (name, member path)
    if wb is not None:
        for el in wb.iter():
            if _ln(el.tag) != "sheet":
                continue
            rid = next(
                (v for k, v in el.attrib.items() if _ln(k) == "id"), ""
            )
            target = rels.get(rid, "")
            if target and not target.startswith("/"):
                target = "xl/" + target
            sheet_refs.append((el.get("name", ""), target.lstrip("/")))

    for name, member in sheet_refs:
        root = read_xml(member)
        rows: list[list[str]] = []
        if root is not None:
            for el in root.iter():
                tag = _ln(el.tag)
                if tag == "row":
                    cells: list[str] = []
                    for c in el:
                        if _ln(c.tag) != "c":
                            continue
                        text, is_formula = _cell_text(c, shared)
                        if is_formula:
                            out["n_formulas"] += 1
                        ci = _col_index(c.get("r", ""))
                        if ci < 0:
                            ci = len(cells)
                        if ci < len(cells):
                            # duplicate or out-of-order cell ref: last
                            # write wins IN PLACE — appending instead
                            # would silently shift the cell into the
                            # wrong column (undetectable downstream)
                            cells[ci] = text
                            continue
                        while len(cells) < ci:
                            cells.append("")
                        cells.append(text)
                    rows.append(cells)
                elif tag == "mergeCell":
                    out["n_merged"] += 1
        out["sheets"].append({"name": name, "rows": rows})
    return out
