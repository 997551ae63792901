"""From-scratch minimal docx (OOXML wordprocessing) reader + emitter.

Fills the reference's declared-but-unbuilt Word branch: it pins
python-docx (reference: requirements.txt:26) with zero call sites, the
same pattern this repo already filled for PDF and legacy xls. Stdlib
only (zipfile + xml.etree), reusing the OPC conventions of kernels/xlsx
(same [Content_Types].xml / _rels / docProps/core.xml layout).

Scope: `word/document.xml` body-level content — paragraphs (`w:p` with
`w:r`/`w:t` runs; `w:tab` renders as a tab, `w:br` as a newline) and
tables (`w:tbl` -> `w:tr` -> `w:tc`, cell text = the cell's paragraph
texts joined), plus Dublin-Core properties from `docProps/core.xml`.
Paragraphs nested inside table cells belong to the cell, not the body —
only direct children of `w:body` are walked.

Same contract as kernels.xlsx: the emitter produces the fixture subset
the parser round-trips byte-for-byte; parse never raises on malformed
input (degrades to empty content under the fused kernel stage's
capture-never-abort rule).
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree

from .xlsx import _CORE, _ln, _xml_escape

# ---------------------------------------------------------------------------
# Emitter (datagen + tests; the parser must round-trip its output)
# ---------------------------------------------------------------------------

_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    '<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>'
    "</Relationships>"
)

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def _p(text: str) -> str:
    # split=-1 keeps empty runs so "a\tb" -> run a, tab, run b exactly
    runs = []
    for i, seg in enumerate(str(text).split("\t")):
        if i:
            runs.append("<w:tab/>")
        parts = seg.split("\n")
        for j, line in enumerate(parts):
            if j:
                runs.append("<w:br/>")
            if line:
                # xml:space preserves leading/trailing run whitespace
                runs.append(f'<w:t xml:space="preserve">{_xml_escape(line)}</w:t>')
    return "<w:p><w:r>" + "".join(runs) + "</w:r></w:p>"


def emit_docx(
    blocks: list[object],
    title: str = "",
    author: str = "",
    created: str = "2025-03-01T00:00:00Z",
) -> bytes:
    """Build a minimal valid docx.

    blocks: document body in order — a str becomes a paragraph, a
    list[list[object]] becomes a table (rows of cells).
    """
    body: list[str] = []
    for block in blocks:
        if isinstance(block, str):
            body.append(_p(block))
        else:
            rows = []
            for row in block:
                cells = "".join(f"<w:tc>{_p(c)}</w:tc>" for c in row)
                rows.append(f"<w:tr>{cells}</w:tr>")
            body.append("<w:tbl>" + "".join(rows) + "</w:tbl>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        + "".join(body)
        + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr(
            "docProps/core.xml",
            _CORE.format(
                title=_xml_escape(title),
                author=_xml_escape(author),
                created=_xml_escape(created),
            ),
        )
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def _run_text(p) -> str:
    """Paragraph element -> text: w:t runs concatenated, w:tab -> \\t,
    w:br -> \\n (matching how Word renders them as flat text)."""
    parts: list[str] = []
    for el in p.iter():
        name = _ln(el.tag)
        if name == "t":
            parts.append(el.text or "")
        elif name == "tab":
            parts.append("\t")
        elif name == "br":
            parts.append("\n")
    return "".join(parts)


def parse_docx(payload: bytes) -> dict:
    """docx bytes -> {paragraphs: [str], tables: [[[cell text]]],
    title, author, created}. Best-effort, never raises: malformed
    members degrade to empty content."""
    out: dict = {
        "paragraphs": [],
        "tables": [],
        "title": "",
        "author": "",
        "created": "",
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

    doc = read_xml("word/document.xml")
    if doc is None:
        return out
    body = next((el for el in doc if _ln(el.tag) == "body"), None)
    if body is None:
        return out
    for el in body:  # direct children only: cell paragraphs stay in cells
        name = _ln(el.tag)
        if name == "p":
            out["paragraphs"].append(_run_text(el))
        elif name == "tbl":
            rows = []
            for tr in el:
                if _ln(tr.tag) != "tr":
                    continue
                cells = []
                for tc in tr:
                    if _ln(tc.tag) != "tc":
                        continue
                    cells.append(
                        "\n".join(
                            _run_text(p) for p in tc if _ln(p.tag) == "p"
                        )
                    )
                rows.append(cells)
            out["tables"].append(rows)
    return out
