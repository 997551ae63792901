"""Property-based kernel tests (hypothesis): the robustness the
reference lacks entirely (SURVEY §5: no property tests upstream).

These pin the invariants the 100-TB pipeline depends on: kernels never
raise on adversarial bytes, canonicalization is idempotent, and the
normalizers keep the reference's exact precedence semantics.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_ocr_spark.kernels.html import collapse_ws, extract_main_text, sniff_kind
from ai_ocr_spark.kernels.oracle import extract_one


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_one_never_raises_on_arbitrary_bytes(payload):
    r = extract_one("https://x.example.com/p", payload)
    assert isinstance(r["main_text"], str)
    assert 0.0 <= r["confidence"] <= 1.0
    assert r["content_kind"] in {"empty", "pdf", "csv", "html", "text", "binary"}


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=2048))
def test_extract_one_never_raises_on_arbitrary_html(body):
    payload = f"<html><body><p>{body}</p></body></html>".encode()
    r = extract_one("https://x.example.com/p", payload)
    assert isinstance(r["main_text"], str)


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=512))
def test_collapse_ws_idempotent_and_canonical(s):
    c = collapse_ws(s)
    assert collapse_ws(c) == c  # idempotent
    assert "  " not in c and "\t" not in c and "\n" not in c
    assert c == c.strip()


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_sniff_kind_total_function(payload):
    assert sniff_kind(payload) in {"empty", "pdf", "csv", "html", "text", "binary"}


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF), max_size=256))
def test_main_text_extraction_idempotent_canonical_form(text):
    """strip(wrap(x)) is already canonical: re-wrapping and re-stripping
    the output must be a fixed point (the byte-identity backbone)."""
    html = f"<html><body><article><p>{_esc(text)}</p></article></body></html>"
    once = extract_main_text(html)
    again = extract_main_text(
        f"<html><body><article><p>{_esc(once)}</p></article></body></html>"
    )
    assert again == once


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


@settings(max_examples=300, deadline=None)
@given(
    # the reference's date regexes assume 4-digit years
    # (schema_validator.py:110-137); pre-1000 dates render 3 digits and
    # correctly pass through unchanged
    st.dates(min_value=__import__("datetime").date(1000, 1, 1)),
    st.sampled_from(["%Y-%m-%d", "%m/%d/%Y", "%d.%m.%Y"]),
)
def test_date_normalize_precedence_roundtrip(d, fmt):
    """Any date rendered in one of the reference's three accepted formats
    normalizes to ISO (schema_validator.py:249-261 precedence)."""
    from ai_ocr_spark.kernels.normalize import normalize_date

    rendered = d.strftime(fmt)
    norm = normalize_date(rendered)
    # ambiguity: MM/DD vs DD.MM can both parse when day<=12; the
    # precedence contract is "first matching format wins", so normalizing
    # the *rendered* string must never fail and must emit ISO shape
    assert norm is not None
    import re

    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", norm)


@settings(max_examples=300, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_amount_normalize_total(v):
    from ai_ocr_spark.kernels.normalize import normalize_amount

    out = normalize_amount(f"${v:,.2f}")
    assert isinstance(out, float)


# --- round-2 kernel round-trips ----------------------------------------------

_CELL = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs", "Cc")
        ),
        max_size=20,
    ),
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
                min_size=1,
                max_size=16,
            ),
            st.lists(st.lists(_CELL, max_size=5), max_size=6),
        ),
        min_size=1,
        max_size=3,
    ),
    st.text(max_size=30),
    st.text(max_size=20),
)
def test_xlsx_emit_parse_roundtrip(sheets, title, author):
    """emit_xlsx -> parse_xlsx round-trips sheet names (in order), cell
    values (ints as their decimal text), and core props for arbitrary
    content — including XML metacharacters and quotes in names."""
    from ai_ocr_spark.kernels.xlsx import emit_xlsx, parse_xlsx

    import re

    drop = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\ufffe\uffff]")

    def sanitize(x: str) -> str:
        return drop.sub("", x)

    wb = parse_xlsx(emit_xlsx(sheets, title=title, author=author))
    assert [s["name"] for s in wb["sheets"]] == [
        sanitize(name) for name, _ in sheets
    ]
    for parsed, (_name, rows) in zip(wb["sheets"], sheets):
        assert parsed["rows"] == [
            [sanitize(str(c)) for c in row] for row in rows
        ]
    assert wb["title"] == sanitize(title) and wb["author"] == sanitize(author)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=600, allow_nan=False),
            st.floats(min_value=0, max_value=790, allow_nan=False),
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=255),
                min_size=1,
                max_size=30,
            ),
        ),
        min_size=1,
        max_size=10,
    ),
    st.booleans(),
)
def test_pdf_emit_extract_preserves_all_text(runs, compress):
    """Every emitted text run (non-whitespace content) appears in the
    extracted main_text, compressed or not — the parser may reorder by
    layout but never lose glyphs."""
    from ai_ocr_spark.kernels.html import collapse_ws
    from ai_ocr_spark.kernels.pdf import emit_pdf, extract_pdf_text

    text = extract_pdf_text(emit_pdf([runs], compress=compress))
    for _x, _y, s in runs:
        canon = collapse_ws(s)
        if canon:
            assert canon in text


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
                min_size=1,
                max_size=16,
            ),
            st.lists(st.lists(_CELL, max_size=5), max_size=6),
        ),
        min_size=1,
        max_size=3,
    ),
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
        max_size=30,
    ),
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
        max_size=20,
    ),
)
def test_xls_emit_parse_roundtrip(sheets, title, author):
    """emit_xls -> parse_xls round-trips sheet names, cell values (ints
    as decimal text) and SummaryInformation props for arbitrary
    content — a binary format, so unlike the xlsx twin no XML
    sanitization applies. Only structural lossiness allowed: rows with
    zero cells at the END of a sheet have no records and are trimmed."""
    from ai_ocr_spark.kernels.xls import emit_xls, parse_xls

    wb = parse_xls(emit_xls(sheets, title=title, author=author))
    assert [s["name"] for s in wb["sheets"]] == [name for name, _ in sheets]
    for parsed, (_name, rows) in zip(wb["sheets"], sheets):
        want = [[str(c) for c in row] for row in rows]
        while want and not want[-1]:
            want.pop()
        assert parsed["rows"] == want
    assert wb["title"] == title
    assert wb["author"] == author


@settings(max_examples=300, deadline=None)
@given(
    word=st.text(alphabet="ab c", min_size=0, max_size=24).map(
        lambda s: s.replace(" ", "")
    ),
    left=st.sampled_from(["a", "b", "c", "ab", "bc", "abc"]),
    right=st.sampled_from(["a", "b", "c", "ab", "bc", "abc"]),
)
def test_bpe_fold_merge_equals_replace_first_iteration(word, left, right):
    """The cross-engine equivalence tokenizer_bpe_train rests on: the
    Spark-side LEFT FOLD merge (greedy left-to-right non-overlapping)
    produces the same symbol sequence as the DuckDB twin's
    leftmost-first single replacement iterated to fixpoint — for ANY
    symbol sequence and merge pair, including self-pairs over runs
    (a a a a) and multi-char symbols."""
    if not word:
        return
    # start from an arbitrary segmentation of `word` into the symbol
    # alphabet by greedy longest-match (deterministic), so multi-char
    # symbols occur
    syms, i = [], 0
    while i < len(word):
        for cand in ("abc", "ab", "bc", "a", "b", "c"):
            if word.startswith(cand, i):
                syms.append(cand)
                i += len(cand)
                break

    # Spark F.aggregate mirror: left fold
    folded: list[str] = []
    for x in syms:
        if folded and folded[-1] == left and x == right:
            folded[-1] = left + right
        else:
            folded.append(x)

    # DuckDB recursive-CTE mirror: replace FIRST occurrence, iterate
    pws = " " + " ".join(syms) + " "
    pat = f" {left} {right} "
    rep = f" {left}{right} "
    while pat in pws:
        k = pws.index(pat)
        pws = pws[:k] + rep + pws[k + len(pat):]
    assert pws.strip().split(" ") == folded


@settings(max_examples=500, deadline=None)
@given(x=st.integers(min_value=1, max_value=10**12))
def test_integer_ln_table_tracks_math_log(x):
    """The shared integer-ln (bit-length exponent + 256-entry mantissa
    table) that BM25, HLL, perplexity and entropy all ride: for any
    x >= 1, iln(x*PREC)/PREC approximates ln(x) within the table's
    ~2^-8 bucket width — the bound the quality scores' docstrings
    claim."""
    import math

    from ai_ocr_spark.operators.search import (
        BM25_LN2,
        BM25_LN_TABLE,
        BM25_LNPREC,
        BM25_PREC,
    )

    v = x * BM25_PREC
    bits = v.bit_length()
    iln = (
        (bits - 1) * BM25_LN2
        + BM25_LN_TABLE[(v >> max(bits - 9, 0)) - 256]
        - BM25_LNPREC
    )
    assert abs(iln / BM25_PREC - math.log(x)) < math.log(1 + 1 / 256) + 1e-4


@settings(max_examples=500, deadline=None)
@given(v=st.integers(min_value=0, max_value=2**62))
def test_logbin_quantile_bin_bounds(v):
    """The log-binned quantile sketch's bin math, pinned for ANY int64
    value (the fixtures only exercise document lengths): the decoded
    lower edge never exceeds v, v stays inside the bin's width, widths
    are within 1/16 relative, and bin ids are monotone in v."""
    from ai_ocr_spark.operators.sketch import QS_MBITS, QS_SUB

    def bin_id(x: int) -> int:
        if x < QS_SUB:
            return x
        bits = x.bit_length()
        sub = (x >> (bits - 1 - QS_MBITS)) - QS_SUB
        return QS_SUB + (bits - 1 - QS_MBITS) * QS_SUB + sub

    def edge(b: int) -> int:
        if b < QS_SUB:
            return b
        return (QS_SUB + (b - QS_SUB) % QS_SUB) * (
            2 ** ((b - QS_SUB) // QS_SUB)
        )

    b = bin_id(v)
    e = edge(b)
    assert e <= v
    width = 1 if v < QS_SUB else 2 ** (v.bit_length() - 1 - QS_MBITS)
    assert v < e + width
    assert width <= max(1, e // QS_SUB)
    # monotone: the next bin's edge starts past this bin
    assert edge(b + 1) > e
