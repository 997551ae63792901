"""text_zipf_fit invariants: the integer OLS must equal an independent
Python recompute of the full pipeline (token counts -> deterministic
top-64 ranks -> table-based integer ln -> exact slope), the slope must
be negative (frequency falls with rank), and it must track a float OLS
over the same points to table precision."""

import re

SF = "/root/testdata/sf0.001"


def _iln(v, LN2, LNPREC, TABLE):
    L = v.bit_length()
    mant = (v >> max(L - 9, 0)) - 256
    return (L - 1) * LN2 + TABLE[mant] - LNPREC


def _tdiv(a, b):
    """Truncating integer division — Spark DIV and DuckDB // both round
    toward zero (iln(PREC) is a small NEGATIVE from table rounding, so
    Python's flooring // would give -1 where both engines give 0)."""
    return -((-a) // b) if a < 0 else a // b


def _python_zipf(spark):
    from ai_ocr_spark.operators.quality_lm import (
        PREC,
        ZIPF_DOWN,
        ZIPF_OUT,
        ZIPF_RANKS,
    )
    from ai_ocr_spark.operators.search import (
        BM25_LN2,
        BM25_LN_TABLE,
        BM25_LNPREC,
    )

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    counts = {}
    for r in rows:
        for t in re.sub(r"\s+", " ", (r.text or "").lower()).strip().split(" "):
            if t:
                counts[(r.source, t)] = counts.get((r.source, t), 0) + 1

    out, pts_by_src = {}, {}
    for src in {s for s, _ in counts}:
        toks = sorted(
            ((c, t) for (s, t), c in counts.items() if s == src),
            key=lambda ct: (-ct[0], ct[1]),
        )[:ZIPF_RANKS]
        pts = []
        for rnk, (c, t) in enumerate(toks, start=1):
            x = _tdiv(_iln(rnk * PREC, BM25_LN2, BM25_LNPREC, BM25_LN_TABLE), ZIPF_DOWN)
            y = _tdiv(_iln(c * PREC, BM25_LN2, BM25_LNPREC, BM25_LN_TABLE), ZIPF_DOWN)
            pts.append((x, y, c))
        n = len(pts)
        if n < 2:
            continue
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        q = (ZIPF_OUT * abs(num)) // den
        out[src] = (n, max(p[2] for p in pts), -q if num < 0 else q)
        pts_by_src[src] = pts
    return out, pts_by_src


def test_zipf_matches_python_and_is_negative(spark):
    from ai_ocr_spark.operators.quality_lm import text_zipf_fit

    expected, pts_by_src = _python_zipf(spark)
    got = {
        r.source: (r.n_ranks, r.top1_cnt, r.slope_e6)
        for r in text_zipf_fit(spark, SF).collect()
    }
    assert got == expected
    assert got, "no sources fitted — vacuous"
    for src, (_, _, slope) in got.items():
        assert slope < 0, (src, slope)


def test_zipf_tracks_float_ols(spark):
    """The table-based integer slope must track an independent float
    OLS over exact ln(rank)/ln(cnt) points to well under the ~2^-8
    table precision accumulated through the fit."""
    import math

    from ai_ocr_spark.operators.quality_lm import ZIPF_OUT, text_zipf_fit

    _, pts_by_src = _python_zipf(spark)
    got = {r.source: r.slope_e6 for r in text_zipf_fit(spark, SF).collect()}
    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("source", "text")
        .collect()
    )
    counts = {}
    for r in rows:
        for t in re.sub(r"\s+", " ", (r.text or "").lower()).strip().split(" "):
            if t:
                counts[(r.source, t)] = counts.get((r.source, t), 0) + 1
    for src, slope_e6 in got.items():
        from ai_ocr_spark.operators.quality_lm import ZIPF_RANKS

        toks = sorted(
            ((c, t) for (s, t), c in counts.items() if s == src),
            key=lambda ct: (-ct[0], ct[1]),
        )[:ZIPF_RANKS]
        xs = [math.log(i) for i in range(1, len(toks) + 1)]
        ys = [math.log(c) for c, _ in toks]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        f_slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert abs(slope_e6 / ZIPF_OUT - f_slope) < 0.02, (
            src,
            slope_e6,
            f_slope,
        )


def _python_degree_fit(spark):
    """Independent recompute of graph_degree_powerlaw: synthetic edge
    rule -> in-degree histogram -> integer OLS (truncating division,
    same engine semantics as the zipf twin)."""
    import math

    from ai_ocr_spark.operators.graph import DEG_DOWN, DEG_OUT, PR_FANOUT
    from ai_ocr_spark.operators.quality_lm import PREC
    from ai_ocr_spark.operators.search import (
        BM25_LN2,
        BM25_LN_TABLE,
        BM25_LNPREC,
    )

    ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(ids)
    edges = set()
    for src in ids:
        for j in range(1, PR_FANOUT + 1):
            dst = (src * src + j * 31 + 7) % n
            if dst != src:
                edges.add((src, dst))
    indeg = {}
    for _, dst in edges:
        indeg[dst] = indeg.get(dst, 0) + 1
    hist = {}
    for d in indeg.values():
        hist[d] = hist.get(d, 0) + 1
    pts = [
        (
            _tdiv(_iln(d * PREC, BM25_LN2, BM25_LNPREC, BM25_LN_TABLE), DEG_DOWN),
            _tdiv(_iln(c * PREC, BM25_LN2, BM25_LNPREC, BM25_LN_TABLE), DEG_DOWN),
        )
        for d, c in hist.items()
    ]
    np_ = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    num = np_ * sxy - sx * sy
    den = np_ * sxx - sx * sx
    q = (DEG_OUT * abs(num)) // den
    slope = -q if num < 0 else q
    # float OLS over the true ln points for the tracking bound
    fx = [math.log(d) for d in hist]
    fy = [math.log(c) for c in hist.values()]
    fsx, fsy = sum(fx), sum(fy)
    fsxy = sum(a * b for a, b in zip(fx, fy))
    fsxx = sum(a * a for a in fx)
    f_slope = (np_ * fsxy - fsx * fsy) / (np_ * fsxx - fsx * fsx)
    return (np_, sum(hist.values()), max(hist), slope), f_slope


def test_degree_powerlaw_matches_python_and_tracks_float(spark):
    from ai_ocr_spark.operators.graph import DEG_OUT, graph_degree_powerlaw

    expected, f_slope = _python_degree_fit(spark)
    rows = graph_degree_powerlaw(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_points, r.n_linked, r.max_deg, r.slope_e6) == expected
    # the quadratic edge rule produces a skewed, DECREASING in-degree
    # spectrum (hubs are rare) — the fitted exponent must be negative
    assert r.slope_e6 < 0, r
    assert abs(r.slope_e6 / DEG_OUT - f_slope) < 0.02, (r.slope_e6, f_slope)
