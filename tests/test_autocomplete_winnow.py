"""search_autocomplete and text_winnow_fingerprints invariants.

Autocomplete: an independent Python recompute of the prefix index must
match exactly, and served completions must actually extend their
prefix. Winnowing: a faithful Python implementation of the SIGMOD'03
algorithm (k-gram md5 hashes, rightmost-min window selection, distinct
(pos, hash) pairs, xor digest) must match every per-doc rollup, the
measured density must sit near the 2/(w+1) winnowing guarantee, and
the plan must stay shuffle-free (winnowing is embarrassingly per-doc).
"""

import hashlib
import re

SF = "/root/testdata/sf0.001"


def _h15(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _norm(text):
    return re.sub(r"\s+", " ", (text or "").lower()).strip()


def test_autocomplete_matches_python(spark):
    from ai_ocr_spark.operators.search import (
        AC_MIN_CNT,
        AC_PREFIX_LENS,
        AC_TOP_K,
        search_autocomplete,
    )

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("text")
        .collect()
    )
    cnt = {}
    for r in rows:
        for t in _norm(r.text).split(" "):
            if t:
                cnt[t] = cnt.get(t, 0) + 1
    pref = {}
    for t, c in cnt.items():
        if c < AC_MIN_CNT:
            continue
        for p in AC_PREFIX_LENS:
            if len(t) >= p:
                pref.setdefault(t[:p], []).append((c, t))
    expected = {}
    for p, lst in pref.items():
        lst.sort(key=lambda ct: (-ct[0], ct[1]))
        for rank, (c, t) in enumerate(lst[:AC_TOP_K], start=1):
            expected[(p, rank)] = (t, c)

    got = {
        (r.prefix, r.rank): (r.token, r.cnt)
        for r in search_autocomplete(spark, SF).collect()
    }
    assert got == expected
    assert got, "empty autocomplete index — vacuous"
    for (p, _), (t, _) in got.items():
        assert t.startswith(p), (p, t)


def _python_winnow(spark):
    from ai_ocr_spark.operators.textstats import WINNOW_K, WINNOW_W

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    out = {}
    for r in rows:
        s = _norm(r.text)
        n = len(s) - (WINNOW_K - 1)
        if n < 1:
            out[r.doc_id] = (0, 0, 0, 0)
            continue
        hs = [_h15(s[i : i + WINNOW_K]) for i in range(n)]
        ww = min(WINNOW_W, n)
        wn = max(n - WINNOW_W + 1, 1)
        fps = set()
        for i in range(wn):
            sl = hs[i : i + ww]
            m = min(sl)
            jmax = max(j for j, v in enumerate(sl) if v == m)
            fps.add((i + jmax + 1, m))  # 1-based position
        digest = 0
        for pos, h in fps:
            digest ^= _h15(f"{pos}:{h}")
        out[r.doc_id] = (n, len(fps), digest, (1000000 * len(fps)) // n)
    return out


def test_winnow_matches_python(spark):
    from ai_ocr_spark.operators.textstats import text_winnow_fingerprints

    expected = _python_winnow(spark)
    got = {
        r.doc_id: (r.n_kgrams, r.n_fp, r.fp_digest, r.density_e6)
        for r in text_winnow_fingerprints(spark, SF).collect()
    }
    assert got == expected
    assert got, "no documents fingerprinted — vacuous"


def test_winnow_density_near_guarantee(spark):
    """Winnowing's expected density is 2/(w+1) for random hashes
    (SIGMOD'03 Thm 2); real text repeats push it around, so pin a
    generous band that still catches an off-by-one in the window
    arithmetic (which shifts density by ~1/w)."""
    from ai_ocr_spark.operators.textstats import (
        WINNOW_W,
        text_winnow_fingerprints,
    )

    rows = [
        r
        for r in text_winnow_fingerprints(spark, SF).collect()
        if r.n_kgrams >= 100
    ]
    assert rows
    dens = sum(r.density_e6 for r in rows) / len(rows) / 1e6
    target = 2 / (WINNOW_W + 1)
    assert 0.6 * target < dens < 1.5 * target, (dens, target)


def test_winnow_plan_is_shuffle_free(spark):
    from ai_ocr_spark.operators.textstats import text_winnow_fingerprints

    plan = (
        text_winnow_fingerprints(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only Exchange allowed is the explicit round-robin width
    # repartition of the one-split testdata parquet (CLAUDE.md footgun);
    # winnowing itself must add no shuffle
    assert plan.count("Exchange") == plan.count("RoundRobinPartitioning"), (
        plan[:2000]
    )


def test_winnow_pairs_match_python(spark):
    from ai_ocr_spark.operators.dedup import (
        WINNOW_PAIR_CAP,
        WINNOW_PAIR_MIN_SHARED,
        dedup_winnow_pairs,
    )
    from ai_ocr_spark.operators.textstats import WINNOW_K, WINNOW_W

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    hsets = {}
    for r in rows:
        s = _norm(r.text)
        n = len(s) - (WINNOW_K - 1)
        if n < 1:
            hsets[r.doc_id] = set()
            continue
        hs = [_h15(s[i : i + WINNOW_K]) for i in range(n)]
        ww = min(WINNOW_W, n)
        wn = max(n - WINNOW_W + 1, 1)
        sel = set()
        for i in range(wn):
            sl = hs[i : i + ww]
            sel.add(min(sl))
        hsets[r.doc_id] = sel
    docs_per_h = {}
    for d, hh in hsets.items():
        for h in hh:
            docs_per_h.setdefault(h, []).append(d)
    shared = {}
    for h, ds in docs_per_h.items():
        if not (2 <= len(ds) <= WINNOW_PAIR_CAP):
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] = shared.get((ds[i], ds[j]), 0) + 1
    expected = {
        pair: (
            c,
            len(hsets[pair[0]]),
            len(hsets[pair[1]]),
            (1000000 * c) // min(len(hsets[pair[0]]), len(hsets[pair[1]])),
        )
        for pair, c in shared.items()
        if c >= WINNOW_PAIR_MIN_SHARED
    }
    got = {
        (r.doc_a, r.doc_b): (r.shared, r.n_fp_a, r.n_fp_b, r.containment_e6)
        for r in dedup_winnow_pairs(spark, SF).collect()
    }
    assert got == expected
    assert got, "no winnow pairs found — vacuous"


def test_winnow_top_pair_shares_real_substring(spark):
    """Winnowing's whole point: a high-containment pair must actually
    share a substring of length >= k + w - 1 (the detection guarantee
    run in reverse as a sanity witness on real data)."""
    from difflib import SequenceMatcher

    from ai_ocr_spark.operators.dedup import dedup_winnow_pairs
    from ai_ocr_spark.operators.textstats import WINNOW_K, WINNOW_W

    top = (
        dedup_winnow_pairs(spark, SF)
        .orderBy("containment_e6", ascending=False)
        .limit(1)
        .collect()[0]
    )
    texts = {
        r.doc_id: _norm(r.text)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(f"doc_id IN ({top.doc_a}, {top.doc_b})")
        .collect()
    }
    a, b = texts[top.doc_a], texts[top.doc_b]
    m = SequenceMatcher(None, a, b, autojunk=False).find_longest_match(
        0, len(a), 0, len(b)
    )
    assert m.size >= WINNOW_K + WINNOW_W - 1, (top, m.size)
