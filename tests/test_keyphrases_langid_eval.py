"""text_keyphrases and langid_eval_confusion invariants.

Keyphrases: an independent Python recompute of the integer TF-IDF
pipeline (token counts -> df -> table-ln idf -> per-doc top-K) must
match exactly, and the plan must keep the per-doc top-K as a group
limit. Confusion: the 25-cell grid must tile the corpus exactly, its
diagonal must agree with text_langid_ngram's own `correct` flags, and
every truth class must be classified correctly more often than any
single confusion (diagonal row-dominance — the trained-classifier
sanity floor).
"""

import re

SF = "/root/testdata/sf0.001"


def _iln(v, LN2, LNPREC, TABLE):
    L = v.bit_length()
    mant = (v >> max(L - 9, 0)) - 256
    return (L - 1) * LN2 + TABLE[mant] - LNPREC


def test_keyphrases_match_python(spark):
    from ai_ocr_spark.operators.quality_lm import (
        KEYPHRASE_K,
        PREC,
        text_keyphrases,
    )
    from ai_ocr_spark.operators.search import (
        BM25_LN2,
        BM25_LN_TABLE,
        BM25_LNPREC,
    )

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    tf, dfc = {}, {}
    for r in rows:
        seen = set()
        for t in re.sub(r"\s+", " ", (r.text or "").lower()).strip().split(" "):
            if t:
                tf[(r.doc_id, t)] = tf.get((r.doc_id, t), 0) + 1
                seen.add(t)
        for t in seen:
            dfc[t] = dfc.get(t, 0) + 1
    n_docs = len(rows)
    expected = {}
    by_doc = {}
    for (d, t), c in tf.items():
        idf = _iln(
            ((n_docs + 1) * PREC) // dfc[t],
            BM25_LN2,
            BM25_LNPREC,
            BM25_LN_TABLE,
        )
        by_doc.setdefault(d, []).append((c * idf, t, c, dfc[t]))
    for d, lst in by_doc.items():
        lst.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, t, c, df) in enumerate(lst[:KEYPHRASE_K], start=1):
            expected[(d, rank)] = (t, c, df, s)

    got = {
        (r.doc_id, r.rank): (r.token, r.tf, r.df, r.score_scaled)
        for r in text_keyphrases(spark, SF).collect()
    }
    assert got == expected
    assert got, "no keyphrases extracted — vacuous"


def test_keyphrases_plan_keeps_group_limit(spark):
    from ai_ocr_spark.operators.quality_lm import text_keyphrases

    plan = text_keyphrases(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_confusion_tiles_corpus_and_diag_matches_correct_flags(spark):
    from ai_ocr_spark.operators.textstats import (
        LANG_LABELS,
        langid_eval_confusion,
        text_langid_ngram,
    )

    cells = langid_eval_confusion(spark, SF).collect()
    assert len(cells) == len(LANG_LABELS) ** 2
    total = sum(r.n for r in cells)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert total == n_docs

    n_correct = sum(
        1 for r in text_langid_ngram(spark, SF).collect() if r.correct
    )
    diag = sum(r.n for r in cells if r.lang == r.pred_lang)
    assert diag == n_correct

    # row/col totals are consistent with the cells themselves
    by_row, by_col = {}, {}
    for r in cells:
        by_row[r.lang] = by_row.get(r.lang, 0) + r.n
        by_col[r.pred_lang] = by_col.get(r.pred_lang, 0) + r.n
    for r in cells:
        assert r.row_total == by_row[r.lang]
        assert r.col_total == by_col[r.pred_lang]
        if r.row_total > 0:
            assert r.recall_cell_e6 == (1000000 * r.n) // r.row_total
        if r.col_total > 0:
            assert r.precision_cell_e6 == (1000000 * r.n) // r.col_total


def test_confusion_diagonal_dominates_rows(spark):
    from ai_ocr_spark.operators.textstats import langid_eval_confusion

    cells = langid_eval_confusion(spark, SF).collect()
    rows = {}
    for r in cells:
        rows.setdefault(r.lang, {})[r.pred_lang] = r.n
    for lang, preds in rows.items():
        off = [n for p, n in preds.items() if p != lang]
        assert preds.get(lang, 0) > max(off), (lang, preds)
