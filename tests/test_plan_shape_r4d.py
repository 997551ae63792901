"""Plan-shape invariants for the r4d search rewrite: the broadcast
query-term probe must sit BELOW the tf aggregate (so the (doc, token)
shuffle carries only query-term postings, never the full vocabulary),
and the per-query top-K must run through WindowGroupLimit (Spark's
two-stage group limit — the answer to the stop-word reducer flood the
module docstring used to defer)."""

import re

from ai_ocr_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"


def _depth(line: str) -> int:
    """Depth of a node in a Spark plan tree string = column where the
    operator name starts (children are printed under parents with a
    wider ':  '/'+- ' gutter)."""
    m = re.search(r"[A-Za-z]", line)
    return m.start() if m else 0


def _join_below_every_aggregate_above_generate(plan: str) -> bool:
    """For every 'Generate explode' leaf-side node, walking UP the tree
    (nearest strictly-shallower line) must meet a Join before any
    Aggregate — i.e. the term probe happens pre-shuffle."""
    lines = plan.splitlines()
    gens = [i for i, ln in enumerate(lines) if "Generate explode" in ln]
    assert gens, plan
    for g in gens:
        d = _depth(lines[g])
        i = g - 1
        seen_join = False
        while i >= 0:
            di = _depth(lines[i])
            if di < d:
                d = di
                node = lines[i]
                if "Join" in node:
                    seen_join = True
                if "Aggregate" in node and not seen_join:
                    return False
            i -= 1
    return True


def test_keyword_probe_below_tf_aggregate(spark):
    from ai_ocr_spark.operators.search import search_keyword_topk

    df = search_keyword_topk(spark, SF)
    lp = df._jdf.queryExecution().optimizedPlan().toString()
    assert _join_below_every_aggregate_above_generate(lp), lp


def test_bm25_probe_below_tf_aggregate(spark):
    """BM25's stats scan aggregates size(tokens) WITHOUT exploding
    (no Generate), so the same walk applies: every exploded token
    stream is term-filtered before any aggregate."""
    from ai_ocr_spark.operators.search import search_bm25_topk

    df = search_bm25_topk(spark, SF)
    lp = df._jdf.queryExecution().optimizedPlan().toString()
    assert _join_below_every_aggregate_above_generate(lp), lp


def test_search_topk_uses_window_group_limit(spark):
    """row_number()<=K per query must compile to WindowGroupLimit:
    each map task forwards at most K rows per query into the final
    per-query sort, so a stop-word query cannot flood one reducer
    with the whole candidate set."""
    from ai_ocr_spark.operators.search import (
        search_bm25_topk,
        search_keyword_topk,
    )

    for fn in (search_keyword_topk, search_bm25_topk):
        plan = formatted_plan(fn(spark, SF))
        assert "WindowGroupLimit" in plan, plan[:2000]


def test_index_refresh_probe_below_aggregate_and_group_limit(spark):
    """Both the base-index build and the increment scan must term-probe
    before their tf aggregates, and the serve-side top-K must be a
    WindowGroupLimit — same invariants as the batch rankers."""
    from ai_ocr_spark.operators.search import search_index_refresh

    df = search_index_refresh(spark, SF)
    lp = df._jdf.queryExecution().optimizedPlan().toString()
    assert _join_below_every_aggregate_above_generate(lp), lp
    plan = formatted_plan(df)
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_etld1_dim_variant_matches_literal_and_broadcasts(spark):
    """The broadcast-dimension PSL variant must produce row-identical
    output to the literal-array projection (the value check for the
    documented graduation path) with the rule join broadcast, never
    shuffled or cartesian."""
    from ai_ocr_spark.operators.textstats import (
        url_domain_etld1,
        url_domain_etld1_dim,
    )

    a = (
        url_domain_etld1(spark, SF)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        url_domain_etld1_dim(spark, SF)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b[a.columns])
    # longest-match must actually bind: a known multi-label suffix row
    assert (a["public_suffix"] == "co.uk").any()
    plan = formatted_plan(url_domain_etld1_dim(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
