"""Plan-shape invariants for the r4c operators (LSH recall, politeness
scheduling, sitemap discovery, eTLD+1, NFC): the physical shapes the
100-TB story depends on, pinned against the pre-execution formatted
plan."""

import re

from ai_ocr_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"


def test_lsh_recall_no_cartesian_anywhere(spark):
    """Both the truth inverted-index self-join and the band self-join
    are equi-joins; the three one-row count frames crossJoin as
    broadcast nested loops — but no CartesianProduct may appear."""
    from ai_ocr_spark.operators.dedup import dedup_lsh_recall

    plan = formatted_plan(dedup_lsh_recall(spark, SF))
    assert "CartesianProduct" not in plan


def test_schedule_waves_window_partitions_on_host(spark):
    """The politeness window must partition BY HOST — a global
    (unpartitioned) window would serialize the whole frontier on one
    task at scale."""
    from ai_ocr_spark.operators.links import crawl_schedule_waves

    plan = formatted_plan(crawl_schedule_waves(spark, SF))
    assert "CartesianProduct" not in plan
    # the window spec must mention host as its partition key
    assert re.search(r"windowspecdefinition\(host", plan) or re.search(
        r"Window \[.*\], \[host", plan
    ), plan


def test_sitemap_discover_shapes(spark):
    """Sitemap build is a host-keyed aggregate; parsing is scan-side
    explode; the known/new flag is one equi-join — no cartesian, no
    Python boundary."""
    from ai_ocr_spark.operators.links import sitemap_discover

    plan = formatted_plan(sitemap_discover(spark, SF))
    assert "CartesianProduct" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_etld1_is_pure_projection(spark):
    """eTLD+1 extraction runs at scan speed: no Exchange, no join, no
    Python — a single codegen projection."""
    from ai_ocr_spark.operators.textstats import url_domain_etld1

    plan = formatted_plan(url_domain_etld1(spark, SF))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_kn_joins_keep_skew_split_and_no_cartesian(spark):
    """All three KN join-backs ride the broadcast-head skew split
    (hot lanes broadcast) and the one-row NBB frame broadcasts — no
    CartesianProduct despite the crossJoin."""
    from ai_ocr_spark.operators.quality_lm import quality_perplexity_kn

    plan = formatted_plan(quality_perplexity_kn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # three skew-split head lanes + the NBB broadcast
    assert plan.count("BroadcastExchange") >= 4, plan


def test_nfc_single_python_boundary_no_shuffle(spark):
    """NFC normalization crosses Python exactly once (the sanctioned
    Arrow-batched unicodedata kernel) and never shuffles."""
    from ai_ocr_spark.operators.textstats import text_nfc_normalize

    plan = formatted_plan(text_nfc_normalize(spark, SF))
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1, plan
    assert "Exchange" not in plan, plan
