"""Physical-plan shape of the round-2 operators — scale invariants
asserted, not eyeballed (same discipline as test_plan_shape.py)."""

import re

SF = "/root/testdata/sf0.001"


def test_ivf_centroid_pick_is_topk_not_full_sort(spark):
    """The fixed-K centroid sample must plan as TakeOrderedAndProject
    (top-K, no global sort) and feed broadcast joins — a full Sort of
    the corpus to pick 32 rows would be a scale bug."""
    from ai_ocr_spark.operators.similarity import ann_ivf_topk
    from ai_ocr_spark.plans.audit import formatted_plan

    plan = formatted_plan(ann_ivf_topk(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ivf_candidate_join_is_equi_not_nested_loop(spark):
    from ai_ocr_spark.operators.similarity import ann_ivf_topk
    from ai_ocr_spark.plans.audit import formatted_plan

    plan = formatted_plan(ann_ivf_topk(spark, SF))
    # the corpus-side candidate join must never be a cartesian product
    assert "CartesianProduct" not in plan


def test_roundtrip_builders_broadcast_the_key_set(spark):
    """The first-N-orderkeys key set joins lineitem via broadcast: the
    big fact side must not shuffle for a 50-row dimension."""
    from ai_ocr_spark.operators.roundtrip_fields import _invoice_pages
    from ai_ocr_spark.operators.roundtrip_xlsx import _xlsx_pages
    from ai_ocr_spark.plans.audit import formatted_plan

    for builder in (_invoice_pages, _xlsx_pages):
        plan = formatted_plan(builder(spark, SF))
        assert "BroadcastHashJoin" in plan, plan[:1200]


def test_minhash_digest_cache_materializes_once(spark):
    """The digest table must appear as an InMemoryRelation consumed by
    all three references (bands + both verify sides) — the md5 work runs
    once, not inlined per consumer."""
    from ai_ocr_spark.operators.dedup import dedup_minhash_lsh
    from ai_ocr_spark.plans.audit import formatted_plan

    plan = formatted_plan(dedup_minhash_lsh(spark, SF))
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan
    # the shingle-digest construction (md5 inside a transform over shd)
    # must live ONLY inside the cached subplan — if CollapseProject ever
    # inlines it into the banding/verify stages it appears above the
    # first InMemoryRelation marker and re-runs per consumer
    before_cache = plan.split("InMemoryRelation", 1)[0]
    assert not re.search(r"transform\(shd.*md5", before_cache), before_cache[-1500:]
    assert re.search(r"transform\(shd.*md5", plan)  # marker is detectable at all


def test_srp_signature_cache_in_plan(spark):
    from ai_ocr_spark.operators.similarity import dedup_embedding_lsh
    from ai_ocr_spark.plans.audit import formatted_plan

    plan = formatted_plan(dedup_embedding_lsh(spark, SF))
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan


def test_dedup_caches_are_wide_not_single_task(spark):
    """The persisted hash tables must be repartitioned to >1 partition:
    a single-split input would otherwise serialize the whole hash pass
    on one task (measured 8x wall at sf0.1)."""
    from ai_ocr_spark.operators import dedup as D

    sh = D._shingled(spark, SF, 3)
    assert sh.rdd.getNumPartitions() >= 8


def test_textstats_are_scan_only(spark):
    """Text-analysis projections must not shuffle — they ride the scan."""
    from ai_ocr_spark.operators.textstats import text_quality_scores
    from ai_ocr_spark.plans.audit import count_exchanges

    assert count_exchanges(text_quality_scores(spark, SF)) == 0
