"""Plan-shape invariants for the r4b crawl-artifact operators: the
physical shapes the 100-TB story depends on, pinned against the
pre-execution formatted plan."""

import re

from ai_ocr_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"


def test_robots_gate_probe_is_broadcast_and_shuffle_free(spark):
    """The frontier probe joins a |domains|-row rules table: the plan
    must carry it as a BroadcastHashJoin — an Exchange on the frontier
    side for a dimension-sized join would shuffle the whole discovered
    link set at scale."""
    from ai_ocr_spark.operators.links import filter_robots_gate

    plan = formatted_plan(filter_robots_gate(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_anchor_index_windows_partition_on_the_target_key(spark):
    """Both aggregates and the top-anchor window key on the resolved
    target — no stage may collapse to a single partition."""
    from ai_ocr_spark.operators.links import anchor_text_index

    plan = formatted_plan(anchor_text_index(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    # partial aggregation before the shuffle (map-side combine)
    assert "partial_count" in plan


def test_cdx_running_sum_stays_bucket_keyed(spark):
    """The offset prefix sum windows per bucket stream; a global-order
    window (single partition) would serialize the whole index."""
    from ai_ocr_spark.operators.roundtrip import warc_cdx_index

    plan = formatted_plan(warc_cdx_index(spark, SF))
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    # exactly one Python boundary: the fused extraction kernel
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1


def test_wet_roundtrip_has_exactly_two_python_boundaries(spark):
    """extract (fused kernels) + re-ingest (record walker) — the WET
    writer itself must stay a pure JVM projection, so exactly two
    MapInPandas nodes and no per-record Python in between."""
    from ai_ocr_spark.operators.roundtrip import pipeline_wet_roundtrip

    plan = formatted_plan(pipeline_wet_roundtrip(spark, SF))
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 2
    assert "CartesianProduct" not in plan


def test_crawl_delta_joins_on_fingerprint_keys_only(spark):
    """The full outer join moves url + two 16-byte fingerprints — the
    text column must be pruned out of both scan sides."""
    from ai_ocr_spark.operators.dedup import crawl_delta_report

    plan = formatted_plan(crawl_delta_report(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    # the md5 collapses text BEFORE the shuffle: no Exchange block
    # (the detail section describing what actually moves) mentions the
    # raw text column
    exchange_blocks = re.findall(
        r"\(\d+\) Exchange\n(?:[^\n(]*\n)*", plan
    )
    assert exchange_blocks, "expected shuffle exchanges in a full outer join"
    for block in exchange_blocks:
        assert "text#" not in block, block


def test_mojibake_is_a_pure_scan_projection(spark):
    """Scan-speed op: no Exchange, no join, no Python anywhere."""
    from ai_ocr_spark.operators.textstats import text_fix_mojibake

    plan = formatted_plan(text_fix_mojibake(spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "MapInPandas" not in plan
