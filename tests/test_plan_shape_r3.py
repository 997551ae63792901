"""Round-3 plan-shape invariants: the new operators keep the physical
shapes the 100-TB story depends on."""

from pyspark.sql import functions as F  # noqa: F401

from ai_ocr_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"


def test_sniff_roundtrip_is_scan_only(spark):
    """The sniff oracle surface must stay a pure projection: no
    shuffle, no join — it runs at scan speed on 100 TB."""
    from ai_ocr_spark.sources.pages import sniff_roundtrip

    plan = formatted_plan(sniff_roundtrip(spark, SF))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_unigram_rarity_head_is_broadcast_and_no_cartesian(spark):
    """The skew split must survive optimization: the frequency head
    joins as a broadcast (hot Zipf tokens never ride the shuffle) and
    nothing degenerates to a cartesian product."""
    from ai_ocr_spark.operators.textstats import text_unigram_rarity

    plan = formatted_plan(text_unigram_rarity(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the frequency build must keep its map-side partial aggregation
    # (the skew-safe half of the corpus-statistics plan)
    assert "partial_count" in plan or "HashAggregate" in plan


def test_xls_roundtrip_single_python_boundary(spark):
    """The xls pipeline keeps the fused-kernel contract: exactly one
    Python crossing for the extraction itself (the page-build
    mapInPandas is a fixture synthesizer, not part of the extract
    path)."""
    from ai_ocr_spark.operators.roundtrip_xls import pipeline_xls_roundtrip

    import re

    plan = formatted_plan(pipeline_xls_roundtrip(spark, SF))
    # formatted output lists every node twice (tree + detail section);
    # count the numbered detail headers = physical nodes
    nodes = re.findall(r"\(\d+\) MapInPandas", plan)
    assert len(nodes) == 2  # synth + ONE extract stage
    assert "CartesianProduct" not in plan


def test_substring_spans_no_cartesian_and_partial_aggs(spark):
    """The span-dedup plan must stay bucketed: hash join back on the
    window hash (never a cartesian product) and the distinct-doc
    frequency build keeps map-side partial aggregation."""
    from ai_ocr_spark.operators.dedup import dedup_substring_spans

    plan = formatted_plan(dedup_substring_spans(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_gopher_rep_argmax_is_aggregate_not_nested_hof(spark):
    """The 2-gram argmax must stay the explode->aggregate->row_number
    shape: a per-row nested-HOF argmax re-evaluates the gram
    construction per probe (no CSE inside HOF lambdas; measured 286s
    vs ~1s on 500 rows). Pin the aggregate + window and the absence of
    any join degenerating to nested-loop."""
    from ai_ocr_spark.operators.textstats import quality_filter_gopher_rep

    plan = formatted_plan(quality_filter_gopher_rep(spark, SF))
    assert "HashAggregate" in plan
    # the argmax itself: a row_number window partitioned on the doc
    # key, with the rn=1 filter pushed into a group-limit (Spark only
    # keeps the per-partition top row, never materializing full ranks)
    assert "row_number()" in plan
    assert "WindowGroupLimit" in plan
    assert "[doc_id" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_length_percentiles_partial_agg_before_window(spark):
    """The percentile plan must collapse (lang, len) map-side BEFORE
    any exchange — the corpus never reaches the cumulative window raw.
    No join anywhere; two hash aggregates (partial + final) feed one
    small window."""
    from ai_ocr_spark.operators.sketch import agg_length_percentiles

    plan = formatted_plan(agg_length_percentiles(spark, SF))
    assert "Join" not in plan
    assert "partial_count" in plan
    assert "Window" in plan


def test_search_topk_query_side_broadcasts(spark):
    """Retrieval keeps the inverted-index shape: query terms and idf
    weights reach the corpus as broadcasts (the only corpus-side
    shuffle is the tf partial-combine), and nothing degenerates to a
    cartesian or nested-loop join against the corpus."""
    from ai_ocr_spark.operators.search import search_keyword_topk

    plan = formatted_plan(search_keyword_topk(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan


def test_search_bm25_keeps_the_broadcast_shape(spark):
    """Length normalization must not change the distributed shape:
    query terms, idf weights, and the 1-row corpus stats all reach the
    corpus as broadcasts; dl rides the tf groupBy key, so no extra
    corpus-side exchange appears vs search_keyword_topk."""
    from ai_ocr_spark.operators.search import search_bm25_topk

    plan = formatted_plan(search_bm25_topk(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan


def test_stratified_split_single_stratum_shuffle(spark):
    """The split is one shuffle on the stratum key: both window
    functions (rank + stratum count) share the same partitioning, so
    exactly one exchange appears and it keys on source."""
    import re

    from ai_ocr_spark.operators.sketch import sample_stratified_split

    plan = formatted_plan(sample_stratified_split(spark, SF))
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1
    assert "hashpartitioning(source" in plan
