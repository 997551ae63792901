"""Round-4 plan-shape invariants: the Pregel co-partition pin and the
new operators keep the physical shapes the 100-TB story depends on."""

import re

from pyspark.sql import functions as F

from ai_ocr_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"


def _physical_nodes(df):
    """Walk the (pre-adaptive) physical plan via py4j and return node
    names in tree order, STOPPING at cache boundaries — the cached
    build plan's internal exchanges ran once at persist time and must
    not count against the per-iteration shape. Also returns whether
    any Exchange sits between the root and an InMemoryTableScan (the
    'edge table re-shuffled' smell the Pregel pin forbids)."""
    jp = df._jdf.queryExecution().executedPlan()
    if jp.nodeName() == "AdaptiveSparkPlan":
        jp = jp.initialPlan()
    names: list[str] = []
    cache_under_exchange = [False]

    def walk(node, exch_below_join):
        name = node.nodeName()
        names.append(name)
        if "InMemoryTableScan" in name:
            if exch_below_join:
                cache_under_exchange[0] = True
            return
        if "Join" in name:
            # an Exchange ABOVE a join moves join output, which is
            # legitimate; only an Exchange between a join and the cache
            # scan means the cached table itself was re-shuffled
            exch_below_join = False
        if name.startswith("Exchange"):
            exch_below_join = True
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next(), exch_below_join)

    walk(jp, False)
    return names, cache_under_exchange[0]


def test_pagerank_iteration_never_exchanges_edges(spark):
    """One full PageRank round (contrib aggregate + rank update), in
    the r5 lazy shape: the persisted edge table (partitioned on src)
    and the pinned node table are both consumed in place, the rank
    vector is NEVER explicitly exchanged (the update join's output
    partitioning on doc_id, renamed to src, satisfies the next edge
    join), and the round's only exchange is the dst contribution
    aggregate — the irreducible Pregel message delivery. Broadcast is
    disabled for the audit so a small-table broadcast can't mask a bad
    shape."""
    from ai_ocr_spark.operators.graph import PR_BASE, PR_UNIT, _edges

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        par = int(spark.conf.get("spark.sql.shuffle.partitions"))
        e = _edges(spark, SF).repartition(par, "src").persist()
        e.count()
        docs = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id")
            .repartition(par, "doc_id")
            .persist()
        )
        docs.count()
        ranks = docs.select("doc_id", F.lit(PR_UNIT).cast("long").alias("rnk"))
        for _ in range(2):  # two rounds: proves the rename carries over
            contrib = (
                e.join(ranks.select(F.col("doc_id").alias("src"), "rnk"), "src")
                .select(
                    "dst",
                    F.expr("CAST((rnk * 85) DIV (100 * outdeg) AS BIGINT)").alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("c"))
            )
            ranks = docs.join(
                contrib.withColumnRenamed("dst", "doc_id"), "doc_id", "left"
            ).select(
                "doc_id",
                (F.lit(PR_BASE) + F.coalesce(F.col("c"), F.lit(0)))
                .cast("long")
                .alias("rnk"),
            )
        names, cache_reshuffled = _physical_nodes(ranks)
        assert "InMemoryTableScan" in names, names
        assert not cache_reshuffled, names  # edges + nodes in place
        # one ENSURE_REQUIREMENTS exchange per round (the dst agg),
        # nothing for the rank vector in either round
        assert names.count("Exchange") == 2, names
        e.unpersist()
        docs.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_components_propagate_never_exchanges_edges(spark):
    """One label-propagation round's neighbor-min aggregate: the
    persisted doubled edge table (partitioned on doc_b) joins the
    pinned label table with exactly TWO exchanges — the initial label
    pin and the doc_a aggregate — zero on the edge relation."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        par = int(spark.conf.get("spark.sql.shuffle.partitions"))
        docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
        pairs = docs.select(
            F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
        )
        edges = (
            pairs.unionByName(
                pairs.select(
                    F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
                )
            )
            .repartition(par, "doc_b")
            .persist()
        )
        edges.count()
        labels = (
            docs.repartition(par, "doc_id")
            .select("doc_id", F.col("doc_id").alias("component_id"))
        )
        neigh = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("component_id").alias("nmin"))
        )
        names, cache_reshuffled = _physical_nodes(neigh)
        assert "InMemoryTableScan" in names, names
        assert not cache_reshuffled, names  # edges consumed in place
        assert names.count("Exchange") == 2, names  # label pin + doc_a agg
        edges.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_checkpointed_labels_reexchange_only_themselves(spark):
    """MEASURED limitation, pinned so the cost model stays honest:
    PySpark's localCheckpoint drops partitioning metadata
    (UnknownPartitioning on the ExistingRDD leaf), so round 2+ labels
    DO re-exchange — but only the label table. The load-bearing
    property is that joining checkpointed labels against the pinned
    edge cache still moves zero edge rows: exactly one Exchange, on
    the label side."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        par = int(spark.conf.get("spark.sql.shuffle.partitions"))
        docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
        pairs = docs.select(
            F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b")
        )
        edges = pairs.repartition(par, "doc_b").persist()
        edges.count()
        labels = (
            docs.repartition(par, "doc_id")
            .select("doc_id", F.col("doc_id").alias("component_id"))
            .localCheckpoint()
        )
        joined = edges.join(labels, edges.doc_b == labels.doc_id).select(
            "doc_a", "component_id"
        )
        names, cache_reshuffled = _physical_nodes(joined)
        assert "InMemoryTableScan" in names, names
        assert not cache_reshuffled, names
        assert names.count("Exchange") == 1, names  # labels only
        edges.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_docx_roundtrip_single_python_boundary(spark):
    """The docx pipeline keeps the fused-kernel contract: exactly one
    Python crossing for the extraction itself (the page-build
    mapInPandas is a fixture synthesizer, not part of the extract
    path)."""
    from ai_ocr_spark.operators.roundtrip_docx import pipeline_docx_roundtrip

    plan = formatted_plan(pipeline_docx_roundtrip(spark, SF))
    # formatted output lists every node twice (tree + detail section);
    # count the numbered detail headers = physical nodes
    nodes = re.findall(r"\(\d+\) MapInPandas", plan)
    assert len(nodes) == 2, plan  # fixture builder + fused kernel
    assert "CartesianProduct" not in plan


def test_bpe_pairs_vocabulary_shape(spark):
    """BPE pair counting must read the corpus once (one partial_count
    combine on words) and keep the top-K as TakeOrderedAndProject, not
    a full sort."""
    from ai_ocr_spark.operators.tokenizer import tokenizer_bpe_pairs

    plan = formatted_plan(tokenizer_bpe_pairs(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # pure explode/aggregate pipeline


def test_bpe_encode_skew_split_shape(spark):
    """The encode join-back keeps the Zipf-skew split: the ENC_HEAD_K
    hottest words join as a BROADCAST hash join, no CartesianProduct,
    and the fold chain stays JVM-side (no Python boundary at all)."""
    from ai_ocr_spark.operators.tokenizer import tokenizer_bpe_encode

    plan = formatted_plan(tokenizer_bpe_encode(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_perplexity_head_join_broadcasts_and_no_cartesian(spark):
    """The perplexity score join-back keeps the skew split: the hot
    LM head joins as a BROADCAST hash join (the Zipf head never rides
    the shuffle) and the one-row stats/cutoff frames broadcast too —
    no CartesianProduct anywhere despite three crossJoins."""
    from ai_ocr_spark.operators.quality_lm import quality_perplexity_unigram

    plan = formatted_plan(quality_perplexity_unigram(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the tail lane's equi-join on token is the only sort-merge risk;
    # whichever strategy Spark picks, the head lane must be broadcast
    assert plan.count("BroadcastExchange") >= 3, plan


def test_metrics_report_fault_families_bite_and_one_python_boundary(spark):
    """All three content kinds appear, totals reconcile with the input,
    the never-raise contract holds (n_err == 0), and the extraction
    stays one fused MapInPandas."""
    from ai_ocr_spark.operators.roundtrip import pipeline_metrics_report

    df = pipeline_metrics_report(spark, SF)
    plan = formatted_plan(df)
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1, plan
    out = df.toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert set(out["content_kind"]) == {"html", "empty", "binary"}
    assert out["n_docs"].sum() == n_docs
    assert out["n_err"].sum() == 0
    # fault families are invalid; healthy html rows are valid
    bad = out[out["content_kind"] != "html"]
    assert (bad["n_ok"] == 0).all() and bad["n_docs"].sum() > 0
    assert out["n_ok"].sum() > 0
    assert out["size_bucket"].between(0, 7).all()
    assert (out["kernel_version"] != "").all()
    assert (out["attempt"] == 0).all()


def test_pq_codebook_rides_broadcast_and_no_cartesian(spark):
    """PQ encode/score joins keep the corpus un-shuffled: the M*K
    codebook and the Q*M*K query lookup table are BROADCAST, and no
    CartesianProduct appears anywhere."""
    from ai_ocr_spark.operators.similarity import ann_pq_topk

    plan = formatted_plan(ann_pq_topk(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2, plan
