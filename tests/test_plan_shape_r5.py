"""Plan-shape invariants for the r5 graduations: the k-means
assignment must carry its centroids as a BROADCAST relation (data),
never as K*dim inlined literal arrays (VERDICT r4 "What's wrong" #2 —
the trainer is the op you'd run at K ~ sqrt(n), where a literal tree
cannot hold; CLAUDE.md records a 16x32 literal argmin costing ~50s of
pure analyzer/codegen) — and the IVFADC composition's query path."""

import re

from ai_ocr_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"


def test_kmeans_assign_is_broadcast_table_not_literals(spark):
    from pyspark.sql import functions as F

    from ai_ocr_spark.operators.similarity import (
        KMEANS_K,
        _emb,
        _kmeans_assign,
    )

    emb = (
        _emb(spark, SF)
        .select("vec_id", "v")
        .repartition(8, "vec_id")
    )
    cb = spark.createDataFrame(
        [(j, [j * 1000] * 8) for j in range(KMEANS_K)],
        "cid long, carr array<long>",
    )
    plan = formatted_plan(_kmeans_assign(emb, cb))
    # centroids arrive as a broadcast relation...
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # ...not as inlined array literals: the old shape embedded one
    # [lit, lit, ...] array per centroid per round in the projection
    assert not re.search(r"zip_with\(v[^)]*, \[\d+,", plan), plan
    # the argmin window keys on vec_id (per-vector nearest centroid)
    assert re.search(r"windowspecdefinition\(vec_id", plan), plan


def test_kmeans_assign_reuses_emb_partitioning(spark):
    """The assignment window's clustered distribution must be satisfied
    by the persisted repartition(vec_id) — one Exchange total (the
    explicit repartition), nothing added per round by the broadcast
    join or the window."""
    from ai_ocr_spark.operators.similarity import (
        KMEANS_K,
        _emb,
        _kmeans_assign,
    )

    emb = (
        _emb(spark, SF)
        .select("vec_id", "v")
        .repartition(8, "vec_id")
    )
    cb = spark.createDataFrame(
        [(j, [j * 1000] * 8) for j in range(KMEANS_K)],
        "cid long, carr array<long>",
    )
    df = _kmeans_assign(emb, cb)
    physical = df._jdf.queryExecution().executedPlan().toString()
    n_shuffle = physical.count("Exchange hashpartitioning")
    assert n_shuffle == 1, physical


def test_ivfpq_query_path_broadcasts_and_never_cartesian(spark):
    """Query-time IVFADC (ann_ivf_pq_topk): the probe set and the
    Q*M*K ADC lookup table ride BROADCASTs, the code-carrying lists are
    probed via equi-joins, and no CartesianProduct appears anywhere —
    at 10^12 vectors the only big-side motion is the one memoized
    index-build pass."""
    from ai_ocr_spark.operators.similarity import ann_ivf_pq_topk

    plan = formatted_plan(ann_ivf_pq_topk(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 2, plan
