"""dedup_semdedup + decontam_embedding: semantics against the exact
all-pairs ground truth, and the plan shapes that make them scale —
semdedup's pair stage must be an equi-join on centroid_id (never a
cartesian), and decontam's bench side must ride a broadcast."""

from pyspark.sql import functions as F

from ai_ocr_spark.operators.curation import (
    EMB_DECONTAM_TAU,
    _is_bench,
    decontam_embedding,
)
from ai_ocr_spark.operators.dedup import dedup_embedding_cosine
from ai_ocr_spark.operators.similarity import (
    SEMDEDUP_TAU,
    _emb,
    _ivf_index,
    dedup_semdedup,
)
from ai_ocr_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"


def test_semdedup_covers_every_vector_and_prunes(spark):
    out = dedup_semdedup(spark, SF).collect()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(out) == n
    pruned = [r for r in out if not r.kept]
    kept = [r for r in out if r.kept]
    assert pruned, "tau admits no prunes at test scale — threshold drifted"
    for r in pruned:
        assert r.n_dups_smaller > 0 and r.max_cos_smaller >= SEMDEDUP_TAU
    for r in kept:
        assert r.n_dups_smaller == 0 and r.max_cos_smaller == 0.0


def test_semdedup_min_id_per_cluster_always_kept(spark):
    out = dedup_semdedup(spark, SF)
    mins = out.groupBy("centroid_id").agg(F.min("vec_id").alias("vec_id"))
    bad = out.join(mins, ["centroid_id", "vec_id"]).filter(~F.col("kept"))
    assert bad.count() == 0


def test_semdedup_prunes_are_witnessed_by_exact_ground_truth(spark):
    """Every pruned vector must appear as the LARGER side of an exact
    all-pairs near-dup pair at the same threshold (within-cluster pairs
    are a subset of all pairs) — SemDeDup never invents a duplicate."""
    gt = {
        r.vec_b
        for r in dedup_embedding_cosine(spark, SF)
        .filter(F.col("cos") >= SEMDEDUP_TAU)
        .collect()
    }
    pruned = {
        r.vec_id
        for r in dedup_semdedup(spark, SF).filter(~F.col("kept")).collect()
    }
    assert pruned and pruned <= gt


def test_semdedup_pair_stage_is_equijoin_not_cartesian(spark):
    plan = formatted_plan(dedup_semdedup(spark, SF))
    assert "CartesianProduct" not in plan, plan
    # the within-cluster pair join keys on the cluster id
    assert "a_cl" in plan and "centroid_id" in plan, plan


def test_semdedup_reuses_the_memoized_ivf_index(spark):
    cent, assigned = _ivf_index(spark, SF)
    # same objects back on a second call — one clustered index serves
    # ANN search and semantic dedup alike
    cent2, assigned2 = _ivf_index(spark, SF)
    assert cent is cent2 and assigned is assigned2


def test_decontam_embedding_covers_corpus_and_flags(spark):
    out = decontam_embedding(spark, SF).collect()
    emb = _emb(spark, SF)
    n_corpus = emb.filter(~_is_bench(F.col("vec_id"))).count()
    assert len(out) == n_corpus
    dirty = [r for r in out if r.contaminated]
    clean = [r for r in out if not r.contaminated]
    assert dirty, "tau admits no hits at test scale — threshold drifted"
    for r in dirty:
        assert r.n_hits > 0 and r.max_cos >= EMB_DECONTAM_TAU
        assert r.best_bench_id is not None
    for r in clean:
        assert r.n_hits == 0 and r.max_cos == 0.0
        assert r.best_bench_id is None


def test_decontam_embedding_bench_ids_are_bench_members(spark):
    out = decontam_embedding(spark, SF)
    hit_ids = out.filter(F.col("contaminated")).select(
        F.col("best_bench_id").alias("vec_id")
    )
    non_bench = hit_ids.filter(~_is_bench(F.col("vec_id")))
    assert non_bench.count() == 0


def test_decontam_embedding_bench_side_is_broadcast(spark):
    plan = formatted_plan(decontam_embedding(spark, SF))
    # corpus x bench rides a broadcast nested-loop (bench is the tiny,
    # bounded eval set); the corpus side never shuffles to generate
    # candidates
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_decontam_report_is_the_rowwise_union_of_its_legs(spark):
    from ai_ocr_spark.operators.curation import (
        decontam_minhash,
        decontam_ngram_overlap,
        decontam_report,
    )

    rep = decontam_report(spark, SF).toPandas().set_index("doc_id")
    ng = decontam_ngram_overlap(spark, SF).toPandas().set_index("doc_id")
    mh = decontam_minhash(spark, SF).toPandas().set_index("doc_id")
    em = (
        decontam_embedding(spark, SF)
        .toPandas()
        .set_index("vec_id")
    )
    assert set(rep.index) == set(ng.index) == set(mh.index) == set(em.index)
    for d in rep.index:
        legs = (
            bool(ng.loc[d, "contaminated"]),
            bool(mh.loc[d, "contaminated"]),
            bool(em.loc[d, "contaminated"]),
        )
        assert (
            rep.loc[d, "ngram_hit"],
            rep.loc[d, "minhash_hit"],
            rep.loc[d, "embedding_hit"],
        ) == legs, d
        assert rep.loc[d, "n_legs"] == sum(legs), d
        assert rep.loc[d, "contaminated"] == any(legs), d
    # the embedding leg catches leakage the surface legs miss (31 docs
    # at sf0.001) — the reason the report fuses three detectors
    emb_only = rep["embedding_hit"] & ~(rep["ngram_hit"] | rep["minhash_hit"])
    assert emb_only.any()
    assert (~rep["contaminated"]).any() and rep["contaminated"].any()
