"""Corpus-curation operators: behavior + the plan shapes the 100-TB
story depends on (broadcast benchmark set, WindowGroupLimit domain
cap, no cartesian products anywhere)."""

from pyspark.sql import functions as F

from ai_ocr_spark.operators.curation import (
    DECON_BENCH_THRESHOLD,
    DOMAIN_CAP,
    decontam_ngram_overlap,
    dedup_minhash_keep_canonical,
    sample_domain_cap,
)
from ai_ocr_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"


def test_decontam_covers_corpus_and_flags_consistently(spark):
    from ai_ocr_spark.functions import text as TX

    rows = decontam_ngram_overlap(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_corpus = docs.filter(
        TX.hash15(F.col("doc_id").cast("string"))
        >= F.lit(DECON_BENCH_THRESHOLD)
    ).count()
    # every non-benchmark doc gets a verdict row, benchmark docs none
    assert len(rows) == n_corpus
    for r in rows:
        assert 0 <= r.n_hit <= r.n_win
        assert r.contaminated == (r.n_hit > 0)
        if r.n_win:
            assert abs(r.hit_frac - r.n_hit / r.n_win) < 1e-12
        else:
            assert r.hit_frac == 0.0


def test_decontam_plan_broadcasts_benchmark_side(spark):
    """The benchmark n-gram set is eval-set-sized, never corpus-sized:
    the overlap join must be a broadcast so the corpus side does not
    shuffle on the window hash."""
    plan = formatted_plan(decontam_ngram_overlap(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sample_domain_cap_keeps_longest_per_domain(spark):
    out = sample_domain_cap(spark, SF)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, []).append(r)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_src = {}
    for d in docs:
        by_src.setdefault(d.source or "", []).append(d)
    for src, kept in per.items():
        assert len(kept) <= DOMAIN_CAP
        # the kept set IS the top-CAP by (n_chars desc, doc_id asc)
        want = sorted(by_src[src], key=lambda d: (-d.n_chars, d.doc_id))
        want_ids = [d.doc_id for d in want[:DOMAIN_CAP]]
        got_ids = [r.doc_id for r in sorted(kept, key=lambda r: r.rn)]
        assert got_ids == want_ids


def test_sample_domain_cap_plan_uses_group_limit(spark):
    """rn <= CAP must compile to WindowGroupLimit: each partition keeps
    a CAP-sized heap instead of fully sorting a crawl-skewed host."""
    plan = formatted_plan(sample_domain_cap(spark, SF))
    assert "WindowGroupLimit" in plan
    assert "row_number()" in plan


def test_keep_canonical_one_keeper_per_cluster(spark):
    rows = dedup_minhash_keep_canonical(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == docs  # every document gets a verdict
    clusters = {}
    for r in rows:
        clusters.setdefault(r.component_id, []).append(r)
    for cid, members in clusters.items():
        keepers = [r for r in members if r.keep]
        assert len(keepers) == 1
        assert keepers[0].doc_id == min(r.doc_id for r in members) == cid
        assert all(r.cluster_size == len(members) for r in members)
    # the near-dup fixtures guarantee at least one multi-doc cluster
    assert any(len(m) > 1 for m in clusters.values())


def test_dedup_lines_global_first_occurrence_wins(spark):
    from ai_ocr_spark.operators.curation import dedup_lines_global

    rows = sorted(
        dedup_lines_global(spark, SF).collect(), key=lambda r: r.doc_id
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == docs
    # the two shared footers survive in exactly one document each:
    # total kept copies of each footer line across the corpus == 1
    footers = (
        "all rights reserved by the site operator",
        "subscribe to our newsletter for updates today",
    )
    for f in footers:
        keepers = [r for r in rows if f in r.cleaned_text]
        assert len(keepers) == 1
    for r in rows:
        assert r.n_lines == 4
        assert 0 <= r.n_removed <= r.n_lines
        assert abs(r.removed_frac - r.n_removed / r.n_lines) < 1e-12
        # reconstruction consistency: kept-line count matches the text
        kept_lines = r.cleaned_text.split("\n") if r.cleaned_text else []
        assert len(kept_lines) == r.n_lines - r.n_removed


def test_dedup_lines_global_plan_broadcasts_hot_head(spark):
    """The Zipf-hot line hashes (site boilerplate) must join as a
    broadcast; only the de-skewed tail rides the shuffled equi-join."""
    from ai_ocr_spark.operators.curation import dedup_lines_global

    plan = formatted_plan(dedup_lines_global(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # driver-bounded head
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sample_token_budget_prefix_property(spark):
    """The kept set per domain is exactly the maximal quality-ordered
    prefix whose running token sum stays within budget."""
    from ai_ocr_spark.operators.curation import TOKEN_BUDGET, sample_token_budget
    from ai_ocr_spark.operators.textstats import text_quality_scores

    kept = sample_token_budget(spark, SF).collect()
    q = {r.doc_id: r for r in text_quality_scores(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    by_src = {}
    for d in docs:
        by_src.setdefault(d.source or "", []).append(d)
    got = {}
    for r in kept:
        got.setdefault(r.source, []).append(r)
        assert r.cum_tok <= TOKEN_BUDGET
        assert abs(r.quality - q[r.doc_id].quality) < 1e-15
    for src, members in by_src.items():
        order = sorted(
            members, key=lambda d: (-q[d.doc_id].quality, d.doc_id)
        )
        cum, want = 0, []
        for d in order:
            cum += q[d.doc_id].n_tokens
            if cum > TOKEN_BUDGET:
                break
            want.append(d.doc_id)
        assert sorted(r.doc_id for r in got.get(src, [])) == sorted(want)


def test_embedding_keep_canonical_one_keeper_per_cluster(spark):
    from ai_ocr_spark.operators.curation import dedup_embedding_keep_canonical

    rows = dedup_embedding_keep_canonical(spark, SF).collect()
    n_vec = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n_vec
    clusters = {}
    for r in rows:
        clusters.setdefault(r.component_id, []).append(r)
    for cid, members in clusters.items():
        keepers = [r for r in members if r.keep]
        assert len(keepers) == 1
        assert keepers[0].vec_id == min(r.vec_id for r in members) == cid


def test_curation_funnel_is_monotone_and_consistent(spark):
    from ai_ocr_spark.operators.curation import curation_funnel

    rows = curation_funnel(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        # progressive conjunction: each gate can only shrink the set
        assert (
            r.n_docs
            >= r.n_pass_gopher
            >= r.n_pass_c4
            >= r.n_pass_dedup
            >= r.n_final
            >= 0
        )
    # the pipeline must actually cut something corpus-wide
    assert sum(r.n_final for r in rows) < sum(r.n_docs for r in rows)


def test_bloom_blocklist_no_false_negatives(spark):
    """The Bloom guarantee: every truly-blocked url is possibly-blocked
    (completeness), false_positive is exactly the delta, and the
    deliberately small BLOOM_M actually produces false positives at
    test scale — otherwise the delta columns are vacuously untested."""
    from ai_ocr_spark.operators.curation import filter_bloom_blocklist

    rows = filter_bloom_blocklist(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == docs
    for r in rows:
        if r.truly_blocked:
            assert r.possibly_blocked  # no false negatives, ever
        assert r.false_positive == (r.possibly_blocked and not r.truly_blocked)
    assert any(r.truly_blocked for r in rows)
    assert any(r.false_positive for r in rows)  # BLOOM_M=256 is small enough
    assert any(not r.possibly_blocked for r in rows)


def test_bloom_blocklist_probe_is_broadcast_only(spark):
    """The probe side must take K broadcast hash joins and NEVER
    shuffle: at 10^12 rows the whole point of the Bloom gate is that
    membership screening is scan-side work. The only exchange allowed
    in the plan is building the tiny DISTINCT set-bit table."""
    from ai_ocr_spark.operators.curation import (
        BLOOM_K,
        filter_bloom_blocklist,
    )

    plan = formatted_plan(filter_bloom_blocklist(spark, SF))
    # formatted mode prints each node twice (tree + detail section)
    assert plan.count("BroadcastHashJoin LeftOuter") == BLOOM_K
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # exchanges exist only under the set-bit build (hashpartitioning on
    # pos for the DISTINCT) — never keyed on the probe's doc_id/url
    shuffles = [
        ln for ln in plan.splitlines() if "hashpartitioning(" in ln
    ]
    assert shuffles, "expected the DISTINCT set-bit build exchange"
    for ln in shuffles:
        assert "pos" in ln and "doc_id" not in ln and "url" not in ln


def test_temperature_mix_quotas(spark):
    from ai_ocr_spark.operators.curation import (
        MIX_BUDGET_PCT,
        sample_temperature_mix,
    )

    out = sample_temperature_mix(spark, SF).toPandas()
    n_total = len(out)
    assert n_total > 0
    g = out.groupby("source").agg(
        n=("doc_id", "count"),
        quota=("k_quota", "first"),
        kept=("kept", "sum"),
    )
    # every source fills its quota exactly (quota <= n by construction)
    assert (g["quota"] <= g["n"]).all()
    assert (g["kept"] == g["quota"]).all()
    # total kept is near the budget (DIV floors each quota)
    budget = (n_total * MIX_BUDGET_PCT) // 100
    assert budget - len(g) <= g["kept"].sum() <= budget
    # temperature smoothing flattens the mixture: the kept share of the
    # largest source must shrink, the smallest source's must grow
    g["share_before"] = g["n"] / g["n"].sum()
    g["share_after"] = g["kept"] / g["kept"].sum()
    big = g["n"].idxmax()
    small = g["n"].idxmin()
    if g.loc[big, "n"] > g.loc[small, "n"]:
        assert g.loc[big, "share_after"] <= g.loc[big, "share_before"] + 1e-9
        assert g.loc[small, "share_after"] >= g.loc[small, "share_before"] - 1e-9


def test_pack_sequences_layout_is_contiguous(spark):
    """The packing layout is a gap-free concatenation: sorted by
    tok_offset, every document starts exactly where the previous one
    ended, and the chunk-span arithmetic is consistent."""
    from ai_ocr_spark.operators.curation import (
        PACK_SEQ_LEN,
        sample_pack_sequences,
    )

    out = (
        sample_pack_sequences(spark, SF)
        .toPandas()
        .sort_values("tok_offset")
        .reset_index(drop=True)
    )
    assert len(out) > 0 and (out["n_tok"] > 0).all()
    # contiguity: offsets tile the token axis with no gaps or overlaps
    assert out.loc[0, "tok_offset"] == 0
    ends = out["tok_offset"] + out["n_tok"]
    assert (out["tok_offset"].iloc[1:].values == ends.iloc[:-1].values).all()
    assert ends.iloc[-1] == out["n_tok"].sum()
    # chunk-span arithmetic
    assert (out["seq_first"] == out["tok_offset"] // PACK_SEQ_LEN).all()
    assert (
        out["seq_last"] == (out["tok_offset"] + out["n_tok"] - 1) // PACK_SEQ_LEN
    ).all()
    assert (out["n_seqs"] == out["seq_last"] - out["seq_first"] + 1).all()
    assert (out["crosses_seq"] == (out["n_seqs"] > 1)).all()
    # SEQ_LEN is small enough at test scale that crossings occur AND
    # some docs still fit inside one sequence — both branches exercised
    assert out["crosses_seq"].any() and (~out["crosses_seq"]).any()


def test_pack_sequences_plan_partitions_the_big_window(spark):
    """The corpus-sized running sum must be partitioned by shard; the
    only unpartitioned window is the PACK_SHARDS-row shard-base prefix,
    and the shard-base join must broadcast (no corpus shuffle for it)."""
    from ai_ocr_spark.operators.curation import sample_pack_sequences

    plan = formatted_plan(sample_pack_sequences(spark, SF))
    low = plan.lower().replace(" ", "")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the per-shard cumsum window carries the shard partition spec and
    # shuffles on shard
    assert "windowspecdefinition(shard" in low
    assert "hashpartitioning(shard" in low
    # exactly ONE single-partition exchange: the PACK_SHARDS-row
    # shard-base prefix (a corpus-sized one would be a regression)
    assert low.count("singlepartition") == 1


def test_decontam_minhash_agrees_with_lsh_cross_pairs(spark):
    """Fuzzy decontamination covers every corpus doc exactly once
    (benchmark docs absent), the verdict column is consistent with its
    own max_jaccard, and it AGREES with the dedup family: the corpus
    side of every dedup_minhash_lsh pair (jaccard >= 0.5) that
    straddles the benchmark split is contaminated, and every
    contaminated doc has such a pair (same bands, same verify
    threshold — the operating point is shared by construction)."""
    from ai_ocr_spark.functions import text as TX
    from ai_ocr_spark.operators.curation import (
        DECONTAM_J,
        _is_bench,
        decontam_minhash,
    )
    from ai_ocr_spark.operators.dedup import dedup_minhash_lsh

    out = decontam_minhash(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_corpus = docs.filter(
        TX.hash15(F.col("doc_id").cast("string"))
        >= F.lit(DECON_BENCH_THRESHOLD)
    ).count()
    assert len(out) == n_corpus
    assert out["doc_id"].is_unique
    assert (out["contaminated"] == (out["max_jaccard"] >= DECONTAM_J)).all()
    clean = out[out["n_cand"] == 0]
    assert (clean["max_jaccard"] == 0.0).all()
    assert clean["best_bench_id"].isna().all()

    pairs = dedup_minhash_lsh(spark, SF)
    cross = pairs.filter(
        _is_bench(F.col("doc_a")) != _is_bench(F.col("doc_b"))
    ).toPandas()
    bench_flag = {}  # resolve which side is the corpus doc
    for col in ("doc_a", "doc_b"):
        for d, b in zip(
            cross[col],
            spark.createDataFrame(cross[[col]].rename(columns={col: "x"}))
            .select(
                (TX.hash15(F.col("x").cast("string"))
                 < F.lit(DECON_BENCH_THRESHOLD)).alias("b")
            )
            .toPandas()["b"],
        ):
            bench_flag[d] = bool(b)
    corpus_hits = {
        (r.doc_b if bench_flag[r.doc_a] else r.doc_a)
        for r in cross.itertuples()
    }
    flagged = set(out[out["contaminated"]]["doc_id"])
    assert corpus_hits == flagged, (corpus_hits, flagged)
    # the fixture actually exercises the path
    assert len(flagged) > 0
