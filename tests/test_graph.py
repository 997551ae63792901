"""Semantic pins for the link-graph centrality operator (the oracle
proves cross-engine equality; this proves the math means PageRank)."""

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_bruteforce_integer_iteration(spark):
    from ai_ocr_spark.operators.graph import (
        PR_BASE,
        PR_FANOUT,
        PR_ITERS,
        PR_UNIT,
        pagerank_link_graph,
    )

    out = pagerank_link_graph(spark, SF).toPandas().set_index("doc_id")
    n = len(spark.read.parquet(f"{SF}/documents.parquet").toPandas())
    edges = set()
    for src in range(n):
        for j in range(1, PR_FANOUT + 1):
            dst = (src * src + j * 31 + 7) % n
            if dst != src:
                edges.add((src, dst))
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rnk = {v: PR_UNIT for v in range(n)}
    for _ in range(PR_ITERS):
        nxt = {v: PR_BASE for v in range(n)}
        for s, d in edges:
            nxt[d] += (rnk[s] * 85) // (100 * outdeg[s])
        rnk = nxt
    assert len(out) == n
    for v in range(n):
        assert out.loc[v, "rnk"] == rnk[v], v
        assert out.loc[v, "outdeg"] == outdeg.get(v, 0)
    # centrality is non-degenerate: ranks spread, mass stays bounded
    assert out["rnk"].nunique() > 1
    assert out["rnk"].sum() <= n * PR_UNIT
