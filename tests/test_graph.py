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


def test_salsa_matches_bruteforce_integer_iteration(spark):
    """graph_salsa equals an independent Python integer SALSA over the
    same arithmetic edge set, and the degree-normalized updates never
    amplify total mass (the property that replaces HITS's global norm)."""
    from collections import defaultdict

    from ai_ocr_spark.operators.graph import (
        PR_FANOUT,
        SALSA_ITERS,
        SALSA_UNIT,
        graph_salsa,
    )

    out = graph_salsa(spark, SF).toPandas().set_index("doc_id")
    n = len(spark.read.parquet(f"{SF}/documents.parquet").toPandas())
    edges = set()
    for src in range(n):
        for j in range(1, PR_FANOUT + 1):
            dst = (src * src + j * 31 + 7) % n
            if dst != src:
                edges.add((src, dst))
    outdeg = defaultdict(int)
    indeg = defaultdict(int)
    for s, d in edges:
        outdeg[s] += 1
        indeg[d] += 1
    hub = {v: SALSA_UNIT for v in range(n)}
    auth = {}
    for _ in range(SALSA_ITERS):
        auth = defaultdict(int)
        for s, d in edges:
            auth[d] += hub[s] // outdeg[s]
        auth = {v: auth.get(v, 0) for v in range(n)}
        nxt = defaultdict(int)
        for s, d in edges:
            nxt[s] += auth[d] // indeg[d]
        hub = {v: nxt.get(v, 0) for v in range(n)}
    assert len(out) == n
    for v in range(n):
        assert out.loc[v, "auth"] == auth[v], v
        assert out.loc[v, "hub"] == hub[v], v
    # mass is redistributed, never amplified
    assert 0 < out["auth"].sum() <= n * SALSA_UNIT
    assert 0 < out["hub"].sum() <= n * SALSA_UNIT
    # genuine hub/authority structure (non-constant scores)
    assert out["auth"].nunique() > 1 and out["hub"].nunique() > 1
