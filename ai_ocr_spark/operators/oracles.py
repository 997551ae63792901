"""DuckDB oracle SQL for the training-data operators.

Each builder returns ANSI-ish SQL that DuckDB runs over the same parquet
tables and that reproduces the Spark operator bit-for-bit:

  * all hashes are md5-derived (identical hex in both engines);
  * integer arithmetic is exact;
  * doubles are produced by identical-order operations (strict left
    folds, same formula text), so no rounding is needed;
  * NULL propagation uses `||` (DuckDB's concat() skips NULLs, Spark's
    concat() propagates them).

Constants (K, bands, thresholds, stopword lists) are imported from
functions/text.py and operators/similarity.py so the two engines can
never drift apart.
"""

from __future__ import annotations

from ..functions.text import (
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_K,
    STOPWORDS_DE,
    STOPWORDS_EN,
    STOPWORDS_FR,
)
from .similarity import (
    IVF_TOP_K,
    N_CENTROIDS,
    N_PROBE,
    N_QUERIES,
    SEMDEDUP_TAU,
    TOP_K,
)

# canonical text form — must match functions.text.norm_text exactly
NORM = r"trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))"


def _shingle_expr(n: int) -> str:
    """list of n-word shingles over `tok`; < n tokens -> []."""
    return (
        f"CASE WHEN len(tok) >= {n} THEN "
        f"list_transform(range(0, len(tok) - {n - 1}), "
        f"i -> array_to_string(list_slice(tok, i + 1, i + {n}), ' ')) "
        f"ELSE [] END"
    )


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def dedup_exact() -> str:
    return f"""
        SELECT md5({NORM}) AS fingerprint,
               count(*) AS n_copies,
               min(doc_id) AS canonical_doc_id
        FROM documents GROUP BY 1
    """


def _minhash_band_ctes() -> str:
    """The shared CTE chain tok -> shingles -> digests -> signatures ->
    band table, reused verbatim by the self-join and incremental LSH
    twins so the band construction can never drift between them."""
    from ..functions.text import MINHASH_SALTS

    digest = " || ".join(f"md5('{j}:' || s)" for j in range(MINHASH_SALTS))
    sigs = ",\n               ".join(
        f"list_min(list_transform(dig, x -> substr(x, {i * 8 + 1}, 8))) AS sig{i}"
        for i in range(MINHASH_K)
    )
    band_cases = " ".join(
        "WHEN {b} THEN md5({expr})".format(
            b=b,
            expr=" || '#' || ".join(
                f"sig{b * LSH_ROWS + r}" for r in range(LSH_ROWS)
            ),
        )
        for b in range(LSH_BANDS)
    )
    return f"""
        WITH n AS (SELECT doc_id, string_split({NORM}, ' ') AS tok FROM documents),
        s AS (SELECT doc_id, list_distinct({_shingle_expr(3)}) AS shd FROM n),
        d AS (SELECT doc_id, shd,
                     list_transform(shd, s -> {digest}) AS dig
              FROM s),
        sig AS (SELECT doc_id,
               {sigs}
               FROM d),
        bands AS (
          SELECT doc_id, g.band AS band_idx,
                 CASE g.band {band_cases} END AS band_hash
          FROM sig, generate_series(0, {LSH_BANDS - 1}) g(band)
        )"""


def dedup_minhash_lsh() -> str:
    return f"""
        {_minhash_band_ctes()},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT cand.doc_a, cand.doc_b,
                 len(list_intersect(sa.shd, sb.shd))
                   / (len(sa.shd) + len(sb.shd)
                      - len(list_intersect(sa.shd, sb.shd))) AS jaccard
          FROM cand
          JOIN s sa ON sa.doc_id = cand.doc_a
          JOIN s sb ON sb.doc_id = cand.doc_b
        ) WHERE jaccard >= 0.5
    """


def dedup_lsh_recall() -> str:
    """Recall/precision report twin: the band construction is the
    verbatim _minhash_band_ctes chain; truth is the exhaustive
    un-stop-listed inverted index at the same shingles + threshold.
    Every CTE MATERIALIZED — the count subqueries would otherwise
    re-derive the chain per reference."""
    return f"""
        {_minhash_band_ctes()},
        cand AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id
        ),
        found AS MATERIALIZED (
          SELECT doc_a, doc_b FROM (
            SELECT cand.doc_a, cand.doc_b,
                   len(list_intersect(sa.shd, sb.shd))
                     / (len(sa.shd) + len(sb.shd)
                        - len(list_intersect(sa.shd, sb.shd))) AS jaccard
            FROM cand
            JOIN s sa ON sa.doc_id = cand.doc_a
            JOIN s sb ON sb.doc_id = cand.doc_b
          ) WHERE jaccard >= 0.5
        ),
        inv AS MATERIALIZED (
          SELECT doc_id, u.sh FROM s, unnest(shd) u(sh)
        ),
        tcand AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        ),
        truth AS MATERIALIZED (
          SELECT doc_a, doc_b FROM (
            SELECT tcand.doc_a, tcand.doc_b,
                   len(list_intersect(sa.shd, sb.shd))
                     / (len(sa.shd) + len(sb.shd)
                        - len(list_intersect(sa.shd, sb.shd))) AS jaccard
            FROM tcand
            JOIN s sa ON sa.doc_id = tcand.doc_a
            JOIN s sb ON sb.doc_id = tcand.doc_b
          ) WHERE jaccard >= 0.5
        ),
        counts AS MATERIALIZED (
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true_pairs,
                 (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_lsh_candidates,
                 (SELECT CAST(count(*) AS BIGINT) FROM found) AS n_found_pairs
        )
        SELECT n_true_pairs, n_lsh_candidates, n_found_pairs,
               CASE WHEN n_true_pairs = 0 THEN CAST(10000 AS BIGINT)
                    ELSE (n_found_pairs * 10000) // n_true_pairs
               END AS recall_e4,
               CASE WHEN n_lsh_candidates = 0 THEN CAST(10000 AS BIGINT)
                    ELSE (n_found_pairs * 10000) // n_lsh_candidates
               END AS candidate_precision_e4
        FROM counts
    """


def dedup_connected_components() -> str:
    """Transitive closure of the minhash pair graph via recursive CTE
    (exact at test scale), labeling each doc with min reachable doc_id.
    The pair set is the verbatim dedup_minhash_lsh twin, so the graph
    can never drift from the Spark side's input."""
    pairs_sql = dedup_minhash_lsh()
    return f"""
        WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
        edges AS MATERIALIZED (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL
            SELECT doc_b AS a, doc_a AS b FROM pairs
        ),
        reach(src, node) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
        )
        SELECT src AS doc_id, min(node) AS component_id
        FROM reach GROUP BY src
    """


def dedup_simhash() -> str:
    return f"""
        WITH n AS (SELECT doc_id, string_split({NORM}, ' ') AS tok FROM documents),
        t AS (SELECT doc_id, u.t FROM n, unnest(tok) u(t)),
        bits AS (
          SELECT doc_id, g.j,
                 ((instr('0123456789abcdef', substr(md5(t), CAST(g.j // 4 AS INTEGER) + 1, 1)) - 1)
                   >> CAST(g.j % 4 AS INTEGER)) & 1 AS bit
          FROM t, generate_series(0, 31) g(j)
        ),
        lanes AS (SELECT doc_id, j, sum(2 * bit - 1) AS s FROM bits GROUP BY doc_id, j),
        sh AS (
          SELECT doc_id,
                 CAST(sum(CASE WHEN s >= 0 THEN (1::BIGINT << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
          FROM lanes GROUP BY doc_id
        ),
        banded AS (
          SELECT doc_id, simhash, g.b AS band_idx,
                 (simhash >> CAST(8 * g.b AS INTEGER)) & 255 AS band_val
          FROM sh, generate_series(0, 3) g(b)
        ),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
          FROM banded a JOIN banded b
            ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, hamming FROM cand WHERE hamming <= 6
    """


def dedup_ngram_jaccard() -> str:
    return f"""
        WITH n AS (SELECT doc_id, string_split({NORM}, ' ') AS tok FROM documents),
        s AS (SELECT doc_id, list_distinct({_shingle_expr(2)}) AS shd FROM n),
        inv0 AS (SELECT doc_id, u.sh FROM s, unnest(shd) u(sh)),
        rare AS (SELECT sh FROM inv0 GROUP BY sh HAVING count(*) <= 50),
        inv AS (SELECT inv0.doc_id, inv0.sh FROM inv0 JOIN rare USING (sh)),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, jaccard FROM (
          SELECT cand.doc_a, cand.doc_b,
                 len(list_intersect(sa.shd, sb.shd))
                   / (len(sa.shd) + len(sb.shd)
                      - len(list_intersect(sa.shd, sb.shd))) AS jaccard
          FROM cand
          JOIN s sa ON sa.doc_id = cand.doc_a
          JOIN s sb ON sb.doc_id = cand.doc_b
        ) WHERE jaccard >= 0.6
    """


# strict left-fold dot product a.v . b.v (matches functions.vectors.dot)
def _dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


_E2 = f"""
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        e2 AS (SELECT vec_id, v, sqrt({_dot('v', 'v')}) AS nrm FROM e)
"""


def dedup_embedding_cosine() -> str:
    from .similarity import EMB_NEARDUP_TAU

    return f"""
        WITH {_E2}
        SELECT vec_a, vec_b, cos FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos
          FROM e2 a JOIN e2 b ON a.vec_id < b.vec_id
        ) WHERE cos >= {EMB_NEARDUP_TAU}
    """


def ann_cosine_topk() -> str:
    return f"""
        WITH {_E2},
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
              FROM e2 WHERE vec_id < {N_QUERIES}),
        scored AS (
          SELECT q.query_id, e2.vec_id AS neighbor_id,
                 {_dot('q.qv', 'e2.v')} / (q.qn * e2.nrm) AS cos
          FROM e2, q WHERE e2.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cos, rk FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
               AS BIGINT) AS rk
          FROM scored
        ) WHERE rk <= {TOP_K}
    """


# centroid pick + nearest-centroid assignment — the DuckDB twin of
# similarity._ivf_index, shared verbatim by the IVF probe oracle and
# the SemDeDup oracle (same clusters feed both operators Spark-side)
_IVF_ASG = f"""
        cent AS (SELECT vec_id AS centroid_id, v AS cv, nrm AS cn
                 FROM e2 ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC
                 LIMIT {N_CENTROIDS}),
        asg AS (
          SELECT vec_id, v, nrm, centroid_id FROM (
            SELECT e2.vec_id, e2.v, e2.nrm, cent.centroid_id,
                   row_number() OVER (PARTITION BY e2.vec_id
                     ORDER BY {_dot('e2.v', 'cent.cv')} / (e2.nrm * cent.cn) DESC,
                              cent.centroid_id ASC) AS ark
            FROM e2, cent
          ) WHERE ark = 1
        )
"""


def ann_ivf_topk() -> str:
    return f"""
        WITH {_E2},
        {_IVF_ASG},
        q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
              FROM e2 WHERE vec_id < {N_QUERIES}),
        probes AS (
          SELECT query_id, qv, qn, centroid_id FROM (
            SELECT q.query_id, q.qv, q.qn, cent.centroid_id,
                   row_number() OVER (PARTITION BY q.query_id
                     ORDER BY {_dot('q.qv', 'cent.cv')} / (q.qn * cent.cn) DESC,
                              cent.centroid_id ASC) AS prk
            FROM q, cent
          ) WHERE prk <= {N_PROBE}
        ),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 {_dot('p.qv', 'a.v')} / (p.qn * a.nrm) AS cos
          FROM asg a JOIN probes p USING (centroid_id)
          WHERE a.vec_id <> p.query_id
        )
        SELECT query_id, neighbor_id, cos, rk FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
               AS BIGINT) AS rk
          FROM scored
        ) WHERE rk <= {IVF_TOP_K}
    """


def dedup_semdedup() -> str:
    """Twin of similarity.dedup_semdedup: the SAME centroid pick +
    assignment CTE as the IVF oracle (_IVF_ASG), within-cluster i<j
    pairs at cosine >= SEMDEDUP_TAU, min-id keep-first verdict. max()
    over identically-computed doubles is order-free, so no scaling is
    needed; counts CAST BIGINT (HUGEINT trap)."""
    return f"""
        WITH {_E2},
        {_IVF_ASG},
        dup AS (
          SELECT vec_id, CAST(count(*) AS BIGINT) AS nd, max(cos) AS mx
          FROM (
            SELECT b.vec_id, {_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos
            FROM asg a JOIN asg b ON a.centroid_id = b.centroid_id
                                 AND a.vec_id < b.vec_id
          ) WHERE cos >= {SEMDEDUP_TAU}
          GROUP BY vec_id
        )
        SELECT asg.vec_id, asg.centroid_id,
               CAST(coalesce(dup.nd, 0) AS BIGINT) AS n_dups_smaller,
               coalesce(dup.mx, 0.0) AS max_cos_smaller,
               dup.mx IS NULL AS kept
        FROM asg LEFT JOIN dup USING (vec_id)
    """


def decontam_embedding() -> str:
    """Twin of curation.decontam_embedding: hash15(vec_id) 5% benchmark
    slice, corpus-x-bench cosine at EMB_DECONTAM_TAU, count + argmax
    (cos DESC, bench_id ASC) + coalesced zeros for hit-less vectors."""
    from .curation import DECON_BENCH_THRESHOLD, EMB_DECONTAM_TAU

    bench = (
        "CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) < {DECON_BENCH_THRESHOLD}"
    )
    return f"""
        WITH {_E2},
        b AS (SELECT vec_id AS bench_id, v AS bv, nrm AS bn
              FROM e2 WHERE {bench}),
        c AS (SELECT vec_id, v, nrm FROM e2 WHERE NOT ({bench})),
        hits AS (
          SELECT vec_id, bench_id, cos FROM (
            SELECT c.vec_id, b.bench_id,
                   {_dot('c.v', 'b.bv')} / (c.nrm * b.bn) AS cos
            FROM c, b
          ) WHERE cos >= {EMB_DECONTAM_TAU}
        ),
        nh AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_hits
               FROM hits GROUP BY vec_id),
        best AS (
          SELECT vec_id, bench_id AS best_bench_id, cos AS max_cos FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                     ORDER BY cos DESC, bench_id ASC) AS rn
            FROM hits
          ) WHERE rn = 1
        )
        SELECT c.vec_id,
               CAST(coalesce(nh.n_hits, 0) AS BIGINT) AS n_hits,
               best.best_bench_id,
               coalesce(best.max_cos, 0.0) AS max_cos,
               coalesce(nh.n_hits, 0) > 0 AS contaminated
        FROM c LEFT JOIN nh USING (vec_id) LEFT JOIN best USING (vec_id)
    """


def text_token_stats() -> str:
    return f"""
        SELECT doc_id,
               CAST(CASE WHEN {NORM} = '' THEN 0
                    ELSE len(string_split({NORM}, ' ')) END AS BIGINT) AS n_tokens_ws,
               CAST(len(regexp_extract_all({NORM}, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens_re,
               CAST(length({NORM}) AS BIGINT) AS n_chars_norm
        FROM documents
    """


def text_readability() -> str:
    """Twin of textstats.text_readability: identical count definitions
    over the shared NORM form, identical per-term integer floors
    (DuckDB // == Spark DIV on non-negatives), NULL fk for empty docs."""
    return f"""
        WITH n AS (SELECT doc_id, {NORM} AS norm FROM documents),
        t AS (SELECT doc_id, norm, string_split(norm, ' ') AS tok FROM n),
        c AS (
          SELECT doc_id,
                 CASE WHEN norm = '' THEN 0
                      ELSE len(tok) END AS n_words,
                 CASE WHEN norm = '' THEN 0
                      ELSE greatest(1,
                           len(regexp_extract_all(norm, '[.!?]+'))) END
                     AS n_sentences,
                 CASE WHEN norm = '' THEN 0
                      ELSE len(regexp_extract_all(norm, '[aeiouy]+'))
                           + len(list_filter(tok,
                                 x -> NOT regexp_matches(x, '[aeiouy]')))
                      END AS n_syllables
          FROM t
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               CAST(CASE WHEN n_words > 0
                    THEN (n_words * 10000) // n_sentences
                    ELSE 0 END AS BIGINT) AS wps_e4,
               CAST(CASE WHEN n_words > 0
                    THEN (n_syllables * 10000) // n_words
                    ELSE 0 END AS BIGINT) AS spw_e4,
               CAST(CASE WHEN n_words > 0
                    THEN (n_words * 3900) // n_sentences
                         + (n_syllables * 11800) // n_words - 155900
                    END AS BIGINT) AS fk_e4
        FROM c
    """


def text_quality_scores() -> str:
    stop = _sql_list(STOPWORDS_EN)
    return f"""
        WITH n AS (
          SELECT doc_id, {NORM} AS norm, string_split({NORM}, ' ') AS tok
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 length(norm) AS n_chars,
                 CASE WHEN norm = '' THEN 0 ELSE len(tok) END AS n_tok,
                 length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')) AS n_punct,
                 len(list_filter(tok, t -> list_contains({stop}, t))) AS n_stop
          FROM n
        )
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tok AS BIGINT) AS n_tokens,
               CAST(n_punct AS BIGINT) AS n_punct,
               CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
               CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stopword_ratio,
               least(1.0, n_tok / 50.0) * 0.4
                 + (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 0.3
                 + least(1.0, CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END * 5.0) * 0.3
                 AS quality
        FROM m
    """


def text_langid() -> str:
    en, de, fr = (
        _sql_list(STOPWORDS_EN),
        _sql_list(STOPWORDS_DE),
        _sql_list(STOPWORDS_FR),
    )
    return f"""
        WITH n AS (
          SELECT doc_id, text,
                 list_distinct(string_split({NORM}, ' ')) AS tokd
          FROM documents
        )
        SELECT doc_id,
               CAST(len(list_intersect(tokd, {en})) AS BIGINT) AS en_hits,
               CAST(len(list_intersect(tokd, {de})) AS BIGINT) AS de_hits,
               CAST(len(list_intersect(tokd, {fr})) AS BIGINT) AS fr_hits,
               CASE
                 WHEN regexp_matches(coalesce(text, ''), '[぀-ヿ一-鿿]') THEN 'ja'
                 WHEN len(list_intersect(tokd, {en})) >= len(list_intersect(tokd, {de}))
                  AND len(list_intersect(tokd, {en})) >= len(list_intersect(tokd, {fr})) THEN 'en'
                 WHEN len(list_intersect(tokd, {de})) >= len(list_intersect(tokd, {fr})) THEN 'de'
                 ELSE 'fr'
               END AS detected_lang
        FROM n
    """


def text_fingerprint() -> str:
    return f"""
        WITH n AS (
          SELECT doc_id, {NORM} AS norm, string_split({NORM}, ' ') AS tok
          FROM documents
        )
        SELECT doc_id,
               md5(norm) AS fingerprint,
               array_to_string(
                 list_slice(
                   list_sort(list_distinct(
                     list_transform({_shingle_expr(3)}, s -> md5(s)))),
                   1, 4),
                 '|') AS bottomk_sketch
        FROM n
    """


def text_dup_fraction() -> str:
    return f"""
        WITH n AS (SELECT doc_id, string_split({NORM}, ' ') AS tok FROM documents),
        s AS (SELECT doc_id, list_distinct({_shingle_expr(5)}) AS shd FROM n),
        inv AS (SELECT doc_id, u.sh FROM s, unnest(shd) u(sh)),
        dfreq AS (SELECT sh, count(*) AS df FROM inv GROUP BY sh),
        per_doc AS (
            SELECT inv.doc_id,
                   count(*) AS n_shingles,
                   sum(CASE WHEN dfreq.df > 1 THEN 1 ELSE 0 END) AS n_dup
            FROM inv JOIN dfreq USING (sh) GROUP BY inv.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup,
               CASE WHEN coalesce(p.n_shingles, 0) > 0
                    THEN coalesce(p.n_dup, 0) / p.n_shingles
                    ELSE 0.0 END AS dup_fraction
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


def text_line_dedup() -> str:
    return """
        WITH l AS (
          SELECT doc_id,
                 string_split(
                   substr(coalesce(text, ''), 1, 40) || chr(10)
                   || substr(coalesce(text, ''), 41, 40) || chr(10)
                   || substr(coalesce(text, ''), 1, 40) || chr(10)
                   || 'line ' || (doc_id % 5),
                   chr(10)) AS lines
          FROM documents
        ),
        u AS (
          SELECT doc_id, lines,
                 list_filter(lines, (x, i) -> list_position(lines, x) = i)
                     AS uniq
          FROM l
        )
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(uniq) AS BIGINT) AS n_unique,
               1.0 - len(uniq) / len(lines) AS repetition_ratio,
               substr(array_to_string(uniq, chr(10)), 1, 100) AS dedup_head
        FROM u
    """


def text_pii_scrub() -> str:
    """Twin of textstats.text_pii_scrub — the regexes, the seed
    construction and the Luhn fragment are all imported from the op's
    module, so the two engines literally share one source."""
    from .textstats import (
        PII_ALPHA,
        PII_CARD_KNOWN,
        PII_EMAIL_RE,
        PII_ID_RE,
        PII_IP_RE,
        PII_PHONE_RE,
        pii_luhn_sum_sql,
    )

    luhn_ok = pii_luhn_sum_sql("card") + " % 10 = 0"
    return f"""
        WITH s AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 10 = 0 THEN '{PII_CARD_KNOWN}'
                      ELSE '4'
                        || lpad(CAST((doc_id * 37) % 1000000 AS VARCHAR), 6, '0')
                        || lpad(CAST((doc_id * 101) % 1000000000 AS VARCHAR), 9, '0')
                 END AS card,
                 '10.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                   || '.' || ((doc_id * 3) % 256) AS ip,
                 substr('{PII_ALPHA}', CAST(doc_id % 26 + 1 AS INTEGER), 1)
                   || substr('{PII_ALPHA}', CAST((doc_id * 5) % 26 + 1 AS INTEGER), 1)
                   || lpad(CAST(doc_id % 1000000 AS VARCHAR), 6, '0')
                   || substr('{PII_ALPHA}', CAST((doc_id * 11) % 26 + 1 AS INTEGER), 1)
                   AS ident
          FROM documents
        ),
        sd AS (
          SELECT d.doc_id, s.card,
                 coalesce(d.text, '') || ' contact: user' || d.doc_id
                   || '@example.com or admin@site' || (d.doc_id % 7)
                   || '.org tel 555-01'
                   || lpad(CAST(d.doc_id % 100 AS VARCHAR), 2, '0')
                   || '-4242. card ' || s.card || ' ip ' || s.ip
                   || ' id ' || s.ident || '.' AS seeded
          FROM documents d JOIN s USING (doc_id)
        ),
        sc AS (
          SELECT doc_id, seeded, card, {luhn_ok} AS card_luhn_valid,
                 regexp_replace(
                   regexp_replace(seeded, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PII_PHONE_RE}', '<PHONE>', 'g') AS sc1
          FROM sd
        ),
        sc2 AS (
          SELECT doc_id, seeded, card_luhn_valid,
                 regexp_replace(
                   regexp_replace(
                     CASE WHEN card_luhn_valid
                          THEN replace(sc1, card, '<CARD>') ELSE sc1 END,
                     '{PII_IP_RE}', '<IP>', 'g'),
                   '{PII_ID_RE}', '<ID>', 'g') AS scrubbed
          FROM sc
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(seeded, '{PII_EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(seeded, '{PII_PHONE_RE}')) AS BIGINT)
                   AS n_phones,
               CAST(CASE WHEN card_luhn_valid THEN 1 ELSE 0 END AS BIGINT)
                   AS n_cards,
               CAST(len(regexp_extract_all(seeded, '{PII_IP_RE}')) AS BIGINT)
                   AS n_ips,
               CAST(len(regexp_extract_all(seeded, '{PII_ID_RE}')) AS BIGINT)
                   AS n_ids,
               card_luhn_valid,
               substr(scrubbed, 1, 80) AS scrubbed_head,
               substr(scrubbed, greatest(length(scrubbed) - 59, 1), 60)
                   AS scrubbed_tail
        FROM sc2
    """


def url_canonicalize() -> str:
    return r"""
        WITH r AS (
          SELECT doc_id,
                 'HTTPS://WWW.' || source || '.Example.COM/Docs/' || doc_id
                 || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
                 || CASE WHEN doc_id % 2 = 0
                      THEN '?utm_source=feed&utm_campaign=x&page=2'
                      ELSE '?page=2' END
                 || CASE WHEN doc_id % 5 = 0 THEN '#section-3' ELSE '' END
                     AS raw_url
          FROM documents
        ),
        c1 AS (SELECT doc_id, raw_url,
                      regexp_replace(raw_url, '#.*$', '', 'g') AS u FROM r),
        c2 AS (SELECT doc_id, raw_url,
                      lower(regexp_extract(u, '^([A-Za-z]+://[^/]+)', 1))
                      || regexp_extract(u, '^[A-Za-z]+://[^/]+(.*)$', 1) AS u
               FROM c1),
        c3 AS (SELECT doc_id, raw_url,
                      regexp_replace(
                        regexp_replace(u, '([?&])utm_[^&]*&', '\1', 'g'),
                        '([?&])utm_[^&]*&', '\1', 'g') AS u
               FROM c2),
        c4 AS (SELECT doc_id, raw_url,
                      regexp_replace(u, '[?&]utm_[^&]*$', '', 'g') AS u
               FROM c3)
        SELECT doc_id, raw_url,
               regexp_replace(regexp_replace(u, '/\?', '?', 'g'), '/$', '', 'g')
                   AS canon_url
        FROM c4
    """


def quality_filter_gopher() -> str:
    from .textstats import (
        GOPHER_MAX_MEAN_WORD,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_TOKENS,
        GOPHER_MIN_MEAN_WORD,
        GOPHER_MIN_TOKENS,
    )

    stop = _sql_list(STOPWORDS_EN)
    mean_word = (
        "CASE WHEN n_tok > 0 THEN (n_chars - greatest(n_tok - 1, 0)) / n_tok "
        "ELSE 0.0 END"
    )
    sym_ratio = "CASE WHEN n_chars > 0 THEN n_sym / n_chars ELSE 0.0 END"
    return f"""
        WITH n AS (
          SELECT doc_id, {NORM} AS norm, string_split({NORM}, ' ') AS tok
          FROM documents
        ),
        m AS (
          SELECT doc_id,
                 length(norm) AS n_chars,
                 CASE WHEN norm = '' THEN 0 ELSE len(tok) END AS n_tok,
                 length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g'))
                     AS n_sym,
                 len(list_intersect(list_distinct(tok), {stop})) AS n_stop
          FROM n
        )
        SELECT doc_id,
               CAST(n_tok AS BIGINT) AS n_tokens,
               n_tok >= {GOPHER_MIN_TOKENS} AND n_tok <= {GOPHER_MAX_TOKENS}
                   AS ok_tokens,
               ({mean_word}) >= {GOPHER_MIN_MEAN_WORD}
                 AND ({mean_word}) <= {GOPHER_MAX_MEAN_WORD} AS ok_mean_word,
               ({sym_ratio}) <= {GOPHER_MAX_SYMBOL_RATIO} AS ok_symbols,
               n_stop > 0 AS ok_stopwords,
               (n_tok >= {GOPHER_MIN_TOKENS} AND n_tok <= {GOPHER_MAX_TOKENS})
                 AND (({mean_word}) >= {GOPHER_MIN_MEAN_WORD}
                      AND ({mean_word}) <= {GOPHER_MAX_MEAN_WORD})
                 AND (({sym_ratio}) <= {GOPHER_MAX_SYMBOL_RATIO})
                 AND n_stop > 0 AS keep
        FROM m
    """


# --- multimodal twins --------------------------------------------------------
#
# The media table is synthesized from documents by pure expressions
# (multimodal.media_from_documents): real BMP/WAV/Y4M containers whose
# data bytes are the utf-8 text. DuckDB rebuilds the data byte stream
# from the text column — hex(encode(body)) -> per-byte integer list ->
# the same histogram / checksum / RMS arithmetic the numpy decoders run
# AFTER parsing the real headers. The image twin's position-weighted
# checksum is defined over decoded top-down pixel order (== natural text
# order), so a Spark decoder that failed to un-flip bottom-up BMP rows
# would mismatch here. All outputs are exact integers or single IEEE
# divisions of exact integers, so the twins match bit-for-bit.

_BYTES = (
    "list_transform(range(1, n_bytes + 1), "
    "i -> (strpos('0123456789ABCDEF', substr(h, 2*i-1, 1)) - 1) * 16 "
    "+ (strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1))"
)


def _media_bytes_cte(kind: int) -> str:
    """CTE chain: documents of modality `kind` -> body -> byte list."""
    return f"""
        m AS (SELECT doc_id, coalesce(text, '') AS body
              FROM documents WHERE doc_id % 3 = {kind}),
        b AS (SELECT doc_id, length(body) AS n_chars,
                     octet_length(encode(body)) AS n_bytes,
                     hex(encode(body)) AS h
              FROM m),
        byt AS (SELECT doc_id, n_chars, n_bytes, {_BYTES} AS bytes FROM b)
    """


def mm_ocr_text() -> str:
    """Twin of mm_ocr_text: the render -> container -> decode -> match
    loop is identity by CONSTRUCTION over the font's charset, so the
    expected recovery is the source text with uncovered chars replaced
    by '?' (exactly what the renderer draws for them), and the page
    geometry is pure arithmetic on the text length — any bug anywhere
    in the container build, the row-order flip, the zlib framing or
    the template matcher breaks the hash."""
    return """
        SELECT doc_id,
               CAST(8 AS BIGINT) AS width,
               CAST(CASE WHEN length(coalesce(text, '')) = 0 THEN 1
                         ELSE 8 * length(coalesce(text, '')) END AS BIGINT)
                   AS height,
               CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
               regexp_replace(coalesce(text, ''), '[^a-z ?]', '?', 'g')
                   AS ocr_text,
               CAST(NULL AS VARCHAR) AS error
        FROM documents
    """


def mm_image_features() -> str:
    from .multimodal import _BMP_W, _CHECKSUM_MOD, N_FEATURE_BINS

    bins = ",\n               ".join(
        f"len(list_filter(pix, x -> x // 32 = {k})) / n_pix AS f{k}"
        for k in range(N_FEATURE_BINS)
    )
    pad = "[" + ", ".join("0" * 1 for _ in range(_BMP_W)) + "]"
    return f"""
        WITH {_media_bytes_cte(0)},
        -- the BMP pixel array is the text bytes truncated to whole
        -- {_BMP_W}-px rows and zero-padded to at least one row; the
        -- checksum runs over decoded top-down order == this natural order
        img AS (
          SELECT doc_id,
                 greatest(1, n_bytes // {_BMP_W}) * {_BMP_W} AS n_pix,
                 list_slice(bytes || {pad}, 1,
                            greatest(1, n_bytes // {_BMP_W}) * {_BMP_W}) AS pix
          FROM byt
        )
        SELECT doc_id,
               'image' AS media_type,
               CAST({_BMP_W} AS BIGINT) AS width,
               CAST(n_pix // {_BMP_W} AS BIGINT) AS height,
               CAST(n_pix AS BIGINT) AS n_bytes,
               {bins},
               CAST(list_sum(list_transform(range(1, CAST(n_pix AS BIGINT) + 1),
                    i -> i * CAST(pix[i] AS BIGINT))) % {_CHECKSUM_MOD}
                    AS BIGINT) AS pixel_checksum,
               CAST(NULL AS VARCHAR) AS error
        FROM img
    """


def mm_image_ahash() -> str:
    """Twin of multimodal.mm_image_ahash: rebuild the pixel list like
    mm_image_features, replay the all-integer average hash (floor
    block means over the (cell_r, col) grid, floor global-mean
    threshold, '1'/'0' per cell in grid order), then the exact-bucket
    window. Sums CAST BIGINT before // (HUGEINT trap)."""
    from .multimodal import _BMP_W, AHASH_GRID

    pad = "[" + ", ".join("0" * 1 for _ in range(_BMP_W)) + "]"
    return f"""
        WITH {_media_bytes_cte(0)},
        img AS (
          SELECT doc_id,
                 greatest(1, n_bytes // {_BMP_W}) * {_BMP_W} AS n_pix,
                 list_slice(bytes || {pad}, 1,
                            greatest(1, n_bytes // {_BMP_W}) * {_BMP_W}) AS pix
          FROM byt
        ),
        px AS (
          SELECT doc_id,
                 CAST(n_pix // {_BMP_W} AS BIGINT) AS h,
                 unnest(range(0, CAST(n_pix AS BIGINT))) AS i,
                 unnest(list_transform(pix, x -> CAST(x AS BIGINT))) AS v
          FROM img
        ),
        thr AS (
          SELECT doc_id,
                 CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS t
          FROM px GROUP BY doc_id
        ),
        cell AS (
          SELECT doc_id, cr, cc,
                 CAST(sum(v) AS BIGINT) // CAST(count(*) AS BIGINT) AS m
          FROM (SELECT doc_id,
                       ((i // {_BMP_W}) * {AHASH_GRID}) // h AS cr,
                       i % {_BMP_W} AS cc,
                       v
                FROM px)
          GROUP BY doc_id, cr, cc
        ),
        bits AS (
          SELECT c.doc_id,
                 string_agg(CASE WHEN c.m > t.t THEN '1' ELSE '0' END, ''
                            ORDER BY c.cr, c.cc) AS ahash
          FROM cell c JOIN thr t USING (doc_id)
          GROUP BY c.doc_id
        )
        SELECT doc_id, ahash,
               CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_copies,
               CAST(min(doc_id) OVER (PARTITION BY ahash) AS BIGINT)
                   AS canonical_doc_id,
               (count(*) OVER (PARTITION BY ahash) > 1
                AND doc_id <> min(doc_id) OVER (PARTITION BY ahash))
                   AS is_dup
        FROM bits
    """


def mm_frame_sample() -> str:
    return f"""
        WITH {_media_bytes_cte(2)},
        fr AS (SELECT doc_id, bytes, n_bytes // 64 AS n_frames FROM byt)
        SELECT doc_id,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST((n_frames + 3) // 4 AS BIGINT) AS n_sampled,
               -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
               -- array_join on an empty array is ''
               coalesce(array_to_string(
                 list_transform(
                   list_filter(range(0, CAST(n_frames AS INTEGER)), f -> f % 4 = 0),
                   f -> CAST(list_sum(list_slice(bytes, 64*f + 1, 64*f + 64))
                             % 65536 AS VARCHAR)),
                 ','), '') AS frame_checksums,
               CAST(NULL AS VARCHAR) AS error
        FROM fr
    """


def mm_audio_stats() -> str:
    # WAV data chunk = the utf-8 text bytes as u8 PCM; n_samples is the
    # BYTE count the real chunk walk yields, not the char count
    return f"""
        WITH {_media_bytes_cte(1)}
        SELECT doc_id,
               CAST(16000 AS BIGINT) AS sample_rate,
               CAST(n_bytes AS BIGINT) AS n_samples,
               n_bytes / 16000 AS duration_s,
               CASE WHEN n_bytes = 0 THEN 0.0
                    ELSE sqrt(list_sum(list_transform(bytes,
                              x -> (x - 128) * (x - 128))) / n_bytes) END AS rms,
               CAST(CASE WHEN n_bytes = 0 THEN 0
                    ELSE list_max(list_transform(bytes, x -> abs(x - 128))) END
                    AS BIGINT) AS peak,
               CAST(NULL AS VARCHAR) AS error
        FROM byt
    """



def _recall_sql(approx_sql: str, k: int) -> str:
    """The ONE recall@K twin composition every ANN honesty oracle
    shares (mirrors similarity._recall_vs_exact): the approximate and
    exact subqueries as MATERIALIZED CTEs (each is a deep chain —
    inlining per reference would re-derive it), intersected and
    coalesced per query."""
    return f"""
        WITH exact AS MATERIALIZED ({ann_cosine_topk()}),
        approx AS MATERIALIZED ({approx_sql}),
        hits AS (
          SELECT a.query_id, count(*) AS n_hits
          FROM approx a
          JOIN exact e ON e.query_id = a.query_id
                      AND e.neighbor_id = a.neighbor_id
                      AND e.rk <= {k}
          GROUP BY a.query_id
        ),
        qs AS (SELECT DISTINCT query_id FROM approx)
        SELECT query_id,
               CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
               coalesce(n_hits, 0) / {k} AS recall_at_k
        FROM qs LEFT JOIN hits USING (query_id)
    """


def ann_ivf_recall() -> str:
    """Recall@K of the IVF search vs the exact baseline (shared
    _recall_sql composition, so any drift in either path surfaces
    here too)."""
    from .similarity import IVF_TOP_K

    return _recall_sql(ann_ivf_topk(), IVF_TOP_K)


def ann_hamming_topk() -> str:
    """Twin of similarity.ann_hamming_topk: the identical 32-bit sign
    words (CASE-sum with the same Python-int power-of-two literals),
    integer XOR+popcount Hamming stage with the same (hamming ASC,
    neighbor_id ASC) cut at BQ_CAND, exact left-fold cosine rerank.
    All stage-1 arithmetic is integer-exact; stage 2 is the shared
    _dot fold — no rounding anywhere."""
    from .similarity import BQ_CAND, BQ_TOP_K, BQ_WORD_BITS, EMB_DIMS

    def word(lo: int) -> str:
        return " + ".join(
            f"(CASE WHEN v[{lo + j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(BQ_WORD_BITS)
        )

    word_cols = ",\n".join(
        f"CAST({word(lo)} AS BIGINT) AS w{i}"
        for i, lo in enumerate(range(0, EMB_DIMS, BQ_WORD_BITS))
    )
    return f"""
        WITH {_E2},
        codes AS MATERIALIZED (SELECT vec_id, {word_cols} FROM e2),
        q AS (SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1
              FROM codes WHERE vec_id < {N_QUERIES}),
        cand AS (
          SELECT query_id, neighbor_id, hamming FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   CAST(bit_count(xor(c.w0, q.qw0))
                        + bit_count(xor(c.w1, q.qw1)) AS BIGINT) AS hamming,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY bit_count(xor(c.w0, q.qw0))
                              + bit_count(xor(c.w1, q.qw1)) ASC,
                              c.vec_id ASC) AS hrk
            FROM codes c, q WHERE c.vec_id <> q.query_id
          ) WHERE hrk <= {BQ_CAND}
        ),
        qv AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
               FROM e2 WHERE vec_id < {N_QUERIES}),
        rer AS (
          SELECT t.query_id, t.neighbor_id, t.hamming,
                 {_dot('qv.qv', 'e2.v')} / (qv.qn * e2.nrm) AS cos
          FROM cand t
          JOIN e2 ON e2.vec_id = t.neighbor_id
          JOIN qv USING (query_id)
        )
        SELECT query_id, neighbor_id, hamming, cos, rk FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
               AS BIGINT) AS rk
          FROM rer
        ) WHERE rk <= {BQ_TOP_K}
    """


def ann_hamming_recall() -> str:
    """Recall@K of the sign-quantized Hamming scan vs the exact
    baseline (shared _recall_sql composition)."""
    from .similarity import BQ_TOP_K

    return _recall_sql(ann_hamming_topk(), BQ_TOP_K)


def ann_pq_recall() -> str:
    """Recall@K of the PQ/ADC search vs the exact baseline (shared
    _recall_sql composition; the PQ twin re-trains its codebooks
    independently)."""
    from .similarity import PQ_ORACLE_SQL, PQ_TOP_K

    return _recall_sql(PQ_ORACLE_SQL, PQ_TOP_K)


def ann_ivf_pq_recall() -> str:
    """Recall@K of the IVFADC search vs the exact baseline (shared
    _recall_sql composition with the IVFPQ twin substituted)."""
    from .similarity import IVFPQ_ORACLE_SQL, PQ_TOP_K

    return _recall_sql(IVFPQ_ORACLE_SQL, PQ_TOP_K)


def dedup_embedding_lsh() -> str:
    from .similarity import LSH_COS_THRESHOLD, LSH_TABLES, _hyperplanes

    planes = _hyperplanes()

    def table_sig(tbl: int) -> str:
        terms = []
        for j, plane in enumerate(planes[tbl]):
            lits = "[" + ", ".join(repr(w) for w in plane) + "]::DOUBLE[]"
            dot = (
                f"list_reduce(list_transform(range(1, len(v) + 1), "
                f"i -> v[i] * ({lits})[i]), (x, y) -> x + y)"
            )
            terms.append(f"CASE WHEN {dot} >= 0 THEN {1 << j} ELSE 0 END")
        return " + ".join(terms)

    sig_cols = ",\n".join(
        f"CAST({table_sig(t)} AS BIGINT) AS sig{t}" for t in range(LSH_TABLES)
    )
    sig_case = " ".join(f"WHEN {t} THEN sig{t}" for t in range(LSH_TABLES))
    return f"""
        WITH {_E2},
        s AS MATERIALIZED (SELECT vec_id, v, nrm, {sig_cols} FROM e2),
        banded AS MATERIALIZED (
          SELECT vec_id, g.tbl, CASE g.tbl {sig_case} END AS sig
          FROM s, generate_series(0, {LSH_TABLES - 1}) g(tbl)
        ),
        cand AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM banded a JOIN banded b
            ON a.tbl = b.tbl AND a.sig = b.sig AND a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, cos FROM (
          SELECT cand.vec_a, cand.vec_b,
                 {_dot('ea.v', 'eb.v')} / (ea.nrm * eb.nrm) AS cos
          FROM cand
          JOIN e2 ea ON ea.vec_id = cand.vec_a
          JOIN e2 eb ON eb.vec_id = cand.vec_b
        ) WHERE cos >= {LSH_COS_THRESHOLD}
    """


def text_unigram_rarity() -> str:
    """Twin of operators/textstats.text_unigram_rarity: same tokenizer
    (NORM split on single spaces, empty tokens dropped), same exact
    DECIMAL-sum -> double -> one division -> round(4) ratio shape."""
    return f"""
        WITH tok AS (
          SELECT doc_id, t AS token
          FROM documents, unnest(string_split({NORM}, ' ')) AS u(t)
          WHERE t <> ''
        ),
        freq AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
        agg AS (
          SELECT tok.doc_id,
                 count(*) AS n_tok,
                 round(CAST(sum(CAST(freq.tf AS DECIMAL(28,8))) AS DOUBLE)
                       / count(*), 4) AS mean_tf,
                 round(CAST(sum(CAST(CASE WHEN freq.tf <= 2 THEN 1 ELSE 0 END
                                      AS DECIMAL(28,8))) AS DOUBLE)
                       / count(*), 4) AS rare_frac
          FROM tok JOIN freq USING (token)
          GROUP BY tok.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_tok, 0) AS BIGINT) AS n_tok,
               coalesce(a.mean_tf, 0.0) AS mean_tf,
               coalesce(a.rare_frac, 0.0) AS rare_frac
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """


def quality_filter_c4() -> str:
    """Twin of textstats.quality_filter_c4: identical seeded multi-line
    document, line filter, sentence count, page-level drops. Empty
    kept-list: array_to_string([]) is NULL in DuckDB ('' in Spark) —
    coalesce before counting sentences."""
    from .textstats import C4_MIN_SENTENCES, C4_MIN_WORDS_PER_LINE

    seeded = (
        "substr(coalesce(text,''), 1, 60) || '.'"
        " || chr(10) || substr(coalesce(text,''), 61, 60)"
        " || chr(10) || 'click here'"
        " || chr(10) || substr(coalesce(text,''), 121, 60)"
        " || CASE WHEN doc_id % 7 = 0 THEN ' javascript required.'"
        "         ELSE ' it works well.' END"
        " || chr(10) || CASE WHEN doc_id % 13 = 0"
        "         THEN 'Lorem ipsum dolor sit amet.'"
        "         ELSE 'The quick brown fox jumps over it.' END"
        " || chr(10) || CASE WHEN doc_id % 11 = 0"
        # single braces: this is a PLAIN string interpolated into the
        # f-string below, so its braces are already literal data
        "         THEN 'function() { return 1; }'"
        "         ELSE 'A final line of prose appears here.' END"
    )
    return f"""
        WITH s AS (
          SELECT doc_id, {seeded} AS seeded FROM documents
        ),
        l AS (
          SELECT doc_id, seeded,
                 string_split(seeded, chr(10)) AS lines,
                 list_filter(string_split(seeded, chr(10)),
                     ln -> regexp_matches(ln, '[.!?"]$')
                           AND len(string_split(ln, ' ')) >= {C4_MIN_WORDS_PER_LINE}
                           AND NOT contains(lower(ln), 'javascript')) AS kept
          FROM s
        ),
        m AS (
          SELECT doc_id, seeded, lines, kept,
                 coalesce(array_to_string(kept, chr(10)), '') AS kt
          FROM l
        )
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept_lines,
               CAST(length(kt) - length(regexp_replace(kt, '[.!?]', '', 'g'))
                    AS BIGINT) AS n_sentences,
               contains(lower(seeded), 'lorem ipsum') AS has_lorem,
               contains(seeded, '{{') AS has_brace,
               (length(kt) - length(regexp_replace(kt, '[.!?]', '', 'g'))
                    >= {C4_MIN_SENTENCES})
                 AND NOT contains(lower(seeded), 'lorem ipsum')
                 AND NOT contains(seeded, '{{') AS keep
        FROM m
    """


def quality_filter_fineweb() -> str:
    """Twin of textstats.quality_filter_fineweb: identical seeded
    5-line document, then unnest + a per-(doc,line) count window for
    the duplicated-line char fraction (the Spark side computes the
    same integers with an O(L²) rowwise array probe). Integer counts
    CAST BIGINT (HUGEINT trap); the three ratios are single IEEE
    divisions of those integers, bit-identical."""
    from .textstats import (
        FW_DUP_CHAR_MAX,
        FW_PUNCT_MIN,
        FW_SHORT_CHARS,
        FW_SHORT_MAX,
    )

    p = "CASE WHEN doc_id % 17 = 0 THEN '' ELSE '.' END"
    l1 = (
        "(CASE WHEN doc_id % 19 = 0 THEN 'hi'"
        f" ELSE substr(coalesce(text,''), 1, 50) END || {p})"
    )
    seeded = (
        f"{l1}"
        " || chr(10) || CASE WHEN doc_id % 19 = 0 THEN 'aa bb'"
        "      ELSE substr(coalesce(text,''), 51, 50) END"
        " || chr(10) || CASE WHEN doc_id % 19 = 0 THEN 'tiny'"
        "      ELSE substr(coalesce(text,''), 101, 50) END"
        f" || chr(10) || CASE WHEN doc_id % 6 = 0 THEN {l1}"
        f"      ELSE substr(coalesce(text,''), 151, 40) || {p} END"
        " || chr(10) || (CASE WHEN doc_id % 19 = 0 THEN 'also tiny'"
        "      ELSE 'A closing remark rounds out the page nicely' END"
        f" || {p})"
    )
    return f"""
        WITH s AS (
          SELECT doc_id, {seeded} AS seeded FROM documents
        ),
        ln AS (
          SELECT doc_id, u.line,
                 count(*) OVER (PARTITION BY doc_id, u.line) AS cnt
          FROM s, unnest(string_split(seeded, chr(10))) AS u(line)
        ),
        st AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_lines,
                 CAST(sum(CASE WHEN regexp_matches(line, '[.!?"]$')
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_punct_lines,
                 CAST(sum(CASE WHEN length(line) < {FW_SHORT_CHARS}
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_short_lines,
                 CAST(sum(length(line)) AS BIGINT) AS total_chars,
                 CAST(sum(CASE WHEN cnt > 1 THEN length(line) ELSE 0 END)
                      AS BIGINT) AS dup_chars
          FROM ln GROUP BY doc_id
        )
        SELECT doc_id, n_lines, n_punct_lines, n_short_lines,
               total_chars, dup_chars,
               n_punct_lines / n_lines AS punct_ratio,
               dup_chars / total_chars AS dup_char_frac,
               n_short_lines / n_lines AS short_frac,
               (n_punct_lines / n_lines >= {FW_PUNCT_MIN})
                 AND (dup_chars / total_chars <= {FW_DUP_CHAR_MAX})
                 AND (n_short_lines / n_lines < {FW_SHORT_MAX}) AS keep
        FROM st
    """


def decontam_report() -> str:
    """Twin of curation.decontam_report: the three leg oracles composed
    as MATERIALIZED CTEs (each is a deep chain — inlining per reference
    would re-derive it), fused by equi-joins on doc_id. n_legs CAST
    BIGINT (HUGEINT trap on the int sum)."""
    return f"""
        WITH ng AS MATERIALIZED ({decontam_ngram_overlap()}),
        mh AS MATERIALIZED ({decontam_minhash()}),
        em AS MATERIALIZED ({decontam_embedding()})
        SELECT ng.doc_id,
               ng.contaminated AS ngram_hit,
               mh.contaminated AS minhash_hit,
               em.contaminated AS embedding_hit,
               CAST(CAST(ng.contaminated AS INT)
                    + CAST(mh.contaminated AS INT)
                    + CAST(em.contaminated AS INT) AS BIGINT) AS n_legs,
               (ng.contaminated OR mh.contaminated OR em.contaminated)
                 AS contaminated
        FROM ng
        JOIN mh USING (doc_id)
        JOIN em ON em.vec_id = ng.doc_id
    """


def dedup_url_keep_first() -> str:
    """Twin of dedup.dedup_url_keep_first: same synthesized variants,
    same canonicalization chain as url_canonicalize, then
    group-by-canonical keep-min."""
    return r"""
        WITH r AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0 THEN 'https://www.'
                      ELSE 'HTTPS://WWW.' END
                 || 'site' || (CAST(floor(doc_id / 3) AS BIGINT) % 50)
                 || '.example.com/page/' || CAST(floor(doc_id / 3) AS BIGINT)
                 || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
                 || CASE WHEN doc_id % 2 = 0
                      THEN '?utm_source=feed&page=1' ELSE '?page=1' END
                 || CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS raw_url
          FROM documents
        ),
        c1 AS (SELECT doc_id, regexp_replace(raw_url, '#.*$', '', 'g') AS u FROM r),
        c2 AS (SELECT doc_id,
                      lower(regexp_extract(u, '^([A-Za-z]+://[^/]+)', 1))
                      || regexp_extract(u, '^[A-Za-z]+://[^/]+(.*)$', 1) AS u
               FROM c1),
        c3 AS (SELECT doc_id,
                      regexp_replace(
                        regexp_replace(u, '([?&])utm_[^&]*&', '\1', 'g'),
                        '([?&])utm_[^&]*&', '\1', 'g') AS u
               FROM c2),
        c4 AS (SELECT doc_id,
                      regexp_replace(u, '[?&]utm_[^&]*$', '', 'g') AS u
               FROM c3),
        canon AS (
          SELECT doc_id,
                 regexp_replace(regexp_replace(u, '/\?', '?', 'g'),
                                '/$', '', 'g') AS canon_url
          FROM c4
        )
        SELECT canon_url,
               count(*) AS n_fetches,
               min(doc_id) AS first_doc_id
        FROM canon GROUP BY canon_url
    """


def dedup_substring_spans() -> str:
    """DuckDB twin of operators.dedup.dedup_substring_spans: same
    windows (zipped parallel unnest stands in for posexplode), same
    distinct-doc frequency, same interval-union window pass. Sums are
    CAST BIGINT (HUGEINT trap); the fraction is the same bigint/bigint
    double division as the Spark side."""
    from .dedup import SPAN_W

    w1 = SPAN_W - 1
    return f"""
        WITH n AS (SELECT doc_id, string_split({NORM}, ' ') AS tok,
                          {NORM} AS nt
                   FROM documents),
        w AS (SELECT doc_id,
                     unnest(range(0, len(tok) - {w1})) AS pos,
                     unnest(list_transform(range(0, len(tok) - {w1}),
                            i -> md5(array_to_string(
                                 list_slice(tok, i + 1, i + {SPAN_W}), ' ')))) AS h
              FROM n WHERE len(tok) >= {SPAN_W}),
        dh AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd
                              FROM w GROUP BY h) WHERE nd >= 2),
        dup AS (SELECT doc_id, pos, pos + {w1} AS e FROM w JOIN dh USING (h)),
        m AS (SELECT doc_id, pos, e,
                     CASE WHEN pos > coalesce(max(e) OVER (
                              PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), -2) + 1
                          THEN 1 ELSE 0 END AS brk
              FROM dup),
        g AS (SELECT doc_id, pos, e,
                     sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS gid
              FROM m),
        spans AS (SELECT doc_id, gid, min(pos) AS s, max(e) AS e
                  FROM g GROUP BY doc_id, gid),
        per_doc AS (SELECT doc_id,
                           count(*) AS n_spans,
                           CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
                           max(e - s + 1) AS max_span
                    FROM spans GROUP BY doc_id)
        SELECT n.doc_id,
               CAST(CASE WHEN n.nt = '' THEN 0 ELSE len(n.tok) END
                    AS BIGINT) AS n_tok,
               CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
               CAST(coalesce(p.max_span, 0) AS BIGINT) AS max_span,
               CASE WHEN n.nt = '' THEN 0.0
                    ELSE CAST(coalesce(p.dup_tokens, 0) AS BIGINT)
                         / CAST(len(n.tok) AS BIGINT) END AS dup_token_frac
        FROM n LEFT JOIN per_doc p USING (doc_id)
    """


def agg_domain_stats() -> str:
    """DuckDB twin of textstats.agg_domain_stats: same fingerprints,
    same _davg decimal-avg, same row_number majority-language
    tie-break. Distinct counts and sums CAST BIGINT (HUGEINT trap)."""
    return f"""
        WITH base AS (SELECT coalesce(source, '') AS source,
                             coalesce(lang, '') AS lang,
                             n_chars,
                             md5({NORM}) AS fp
                      FROM documents),
        per AS (SELECT source,
                       CAST(count(*) AS BIGINT) AS n_docs,
                       CAST(sum(n_chars) AS BIGINT) AS total_chars,
                       round(CAST(sum(CAST(n_chars AS DECIMAL(28,8)))
                                  AS DOUBLE) / count(n_chars), 4) AS avg_chars,
                       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                       CAST(count(DISTINCT fp) AS BIGINT) AS n_uniq
                FROM base GROUP BY source),
        lc AS (SELECT source, lang, count(*) AS cnt
               FROM base GROUP BY source, lang),
        top AS (SELECT source, lang AS top_lang FROM (
                    SELECT source, lang,
                           row_number() OVER (PARTITION BY source
                               ORDER BY cnt DESC, lang) AS rn
                    FROM lc) WHERE rn = 1)
        SELECT p.source, n_docs, total_chars, avg_chars, n_langs,
               top_lang, n_uniq,
               (n_docs - n_uniq) / n_docs AS dup_frac
        FROM per p JOIN top USING (source)
    """


def quality_filter_gopher_rep() -> str:
    """DuckDB twin of textstats.quality_filter_gopher_rep: same seeded
    document, same 1-based list_filter index (Spark's lambda index is
    0-based), same explode -> group -> row_number 2-gram argmax with
    the count-desc-then-gram-asc tie-break. list_sum of an empty list
    is NULL in DuckDB — coalesce to Spark aggregate's 0 identity."""
    g2 = _shingle_expr(2)
    return f"""
        WITH s AS (
          SELECT doc_id,
                 substr(coalesce(text, ''), 1, 50) || chr(10)
                 || substr(coalesce(text, ''), 51, 50) || chr(10)
                 || substr(coalesce(text, ''), 1, 50) || chr(10)
                 || 'boiler ' || (doc_id % 3) || chr(10)
                 || CASE WHEN doc_id % 4 = 0
                         THEN substr(coalesce(text, ''), 51, 50)
                         ELSE 'unique tail ' || (doc_id % 7) END AS seeded
          FROM documents
        ),
        l AS (
          SELECT doc_id,
                 string_split(seeded, chr(10)) AS lines,
                 trim(regexp_replace(lower(seeded), '\\s+', ' ', 'g')) AS nrm
          FROM s
        ),
        stats AS (
          SELECT doc_id, nrm,
                 CAST(len(lines) AS BIGINT) AS n_lines,
                 CAST(len(list_filter(lines,
                     (x, i) -> list_position(lines, x) != i)) AS BIGINT)
                     AS n_dup_lines,
                 coalesce(list_sum(list_transform(list_filter(lines,
                     (x, i) -> list_position(lines, x) != i),
                     x -> len(x))), 0) AS rep_chars,
                 list_sum(list_transform(lines, x -> len(x))) AS line_chars
          FROM l
        ),
        e AS (
          SELECT doc_id, u.g
          FROM (SELECT doc_id, string_split(nrm, ' ') AS tok FROM l) t,
               unnest({g2}) u(g)
        ),
        gc AS (SELECT doc_id, g, count(*) AS cnt FROM e GROUP BY doc_id, g),
        top AS (
          SELECT doc_id, g AS top_2gram, CAST(cnt AS BIGINT) AS top_2gram_count
          FROM (SELECT doc_id, g, cnt,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY cnt DESC, g) AS rn
                FROM gc) WHERE rn = 1
        )
        SELECT s.doc_id, s.n_lines, s.n_dup_lines,
               s.n_dup_lines / s.n_lines AS dup_line_frac,
               s.rep_chars / s.line_chars AS dup_line_char_frac,
               t.top_2gram, t.top_2gram_count,
               t.top_2gram_count * len(t.top_2gram) / len(s.nrm)
                   AS top_2gram_char_frac,
               (s.n_dup_lines / s.n_lines <= 0.30) AND
               (t.top_2gram_count * len(t.top_2gram) / len(s.nrm) <= 0.20)
                   AS keep
        FROM stats s JOIN top t USING (doc_id)
    """

def decontam_ngram_overlap() -> str:
    """Twin of curation.decontam_ngram_overlap: same SPAN_W windows as
    dedup_substring_spans, same hash15 benchmark membership as
    sketch.sample_hash_stable, distinct-window left join, coalesced
    zeros for windowless docs. Counts CAST BIGINT (HUGEINT trap); the
    fraction is the same bigint/bigint double division."""
    from .curation import DECON_BENCH_THRESHOLD
    from .dedup import SPAN_W

    w1 = SPAN_W - 1
    bench = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) < {DECON_BENCH_THRESHOLD}"
    )
    return f"""
        WITH n AS (SELECT doc_id, string_split({NORM}, ' ') AS tok
                   FROM documents),
        w AS (SELECT doc_id,
                     unnest(list_transform(range(0, len(tok) - {w1}),
                            i -> md5(array_to_string(
                                 list_slice(tok, i + 1, i + {SPAN_W}), ' ')))) AS h
              FROM n WHERE len(tok) >= {SPAN_W}),
        bh AS (SELECT DISTINCT h FROM w WHERE {bench}),
        cw AS (SELECT DISTINCT doc_id, h FROM w WHERE NOT ({bench})),
        per AS (SELECT cw.doc_id,
                       CAST(count(*) AS BIGINT) AS n_win,
                       CAST(sum(CASE WHEN bh.h IS NOT NULL THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_hit
                FROM cw LEFT JOIN bh USING (h) GROUP BY cw.doc_id),
        corpus AS (SELECT doc_id FROM documents WHERE NOT ({bench}))
        SELECT corpus.doc_id,
               CAST(coalesce(p.n_win, 0) AS BIGINT) AS n_win,
               CAST(coalesce(p.n_hit, 0) AS BIGINT) AS n_hit,
               CASE WHEN coalesce(p.n_win, 0) = 0 THEN 0.0
                    ELSE CAST(coalesce(p.n_hit, 0) AS BIGINT)
                         / CAST(p.n_win AS BIGINT) END AS hit_frac,
               coalesce(p.n_hit, 0) > 0 AS contaminated
        FROM corpus LEFT JOIN per p USING (doc_id)
    """


def decontam_minhash() -> str:
    """Twin of curation.decontam_minhash: the verbatim
    _minhash_band_ctes chain split by the hash15 benchmark predicate,
    broadcast-shaped joins re-expressed relationally, same argmax
    tie-break and coalesced zeros."""
    from .curation import DECON_BENCH_THRESHOLD, DECONTAM_J

    def bench(col: str) -> str:
        return (
            f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15)) "
            f"AS BIGINT) < {DECON_BENCH_THRESHOLD}"
        )

    jac = (
        "len(list_intersect(sa.shd, sb.shd)) "
        "/ (len(sa.shd) + len(sb.shd) - len(list_intersect(sa.shd, sb.shd)))"
    )
    return f"""
        {_minhash_band_ctes()},
        cand AS MATERIALIZED (
          SELECT DISTINCT a.doc_id, b.doc_id AS bench_id
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
          WHERE NOT ({bench('a.doc_id')}) AND ({bench('b.doc_id')})
        ),
        scored AS (
          SELECT cand.doc_id, cand.bench_id, {jac} AS jaccard
          FROM cand
          JOIN s sa ON sa.doc_id = cand.doc_id
          JOIN s sb ON sb.doc_id = cand.bench_id
        ),
        best AS (
          SELECT doc_id, bench_id AS best_bench_id, jaccard AS max_jaccard
          FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY jaccard DESC, bench_id ASC) AS rn
                FROM scored) WHERE rn = 1
        ),
        nc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cand
               FROM cand GROUP BY doc_id),
        corpus AS (SELECT doc_id FROM documents
                   WHERE NOT ({bench('doc_id')}))
        SELECT corpus.doc_id,
               CAST(coalesce(nc.n_cand, 0) AS BIGINT) AS n_cand,
               best.best_bench_id,
               coalesce(best.max_jaccard, 0.0) AS max_jaccard,
               coalesce(best.max_jaccard, 0.0) >= {DECONTAM_J} AS contaminated
        FROM corpus
        LEFT JOIN nc USING (doc_id)
        LEFT JOIN best USING (doc_id)
    """


def sample_domain_cap() -> str:
    """Twin of curation.sample_domain_cap: same coalesced domain key,
    same (n_chars DESC, doc_id ASC) deterministic order, same cap."""
    from .curation import DOMAIN_CAP

    return f"""
        SELECT source, doc_id, n_chars, rn FROM (
            SELECT coalesce(source, '') AS source,
                   doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   row_number() OVER (PARTITION BY coalesce(source, '')
                       ORDER BY n_chars DESC, doc_id ASC) AS rn
            FROM documents
        ) WHERE rn <= {DOMAIN_CAP}
    """


def dedup_minhash_keep_canonical() -> str:
    """Twin of curation.dedup_minhash_keep_canonical: the exact
    transitive-closure labels (verbatim dedup_connected_components
    twin) extended with a per-component count window and the
    keep-the-minimum verdict."""
    cc_sql = dedup_connected_components()
    return f"""
        WITH cc AS ({cc_sql})
        SELECT doc_id,
               component_id,
               CAST(count(*) OVER (PARTITION BY component_id)
                    AS BIGINT) AS cluster_size,
               doc_id = component_id AS keep
        FROM cc
    """

def dedup_lines_global() -> str:
    """Twin of curation.dedup_lines_global: same seeded multi-line doc,
    same canonical line key, first-(doc_id,pos)-wins via row_number
    (identical semantics to the Spark side's min-struct aggregate),
    same exemption guard, ordered string_agg reconstruction."""
    from .curation import MIN_LINE_TOKENS

    nlx = r"trim(regexp_replace(lower(coalesce(line, '')), '\s+', ' ', 'g'))"
    return f"""
        WITH s AS (
          SELECT doc_id,
                 substr(coalesce(text, ''), 1, 50) || chr(10)
                 || substr(coalesce(text, ''), 51, 50) || chr(10)
                 || CASE WHEN doc_id % 2 = 0
                         THEN 'all rights reserved by the site operator'
                         ELSE 'subscribe to our newsletter for updates today'
                    END || chr(10)
                 || substr(coalesce(text, ''), 101, 50) AS seeded
          FROM documents
        ),
        l AS (SELECT doc_id, string_split(seeded, chr(10)) AS ls FROM s),
        x AS (SELECT doc_id,
                     unnest(range(0, len(ls))) AS pos,
                     unnest(ls) AS line
              FROM l),
        v AS (SELECT doc_id, pos, line,
                     {nlx} <> ''
                       AND len(string_split({nlx}, ' ')) >= {MIN_LINE_TOKENS}
                       AS dedupable,
                     md5({nlx}) AS h
              FROM x),
        verdict AS (
          SELECT doc_id, pos, line, rn = 1 AS kept FROM (
            SELECT doc_id, pos, line,
                   row_number() OVER (PARTITION BY h
                       ORDER BY doc_id, pos) AS rn
            FROM v WHERE dedupable)
          UNION ALL
          SELECT doc_id, pos, line, TRUE AS kept FROM v WHERE NOT dedupable
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_removed,
               CAST(sum(CASE WHEN NOT kept THEN 1 ELSE 0 END) AS BIGINT)
                 / CAST(count(*) AS BIGINT) AS removed_frac,
               coalesce(string_agg(line, chr(10) ORDER BY pos)
                            FILTER (WHERE kept), '') AS cleaned_text
        FROM verdict GROUP BY doc_id
    """

def sample_token_budget() -> str:
    """Twin of curation.sample_token_budget: identical quality
    arithmetic (same as text_quality_scores' proven-bit-exact oracle),
    same (quality DESC, doc_id) order, same explicit ROWS frame for the
    running token sum, same inclusive budget cut."""
    from .curation import TOKEN_BUDGET

    stop = _sql_list(STOPWORDS_EN)
    return f"""
        WITH n AS (
          SELECT coalesce(source, '') AS source, doc_id,
                 {NORM} AS norm, string_split({NORM}, ' ') AS tok
          FROM documents
        ),
        m AS (
          SELECT source, doc_id,
                 CASE WHEN norm = '' THEN 0 ELSE len(tok) END AS n_tok,
                 length(norm) AS n_chars,
                 length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')) AS n_punct,
                 len(list_filter(tok, t -> list_contains({stop}, t))) AS n_stop
          FROM n
        ),
        q AS (
          SELECT source, doc_id,
                 CAST(n_tok AS BIGINT) AS n_tok,
                 least(1.0, n_tok / 50.0) * 0.4
                   + (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 0.3
                   + least(1.0, CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END * 5.0) * 0.3
                   AS quality
          FROM m
        )
        SELECT source, doc_id, n_tok, quality, cum_tok FROM (
          SELECT source, doc_id, n_tok, quality,
                 CAST(sum(n_tok) OVER (PARTITION BY source
                     ORDER BY quality DESC, doc_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_tok
          FROM q
        ) WHERE cum_tok <= {TOKEN_BUDGET}
    """

def dedup_embedding_keep_canonical() -> str:
    """Twin of curation.dedup_embedding_keep_canonical: exact
    transitive closure of the SRP-LSH pair graph (verbatim
    dedup_embedding_lsh twin) over all embeddings, then the
    count-window + keep-the-minimum verdict."""
    pairs_sql = dedup_embedding_lsh()
    return f"""
        WITH RECURSIVE pairs AS MATERIALIZED ({pairs_sql}),
        edges AS MATERIALIZED (
            SELECT vec_a AS a, vec_b AS b FROM pairs
            UNION ALL
            SELECT vec_b AS a, vec_a AS b FROM pairs
        ),
        reach(src, node) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.node = e.a
        ),
        cc AS (SELECT src AS vec_id, min(node) AS component_id
               FROM reach GROUP BY src)
        SELECT vec_id,
               component_id,
               CAST(count(*) OVER (PARTITION BY component_id)
                    AS BIGINT) AS cluster_size,
               vec_id = component_id AS keep
        FROM cc
    """

def curation_funnel() -> str:
    """Twin of curation.curation_funnel: the four gate twins verbatim
    as MATERIALIZED CTEs, joined on doc_id, progressive-conjunction
    counts per coalesced domain. Sums CAST BIGINT (HUGEINT trap)."""
    return f"""
        WITH g AS MATERIALIZED ({quality_filter_gopher()}),
        c AS MATERIALIZED ({quality_filter_c4()}),
        d AS MATERIALIZED ({dedup_minhash_keep_canonical()}),
        x AS MATERIALIZED ({decontam_ngram_overlap()})
        SELECT coalesce(doc.source, '') AS source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN g.keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pass_gopher,
               CAST(sum(CASE WHEN g.keep AND c.keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pass_c4,
               CAST(sum(CASE WHEN g.keep AND c.keep AND d.keep
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_dedup,
               CAST(sum(CASE WHEN g.keep AND c.keep AND d.keep
                             AND coalesce(NOT x.contaminated, FALSE)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_final
        FROM documents doc
        JOIN g USING (doc_id)
        JOIN c USING (doc_id)
        JOIN d USING (doc_id)
        LEFT JOIN x USING (doc_id)
        GROUP BY 1
    """


def filter_bloom_blocklist() -> str:
    """Twin of curation.filter_bloom_blocklist: same url construction
    as pipeline_main_text (coalesced source), same salted hash15 bit
    positions mod BLOOM_M, same K left joins against the DISTINCT
    set-bit table, same exact-predicate delta columns."""
    from .curation import BLOOM_BLOCK_MOD, BLOOM_K, BLOOM_M

    def h15(expr: str) -> str:
        return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

    pos = [h15(f"'{j}:' || url") + f" % {BLOOM_M}" for j in range(BLOOM_K)]
    qs = ",\n                 ".join(
        f"{p} AS q{j}" for j, p in enumerate(pos)
    )
    joins = "\n        ".join(
        f"LEFT JOIN bits b{j} ON p.q{j} = b{j}.pos" for j in range(BLOOM_K)
    )
    hit = " AND ".join(f"b{j}.pos IS NOT NULL" for j in range(BLOOM_K))
    blocked = f"{h15('url')} % {BLOOM_BLOCK_MOD} = 0"
    return f"""
        WITH d AS (
          SELECT doc_id,
                 'https://' || coalesce(source, '') || '.example.com/doc/'
                     || CAST(doc_id AS VARCHAR) AS url
          FROM documents
        ),
        bits AS (
          SELECT DISTINCT unnest([{", ".join(pos)}]) AS pos
          FROM d WHERE {blocked}
        ),
        probe AS (
          SELECT doc_id, url,
                 {qs},
                 {blocked} AS truly
          FROM d
        )
        SELECT p.doc_id, p.url,
               ({hit}) AS possibly_blocked,
               p.truly AS truly_blocked,
               ({hit}) AND NOT p.truly AS false_positive
        FROM probe p
        {joins}
    """


def dedup_incremental_lsh() -> str:
    """Twin of operators/dedup.dedup_incremental_lsh: same band CTEs,
    increment carved by hash60(doc_id) % INCR_NEW_MOD == 0, verdict per
    new doc with arg_min-selected smallest eligible duplicate partner."""
    from .dedup import INCR_NEW_MOD

    is_new = (
        "CAST(('0x' || substr(md5(CAST({d} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {INCR_NEW_MOD} = 0"
    )
    return f"""
        {_minhash_band_ctes()},
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_other
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc_id <> b.doc_id
          WHERE ({is_new.format(d='a.doc_id')})
            AND (NOT ({is_new.format(d='b.doc_id')})
                 OR b.doc_id < a.doc_id)
        ),
        ver AS (
          SELECT doc_new, doc_other, jaccard FROM (
            SELECT cand.doc_new, cand.doc_other,
                   len(list_intersect(sa.shd, sb.shd))
                     / (len(sa.shd) + len(sb.shd)
                        - len(list_intersect(sa.shd, sb.shd))) AS jaccard
            FROM cand
            JOIN s sa ON sa.doc_id = cand.doc_new
            JOIN s sb ON sb.doc_id = cand.doc_other
          ) WHERE jaccard >= 0.5
        ),
        m AS (
          SELECT doc_new,
                 min(doc_other) AS match_doc_id,
                 arg_min(jaccard, doc_other) AS match_jaccard
          FROM ver GROUP BY doc_new
        )
        SELECT d.doc_id,
               m.match_doc_id IS NOT NULL AS is_dup,
               m.match_doc_id,
               m.match_jaccard
        FROM (SELECT doc_id FROM documents
              WHERE {is_new.format(d='doc_id')}) d
        LEFT JOIN m ON m.doc_new = d.doc_id
    """


def sample_pack_sequences() -> str:
    """Twin of curation.sample_pack_sequences: identical token count
    ({NORM} whitespace split), identical hash60 shard + order keys,
    the same two-level prefix sum (per-shard running BIGINT sum +
    exclusive shard-base prefix), and integer // for the chunk ids
    (Spark DIV). Every sum CAST BIGINT (HUGEINT trap)."""
    from .curation import PACK_SEQ_LEN, PACK_SHARDS

    return f"""

    WITH n AS (
        SELECT doc_id, {NORM} AS norm FROM documents
    ),
    t AS (
        SELECT doc_id,
               CAST(CASE WHEN norm = '' THEN 0
                    ELSE len(string_split(norm, ' ')) END AS BIGINT) AS n_tok,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) AS h
        FROM n
    ),
    s AS (
        SELECT doc_id, n_tok, h, CAST(h % {PACK_SHARDS} AS BIGINT) AS shard
        FROM t WHERE n_tok > 0
    ),
    c AS (
        SELECT doc_id, n_tok, shard, h,
               CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum
        FROM s
    ),
    tot AS (
        SELECT shard, CAST(sum(n_tok) AS BIGINT) AS shard_tok
        FROM s GROUP BY shard
    ),
    b AS (
        SELECT shard,
               CAST(coalesce(sum(shard_tok) OVER (ORDER BY shard
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS shard_base
        FROM tot
    ),
    o AS (
        SELECT c.doc_id, c.shard, c.n_tok,
               CAST(b.shard_base + c.cum - c.n_tok AS BIGINT) AS tok_offset
        FROM c JOIN b USING (shard)
    )
    SELECT doc_id, shard, n_tok, tok_offset,
           CAST(tok_offset // {PACK_SEQ_LEN} AS BIGINT) AS seq_first,
           CAST((tok_offset + n_tok - 1) // {PACK_SEQ_LEN} AS BIGINT) AS seq_last,
           CAST((tok_offset + n_tok - 1) // {PACK_SEQ_LEN}
                - tok_offset // {PACK_SEQ_LEN} + 1 AS BIGINT) AS n_seqs,
           CAST(tok_offset % {PACK_SEQ_LEN} AS BIGINT) AS pos_in_seq,
           ((tok_offset + n_tok - 1) // {PACK_SEQ_LEN})
               > (tok_offset // {PACK_SEQ_LEN}) AS crosses_seq
    FROM o
    """


def embedding_label_outliers() -> str:
    """Twin of similarity.embedding_label_outliers: identical
    floor(x*EMB_SCALE) BIGINT centroid (order-free integer sum, CAST
    BIGINT against the HUGEINT trap), list(s ORDER BY pos) rebuild,
    and the shared strict-left-fold double dot (_dot after the 0.0
    identity on the Spark side — IEEE-identical)."""
    from .similarity import EMB_SCALE, OUTLIER_BOTTOM_K

    return f"""
        WITH e AS (
            SELECT vec_id, CAST(label AS BIGINT) AS label,
                   embedding::DOUBLE[] AS v
            FROM embeddings
        ),
        q AS (
            SELECT vec_id, label, v,
                   list_transform(v, x -> CAST(floor(x * {EMB_SCALE})
                       AS BIGINT)) AS qv
            FROM e
        ),
        ex AS (
            SELECT label,
                   unnest(range(1, len(qv) + 1)) AS pos,
                   unnest(qv) AS comp
            FROM q
        ),
        cent AS (
            SELECT label, pos, CAST(sum(comp) AS BIGINT) AS s
            FROM ex GROUP BY label, pos
        ),
        carr AS (
            SELECT label,
                   list_transform(list(s ORDER BY pos),
                                  x -> CAST(x AS DOUBLE)) AS c
            FROM cent GROUP BY label
        ),
        scored AS (
            SELECT q.vec_id, q.label,
                   {_dot('q.v', 'carr.c')}
                       / (sqrt({_dot('q.v', 'q.v')})
                          * sqrt({_dot('carr.c', 'carr.c')})) AS cos_centroid
            FROM q JOIN carr USING (label)
        )
        SELECT vec_id, label, cos_centroid,
               CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS n_label,
               CAST(row_number() OVER (PARTITION BY label
                   ORDER BY cos_centroid, vec_id) AS BIGINT) AS rn,
               row_number() OVER (PARTITION BY label
                   ORDER BY cos_centroid, vec_id) <= {OUTLIER_BOTTOM_K}
                   AS is_outlier
        FROM scored
    """


def text_chunk_windows() -> str:
    """Twin of textstats.text_chunk_windows: same norm-split tokens,
    same closed-form chunk count (integer //), DuckDB list_slice with
    its INCLUSIVE end index vs Spark slice's length arg — both yield
    tokens [k*S+1 .. min(k*S+W, n_tok)]. Chunks are never empty, so
    array_to_string never sees [] (the NULL-vs-'' trap)."""
    from .textstats import CHUNK_S, CHUNK_W

    W, S = CHUNK_W, CHUNK_S
    return f"""
        WITH n AS (SELECT doc_id, {NORM} AS norm FROM documents),
        b AS (
            SELECT doc_id, string_split(norm, ' ') AS tok,
                   CAST(CASE WHEN norm = '' THEN 0
                        ELSE len(string_split(norm, ' ')) END AS BIGINT) AS n_tok
            FROM n
        ),
        c AS (
            SELECT doc_id, tok, n_tok,
                   CASE WHEN n_tok <= {W} THEN 1
                        ELSE 1 + (n_tok - {W} + {S} - 1) // {S} END AS n_chunks
            FROM b WHERE n_tok > 0
        ),
        ex AS (
            SELECT doc_id, tok, n_tok, unnest(range(0, n_chunks)) AS k FROM c
        )
        SELECT doc_id,
               CAST(k AS BIGINT) AS chunk_id,
               CAST(k * {S} AS BIGINT) AS tok_start,
               CAST(least(k * {S} + {W}, n_tok) AS BIGINT) AS tok_end,
               CAST(least(k * {S} + {W}, n_tok) - k * {S} AS BIGINT) AS n_tok_chunk,
               array_to_string(list_slice(tok, k * {S} + 1,
                   least(k * {S} + {W}, n_tok)), ' ') AS chunk_text
        FROM ex
    """


def crawl_delta_report() -> str:
    from .dedup import DELTA_CHANGED_MOD, DELTA_GONE_MOD, DELTA_NEW_MOD

    b_norm = (
        r"trim(regexp_replace(lower(coalesce(text, '') || ' updated ' "
        r"|| doc_id), '\s+', ' ', 'g'))"
    )
    return f"""
        WITH a AS (
            SELECT 'https://' || source || '.example.com/doc/' || doc_id
                       AS url,
                   md5({NORM}) AS fp_a
            FROM documents
        ),
        b AS (
            SELECT 'https://' || source || '.example.com/doc/' || doc_id
                       AS url,
                   md5(CASE WHEN doc_id % {DELTA_CHANGED_MOD} = 0
                            THEN {b_norm} ELSE {NORM} END) AS fp_b
            FROM documents WHERE doc_id % {DELTA_GONE_MOD} <> 0
            UNION ALL
            SELECT 'https://' || source || '.example.com/doc/new-' || doc_id,
                   md5('fresh ' || doc_id)
            FROM documents WHERE doc_id % {DELTA_NEW_MOD} = 0
        )
        SELECT coalesce(a.url, b.url) AS url, fp_a, fp_b,
               CASE WHEN fp_b IS NULL THEN 'gone'
                    WHEN fp_a IS NULL THEN 'new'
                    WHEN fp_a = fp_b THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM a FULL OUTER JOIN b ON a.url = b.url
    """


def mm_video_scene_cut() -> str:
    """Twin of multimodal.mm_video_scene_cut: frames are the 64-byte
    text slices the Y4M container carries (same reconstruction as
    mm_frame_sample), every adjacent-pair SAD rebuilt with nested list
    lambdas over the hex-decoded byte list — the hash pins the frame
    walk AND the cut rule. DuckDB range(a, b) with b <= a is empty, so
    the 0- and 1-frame edges fall out of the same expressions."""
    from .multimodal import SCENE_CUT_THR

    return f"""
        WITH {_media_bytes_cte(2)},
        fr AS (SELECT doc_id, bytes, n_bytes // 64 AS n_frames FROM byt),
        sad AS (
          SELECT doc_id, n_frames,
                 list_transform(
                   range(0, CAST(n_frames - 1 AS INTEGER)),
                   f -> list_sum(list_transform(range(1, 65),
                        i -> abs(bytes[64*f + i] - bytes[64*(f+1) + i])))
                 ) AS sads
          FROM fr
        )
        SELECT doc_id,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST(len(list_filter(sads, s -> s > {SCENE_CUT_THR}))
                    AS BIGINT) AS n_cuts,
               coalesce(array_to_string(
                 list_transform(
                   list_filter(range(0, CAST(n_frames - 1 AS INTEGER)),
                               f -> sads[f + 1] > {SCENE_CUT_THR}),
                   f -> CAST(f + 1 AS VARCHAR)),
                 ','), '') AS cut_frames,
               CAST(coalesce(list_max(sads), 0) AS BIGINT) AS max_sad,
               CAST(NULL AS VARCHAR) AS error
        FROM sad
    """


def mm_audio_vad() -> str:
    """Twin of multimodal.mm_audio_vad: windows are VAD_WIN-byte slices
    of the PCM byte list (the data chunk is the utf-8 text, same
    reconstruction as mm_audio_stats), energies exact integer sums,
    segments counted as rising edges (active AND NOT prev-active) so
    the whole segmenter replays in list lambdas."""
    from .multimodal import VAD_THR, VAD_WIN

    return f"""
        WITH {_media_bytes_cte(1)},
        w AS (SELECT doc_id, bytes, n_bytes // {VAD_WIN} AS n_win FROM byt),
        en AS (
          SELECT doc_id, n_win,
                 list_transform(
                   range(0, CAST(n_win AS INTEGER)),
                   f -> list_sum(list_transform(range(1, {VAD_WIN + 1}),
                        i -> (bytes[{VAD_WIN}*f + i] - 128)
                           * (bytes[{VAD_WIN}*f + i] - 128)))
                 ) AS ens
          FROM w
        ),
        seg AS (
          SELECT doc_id, n_win, ens,
                 list_transform(ens, e -> e > {VAD_THR}) AS act
          FROM en
        )
        SELECT doc_id,
               CAST(n_win AS BIGINT) AS n_windows,
               CAST(len(list_filter(act, a -> a)) AS BIGINT) AS n_active,
               CAST(len(list_filter(range(0, CAST(n_win AS INTEGER)),
                        f -> act[f + 1] AND (f = 0 OR NOT act[f])))
                    AS BIGINT) AS n_segments,
               CAST(CASE WHEN n_win > 0
                    THEN (1000000 * len(list_filter(act, a -> a))) // n_win
                    ELSE 0 END AS BIGINT) AS active_frac_e6,
               CAST(coalesce(list_max(ens), 0) AS BIGINT) AS max_energy,
               CAST(NULL AS VARCHAR) AS error
        FROM seg
    """
