"""Outlink extraction + anchor-text aggregation (the WAT side of a
crawl extract).

Common Crawl publishes three artifacts per segment: WARC (raw), WET
(extracted text — operators/roundtrip.pipeline_wet_roundtrip), and WAT
(metadata incl. every outlink with its anchor text). These operators
fill the WAT role over the SAME fused kernel pass that produces
main_text: the HTML parser records (href, anchor) pairs passively
(kernels/html.py links recorder, zero effect on main_text bytes) and
resolves each href against the page url (RFC-3986-lite,
kernels/html.resolve_url).

  extract_outlinks   one row per anchor in document order — raw href,
                     absolute resolution, anchor text
  anchor_text_index  per target url: in-link count, distinct linking
                     domains, and the dominant anchor text — the
                     aggregation behind anchor-text retrieval and
                     link-spam heuristics

Scale shape: extraction is the existing single-mapInPandas pass; the
explode is scan-side (no Exchange before the aggregate); the index is
one (resolved, anchor) partial-agg shuffle plus a per-target window —
the same map-side-combinable two-level pattern as agg_domain_stats.

Pages are synthesized with four deterministic content anchors per
document (absolute, root-relative, ../relative, protocol-relative) on
top of the chrome's eight constant nav/aside/footer links, so every
resolution branch and the boilerplate-link path are all exercised; the
DuckDB twin reconstructs all twelve links per page by arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..pipeline import doc_ts_expr, doc_url_expr, extract_pages, html_escape_col

# (link_idx, href, anchor) of the chrome links every synthetic page
# carries, in document order: nav(4), aside(1), ... footer(3). Body
# anchors occupy positions 5-8.
CHROME_LINKS = [
    (0, "/", "Home"),
    (1, "/products", "Products"),
    (2, "/about", "About"),
    (3, "/contact", "Contact"),
    (4, "/ad", "Buy now! Limited offer!"),
    (9, "/tos", "Terms"),
    (10, "/privacy", "Privacy"),
    (11, "/sitemap", "Sitemap"),
]

HUB_MOD = 50  # hub targets: doc_id % HUB_MOD
ANCHOR_MOD = 100  # hub anchor text varies doc_id % ANCHOR_MOD
DOC_MOD = 1000  # root-relative /doc/ targets
TOPIC_MOD = 20  # ../topic/ targets
CDN_MOD = 7  # protocol-relative cdn targets


def _linked_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic pages whose article body carries the four content
    anchors; chrome contributes the constant eight."""
    from ..datagen import _CHROME_FOOT, _CHROME_HEAD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    html = F.concat(
        F.lit(_CHROME_HEAD.format(title="Doc") + "<article><p>"),
        html_escape_col(F.coalesce(F.col("text"), F.lit(""))),
        F.lit('</p><p>See <a href="https://hub.example.com/page/'),
        (d % HUB_MOD).cast("string"),
        F.lit('">hub '),
        (d % ANCHOR_MOD).cast("string"),
        F.lit('</a> and <a href="/doc/'),
        ((d * 3 + 1) % DOC_MOD).cast("string"),
        F.lit('">doc '),
        ((d * 3 + 1) % DOC_MOD).cast("string"),
        F.lit('</a> and <a href="../topic/'),
        (d % TOPIC_MOD).cast("string"),
        F.lit('">topic '),
        (d % TOPIC_MOD).cast("string"),
        F.lit('</a> and <a href="//cdn.example.com/asset/'),
        (d % CDN_MOD).cast("string"),
        F.lit('">asset '),
        (d % CDN_MOD).cast("string"),
        F.lit("</a>.</p></article>" + _CHROME_FOOT),
    )
    return docs.select(
        doc_url_expr().alias("url"),
        doc_ts_expr().alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def _exploded_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = _linked_pages(spark, sf_dir)
    out = extract_pages(pages, run_id="links", num_partitions=8)
    return out.select(
        F.regexp_extract("url", r"^https://([^./]+)\.", 1).alias("src_domain"),
        F.regexp_extract("url", r"doc/(\d+)$", 1).cast("long").alias("doc_id"),
        F.posexplode("links").alias("link_idx", "l"),
    )


def extract_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, link_idx, href, resolved, anchor) through the full
    kernel path — every href form and the chrome links included."""
    rows = _exploded_links(spark, sf_dir)
    return rows.select(
        "doc_id",
        F.col("link_idx").cast("long").alias("link_idx"),
        F.col("l")["href"].alias("href"),
        F.col("l")["resolved"].alias("resolved"),
        F.col("l")["anchor"].alias("anchor"),
    )


def anchor_text_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per resolved target: in-link volume, distinct linking domains,
    dominant anchor text (count desc, anchor asc tie-break)."""
    rows = _exploded_links(spark, sf_dir).select(
        "src_domain", F.col("l")["resolved"].alias("resolved"),
        F.col("l")["anchor"].alias("anchor"),
    )
    per_anchor = rows.groupBy("resolved", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("resolved").orderBy(
        F.col("n").desc(), F.col("anchor").asc()
    )
    top = (
        per_anchor.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "resolved",
            F.col("anchor").alias("top_anchor"),
            F.col("n").alias("top_anchor_n"),
        )
    )
    totals = rows.groupBy("resolved").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("src_domain").alias("n_domains"),
    )
    return totals.join(top, "resolved").select(
        "resolved", "n_links", "n_domains", "top_anchor", "top_anchor_n"
    )


# --- DuckDB twins -------------------------------------------------------------

_CHROME_VALUES = ", ".join(
    f"({i}, '{href}', '{anchor}')" for i, href, anchor in CHROME_LINKS
)

# all twelve links per document, reconstructed by arithmetic
_LINKS_CTE = f"""
    d AS (SELECT doc_id, source FROM documents),
    chrome(link_idx, href, anchor) AS (VALUES {_CHROME_VALUES}),
    links AS (
        SELECT doc_id, source, CAST(link_idx AS BIGINT) AS link_idx, href,
               'https://' || source || '.example.com' || href AS resolved,
               anchor
        FROM d CROSS JOIN chrome
        UNION ALL
        SELECT doc_id, source, 5,
               'https://hub.example.com/page/' || (doc_id % {HUB_MOD}),
               'https://hub.example.com/page/' || (doc_id % {HUB_MOD}),
               'hub ' || (doc_id % {ANCHOR_MOD})
        FROM d
        UNION ALL
        SELECT doc_id, source, 6,
               '/doc/' || ((doc_id * 3 + 1) % {DOC_MOD}),
               'https://' || source || '.example.com/doc/'
                   || ((doc_id * 3 + 1) % {DOC_MOD}),
               'doc ' || ((doc_id * 3 + 1) % {DOC_MOD})
        FROM d
        UNION ALL
        SELECT doc_id, source, 7,
               '../topic/' || (doc_id % {TOPIC_MOD}),
               'https://' || source || '.example.com/topic/'
                   || (doc_id % {TOPIC_MOD}),
               'topic ' || (doc_id % {TOPIC_MOD})
        FROM d
        UNION ALL
        SELECT doc_id, source, 8,
               '//cdn.example.com/asset/' || (doc_id % {CDN_MOD}),
               'https://cdn.example.com/asset/' || (doc_id % {CDN_MOD}),
               'asset ' || (doc_id % {CDN_MOD})
        FROM d
    )
"""

OUTLINKS_ORACLE_SQL = f"""
    WITH {_LINKS_CTE}
    SELECT doc_id, link_idx, href, resolved, anchor FROM links
"""

ANCHOR_INDEX_ORACLE_SQL = f"""
    WITH {_LINKS_CTE},
    per_anchor AS (
        SELECT resolved, anchor, count(*) AS n
        FROM links GROUP BY resolved, anchor
    ),
    top AS (
        SELECT resolved, anchor AS top_anchor, n AS top_anchor_n
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY resolved ORDER BY n DESC, anchor ASC) AS rk
              FROM per_anchor)
        WHERE rk = 1
    ),
    totals AS (
        SELECT resolved, count(*) AS n_links,
               count(DISTINCT source) AS n_domains
        FROM links GROUP BY resolved
    )
    SELECT t.resolved, t.n_links, t.n_domains, p.top_anchor,
           p.top_anchor_n
    FROM totals t JOIN top p USING (resolved)
"""


# --- robots.txt politeness gate over the discovered frontier -----------------


def filter_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate the extracted outlink frontier through per-domain robots.txt
    (the politeness pass between WAT discovery and the next crawl wave).

    A deterministic robots.txt is synthesized per source domain
    (User-agent: *, an unconditional `Disallow: /ad`, `Disallow: /doc/`
    for every 5th domain, `Disallow: /topic/` + `Allow: /topic/1` for
    every 3rd, plus a Crawl-delay). The Spark side PARSES the text
    generically — line split, rule extraction, Google-spec longest-match
    with Allow winning length ties — all as array expressions over a
    broadcast |domains|-row rules table, so the frontier side is
    shuffle-free. Foreign hosts with no robots.txt pass (allowed, no
    delay). The DuckDB twin reconstructs every verdict by arithmetic
    from the synthesis rule, so the generic parser+matcher is
    value-checked end to end."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = F.regexp_extract(F.col("source"), r"(\d+)$", 1).cast("long")
    robots_txt = F.concat_ws(
        "\n",
        F.lit("User-agent: *"),
        F.lit("Disallow: /ad"),
        F.when(k % 5 == 0, F.lit("Disallow: /doc/")),
        F.when(k % 3 == 0, F.lit("Disallow: /topic/")),
        F.when(k % 3 == 0, F.lit("Allow: /topic/1")),
        F.concat(F.lit("Crawl-delay: "), (k % 7 + 1).cast("string")),
    )
    lines = F.split(robots_txt, "\n")
    parsed = F.filter(
        F.transform(
            lines,
            lambda ln: F.when(
                F.startswith(ln, F.lit("Disallow: ")),
                F.struct(
                    F.lit("disallow").alias("kind"),
                    F.substring(ln, 11, 1 << 20).alias("prefix"),
                ),
            ).when(
                F.startswith(ln, F.lit("Allow: ")),
                F.struct(
                    F.lit("allow").alias("kind"),
                    F.substring(ln, 8, 1 << 20).alias("prefix"),
                ),
            ),
        ),
        lambda r: r.isNotNull(),
    )
    robots = docs.select("source").distinct().select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        parsed.alias("rules"),
        F.regexp_extract(robots_txt, r"Crawl-delay: (\d+)", 1)
        .cast("long")
        .alias("crawl_delay"),
    )

    links = _exploded_links(spark, sf_dir).select(
        "doc_id",
        F.col("link_idx").cast("long").alias("link_idx"),
        F.col("l")["resolved"].alias("resolved"),
    )
    host = F.regexp_extract("resolved", r"^https://([^/]+)", 1)
    path = F.regexp_replace("resolved", r"^https://[^/]+", "")
    gated = links.withColumn("host", host).join(
        F.broadcast(robots), "host", "left"
    )
    matching = F.filter(
        F.coalesce(F.col("rules"), F.array()),
        lambda r: F.startswith(path, r["prefix"]),
    )
    # the max element CARRIES the final payload (allowed, rule), so the
    # winning rule is computed by exactly ONE array_max expression and
    # the output projection only dereferences struct fields — building
    # allowed/matched_rule as separate expressions would inline the
    # whole filter+transform+array_max matcher once per output column
    # (the CollapseProject/codegen tax CLAUDE.md documents; measured 4x
    # here before this shape)
    best = F.array_max(
        F.transform(
            matching,
            lambda r: F.struct(
                F.length(r["prefix"]).alias("l"),
                (r["kind"] == "allow").cast("int").alias("pri"),
                (r["kind"] == "allow").alias("allowed"),
                F.concat(r["kind"], F.lit(":"), r["prefix"]).alias("rule"),
            ),
        )
    )
    return gated.select(
        "doc_id", "link_idx", "resolved", "crawl_delay", best.alias("b")
    ).select(
        "doc_id",
        "link_idx",
        "resolved",
        F.coalesce(F.col("b")["allowed"], F.lit(True)).alias("allowed"),
        F.col("b")["rule"].alias("matched_rule"),
        F.col("crawl_delay"),
    )


_ROBOTS_G_SQL = """g AS (
        SELECT doc_id, link_idx, resolved,
               resolved LIKE 'https://' || source || '.example.com%'
                   AS same_dom,
               CASE WHEN resolved LIKE 'https://' || source || '.example.com%'
                    THEN substr(resolved,
                                length('https://' || source || '.example.com')
                                    + 1)
               END AS path,
               TRY_CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) AS k
        FROM links
    )"""

# the ONE definition of the allowed verdict, shared by the gate oracle
# and the frontier oracle so a rule fix can never diverge between them
_ALLOWED_CASE = """CASE
                 WHEN NOT same_dom THEN true
                 WHEN path = '/ad' THEN false
                 WHEN path LIKE '/doc/%' AND k % 5 = 0 THEN false
                 WHEN path LIKE '/topic/%' AND k % 3 = 0
                     THEN substr(path, 8, 1) = '1'
                 ELSE true
               END"""

ROBOTS_ORACLE_SQL = f"""
    WITH {_LINKS_CTE},
    {_ROBOTS_G_SQL}
    SELECT doc_id, link_idx, resolved,
           {_ALLOWED_CASE} AS allowed,
           CASE
             WHEN NOT same_dom THEN NULL
             WHEN path = '/ad' THEN 'disallow:/ad'
             WHEN path LIKE '/doc/%' AND k % 5 = 0 THEN 'disallow:/doc/'
             WHEN path LIKE '/topic/%' AND k % 3 = 0
                 THEN CASE WHEN substr(path, 8, 1) = '1'
                           THEN 'allow:/topic/1'
                           ELSE 'disallow:/topic/' END
             ELSE NULL
           END AS matched_rule,
           CASE WHEN same_dom THEN k % 7 + 1 END AS crawl_delay
    FROM g
"""


# --- frontier selection: the next crawl wave ----------------------------------

FRONTIER_K = 20


def crawl_frontier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-loop capstone: pick the next wave. Discovered targets
    (extract_outlinks) pass the robots gate, drop everything already
    crawled (anti-join against the corpus' own urls — the same J5
    anti-join shape the resume path uses), and rank by in-link volume
    with a deterministic tie-break. This composes three independently
    oracle-checked operators, and the composition itself is
    value-checked.

    Scale shape: the gate probe is broadcast (plan-pinned), the seen
    anti-join and the score aggregate both key on the target url (one
    shuffle each with map-side combine), and the top-K compiles to
    TakeOrderedAndProject — the rank window runs AFTER the limit, over
    a FRONTIER_K-row frame, so no unbounded single-partition stage
    exists."""
    gate = filter_robots_gate(spark, sf_dir).filter(F.col("allowed"))
    seen = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        doc_url_expr().alias("resolved")
    )
    cand = gate.select("doc_id", "resolved").join(seen, "resolved", "left_anti")
    scored = cand.groupBy("resolved").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("doc_id").alias("n_src_docs"),
    )
    top = scored.orderBy(
        F.desc("n_inlinks"), F.asc("resolved")
    ).limit(FRONTIER_K)
    w = Window.orderBy(F.desc("n_inlinks"), F.asc("resolved"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select("rank", "resolved", "n_inlinks", "n_src_docs")


# every SITEMAP_NEW_MOD-th doc's sitemap entry advertises an extra
# not-yet-crawled URL, so the discover path always finds genuinely new work
SITEMAP_NEW_MOD = 5


def sitemap_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER discovery channel next to outlinks: sitemap ingestion.
    Per source host, a sitemaps.org urlset document is synthesized from
    the corpus' own pages (loc + lastmod entries, every
    SITEMAP_NEW_MOD-th doc advertising an additional uncrawled URL) and
    then parsed BACK — builder and parser are checked against each
    other, the same roundtrip contract as the WET/CDX artifacts. Each
    discovered URL is flagged known/new against the crawled corpus and
    ranked for recrawl within its source by lastmod recency.

    Scale shape: one per-source aggregate builds the XML (sitemaps are
    host-sized artifacts — bounded by the 50k-entry sitemap spec limit,
    sharded into sitemap-index files beyond it); parsing is a
    regexp block-explode at scan speed (no kernel — sitemap XML's
    rigid shape is regular, unlike HTML); the known/new flag is one
    url-keyed left join and the recrawl rank windows per source. No
    per-row Python anywhere."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    url = doc_url_expr()
    lastmod = F.concat(
        F.lit("2026-"),
        F.lpad((F.col("doc_id") % 12 + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
    )
    ent = F.concat(
        F.lit("<url><loc>"),
        url,
        F.lit("</loc><lastmod>"),
        lastmod,
        F.lit("</lastmod></url>"),
    )
    new_ent = F.concat(
        F.lit("<url><loc>https://"),
        F.col("source"),
        F.lit(".example.com/page/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc><lastmod>2026-01-15</lastmod></url>"),
    )
    ents = F.when(
        F.col("doc_id") % SITEMAP_NEW_MOD == 0, F.array(ent, new_ent)
    ).otherwise(F.array(ent))
    entries = docs.select("source", F.explode(ents).alias("ent"))
    sitemaps = entries.groupBy("source").agg(
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?><urlset>'),
            F.array_join(F.sort_array(F.collect_list("ent")), ""),
            F.lit("</urlset>"),
        ).alias("body")
    )
    blocks = F.regexp_extract_all(
        F.col("body"), F.lit("<url>(.*?)</url>"), 1
    )
    parsed = sitemaps.select(
        "source", F.explode(blocks).alias("b")
    ).select(
        "source",
        F.regexp_extract(F.col("b"), "<loc>([^<]+)</loc>", 1).alias("loc"),
        F.regexp_extract(
            F.col("b"), "<lastmod>([^<]+)</lastmod>", 1
        ).alias("lastmod"),
    )
    seen = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(doc_url_expr().alias("loc"), F.lit(True).alias("known"))
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("lastmod"), F.asc("loc")
    )
    return (
        parsed.join(seen, "loc", "left")
        .select(
            "source",
            "loc",
            "lastmod",
            F.coalesce(F.col("known"), F.lit(False)).alias("known"),
        )
        .withColumn("recrawl_rank", F.row_number().over(w).cast("long"))
    )


SITEMAP_ORACLE_SQL = f"""
    WITH ents AS (
        SELECT source, u.ent FROM (
            SELECT source,
                   CASE WHEN doc_id % {SITEMAP_NEW_MOD} = 0 THEN [
                     '<url><loc>https://' || source || '.example.com/doc/'
                       || doc_id || '</loc><lastmod>2026-'
                       || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
                       || '-'
                       || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                       || '</lastmod></url>',
                     '<url><loc>https://' || source || '.example.com/page/'
                       || doc_id
                       || '</loc><lastmod>2026-01-15</lastmod></url>'
                   ] ELSE [
                     '<url><loc>https://' || source || '.example.com/doc/'
                       || doc_id || '</loc><lastmod>2026-'
                       || lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0')
                       || '-'
                       || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                       || '</lastmod></url>'
                   ] END AS es
            FROM documents
        ), unnest(es) u(ent)
    ),
    sitemaps AS (
        SELECT source,
               '<?xml version="1.0" encoding="UTF-8"?><urlset>'
               || string_agg(ent, '' ORDER BY ent) || '</urlset>' AS body
        FROM ents GROUP BY source
    ),
    parsed AS (
        SELECT source,
               regexp_extract(u.b, '<loc>([^<]+)</loc>', 1) AS loc,
               regexp_extract(u.b, '<lastmod>([^<]+)</lastmod>', 1)
                   AS lastmod
        FROM sitemaps,
             unnest(regexp_extract_all(body, '<url>(.*?)</url>', 1)) u(b)
    ),
    seen AS (
        SELECT 'https://' || source || '.example.com/doc/' || doc_id AS loc
        FROM documents
    )
    SELECT p.source, p.loc, p.lastmod,
           (s.loc IS NOT NULL) AS known,
           CAST(row_number() OVER (PARTITION BY p.source
                ORDER BY p.lastmod DESC, p.loc ASC) AS BIGINT)
               AS recrawl_rank
    FROM parsed p LEFT JOIN seen s ON s.loc = p.loc
"""


# max fetches per host per politeness wave (small so test-scale waves
# are non-trivial; production values are crawl-delay-derived)
WAVE_PER_HOST = 2


def crawl_schedule_waves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling — the step between ranking the frontier
    and actually fetching it: every gated, unseen candidate URL is
    assigned a fetch WAVE such that no wave touches the same host more
    than WAVE_PER_HOST times (Common-Crawl-style per-host budgets;
    robots crawl-delay would scale WAVE_PER_HOST per host). Within a
    host, higher in-link-volume targets fetch first, ties broken by
    url, so the schedule is fully deterministic.

    Scale shape: the candidate aggregate is the frontier's url-keyed
    shuffle; the schedule itself is ONE window partitioned BY HOST —
    the politeness key is the partition key, so the wave assignment
    never sees a single-partition global sort, and host skew is
    bounded by the crawl's own per-host discovery volume. At 10^12
    pages the wave column becomes the fetch-shard partition key the
    fetcher consumes directly."""
    gate = filter_robots_gate(spark, sf_dir).filter(F.col("allowed"))
    seen = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        doc_url_expr().alias("resolved")
    )
    cand = gate.select("doc_id", "resolved").join(seen, "resolved", "left_anti")
    scored = cand.groupBy("resolved").agg(
        F.count(F.lit(1)).alias("n_inlinks")
    )
    host = F.regexp_extract(F.col("resolved"), "^[a-z]+://([^/]+)", 1)
    w = Window.partitionBy("host").orderBy(
        F.desc("n_inlinks"), F.asc("resolved")
    )
    slot = F.row_number().over(w) - 1
    return (
        scored.withColumn("host", host)
        .select(
            "resolved",
            "host",
            F.col("n_inlinks").cast("long").alias("n_inlinks"),
            (slot % WAVE_PER_HOST).cast("long").alias("slot_in_wave"),
            F.floor(slot / WAVE_PER_HOST).cast("long").alias("wave"),
        )
    )


_GATED_LINKS_CTE = f"""
    {_LINKS_CTE},
    {_ROBOTS_G_SQL},
    verdicts AS (
        SELECT doc_id, link_idx, resolved,
               {_ALLOWED_CASE} AS allowed
        FROM g
    )
"""


SCHEDULE_ORACLE_SQL = f"""
    WITH {_GATED_LINKS_CTE},
    seen AS (
        SELECT 'https://' || source || '.example.com/doc/' || doc_id
                   AS resolved
        FROM documents
    ),
    cand AS (
        SELECT v.doc_id, v.resolved
        FROM verdicts v
        WHERE v.allowed
          AND NOT EXISTS (SELECT 1 FROM seen s WHERE s.resolved = v.resolved)
    ),
    scored AS (
        SELECT resolved, CAST(count(*) AS BIGINT) AS n_inlinks
        FROM cand GROUP BY resolved
    ),
    hosted AS (
        SELECT resolved, n_inlinks,
               regexp_extract(resolved, '^[a-z]+://([^/]+)', 1) AS host
        FROM scored
    ),
    slotted AS (
        SELECT resolved, host, n_inlinks,
               CAST(row_number() OVER (PARTITION BY host
                    ORDER BY n_inlinks DESC, resolved ASC) - 1
                    AS BIGINT) AS slot
        FROM hosted
    )
    SELECT resolved, host, n_inlinks,
           slot % {WAVE_PER_HOST} AS slot_in_wave,
           slot // {WAVE_PER_HOST} AS wave
    FROM slotted
"""


FRONTIER_ORACLE_SQL = f"""
    WITH {_GATED_LINKS_CTE},
    seen AS (
        SELECT 'https://' || source || '.example.com/doc/' || doc_id
                   AS resolved
        FROM documents
    ),
    cand AS (
        SELECT v.doc_id, v.resolved
        FROM verdicts v
        WHERE v.allowed
          AND NOT EXISTS (SELECT 1 FROM seen s WHERE s.resolved = v.resolved)
    ),
    scored AS (
        SELECT resolved, count(*) AS n_inlinks,
               count(DISTINCT doc_id) AS n_src_docs
        FROM cand GROUP BY resolved
    )
    SELECT CAST(row_number() OVER (ORDER BY n_inlinks DESC, resolved ASC)
                AS BIGINT) AS rank,
           resolved, n_inlinks, n_src_docs
    FROM scored
    ORDER BY n_inlinks DESC, resolved ASC
    LIMIT {FRONTIER_K}
"""
