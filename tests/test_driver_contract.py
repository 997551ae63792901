"""Driver-contract hygiene: the exact invariants the round driver's
correctness gate depends on."""

import __spark_entry__ as em


def test_every_oracle_key_has_a_query():
    qs, oracles = em.queries(), em.oracle_sql()
    orphans = set(oracles) - set(qs)
    assert not orphans, f"oracle_sql entries without queries: {orphans}"


def test_rows_only_queries_are_documented():
    """Queries without an oracle must be the known non-SQL-expressible
    set (binary feature extraction) — nothing silently unchecked."""
    qs, oracles = em.queries(), em.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"mm_image_features", "mm_frame_sample", "mm_audio_stats"}


def test_entry_runs_and_has_stable_schema(spark):
    df = em.entry(spark)
    cols = df.columns
    assert cols == [
        "url", "content_kind", "doc_type", "lang", "valid", "confidence", "main_text"
    ]
    assert df.count() > 0


def test_oracle_sql_strings_are_wellformed():
    """Every oracle runs in DuckDB against empty views (catches SQL
    syntax drift without the full data compare)."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.execute("CREATE TABLE region (r_regionkey BIGINT, r_name VARCHAR, r_comment VARCHAR)")
    con.execute("CREATE TABLE nation (n_nationkey BIGINT, n_name VARCHAR, n_regionkey BIGINT, n_comment VARCHAR)")
    con.execute("CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR, c_address VARCHAR, c_nationkey BIGINT, c_phone VARCHAR, c_acctbal DOUBLE, c_mktsegment VARCHAR, c_comment VARCHAR)")
    con.execute("CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority VARCHAR, o_clerk VARCHAR, o_shippriority INTEGER, o_comment VARCHAR)")
    con.execute("CREATE TABLE lineitem (l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP, l_commitdate TIMESTAMP, l_receiptdate TIMESTAMP, l_shipinstruct VARCHAR, l_shipmode VARCHAR, l_comment VARCHAR)")
    con.execute("CREATE TABLE part (p_partkey BIGINT, p_name VARCHAR, p_mfgr VARCHAR, p_brand VARCHAR, p_type VARCHAR, p_size INTEGER, p_container VARCHAR, p_retailprice DOUBLE, p_comment VARCHAR)")
    con.execute("CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR, s_address VARCHAR, s_nationkey BIGINT, s_phone VARCHAR, s_acctbal DOUBLE, s_comment VARCHAR)")
    con.execute("CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, payload VARCHAR)")
    for name, sql in em.oracle_sql().items():
        con.execute(sql)  # raises on syntax/semantic errors
