"""Bucketed co-located joins: pre-shuffling at write time so repeated
joins on the bucket key run with NO exchange (SURVEY §4 join-strategy
row; the 100-TB pattern for dimension-fact co-location)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # default warehouse dir (spark.sql.warehouse.dir is static config);
    # tables are dropped on teardown and the dir is gitignored
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    from ai_ocr_spark.plans.audit import count_exchanges

    t_orders, t_lineitem = bucketed_tables
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    joined = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_linenumber", "l_quantity"
    )
    # co-located bucketed join: zero shuffle exchanges
    assert count_exchanges(joined) == 0


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    bucketed = (
        spark.table(t_orders)
        .join(spark.table(t_lineitem), F.col("o_orderkey") == F.col("l_orderkey"))
        .count()
    )
    plain = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert bucketed == plain
