import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ai_ocr_spark.session import get_spark

    s = get_spark(app="ai_ocr_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    """Seeded synthetic pages table, 240 docs."""
    from ai_ocr_spark.datagen import write_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    write_pages_parquet(path, 240)
    return path
