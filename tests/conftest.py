from __future__ import annotations

import pytest

from edspdf_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        app_name="edspdf-spark-tests",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
            "spark.driver.memory": "4g",
            # bucketed-table tests saveAsTable into the warehouse dir;
            # keep it out of the repo tree (default is ./spark-warehouse)
            "spark.sql.warehouse.dir": "/tmp/edspdf_spark_test_warehouse",
        },
    )
    yield s


# Reference mask-classifier unit fixture
# (/root/reference/tests/pipes/classifiers/conftest.py:6-34): one page,
# three "foo" blocs; the multi-page variant duplicates them on page 1.
SINGLE_PAGE_BLOCS = [
    ("doc", 0, 0, 0.1, 0.1, 0.9, 0.2, "foo", [], None, False),
    ("doc", 0, 1, 0.1, 0.6, 0.4, 0.7, "foo", [], None, False),
    ("doc", 0, 2, 0.1, 0.6, 0.9, 0.7, "foo", [], None, False),
]

MULTI_PAGE_BLOCS = SINGLE_PAGE_BLOCS + [
    ("doc", 1, 0, 0.1, 0.1, 0.9, 0.2, "foo", [], None, False),
    ("doc", 1, 1, 0.1, 0.6, 0.4, 0.7, "foo", [], None, False),
    ("doc", 1, 2, 0.1, 0.6, 0.9, 0.7, "foo", [], None, False),
]


@pytest.fixture()
def single_page_blocs(spark):
    from edspdf_spark.schemas import BLOC_SCHEMA

    return spark.createDataFrame(SINGLE_PAGE_BLOCS, BLOC_SCHEMA)


@pytest.fixture()
def multi_page_blocs(spark):
    from edspdf_spark.schemas import BLOC_SCHEMA

    return spark.createDataFrame(MULTI_PAGE_BLOCS, BLOC_SCHEMA)
