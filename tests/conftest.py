from __future__ import annotations

import pytest

from training_etl_demo_2_spark.session import get_spark


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    spark = get_spark(
        app_name="tests",
        shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": str(
                tmp_path_factory.mktemp("spark-warehouse")
            )
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def tables(spark, sf_dir):
    from training_etl_demo_2_spark.io import load_tables

    return load_tables(spark, sf_dir)


def assert_df_equal(actual, expected_rows, sort_cols=None):
    """Order-insensitive DataFrame equality against a list of tuples."""
    rows = [tuple(r) for r in actual.collect()]
    if sort_cols is None:
        rows = sorted(rows)
        expected_rows = sorted(expected_rows)
    assert rows == list(expected_rows), f"{rows} != {expected_rows}"
