import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_lib_spark.session import get_spark  # noqa: E402
from osm_lib_spark.sources.generator import ensure_fixture  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("osm_lib_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixture_xs():
    return ensure_fixture("xs")


@pytest.fixture(scope="session")
def docs_xs(spark, fixture_xs):
    return spark.read.parquet(os.path.join(fixture_xs, "docs.parquet"))


def golden(fixture_dir: str, name: str) -> pd.DataFrame:
    return pd.read_parquet(os.path.join(fixture_dir, "golden", f"{name}.parquet"))


def assert_df_equal(spark_df, expected_pdf: pd.DataFrame, sort_cols=None):
    """Order-insensitive exact comparison of a Spark DF vs pandas golden."""
    cols = list(expected_pdf.columns)
    got = spark_df.select(*cols).toPandas()
    sort_cols = sort_cols or cols
    got = got.sort_values(sort_cols).reset_index(drop=True)
    exp = expected_pdf.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
