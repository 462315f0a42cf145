import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from joie_spark.corpus import generate_rows  # noqa: E402
from joie_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("joie-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def t1_rows():
    return generate_rows(50, seed=42)


@pytest.fixture(scope="session")
def t1_index_dir(spark, t1_rows, tmp_path_factory):
    """Index built once over the t1 corpus."""
    from joie_spark.operators.build import build_index

    d = str(tmp_path_factory.mktemp("index_t1"))
    df = spark.createDataFrame(t1_rows)
    build_index(spark, df, d, n_buckets=8, docs_per_block=8, block_chunks=2)
    return d


@pytest.fixture(scope="session")
def t1_oracle(t1_rows):
    from joie_spark.oracle import OracleIndex

    return OracleIndex(t1_rows)


@pytest.fixture(scope="session")
def t1_engine(spark, t1_index_dir):
    from joie_spark.engine import Engine

    return Engine(spark, t1_index_dir)
