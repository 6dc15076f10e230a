from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from product_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("spark-warehouse")
    # Core count is env-tunable (r16): the suite outran the external
    # verifier's budget at local[4]. Fixture data is tiny, so per-
    # action fixed overhead dominates — local[8] buys only ~6% wall
    # (measured on the two heaviest suites: 196.6s -> 185.5s) but is
    # free; the real budget fix is the `slow`/`drift` markers (see
    # pytest.ini). shuffle_partitions stays 4 so partition-dependent
    # plans and outputs are byte-identical to every prior round.
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    s = get_spark(
        "product_etl_spark-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
