import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reader_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # r13: core/partition counts env-tunable so the suite can use the
    # host it runs on (the driver's box has 32 cores; the historical
    # local[8] left e2e tests 4x under-parallel). Defaults raised
    # after an interleaved A/B on the heaviest e2e file — see
    # OPTIMIZATION_r13.md "pytest gate".
    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    extra = {}
    if os.environ.get("SPARK_GRAFT_TEST_AQE", "1") == "0":
        extra["spark.sql.adaptive.enabled"] = "false"
    s = get_spark(
        "tests",
        cpus=cpus,
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", str(cpus))
        ),
        extra_conf=extra,
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
