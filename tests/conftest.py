import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from dsci551_edfs_spark import get_spark

    s = get_spark("edfs-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
