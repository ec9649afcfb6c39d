import sys

import pytest

sys.path.insert(0, "/root/repo")

from proxyhouse_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("tests")
