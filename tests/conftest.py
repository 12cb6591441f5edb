import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from abwcf_spark.session import get_spark

    s = get_spark(app_name="abwcf-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


def testdata_dir(sf: str = "0.001") -> str:
    return f"/root/testdata/sf{sf}"
