import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

sys.path.insert(0, str(REPO))
if REFERENCE.exists():
    sys.path.insert(0, str(REFERENCE))


def reference_available() -> bool:
    try:
        import hanzo  # noqa: F401

        return True
    except ImportError:
        return False


SF_DIR = "/root/testdata/sf0.001"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    import os

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from warctools_spark.session import get_spark

    s = get_spark(app="warctools_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
