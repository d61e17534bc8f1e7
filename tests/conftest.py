import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sakura_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sakura-tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def store(tmp_path):
    from sakura_spark.management.store import SnapshotStore

    return SnapshotStore(str(tmp_path / "store"))
