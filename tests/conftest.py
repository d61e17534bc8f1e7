import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sakura_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    # Tiny fixtures: 2 shuffle partitions + 8 local threads + AQE off cut
    # per-stage scheduling and adaptive re-planning overhead (the dominant
    # costs at test scale). Plan shapes are partition-count independent and
    # no test asserts AQE behavior, so test_scale assertions are
    # unaffected; production sessions (get_spark defaults) keep AQE on.
    s = get_spark(
        "sakura-tests",
        cpus=8,
        shuffle_partitions=2,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    yield s


@pytest.fixture()
def store(tmp_path):
    from sakura_spark.management.store import SnapshotStore

    return SnapshotStore(str(tmp_path / "store"))
