from __future__ import annotations

import pytest

from bigdatamining_graduate_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="bdm-tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "4"},
    )
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _release_checkpoints_after_each_test():
    """The session-scoped suite runs hundreds of queries; without this,
    localCheckpoint blocks from checkpoint-heavy operators (CC, PageRank,
    LPA, ...) would accumulate for the whole session (ADVICE r7).  A
    test's consuming actions have all finished by teardown, so the
    release is safe here — any test that needs blocks to survive across
    tests would have to pin them itself (none do)."""
    yield
    from bigdatamining_graduate_spark.checkpoints import release_checkpoints

    release_checkpoints()
