from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from findtextcenternet_spark.sources.session import get_spark

    s = get_spark(app="fts-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
