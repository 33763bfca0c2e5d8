from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from iscc_specs_spark.session import get_spark

    s = get_spark("iscc-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
