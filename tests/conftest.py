from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sparksimjoin.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sparksimjoin-tests", cores=8, shuffle_partitions=8,
                  driver_memory="8g")
    yield s
    s.stop()
