from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scylla_pg_cdc_spark.session import get_session  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("pytest")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
