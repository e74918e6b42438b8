from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparketl import registry
from sparketl.session import get_spark

registry.load_all_modules()

SF_DIR = os.environ.get("SPARKETL_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparketl-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    from sparketl.oracle import duckdb_connect

    return duckdb_connect(SF_DIR)
