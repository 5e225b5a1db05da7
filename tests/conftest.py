from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import sparkgraft

    return sparkgraft.get_session("sparkgraft-tests")


@pytest.fixture(scope="session")
def oracle_con():
    from sparkgraft.oracle import duckdb_connect

    return duckdb_connect(SF_DIR)
