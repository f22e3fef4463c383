"""Registry-wide oracle/testdata contract: every ``oracle_sql()`` string
must BIND (DuckDB EXPLAIN — plan only, zero execution) against the real
parquet schemas at both the correctness SF (0.01) and the bench SF (0.1).

If the driver regenerates testdata with a renamed/retyped column, this
fails ONE parametrized test per affected query — with the query name in
the test id — instead of an r2-style cascade of 17 downstream failures.
Complements test_testdata_contract.py (physical arrow encodings) by
covering the full 112-query registry's logical column dependencies.

No Spark session; the whole file runs in a few seconds.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as se  # noqa: E402
from oracle_util import duckdb_con  # noqa: E402

_ORACLES = se.oracle_sql()
_SF_DIRS = [d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
            if os.path.isdir(d)]

_CONS = {}


def _con(sf_dir):
    if sf_dir not in _CONS:
        _CONS[sf_dir] = duckdb_con(sf_dir)
    return _CONS[sf_dir]


@pytest.mark.parametrize("sf_dir", _SF_DIRS,
                         ids=[os.path.basename(d) for d in _SF_DIRS])
@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_binds_against_testdata(name, sf_dir):
    sql = _ORACLES[name]
    try:
        # EXPLAIN binds every referenced view/column/function without
        # executing the query
        _con(sf_dir).sql(f"EXPLAIN {sql}")
    except Exception as e:  # noqa: BLE001
        pytest.fail(
            f"ORACLE CONTRACT BROKEN for {name!r} at {sf_dir}: the "
            f"oracle SQL no longer binds against the current testdata "
            f"schema — {type(e).__name__}: {e}"
        )


def test_every_query_has_an_oracle_or_is_documented_weak():
    """Queries without an oracle get only a rows-only driver check;
    keep that list explicit so a lost oracle is noticed."""
    weak = sorted(set(se.queries()) - set(_ORACLES))
    # the only intentionally weak entries (no SQL-expressible twin)
    assert weak == [], (
        f"queries with no oracle_sql entry (driver checks rows only): "
        f"{weak} — add an oracle or document here"
    )
