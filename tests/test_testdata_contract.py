"""Cheap fixture-schema contract: if the driver regenerates testdata with a
different physical encoding, THIS file fails with one clear message instead
of ~20 downstream query/streaming tests (the round-2 failure mode, where
events.ts silently changed from nanosecond int64 to timestamp[us]).

Pure pyarrow — no Spark session, runs in milliseconds.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# column -> set of acceptable arrow types (str form)
EXPECTED = {
    "events": {
        "event_id": {"int64"},
        # both encodings the loader supports (load_events schema-sniffs)
        "ts": {"timestamp[us]", "timestamp[ns]", "int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": {"int64", "int32"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        "embedding": {"list<element: float>", "list<item: float>",
                      "list<element: double>"},
        "label": {"int32", "int64"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_shipdate": {"date32[day]", "timestamp[us]", "timestamp[ns]"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        "o_totalprice": {"double"},
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema(table):
    path = f"{SF_DIR}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    names = set(schema.names)
    for col, ok_types in EXPECTED[table].items():
        assert col in names, (
            f"TESTDATA CONTRACT BROKEN: {table}.parquet lost column "
            f"{col!r} (have {sorted(names)}). Update loaders + this test."
        )
        actual = str(schema.field(col).type)
        assert actual in ok_types, (
            f"TESTDATA CONTRACT BROKEN: {table}.{col} is {actual}, "
            f"expected one of {sorted(ok_types)}. If the driver changed "
            f"the physical encoding, update the loader "
            f"(e.g. extras/events.py load_events) and this contract."
        )


def test_embeddings_vector_column():
    path = f"{SF_DIR}/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    vec_cols = [
        f.name for f in schema
        if pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
        or pa.types.is_fixed_size_list(f.type)
    ]
    assert vec_cols, (
        "TESTDATA CONTRACT BROKEN: embeddings.parquet has no list-typed "
        f"vector column (schema: {schema})"
    )
