"""Oracle type gate: no DuckDB oracle may emit HUGEINT/UHUGEINT columns.

DuckDB's ``sum()`` over integer inputs returns HUGEINT (INT128) while
Spark's ``sum`` returns BIGINT, and the driver's value hash is
type-sensitive — so any bare integer ``sum(...)`` in an oracle hash-fails
even when every value matches (the single root cause of all 4 r05 driver
FAILs).  This gate type-checks EVERY registered oracle against DuckDB's
binder (``LIMIT 0`` — no data scanned beyond statistics) and fails on any
INT128 output column, killing the bug class at commit time instead of at
driver-sample time.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as e

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{SF_DIR}/{tbl}.parquet')"
        )
    yield con
    con.close()


def test_no_oracle_emits_hugeint(duck):
    offenders = {}
    for name, sql in sorted(e.oracle_sql().items()):
        rel = duck.sql(f"SELECT * FROM ({sql}) LIMIT 0")
        hits = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if "HUGEINT" in str(typ).upper()
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "oracles with INT128 output (wrap the integer sum()/arithmetic in "
        f"CAST(... AS BIGINT)): {offenders}"
    )
