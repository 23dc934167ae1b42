"""Contract: no oracle_sql() body may emit a DuckDB type without an
exact Spark analog.

The r4 driver gate proved the failure mode: an uncast ``sum()`` / ``//``
returns HUGEINT (int128), which the driver's type-sensitive value hash
canonicalizes differently from Spark's BIGINT — the query reads
value-correct locally and still fails the gate.  DESCRIBE is static
(no execution), so this sweeps all ~150 oracles in seconds.
"""

import duckdb
import pytest

import __spark_entry__ as entry
from scripts.oracle_type_audit import BAD_TYPES, TABLES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_no_oracle_emits_hugeint_or_unsigned(con):
    bad = []
    for name, sql in entry.oracle_sql().items():
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        for col, ty, *_ in desc:
            if ty.upper().split("(")[0] in BAD_TYPES:
                bad.append(f"{name}.{col} is {ty}")
    assert not bad, (
        "oracle columns with no exact Spark analog (CAST them, see "
        "scripts/oracle_type_audit.py): " + "; ".join(bad))
