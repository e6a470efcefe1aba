"""Guard: no oracle may emit a DuckDB type whose pandas conversion
diverges from the Spark side's string formatting.

Root cause of three rounds of ``dedup_lines`` driver hash-reds (r03-r05):
DuckDB ``SUM(int)`` returns HUGEINT (int128), and duckdb's pandas
conversion renders HUGEINT as float64 — so the driver serialized the
oracle's ``n_kept`` as ``12.0`` against Spark's ``12`` while local
``fetchall()`` comparisons (Python ints) passed.  DECIMAL(p,s) converts
to float64 too; it happens to format identically to Spark doubles, but we
forbid it as well so nobody has to re-derive that analysis.

Every oracle must resolve each output column to BIGINT / INTEGER /
DOUBLE / VARCHAR / BOOLEAN / DATE / TIMESTAMP — types whose pandas
rendering matches the Spark result's.
"""

import duckdb
import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_no_oracle_emits_hugeint_or_decimal(con):
    bad = {}
    for name, sql in E.oracle_sql().items():
        rel = con.sql(sql)
        types = [str(t) for t in rel.types]
        hits = [
            (c, t)
            for c, t in zip(rel.columns, types)
            if any(t.startswith(f) for f in FORBIDDEN)
        ]
        if hits:
            bad[name] = hits
    assert not bad, (
        "oracles emitting driver-serializer-unsafe types "
        f"(cast to BIGINT/DOUBLE in the SQL): {bad}"
    )
