"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over the
same parquet tables; compare row count, schema width, and the
order-insensitive multiset of row values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


def _row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )


NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_vs_oracle(spark, sf_smoke, name):
    qfn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = qfn(spark, sf_smoke)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    con = _duck(sf_smoke)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"{name}: columns {spark_cols} vs {duck_cols}"
    ms_s = _row_multiset([tuple(r) for r in spark_rows], spark_cols)
    ms_d = _row_multiset(duck_rows, duck_cols)
    mismatch = [
        (a, b) for a, b in zip(ms_s, ms_d) if a != b
    ][:5]
    assert ms_s == ms_d, f"{name}: first diffs {mismatch}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score", "doc_len"]
