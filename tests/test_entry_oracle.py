"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.001 and compare against its DuckDB oracle — row count, column names,
and exact values after column-name sort + row sort.

Stricter than a hash: exact equality, so any driver-side hash scheme that is
a function of the sorted values must also match.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

# the 186×-parametrized sweep dominates suite runtime — slow lane only
pytestmark = pytest.mark.oracle

SF_DIR = os.environ.get("IFS_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()

# IFS_ORACLE_SHARD="i/n" runs only every n-th entry starting at i — the
# hook tools/run_suite.py uses to split this dominant sweep across
# parallel pytest processes (each with its own JVM; VERDICT r7 ask #3).
# Unset (the plain `pytest tests/` path) runs everything, so the default
# suite semantics are unchanged.
_SHARD = os.environ.get("IFS_ORACLE_SHARD")


def _shard(names):
    if not _SHARD:
        return names
    i, n = (int(x) for x in _SHARD.split("/"))
    return [nm for k, nm in enumerate(names) if k % n == i]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _sorted_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in idx) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), x) for x in t))


@pytest.fixture(scope="module")
def duck(spark):
    con = duckdb.connect()
    for t in entrymod.inventory.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", _shard(sorted(QUERIES)))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    scols = df.columns
    srows = [tuple(r) for r in df.collect()]
    if name not in ORACLES:
        # rows-only contract: runs, stable schema, deterministic re-run
        assert isinstance(scols, list) and len(scols) > 0
        df2 = QUERIES[name](spark, SF_DIR)
        assert _sorted_rows(scols, srows) == _sorted_rows(
            df2.columns, [tuple(r) for r in df2.collect()]
        )
        return
    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    got = _sorted_rows(scols, srows)
    want = _sorted_rows(dcols, drows)
    assert got == want, f"{name}: values differ\nspark: {got[:3]}\nduck:  {want[:3]}"


@pytest.mark.parametrize("name", _shard(sorted(ORACLES)))
def test_oracle_schema_has_no_hugeint(name, duck):
    """Type-audit lint (round-4 verdict #8): the driver's value hash is
    type-tagged, so a DuckDB result column that widens to HUGEINT (int128 —
    e.g. an un-recast ``sum(BIGINT)``) hash-mismatches against Spark's LONG
    even when every value is identical.  ``DESCRIBE`` plans the oracle
    without executing it, so this covers all oracles cheaply.  Fix pattern:
    wrap the aggregate as ``CAST(sum(...) AS BIGINT)``."""
    desc = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [(c, t) for c, t, *_ in desc if "HUGEINT" in t.upper()]
    assert not bad, (
        f"{name}: oracle result columns widen to HUGEINT {bad}; "
        "wrap the aggregate in CAST(... AS BIGINT)"
    )


@pytest.mark.skipif(
    _SHARD is not None and not _SHARD.startswith("0"),
    reason="unparametrized — runs in shard 0 only",
)
def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["rr_name", "nn_name", "ss_name"]
