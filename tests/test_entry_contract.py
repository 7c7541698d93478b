"""Local replica of the driver's correctness harness: run every queries()
entry at sf0.001, compare against oracle_sql() via DuckDB — row count,
column names, and an order-insensitive value hash."""

import hashlib
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    return str(v)


def _value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def sql_results(spark, duck):
    """Run all SQL-checkable queries once on each engine."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, sql in oracles.items():
        sdf = qs[name](spark, SF_DIR)
        scols = sdf.columns
        stypes = {f.name.lower(): _canon_type(f.type) for f in sdf.toArrow().schema}
        srows = [tuple(r) for r in sdf.collect()]
        cur = duck.execute(sql)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        dtypes = {
            f.name.lower(): _canon_type(f.type)
            for f in duck.execute(sql).fetch_arrow_table().schema
        }
        results[name] = (scols, srows, dcols, drows, stypes, dtypes)
    return results


def _canon_type(t):
    """Canonical Arrow type label: string/binary width variants collapse, all
    else compares exactly. Catches e.g. DuckDB HUGEINT (decimal128(38,0))
    vs Spark BIGINT (int64) — the round-1 driver hash-fail class."""
    import pyarrow as pa

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    return str(t)


def test_duck_oracle_types_match_spark(sql_results):
    """The driver's value hash is type-sensitive: equal values in different
    physical types (HUGEINT vs BIGINT) still hash-mismatch. Enforce
    column-for-column Arrow type equality between the two engines."""
    failures = []
    for name, (_, _, _, _, stypes, dtypes) in sql_results.items():
        for col, st in stypes.items():
            dt = dtypes.get(col)
            if dt != st:
                failures.append(f"{name}.{col}: spark={st} duck={dt}")
    assert not failures, "\n".join(failures)


def test_all_sql_queries_match_duckdb(sql_results):
    failures = []
    for name, (scols, srows, dcols, drows, _, _) in sql_results.items():
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
            failures.append(f"{name}: schema {scols} != {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(f"{name}: rows {len(srows)} != {len(drows)}")
            continue
        # map duck columns into spark order by name
        dmap = {c.lower(): i for i, c in enumerate(dcols)}
        drows_m = [tuple(r[dmap[c.lower()]] for c in scols) for r in drows]
        if _value_hash(scols, srows) != _value_hash(scols, drows_m):
            # find first differing line for the error message
            a = sorted("|".join(map(_norm, r)) for r in srows)
            b = sorted("|".join(map(_norm, r)) for r in drows_m)
            diff = next((x, y) for x, y in zip(a, b) if x != y)
            failures.append(f"{name}: value hash mismatch, first diff {diff}")
    assert not failures, "\n".join(failures)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.count()
    assert rows > 0
    assert "p95_gap" in df.columns and "block" not in df.columns


def test_engine_native_queries_run(spark):
    """q21/q22/q24 are oracle-checked via sql_results above; here assert the
    engine-native semantics folded into their checkable columns."""
    qs = entrymod.queries()
    rt = qs["q24_gorilla_roundtrip"](spark, SF_DIR).collect()
    assert rt and all(r.n_points > 0 for r in rt)  # negative = roundtrip fail
    bc = qs["q21_buddy_check_kernel"](spark, SF_DIR).collect()
    assert bc and all(r.flag_valid for r in bc)
    sc = qs["q22_sct_kernel"](spark, SF_DIR).collect()
    assert sc and all(r.flag_valid for r in sc)
