"""Replicates the driver's DuckDB-oracle gate locally: every queries() entry
must match its oracle_sql() on row count, column names, and (order-
insensitively) values, at sf0.001 for speed (driver runs sf0.01)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


# Spark simpleString type → acceptable DuckDB-Arrow type strings. Strict on
# purpose: the driver's value hash is type-sensitive (round 1: DuckDB
# SUM(int)→HUGEINT/decimal128 and FLOOR()→double hashed differently from
# Spark bigint even with equal values), so the local gate must reject any
# type drift, not normalize it away.
_ARROW_OK = {
    "bigint": {"int64"},
    "int": {"int32"},
    "smallint": {"int16"},
    "double": {"double"},
    "float": {"float"},
    "string": {"string", "large_string"},
    "boolean": {"bool"},
    "binary": {"binary", "large_binary"},
    "date": {"date32[day]"},
    "timestamp": {"timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]"},
}


def _check_types(name, sdf, arrow_schema):
    duck_types = {f.name: str(f.type) for f in arrow_schema}
    for f in sdf.schema.fields:
        expect = _ARROW_OK.get(f.dataType.simpleString())
        if expect is None:  # arrays/maps/structs: value compare still applies
            continue
        got = duck_types.get(f.name)
        assert got in expect, (
            f"{name}.{f.name}: spark type {f.dataType.simpleString()} vs "
            f"duckdb-arrow type {got} — driver value-hash will mismatch"
        )


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    try:  # Decimal → float-ish normal form
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except Exception:
        pass
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(row[i]) for i in order) for row in data)


NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    res = duck.sql(sql)
    dcols = res.columns
    arrow_tbl = res.arrow()
    drows = [tuple(row[c] for c in dcols) for row in arrow_tbl.to_pylist()]
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    _check_types(name, sdf, arrow_tbl.schema)
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    a, b = _rows(scols, srows), _rows(dcols, drows)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: first mismatches {[(a[i], b[i]) for i in mism]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert df.columns == ["doc_id", "url", "host", "fingerprint", "score", "rk"]
