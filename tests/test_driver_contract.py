"""Preflight of the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB (same tables the driver
registers), compare row count, column names and the order-insensitive
value multiset. Catches any Spark↔DuckDB semantic drift before the
driver does."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("YPO_TEST_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as entry_mod

    return entry_mod.queries(), entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def _arrow_kind(t):
    """Canonical type kind for a pyarrow type (DuckDB result side)."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return f"int{t.bit_width}"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_decimal(t):
        return f"dec({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_arrow_kind(t.value_type)}>"
    return str(t)


_SPARK_KIND = {
    "bigint": "int64",
    "int": "int32",
    "smallint": "int16",
    "tinyint": "int8",
    "double": "float",
    "float": "float",
    "string": "str",
    "boolean": "bool",
    "binary": "bin",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "date": "date",
}


def _spark_kind(simple):
    """Canonical type kind for a Spark simpleString (query side)."""
    if simple in _SPARK_KIND:
        return _SPARK_KIND[simple]
    if simple.startswith("decimal("):
        return "dec" + simple[len("decimal") :]
    if simple.startswith("array<") and simple.endswith(">"):
        return f"list<{_spark_kind(simple[6:-1])}>"
    return simple


def test_all_queries_match_oracles(spark, contract, ddb):
    queries, oracles = contract
    assert queries, "no queries registered"
    failures = []
    for name, fn in sorted(queries.items()):
        df = fn(spark, SF_DIR)
        s_cols = df.columns
        s_rows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            assert len(s_rows) >= 0
            continue
        d_tbl = ddb.execute(oracles[name]).arrow()
        d_cols = d_tbl.column_names
        d_rows = [tuple(r.values()) for r in d_tbl.to_pylist()]
        if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, d_cols)):
            failures.append(f"{name}: column mismatch {s_cols} vs {d_cols}")
            continue
        # dtype drift (e.g. DuckDB HUGEINT vs Spark BIGINT) breaks the
        # driver's value-hash even when every value matches — compare
        # canonical type kinds per column name (round-1 verdict item #1)
        s_kinds = {f.name.lower(): _spark_kind(f.dataType.simpleString()) for f in df.schema}
        d_kinds = {
            d_cols[i].lower(): _arrow_kind(d_tbl.schema.types[i]) for i in range(len(d_cols))
        }
        bad = {c: (s_kinds[c], d_kinds[c]) for c in s_kinds if s_kinds[c] != d_kinds[c]}
        if bad:
            failures.append(f"{name}: dtype mismatch (spark, duckdb): {bad}")
            continue
        if len(s_rows) != len(d_rows):
            failures.append(f"{name}: row count {len(s_rows)} vs {len(d_rows)}")
            continue
        sn = _norm_rows([c.lower() for c in s_cols], s_rows)
        dn = _norm_rows([c.lower() for c in d_cols], d_rows)
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            failures.append(f"{name}: value mismatch, first diffs: {diff}")
    assert not failures, "\n".join(failures)


def test_every_query_has_oracle_or_reason(contract):
    queries, oracles = contract
    missing = sorted(set(queries) - set(oracles))
    # every query is oracle-gated as of round 2 (SWRL fixpoint and
    # multimodal features compare against sequential-implementation
    # artifacts; the zebra and frame-count oracles are independent
    # ground truth); keep the escape hatch explicit for the future
    allowed_rows_only: set = set()
    assert set(missing) <= allowed_rows_only, f"queries without oracle: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "subj" in df.columns and "src_sha256" in df.columns
