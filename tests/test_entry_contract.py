"""Mirror of the driver's correctness gate: every queries() entry must match
its oracle_sql() under DuckDB on the same parquet (row count + sorted values).
"""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(r[i] for i in order) for r in rows)


# The driver hashes TYPED values, so `int(x) == int128(x)` passing a Python
# value compare is not enough (round-4 red cell: DuckDB windowed SUM returns
# HUGEINT, Spark BIGINT — identical values, mismatched hash). Every oracle
# column's DuckDB type must map onto the Spark column's type exactly; any
# type outside this table (HUGEINT, DECIMAL, INTEGER, UBIGINT...) means the
# oracle needs an explicit CAST.
_DDB_TO_SPARK = {
    "BIGINT": {"bigint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "DATE": {"date"},
    "BLOB": {"binary"},
}


def _assert_type_parity(spark_types, rel):
    for col_name, ddb_type in zip(rel.columns, rel.types):
        dd = str(ddb_type).upper()
        allowed = _DDB_TO_SPARK.get(dd)
        assert allowed is not None, (
            f"oracle column {col_name!r} has DuckDB type {dd}, which has no "
            "Spark hash-parity mapping — CAST it in the oracle SQL "
            "(e.g. HUGEINT from SUM(int) needs CAST(... AS BIGINT))"
        )
        assert spark_types[col_name] in allowed, (col_name, dd, spark_types[col_name])


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # driver records a rows-only check for non-SQL-expressible ops;
        # their semantics are pytest-verified against exact twins in
        # tests/test_pipeline_ops.py
        assert q(spark, SF_DIR).count() > 0
        return
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = ddb.sql(sql)
    ddb_cols = list(rel.columns)
    ddb_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(ddb_cols), (spark_cols, ddb_cols)
    # type parity both ways: ints must be 64-bit on the Spark side (DuckDB
    # len/count return BIGINT), and every DuckDB column type must hash-map
    # onto the Spark type (catches HUGEINT/DECIMAL oracle drift)
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    for col_name, t in spark_types.items():
        assert t not in ("int", "smallint"), (col_name, t)
    _assert_type_parity(spark_types, rel)
    assert len(spark_rows) == len(ddb_rows)
    assert _normalize(spark_rows, spark_cols) == _normalize(ddb_rows, ddb_cols)


def test_type_parity_catches_hugeint(ddb):
    """A deliberately-HUGEINT oracle must fail the mirror (the class of bug
    that produced round 4's one red cell)."""
    rel = ddb.sql("SELECT SUM(x) AS s FROM (VALUES (1), (2)) t(x)")
    with pytest.raises(AssertionError, match="HUGEINT"):
        _assert_type_parity({"s": "bigint"}, rel)


def test_query_surface_is_exactly_the_driver_window():
    """The driver records the first 50 queries() entries; the surface must
    be exactly 50 with the flagship rows early so nothing is ever silently
    unchecked again (round-4 verdict, Next #2)."""
    names = list(entry_mod.queries().keys())
    assert len(names) == 50
    assert "sketch_checkpoint_profile" in names[:5]
    assert "curation_pipeline" in names[:5]


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"c_custkey", "c_name", "c_acctbal"}


def test_every_query_has_an_oracle():
    """The correctness gate is only as wide as the oracle map: every
    queries() entry must carry a SQL twin (ops that genuinely cannot be
    SQL-expressed would be deliberate, documented exceptions — today
    there are none)."""
    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) == set(qs), {
        "queries_without_oracle": sorted(set(qs) - set(os_)),
        "oracles_without_query": sorted(set(os_) - set(qs)),
    }
