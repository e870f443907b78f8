"""Mirror of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same parquet tables; compare
row count, schema width, and order-insensitive values."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_T2", "/root/testdata/sf0.001")


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


ORACLED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    spark_df = q(spark, SF_DIR).toPandas()
    duck_df = _duck(SF_DIR, entry_mod.oracle_sql()[name])
    a, b = _canon(spark_df), _canon(duck_df)
    assert list(a.columns) == list(b.columns), f"{name}: column names differ"
    assert len(a) == len(b), f"{name}: row count {len(a)} vs oracle {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            assert np.allclose(a[c], b[c], rtol=0, atol=1e-9, equal_nan=True), (
                f"{name}.{c}: float mismatch\n{a[c].head()}\n{b[c].head()}"
            )
            # the driver hashes values: require exact equality too
            exact = (a[c].values == b[c].values) | (
                np.isnan(a[c].values) & np.isnan(b[c].values)
            )
            assert exact.all(), f"{name}.{c}: not bitwise-equal after rounding"
        else:
            assert a[c].tolist() == b[c].tolist(), f"{name}.{c}: values differ"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert df.schema is not None
    assert len(rows) >= 0


def _canon_driver(df: pd.DataFrame) -> pd.DataFrame:
    """Replicate the DRIVER's canonicalization order exactly: sort columns,
    then sort_values over raw dtypes (this is where array-valued cells crash
    with "unhashable type: 'list'" — the r1 failure mode), then stringify.
    Rows-only queries must survive this even without an oracle."""
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)  # raises on list cells
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df


def test_rows_only_queries_survive_driver_canon(spark):
    for name, q in entry_mod.queries().items():
        if name in ORACLED:
            continue
        pdf = q(spark, SF_DIR).toPandas()
        try:
            canon = _canon_driver(pdf)
        except TypeError as e:  # pragma: no cover - regression guard
            raise AssertionError(
                f"{name}: driver canonicalization would crash ({e}); "
                "scalar-encode array columns (see _scalarize_sig)"
            ) from e
        assert len(canon) >= 0, name
