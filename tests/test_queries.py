"""Driver-contract validation: every oracle_sql() query must match its
queries() counterpart at sf0.001 (row count + schema + order-insensitive
values), emulating the driver's CORRECTNESS check. Rows-only queries
must at least run and return rows."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_checked_query(name, con, ray_session):
    ray_result = canonical(to_pandas(entrymod.queries()[name](SF_DIR)))
    oracle = canonical(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(ray_result.columns) == list(oracle.columns), (
        ray_result.columns, oracle.columns)
    assert len(ray_result) == len(oracle)
    pd.testing.assert_frame_equal(ray_result, oracle, check_dtype=False,
                                  check_exact=False, atol=1e-9)


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query(name, ray_session):
    out = to_pandas(entrymod.queries()[name](SF_DIR))
    assert len(out) > 0
    assert len(out.columns) > 0


def test_entry(ray_session):
    out = to_pandas(entrymod.entry())
    assert len(out) > 0
    assert {"url", "entity_id", "cluster_size"} <= set(out.columns)
