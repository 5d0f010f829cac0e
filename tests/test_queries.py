"""Driver-contract conformance: every queries() entry runs at sf0.001 and the
SQL-backed ones match the DuckDB oracle exactly (the driver's comparison is
row-count + schema + order-insensitive value hash — replicated here as
sorted-frame equality with exact values)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = _to_df(res)
    assert {"doc_key", "cluster_id"} <= set(df.columns)
    assert len(df) >= 0


def test_all_queries_run(ray_session):
    qs = entrymod.queries()
    assert len(qs) >= 15
    for name, fn in qs.items():
        df = _to_df(fn(SF_DIR))
        assert df is not None and len(df.columns) > 0, name


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_sql_oracle_match(ray_session, con, name):
    ray_df = _canon(_to_df(entrymod.queries()[name](SF_DIR)))
    ora_df = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(ora_df.columns), f"{name}: column names differ"
    assert len(ray_df) == len(ora_df), f"{name}: row counts differ"
    pd.testing.assert_frame_equal(ray_df, ora_df, check_exact=True, check_dtype=True)
