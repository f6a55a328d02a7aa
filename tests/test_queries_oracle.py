"""Side-by-side check of queries() vs oracle_sql() — mirrors the
driver's correctness gate (row count + schema + order-insensitive
values) at sf0.001 for speed; the driver runs sf0.01."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def all_queries(ray_session):
    return entrymod.queries(), entrymod.oracle_sql()


@pytest.mark.parametrize("name", list(entrymod.queries().keys()))
def test_query_matches_oracle(name, all_queries, con):
    queries, oracles = all_queries
    ray_df = _normalize(_to_pandas(queries[name](SF_DIR)))
    assert len(ray_df) >= 0
    if name not in oracles:
        assert len(ray_df) > 0  # rows-only check
        return
    sql_df = _normalize(con.execute(oracles[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    for col in ray_df.columns:
        a = ray_df[col].to_numpy()
        b = sql_df[col].to_numpy()
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            np.testing.assert_allclose(
                a.astype(np.float64), b.astype(np.float64), rtol=0, atol=1e-9,
                err_msg=f"{name}.{col}",
            )
        else:
            mism = a.astype(str) != b.astype(str)
            assert not mism.any(), (
                f"{name}.{col}: {mism.sum()} mismatches, e.g. rows "
                f"{np.flatnonzero(mism)[:5]}: {a[mism][:5]} vs {b[mism][:5]}"
            )


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    df = _to_pandas(out.limit(100))
    assert len(df) > 0
    assert "tile" in df.columns and "poly_id" in df.columns and "cell" in df.columns
    assert "text" in df.columns
