"""Every SQL-expressible ``queries()`` entry vs its DuckDB oracle at
sf0.001 — the same compare the driver runs (row-count, column names,
order-insensitive value hash). Mirrors the reference's oracle-style
full-crawl goldens (/root/reference/tests/search_gov_spiders/
test_full_crawl.py:53-119) for the query surface."""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        df = result.to_pandas()
        if len(df.columns) == 0:  # empty datasets lose their schema
            df = pd.DataFrame({n: [] for n in result.schema().names})
        return df
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return pd.DataFrame(result)


def _value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.round(6).astype(str)
        else:
            df[c] = col.astype(str)
    if len(df) == 0:
        return hashlib.sha256(b"").hexdigest()
    rows = sorted("\x1f".join(v) for v in df.itertuples(index=False, name=None))
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _oracle_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(name, ray_session, sf_dir, oracle_con):
    import __ray_entry__ as e

    mine = _to_df(e.queries()[name](sf_dir))
    theirs = oracle_con.execute(e.oracle_sql()[name]).fetchdf()
    assert len(mine) == len(theirs), f"rows {len(mine)} vs {len(theirs)}"
    assert sorted(mine.columns) == sorted(theirs.columns)
    assert _value_hash(mine) == _value_hash(theirs)
