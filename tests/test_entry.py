"""Driver-contract simulation: run every queries() entry at sf0.01 and
compare against its oracle_sql() with the driver's semantics (sorted columns,
order-insensitive row comparison)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"create view {t} as select * from "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as m
    return m


def test_entry_smoke(contract):
    result = contract.entry()
    df = _to_df(result)
    assert len(df) >= 0
    assert "error_kind" in df.columns


def test_all_queries_have_unique_names(contract):
    qs = contract.queries()
    assert len(qs) >= 25
    sql = contract.oracle_sql()
    assert set(sql.keys()) <= set(qs.keys())


def _oracled_names():
    """EVERY query with an oracle is SQL-parity-checked — the list is
    derived, so a new oracled query can never silently skip this gate."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_entry_names", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return sorted(m.oracle_sql())


@pytest.mark.parametrize("name", _oracled_names())
def test_sql_checked_query(contract, con, name):
    qs = contract.queries()
    got = _canon(_to_df(qs[name](SF)))
    exp = _canon(con.sql(contract.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}")
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    if len(got):
        for c in got.columns:
            if got[c].dtype.kind == "f":
                g = got[c].astype(float).to_numpy()
                e = exp[c].astype(float).to_numpy()
                # NULL/NaN positions must agree (SQL NULL arrives as NaN
                # from .df()), then compare the finite values
                assert (np.isnan(g) == np.isnan(e)).all(), \
                    f"{name}.{c} NULL mask mismatch"
                assert np.allclose(g, e, rtol=0, atol=1e-12,
                                   equal_nan=True), f"{name}.{c}"
            else:
                assert (got[c].values == exp[c].values).all(), \
                    f"{name}.{c} mismatch"


def _rows_only_names():
    """Every queries() entry WITHOUT an oracle runs rows-only here, so the
    full driver surface executes in-suite regardless of oracle status."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_entry_names2", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return sorted(set(m.queries()) - set(m.oracle_sql()))


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_query_runs(contract, name):
    got = _to_df(contract.queries()[name](SF))
    assert got is not None
    # rows-only: driver records shape; we assert it at least executes and
    # produces a stable column set (ray's to_pandas drops columns for
    # all-empty datasets — an empty result is still a valid run)
    assert len(got.columns) > 0 or len(got) == 0
