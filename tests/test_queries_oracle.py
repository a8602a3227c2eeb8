"""The driver's correctness gate, embedded in CI at sf0.001: every
queries() entry with an oracle must match DuckDB exactly (rows + dtypes +
values)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def contract():
    import __ray_entry__ as E

    return E.queries(), E.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in TABLES:
        c.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF}/{name}.parquet')"
        )
    return c


def _names():
    import __ray_entry__ as E

    return sorted(E.queries().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, contract, con):
    import ray.data as rd

    qs, osql = contract
    result = qs[name](SF)
    if isinstance(result, rd.Dataset):
        mine = result.to_pandas()
    elif isinstance(result, pa.Table):
        mine = result.to_pandas()
    else:
        mine = result
    if name not in osql:
        assert len(mine) >= 0  # rows-only contract
        return
    oracle = con.execute(osql[name]).fetchdf()
    cols = sorted(oracle.columns)
    assert sorted(mine.columns) == cols, (sorted(mine.columns), cols)
    m = mine[cols].sort_values(cols).reset_index(drop=True)
    o = oracle[cols].sort_values(cols).reset_index(drop=True)
    assert list(m.dtypes.astype(str)) == list(o.dtypes.astype(str))
    pd.testing.assert_frame_equal(m, o, check_dtype=False)
