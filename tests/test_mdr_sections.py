"""New round-4 MDR section queries vs their DuckDB oracles (real Ray path).

Covers Mdr13/23/28 regions, Mdr14/24/29 countries, Mdr21/22 street lists,
Mdr25/27 city lists, Mdr15 string table, Mdr17 prefix indexes and
Mdr18/19 POI-type groups — the driver's gate runs the same comparison at
sf0.01; this is the in-repo replica at sf0.001.
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

NEW_QUERIES = [
    "mdr13_regions",
    "mdr29_countries",
    "mdr2x_streets",
    "mdr25_cities",
    "mdr15_strings",
    "mdr17_prefix",
    "mdr19_types",
]


@pytest.fixture(scope="module")
def entry_module(ray_session):
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_mdr_tests", os.path.join(root, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF}/orders.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", NEW_QUERIES)
def test_mdr_query_matches_oracle(entry_module, duck, name):
    got = entry_module.queries()[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    exp = duck.execute(entry_module.oracle_sql()[name]).df()
    assert got.shape == exp.shape, (got.shape, exp.shape)
    cols = sorted(exp.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        assert str(g[c].dtype) == str(e[c].dtype), (name, c, g[c].dtype,
                                                    e[c].dtype)
    pd.testing.assert_frame_equal(g, e)
