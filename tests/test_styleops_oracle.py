"""Round-4 style-operator gate queries vs their DuckDB oracles (real
Ray path): OverlayReader 1→N, makeCycleWay 1→2, NameFinder coalesce,
PrefixSuffixFilter separators — operators that previously had only
pytest coverage (no driver-gate row).
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

QUERIES = [
    "overlay_expand",
    "cycleway_synth",
    "name_finder",
    "prefix_suffix",
    "round_obsolete",
    "estimated_sizes",
]


@pytest.fixture(scope="module")
def entry_module(ray_session):
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_styleop_tests", os.path.join(root, "__ray_entry__.py")
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


@pytest.mark.parametrize("name", QUERIES)
def test_styleop_query_matches_oracle(entry_module, duck, name):
    got = entry_module.queries()[name](SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    exp = duck.execute(entry_module.oracle_sql()[name]).df()
    assert got.shape == exp.shape, (got.shape, exp.shape)
    cols = sorted(exp.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:
        if pd.api.types.is_integer_dtype(e[c]):
            g[c] = g[c].astype("int64")
            e[c] = e[c].astype("int64")
        else:
            g[c] = g[c].astype(object)
            e[c] = e[c].astype(object)
    pd.testing.assert_frame_equal(g, e)
