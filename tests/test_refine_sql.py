"""The unrolled-CTE DuckDB oracle (pipelines/refine_sql.py) must replay
the engine's MapSplitter refinement bit-for-bit: tree structure, FIFO-BFS
node ids, tile ranks and per-tile counts. The driver gate proves this at
sf0.01; this pins it at sf0.001 inside the suite."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"
TABLES = ("events", "lineitem", "orders")


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{SF}/{t}.parquet')"
        )
    return con


class TestRefineSqlOracle:
    def test_tile_refine_matches_engine(self, ray_session):
        import __ray_entry__ as E
        from mkgmap_ray.pipelines.queries import q_tile_refine

        got = q_tile_refine(SF).sort_values("tile_id").reset_index(drop=True)
        exp = _con().execute(E.oracle_sql()["tile_refine"]).df()
        exp = exp.sort_values("tile_id").reset_index(drop=True).astype("int64")
        pd.testing.assert_frame_equal(got, exp[got.columns])

    def test_level_refine_matches_engine(self, ray_session):
        import __ray_entry__ as E
        from mkgmap_ray.pipelines.queries import q_level_refine

        got = q_level_refine(SF).reset_index(drop=True)
        exp = _con().execute(E.oracle_sql()["level_refine"]).df()
        exp = exp.reset_index(drop=True).astype("int64")
        pd.testing.assert_frame_equal(got, exp[got.columns])

    def test_overview_features_matches_engine(self, ray_session):
        import __ray_entry__ as E
        from mkgmap_ray.pipelines.queries import q_overview_features

        got = q_overview_features(SF).sort_values("tile_id").reset_index(
            drop=True
        )
        exp = _con().execute(E.oracle_sql()["overview_features"]).df()
        exp = exp.sort_values("tile_id").reset_index(drop=True).astype(
            "int64"
        )
        pd.testing.assert_frame_equal(got, exp[got.columns])
        # the OverviewBuilder invariants: one coverage row per tile plus
        # the background row; calcLevels keeps res 16 for sub-planet maps
        assert (got["tile_id"] == -1).sum() == 1
        assert (got["max_res"] == 16).all()

    def test_images_tiles_matches_engine(self, ray_session):
        import __ray_entry__ as E
        from mkgmap_ray.pipelines.queries import q_images_tiles

        got = q_images_tiles(SF).sort_values("tile_id").reset_index(drop=True)
        exp = _con().execute(E.oracle_sql()["images_tiles"]).df()
        exp = exp.sort_values("tile_id").reset_index(drop=True).astype("int64")
        pd.testing.assert_frame_equal(got, exp[got.columns])
