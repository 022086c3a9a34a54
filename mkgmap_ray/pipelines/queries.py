"""The engine's query catalogue over the driver's parquet tables.

Every function takes ``sf_dir`` and returns a small result (pandas /
pyarrow); each has a matching DuckDB oracle in ``__ray_entry__.oracle_sql``
unless marked rows-only. All numeric outputs are int64 (or strings) so
value-hash comparison is float-free; money sums use integer cents
(``CAST(round(x*100) AS BIGINT)`` both sides).

Never calls ``ray.init`` — the caller owns the session.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geom.clip import clip_segments_np
from ..util import stateful_map_batches
from ..stages.ann import topk_dot, quantize
from ..stages.dedup import (
    MinHashSig,
    SimHashSig,
    exact_dedup,
    minhash_candidates,
    simhash_candidates,
)
from ..stages.knn import KnnJoin
from ..stages.pipjoin import PIPJoin
from ..stages.raster import RasterSampler, make_raster
from ..stages.text import TextStats
from .derive import (
    A_LAT,
    A_LON,
    CLIP_RECT_MU,
    GRID_SHIFT,
    SPAN,
    event_points_np,
    features_from_testdata,
    lineitem_segments_np,
    order_triangles_np,
)


def _rd():
    import ray.data as rd

    return rd


def _read(sf_dir: str, table: str, columns=None):
    return _rd().read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _read_split(sf_dir: str, table: str, columns=None, n: int = 16):
    """Read + split into >= n blocks. The sf* fixture files are written as
    ONE row group, so Ray's parquet reader yields one block and any
    CPU-heavy map stage (minhash/simhash signatures, text stats) runs as a
    single serial task. A real 100-TB input is thousands of files x row
    groups and needs no help — this split-only repartition (no shuffle)
    just restores the parallelism the fixture's layout hides."""
    return _read(sf_dir, table, columns).repartition(n)


def cents(x: np.ndarray) -> np.ndarray:
    v = np.asarray(x, np.float64) * 100.0
    return np.trunc(np.where(v >= 0, v + 0.5, v - 0.5)).astype(np.int64)


# --- geo / tiling -----------------------------------------------------------


def q_cell_assign_grid(sf_dir: str):
    """events → fixed-grid cell id (16×16 of 4096 map units) → counts.
    The SQL-checkable face of ``MapArea.pickArea``-style center assignment."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"].combine_chunks(), np.int64)
        lat, lon = event_points_np(eid)
        cell = (lat >> GRID_SHIFT) * (SPAN >> GRID_SHIFT) + (lon >> GRID_SHIFT)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    out = ds.groupby("cell").aggregate(Sum("n", alias_name="n")).to_pandas()
    return out.astype({"cell": "int64", "n": "int64"})


def q_clip_segments(sf_dir: str):
    """lineitem-derived segments × Liang-Barsky clip to the quarter box —
    one output row per surviving segment with clipped int endpoints
    (``general/LineClipper.java`` semantics; see clip_segments_np)."""

    def fn(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"].combine_chunks(), np.int64)
        pk = np.asarray(batch["l_partkey"].combine_chunks(), np.int64)
        sk = np.asarray(batch["l_suppkey"].combine_chunks(), np.int64)
        ln = np.asarray(batch["l_linenumber"].combine_chunks(), np.int64)
        x0, y0, x1, y1 = lineitem_segments_np(ok, pk, sk, ln)
        keep, cx0, cy0, cx1, cy1 = clip_segments_np(
            x0, y0, x1, y1, CLIP_RECT_MU
        )
        return pa.table(
            {
                "l_orderkey": pa.array(ok[keep], pa.int64()),
                "l_linenumber": pa.array(ln[keep], pa.int64()),
                "x0c": pa.array(cx0[keep], pa.int64()),
                "y0c": pa.array(cy0[keep], pa.int64()),
                "x1c": pa.array(cx1[keep], pa.int64()),
                "y1c": pa.array(cy1[keep], pa.int64()),
            }
        )

    return _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    ).map_batches(fn, batch_format="pyarrow", batch_size=None)


# three convex regions in map units (x=lon, y=lat), CCW in (x, y)
PIP_REGIONS = [
    (1, [(10000, 10000), (50000, 14000), (30000, 40000)]),  # triangle (x,y)
    (2, [(30000, 20000), (62000, 20000), (62000, 60000), (30000, 60000)]),
    (3, [(5000, 45000), (20000, 42000), (26000, 52000), (12000, 61000)]),
]


def q_pip_regions(sf_dir: str):
    """event points × convex regions point-in-polygon join (explode form) —
    the ``LocationHook`` boundary join over SQL-checkable polygons."""
    polys = [
        (rid, [(np.asarray([y for x, y in pts]), np.asarray([x for x, y in pts]))])
        for rid, pts in PIP_REGIONS
    ]

    def add_coords(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"].combine_chunks(), np.int64)
        lat, lon = event_points_np(eid)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "lat_hp": pa.array(lat, pa.int64()),
                "lon_hp": pa.array(lon, pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        add_coords, batch_format="pyarrow", batch_size=None
    )
    # instance (task) mode: the 3-polygon index builds once on the
    # driver and ships by closure — actor-pool spin-up cost 2-4 s per
    # run while the state is trivially small (hook_chain lesson), and a
    # 1-CPU cluster can't host an actor pool at all (BASELINE.md r4)
    joined = ds.map_batches(
        PIPJoin(polygons_ref=polys, raster_shift=14),
        batch_format="pyarrow", batch_size=None,
    )
    out = joined.to_pandas()[["event_id", "boundary_id"]]
    return out.rename(columns={"boundary_id": "region_id"}).astype("int64")


def q_knn_join(sf_dir: str):
    """customer-derived houses → nearest supplier-derived road point
    (integer squared distance, ties to smallest road id) — the
    ``HousenumberGenerator``/``KdTree.findNextPoint`` join."""
    import pyarrow.parquet as pq
    import ray

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    sk = np.asarray(sup["s_suppkey"], np.int64)
    ry = (sk * A_LAT + 777) % SPAN
    rx = (sk * A_LON + 333) % SPAN
    ref = ray.put((sk, ry, rx))

    def add_coords(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch["c_custkey"].combine_chunks(), np.int64)
        return pa.table(
            {
                "c_custkey": pa.array(ck, pa.int64()),
                "lat_hp": pa.array((ck * A_LAT) % SPAN, pa.int64()),
                "lon_hp": pa.array((ck * A_LON) % SPAN, pa.int64()),
            }
        )

    ds = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        add_coords, batch_format="pyarrow", batch_size=None
    )
    joined = stateful_map_batches(
        ds, KnnJoin, fn_kwargs=dict(ref=ref),
        batch_format="pyarrow", batch_size=None,
    )
    out = joined.to_pandas()[["c_custkey", "nn_id", "nn_dist2"]]
    return out.rename(columns={"nn_id": "road_id", "nn_dist2": "dist2"}).astype(
        "int64"
    )


def q_tile_refine(sf_dir: str):
    """Full MapSplitter tile refinement over all derived features → per-tile
    bounds + counts (rows-only: checked against the recursive oracle in
    pytest)."""
    from .tiling import build_tiles, tile_summary
    from .derive import features_dataset

    ds = features_dataset(sf_dir)
    assigned, meta, tree = build_tiles(ds, shift=0, clip=False)
    summary = tile_summary(assigned).to_pandas()
    meta_pd = meta.to_pandas()
    out = meta_pd.merge(summary, on="tile_id", how="left").fillna(0)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


QUAD_LEVEL = 8  # quadkey levels over the 16-bit map-unit square


def q_cell_quadkey(sf_dir: str):
    """S2/quadkey-style HIERARCHICAL cell encoding (the north-star's
    H3/S2 index face; the reference's analogue is the quadtree
    subdivision id): every event point gets its level-8 Morton quadkey
    over the 65536² map-unit square, and per level-4 PARENT cell
    (quadkey >> 8) the aggregate counts + child-key checksums prove the
    prefix property (a parent's children share its bit prefix) that
    makes hierarchical pruning work at scale. Vectorized bit
    interleaving per batch; partial aggregation before the groupby."""
    from ray.data.aggregate import Sum

    L = QUAD_LEVEL

    def fn(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"].combine_chunks(), np.int64)
        lat = (eid * A_LAT) % SPAN
        lon = (eid * A_LON) % SPAN
        qk = np.zeros(len(eid), np.int64)
        for lvl in range(L):
            shift = 15 - lvl  # top bit first
            qk = (qk << 2) | (((lat >> shift) & 1) << 1) | ((lon >> shift) & 1)
        parent = qk >> 8  # level-4 ancestor
        df = pd.DataFrame(
            {"parent": parent, "n": 1, "qk_sum": qk,
             "qk_min": qk, "qk_max": qk}
        )
        return pa.Table.from_pandas(
            df.groupby("parent", as_index=False).agg(
                n=("n", "sum"), qk_sum=("qk_sum", "sum"),
                qk_min=("qk_min", "min"), qk_max=("qk_max", "max"),
            ),
            preserve_index=False,
        )

    from ray.data.aggregate import Max, Min

    out = (
        _read(sf_dir, "events", ["event_id"])
        .map_batches(fn, batch_format="pyarrow", batch_size=None)
        .groupby("parent")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("qk_sum", alias_name="qk_sum"),
            Min("qk_min", alias_name="qk_min"),
            Max("qk_max", alias_name="qk_max"),
        )
        .to_pandas()
    )
    # prefix property: every child key of a parent lies in
    # [parent<<8, (parent+1)<<8) — assert it really held
    assert (
        (out["qk_min"] >= out["parent"] * 256)
        & (out["qk_max"] < (out["parent"] + 1) * 256)
    ).all()
    return out.sort_values("parent").reset_index(drop=True).astype("int64")


SALT_HOT_THRESHOLD = 64  # rows per cell above which the key is salted
N_SALTS = 8


def q_cell_salted_agg(sf_dir: str):
    """Skew-safe per-cell aggregation (the north-star's "salting for
    skewed dense cells"): event points land in a COARSE 16-cell column
    grid (deliberately skewed — a multiplicative-hash row distribution
    over 16 cells), hot cells are SALTED into ``N_SALTS`` sub-keys for
    the wide shuffle, and a second tiny groupby folds the salts back.
    The output (per-cell counts + coordinate sums) is salt-invariant, so
    the DuckDB oracle is a plain GROUP BY — the query proves the salted
    two-stage plan computes the same answer while no single reducer key
    carries more than ~1/N_SALTS of a hot cell."""
    from ray.data.aggregate import Sum

    def fn(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"].combine_chunks(), np.int64)
        lat = (eid * A_LAT) % SPAN
        lon = (eid * A_LON) % SPAN
        # skewed coarse cell: squaring concentrates mass in low cells
        cell = ((lon * lon) >> 28) % 16
        salt = np.where(
            cell < 4, eid % N_SALTS, 0  # the 4 hottest cells get salted
        )
        df = pd.DataFrame(
            {"cell": cell, "salt": salt, "n": 1,
             "sum_lat": lat, "sum_lon": lon}
        )
        return pa.Table.from_pandas(
            df.groupby(["cell", "salt"], as_index=False).sum(),
            preserve_index=False,
        )

    salted = (
        _read(sf_dir, "events", ["event_id"])
        .map_batches(fn, batch_format="pyarrow", batch_size=None)
        .groupby(["cell", "salt"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_lat", alias_name="sum_lat"),
            Sum("sum_lon", alias_name="sum_lon"),
        )
        .to_pandas()
    )
    # fold the salts back (tiny: ≤ 16 cells × N_SALTS rows)
    out = (
        salted.groupby("cell", as_index=False)[["n", "sum_lat", "sum_lon"]]
        .sum()
    )
    return out.sort_values("cell").reset_index(drop=True).astype("int64")


def q_overview_features(sf_dir: str):
    """OverviewBuilder feature merge (``combiners/OverviewBuilder.java:
    88-407``): full tile refinement, then the overview content — per-tile
    coverage polygons (0x4a), low-res merged feature counts + rounded
    coordinate checksums at resolution 16, the background 0x4b row and
    the calcLevels max-resolution rule. SQL-exact: the oracle replays the
    refinement (``refine_sql``) and the rounding/degenerate arithmetic."""
    from .derive import features_dataset
    from .tiling import build_tiles, overview_features

    ds = features_dataset(sf_dir)
    assigned, meta, tree = build_tiles(ds, shift=0, clip=False)
    return overview_features(assigned, meta, resolution=16)


def q_level_refine(sf_dir: str):
    """Per-zoom subdivision quadtree (``MapBuilder.makeMapAreas``,
    levels 4:16 … 0:24): each level's tree continues the parent level's
    areas. Per level: tile count + bounds checksums (rows-only: per-level
    leaf areas are checked against the recursive oracle in pytest)."""
    from ..stages.assign import build_level_trees, narrow_stats
    from .derive import features_dataset

    ds = features_dataset(sf_dir)
    shifts = (8, 6, 4, 2, 0)
    trees = build_level_trees(narrow_stats(ds), shifts)
    rows = []
    for level, (shift, tree) in enumerate(zip(shifts, trees)):
        leaves = tree.leaves()
        rows.append(
            {
                "level": 4 - level,
                "shift": shift,
                "n_tiles": len(leaves),
                "sum_min_lat": sum(tree.bounds[n].min_lat for n in leaves),
                "sum_max_lon": sum(tree.bounds[n].max_lon for n in leaves),
            }
        )
    return pd.DataFrame(rows).astype("int64")


RASTER_RES = 1024  # power of two → exact fixed-point interpolation


def q_raster_sample(sf_dir: str):
    """event-derived probe points × bilinear elevation sampling
    (``HGTConverter`` semantics) on the closed-form raster; output scaled
    ×16 so the quarter-cell fractions are exact integers."""
    import ray

    raster = make_raster(res=RASTER_RES, n_voids=0)
    ref = ray.put(raster)

    def add_coords(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"].combine_chunks(), np.int64)
        px = (eid * 7919) % RASTER_RES
        py = (eid * 104729) % RASTER_RES
        fx = px + ((eid * 3) % 4) / 4.0
        fy = py + ((eid * 5) % 4) / 4.0
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "lat": pa.array(fy / RASTER_RES, pa.float64()),
                "lon": pa.array(fx / RASTER_RES, pa.float64()),
            }
        )

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        add_coords, batch_format="pyarrow", batch_size=None
    )
    sampled = stateful_map_batches(
        ds, RasterSampler, fn_kwargs=dict(raster_ref=ref),
        batch_format="pyarrow", batch_size=None,
    )
    out = sampled.to_pandas()[["event_id", "height"]]
    out["height16"] = (out["height"] * 16).round().astype("int64")
    return out[["event_id", "height16"]]


def q_simplify_dp(sf_dir: str):
    """orders-derived 5-point zigzags → Douglas-Peucker at resolution 20 →
    points kept per feature (rows-only; DP is not SQL-expressible)."""
    from ..geom.simplify import douglas_peucker
    from ..geom.coords import DELTA_SHIFT

    def fn(batch: pa.Table) -> pa.Table:
        from ..geom.simplify import douglas_peucker_batch

        ok = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        n = len(ok)
        base_y = (ok * A_LAT) % SPAN
        base_x = (ok * A_LON) % SPAN
        amp = 16 + (ok % 512)
        xs = (base_x[:, None] + np.arange(5)[None, :] * 1024) << DELTA_SHIFT
        ys = (base_y[:, None]
              + np.stack([np.zeros(n, np.int64), amp, np.zeros(n, np.int64),
                          amp, np.zeros(n, np.int64)], axis=1)) << DELTA_SHIFT
        keep = douglas_peucker_batch(
            ys, xs, np.full(n, 5, np.int64), allowed_error=2.7 * 16
        )
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "n_kept": pa.array(keep.sum(axis=1).astype(np.int64),
                                   pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


# --- relational (TPC-H-ish) -------------------------------------------------


def q_q1_pricing(sf_dir: str):
    """TPC-H Q1 shape: filter + groupby + integer-cent sums (partial
    aggregation per batch, then a small shuffle)."""
    from ray.data.aggregate import Sum

    cutoff = np.datetime64("1998-09-01")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch["l_shipdate"].to_numpy() < cutoff]
        if len(b) == 0:
            return pd.DataFrame(
                columns=["l_returnflag", "l_linestatus", "qty_c", "price_c",
                         "disc_price_c", "n"]
            )
        g = pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty_c": cents(b["l_quantity"].to_numpy()),
                "price_c": cents(b["l_extendedprice"].to_numpy()),
                "disc_price_c": cents(b["l_extendedprice"].to_numpy())
                * (10000 - cents(b["l_discount"].to_numpy()) * 100),
                "n": 1,
            }
        )
        return (
            g.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
        )

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    ).map_batches(partial, batch_format="pandas")
    out = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("price_c", alias_name="sum_price_c"),
            Sum("disc_price_c", alias_name="sum_disc_price_c"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    for c in out.columns[2:]:
        out[c] = out[c].astype("int64")
    return out


def _revenue_cents(batch: pa.Table) -> np.ndarray:
    return cents(
        np.asarray(batch["l_extendedprice"].combine_chunks(), np.float64)
    ) * (
        10000
        - cents(np.asarray(batch["l_discount"].combine_chunks(), np.float64))
        * 100
    )


def q_q3_top_orders(sf_dir: str):
    """Distributed join shape: broadcast ONLY the (dimension-sized)
    BUILDING customer-key set; orders are filtered distributively and the
    orders⋈lineitem join on orderkey runs as union + one hash groupby of
    per-block partials — no fact-sized table ever reaches the driver
    (round 1 materialized every BUILDING order's key with to_pandas).
    Top-10 via per-block top-k partials, driver merges ≤ blocks×10 rows."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Max, Sum

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    karr = np.sort(
        np.asarray(cust["c_custkey"], np.int64)[
            np.asarray(cust["c_mktsegment"]) == "BUILDING"
        ]
    )

    def orders_side(batch: pa.Table) -> pa.Table:
        ck = np.asarray(batch["o_custkey"].combine_chunks(), np.int64)
        ok = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)[
            np.isin(ck, karr)
        ]
        return pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "revenue_c": pa.array(np.zeros(len(ok), np.int64), pa.int64()),
                "n_line": pa.array(np.zeros(len(ok), np.int64), pa.int64()),
                "is_order": pa.array(np.ones(len(ok), np.int64), pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"].combine_chunks(), np.int64)
        rev = _revenue_cents(batch)
        uniq, inv = np.unique(ok, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq, pa.int64()),
                "revenue_c": pa.array(
                    np.bincount(inv, weights=rev, minlength=len(uniq)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "n_line": pa.array(
                    np.bincount(inv, minlength=len(uniq)).astype(np.int64),
                    pa.int64(),
                ),
                "is_order": pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        orders_side, batch_format="pyarrow", batch_size=None
    )
    lines = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(line_side, batch_format="pyarrow", batch_size=None)

    def add_part(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"].combine_chunks(), np.int64)
        return batch.append_column("part", pa.array(ok & 255, pa.int64()))

    def join_topk(g: pd.DataFrame) -> pd.DataFrame:
        # one call per orderkey hash partition: finish the join + keep
        # only this partition's top-10 (global top-10 survives the merge)
        agg = g.groupby("l_orderkey", as_index=False).agg(
            revenue_c=("revenue_c", "sum"),
            n_line=("n_line", "sum"),
            is_order=("is_order", "max"),
        )
        agg = agg[(agg["is_order"] == 1) & (agg["n_line"] > 0)]
        return agg.sort_values(
            ["revenue_c", "l_orderkey"], ascending=[False, True]
        ).head(10)[["l_orderkey", "revenue_c"]]

    out = (
        orders.union(lines)
        .map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(join_topk, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values(
        ["revenue_c", "l_orderkey"], ascending=[False, True]
    ).head(10)
    return out.reset_index(drop=True).astype("int64")


def q_q5_nation_revenue(sf_dir: str):
    """Distributed multi-join: broadcast only the DIMENSION sides
    (customer→nation as sorted searchsorted arrays, nation names).
    The fact-sized order→nation map is built distributively (orders
    map_batches), joined with per-block lineitem revenue partials via
    union + one hash groupby on orderkey, then reduced to 25 nation rows
    — round 1 read the whole orders table on the driver and probed a
    Python dict per order row."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Max, Sum

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    order_c = np.argsort(np.asarray(cust["c_custkey"], np.int64))
    ck_sorted = np.asarray(cust["c_custkey"], np.int64)[order_c]
    cnk_sorted = np.asarray(cust["c_nationkey"], np.int64)[order_c]
    n2name = dict(
        zip(
            np.asarray(nation["n_nationkey"], np.int64).tolist(),
            nation["n_name"].to_pylist(),
        )
    )

    def orders_side(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        ck = np.asarray(batch["o_custkey"].combine_chunks(), np.int64)
        pos = np.clip(
            np.searchsorted(ck_sorted, ck), 0, max(len(ck_sorted) - 1, 0)
        )
        nk = np.where(ck_sorted[pos] == ck, cnk_sorted[pos], -1)
        return pa.table(
            {
                "l_orderkey": pa.array(ok, pa.int64()),
                "revenue_c": pa.array(np.zeros(len(ok), np.int64), pa.int64()),
                "nationkey": pa.array(nk, pa.int64()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"].combine_chunks(), np.int64)
        rev = _revenue_cents(batch)
        uniq, inv = np.unique(ok, return_inverse=True)
        return pa.table(
            {
                "l_orderkey": pa.array(uniq, pa.int64()),
                "revenue_c": pa.array(
                    np.bincount(inv, weights=rev, minlength=len(uniq)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
                "nationkey": pa.array(
                    np.full(len(uniq), -1, np.int64), pa.int64()
                ),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        orders_side, batch_format="pyarrow", batch_size=None
    )
    lines = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(line_side, batch_format="pyarrow", batch_size=None)

    def add_part(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"].combine_chunks(), np.int64)
        return batch.append_column("part", pa.array(ok & 255, pa.int64()))

    def join_nation(g: pd.DataFrame) -> pd.DataFrame:
        # one call per orderkey hash partition: finish the orderkey join
        # and immediately reduce to per-nation partials (≤ 25 rows out)
        agg = g.groupby("l_orderkey", as_index=False).agg(
            revenue_c=("revenue_c", "sum"), nationkey=("nationkey", "max")
        )
        agg = agg[agg["nationkey"] >= 0]  # inner join: order row required
        return agg.groupby("nationkey", as_index=False)["revenue_c"].sum()

    partials = (
        orders.union(lines)
        .map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(join_nation, batch_format="pandas")
        .to_pandas()
    )  # ≤ nations × parts rows reach the driver
    out = partials.groupby("nationkey", as_index=False)["revenue_c"].sum()
    out["n_name"] = out["nationkey"].map(n2name)
    out["revenue_c"] = out["revenue_c"].astype("int64")
    out["nationkey"] = out["nationkey"].astype("int64")
    return out[["nationkey", "n_name", "revenue_c"]]


def q_events_window(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + value cents sum
    (streaming-shaped workload expressed as groupby over window keys)."""
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        win = us // (3600 * 1_000_000)
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "window": win,
                "value_c": cents(batch["value"].to_numpy()),
                "n": 1,
            }
        )
        return df.groupby(["event_type", "window"], as_index=False).sum()

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pandas"
    )
    out = (
        ds.groupby(["event_type", "window"])
        .aggregate(Sum("value_c", alias_name="value_c"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    for c in ("window", "value_c", "n"):
        out[c] = out[c].astype("int64")
    return out


def q_top_users(sf_dir: str):
    """Top-k users by event count: per-batch partials, then driver combine
    (user cardinality is output-sized — see stages/combine.py) + top-20."""
    from ..stages.combine import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch["user_id"].combine_chunks(), np.int64)
        vc = cents(np.asarray(batch["value"].combine_chunks(), np.float64))
        uniq, inv = np.unique(uid, return_inverse=True)
        return pa.table(
            {
                "user_id": pa.array(uniq, pa.int64()),
                "n": pa.array(
                    np.bincount(inv, minlength=len(uniq)).astype(np.int64),
                    pa.int64(),
                ),
                "value_c": pa.array(
                    np.bincount(inv, weights=vc, minlength=len(uniq)).astype(
                        np.int64
                    ),
                    pa.int64(),
                ),
            }
        )

    parts = _read(sf_dir, "events", ["user_id", "value"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    c = combine_partials(parts, "user_id", ["n", "value_c"])
    out = pd.DataFrame(c)
    out = out.sort_values(["n", "user_id"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True).astype("int64")


# --- documents --------------------------------------------------------------


def q_doc_stats(sf_dir: str):
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = stateful_map_batches(
        ds, TextStats, batch_format="pandas", batch_size=None
    ).to_pandas()
    return out[["doc_id", "n_chars_calc", "n_tokens", "n_punct"]].astype("int64")


def q_doc_lang_counts(sf_dir: str):
    from ray.data.aggregate import Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {"lang": batch["lang"], "n": 1, "chars": batch["n_chars"]}
        )
        return df.groupby("lang", as_index=False).sum()

    ds = _read(sf_dir, "documents", ["lang", "n_chars"]).map_batches(
        partial, batch_format="pandas"
    )
    out = (
        ds.groupby("lang")
        .aggregate(Sum("n", alias_name="n"), Sum("chars", alias_name="sum_chars"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out


def q_dedup_exact(sf_dir: str):
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()
    return out.astype("int64")


def q_dedup_minhash(sf_dir: str):
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = minhash_candidates(ds, threshold=0.5).to_pandas()
    return out[["a", "b"]].astype("int64")


def q_dedup_keeplist(sf_dir: str):
    """The dedup DELIVERABLE a training pipeline actually consumes: a
    per-document keep/drop list. MinHash-LSH near-dup pairs (the
    ``dedup_minhash`` machinery) feed a driver union-find over the
    SPARSE pairs only; the label map broadcasts via ``ray.put`` into a
    ``map_batches`` over the documents (the ``phash_dedup`` join-back
    pattern — per-doc rows never sit on the driver). Output per doc:
    cluster (smallest linked doc_id; self when unlinked) and kept
    (cluster representative flag). The DuckDB oracle chains the
    signature arithmetic with a recursive-CTE transitive closure."""
    import ray

    from ..stages.imagestage import cluster_pairs

    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_candidates(ds, threshold=0.5).to_pandas()
    a = pairs["a"].to_numpy(np.int64)
    b = pairs["b"].to_numpy(np.int64)
    linked = np.unique(np.concatenate([a, b]))
    labels = cluster_pairs(linked, a, b)
    ref = ray.put((linked, labels))

    def add_cluster(batch: pa.Table) -> pa.Table:
        ids_l, labs = ray.get(ref)
        did = np.asarray(batch["doc_id"].combine_chunks(), np.int64)
        cluster = did.copy()
        if len(ids_l):
            pos = np.minimum(np.searchsorted(ids_l, did), len(ids_l) - 1)
            hit = ids_l[pos] == did
            cluster[hit] = labs[pos[hit]]
        return pa.table(
            {
                "doc_id": pa.array(did, pa.int64()),
                "cluster": pa.array(cluster, pa.int64()),
                "kept": pa.array(
                    (cluster == did).astype(np.int64), pa.int64()
                ),
            }
        )

    return _read_split(sf_dir, "documents", ["doc_id"]).map_batches(
        add_cluster, batch_format="pyarrow", batch_size=None
    )


def q_dedup_simhash(sf_dir: str):
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = simhash_candidates(ds, max_hamming=3).to_pandas()
    return out[["a", "b", "hamming"]].astype("int64")


def q_minhash_sig(sf_dir: str):
    """SQL-checkable MinHash face: per-doc signature sum over the 64
    (a*x+b) mod 2^31-1 permutations of base-31 shingle polynomials — the
    DuckDB oracle recomputes the identical integer arithmetic closed form
    (graduates MinHash from a rows-only check)."""
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        MinHashSig(), batch_format="pandas", batch_size=None
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


def q_simhash_sig(sf_dir: str):
    """SQL-checkable SimHash face: per-doc 64-bit SimHash over whitespace
    tokens' FNV-1a hashes (the oracle emulates uint64 wraparound with
    HUGEINT arithmetic)."""
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        SimHashSig(), batch_format="pandas", batch_size=None
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


def q_langid(sf_dir: str):
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = stateful_map_batches(
        ds, TextStats, batch_format="pandas", batch_size=None
    ).to_pandas()
    return out[["doc_id", "lang_pred"]]


def q_doc_quality(sf_dir: str):
    """Document QUALITY SCORING (the training-data filter operator:
    length / punctuation / stopword-ratio recipe, ``stages/text.py``) —
    exposed to the gate with a float64 oracle: the SQL mirrors every
    operation in the engine's association order and uses ``round_even``
    (numpy's banker's rounding) so the 6-decimal scores compare
    bit-for-bit."""
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = stateful_map_batches(
        ds, TextStats, batch_format="pandas", batch_size=None
    ).to_pandas()
    out = out[["doc_id", "quality"]].copy()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_fingerprint(sf_dir: str):
    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = stateful_map_batches(
        ds, TextStats, batch_format="pandas", batch_size=None
    ).to_pandas()
    return out[["doc_id", "fingerprint"]].astype("int64")


def q_token_bpe(sf_dir: str):
    """Token counting: whitespace tokens + GPT-2-ish ASCII pretokenizer +
    fixed-width BPE piece estimate (ceil(len/4) per pretoken) — the
    training-data token-budget operator; the DuckDB oracle recomputes the
    identical counts with regexp_extract_all + list arithmetic."""
    from ..stages.text import BpeTokens

    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        BpeTokens(), batch_format="pandas", batch_size=None
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


def q_dedup_ngram(sf_dir: str):
    """EXACT word-4-gram Jaccard near-dup pairs at >= 0.5 — the verifier
    face of the near-dup stack (minhash_candidates estimates, this
    confirms; on the sf corpus the >=0.5 survivor sets coincide). Integer
    ppm arithmetic on both sides."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = _read_split(sf_dir, "documents", ["doc_id", "text"])
    return ngram_jaccard_pairs(ds, min_ppm=500_000)


def q_unused_filter(sf_dir: str):
    """``UnusedElementsRemoverHook``: tagless elements dropped, nodes
    outside the tile bbox dropped unless POI-placement-tagged, ways kept
    iff an endpoint is inside / the segment intersects / the way bbox
    covers the tile. Axis-aligned fixture segments keep the oracle exact
    (Liang-Barsky reduces to interval overlap)."""
    from ..stages.hooks import unused_nodes_mask, unused_ways_mask

    BBOX = (500, 500, 1500, 1500)

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        keep_node = unused_nodes_mask(
            k % 7 != 0, (k * 13) % 2000, (k * 29) % 2000, BBOX,
            poi_tag_present=(k % 11 == 0),
        )
        horiz = k % 2 == 0
        a = (k * 17) % 2000
        b = (k * 23) % 2000
        ln = 100 + (k % 300)
        lat0 = np.where(horiz, a, b)
        lon0 = np.where(horiz, b, a)
        lat1 = np.where(horiz, a, b + ln)
        lon1 = np.where(horiz, b + ln, a)
        keep_way = unused_ways_mask(
            k % 5 != 0, lat0, lon0, lat1, lon1, BBOX
        )
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "keep_node": pa.array(keep_node.astype(np.int64),
                                      pa.int64()),
                "keep_way": pa.array(keep_way.astype(np.int64), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(fn, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


def q_audio_features(sf_dir: str):
    """Audio feature extraction over a binary PCM column: decode →
    per-window integer energy / zero-crossings / peak (actor stage; the
    closed-form signal makes the features SQL-exact while the decode path
    stays real bytes → codec → numpy)."""
    from ..stages.media import audio_dataset, audio_features

    out = audio_features(audio_dataset(2000)).to_pandas()
    return (
        out.sort_values(["audio_id", "win"]).reset_index(drop=True)
        .astype("int64")
    )


def q_video_frames(sf_dir: str):
    """Video frame sampling over a length-prefixed frame container:
    seek past unsampled frames (no decode), decode every 2nd frame via
    the real qraw codec, emit integer frame means (SQL-exact thanks to
    the closed-form solid frames)."""
    from ..stages.media import frame_sample, video_dataset

    out = frame_sample(video_dataset(1500), k=2).to_pandas()
    return (
        out.sort_values(["video_id", "frame"]).reset_index(drop=True)
        .astype("int64")
    )


def q_image_phash_dedup(sf_dir: str):
    """Image near-dup dedup: decode → perceptual hash → exact-signature
    groups → banded near-dup candidate pairs → union-find over pairs
    (rows-only; pixel decode has no SQL face — tests/test_imageops.py
    holds the brute oracle; ``phash_cluster`` is the SQL-exact face of
    the same grouping/banding/clustering machinery)."""
    from ..sources.images import images_dataset
    from ..stages.imagestage import phash_dedup

    # 125 rows/block → 16 generate+decode tasks (500/block capped the
    # fused gen→decode stage at 4-way parallelism, VERDICT r4 finding 4)
    return phash_dedup(images_dataset(2000, rows_per_block=125),
                       max_hamming=4)


def _phash_synth(k: np.ndarray) -> np.ndarray:
    """Closed-form 64-bit signatures with planted exact dups (key
    triples), near-dups (≤4 flipped bits off a per-group base) and
    distinct noise — int64-wrap arithmetic both numpy and DuckDB HUGEINT
    reproduce bit-exactly."""
    j = k // 3
    g = j % 37
    base = (g + 1) * np.int64(2862933555777941757)  # wraps mod 2^64
    f = j % 5
    mask = np.zeros_like(j)
    for i in range(4):
        bit = np.int64(1) << ((j * (2 * i + 3)) % 63)
        mask = np.where(f > i, mask ^ bit, mask)
    return base ^ mask


def q_phash_cluster(sf_dir: str):
    """SQL-exact face of the phash dedup machinery (VERDICT r3 finding
    3): exact-signature collapse (hash-partitioned groupby), pigeonhole
    banding of the 64-bit hash into max_hamming+1 slices, bucketed
    candidate pairs, union-find over PAIRS only. The DuckDB oracle
    recomputes the signatures closed-form, finds edges with
    ``bit_count(xor(...)) <= 4`` and clusters them with a recursive-CTE
    transitive closure."""
    from ..stages.imagestage import (
        cluster_pairs,
        phash_near_pairs,
        phash_rep_groups,
    )

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        return pa.table(
            {
                "img_num": pa.array(k, pa.int64()),
                "phash": pa.array(_phash_synth(k), pa.int64()),
            }
        )

    ds = _read_split(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )
    # reps is consumed twice (pairs + output) — materialize in plasma
    reps_ds = phash_rep_groups(ds).materialize()
    pairs = phash_near_pairs(reps_ds, max_hamming=4).to_pandas()
    reps = reps_ds.to_pandas().sort_values("keep_img").reset_index(drop=True)
    reps["cluster"] = cluster_pairs(
        reps["keep_img"].to_numpy(np.int64),
        pairs["a"].to_numpy(np.int64),
        pairs["b"].to_numpy(np.int64),
    )
    return reps[["phash", "keep_img", "n_members", "cluster"]].astype("int64")


# --- embeddings -------------------------------------------------------------


N_ANN_QUERIES = 8
ANN_K = 10


def q_ann_topk_dot(sf_dir: str):
    import pyarrow.parquet as pq

    import pyarrow.compute as pc

    q_all = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = q_all.filter(pc.less(q_all["vec_id"], N_ANN_QUERIES))
    q_ids = np.asarray(q["vec_id"], np.int64)
    dim = len(q["embedding"][0])
    q_mat = np.asarray(q["embedding"].combine_chunks().values, np.float64).reshape(
        -1, dim
    )
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = topk_dot(ds, q_ids, q_mat, k=ANN_K)
    return out.astype("int64")


def q_dedup_embed(sf_dir: str):
    """Embedding-cosine near-dup pairs (cos >= 0.40), integer-exact: the
    brute-force baseline matmuls each batch against the ray.put-broadcast
    quantized corpus and tests dot^2*1e4 >= 1600*|a|^2*|b|^2 in int64 —
    no float anywhere, so the DuckDB list-arithmetic oracle matches
    bit-for-bit. Scale path: lsh_bucketed_cosine_pairs."""
    import pyarrow.parquet as pq

    from ..stages.ann import cosine_neardup_pairs

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], np.int64)
    dim = len(t["embedding"][0])
    mat = np.asarray(
        t["embedding"].combine_chunks().values, np.float64
    ).reshape(-1, dim)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_neardup_pairs(ds, ids, mat)


def q_ann_cosine_pairs(sf_dir: str):
    import pyarrow.parquet as pq

    dim = len(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])[
            "embedding"
        ][0]
    )
    from ..stages.ann import lsh_bucketed_cosine_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = lsh_bucketed_cosine_pairs(
        ds, dim=dim, threshold=0.35, n_bits=12, n_bands=8
    ).to_pandas()
    if "a" not in out.columns:  # no buckets produced any pair
        out = pd.DataFrame({"a": [], "b": []})
    return out[["a", "b"]].astype("int64")


def q_emb_label_sums(sf_dir: str):
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pd.DataFrame:
        lab = np.asarray(batch["label"].combine_chunks(), np.int64)
        arr = batch["embedding"].combine_chunks()
        dim = len(arr[0])
        mat = quantize(
            np.asarray(arr.values, np.float64).reshape(-1, dim)
        )
        df = pd.DataFrame({"label": lab, "sum_q": mat.sum(axis=1), "n": 1})
        return df.groupby("label", as_index=False).sum()

    ds = _read(sf_dir, "embeddings", ["label", "embedding"]).map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    out = (
        ds.groupby("label")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_q", alias_name="sum_q"))
        .to_pandas()
    )
    return out.astype("int64")


# --- images (rows-only: no testdata table; deterministic synthetic input) ---


def q_images_tiles(sf_dir: str):
    """The image+caption flagship slice: stream the deterministic images
    table (block-independent closed-form geo tags — the splitmix chain the
    DuckDB oracle mirrors in HUGEINT), make point features, tile-assign
    with refinement, verify pixel / caption invariants on a sample, return
    per-tile counts. SQL-exact: the oracle replays the geo derivation, the
    splitMaxSize grid and the full refinement fixpoint
    (``refine_sql.tile_refine_sql``)."""
    from ..sources.geo import features_from_images
    from ..sources.images import (
        decode_image,
        generate_batch,
        hamming64,
        images_dataset,
        phash64,
    )
    from .tiling import build_tiles, tile_summary

    n = 2000
    bbox = (0.0, 0.0, 1.4, 1.4)
    # row-level invariants on a deterministic sample
    sample = generate_batch(np.arange(0, n, 251, dtype=np.int64), bbox)
    for i in range(sample.num_rows):
        rgb = decode_image(sample["bytes"][i].as_py(), sample["fmt"][i].as_py())
        assert rgb.shape[0] == sample["h"][i].as_py()
        assert hamming64(phash64(rgb), sample["phash"][i].as_py()) <= 4
    ds = images_dataset(n, bbox=bbox, rows_per_block=125).map_batches(
        lambda b: features_from_images(b), batch_format="pyarrow",
        batch_size=None,
    )
    assigned, meta, tree = build_tiles(ds, shift=0, clip=False)
    out = tile_summary(assigned).to_pandas()
    return out.astype("int64")


# --- way assembly / overview / label index / line splitting -----------------


def q_way_assembly(sf_dir: str):
    """Node→way broadcast hash join + per-way reduce: lineitem rows are way
    refs (way=l_orderkey, node ref=l_partkey), events are the node table
    (``ElementSaver.coordMap`` resolution, ``ElementSaver.java:95-106``).
    The node index is built once and broadcast via ``ray.put``; each refs
    batch resolves with a vectorized probe, pre-aggregates per way inside
    the batch, and a small groupby finishes."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from ..stages.assemble import NodeJoin, make_node_index

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id"])
    nid = np.asarray(ev["event_id"], np.int64)
    nlat, nlon = event_points_np(nid)
    ref = ray.put(make_node_index(nid, nlat, nlon))

    def to_refs(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"].combine_chunks(), np.int64)
        pk = np.asarray(batch["l_partkey"].combine_chunks(), np.int64)
        return pa.table(
            {
                "way_id": pa.array(ok, pa.int64()),
                "node_id": pa.array(pk, pa.int64()),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        way = np.asarray(batch["way_id"].combine_chunks(), np.int64)
        res = np.asarray(batch["resolved"].combine_chunks(), np.int64)
        lat = np.asarray(batch["lat"].combine_chunks(), np.int64)
        lon = np.asarray(batch["lon"].combine_chunks(), np.int64)
        uniq, inv = np.unique(way, return_inverse=True)

        def agg(v):
            return pa.array(
                np.bincount(inv, weights=v, minlength=len(uniq)).astype(
                    np.int64
                ),
                pa.int64(),
            )

        return pa.table(
            {
                "way_id": pa.array(uniq, pa.int64()),
                "n_refs": agg(np.ones(len(way), np.int64)),
                "n_resolved": agg(res),
                "sum_lat": agg(lat),
                "sum_lon": agg(lon),
            }
        )

    refs = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        to_refs, batch_format="pyarrow", batch_size=None
    )
    joined = stateful_map_batches(
        refs, NodeJoin, fn_kwargs=dict(index_ref=ref),
        batch_format="pyarrow", batch_size=None,
    )
    from ..stages.combine import combine_partials

    parts = joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
    c = combine_partials(
        parts, "way_id", ["n_refs", "n_resolved", "sum_lat", "sum_lon"]
    )
    return pd.DataFrame(c).astype("int64")


OVERVIEW_SHIFT = 13  # 8×8 overview grid over the 65536-unit square


def q_overview_grid(sf_dir: str):
    """Overview histogram: feature counts per (kind, coarse cell) — the
    ``MapDetails.updateOverview`` reduce (``general/MapDetails.java:55-57``)
    over center cells, partial per batch then a tiny groupby."""
    from ray.data.aggregate import Sum

    span = SPAN - 1

    def cellify(lat_c, lon_c):
        la = np.clip(lat_c, 0, span)
        lo = np.clip(lon_c, 0, span)
        return (la >> OVERVIEW_SHIFT) * 8 + (lo >> OVERVIEW_SHIFT)

    def ev_part(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"].combine_chunks(), np.int64)
        lat, lon = event_points_np(eid)
        cell = cellify(lat, lon)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "kind": pa.array(np.zeros(len(uniq), np.int64), pa.int64()),
                "cell": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def li_part(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"].combine_chunks(), np.int64)
        pk = np.asarray(batch["l_partkey"].combine_chunks(), np.int64)
        sk = np.asarray(batch["l_suppkey"].combine_chunks(), np.int64)
        ln = np.asarray(batch["l_linenumber"].combine_chunks(), np.int64)
        x0, y0, x1, y1 = lineitem_segments_np(ok, pk, sk, ln)
        # map-unit bbox midpoint with Java truncating division
        lat_c = np.trunc((y0 + y1) / 2.0).astype(np.int64)
        lon_c = np.trunc((x0 + x1) / 2.0).astype(np.int64)
        cell = cellify(lat_c, lon_c)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "kind": pa.array(np.ones(len(uniq), np.int64), pa.int64()),
                "cell": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def od_part(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        cy, cx, r = order_triangles_np(ook)
        cell = cellify(cy, cx)
        uniq, cnt = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "kind": pa.array(np.full(len(uniq), 2, np.int64), pa.int64()),
                "cell": pa.array(uniq, pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    ev = _read(sf_dir, "events", ["event_id"]).map_batches(
        ev_part, batch_format="pyarrow", batch_size=None
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    ).map_batches(li_part, batch_format="pyarrow", batch_size=None)
    od = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        od_part, batch_format="pyarrow", batch_size=None
    )
    out = (
        ev.union(li, od)
        .groupby(["kind", "cell"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return out.astype("int64")


def q_label_prefix(sf_dir: str):
    """MDR prefix index analogue (``imgfmt/app/mdr/`` Mdr8/9 prefix
    sections): group labels by first letter → count + first label."""
    from ray.data.aggregate import Count, Min

    def add_prefix(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "prefix", pc.utf8_slice_codeunits(
                batch["p_name"].combine_chunks(), 0, 1
            )
        )

    out = (
        _read(sf_dir, "part", ["p_name"])
        .map_batches(add_prefix, batch_format="pyarrow", batch_size=None)
        .groupby("prefix")
        .aggregate(Count(alias_name="n"), Min("p_name", alias_name="first_name"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out


def q_sorted_top100(sf_dir: str):
    """Global collation-order index slice (``imgfmt/app/srt/Sort`` ordering
    of MDR records): distributed sort by (name, key), first 100 with dense
    rank — the rank column makes the order itself hash-checked."""
    ds = _read(sf_dir, "part", ["p_name", "p_partkey"]).sort(
        ["p_name", "p_partkey"]
    )
    top = ds.limit(100).to_pandas()
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["p_partkey"] = top["p_partkey"].astype("int64")
    return top


def q_collate_sort(sf_dir: str):
    """Codepage collation ordering (``imgfmt/app/srt/Sort.java``): labels
    with synthesized mixed case sort by the three-strength collation KEY
    (primary case-insensitive, tertiary lowercase-first) — distributed
    sort on the key column; the oracle mirrors the key semantics with
    (lower(name) ASC, name DESC) which is provably the same order for the
    case-pair alphabet. Rank column makes the order hash-checked."""
    import pyarrow.compute as pc

    from ..stages.collate import CollateKey

    def mixcase(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].combine_chunks().cast(pa.int64())
        nm = batch["p_name"].combine_chunks()
        even = pc.equal(pc.bit_wise_and(pk, 1), 0)
        name2 = pc.if_else(even, pc.utf8_upper(nm), nm)
        return pa.table({"p_partkey": pk, "name2": name2})

    ds = (
        _read(sf_dir, "part", ["p_partkey", "p_name"])
        .map_batches(mixcase, batch_format="pyarrow", batch_size=None)
        .map_batches(
            CollateKey("name2"), batch_format="pandas", batch_size=None
        )
        .sort(["collate_key", "p_partkey"])
        .limit(100)
    )
    top = ds.to_pandas()[["p_partkey", "name2"]]
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["p_partkey"] = top["p_partkey"].astype("int64")
    return top


def q_split_lines(sf_dir: str):
    """``LineSplitterFilter`` sizing (``filters/LineSplitterFilter.java:
    42-76``): per synthetic line of ``1 + o_orderkey % 600`` points, the
    number of ≤250-point chunks and total output points (chunks share
    boundary points). Closed form verified against the real range splitter
    in tests."""
    from ..stages.assemble import split_counts_np

    def fn(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        n = 1 + (ok % 600)
        parts, n_out = split_counts_np(n)
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "n_points": pa.array(n, pa.int64()),
                "n_parts": pa.array(parts, pa.int64()),
                "n_out_points": pa.array(n_out, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


PART_STYLE = """
# StyleTester-checkable style over part-derived tags
highway=ECONOMY & lanes>25          [0x01 resolution 16]
highway=ECONOMY                     [0x02 resolution 18]
highway=STANDARD | highway=PROMO    {set cls=mid} [0x03 resolution 20]
brand~'Brand#1[0-9]'                [0x04 resolution 22]
highway=* {name '${brand|subst:Brand#=>B}/${pname|part: :1|def:?}'} [0x05 resolution 24]
"""


def q_style_apply(sf_dir: str):
    """Style rule engine over part-derived tags (first-match-wins with a
    regex rule; ``osmstyle/RuleSet.java:79-110`` semantics) — compiled once
    per actor, vectorized per batch; oracle is the CASE-WHEN mirror."""
    from ..stages.stylestage import apply_style

    def to_str(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "p_partkey": batch["p_partkey"].combine_chunks().cast(pa.int64()),
                "hw": batch["p_type"].combine_chunks(),
                "lanes": pc.cast(batch["p_size"].combine_chunks(), pa.string()),
                "brand": batch["p_brand"].combine_chunks(),
                "pname": batch["p_name"].combine_chunks(),
            }
        )

    ds = _read(
        sf_dir, "part", ["p_partkey", "p_type", "p_size", "p_brand", "p_name"]
    ).map_batches(to_str, batch_format="pyarrow", batch_size=None)
    out = apply_style(
        ds, PART_STYLE,
        tag_columns={"highway": "hw", "lanes": "lanes", "brand": "brand",
                     "pname": "pname"},
        keep=["p_partkey"],
    ).to_pandas()
    out = out[["p_partkey", "gtype", "resolution", "name"]]
    out["name"] = out["name"].astype(object).where(out["name"].notna(), "")
    for c in ("p_partkey", "gtype", "resolution"):
        out[c] = out[c].astype("int64")
    return out


_STYLE_FIXTURE = {
    "teststyle/version": "1\n",
    "teststyle/info": "summary = 'loader fixture'\n",
    "teststyle/options": "levels = 0:24, 1:22\noverview-levels = 4:17\n",
    "teststyle/lines": (
        "# typed rule with an action\n"
        "highway=motorway {set fast=yes} [0x01 resolution 18]\n"
        "include 'inc/speed';\n"
        "if (lanes=4 | lanes=5) then\n"
        "highway=primary [0x02 resolution 20]\n"
        "else\n"
        "highway=primary [0x03 resolution 22]\n"
        "end\n"
        "include 'extra' from 'base';\n"
        "<finalize>\n"
        "highway=* [0x10 resolution 24]\n"
    ),
    "teststyle/inc/speed": "highway=track & lanes=1 [0x07 resolution 24]\n",
    "base/version": "1\n",
    "base/extra": "highway=track [0x08 resolution 23]\n",
}


def _write_style_fixture() -> str:
    """Materialize the deterministic loader fixture under /tmp (styles
    root with a main style + a sibling referenced by ``from``)."""
    import pathlib

    root = pathlib.Path("/tmp/mkgmap_ray_styles")
    for rel, content in _STYLE_FIXTURE.items():
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        if not p.exists() or p.read_text() != content:
            p.write_text(content)
    return str(root / "teststyle")


def q_style_file(sf_dir: str):
    """Style DIRECTORY loading end-to-end (``StyleFileLoader``/
    ``StyleImpl``/``RuleFileReader`` commands): version + options parsing,
    ``include`` splicing (same-dir and ``from`` a sibling style),
    ``if/else/end`` expansion via the synthetic-tag rewrite, and the
    ``<finalize>`` section split — the resolved rule text then runs
    through the normal vectorized style stage over orders-derived tags.
    Oracle is the closed-form CASE mirror of the resolved rule order."""
    from ..stages.stylestage import apply_style
    from ..style.loader import load_style

    sd = load_style(_write_style_fixture())
    assert sd.version == 1 and sd.levels == [(0, 24), (1, 22)]

    def to_tags(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        hw = np.where(
            ok % 4 == 0, "motorway", np.where(ok % 4 == 3, "track", "primary")
        )
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "hw": pa.array(hw.astype(object), pa.string()),
                "lanes": pa.array((ok % 6).astype(str), pa.string()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        to_tags, batch_format="pyarrow", batch_size=None
    )
    cols = {"highway": "hw", "lanes": "lanes"}
    styled = apply_style(ds, sd.rule_text["lines"], tag_columns=cols,
                         keep=["o_orderkey", "hw", "lanes"])

    def rename(batch: pa.Table) -> pa.Table:
        # the finalize pass re-emits gtype/resolution, so stash the main
        # pass's results under different names first
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "hw": batch["hw"],
                "lanes": batch["lanes"],
                "main_gtype": batch["gtype"],
                "main_res": batch["resolution"],
            }
        )

    fin = apply_style(
        styled.map_batches(rename, batch_format="pyarrow", batch_size=None),
        sd.finalize_text["lines"], tag_columns=cols,
        keep=["o_orderkey", "main_gtype", "main_res"],
    )
    out = fin.to_pandas()
    res = pd.DataFrame(
        {
            "o_orderkey": out["o_orderkey"],
            "gtype": out["main_gtype"],
            "resolution": out["main_res"],
            "fin_gtype": out["gtype"],
        }
    ).astype("int64")
    return res.sort_values("o_orderkey").reset_index(drop=True)


VALUE_FILTER_STYLE = (
    "ref=* {name "
    "'${ref|highway-symbol:box:6:6|def:-}"
    "/${country|country-ISO}"
    "/${ref|not-equal:int_ref|def:-}"
    "/${e|not-contained:;:exits|def:-}'} [0x1 resolution 24]\n"
)

_VF_COUNTRIES = ["Deutschland", "UK", "France", "Atlantis", "US", "Suomi"]


def q_value_filters(sf_dir: str):
    """Value-filter parity for the four round-2-missing filters
    (``osmstyle/actions/HighwaySymbolFilter.java:52-116``,
    ``CountryISOFilter.java:30-38``, ``NotEqualFilter.java:28-40``,
    ``NotContainedFilter.java:44-60``): closed-form tags from o_orderkey,
    one styled label chaining all four filters; oracle is the string-op
    mirror."""
    from ..stages.stylestage import apply_style

    def to_tags(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        m3 = ok % 3
        num = (ok % 100).astype(str)
        d = (ok % 10).astype(str)
        ref = np.where(
            m3 == 0,
            np.char.add("A ", num),
            np.where(
                m3 == 1,
                np.char.add(np.char.add("B", d), np.char.add(";C", d)),
                "LONGROADNAME99",
            ),
        )
        country = np.asarray(_VF_COUNTRIES, object)[ok % 6]
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "ref": pa.array(ref, pa.string()),
                "int_ref": pa.array(
                    np.where(ok % 5 == 0, ref, "X"), pa.string()
                ),
                "country": pa.array(country, pa.string()),
                "exits": pa.array(
                    np.where(ok % 4 == 0, "x;y", "y;z"), pa.string()
                ),
                "e": pa.array(np.full(len(ok), "x"), pa.string()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        to_tags, batch_format="pyarrow", batch_size=None
    )
    out = apply_style(
        ds, VALUE_FILTER_STYLE,
        tag_columns={c: c for c in
                     ("ref", "int_ref", "country", "exits", "e")},
        keep=["o_orderkey"],
    ).to_pandas()
    out = out[["o_orderkey", "name"]]
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    out["name"] = out["name"].astype(object)
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_poly_bool(sf_dir: str):
    """General polygon boolean ops (Martinez sweep,
    ``geom/polybool.py`` — the Java2D ``Area`` add/intersect/subtract/
    exclusiveOr analogue, ``util/Java2DConverter.java:50-263``):
    per-order rectangle pairs covering overlap / disjoint / nested /
    edge-touching cases; doubled result areas for all four ops, which
    the oracle reproduces with interval algebra."""
    from ..geom.polybool import (
        DIFFERENCE, INTERSECTION, UNION, XOR, boolean_op, rings_area2,
    )

    def per_batch(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        ok = ok[ok % 3 == 0]
        w = 4 + ok % 7
        h = 4 + ok % 5
        dx = ok % 10 - 2
        dy = ok % 8 - 2
        u = 3 + ok % 6
        v = 3 + ok % 4
        cols = {"inter2": [], "union2": [], "diff2": [], "xor2": []}
        for i in range(len(ok)):
            a = [[(0, 0), (int(w[i]), 0), (int(w[i]), int(h[i])),
                  (0, int(h[i]))]]
            b0x, b0y = int(dx[i]), int(dy[i])
            b = [[(b0x, b0y), (b0x + int(u[i]), b0y),
                  (b0x + int(u[i]), b0y + int(v[i])),
                  (b0x, b0y + int(v[i]))]]
            for col, op in (
                ("inter2", INTERSECTION), ("union2", UNION),
                ("diff2", DIFFERENCE), ("xor2", XOR),
            ):
                cols[col].append(
                    int(round(rings_area2(boolean_op(a, b, op))))
                )
        return pa.table(
            {"o_orderkey": pa.array(ok, pa.int64())}
            | {k: pa.array(np.asarray(val, np.int64), pa.int64())
               for k, val in cols.items()}
        )

    out = (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(per_batch, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_border_nodes(sf_dir: str):
    """Country-border routing-node check
    (``osmstyle/StyledConverter.java:628-726``): horizontal roads derived
    from o_orderkey against two vertical admin borders (x=50 full-height,
    x=75 lower-half); per road the crossing / snap-to-node / new-node
    counts and the summed intersection x — all reconstructable with
    interval logic in SQL."""
    import ray as _ray

    from ..stages.borders import BorderNodeCheck

    borders = [
        (np.array([0, 100000], np.int64), np.array([50, 50], np.int64)),
        (np.array([0, 50000], np.int64), np.array([75, 75], np.int64)),
    ]
    ref = _ray.put(borders)

    def to_roads(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        y = (ok * 7919) % 100000
        x0 = ok % 100
        x1 = x0 + 30 + ok % 40
        return pa.table(
            {
                "way_id": pa.array(ok, pa.int64()),
                "y1": pa.array(y, pa.int64()),
                "x1": pa.array(x0, pa.int64()),
                "y2": pa.array(y, pa.int64()),
                "x2": pa.array(x1, pa.int64()),
            }
        )

    out = (
        stateful_map_batches(
            _read(sf_dir, "orders", ["o_orderkey"])
            .map_batches(to_roads, batch_format="pyarrow", batch_size=None),
            BorderNodeCheck,
            fn_kwargs=dict(borders_ref=ref),
            batch_format="pyarrow",
            batch_size=None,
        )
        .to_pandas()
    )
    return out.sort_values("way_id").reset_index(drop=True)


# --- merge / ring assembly (group-local greedy, LineMergeFilter /
# --- MultiPolygonRelation.joinWays semantics) -------------------------------


def _chain_segments_table(ook: np.ndarray) -> pa.Table:
    """Per order: 3 chained 2-point segments P0→P1→P2→P3 with
    construction-unique coordinates (y = ok, x = ok*8+i), emitted in a
    scrambled deterministic order so merging has to do real work."""
    n = len(ook)
    seg_i = np.repeat(np.arange(3), n)
    ok_r = np.tile(ook, 3)
    y = ok_r
    x0 = ok_r * 8 + seg_i
    x1 = x0 + 1
    # scramble emission order deterministically
    order = np.argsort((ok_r * 31 + seg_i * 17) % 97, kind="stable")
    return pa.table(
        {
            "grp": pa.array(ok_r[order] % 64, pa.int64()),
            "way_id": pa.array(ok_r[order] * 4 + seg_i[order], pa.int64()),
            "y0": pa.array(y[order], pa.int64()),
            "x0": pa.array(x0[order], pa.int64()),
            "y1": pa.array(y[order], pa.int64()),
            "x1": pa.array(x1[order], pa.int64()),
        }
    )


def q_merge_chains(sf_dir: str):
    """Endpoint line merging (``filters/LineMergeFilter.java:59-117``) per
    group: each order contributes a 3-segment chain; after the group-local
    greedy merge every chain collapses to ONE line, so per group
    ``n_out = #orders`` and ``n_in = 3 × #orders`` — SQL-exact evidence
    that the merge actually merged."""
    from ..stages.merge import merge_lines

    def to_segments(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        return _chain_segments_table(ook)

    def merge_group(group: pa.Table) -> pa.Table:
        grp = int(group["grp"][0].as_py())
        y0 = np.asarray(group["y0"].combine_chunks(), np.int64)
        x0 = np.asarray(group["x0"].combine_chunks(), np.int64)
        y1 = np.asarray(group["y1"].combine_chunks(), np.int64)
        x1 = np.asarray(group["x1"].combine_chunks(), np.int64)
        lines = [
            (np.asarray([y0[i], y1[i]]), np.asarray([x0[i], x1[i]]))
            for i in range(len(y0))
        ]
        merged = merge_lines(lines)
        return pa.table(
            {
                "grp": pa.array([grp], pa.int64()),
                "n_in": pa.array([len(lines)], pa.int64()),
                "n_out": pa.array([len(merged)], pa.int64()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        to_segments, batch_format="pyarrow", batch_size=None
    )
    out = ds.groupby("grp").map_groups(
        merge_group, batch_format="pyarrow"
    ).to_pandas()
    return out.sort_values("grp").reset_index(drop=True).astype("int64")


def q_ring_assembly(sf_dir: str):
    """Ring assembly (``MultiPolygonRelation.joinWays``,
    ``MultiPolygonRelation.java:182-380``): each order's 3 triangle edges
    (scrambled, some reversed) must join into exactly one CLOSED ring of 3
    distinct vertices — SQL-exact per order."""
    from ..stages.merge import join_ways

    def fn(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        n_rings = np.empty(len(ook), np.int64)
        ring_pts = np.empty(len(ook), np.int64)
        closed = np.empty(len(ook), np.int64)
        for i, ok in enumerate(ook):
            # triangle vertices (unique per order by construction)
            v = [(int(ok), int(ok) * 4 + k) for k in range(3)]
            edges = [
                (np.asarray([v[0][0], v[1][0]]), np.asarray([v[0][1], v[1][1]])),
                (np.asarray([v[1][0], v[2][0]]), np.asarray([v[1][1], v[2][1]])),
                (np.asarray([v[2][0], v[0][0]]), np.asarray([v[2][1], v[0][1]])),
            ]
            # scramble + reverse one edge deterministically
            if ok % 2:
                edges[1] = (edges[1][0][::-1], edges[1][1][::-1])
            rot = int(ok % 3)
            edges = edges[rot:] + edges[:rot]
            rings = join_ways(edges)
            n_rings[i] = len(rings)
            ring_pts[i] = len(rings[0][0]) if rings else 0
            closed[i] = int(bool(rings and rings[0][2]))
        return pa.table(
            {
                "o_orderkey": pa.array(ook, pa.int64()),
                "n_rings": pa.array(n_rings, pa.int64()),
                "ring_pts": pa.array(ring_pts, pa.int64()),
                "closed": pa.array(closed, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


# --- OSM XML source / node degree / driving side ----------------------------


_HIGHWAY_CYCLE = ("motorway", "residential", "path")
_AMENITY_CYCLE = ("cafe", "bank", "fuel")


def _osm_full_model(sf_dir: str):
    """Deterministic full OSM element model derived from events (ids are
    contiguous 0..N-1): nodes for every event (amenity tag on id%5==0),
    ways of 4 consecutive nodes (highway cycling by wid%3, oneway=yes on
    wid%4==0), relations of 2 consecutive ways + a via node (every 64
    events). Every rule has a DuckDB closed form over events."""
    import pyarrow.parquet as pq

    ev = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id"])
    eid = np.sort(np.asarray(ev["event_id"], np.int64))
    lat, lon = event_points_np(eid)
    node_tags = {
        int(i): {"amenity": _AMENITY_CYCLE[int(i) % 3]}
        for i in eid[eid % 5 == 0]
    }
    n = len(eid)
    wids = np.arange(n // 4, dtype=np.int64)
    ways = [(int(w), [int(4 * w + j) for j in range(4)]) for w in wids]
    way_tags = {}
    for w in wids:
        t = {"highway": _HIGHWAY_CYCLE[int(w) % 3]}
        if int(w) % 4 == 0:
            t["oneway"] = "yes"
        way_tags[int(w)] = t
    rids = np.arange(n // 64, dtype=np.int64)

    def rel_tags(r: int) -> dict:
        if r % 2 == 0:
            return {"type": "multipolygon"}
        return {
            "type": "route",
            "route": "bicycle" if r % 4 == 1 else "bus",
            "ref": f"R{r}",
        }

    relations = [
        (
            int(r),
            [("way", int(16 * r), "outer"), ("way", int(16 * r + 1), "inner"),
             ("node", int(64 * r), "via")],
            rel_tags(int(r)),
        )
        for r in rids
    ]
    return eid, lat, lon, node_tags, ways, way_tags, relations


def _write_osm_shards(sf_dir: str, out: str, ext: str, writer,
                      n_shards: int = 8) -> list[str]:
    import os

    paths = [f"{out}/shard{s}.{ext}" for s in range(n_shards)]
    if os.path.exists(f"{out}/_done"):
        return paths
    os.makedirs(out, exist_ok=True)
    eid, lat, lon, node_tags, ways, way_tags, relations = _osm_full_model(
        sf_dir
    )
    for s in range(n_shards):
        m = (eid % n_shards) == s
        sw = [w for w in ways if w[0] % n_shards == s]
        sr = [r for r in relations if r[0] % n_shards == s]
        writer(
            paths[s], eid[m], lat[m], lon[m],
            ways=sw,
            tags={k: v for k, v in node_tags.items() if k % n_shards == s},
            way_tags={w: t for w, t in way_tags.items()
                      if w % n_shards == s},
            relations=sr,
        )
    with open(f"{out}/_done", "w") as f:
        f.write("ok")
    return paths


def _osm_fixture_dir(sf_dir: str, n_shards: int = 8) -> list[str]:
    """Write (once, cached) deterministic full-model .osm shards derived
    from events — the ``ElementTestDataSource`` analogue feeding the XML
    source reader. Members may cross shard files (realistic: resolution
    requires the distributed join)."""
    import os

    from ..sources.osmxml import write_osm_xml

    name = os.path.basename(sf_dir.rstrip("/"))
    return _write_osm_shards(
        sf_dir, f"/tmp/mkgmap_ray_osm_v3_{name}", "osm", write_osm_xml,
        n_shards,
    )


def _pbf_fixture_dir(sf_dir: str, n_shards: int = 8) -> list[str]:
    """Same full model written as .osm.pbf binary shards (DenseNodes delta
    coding, string tables) — feeds the from-scratch PBF reader."""
    import os

    from ..sources.pbf import write_pbf

    name = os.path.basename(sf_dir.rstrip("/"))
    return _write_osm_shards(
        sf_dir, f"/tmp/mkgmap_ray_pbf_v3_{name}", "pbf", write_pbf, n_shards
    )


def q_osm_roundtrip(sf_dir: str):
    """OSM XML source reader end-to-end (``OsmXmlHandler`` semantics with
    ``Utils.toMapUnit`` coordinate conversion): events → .osm shards →
    ``read_binary_files`` + streaming parse → per-shard aggregates that
    must match the closed forms computed straight from events in SQL —
    bit-exact round-trip of every coordinate through XML degrees."""
    from ray.data.aggregate import Sum

    from ..sources.osmxml import read_osm_nodes

    paths = _osm_fixture_dir(sf_dir)
    ds = read_osm_nodes(paths)

    def partial(batch: pa.Table) -> pa.Table:
        nid = np.asarray(batch["id"].combine_chunks(), np.int64)
        lat = np.asarray(batch["lat_mu"].combine_chunks(), np.int64)
        lon = np.asarray(batch["lon_mu"].combine_chunks(), np.int64)
        shard = nid % 8
        uniq, inv = np.unique(shard, return_inverse=True)

        def agg(v):
            return pa.array(
                np.bincount(inv, weights=v, minlength=len(uniq)).astype(np.int64),
                pa.int64(),
            )

        return pa.table(
            {
                "shard": pa.array(uniq, pa.int64()),
                "n_nodes": agg(np.ones(len(nid), np.int64)),
                "sum_lat_mu": agg(lat),
                "sum_lon_mu": agg(lon),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("shard")
        .aggregate(
            Sum("n_nodes", alias_name="n_nodes"),
            Sum("sum_lat_mu", alias_name="sum_lat_mu"),
            Sum("sum_lon_mu", alias_name="sum_lon_mu"),
        )
        .to_pandas()
    )
    return out.astype("int64")


OSM_WAY_STYLE = """
# rules driven by tags PARSED from OSM input (not synthetic columns)
highway=motorway                    [0x01 resolution 16]
highway=residential & oneway=yes    [0x06 resolution 22]
highway=residential                 [0x05 resolution 22]
highway=path                        [0x16 resolution 23]
"""


def _osm_parquet_tables(sf_dir: str) -> dict:
    """Parse the XML fixture shards ONCE into columnar parquet (cached),
    then serve each element table as a read_parquet Dataset — the
    parse-once-store-columnar shape a real pipeline uses (SURVEY.md §2.1
    "pre-converted Lance/Parquet"); queries about joins shouldn't re-pay
    the XML parse per consumed table."""
    import os

    import pyarrow.parquet as _pq
    import ray.data as rd

    from ..sources.osmxml import parse_osm_bytes

    paths = _osm_fixture_dir(sf_dir)
    name = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/mkgmap_ray_osmpq_v3_{name}"
    if not os.path.exists(f"{out}/_done"):
        os.makedirs(out, exist_ok=True)
        for i, p in enumerate(paths):
            tables = parse_osm_bytes(open(p, "rb").read())
            for tname, t in zip(("nodes", "ways", "relations"), tables):
                os.makedirs(f"{out}/{tname}", exist_ok=True)
                _pq.write_table(t, f"{out}/{tname}/shard{i}.parquet")
        with open(f"{out}/_done", "w") as f:
            f.write("ok")
    return {
        t: rd.read_parquet(f"{out}/{t}")
        for t in ("nodes", "ways", "relations")
    }


def q_osm_way_tags(sf_dir: str):
    """Way tags parsed from OSM XML (``OsmXmlHandler`` emitting full
    key/value pairs, ``OsmXmlHandler.java:52-258``): per-highway-class
    way counts / id sums / oneway counts — the closed-form oracle
    recomputes the deterministic fixture rules from events."""
    from ray.data.aggregate import Sum

    from ..sources.osmxml import read_osm_table, tag_column

    ds = read_osm_table(_osm_fixture_dir(sf_dir), "ways")

    def partial(batch: pa.Table) -> pd.DataFrame:
        hw = tag_column(batch, "highway").to_pandas()
        ow = tag_column(batch, "oneway").to_pandas()
        wid = np.asarray(batch["id"].combine_chunks(), np.int64)
        nrefs = np.asarray(batch["n_refs"].combine_chunks(), np.int64)
        df = pd.DataFrame(
            {
                "highway": hw,
                "n_ways": np.ones(len(wid), np.int64),
                "sum_wid": wid,
                "n_oneway": (ow == "yes").to_numpy(dtype=np.int64),
                "sum_refs": nrefs,
            }
        )
        return df.groupby("highway", as_index=False).sum()

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("highway")
        .aggregate(
            Sum("n_ways", alias_name="n_ways"),
            Sum("sum_wid", alias_name="sum_wid"),
            Sum("n_oneway", alias_name="n_oneway"),
            Sum("sum_refs", alias_name="sum_refs"),
        )
        .to_pandas()
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    return out


def q_osm_relation_resolve(sf_dir: str):
    """Relation→member resolution (``ElementSaver.java:140-165,339-352``):
    relations' WAY members resolve through the ways table to node refs,
    then through the nodes table to coordinates — a distributed two-hop
    join (members cross shard files by construction). Both hops use the
    salted union+groupby join; per-relation (n_nodes, sum_lat_mu) out."""
    from ray.data.aggregate import Sum

    from ..sources.osmxml import MEMBER_WAY

    rels, ways, nodes = (
        _osm_parquet_tables(sf_dir)[t] for t in ("relations", "ways", "nodes")
    )

    def rel_side(batch: pa.Table) -> pa.Table:
        types = batch["member_types"].combine_chunks()
        refs = batch["member_refs"].combine_chunks()
        rid = np.asarray(batch["id"].combine_chunks(), np.int64)
        offs = types.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = offs[1:] - offs[:-1]
        parent = np.repeat(np.arange(len(rid)), counts)
        ft = np.asarray(types.flatten(), np.int64)
        fr = np.asarray(refs.flatten(), np.int64)
        m = ft == MEMBER_WAY
        return pa.table(
            {
                "key": pa.array(fr[m], pa.int64()),  # way id
                "rid": pa.array(rid[parent[m]], pa.int64()),
                "ref": pa.array(np.zeros(m.sum(), np.int64), pa.int64()),
                # explicit row kind (0 = relation-wants-way, 1 = way-refs)
                # instead of sign sentinels, so negative ids/coords in real
                # OSM data can't be silently dropped (round-2 ADVICE)
                "kind": pa.array(np.zeros(m.sum(), np.int8), pa.int8()),
            }
        )

    def way_side(batch: pa.Table) -> pa.Table:
        refs = batch["refs"].combine_chunks()
        wid = np.asarray(batch["id"].combine_chunks(), np.int64)
        offs = refs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = offs[1:] - offs[:-1]
        parent = np.repeat(np.arange(len(wid)), counts)
        n_flat = int(counts.sum())
        return pa.table(
            {
                "key": pa.array(wid[parent], pa.int64()),
                "rid": pa.array(np.zeros(n_flat, np.int64), pa.int64()),
                "ref": pa.array(
                    np.asarray(refs.flatten(), np.int64), pa.int64()
                ),
                "kind": pa.array(np.ones(n_flat, np.int8), pa.int8()),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["key"].combine_chunks(), np.int64)
        return batch.append_column("part", pa.array(k & 255, pa.int64()))

    def hop1(g: pd.DataFrame) -> pd.DataFrame:
        # per way id: relations-wanting-it × its node refs — ONE pandas
        # merge per partition (vectorized), no per-key Python loop
        rels_side = g.loc[g["kind"] == 0, ["key", "rid"]]
        refs_side = g.loc[g["kind"] == 1, ["key", "ref"]]
        hit = rels_side.merge(refs_side, on="key")
        return pd.DataFrame(
            {
                "key": hit["ref"].to_numpy(np.int64),  # node id for hop 2
                "rid": hit["rid"].to_numpy(np.int64),
                "lat_mu": np.zeros(len(hit), np.int64),
                "kind": np.zeros(len(hit), np.int8),
            }
        )

    def node_side(batch: pa.Table) -> pa.Table:
        nid = np.asarray(batch["id"].combine_chunks(), np.int64)
        lat = np.asarray(batch["lat_mu"].combine_chunks(), np.int64)
        return pa.table(
            {
                "key": pa.array(nid, pa.int64()),
                "rid": pa.array(np.zeros(len(nid), np.int64), pa.int64()),
                "lat_mu": pa.array(lat, pa.int64()),
                "kind": pa.array(np.ones(len(nid), np.int8), pa.int8()),
            }
        )

    def hop2(g: pd.DataFrame) -> pd.DataFrame:
        # per node id: attach lat to every rid wanting it (merge), then
        # partial-aggregate per relation
        lat_rows = g.loc[g["kind"] == 1, ["key", "lat_mu"]].drop_duplicates(
            "key"
        )
        want = g.loc[g["kind"] == 0, ["key", "rid"]]
        hit = want.merge(lat_rows, on="key")
        df = pd.DataFrame(
            {
                "rid": hit["rid"].to_numpy(np.int64),
                "n_nodes": np.ones(len(hit), np.int64),
                "sum_lat_mu": hit["lat_mu"].to_numpy(np.int64),
            }
        )
        return df.groupby("rid", as_index=False).sum()

    hop1_out = (
        rels.map_batches(rel_side, batch_format="pyarrow", batch_size=None)
        .union(
            ways.map_batches(way_side, batch_format="pyarrow", batch_size=None)
        )
        .map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(hop1, batch_format="pandas")
    )
    out = (
        hop1_out.union(
            nodes.map_batches(
                node_side, batch_format="pyarrow", batch_size=None
            )
        )
        .map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(hop2, batch_format="pandas")
        .to_pandas()
    )
    # hop2 emits per-partition per-relation partials (≤ parts × relations
    # rows) — final combine on the driver, no third shuffle
    out = out.groupby("rid", as_index=False)[["n_nodes", "sum_lat_mu"]].sum()
    return out.sort_values("rid").reset_index(drop=True).astype("int64")


def q_osm_tags_style(sf_dir: str):
    """Style rule engine driven by tags PARSED from OSM XML input (round 1
    only ever styled synthetic columns): highway/oneway extracted from the
    parsed way tag lists → compiled RuleSet → per-gtype way counts."""
    from ray.data.aggregate import Sum

    from ..sources.osmxml import read_osm_table, tag_column
    from ..stages.stylestage import apply_style

    ds = read_osm_table(_osm_fixture_dir(sf_dir), "ways")

    def to_cols(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "wid": batch["id"].combine_chunks(),
                "hw": tag_column(batch, "highway"),
                "ow": tag_column(batch, "oneway"),
            }
        )

    styled = apply_style(
        ds.map_batches(to_cols, batch_format="pyarrow", batch_size=None),
        OSM_WAY_STYLE,
        tag_columns={"highway": "hw", "oneway": "ow"},
        keep=["wid"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "gtype": np.asarray(
                    batch["gtype"].combine_chunks(), np.int64
                ),
                "n_ways": 1,
                "sum_wid": np.asarray(
                    batch["wid"].combine_chunks(), np.int64
                ),
            }
        )
        return df.groupby("gtype", as_index=False).sum()

    out = (
        styled.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("gtype")
        .aggregate(
            Sum("n_ways", alias_name="n_ways"),
            Sum("sum_wid", alias_name="sum_wid"),
        )
        .to_pandas()
    )
    return out.sort_values("gtype").reset_index(drop=True).astype("int64")


RELATION_APPLY_STYLE = """
type=route & route=bicycle { apply role=outer { set ncn=yes; add rref='$(ref)' } }
type=route { apply_once { add rel_seen=yes; set marker='route_${highway}' } }
type=multipolygon { apply role=inner { set is_inner=yes } }
"""


def q_relation_apply(sf_dir: str):
    """Style ``apply`` action + RelationStyleHook: relation rules push
    tags to member ways before way-rule matching — the one style-language
    feature round 2 lacked (``osmstyle/actions/SubAction.java:46-71``,
    ``reader/osm/RelationStyleHook.java:41-50``). Exercises role filters,
    ``apply_once``, member-scope ``${highway}`` substitution and
    relation-scope ``$(ref)`` shipping. Output: every way with the
    tags its member patches produced (ints/strings, SQL-exact)."""
    from ..sources.osmxml import MEMBER_WAY, tag_column
    from ..stages.relstyle import (
        apply_patches,
        member_ref_tags,
        relation_patches,
    )
    from ..style.rules import compile_style

    tabs = _osm_parquet_tables(sf_dir)
    rels, ways = tabs["relations"], tabs["ways"]
    rs = compile_style(RELATION_APPLY_STYLE)

    patches = rels.map_batches(
        lambda b: relation_patches(b, rs),
        batch_format="pyarrow", batch_size=None,
    )
    need = member_ref_tags(rs)  # member tags read by ${} substitutions

    def way_side(batch: pa.Table) -> pa.Table:
        cols = {"id": batch["id"].combine_chunks()}
        for t in need:
            cols[t] = tag_column(batch, t)
        return pa.table(cols)

    members = ways.map_batches(
        way_side, batch_format="pyarrow", batch_size=None
    )
    out = apply_patches(
        members, patches, rs, member_tag_cols=need,
        member_type=MEMBER_WAY,
    ).to_pandas()

    def flag(col: pd.Series) -> pd.Series:
        return col.astype("string").eq("yes").fillna(False).astype("int64")

    def text(col: pd.Series) -> pd.Series:
        return col.astype(object).where(col.notna(), "")

    res = pd.DataFrame(
        {
            "wid": out["id"].astype("int64"),
            "ncn": flag(out["ncn"]),
            "rref": text(out["rref"]),
            "rel_seen": flag(out["rel_seen"]),
            "marker": text(out["marker"]),
            "is_inner": flag(out["is_inner"]),
        }
    )
    return res.sort_values("wid").reset_index(drop=True)


def _o5m_fixture_dir(sf_dir: str, n_shards: int = 8) -> list[str]:
    """Same full model written as .o5m binary shards (delta coding,
    string-reference ring) — feeds the from-scratch o5m reader."""
    import os

    from ..sources.o5m import write_o5m

    name = os.path.basename(sf_dir.rstrip("/"))
    return _write_osm_shards(
        sf_dir, f"/tmp/mkgmap_ray_o5m_v3_{name}", "o5m", write_o5m, n_shards
    )


def _binary_roundtrip(paths: list[str], parser):
    """Shared per-shard aggregate over all three element tables of a
    binary OSM source (counts + coordinate/ref sums keyed by id % 8).
    Each shard is parsed ONCE and all three element partials come out of
    that single decode — the previous shape built three Datasets over the
    same files, paying the binary decode three times per shard."""
    from ray.data.aggregate import Sum

    def node_partial(batch: pa.Table) -> pd.DataFrame:
        nid = np.asarray(batch["id"].combine_chunks(), np.int64)
        df = pd.DataFrame(
            {
                "shard": nid % 8,
                "n_nodes": 1,
                "sum_lat_mu": np.asarray(
                    batch["lat_mu"].combine_chunks(), np.int64
                ),
                "sum_lon_mu": np.asarray(
                    batch["lon_mu"].combine_chunks(), np.int64
                ),
                "n_ways": 0, "sum_refs": 0, "n_rels": 0, "sum_mem": 0,
            }
        )
        return df.groupby("shard", as_index=False).sum()

    def way_partial(batch: pa.Table) -> pd.DataFrame:
        wid = np.asarray(batch["id"].combine_chunks(), np.int64)
        refs = batch["refs"].combine_chunks()
        offs = refs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        fr = np.asarray(refs.flatten(), np.int64)
        ref_sums = np.add.reduceat(fr, offs[:-1]) if len(fr) else np.zeros(
            len(wid), np.int64
        )
        ref_sums = np.where(offs[1:] > offs[:-1], ref_sums, 0)
        df = pd.DataFrame(
            {
                "shard": wid % 8,
                "n_nodes": 0, "sum_lat_mu": 0, "sum_lon_mu": 0,
                "n_ways": 1,
                "sum_refs": ref_sums,
                "n_rels": 0, "sum_mem": 0,
            }
        )
        return df.groupby("shard", as_index=False).sum()

    def rel_partial(batch: pa.Table) -> pd.DataFrame:
        rid = np.asarray(batch["id"].combine_chunks(), np.int64)
        refs = batch["member_refs"].combine_chunks()
        offs = refs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        fr = np.asarray(refs.flatten(), np.int64)
        mem_sums = np.add.reduceat(fr, offs[:-1]) if len(fr) else np.zeros(
            len(rid), np.int64
        )
        mem_sums = np.where(offs[1:] > offs[:-1], mem_sums, 0)
        df = pd.DataFrame(
            {
                "shard": rid % 8,
                "n_nodes": 0, "sum_lat_mu": 0, "sum_lon_mu": 0,
                "n_ways": 0, "sum_refs": 0,
                "n_rels": 1,
                "sum_mem": mem_sums,
            }
        )
        return df.groupby("shard", as_index=False).sum()

    cols = ["n_nodes", "sum_lat_mu", "sum_lon_mu", "n_ways", "sum_refs",
            "n_rels", "sum_mem"]

    def parse_partial(batch: pa.Table) -> pd.DataFrame:
        frames = []
        for payload in batch["bytes"]:
            nodes, ways, rels = parser(payload.as_py())
            frames.append(node_partial(nodes))
            frames.append(way_partial(ways))
            frames.append(rel_partial(rels))
        if not frames:
            return pd.DataFrame(
                {"shard": pd.Series([], dtype=np.int64)}
                | {c: pd.Series([], dtype=np.int64) for c in cols}
            )
        df = pd.concat(frames, ignore_index=True)
        return df.groupby("shard", as_index=False).sum()

    ds = _rd().read_binary_files(paths).map_batches(
        parse_partial, batch_format="pyarrow", batch_size=None
    )
    out = (
        ds.groupby("shard")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
    )
    return out.sort_values("shard").reset_index(drop=True).astype("int64")


def q_pbf_roundtrip(sf_dir: str):
    """OSM PBF binary reader end-to-end (``OsmBinHandler.java:38-178``
    semantics: Blob framing + zlib, string tables, DenseNodes delta
    decode, delta way refs / relation memids — decoded from scratch, no
    protobuf library): per-shard aggregates over all three element tables
    must match closed forms from events."""
    from ..sources.pbf import parse_pbf_bytes

    return _binary_roundtrip(_pbf_fixture_dir(sf_dir), parse_pbf_bytes)


def q_o5m_roundtrip(sf_dir: str):
    """o5m binary reader end-to-end (``O5mBinHandler.java:35-99``
    semantics: low-bit-sign varints, delta ids/coords/refs, 15000-entry
    string-reference ring, relation member type-digit roles): same
    per-shard closed forms as the PBF path."""
    from ..sources.o5m import parse_o5m_bytes

    return _binary_roundtrip(_o5m_fixture_dir(sf_dir), parse_o5m_bytes)


def q_node_degree(sf_dir: str):
    """Junction-degree counting (``StyledConverter.setHighwayCounts``,
    ``StyledConverter.java:1999-2043``): explode segment endpoints →
    per-coordinate degree → degree histogram. Pre-aggregated per batch
    before each of the two shuffles."""
    from ray.data.aggregate import Sum

    def endpoints(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"].combine_chunks(), np.int64)
        pk = np.asarray(batch["l_partkey"].combine_chunks(), np.int64)
        sk = np.asarray(batch["l_suppkey"].combine_chunks(), np.int64)
        ln = np.asarray(batch["l_linenumber"].combine_chunks(), np.int64)
        x0, y0, x1, y1 = lineitem_segments_np(ok, pk, sk, ln)
        key = np.concatenate(
            [(y0 + 8192) * (1 << 18) + (x0 + 8192),
             (y1 + 8192) * (1 << 18) + (x1 + 8192)]
        )
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {"key": pa.array(uniq, pa.int64()),
             "n": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    from ..stages.combine import combine_partials

    parts = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
    ).map_batches(endpoints, batch_format="pyarrow", batch_size=None)
    # partials are bounded by distinct coordinates x blocks; the final
    # histogram is tiny
    c = combine_partials(parts, "key", ["n"])
    uniq, cnt = np.unique(c["n"], return_counts=True)
    return pd.DataFrame(
        {"degree": uniq, "n_nodes": cnt.astype(np.int64)}
    ).astype("int64")


def q_driving_side(sf_dir: str):
    """Global majority vote (``StyledConverter.calcDrivingSide``,
    ``StyledConverter.java:884-919``): count left/right evidence, emit the
    winning side — a whole-dataset aggregate reduced from per-batch
    partials."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        rf = batch["l_returnflag"].combine_chunks().to_pylist()
        left = sum(1 for v in rf if v == "R")
        return pa.table(
            {
                "n_left": pa.array([left], pa.int64()),
                "n_right": pa.array([len(rf) - left], pa.int64()),
            }
        )

    agg = (
        _read(sf_dir, "lineitem", ["l_returnflag"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .aggregate(Sum("n_left"), Sum("n_right"))
    )
    n_left = int(agg["sum(n_left)"])
    n_right = int(agg["sum(n_right)"])
    return pd.DataFrame(
        {
            "n_left": [n_left],
            "n_right": [n_right],
            "side": ["left" if n_left > n_right else "right"],
        }
    )


def q_road_merge(sf_dir: str):
    """Road merging with attribute + angle checks (``osmstyle/RoadMerger``,
    ``RoadMerger.java:270-360``): per order, a 3-segment collinear chain of
    one road class (merges 3→1), a near-U-turn pair (angle > 130° → stays
    2), and a collinear pair with differing speed (stays 2) — so each
    order's 7 segments must yield exactly 5 roads, SQL-exact per group."""
    from ..stages.merge import merge_roads

    def merge_group(group: pa.Table) -> pa.Table:
        grp = int(group["grp"][0].as_py())
        n_in = group.num_rows
        y0 = np.asarray(group["y0"].combine_chunks(), np.int64)
        x0 = np.asarray(group["x0"].combine_chunks(), np.int64)
        y1 = np.asarray(group["y1"].combine_chunks(), np.int64)
        x1 = np.asarray(group["x1"].combine_chunks(), np.int64)
        attrs = group["attrs"].combine_chunks().to_pylist()
        roads = [
            (np.asarray([y0[i], y1[i]]), np.asarray([x0[i], x1[i]]), attrs[i])
            for i in range(n_in)
        ]
        merged = merge_roads(roads)
        return pa.table(
            {
                "grp": pa.array([grp], pa.int64()),
                "n_in": pa.array([n_in], pa.int64()),
                "n_out": pa.array([len(merged)], pa.int64()),
            }
        )

    def to_segments(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        n = len(ook)
        rows = {"grp": [], "attrs": [], "y0": [], "x0": [], "y1": [], "x1": []}

        def add(ok, attrs, y0, x0, y1, x1):
            rows["grp"].append(ok % 64)
            rows["attrs"].append(attrs)
            rows["y0"].append(y0)
            rows["x0"].append(x0)
            rows["y1"].append(y1)
            rows["x1"].append(x1)

        for ok in ook:
            ok = int(ok)
            base = ok * 16
            # A: collinear 3-chain, class c0 → merges to 1
            for i in range(3):
                add(ok, "c0", base, 1000 * i, base, 1000 * (i + 1))
            # B: near-U-turn (deflection ≈ 180° > 130°) → stays 2
            add(ok, "c0", base + 4, 0, base + 4, 1000)
            add(ok, "c0", base + 4, 1000, base + 5, 1)
            # C: collinear but different class → stays 2
            add(ok, "c0", base + 8, 0, base + 8, 1000)
            add(ok, "c1", base + 8, 1000, base + 8, 2000)
        return pa.table(
            {
                "grp": pa.array(rows["grp"], pa.int64()),
                "attrs": pa.array(rows["attrs"], pa.string()),
                "y0": pa.array(rows["y0"], pa.int64()),
                "x0": pa.array(rows["x0"], pa.int64()),
                "y1": pa.array(rows["y1"], pa.int64()),
                "x1": pa.array(rows["x1"], pa.int64()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        to_segments, batch_format="pyarrow", batch_size=None
    )
    out = ds.groupby("grp").map_groups(
        merge_group, batch_format="pyarrow"
    ).to_pandas()
    return out.sort_values("grp").reset_index(drop=True).astype("int64")


def _mp_fixture_dir(sf_dir: str, n_shards: int = 8) -> list[str]:
    """Write (once, cached) deterministic .mp shards from orders: one
    polyline per order with closed-form coords + type."""
    import os
    import pyarrow.parquet as pq

    from ..sources.polish import write_mp

    name = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/mkgmap_ray_mp_{name}"
    paths = [f"{out}/shard{s}.mp" for s in range(n_shards)]
    if os.path.exists(f"{out}/_done"):
        return paths
    os.makedirs(out, exist_ok=True)
    od = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    ook = np.asarray(od["o_orderkey"], np.int64)
    for s in range(n_shards):
        els = []
        for ok in ook[(ook % n_shards) == s]:
            ok = int(ok)
            y0 = (ok * A_LAT) % SPAN
            x0 = (ok * A_LON) % SPAN
            els.append(
                {
                    "kind": 1,
                    "type": 1 + ok % 0x3F,
                    "label": f"ORD{ok}",
                    "level": ok % 4,
                    "lat_mu": [y0, y0 + 100],
                    "lon_mu": [x0, x0 + 100],
                }
            )
        write_mp(paths[s], els)
    with open(f"{out}/_done", "w") as f:
        f.write("ok")
    return paths


def _mp_full_fixture_dir(sf_dir: str, n_shards: int = 8) -> list[str]:
    """Richer .mp shards exercising the FULL PolishMapDataSource model:
    header level table + metric elevation, roads with RouteParam /
    Nod / Numbers / EndLevel, contour lines (metric label -> feet),
    POIs with address fields, polygons. All values closed-form from
    o_orderkey so a SQL oracle can reconstruct them."""
    import os
    import pyarrow.parquet as pq

    from ..sources.polish import write_mp

    name = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/mkgmap_ray_mpfull_v2_{name}"
    paths = [f"{out}/shard{s}.mp" for s in range(n_shards)]
    if os.path.exists(f"{out}/_done"):
        return paths
    os.makedirs(out, exist_ok=True)
    od = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    ook = np.asarray(od["o_orderkey"], np.int64)
    header = {"levels": [24, 22, 20, 18], "elevation": "M"}
    for s in range(n_shards):
        els = []
        for ok in ook[(ook % n_shards) == s]:
            ok = int(ok)
            y0 = (ok * A_LAT) % SPAN
            x0 = (ok * A_LON) % SPAN
            els.append(
                {
                    "kind": 1, "type": 1 + ok % 31, "label": f"R{ok}",
                    "level": ok % 2, "endlevel": ok % 3, "road_id": ok,
                    "route_param": (
                        f"{ok % 10},{ok % 6},{ok % 2},{(ok // 2) % 2},"
                        f"1,0,{ok % 2}"
                    ),
                    "nod": [f"0,{1000 + ok},0", f"2,{2000 + ok},1"],
                    "numbers": [
                        f"{i},O,{1 + ok % 7},{9 + ok % 7},"
                        f"E,{2 + ok % 5},{8 + ok % 5}"
                        for i in range(ok % 3)
                    ],
                    "lat_mu": [y0, y0 + 100], "lon_mu": [x0, x0 + 100],
                }
            )
            if ok % 5 == 0:
                els.append(
                    {"kind": 1, "type": 0x20, "label": str(ok % 997),
                     "level": 0, "lat_mu": [y0, y0 + 50],
                     "lon_mu": [x0, x0 + 50]}
                )
            if ok % 3 == 0:
                els.append(
                    {"kind": 0, "type": 0x2A, "label": f"P{ok}",
                     "city": f"C{ok % 10}", "zip": f"{10000 + ok % 90}",
                     "street": "Main", "house": str(1 + ok % 50),
                     "level": 0, "lat_mu": [y0], "lon_mu": [x0]}
                )
            if ok % 4 == 0:
                els.append(
                    {"kind": 2, "type": 0x50, "level": ok % 2,
                     "lat_mu": [y0, y0 + 80, y0 + 80, y0],
                     "lon_mu": [x0, x0, x0 + 80, x0 + 80]}
                )
        write_mp(paths[s], els, header=header)
    with open(f"{out}/_done", "w") as f:
        f.write("ok")
    return paths


def q_mp_sections(sf_dir: str):
    """Full Polish-format model end-to-end (header level table, EndLevel
    resolutions, RouteParam clamping + denied-vehicle bits, Nod/Numbers,
    metric contour labels, POI address fields, polygons —
    ``PolishMapDataSource.java:356-682`` + ``RoadHelper.java:74-130``):
    per-type aggregates the oracle reconstructs from orders."""
    from ray.data.aggregate import Sum

    from ..sources.polish import read_mp

    paths = _mp_full_fixture_dir(sf_dir)
    ds = read_mp(paths)

    def list_sums(col: pa.ChunkedArray) -> np.ndarray:
        ca = col.combine_chunks()
        vals = np.asarray(ca.values, np.int64)
        offs = np.asarray(ca.offsets, np.int64)
        cs = np.r_[0, np.cumsum(vals)]
        return cs[offs[1:]] - cs[offs[:-1]]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(
            ["kind", "type", "label", "city", "road_id", "speed",
             "road_class", "oneway", "toll", "no_access", "min_res",
             "max_res", "n_nod", "n_numbers"]
        ).to_pandas()
        road = df["road_id"].to_numpy() > 0
        contour = df["type"].to_numpy() == 0x20
        feet = np.where(
            contour,
            pd.to_numeric(df["label"], errors="coerce").fillna(0).to_numpy(),
            0,
        ).astype(np.int64)
        out = pd.DataFrame(
            {
                "type": df["type"].astype(np.int64),
                "n": 1,
                "sum_speed": np.where(road, df["speed"], 0).astype(np.int64),
                "sum_class": np.where(road, df["road_class"], 0).astype(
                    np.int64
                ),
                "n_oneway": df["oneway"].astype(np.int64),
                "n_toll": df["toll"].astype(np.int64),
                "sum_no_access": df["no_access"].astype(np.int64),
                "sum_min_res": df["min_res"].astype(np.int64),
                "sum_max_res": df["max_res"].astype(np.int64),
                "sum_nod": df["n_nod"].astype(np.int64),
                "sum_numbers": df["n_numbers"].astype(np.int64),
                "sum_feet": feet,
                "n_city": (df["city"].to_numpy() != "").astype(np.int64),
                # parsed Nod / Numbers subsection payloads (round-4:
                # RoadHelper.addNode/addNumbers now fully modelled)
                "sum_nod_id": list_sums(batch["nod_id"]),
                "sum_nod_bnd": list_sums(batch["nod_boundary"]),
                "sum_hn_node": list_sums(batch["hn_node"]),
                "sum_hn_left": list_sums(batch["hn_left_start"])
                + list_sums(batch["hn_left_end"]),
                "sum_hn_right": list_sums(batch["hn_right_start"])
                + list_sums(batch["hn_right_end"]),
            }
        )
        return out.groupby("type", as_index=False).sum()

    cols = ["n", "sum_speed", "sum_class", "n_oneway", "n_toll",
            "sum_no_access", "sum_min_res", "sum_max_res", "sum_nod",
            "sum_numbers", "sum_feet", "n_city", "sum_nod_id",
            "sum_nod_bnd", "sum_hn_node", "sum_hn_left", "sum_hn_right"]
    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("type")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
    )
    return out.sort_values("type").reset_index(drop=True).astype("int64")


def _mp_parquet_table(sf_dir: str):
    """Parse the full .mp fixture ONCE into columnar parquet (cached) and
    serve it as a read_parquet Dataset — the parse-once-store-columnar
    shape (`_osm_parquet_tables` precedent): the PARSER is exercised by
    ``mp_sections``/``mp_roundtrip``; join/flow-through queries shouldn't
    re-pay the text parse per run."""
    import os

    import ray.data as rd

    from ..sources.polish import read_mp

    paths = _mp_full_fixture_dir(sf_dir)
    name = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/mkgmap_ray_mppq_v1_{name}"
    if not os.path.exists(f"{out}/_done"):
        os.makedirs(out, exist_ok=True)
        read_mp(paths).write_parquet(out)  # parse shards in parallel
        with open(f"{out}/_done", "w") as f:
            f.write("ok")
    return rd.read_parquet(out)


def q_mp_routing(sf_dir: str):
    """Polish routing/address payload FLOW-THROUGH (round-4 VERDICT
    Missing 5): the parsed ``.mp`` roads land in the actual downstream
    machinery, not just per-type sums — per shard group, the road
    geometry runs through ``stages.routing.build_road_graph`` (sorted-
    coordinate node ids, deduplicated arcs, checksum — the NET/NOD
    build) and the parsed ``Numbers=`` intervals run through
    ``stages.housenum._implausible_keys`` (``Numbers.isPlausible``).
    Every output column is closed-form from o_orderkey, so the DuckDB
    oracle reconstructs the graph (rank-over-distinct-coords node ids,
    DISTINCT arc pairs) and the plausibility verdicts exactly."""
    from ..stages.housenum import _implausible_keys
    from ..stages.routing import build_road_graph

    ds = _mp_parquet_table(sf_dir)

    def add_shard(batch: pa.Table) -> pa.Table:
        rid = np.asarray(batch["road_id"].combine_chunks(), np.int64)
        batch = batch.filter(pa.array(rid > 0))
        rid = np.asarray(batch["road_id"].combine_chunks(), np.int64)
        return batch.append_column("shard", pa.array(rid % 8, pa.int64()))

    def per_shard(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame()
        roads = [
            (np.asarray(la, np.int64), np.asarray(lo, np.int64))
            for la, lo in zip(g["lat_mu"], g["lon_mu"])
        ]
        graph = build_road_graph(roads)
        # parsed Numbers -> interval rows -> Numbers.isPlausible
        rows = []
        for rid, nodes, ls, lst, le, rs, rst, re_ in zip(
            g["road_id"], g["hn_node"], g["hn_left_style"],
            g["hn_left_start"], g["hn_left_end"],
            g["hn_right_style"], g["hn_right_start"], g["hn_right_end"],
        ):
            for i in range(len(nodes)):
                if ls[i] > 0:
                    rows.append((rid, nodes[i], ls[i], lst[i], le[i]))
                if rs[i] > 0:
                    rows.append((rid, nodes[i], rs[i], rst[i], re_[i]))
        hn = pd.DataFrame(
            rows, columns=["road", "ipart", "style", "start_num", "end_num"]
        )
        n_bad = len(_implausible_keys(hn)) if len(hn) else 0
        n_bnd = int(sum(int(np.sum(b)) for b in g["nod_boundary"]))
        sum_nod = int(sum(int(np.sum(b)) for b in g["nod_id"]))
        return pd.DataFrame(
            [{
                "shard": int(g["shard"].iloc[0]),
                "n_roads": len(g),
                "n_nodes": graph["n_nodes"],
                "n_arcs": graph["n_arcs"],
                "arc_checksum": graph["arc_checksum"],
                "n_boundary": n_bnd,
                "sum_nod_id": sum_nod,
                "n_hn_rows": len(hn),
                "n_hn_implausible": n_bad,
            }]
        )

    out = (
        ds.map_batches(add_shard, batch_format="pyarrow", batch_size=None)
        .groupby("shard")
        .map_groups(per_shard, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("shard").reset_index(drop=True).astype("int64")


def q_mp_roundtrip(sf_dir: str):
    """Polish .mp source end-to-end (``PolishMapDataSource`` semantics):
    orders → .mp shards → parse → per-type aggregates matching closed
    forms straight from orders in SQL (bit-exact coordinate round-trip
    through degree text)."""
    from ray.data.aggregate import Sum

    from ..sources.polish import read_mp

    paths = _mp_fixture_dir(sf_dir)
    ds = read_mp(paths)

    def partial(batch: pa.Table) -> pa.Table:
        typ = np.asarray(batch["type"].combine_chunks(), np.int64)
        lat0 = np.asarray(
            [v[0] for v in batch["lat_mu"].to_pylist()], np.int64
        )
        lon0 = np.asarray(
            [v[0] for v in batch["lon_mu"].to_pylist()], np.int64
        )
        uniq, inv = np.unique(typ, return_inverse=True)

        def agg(v):
            return pa.array(
                np.bincount(inv, weights=v, minlength=len(uniq)).astype(np.int64),
                pa.int64(),
            )

        return pa.table(
            {
                "type": pa.array(uniq, pa.int64()),
                "n": agg(np.ones(len(typ), np.int64)),
                "sum_lat0": agg(lat0),
                "sum_lon0": agg(lon0),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_lat0", alias_name="sum_lat0"),
            Sum("sum_lon0", alias_name="sum_lon0"),
        )
        .to_pandas()
    )
    return out.astype("int64")


def q_multipolygon(sf_dir: str):
    """Multipolygon assembly + classification end-to-end
    (``MultiPolygonRelation``): per order, THREE nested square rings
    (outer, hole, island) arrive as scrambled, partly reversed edge ways;
    ``join_ways`` closes them, the containment matrix classifies
    outer/inner/outer at depths 0/1/2, and the net area (outer − hole +
    island) is a closed form — SQL-exact per order."""
    from ..geom.mpoly import classify_rings, net_area2
    from ..stages.merge import join_ways

    def fn(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        ook = ook[ook % 8 == 5]  # bounded fixture subset
        n = len(ook)
        n_outer = np.empty(n, np.int64)
        n_inner = np.empty(n, np.int64)
        area2 = np.empty(n, np.int64)
        for idx, ok in enumerate(ook):
            ok = int(ok)
            y0 = (ok * A_LAT) % SPAN
            x0 = (ok * A_LON) % SPAN
            s_out = 400 + ok % 100        # outer half-size
            s_hole = s_out // 2
            s_isl = s_out // 4
            ways = []
            for k, s in enumerate((s_out, s_hole, s_isl)):
                cs = [(y0 - s, x0 - s), (y0 - s, x0 + s),
                      (y0 + s, x0 + s), (y0 + s, x0 - s)]
                edges = [
                    (np.asarray([cs[e][0], cs[(e + 1) % 4][0]]),
                     np.asarray([cs[e][1], cs[(e + 1) % 4][1]]))
                    for e in range(4)
                ]
                if (ok + k) % 2:
                    edges[2] = (edges[2][0][::-1], edges[2][1][::-1])
                rot = (ok + k) % 4
                ways.extend(edges[rot:] + edges[:rot])
            rings = [
                (la, lo) for la, lo, closed in join_ways(ways) if closed
            ]
            cls = classify_rings(rings)
            n_outer[idx] = sum(1 for c in cls if c["role"] == "outer")
            n_inner[idx] = sum(1 for c in cls if c["role"] == "inner")
            area2[idx] = net_area2(rings)
        return pa.table(
            {
                "o_orderkey": pa.array(ook, pa.int64()),
                "n_outer": pa.array(n_outer, pa.int64()),
                "n_inner": pa.array(n_inner, pa.int64()),
                "net_area2": pa.array(area2, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_shape_merge(sf_dir: str):
    """Shared-edge polygon merging (``filters/ShapeMergeFilter.java``):
    per order, two adjacent squares sharing an edge plus one disjoint
    square; the merger must splice the pair into one 6-vertex rectangle
    (area preserved — the ``calcAreaSizeTestVal`` invariant) and leave
    the third alone. Counts and areas are closed-form — SQL-exact."""
    from ..geom.polyfilters import signed_area2
    from ..stages.merge import merge_shapes

    def fn(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        sel = ook % 4 == 1  # bounded fixture subset
        ook = ook[sel]
        n = len(ook)
        n_shapes = np.empty(n, np.int64)
        n_points = np.empty(n, np.int64)
        sum_area2 = np.empty(n, np.int64)
        max_area2 = np.empty(n, np.int64)
        for idx, ok in enumerate(ook):
            ok = int(ok)
            s = 1 + ok % 7
            y0 = (ok * A_LAT) % SPAN
            x0 = (ok * A_LON) % SPAN

            def square(yy, xx, side):
                return (
                    np.asarray([yy, yy, yy + side, yy + side]),
                    np.asarray([xx, xx + side, xx + side, xx]),
                )

            out = merge_shapes(
                [square(y0, x0, s), square(y0, x0 + s, s),
                 square(y0, x0 + 4 * s, s)]
            )
            areas = [abs(signed_area2(*r)) for r in out]
            n_shapes[idx] = len(out)
            n_points[idx] = sum(len(r[0]) for r in out)
            sum_area2[idx] = sum(areas)
            max_area2[idx] = max(areas)
        return pa.table(
            {
                "o_orderkey": pa.array(ook, pa.int64()),
                "n_shapes": pa.array(n_shapes, pa.int64()),
                "n_points": pa.array(n_points, pa.int64()),
                "sum_area2": pa.array(sum_area2, pa.int64()),
                "max_area2": pa.array(max_area2, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_hole_cut(sf_dir: str):
    """Hole cutting (``MultiPolygonCutter`` analogue): per order an outer
    square with two disjoint square holes is cut into ONE simple ring via
    zero-width bridges; vertex count and net signed area (outer − holes)
    are closed-form — SQL-exact."""
    from ..geom.mpoly import cut_holes
    from ..geom.polyfilters import signed_area2

    def fn(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        sel = ook % 4 == 1
        ook = ook[sel]
        n = len(ook)
        n_points = np.empty(n, np.int64)
        ring_area2 = np.empty(n, np.int64)
        for idx, ok in enumerate(ook):
            ok = int(ok)
            s = 1 + ok % 7
            y0 = (ok * A_LAT) % SPAN
            x0 = (ok * A_LON) % SPAN

            def square(yy, xx, side):
                return (
                    np.asarray([yy, yy, yy + side, yy + side]),
                    np.asarray([xx, xx + side, xx + side, xx]),
                )

            la, lo = cut_holes(
                square(y0, x0, 6 * s),
                [square(y0 + s, x0 + s, s),
                 square(y0 + 4 * s, x0 + 4 * s, s)],
            )
            n_points[idx] = len(la)
            ring_area2[idx] = abs(signed_area2(la, lo))
        return pa.table(
            {
                "o_orderkey": pa.array(ook, pa.int64()),
                "n_points": pa.array(n_points, pa.int64()),
                "ring_area2": pa.array(ring_area2, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_label_encode8(sf_dir: str):
    """8-bit + utf-8 label encodings (``labelenc/AnyCharsetEncoder``,
    ``Utf8Encoder``): per mixed-case part name, the NUL-terminated
    encoded length and byte sum — SQL-exact (names are ASCII, so the
    codepage bytes equal the codepoints; accents/transliteration are
    covered by pytest)."""
    import pyarrow.compute as pc

    from ..stages.labelenc import encode8, encode_utf8

    def fn(batch: pa.Table) -> pa.Table:
        pk = batch["p_partkey"].combine_chunks().cast(pa.int64())
        nm = batch["p_name"].combine_chunks()
        even = pc.equal(pc.bit_wise_and(pk, 1), 0)
        name2 = pc.if_else(even, pc.utf8_upper(nm), nm).to_pylist()
        enc = [encode8(s) for s in name2]
        enc_u = [encode_utf8(s) for s in name2]
        return pa.table(
            {
                "p_partkey": pk,
                "enc8_len": pa.array(
                    [len(e) for e in enc], pa.int64()
                ),
                "enc8_bytesum": pa.array(
                    [sum(e[:-1]) for e in enc], pa.int64()
                ),
                "utf8_len": pa.array(
                    [len(e) for e in enc_u], pa.int64()
                ),
            }
        )

    return _read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_wrong_angle(sf_dir: str):
    """Rounding-artifact repair (``WrongAngleFixer.java`` move pass,
    ``optimizeWays``/``MAX_BEARING_ERROR``): per order a near-flat
    polyline whose interior "wiggle" points sit 1 hp unit past a
    rounding boundary — naive rounding zigzags them a full map unit off
    the line (≈27° bearing error); the fixer must move each wiggle back
    onto the line while leaving the clean control points (and the
    no-wiggle control lines) untouched. The repaired output is closed
    form — n_points = m and coord_sum = m*y0 + m*(m-1) — so the DuckDB
    oracle is hash-exact and FAILS on a no-op rounding (the wiggles
    would each add +1)."""
    from ..geom.anglefix import fix_wrong_angles

    def fn(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        ook = ook[ook % 16 == 7]  # bounded fixture subset
        n = len(ook)
        n_points = np.empty(n, np.int64)
        coord_sum = np.empty(n, np.int64)
        D = 6
        scale = 1 << D
        for idx, ok in enumerate(ook):
            ok = int(ok)
            m = 6 + ok % 4
            y0 = ok % 3
            lat_hp = np.full(m, y0 * scale + 20, np.int64)
            if ok % 5 != 0:  # control arm: every 5th line is clean
                lat_hp[3] = y0 * scale + 33  # 1 hp past the boundary
            # 3-mu spacing puts the wiggle's own error (2 x 14.5°) over
            # its threshold while its clean neighbours (14.5° + 0°) stay
            # under theirs — only the wiggle moves, deterministically
            lon_hp = np.arange(m) * 3 * scale
            (rla, rlo), = fix_wrong_angles([(lat_hp, lon_hp)], D)
            n_points[idx] = len(rla)
            coord_sum[idx] = int(rla.sum() + rlo.sum())
        return pa.table(
            {
                "o_orderkey": pa.array(ook, pa.int64()),
                "n_points": pa.array(n_points, pa.int64()),
                "coord_sum": pa.array(coord_sum, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_label_multibyte(sf_dir: str):
    """Multibyte label encoding across the CODEPAGE FAMILY
    (``labelenc/AnyCharsetEncoder.java`` + the ``CodeFunctions.
    createEncoderForLBL`` dispatch, ``CodeFunctions.java:73-112``):
    every 3rd key encodes in cp936 (GBK — katakana row 0xA5, é
    representable at 0xA8A6), the rest in cp932 (Shift-JIS — katakana
    row 0x83, é unmappable and transliterated to 'e'). Labels mix
    ASCII, two katakana (2 bytes each; both blocks are contiguous over
    the fixture range so byte sums are closed form) and, on every 4th
    key, the é. NUL terminator included in the byte count. Adding a
    codepage is a dispatch-table addition — this query pins two members
    of the family at once."""
    from ..stages.labelenc import code_functions

    encoders = {}
    for cs, cp_want in (("cp932", 932), ("cp936", 936)):
        fmt, cp, enc = code_functions(cs)
        assert (fmt, cp) == (9, cp_want)
        encoders[cp_want] = enc

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        n = len(k)
        cps = np.where(k % 3 == 0, 936, 932)
        n_bytes = np.empty(n, np.int64)
        byte_sum = np.empty(n, np.int64)
        for i, ok in enumerate(k):
            ok = int(ok)
            label = "K" + chr(0x30A2 + ok % 50) + chr(0x30A2 + (ok * 7) % 50)
            if ok % 4 == 0:
                label += "é"
            b = encoders[int(cps[i])](label)
            n_bytes[i] = len(b)
            byte_sum[i] = sum(b)
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "codepage": pa.array(cps.astype(np.int64), pa.int64()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "byte_sum": pa.array(byte_sum, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_sea_gaps(sf_dir: str):
    """Coastline gap closing (``SeaGenerator.closeGaps``,
    ``--generate-sea=close-gaps=NUM``): per order a coastline ring is
    delivered as 2-3 arcs with deliberate gaps; arcs whose end→start gap
    is under the limit merge (nearest-start-first, scan restarted per
    merge) and each merge records a bridge marker. Three closed-form
    variants: a 2 mu gap (merges), a 50 mu gap (stays split), and a
    3-arc chain (two merges) — n_chains / n_bridges / total points /
    bridge length are all exact."""
    from ..stages.coastline import close_gaps

    MAX_GAP = 10

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        k = k[k % 11 == 3]  # bounded fixture subset
        n = len(k)
        n_chains = np.empty(n, np.int64)
        n_bridges = np.empty(n, np.int64)
        sum_pts = np.empty(n, np.int64)
        bridge_len = np.empty(n, np.int64)
        A = lambda *pts: (  # noqa: E731
            np.array([p[0] for p in pts], np.int64),
            np.array([p[1] for p in pts], np.int64),
        )
        for idx, ok in enumerate(k):
            v = int(ok) % 3
            arc_a = A((0, 0), (100, 0), (100, 100))
            if v == 0:
                chains = [arc_a, A((100, 102), (0, 100))]
            elif v == 1:
                chains = [arc_a, A((100, 150), (0, 100))]
            else:
                chains = [
                    arc_a, A((100, 103), (0, 100)), A((2, 100), (50, 50))
                ]
            out, bridges = close_gaps(chains, MAX_GAP)
            n_chains[idx] = len(out)
            n_bridges[idx] = len(bridges)
            sum_pts[idx] = sum(len(la) for la, _ in out)
            bridge_len[idx] = sum(
                int(round(((e[0] - s[0]) ** 2 + (e[1] - s[1]) ** 2) ** 0.5))
                for e, s in bridges
            )
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "n_chains": pa.array(n_chains, pa.int64()),
                "n_bridges": pa.array(n_bridges, pa.int64()),
                "sum_pts": pa.array(sum_pts, pa.int64()),
                "bridge_len": pa.array(bridge_len, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_locator_normalize(sf_dir: str):
    """Country normalization (``build/Locator.java`` applied at
    ``MapBuilder.java:404-410``): each customer's country string is a
    deterministic case/prefix-mangled variant of its nation name; the
    Locator must recover the canonical name or per-nation counts
    fragment — SQL-exact against the unmangled join."""
    import pyarrow.parquet as pq

    from ..stages.locator import Locator

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    names = nation["n_name"].to_pylist()
    nk = np.asarray(nation["n_nationkey"], np.int64)
    name_of = np.empty(int(nk.max()) + 1, dtype=object)
    for k, nm in zip(nk, names):
        name_of[int(k)] = nm
    loc = Locator(names)

    def fn(batch: pa.Table) -> pd.DataFrame:
        ck = np.asarray(batch["c_custkey"].combine_chunks(), np.int64)
        cnk = np.asarray(batch["c_nationkey"].combine_chunks(), np.int64)
        base = pd.Series(name_of[cnk], dtype="string")
        variant = base.copy()
        variant = variant.mask(pd.Series(ck % 3 == 1), base.str.lower())
        variant = variant.mask(
            pd.Series(ck % 3 == 2), "The " + base.str.title()
        )
        canon = loc.normalize_series(variant)
        df = pd.DataFrame(
            {"n_name": canon, "n": 1, "sum_custkey": ck}
        )
        return df.groupby("n_name", as_index=False).sum()

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(fn, batch_format="pyarrow", batch_size=None)
        .groupby("n_name")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_custkey", alias_name="sum_custkey"),
        )
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_custkey"] = out["sum_custkey"].astype("int64")
    return out


def q_routing_graph(sf_dir: str):
    """Per-tile routing graph build (NET/NOD analogue +
    ``findUnconnectedRoads``): per order, a chain of m=2+ok%3 roads, an
    isolated road and a branch build a graph whose deterministic
    (sorted-coordinate) node numbering, arc count, component structure
    and arc checksum are closed forms — SQL-exact."""
    from ..stages.routing import build_road_graph

    def fn(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        sel = ook % 4 == 0  # bounded fixture subset
        ook = ook[sel]
        n = len(ook)
        cols = {c: np.empty(n, np.int64)
                for c in ("n_nodes", "n_arcs", "n_components",
                          "largest_component", "arc_checksum")}
        for idx, ok in enumerate(ook):
            ok = int(ok)
            m = 2 + ok % 3
            s = 10 + ok % 5
            y0 = (ok * A_LAT) % SPAN
            x0 = (ok * A_LON) % SPAN
            roads = [
                (np.asarray([y0, y0]),
                 np.asarray([x0 + i * s, x0 + (i + 1) * s]))
                for i in range(m)
            ]
            roads.append(  # isolated
                (np.asarray([y0 + s, y0 + s]), np.asarray([x0, x0 + s]))
            )
            roads.append(  # branch at chain node 1
                (np.asarray([y0, y0 + s]),
                 np.asarray([x0 + s, x0 + 2 * s]))
            )
            g = build_road_graph(roads)
            for c in cols:
                cols[c][idx] = g[c]
        return pa.table(
            {"o_orderkey": pa.array(ook, pa.int64()),
             **{c: pa.array(v, pa.int64()) for c, v in cols.items()}}
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_size_filters(sf_dir: str):
    """The size-driven splitter filters
    (``LineSizeSplitterFilter`` + ``PolygonSubdivSizeSplitterFilter``):
    per order a line of length (maxSize-10)·2^k (k=(ok//4)%4) must chunk
    into exactly 2^k two-point pieces (1 piece when it already fits),
    and a square of side 0xffff·2^m must quarter recursively into
    4^m rects with total area preserved — closed forms, SQL-exact."""
    from ..geom.polyfilters import signed_area2
    from ..geom.sizesplit import (
        line_size_split,
        polygon_subdiv_size_split,
    )

    def fn(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        sel = ook % 4 == 3  # bounded fixture subset
        ook = ook[sel]
        n = len(ook)
        cols = {c: np.empty(n, np.int64)
                for c in ("n_chunks", "sum_chunk_points", "n_parts",
                          "sum_part_points", "sum_area2")}
        limit = 0x8000 - 10
        for idx, ok in enumerate(ook):
            ok = int(ok)
            k = (ok // 4) % 4
            chunks = line_size_split(
                np.asarray([0, 0]), np.asarray([0, limit << k]), shift=0
            )
            cols["n_chunks"][idx] = len(chunks)
            cols["sum_chunk_points"][idx] = sum(len(c[0]) for c in chunks)
            m = (ok // 4) % 3
            side = 0xFFFF << m
            la = np.asarray([0, 0, side, side])
            lo = np.asarray([0, side, side, 0])
            parts = polygon_subdiv_size_split(la, lo, shift=0)
            cols["n_parts"][idx] = len(parts)
            cols["sum_part_points"][idx] = sum(len(p[0]) for p in parts)
            cols["sum_area2"][idx] = sum(
                abs(signed_area2(*p)) for p in parts
            )
        return pa.table(
            {"o_orderkey": pa.array(ook, pa.int64()),
             **{c: pa.array(v, pa.int64()) for c, v in cols.items()}}
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_coastline_assembly(sf_dir: str):
    """Coastline assembly (``SeaGenerator.java:818-1407``): per order, a
    two-segment shoreline crossing the tile (closed along the border with
    the land-left ccw walk), a directed-ring island (scrambled edge
    order) and a clockwise lake — counts, closure vertex count and the
    flood-fill land-area invariant are closed forms — SQL-exact."""
    from ..geom.area import Area as _Area
    from ..stages.coastline import assemble_coastline

    def fn(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        sel = ook % 4 == 2  # bounded fixture subset
        ook = ook[sel]
        n = len(ook)
        cols = {
            c: np.empty(n, np.int64)
            for c in ("n_islands", "n_lakes", "n_land", "n_incomplete",
                      "land_points", "land_area2")
        }
        for idx, ok in enumerate(ook):
            ok = int(ok)
            u = 1 + ok % 5
            T = 64 * u
            b = _Area(0, 0, T, T)
            mid = (T // 2 + T // 4) // 2
            segs = [
                (np.asarray([T // 2, mid]), np.asarray([0, T // 2])),
                (np.asarray([mid, T // 4]), np.asarray([T // 2, T])),
            ]
            s = T // 16
            cs = [(s, s), (s, 2 * s), (2 * s, 2 * s), (2 * s, s)]  # ccw
            isl = [
                (np.asarray([cs[e][0], cs[(e + 1) % 4][0]]),
                 np.asarray([cs[e][1], cs[(e + 1) % 4][1]]))
                for e in range(4)
            ]
            rot = ok % 4
            segs += isl[rot:] + isl[:rot]
            s2 = T // 32
            y0 = 3 * T // 4
            cs2 = [(y0, y0), (y0 + s2, y0), (y0 + s2, y0 + s2),
                   (y0, y0 + s2)]  # cw
            segs += [
                (np.asarray([cs2[e][0], cs2[(e + 1) % 4][0]]),
                 np.asarray([cs2[e][1], cs2[(e + 1) % 4][1]]))
                for e in range(4)
            ]
            res = assemble_coastline(segs, b)
            cols["n_islands"][idx] = len(res["islands"])
            cols["n_lakes"][idx] = len(res["lakes"])
            cols["n_land"][idx] = len(res["land_polys"])
            cols["n_incomplete"][idx] = res["n_incomplete"]
            cols["land_points"][idx] = sum(
                len(r[0]) for r in res["land_polys"]
            )
            cols["land_area2"][idx] = res["land_area2"]
        return pa.table(
            {"o_orderkey": pa.array(ook, pa.int64()),
             **{c: pa.array(v, pa.int64()) for c, v in cols.items()}}
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_sea_background(sf_dir: str):
    """Precomp-sea flood fill wired to coastline assembly
    (``SeaGenerator.java:571-694`` addPrecompSea + ``:818-1407``): each
    tile looks up its precomp grid state; a sea-only tile gets a full
    sea background rectangle, a land-only tile a full land rectangle
    (no assembly runs), and a MIXED tile runs the real shoreline
    assembly (border closure, islands, lakes) with sea as the
    complement of the assembled land. SQL-exact over all three kinds.

    Scale: the precomp grid is a broadcast small side (ray.put);
    assembly runs only for mixed tiles (the reference's
    distinctTilesOnly fast path skips it entirely for uniform tiles)."""
    import ray

    from ..geom.area import Area as _Area
    from ..stages.coastline import assemble_coastline

    n_cells = SPAN >> SEA_GRID_SHIFT
    cells = np.arange(n_cells * n_cells, dtype=np.int64)
    state = (cells * 7 + 3) % 3  # 0=sea, 1=land, 2=mixed
    ref = ray.put(state)

    class SeaBackground:
        def __init__(self, state_ref):
            self.state = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
            n = len(ook)
            # tile center picks the precomp cell (deterministic point)
            ty = (ook * A_LAT) % SPAN
            tx = (ook * A_LON) % SPAN
            cell = (ty >> SEA_GRID_SHIFT) * n_cells + (tx >> SEA_GRID_SHIFT)
            bg = self.state[cell]
            u = 1 + ook % 5
            T = 64 * u
            full2 = 2 * T * T  # doubled rectangle area (shoelace form)
            cols = {
                c: np.zeros(n, np.int64)
                for c in ("n_land", "n_islands", "n_lakes", "land_area2",
                          "sea_area2")
            }
            # uniform tiles: background rectangle only, no assembly
            sea_only = bg == 0
            land_only = bg == 1
            cols["sea_area2"][sea_only] = full2[sea_only]
            cols["n_land"][land_only] = 1
            cols["land_area2"][land_only] = full2[land_only]
            # mixed tiles: run the shoreline assembly
            for idx in np.flatnonzero(bg == 2):
                ok = int(ook[idx])
                Ti = int(T[idx])
                b = _Area(0, 0, Ti, Ti)
                mid = (Ti // 2 + Ti // 4) // 2
                segs = [
                    (np.asarray([Ti // 2, mid]), np.asarray([0, Ti // 2])),
                    (np.asarray([mid, Ti // 4]), np.asarray([Ti // 2, Ti])),
                ]
                s = Ti // 16
                cs = [(s, s), (s, 2 * s), (2 * s, 2 * s), (2 * s, s)]
                isl = [
                    (np.asarray([cs[e][0], cs[(e + 1) % 4][0]]),
                     np.asarray([cs[e][1], cs[(e + 1) % 4][1]]))
                    for e in range(4)
                ]
                rot = ok % 4
                segs += isl[rot:] + isl[:rot]
                s2 = Ti // 32
                y0 = 3 * Ti // 4
                cs2 = [(y0, y0), (y0 + s2, y0), (y0 + s2, y0 + s2),
                       (y0, y0 + s2)]
                segs += [
                    (np.asarray([cs2[e][0], cs2[(e + 1) % 4][0]]),
                     np.asarray([cs2[e][1], cs2[(e + 1) % 4][1]]))
                    for e in range(4)
                ]
                res = assemble_coastline(segs, b)
                cols["n_land"][idx] = len(res["land_polys"])
                cols["n_islands"][idx] = len(res["islands"])
                cols["n_lakes"][idx] = len(res["lakes"])
                cols["land_area2"][idx] = res["land_area2"]
                cols["sea_area2"][idx] = int(full2[idx]) - res["land_area2"]
            return pa.table(
                {
                    "o_orderkey": pa.array(ook, pa.int64()),
                    "bg": pa.array(bg, pa.int64()),
                    **{c: pa.array(v, pa.int64()) for c, v in cols.items()},
                }
            )

    return stateful_map_batches(
        _read(sf_dir, "orders", ["o_orderkey"]), SeaBackground,
        fn_kwargs=dict(state_ref=ref),
        batch_format="pyarrow", batch_size=None,
    )


def q_poi_generate(sf_dir: str):
    """POI generation from shapes (``POIGeneratorHook``: synthesize a
    point per polygon): triangle centroid with Java truncating division —
    closed form per order, SQL-exact."""

    def fn(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        cy, cx, r = order_triangles_np(ook)
        # vertices: (cy+r, cx), (cy-r, cx+r), (cy-r, cx-r)
        sum_lat = 3 * cy - r
        sum_lon = 3 * cx
        # centroid with Java truncating division (sum_lat can be
        # negative when cy < r/3)
        poi_lat = np.where(sum_lat >= 0, sum_lat // 3, -((-sum_lat) // 3))
        poi_lon = sum_lon // 3  # always non-negative
        return pa.table(
            {
                "o_orderkey": pa.array(ook, pa.int64()),
                "poi_lat": pa.array(poi_lat, pa.int64()),
                "poi_lon": pa.array(poi_lon, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_label_encode(sf_dir: str):
    """Garmin 6-bit label encoding (``imgfmt/app/labelenc/Format6Encoder``)
    over part names: per name, the packed byte length and a decode
    round-trip flag; the byte length is SQL-exact (letters+digits+spaces
    are 1 code each for these names)."""
    from ..stages.labelenc import decode6, encode6

    def fn(batch: pa.Table) -> pa.Table:
        names = batch["p_name"].to_pylist()
        keys = np.asarray(batch["p_partkey"].combine_chunks(), np.int64)
        blen = np.empty(len(names), np.int64)
        rt = np.empty(len(names), np.int64)
        for i, nm in enumerate(names):
            e = encode6(nm)
            blen[i] = len(e)
            rt[i] = int(decode6(e) == nm.upper())
        return pa.table(
            {
                "p_partkey": pa.array(keys, pa.int64()),
                "enc_bytes": pa.array(blen, pa.int64()),
                "roundtrip_ok": pa.array(rt, pa.int64()),
            }
        )

    return _read(sf_dir, "part", ["p_partkey", "p_name"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_hgt_roundtrip(sf_dir: str):
    """.hgt binary source end-to-end (``HGTReader`` layout: big-endian
    int16, north-first rows): deterministic fixture tiles → read → per-tile
    aggregates matching the closed-form grid in SQL."""
    import os

    from ray.data.aggregate import Sum

    from ..sources.hgt import read_hgt_tiles, write_hgt

    name = os.path.basename(sf_dir.rstrip("/"))
    out = f"/tmp/mkgmap_ray_hgt_{name}"
    res = 64
    paths = []
    os.makedirs(out, exist_ok=True)
    for k in range(4):
        p = f"{out}/N{50 + k:02d}E{k:03d}.hgt"
        paths.append(p)
        if not os.path.exists(p):
            yy, xx = np.mgrid[0 : res + 1, 0 : res + 1]
            write_hgt(p, ((yy * 31 + xx * 17 + k * 1000) % 2000).astype(
                np.int16
            ))

    ds = read_hgt_tiles(paths)

    def agg(batch: pa.Table) -> pa.Table:
        out_rows = {"cell_lat": [], "cell_lon": [], "n_samples": [],
                    "sum_h": []}
        for i in range(batch.num_rows):
            h = np.asarray(batch["heights"][i].as_py(), np.int64)
            out_rows["cell_lat"].append(batch["cell_lat"][i].as_py())
            out_rows["cell_lon"].append(batch["cell_lon"][i].as_py())
            out_rows["n_samples"].append(len(h))
            out_rows["sum_h"].append(int(h.sum()))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in out_rows.items()}
        )

    return ds.map_batches(agg, batch_format="pyarrow", batch_size=None)


SEA_GRID_SHIFT = 13  # 8×8 precomp grid over the 65536-unit square


def q_sea_lookup(sf_dir: str):
    """Precompiled sea/land grid semi-join (``SeaGenerator`` precomp
    raster: fixed-grid tile key → {sea, land, mixed},
    ``reader/osm/SeaGenerator.java:84-105``): the small grid is broadcast
    once via ``ray.put``; every event point classifies by cell lookup —
    counts per state are SQL-exact against the closed-form grid."""
    import ray

    n_cells = SPAN >> SEA_GRID_SHIFT  # 8
    cells = np.arange(n_cells * n_cells, dtype=np.int64)
    # deterministic state per cell: 0=sea, 1=land, 2=mixed
    state = (cells * 7 + 3) % 3
    ref = ray.put(state)

    class SeaLookup:
        def __init__(self, state_ref):
            self.state = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            eid = np.asarray(batch["event_id"].combine_chunks(), np.int64)
            lat, lon = event_points_np(eid)
            cell = (lat >> SEA_GRID_SHIFT) * n_cells + (lon >> SEA_GRID_SHIFT)
            st = self.state[cell]
            uniq, cnt = np.unique(st, return_counts=True)
            return pa.table(
                {
                    "state": pa.array(uniq, pa.int64()),
                    "n": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )

    from ..stages.combine import combine_partials

    parts = stateful_map_batches(
        _read(sf_dir, "events", ["event_id"]), SeaLookup,
        fn_kwargs=dict(state_ref=ref),
        batch_format="pyarrow", batch_size=None,
    )
    c = combine_partials(parts, "state", ["n"])
    return pd.DataFrame(c).astype("int64")


def q_restriction_merge(sf_dir: str):
    """Restriction relations joined into road merging
    (``RestrictionRelation`` via points blocking ``RoadMerger``,
    ``RoadMerger.java:96-113``): segment rows and restriction rows arrive
    as ONE keyed stream (the per-tile join shape — both sides co-located
    by group), and each order's 3-segment chain merges 3→1 UNLESS a
    restriction sits on its first interior point (orders with
    ``o_orderkey % 3 == 0``) — then 2 roads remain. SQL-exact per group."""
    from ..stages.merge import merge_roads

    def to_rows(batch: pa.Table) -> pa.Table:
        ook = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        rows = {"grp": [], "is_restr": [], "y0": [], "x0": [],
                "y1": [], "x1": []}
        for ok in ook:
            ok = int(ok)
            base = ok * 8
            for i in range(3):
                rows["grp"].append(ok % 64)
                rows["is_restr"].append(0)
                rows["y0"].append(base)
                rows["x0"].append(1000 * i)
                rows["y1"].append(base)
                rows["x1"].append(1000 * (i + 1))
            if ok % 3 == 0:  # via-point restriction at first interior point
                rows["grp"].append(ok % 64)
                rows["is_restr"].append(1)
                rows["y0"].append(base)
                rows["x0"].append(1000)
                rows["y1"].append(0)
                rows["x1"].append(0)
        return pa.table(
            {
                "grp": pa.array(rows["grp"], pa.int64()),
                "is_restr": pa.array(rows["is_restr"], pa.int8()),
                "y0": pa.array(rows["y0"], pa.int64()),
                "x0": pa.array(rows["x0"], pa.int64()),
                "y1": pa.array(rows["y1"], pa.int64()),
                "x1": pa.array(rows["x1"], pa.int64()),
            }
        )

    def merge_group(group: pa.Table) -> pa.Table:
        grp = int(group["grp"][0].as_py())
        isr = np.asarray(group["is_restr"].combine_chunks(), np.int64)
        y0 = np.asarray(group["y0"].combine_chunks(), np.int64)
        x0 = np.asarray(group["x0"].combine_chunks(), np.int64)
        y1 = np.asarray(group["y1"].combine_chunks(), np.int64)
        x1 = np.asarray(group["x1"].combine_chunks(), np.int64)
        restricted = {
            (int(y0[i]), int(x0[i])) for i in np.nonzero(isr == 1)[0]
        }
        segs = np.nonzero(isr == 0)[0]
        roads = [
            (np.asarray([y0[i], y1[i]]), np.asarray([x0[i], x1[i]]), "c")
            for i in segs
        ]
        merged = merge_roads(roads, restricted=restricted)
        return pa.table(
            {
                "grp": pa.array([grp], pa.int64()),
                "n_in": pa.array([len(roads)], pa.int64()),
                "n_out": pa.array([len(merged)], pa.int64()),
                "n_restr": pa.array([len(restricted)], pa.int64()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        to_rows, batch_format="pyarrow", batch_size=None
    )
    out = ds.groupby("grp").map_groups(
        merge_group, batch_format="pyarrow"
    ).to_pandas()
    return out.sort_values("grp").reset_index(drop=True).astype("int64")


N_IVF_CENTROIDS = 16
IVF_NPROBE = 4


def _ivf_setup(sf_dir: str):
    """(q_ids, q_mat, centroids, index_dir) — index built once (cached):
    the INVERTED layout, vectors physically partitioned by coarse
    centroid (``stages/ann.py::build_ivf_index``)."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.ann import build_ivf_index

    q_all = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = q_all.filter(pc.less(q_all["vec_id"], N_ANN_QUERIES))
    q_ids = np.asarray(q["vec_id"], np.int64)
    dim = len(q["embedding"][0])
    q_mat = np.asarray(
        q["embedding"].combine_chunks().values, np.float64
    ).reshape(-1, dim)
    cent = q_all.filter(pc.less(q_all["vec_id"], N_IVF_CENTROIDS))
    centroids = quantize(
        np.asarray(cent["embedding"].combine_chunks().values, np.float64)
        .reshape(-1, dim)
    ).astype(np.float64)

    name = os.path.basename(sf_dir.rstrip("/"))
    index_dir = f"/tmp/mkgmap_ray_ivf_{name}"
    if not os.path.exists(f"{index_dir}/_done"):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        build_ivf_index(ds, centroids, index_dir)
        with open(f"{index_dir}/_done", "w") as f:
            f.write("ok")
    return q_ids, q_mat, centroids, index_dir


def q_ann_ivf(sf_dir: str):
    """IVF top-k over the true inverted layout (round-2 VERDICT 3 fixed:
    vectors are physically partitioned by centroid once; probes READ only
    their centroid directories, so scan volume ∝ nprobe/n_centroids).
    SQL face: probing ALL centroid lists must reproduce the exact
    brute-force top-k bit-for-bit — same oracle as ``ann_topk_dot``.
    The partial-probe recall + scan-pruning behavior is asserted in
    pytest (rows read < total at nprobe=4)."""
    from ..stages.ann import ivf_topk_indexed

    q_ids, q_mat, centroids, index_dir = _ivf_setup(sf_dir)
    out, _scanned = ivf_topk_indexed(
        index_dir, q_ids, q_mat, centroids, k=ANN_K,
        nprobe=N_IVF_CENTROIDS,
    )
    return out.astype("int64")


def q_house_intervals(sf_dir: str):
    """Housenumber interval assembly (``HousenumberGenerator`` +
    ``ExtNumbers``: houses sorted along their matched road, split by road
    side and number parity): customer houses match their supplier road
    (same closed-form kNN as ``knn_join``), each house gets its SIDE of
    the road (integer cross-product sign) and its position ORDER along it
    (integer projection numerator — same denominator per road, so
    ordering is exact without division); per (road, side, parity) the
    interval is (count, min, max house number, min/max position) —
    SQL-exact."""
    import pyarrow.parquet as pq
    import ray

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    sk = np.asarray(sup["s_suppkey"], np.int64)
    ry = (sk * A_LAT + 777) % SPAN
    rx = (sk * A_LON + 333) % SPAN
    ref = ray.put((sk, ry, rx))

    class HouseIntervals:
        def __init__(self, ref):
            self.sk, self.ry, self.rx = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = np.asarray(batch["c_custkey"].combine_chunks(), np.int64)
            hy = (ck * A_LAT) % SPAN
            hx = (ck * A_LON) % SPAN
            # nearest road point (ties to smallest id), brute force per
            # batch against the broadcast road table — KdTree semantics
            d2 = (hy[:, None] - self.ry[None, :]) ** 2 \
                + (hx[:, None] - self.rx[None, :]) ** 2
            comb = d2 * (1 << 20) + self.sk[None, :]
            near = np.argmin(comb, axis=1)
            road = self.sk[near]
            ay, ax = self.ry[near], self.rx[near]
            # road direction: fixed per road (dy, dx) = (1000, 500)
            dy, dx = 1000, 500
            side = np.sign(dx * (hy - ay) - dy * (hx - ax)).astype(np.int64)
            pos = dy * (hy - ay) + dx * (hx - ax)  # projection numerator
            parity = ck % 2
            key = road * 6 + (side + 1) * 2 + parity
            uniq, inv = np.unique(key, return_inverse=True)

            def agg(v, how):
                out = np.full(
                    len(uniq),
                    np.iinfo(np.int64).max if how == "min" else
                    np.iinfo(np.int64).min,
                    np.int64,
                )
                (np.minimum if how == "min" else np.maximum).at(out, inv, v)
                return pa.array(out, pa.int64())

            return pa.table(
                {
                    "key": pa.array(uniq, pa.int64()),
                    "n": pa.array(
                        np.bincount(inv, minlength=len(uniq)).astype(np.int64),
                        pa.int64(),
                    ),
                    "min_house": agg(ck, "min"),
                    "max_house": agg(ck, "max"),
                    "min_pos": agg(pos, "min"),
                    "max_pos": agg(pos, "max"),
                }
            )

    parts = stateful_map_batches(
        _read(sf_dir, "customer", ["c_custkey"]), HouseIntervals,
        fn_kwargs=dict(ref=ref),
        batch_format="pyarrow", batch_size=None,
    )
    # min/max combine (not sums) — vectorized reduceat over the streamed
    # partials (bounded by keys × blocks)
    names = ("key", "n", "min_house", "max_house", "min_pos", "max_pos")
    cols: dict[str, list] = {c: [] for c in names}
    for b in parts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for c in names:
            cols[c].append(np.asarray(b[c].combine_chunks(), np.int64))
    key = np.concatenate(cols["key"]) if cols["key"] else np.empty(0, np.int64)
    order = np.argsort(key, kind="stable")
    key = key[order]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    out = {"key": key[starts]}
    for c, red in (("n", np.add), ("min_house", np.minimum),
                   ("max_house", np.maximum), ("min_pos", np.minimum),
                   ("max_pos", np.maximum)):
        v = np.concatenate(cols[c])[order]
        out[c] = red.reduceat(v, starts)
    return pd.DataFrame(out).astype("int64")


def q_house_numbers(sf_dir: str):
    """``ExtNumbers.fillNumbers`` interval assembly (ExtNumbers.java:208-333;
    HousenumberGenerator.java:1695-1783): houses matched to their nearest
    road, split by road side, sorted by position along the road; each
    (road, side) yields ONE Numbers interval with parity style (ODD=1 /
    EVEN=2 / BOTH=3), direction-normalized start/end numbers, not-in-order
    and has-gaps flags — all integer closed form, SQL-exact.

    Scale: only compact (road, side, pos, house, num) match rows shuffle,
    hash-partitioned by road; each partition computes every interval in
    one lexsort + reduceat pass (``stages/housenum.py``)."""
    import pyarrow.parquet as pq
    import ray

    from ..stages.housenum import N_HOUSE_PARTS, fill_numbers_part

    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    sk = np.asarray(sup["s_suppkey"], np.int64)
    ry = (sk * A_LAT + 777) % SPAN
    rx = (sk * A_LON + 333) % SPAN
    ref = ray.put((sk, ry, rx))

    class MatchHouses:
        def __init__(self, ref):
            self.sk, self.ry, self.rx = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = np.asarray(batch["c_custkey"].combine_chunks(), np.int64)
            hy = (ck * A_LAT) % SPAN
            hx = (ck * A_LON) % SPAN
            d2 = (hy[:, None] - self.ry[None, :]) ** 2 \
                + (hx[:, None] - self.rx[None, :]) ** 2
            comb = d2 * (1 << 20) + self.sk[None, :]
            near = np.argmin(comb, axis=1)
            road = self.sk[near]
            ay, ax = self.ry[near], self.rx[near]
            dy, dx = 1000, 500
            side = np.sign(dx * (hy - ay) - dy * (hx - ax)).astype(np.int64)
            pos = dy * (hy - ay) + dx * (hx - ax)
            return pa.table(
                {
                    "road": pa.array(road, pa.int64()),
                    "side": pa.array(side, pa.int64()),
                    "pos": pa.array(pos, pa.int64()),
                    "house": pa.array(ck, pa.int64()),
                    "num": pa.array((ck * 17) % 200 + 1, pa.int64()),
                    "part": pa.array(road & (N_HOUSE_PARTS - 1), pa.int64()),
                }
            )

    out = (
        stateful_map_batches(
            _read(sf_dir, "customer", ["c_custkey"]),
            MatchHouses,
            fn_kwargs=dict(ref=ref),
            batch_format="pyarrow", batch_size=None,
        )
        .groupby("part")
        .map_groups(fill_numbers_part, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["road", "side"]).reset_index(drop=True).astype(
        "int64"
    )


def q_house_repair(sf_dir: str):
    """ExtNumbers interval self-repair (``ExtNumbers.java:394-427``
    plausibility loop + ``Numbers.isPlausible``, Numbers.java:299-353):
    a deliberately-dirty housenumber fixture — overlapping left/right
    ranges on one road family, a > MAX_DELTA span on another, clean
    roads on a third, and a TWO-JUMP family (road % 4 == 3) whose first
    split leaves a still-implausible part so the loop must run a second
    pass — split at the largest position gap until every (road, part,
    side) Numbers record is plausible. The DuckDB oracle replays the
    same loop with unrolled passes (``_house_repair_sql``); the engine
    runs the general iterative loop
    (``stages/housenum.py::repair_intervals_part``).

    Scale: compact (road, side, pos, house, num) rows hash-partition by
    road; the repair loop runs vectorized per partition."""
    from ..stages.housenum import N_HOUSE_PARTS, repair_intervals_part

    def derive(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        k = k[k % 37 == 0]
        h = k // 37
        road, j = h // 12, h % 12
        v = road % 4
        side = np.where((v == 1) & (j >= 6), 1, -1)
        num = np.select(
            [v == 0, (v == 1) & (j < 6), v == 1,
             (v == 3) & (j < 4), (v == 3) & (j < 8), v == 3, j < 6],
            [2 * j + 1, 10 + j, 8 + j,
             2 * j + 2, 300000 + 2 * j, 600000 + 2 * j, j + 1],
            200000 + j,
        )
        pos = np.select(
            [(v == 1) & (j >= 6), (v == 2) & (j >= 6),
             (v == 3) & (j >= 8), (v == 3) & (j >= 4)],
            [500 + j * 10, 700 + j * 10, 1500 + j * 10, 1000 + j * 10],
            j * 10,
        )
        return pa.table(
            {
                "road": pa.array(road, pa.int64()),
                "side": pa.array(side, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "house": pa.array(k, pa.int64()),
                "num": pa.array(num, pa.int64()),
                "part": pa.array(road & (N_HOUSE_PARTS - 1), pa.int64()),
            }
        )

    out = (
        _read_split(sf_dir, "orders", ["o_orderkey"])
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(
            lambda g: repair_intervals_part(
                g.drop(columns=["part"])
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values(["road", "part", "side"]).reset_index(
        drop=True
    ).astype("int64")


def q_mdr_index(sf_dir: str):
    """MDR street-section index (``combiners/MdrBuilder.java`` +
    ``imgfmt/app/mdr/Mdr7.java:317-340`` + ``Mdr8.java``): streets from
    every tile are collation-sorted globally, consecutive duplicates of
    the same (tile, name) collapse to one record (Mdr7 dedupe), and the
    Mdr8 face maps each 4-byte name prefix to the FIRST record number in
    the section plus the record count and the collation-first name.

    Scale shape: record numbers do NOT need a global sort — records of a
    prefix are contiguous in collation order (the prefix is a prefix of
    the primary sort key), so per-prefix counts + a driver-side cumsum
    over the (tiny, bounded-cardinality) prefix table give exact Mdr8
    offsets. One shuffle of compact (tile, name) rows, hash-partitioned;
    dedupe and per-prefix partials vectorized per partition."""
    import pyarrow.compute as pc

    N_MDR_PARTS = 64

    def derive(batch: pa.Table) -> pd.DataFrame:
        pk = batch["p_partkey"].combine_chunks().cast(pa.int64())
        nm = batch["p_name"].combine_chunks()
        even = pc.equal(pc.bit_wise_and(pk, 1), 0)
        name2 = pc.if_else(even, pc.utf8_upper(nm), nm)
        df = pd.DataFrame(
            {
                "tile": np.asarray(pk, np.int64) % 32,
                "name2": name2.to_pandas(),
            }
        )
        h = pd.util.hash_pandas_object(
            df["tile"].astype(str) + "\x00" + df["name2"], index=False
        ).to_numpy(np.uint64)
        df["part"] = (h & np.uint64(N_MDR_PARTS - 1)).astype(np.int64)
        return df

    def prefix_partial(g: pd.DataFrame) -> pd.DataFrame:
        # one hash partition: global dedupe of (tile, name2) is exact
        # here (hash-partitioned on that pair), then per-prefix partial
        # count + collation-first candidate
        g = g.drop_duplicates(["tile", "name2"])
        low = g["name2"].str.lower()
        out = pd.DataFrame(
            {
                "prefix": low.str.slice(0, 4),
                "low": low,
                "name2": g["name2"],
                "tile": g["tile"],
            }
        )
        out = out.sort_values(
            ["low", "name2", "tile"], ascending=[True, False, True]
        )
        firsts = out.groupby("prefix", sort=False).first().reset_index()
        counts = out.groupby("prefix", sort=False).size().rename("n")
        firsts = firsts.merge(counts, on="prefix")
        return firsts[["prefix", "low", "name2", "tile", "n"]]

    parts = (
        _read(sf_dir, "part", ["p_partkey", "p_name"])
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(prefix_partial, batch_format="pandas")
        .to_pandas()
    )
    # driver combine over the tiny prefix table: counts sum; first =
    # min by (low asc, name2 desc, tile asc); record offsets by cumsum
    parts = parts.sort_values(
        ["prefix", "low", "name2", "tile"],
        ascending=[True, True, False, True],
    )
    n = parts.groupby("prefix", sort=True)["n"].sum()
    first_name = parts.groupby("prefix", sort=True)["name2"].first()
    out = pd.DataFrame(
        {"prefix": n.index, "n_records": n.to_numpy(np.int64),
         "first_name": first_name.to_numpy(object)}
    ).reset_index(drop=True)
    out["first_record"] = (
        1 + np.r_[0, np.cumsum(out["n_records"].to_numpy(np.int64))[:-1]]
    )
    # the part alphabet is case-pair only, so (lower asc, name desc)
    # ordering == the three-strength collation key order (see
    # q_collate_sort's oracle argument)
    return out[["prefix", "first_record", "n_records", "first_name"]]


def q_hook_chain(sf_dir: str):
    """Ordered OSM reading-hook chain (OsmMapDataSource.java:66-78 — "the
    order of the hooks is important!"): HighwayHooks.onAddWay (parse-time
    roundabout→oneway) → MultiPolygonFinishHook (mkgmap:removetags
    deletion) → LinkDestinationHook (destination-hint cascade, direction
    from the POST-roundabout POST-removetags oneway) → ResidentialHook
    (boundary names read AFTER removetags may have deleted them → "yes").
    Every step's output depends on its position in the chain; SQL-exact.

    Scale: four fused map_batches passes, no shuffle; residential
    boundaries are a dimension-sized broadcast via ray.put."""
    import ray

    from ..stages.hooks import (
        ResidentialTagger,
        highway_on_add_way,
        link_destination,
        multipolygon_finish,
    )

    RES_HALF = 3000

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        hw = np.array(
            ["motorway_link", "trunk_link", "motorway", "residential",
             "primary_link", "secondary", "service"], object
        )[k % 7]
        df = pd.DataFrame({"way_id": k, "highway": hw})
        df["junction"] = np.where(k % 5 == 0, "roundabout", None)
        df["oneway"] = np.select(
            [k % 3 == 0, k % 3 == 1], ["yes", "-1"], None
        )
        df["destination"] = np.where(
            k % 4 == 0, np.char.add("D", (k % 10).astype(str)), None
        )
        df["destination:lanes"] = np.select(
            [k % 8 == 2, k % 8 == 6],
            [np.char.add(np.char.add("A", (k % 5).astype(str)), "|B"),
             np.char.add("L", (k % 5).astype(str))],
            None,
        )
        df["destination:lanes:forward"] = np.where(
            k % 6 == 1, np.char.add("F", (k % 3).astype(str)), None
        )
        df["destination:lanes:backward"] = np.where(
            k % 6 == 2, np.char.add("G", (k % 3).astype(str)), None
        )
        df["destination:forward"] = np.where(
            k % 6 == 1, np.char.add("DF", (k % 4).astype(str)), None
        )
        df["destination:backward"] = np.where(
            k % 6 == 2, np.char.add("DB", (k % 4).astype(str)), None
        )
        df["destination:street"] = np.where(
            k % 9 == 3, np.char.add("S", (k % 6).astype(str)), None
        )
        df["name"] = np.where(
            k % 2 == 0, np.char.add("N", (k % 20).astype(str)), None
        )
        df["mkgmap:removetags"] = np.select(
            [k % 10 == 7, k % 10 == 5, k % 10 == 3],
            ["destination", "oneway;destination:street", "name"],
            None,
        )
        df["landuse"] = np.where(k % 11 == 4, "residential", None)
        df["wy"] = (k * A_LAT) % SPAN
        df["wx"] = (k * A_LON) % SPAN
        return df

    REMOVABLE = ("destination", "oneway", "destination:street", "name")

    # residential boundaries need the POST-removetags names, so the
    # broadcast side runs the first two hooks itself (tiny: one scan of
    # the dimension-sized area subset, pruned at the read)
    import pyarrow.parquet as pq

    ok = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    ka = np.asarray(ok["o_orderkey"], np.int64)
    ka = ka[ka % 11 == 4]
    aname = np.where(
        ka % 2 == 0, np.char.add("N", (ka % 20).astype(str)), None
    )
    aname = np.where(ka % 10 == 3, None, aname)  # removetags 'name'
    aname = np.where(pd.isna(aname), "yes", aname).astype(object)
    ay = (ka * A_LAT) % SPAN
    ax = (ka * A_LON) % SPAN
    # instance (task) mode: the bucketed index builds ONCE on the driver
    # and ships by closure — 13k boxes is dimension-sized, and actor-pool
    # spin-up dominated this stage at bench scale (round-2 lesson)
    tagger = ResidentialTagger(
        (ka, aname, ay - RES_HALF, ay + RES_HALF, ax - RES_HALF,
         ax + RES_HALF)
    )

    out = (
        _read_split(sf_dir, "orders", ["o_orderkey"])
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
        .map_batches(highway_on_add_way, batch_format="pandas",
                     batch_size=None)
        .map_batches(lambda b: multipolygon_finish(b, REMOVABLE),
                     batch_format="pandas", batch_size=None)
        .map_batches(link_destination, batch_format="pandas",
                     batch_size=None)
        .map_batches(tagger, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    out = out[["way_id", "oneway", "mkgmap:dest_hint_work",
               "mkgmap:dest_source", "mkgmap:residential"]].rename(
        columns={"mkgmap:dest_hint_work": "dest_hint",
                 "mkgmap:dest_source": "dest_source",
                 "mkgmap:residential": "residential"}
    )
    out["way_id"] = out["way_id"].astype("int64")
    for c in ("oneway", "dest_hint", "dest_source", "residential"):
        out[c] = out[c].astype(object).where(out[c].notna(), "")
    return out.sort_values("way_id").reset_index(drop=True)


def _seg_cumsum(vals: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum: global cumsum minus the running total
    at each segment's start."""
    cs = np.cumsum(vals.astype(np.int64))
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    offs = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0)
    return cs - np.repeat(offs, counts)


def q_rgn_bitstream(sf_dir: str):
    """Garmin RGN delta bitstream face (``imgfmt/app/trergn/
    LinePreparer.java:147-225`` + ``BitWriter.java``): per order a
    deterministic polyline (monotonic / reversed / mixed-sign by
    ``k % 3``) is shift-rounded and bit-packed by the vectorized batch
    encoder; the query reports the wire-level header fields and stream
    length, all of which the SQL oracle recomputes in closed form
    (log2-based ``bitsNeeded``, ``bits2Base``/``base2Bits`` CASE math).
    The bytes themselves are covered by the scalar-vs-vectorized and
    decode-roundtrip tests in tests/test_bitstream.py."""
    from ..stages.bitstream import encode_lines_batch

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        n = 2 + k % 12
        s = k % 4
        off = np.select([k % 3 == 0, k % 3 == 1], [0, 200], 100)
        total = int(n.sum())
        line_of = np.repeat(np.arange(len(k), dtype=np.int64), n)
        j = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n)[:-1])), n
        )
        kr = k[line_of]
        offr = off[line_of]
        ddx = np.where(j == 0, 0, (kr * 31 + j * 17) % 201 - offr)
        ddy = np.where(j == 0, 0, (kr * 57 + j * 23) % 201 - offr)
        x = 524288 + _seg_cumsum(ddx, n)
        y = 524288 + _seg_cumsum(ddy, n)
        offsets = np.concatenate(([0], np.cumsum(n))).astype(np.int32)
        xs = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(x, pa.int64())
        )
        ys = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(y, pa.int64())
        )
        enc = encode_lines_batch(xs, ys, shift=s)
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "xbase": pa.array(enc["xbase"], pa.int64()),
                "ybase": pa.array(enc["ybase"], pa.int64()),
                "x_same": pa.array(enc["x_same"].astype(np.int64)),
                "x_neg": pa.array(enc["x_neg"].astype(np.int64)),
                "y_same": pa.array(enc["y_same"].astype(np.int64)),
                "y_neg": pa.array(enc["y_neg"].astype(np.int64)),
                "n_deltas": pa.array(enc["n_deltas"], pa.int64()),
                "bit_len": pa.array(enc["bit_len"], pa.int64()),
                "byte_len": pa.array(enc["byte_len"], pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_subdiv_tre(sf_dir: str):
    """TRE subdivision record encoding (``imgfmt/app/trergn/
    Subdivision.java:104-137`` + ``Utils.roundUp``): per order a synthetic
    area + resolution; the query emits the encoded center (rounded up to
    a 2^shift multiple) and shifted half-extent width/height, mirrored
    exactly by integer SQL."""
    from ..stages.bitstream import subdivision_records

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        min_lat = (k * 53) % (1 << 22)
        min_lon = (k * 97) % (1 << 22)
        h = 1 + (k * 7) % 60000
        w = 1 + (k * 11) % 60000
        res = 12 + k % 13
        rec = subdivision_records(
            min_lat, min_lat + h, min_lon, min_lon + w, res
        )
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "center_lat": pa.array(rec["center_lat"], pa.int64()),
                "center_lon": pa.array(rec["center_lon"], pa.int64()),
                "width": pa.array(rec["width"], pa.int64()),
                "height": pa.array(rec["height"], pa.int64()),
                "shift": pa.array(rec["shift"], pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def _dem_params(k: np.ndarray):
    """Shared synthetic DEM-section parameters (mirrored in the SQL
    oracles): top/left corner, area size in DEM units, sample distance."""
    return {
        "top": 20000 + k % 1000,
        "left": 30000 + k % 777,
        "ah": 10 + k % 300,
        "aw": 10 + (k * 3) % 300,
        "dist": 2 + k % 3,
    }


def _dem_height_fn(lat: np.ndarray, lon: np.ndarray):
    """Closed-form height field with ~1/127 void points (the gate stand-
    in for RasterSampler over real HGT grids)."""
    h = (lat * 7 + lon * 13) % 509 - 250
    void = (lat * 11 + lon * 17) % 127 == 0
    return h, void


def q_dem_layout(sf_dir: str):
    """DEM section tile-grid layout (``imgfmt/app/dem/DEMSection.java:
    89-139`` ``getTileInfo`` + ``calcTiles`` offsets): per synthetic
    section the full tile grid with per-tile size and top-left corner;
    the SQL oracle mirrors the overlap/round-up/renormalise math."""
    from ..stages.dem import dem_layout

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        k = k[k % 7 == 0]
        p = _dem_params(k)
        lay = dem_layout(p["top"], p["left"], p["ah"], p["aw"], p["dist"])
        sec = lay["section_of"]
        return pa.table(
            {
                "o_orderkey": pa.array(k[sec], pa.int64()),
                "trow": pa.array(lay["row"], pa.int64()),
                "tcol": pa.array(lay["col"], pa.int64()),
                "twidth": pa.array(lay["width"], pa.int64()),
                "theight": pa.array(lay["height"], pa.int64()),
                "lat_off": pa.array(lay["lat_off"], pa.int64()),
                "lon_off": pa.array(lay["lon_off"], pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_dem_tiles(sf_dir: str):
    """Per-tile DEM statistics (``imgfmt/app/dem/DEMTile.java:76-130``):
    base height, max delta, encoding type and void count from sampling
    the closed-form height field at every grid point of every tile."""
    from ..stages.dem import dem_layout, dem_tile_stats

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        k = k[k % 397 == 0]
        p = _dem_params(k)
        lay = dem_layout(p["top"], p["left"], p["ah"], p["aw"], p["dist"])
        st = dem_tile_stats(lay, p["dist"], _dem_height_fn)
        sec = lay["section_of"]
        return pa.table(
            {
                "o_orderkey": pa.array(k[sec], pa.int64()),
                "trow": pa.array(lay["row"], pa.int64()),
                "tcol": pa.array(lay["col"], pa.int64()),
                "base_height": pa.array(st["base_height"], pa.int64()),
                "max_delta": pa.array(st["max_delta"], pa.int64()),
                "enc_type": pa.array(st["enc_type"], pa.int64()),
                "n_void": pa.array(st["n_void"], pa.int64()),
                "n_points": pa.array(st["n_points"], pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_dem_section(sf_dir: str):
    """DEM section header records (``imgfmt/app/dem/DEMSection.java:
    120-183``): min/max height, descriptor byte sizes and the extra-type
    flag folded over the per-tile stats."""
    from ..stages.dem import dem_layout, dem_section_records, dem_tile_stats

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        k = k[k % 397 == 0]
        p = _dem_params(k)
        lay = dem_layout(p["top"], p["left"], p["ah"], p["aw"], p["dist"])
        st = dem_tile_stats(lay, p["dist"], _dem_height_fn)
        rec = dem_section_records(lay, st, len(k))
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "tiles_lat": pa.array(rec["tiles_lat"], pa.int64()),
                "tiles_lon": pa.array(rec["tiles_lon"], pa.int64()),
                "nonstd_height": pa.array(rec["nonstd_height"], pa.int64()),
                "nonstd_width": pa.array(rec["nonstd_width"], pa.int64()),
                "min_height": pa.array(rec["min_height"], pa.int64()),
                "max_height": pa.array(rec["max_height"], pa.int64()),
                "delta_size": pa.array(rec["delta_size"], pa.int64()),
                "base_size": pa.array(rec["base_size"], pa.int64()),
                "has_extra": pa.array(rec["has_extra"], pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_typ_compile(sf_dir: str):
    """TYP text compiler (``mkgmap/typ/TypTextReader.java`` + section
    processors): per part row a generated TYP source (point/line/polygon
    section with labels, font styles, custom colours, an XPM colour
    table for polygons, and a draw-order section for every 11th key) is
    compiled back into the typed element table; the SQL oracle derives
    every parsed field directly from the key."""
    from ..stages.typcompile import compile_typ_batch

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["p_partkey"].combine_chunks(), np.int64)
        kinds = np.select(
            [k % 3 == 0, k % 3 == 1], ["_point", "_line"], "_polygon"
        )
        tv = 32 + (k * 13) % 768
        fonts = np.select(
            [k % 5 == 0, k % 5 == 1, k % 5 == 2, k % 5 == 3],
            ["Default", "NoLabel", "SmallFont", "Normal"],
            "Large",
        )
        s = pd.Series(tv)
        tv_txt = np.where(
            k % 2 == 0, s.map("{:#x}".format), s.map("{}".format)
        )
        day = pd.Series((k * 2654435761) % 0xFFFFFF).map("{:06X}".format)
        c0 = pd.Series((k * 40503) % 0xFFFFFF).map("{:06X}".format)
        c1 = pd.Series((k * 69069) % 0xFFFFFF).map("{:06X}".format)
        label = pd.Series(k % 1000).map("N{}".format)
        head = (
            "[" + pd.Series(kinds) + "]\nType=" + tv_txt
            + "\nString=0x4," + label
            + "\nFontStyle=" + fonts
            + "\nDaycustomColor=#" + day
        )
        xpm = pd.Series(
            np.where(
                k % 3 == 2,
                '\nXpm="0 0 2 0"\n"* c #' + c0 + '"\n'
                + np.where(
                    k % 4 == 0, '"! c None"', '"! c #' + c1 + '"'
                ),
                "",
            )
        )
        draw = pd.Series(
            np.where(
                k % 11 == 0,
                "\n[_draworder]\nType=" + tv_txt + ","
                + pd.Series(1 + k % 8).map("{}".format) + "\n[end]",
                "",
            )
        )
        texts = head + xpm + "\n[end]" + draw
        return compile_typ_batch(k, texts.tolist())

    return _read_split(sf_dir, "part", ["p_partkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_gmapsupp_fat(sf_dir: str):
    """Gmapsupp combiner filesystem math (``combiners/GmapsuppBuilder
    .java`` + ``imgfmt/sys/ImgFS.java:270-316`` + ``ImgHeader.java:
    189-256``): per order a mapset of 1-5 sub-files; the query runs the
    best-block-size scan, FAT slot/contiguous-block allocation and the
    partition CHS geometry, all vectorized across every mapset of the
    batch; the SQL oracle replays the scan over the 15 doubling
    candidates with window functions."""
    from ..stages.gmapsupp import (
        allocate_blocks,
        best_block_size,
        img_filename,
        partition_geometry,
    )

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        n = 1 + k % 5
        gof = np.repeat(np.arange(len(k), dtype=np.int64), n)
        f = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n)[:-1])), n
        )
        kr = k[gof]
        sizes = (1000 + (kr * 31 + f * 977) % 100000) * (
            1 + (kr % 7) * 500
        )
        paths = pd.Series(f).map("{}".format) + pd.Series(kr).map(
            "{}.img".format
        )
        names = img_filename(paths)
        bs, res, tot = best_block_size(sizes, gof, len(k))
        start, nb, slots = allocate_blocks(sizes, gof, bs, res)
        es, heads, sectors, cyls = partition_geometry(tot, bs)
        return pa.table(
            {
                "o_orderkey": pa.array(kr, pa.int64()),
                "fname": pa.array(names, pa.string()),
                "fsize": pa.array(sizes, pa.int64()),
                "nblocks": pa.array(nb, pa.int64()),
                "dir_slots": pa.array(slots, pa.int64()),
                "start_block": pa.array(start, pa.int64()),
                "block_size": pa.array(bs[gof], pa.int64()),
                "reserved": pa.array(res[gof], pa.int64()),
                "total_blocks": pa.array(tot[gof], pa.int64()),
                "end_sector": pa.array(es[gof], pa.int64()),
                "heads": pa.array(heads[gof], pa.int64()),
                "sectors": pa.array(sectors[gof], pa.int64()),
                "cylinders": pa.array(cyls[gof], pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_bnd_roundtrip(sf_dir: str):
    """``BoundarySaver``/``BoundaryUtil`` artifact path (``reader/osm/
    boundary/BoundarySaver.java`` + ``BoundaryUtil.java``): the boundary
    set is SAVED keyed by RASTER cell, then the PIP join runs through
    ``LazyPIPJoin`` actors that read only the cells their probe batches
    touch — the lazy-load layout the reference's LocationHook uses at
    scale. Same oracle as pip_regions: the roundtrip must be lossless."""
    import hashlib
    import os

    from ..stages.pipjoin import LazyPIPJoin, save_boundary_artifact

    polys = [
        (rid, [(np.asarray([y for x, y in pts]), np.asarray([x for x, y in pts]))])
        for rid, pts in PIP_REGIONS
    ]
    digest = hashlib.sha1(repr(PIP_REGIONS).encode()).hexdigest()[:12]
    art = f"/tmp/mkgmap_ray_bnd_{digest}"
    if not os.path.exists(f"{art}/cells.parquet"):
        save_boundary_artifact(polys, art, raster_shift=14)

    def add_coords(batch: pa.Table) -> pa.Table:
        eid = np.asarray(batch["event_id"].combine_chunks(), np.int64)
        lat, lon = event_points_np(eid)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "lat_hp": pa.array(lat, pa.int64()),
                "lon_hp": pa.array(lon, pa.int64()),
            }
        )

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        add_coords, batch_format="pyarrow", batch_size=None
    )
    joined = stateful_map_batches(
        ds, LazyPIPJoin,
        fn_kwargs=dict(artifact_dir=art, raster_shift=14),
        batch_format="pyarrow", batch_size=None,
    )
    out = joined.to_pandas()[["event_id", "boundary_id"]]
    return out.rename(columns={"boundary_id": "region_id"}).astype("int64")


def q_mdr5_cities(sf_dir: str):
    """Mdr5 global city list (``imgfmt/app/mdr/Mdr5.java:52-105``):
    cities sorted by (name, region, country, map); consecutive records
    equal by (map, name) collapse into one global city record, while the
    mdr20 index rises once per distinct NAME run. Collapse is exact
    under a hash partition on the full sort tuple (equal tuples
    co-locate); the driver ranks only the collapsed set."""
    N_PARTS = 64

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        df = pd.DataFrame(
            {
                "name": pd.Series((k * 7) % 500).map("C{:03d}".format),
                "region": pd.Series(k % 7).map("R{}".format),
                "country": pd.Series(k % 3).map("X{}".format),
                "map_index": k % 32,
            }
        )
        h = pd.util.hash_pandas_object(
            df["name"] + df["region"] + df["country"]
            + df["map_index"].astype(str),
            index=False,
        ).to_numpy(np.uint64)
        df["part"] = (h & np.uint64(N_PARTS - 1)).astype(np.int64)
        return df

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["name", "region", "country", "map_index"], sort=False)
            .size()
            .rename("n_dups")
            .reset_index()
        )
        return out

    rows = (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(collapse, batch_format="pandas")
        .to_pandas()
    )
    rows = rows.sort_values(
        ["name", "region", "country", "map_index"]
    ).reset_index(drop=True)
    # consecutive-equal (map, name) collapse over the full sort order
    prev_name = rows["name"].shift()
    prev_map = rows["map_index"].shift()
    new_city = ~((rows["name"] == prev_name) & (rows["map_index"] == prev_map))
    dup_run = (~new_city).to_numpy()
    # fold collapsed runs' duplicate counts into the surviving record
    run_id = np.cumsum(new_city.to_numpy())
    n_dups = rows.groupby(run_id)["n_dups"].sum()
    keep = rows[new_city.to_numpy()].reset_index(drop=True)
    keep["n_dups"] = n_dups.to_numpy(np.int64)
    keep["global_idx"] = np.arange(1, len(keep) + 1, dtype=np.int64)
    keep["mdr20_idx"] = (
        (keep["name"] != keep["name"].shift()).cumsum().astype(np.int64)
    )
    keep["map_index"] = keep["map_index"].astype("int64")
    return keep[
        ["global_idx", "name", "region", "country", "map_index",
         "mdr20_idx", "n_dups"]
    ]


def q_mdr20_streets(sf_dir: str):
    """Mdr20 streets-by-city section (``imgfmt/app/mdr/Mdr20.java:50-95``):
    street records sorted by (city sort position, mdr7 street index), one
    record kept per distinct (city name, street, mdr7 index) run, each
    city taking the record number of the FIRST record of its name section
    as its mdr20 value. Mdr7 indexes are the dense rank of distinct
    (street, map) in (street, map) order. Distinct-collapse runs under a
    hash partition (equal triples co-locate); only the collapsed
    output-sized record set reaches the driver for global ranking."""
    N_PARTS = 64

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        df = pd.DataFrame(
            {
                "street": pd.Series((k * 11) % 300).map("S{:03d}".format),
                "city": pd.Series((k * 7) % 50).map("C{:02d}".format),
                "map_index": k % 16,
            }
        )
        h = pd.util.hash_pandas_object(
            df["street"] + df["city"] + df["map_index"].astype(str),
            index=False,
        ).to_numpy(np.uint64)
        df["part"] = (h & np.uint64(N_PARTS - 1)).astype(np.int64)
        return df

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["street", "city", "map_index"])[
            ["street", "city", "map_index"]
        ]

    recs = (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(collapse, batch_format="pandas")
        .to_pandas()
    )
    # mdr7 index: dense rank of distinct (street, map)
    pairs = recs[["street", "map_index"]].drop_duplicates().sort_values(
        ["street", "map_index"]
    )
    pairs["mdr7_idx"] = np.arange(1, len(pairs) + 1, dtype=np.int64)
    recs = recs.merge(pairs, on=["street", "map_index"])
    # section walk: sort by (city name, mdr7 index); with distinct
    # triples every row is a kept record (the reference's repeat-collapse
    # fires only for same (city name, street, index) duplicates)
    recs = recs.sort_values(["city", "mdr7_idx"]).reset_index(drop=True)
    recs["record"] = np.arange(1, len(recs) + 1, dtype=np.int64)
    recs["mdr20"] = recs.groupby("city")["record"].transform("min")
    recs["map_index"] = recs["map_index"].astype("int64")
    return recs[
        ["record", "city", "street", "map_index", "mdr7_idx", "mdr20"]
    ]


def q_mdr10_pois(sf_dir: str):
    """Mdr10/11 POI master list + type groups (``imgfmt/app/mdr/
    Mdr11.java:57-75`` name+map sort; ``MdrUtils.getGroupForPoi``,
    ``MdrUtils.java:41-66``): each POI gets its 1-based record number in
    (name, map, key) order plus its type group; per-group first-record
    and counts are the Mdr10 face."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        sel = k % 6
        full = np.select(
            [sel == 0, sel == 1, sel == 2, sel == 3, sel == 4],
            [0x04, 0x2A00 + (k % 3), 0x2D00, 0x2800, 0x6400],
            0x2B00,
        )
        typ = np.where((full & 0xFFF00) > 0, (full >> 8) & 0xFFF, full & 0xFF)
        grp = np.select(
            [
                full <= 0xF,
                (typ >= 0x2A) & (typ <= 0x30),
                typ == 0x28,
                (typ >= 0x64) & (typ <= 0x66),
            ],
            [1, typ - 0x28, 9, typ - 0x59],
            0,
        )
        return pd.DataFrame(
            {
                "k": k,
                "name": pd.Series((k * 11) % 300).map("P{:03d}".format),
                "map_index": k % 32,
                "full_type": full,
                "grp": grp,
            }
        )

    rows = (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    rows = rows.sort_values(["name", "map_index", "k"]).reset_index(drop=True)
    rows["record_no"] = np.arange(1, len(rows) + 1, dtype=np.int64)
    rows["map_index"] = rows["map_index"].astype("int64")
    rows["grp"] = rows["grp"].astype("int64")
    g = rows.groupby("grp")
    face = pd.DataFrame(
        {
            "first_record": g["record_no"].min(),
            "n_pois": g.size(),
        }
    ).reset_index()
    out = rows.merge(face, on="grp")
    return out[
        ["k", "name", "map_index", "full_type", "grp", "record_no",
         "first_record", "n_pois"]
    ].rename(columns={"k": "o_orderkey"})


def _mdr_poi_rows(sf_dir: str) -> pd.DataFrame:
    """Shared POI fixture for the Mdr9/Mdr10/Mdr1 faces (same type/
    group/name math as ``q_mdr10_pois``), with the mdr11 record number
    ((name, map, key) order, ``Mdr11.java:57-75``) already assigned."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        sel = k % 6
        full = np.select(
            [sel == 0, sel == 1, sel == 2, sel == 3, sel == 4],
            [0x04, 0x2A00 + (k % 3), 0x2D00, 0x2800, 0x6400],
            0x2B00,
        )
        typ = np.where((full & 0xFFF00) > 0, (full >> 8) & 0xFFF, full & 0xFF)
        grp = np.select(
            [
                full <= 0xF,
                (typ >= 0x2A) & (typ <= 0x30),
                typ == 0x28,
                (typ >= 0x64) & (typ <= 0x66),
            ],
            [1, typ - 0x28, 9, typ - 0x59],
            0,
        )
        return pd.DataFrame(
            {
                "k": k,
                "name": pd.Series((k * 11) % 300).map("P{:03d}".format),
                "map_index": k % 32,
                "full_type": full,
                "grp": grp,
            }
        )

    rows = (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    rows = rows.sort_values(["name", "map_index", "k"]).reset_index(drop=True)
    rows["mdr11_rec"] = np.arange(1, len(rows) + 1, dtype=np.int64)
    return rows


def q_mdr9_groups(sf_dir: str):
    """Mdr9 POI-type group index (``imgfmt/app/mdr/Mdr9.java:60-67``
    ``setGroups`` offset accumulation over ``Mdr10.getGroupSizes``;
    ``Mdr10.java:50-95`` group filter/sort/subtype/top-bit): group-0
    POIs are skipped, mdr10 records lie group-major in mdr11-record
    order, subtype is the full type for group 1 else
    ``getSubtypeFromFullType`` (``MdrUtils.java:84-86``), ``is_new``
    mirrors the non-repeated-name top bit (name+subtype vs the previous
    record, reset per group), and ``item_size`` is 1 + the byte width
    of an mdr10 record pointer (``Mdr9.getItemSize``)."""
    rows = _mdr_poi_rows(sf_dir)
    poi = rows[rows["grp"] > 0].copy()
    full = poi["full_type"].to_numpy(np.int64)
    poi["subtype"] = np.where(
        poi["grp"].to_numpy(np.int64) == 1,
        full,
        np.where(full < 0xFF, 0, full & 0xFF),
    )
    poi = poi.sort_values(["grp", "mdr11_rec"]).reset_index(drop=True)
    poi["mdr10_rec"] = np.arange(1, len(poi) + 1, dtype=np.int64)
    same = (
        (poi["name"] == poi["name"].shift())
        & (poi["subtype"] == poi["subtype"].shift())
        & (poi["grp"] == poi["grp"].shift())
    )
    poi["is_new"] = (~same.fillna(False)).astype(np.int64)
    g = poi.groupby("grp")
    poi["grp_first"] = g["mdr10_rec"].transform("min")
    poi["grp_n"] = g["mdr10_rec"].transform("size").astype(np.int64)
    total = len(poi)
    poi["item_size"] = 1 + (
        1 + (total >= 1 << 8) + (total >= 1 << 16) + (total >= 1 << 24)
    )
    out = poi[
        ["k", "grp", "subtype", "mdr11_rec", "mdr10_rec", "grp_first",
         "grp_n", "is_new", "item_size"]
    ].rename(columns={"k": "o_orderkey"})
    return out.astype("int64")


def q_mdr1_reverse(sf_dir: str):
    """Mdr1 per-map reverse index (``imgfmt/app/mdr/Mdr1.java:22-80``:
    one record per map with an offset to its sub-section of record
    numbers; ``Mdr10.writeSectData`` feeds sub2 via ``addIndexPointer
    (mapIndex, count)``): per map the count of its mdr10 pointers, the
    1-based offset where its sub-section starts in the concatenated
    pointer stream (maps written in map order), and the pointer-sum
    face so the oracle checks the actual record numbers, not just
    counts."""
    rows = _mdr_poi_rows(sf_dir)
    poi = rows[rows["grp"] > 0].copy()
    poi = poi.sort_values(["grp", "mdr11_rec"]).reset_index(drop=True)
    poi["mdr10_rec"] = np.arange(1, len(poi) + 1, dtype=np.int64)
    g = poi.groupby("map_index", sort=True)
    out = pd.DataFrame(
        {
            "n_records": g.size().astype(np.int64),
            "rec_sum": g["mdr10_rec"].sum().astype(np.int64),
        }
    ).reset_index()
    out["index_offset"] = (
        1 + np.r_[0, np.cumsum(out["n_records"].to_numpy(np.int64))[:-1]]
    )
    return out[
        ["map_index", "n_records", "index_offset", "rec_sum"]
    ].astype("int64")


def q_predict_points(sf_dir: str):
    """``PredictFilterPoints.predictedMaxNumPoints`` (``filters/
    PredictFilterPoints.java:18-52``): per synthetic polyline and
    resolution, the count of points surviving the filters'
    +half-and-mask rounding (first point always, then every rounded
    change). Closed-form integer coordinates so the SQL oracle replays
    the same rounding with lag()."""
    from ..splitter import predicted_num_points

    RESOLUTIONS = (16, 18, 20, 24)

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        m = 2 + k % 6
        offsets = np.r_[0, np.cumsum(m)]
        total = int(offsets[-1])
        j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], m)
        kk = np.repeat(k, m)
        lat = (kk % 1024) * 64 + j * (kk % 32)
        lon = ((kk * 7) % 1024) * 64 + j * ((kk * 3) % 16)
        outs = []
        for r in RESOLUTIONS:
            outs.append(
                pa.table(
                    {
                        "o_orderkey": pa.array(k, pa.int64()),
                        "resolution": pa.array(
                            np.full(len(k), r, np.int64), pa.int64()
                        ),
                        "n_pred": pa.array(
                            predicted_num_points(lat, lon, offsets, r),
                            pa.int64(),
                        ),
                    }
                )
            )
        return pa.concat_tables(outs)

    out = (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(fn, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    return out.sort_values(["o_orderkey", "resolution"]).reset_index(
        drop=True
    )


def _mdr_distinct(sf_dir: str, derive, subset, n_parts: int = 64):
    """Distributed distinct-collapse used by the MDR section fixtures:
    derive per-batch rows, hash-partition on the collapse tuple so equal
    tuples co-locate, drop duplicates per partition. Only the collapsed
    (output-sized) set reaches the driver for global ranking — the scale
    shape all Mdr faces share (index cardinality ≪ input rows)."""

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        key = df[subset[0]].astype(str)
        for c in subset[1:]:
            key = key + "\x00" + df[c].astype(str)
        h = pd.util.hash_pandas_object(key, index=False).to_numpy(np.uint64)
        df["part"] = (h & np.uint64(n_parts - 1)).astype(np.int64)
        return df

    def collapse(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset)[subset]

    return (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(
            lambda b: add_part(derive(b)), batch_format="pyarrow",
            batch_size=None,
        )
        .groupby("part")
        .map_groups(collapse, batch_format="pandas")
        .to_pandas()
    )


def q_mdr13_regions(sf_dir: str):
    """Mdr13 per-map region records + Mdr28 distinct-name region index +
    Mdr23 sorted walk (``imgfmt/app/mdr/Mdr13.java:42-49`` sort by
    ``(map<<16)+region``; ``Mdr28.java:33-58`` one record per distinct
    name in (name, map) order; ``Mdr23.java:35-53`` record++ per new
    (map, name), each region's mdr28 keeping the LAST record of its name
    run). Fixture: distinct (map, region) pairs derived from order keys;
    name is a function of the region index so the name runs are exact."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        return pd.DataFrame(
            {
                "map_index": (k % 16).astype(np.int64),
                "region_idx": (1 + k % 20).astype(np.int64),
            }
        )

    rows = _mdr_distinct(sf_dir, derive, ["map_index", "region_idx"])
    rows["country_idx"] = (1 + rows["region_idx"] % 5).astype(np.int64)
    rows["name"] = rows["region_idx"].map("R{:02d}".format)
    # Mdr13 record order: (mapIndex << 16) + regionIndex
    rows = rows.sort_values(["map_index", "region_idx"]).reset_index(
        drop=True
    )
    rows["mdr13_rec"] = np.arange(1, len(rows) + 1, dtype=np.int64)
    # Mdr23/Mdr28 walk: sortList keys (name, mapIndex); every (map, name)
    # pair here is distinct so each row is a kept mdr23 record
    m23 = rows.sort_values(["name", "map_index"]).reset_index(drop=True)
    m23["mdr23_rec"] = np.arange(1, len(m23) + 1, dtype=np.int64)
    m23["mdr28_idx"] = (
        (m23["name"] != m23["name"].shift()).cumsum().astype(np.int64)
    )
    m23["mdr28_mdr23"] = (
        m23.groupby("name")["mdr23_rec"].transform("max").astype(np.int64)
    )
    out = m23.sort_values("mdr13_rec").reset_index(drop=True)
    return out[
        ["map_index", "region_idx", "country_idx", "name", "mdr13_rec",
         "mdr23_rec", "mdr28_idx", "mdr28_mdr23"]
    ]


def q_mdr29_countries(sf_dir: str):
    """Mdr14 per-map country records + Mdr29 distinct-name country index
    + Mdr24 sorted walk (``Mdr14Record.compareTo``: ``(map<<16)+country``;
    ``Mdr29.java:30-50``; ``Mdr24.java:33-52``: record++ per new
    (map, name), the mdr29 record keeping the LAST record of its name
    run)."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        return pd.DataFrame(
            {
                "map_index": (k % 32).astype(np.int64),
                "country_idx": (1 + k % 7).astype(np.int64),
            }
        )

    rows = _mdr_distinct(sf_dir, derive, ["map_index", "country_idx"])
    rows["name"] = rows["country_idx"].map("X{:d}".format)
    rows = rows.sort_values(["map_index", "country_idx"]).reset_index(
        drop=True
    )
    rows["mdr14_rec"] = np.arange(1, len(rows) + 1, dtype=np.int64)
    m24 = rows.sort_values(["name", "map_index"]).reset_index(drop=True)
    m24["mdr24_rec"] = np.arange(1, len(m24) + 1, dtype=np.int64)
    m24["mdr29_idx"] = (
        (m24["name"] != m24["name"].shift()).cumsum().astype(np.int64)
    )
    m24["mdr29_mdr24"] = (
        m24.groupby("name")["mdr24_rec"].transform("max").astype(np.int64)
    )
    out = m24.sort_values("mdr14_rec").reset_index(drop=True)
    return out[
        ["map_index", "country_idx", "name", "mdr14_rec", "mdr24_rec",
         "mdr29_idx", "mdr29_mdr24"]
    ]


def q_mdr2x_streets(sf_dir: str):
    """Mdr21 streets-by-region / Mdr22 streets-by-country
    (``Mdr2x.java`` shared walk; ``Mdr21.java:28-58``/``Mdr22.java:
    28-62``: sort by (city's region/country sort position =
    ``Mdr5.calcMdr21SortPos``/``calcMdr22SortPos`` dense rank of the
    group name, mdr7 street index), keep a record only when the street
    index CHANGES — the lastIndex check runs across group boundaries —
    and the group's mdr28/mdr29 value keeps the LAST kept record of its
    run). Cities with no region are absent from Mdr21 (``Mdr21.java:
    31-33``). mdr7 index = dense rank of distinct (street, map) as in
    ``q_mdr20_streets``; ties at (sort pos, index) break by city name
    (collation order of the mdr7 list)."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        city_num = (k * 7) % 50
        return pd.DataFrame(
            {
                "street": pd.Series((k * 11) % 300).map("S{:03d}".format),
                "city": pd.Series(city_num).map("C{:02d}".format),
                "map_index": (k % 16).astype(np.int64),
                "region_num": (city_num % 7).astype(np.int64),
                "country": pd.Series(city_num % 3).map("X{:d}".format),
            }
        )

    recs = _mdr_distinct(
        sf_dir, derive,
        ["street", "city", "map_index", "region_num", "country"],
    )
    # mdr7 index: dense rank of distinct (street, map)
    pairs = recs[["street", "map_index"]].drop_duplicates().sort_values(
        ["street", "map_index"]
    )
    pairs["mdr7_idx"] = np.arange(1, len(pairs) + 1, dtype=np.int64)
    recs = recs.merge(pairs, on=["street", "map_index"])
    recs["region"] = recs["region_num"].map("R{:d}".format)

    def walk(sub: pd.DataFrame, grp_col: str, section: int) -> pd.DataFrame:
        # group sort position = dense rank of the group name
        pos = sub[grp_col].rank(method="dense").astype(np.int64)
        sub = sub.assign(pos=pos).sort_values(
            ["pos", "mdr7_idx", "city", "map_index"]
        ).reset_index(drop=True)
        kept = (
            sub["mdr7_idx"] != sub["mdr7_idx"].shift()
        ).to_numpy()
        sub["record"] = np.cumsum(kept).astype(np.int64)
        sub = sub[kept].copy()
        sub["grp_val"] = (
            sub.groupby(grp_col)["record"].transform("max").astype(np.int64)
        )
        sub["section"] = np.int64(section)
        sub["grp"] = sub[grp_col]
        return sub[
            ["section", "record", "street", "city", "map_index",
             "mdr7_idx", "grp", "grp_val"]
        ]

    m21 = walk(recs[recs["region_num"] > 0].copy(), "region", 21)
    m22 = walk(recs.copy(), "country", 22)
    out = pd.concat([m21, m22], ignore_index=True)
    return out.sort_values(["section", "record"]).reset_index(drop=True)


def q_mdr25_cities(sf_dir: str):
    """Mdr25 cities-sorted-by-country / Mdr27 cities-sorted-by-region
    (``Mdr25.java:31-66``: sort the global city list by (country name,
    global index), collapse consecutive equal (name, region) records,
    the country's mdr29 keeping its FIRST kept record; ``Mdr27.java:
    30-58``: region-city list sorted by (region name, global index),
    every record kept, the region's mdr28 keeping the record where its
    name first appears). Global city list and index are
    ``q_mdr5_cities``'s collapsed set."""
    cities = q_mdr5_cities(sf_dir)[
        ["global_idx", "name", "region", "country"]
    ].copy()

    m25 = cities.sort_values(["country", "global_idx"]).reset_index(
        drop=True
    )
    prev = m25[["name", "region"]].shift()
    kept = ~(
        (m25["name"] == prev["name"]) & (m25["region"] == prev["region"])
    )
    m25["record"] = np.cumsum(kept.to_numpy()).astype(np.int64)
    m25 = m25[kept.to_numpy()].copy()
    m25["grp"] = m25["country"]
    m25["grp_val"] = (
        m25.groupby("country")["record"].transform("min").astype(np.int64)
    )
    m25["section"] = np.int64(25)

    m27 = cities.sort_values(["region", "global_idx"]).reset_index(
        drop=True
    )
    m27["record"] = np.arange(1, len(m27) + 1, dtype=np.int64)
    m27["grp"] = m27["region"]
    m27["grp_val"] = (
        m27.groupby("region")["record"].transform("min").astype(np.int64)
    )
    m27["section"] = np.int64(27)

    cols = ["section", "record", "global_idx", "name", "region",
            "country", "grp", "grp_val"]
    out = pd.concat([m25[cols], m27[cols]], ignore_index=True)
    return out.sort_values(["section", "record"]).reset_index(drop=True)


def q_mdr15_strings(sf_dir: str):
    """Mdr15 string table (``Mdr15.java:createString``): every name is
    written once at its FIRST use, offsets are cumulative byte positions
    (``nextOffset += len + 1`` with a leading NUL so offsets start at 1).
    ``MDRFile`` creates strings map-major (addCountry/addRegion/addCity/
    addPoint/addStreet per map, ``MDRFile.java:156-262``); the analogue's
    insertion order is (map, kind, name) over the distinct per-map record
    sets."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        m = (k % 32).astype(np.int64)
        frames = [
            pd.DataFrame({"map_index": m, "kind": np.int64(0),
                          "name": pd.Series(k % 3).map("X{:d}".format)}),
            pd.DataFrame({"map_index": m, "kind": np.int64(1),
                          "name": pd.Series(k % 7).map("R{:d}".format)}),
            pd.DataFrame({"map_index": m, "kind": np.int64(2),
                          "name": pd.Series((k * 7) % 500).map(
                              "C{:03d}".format)}),
            pd.DataFrame({"map_index": m, "kind": np.int64(3),
                          "name": pd.Series((k * 11) % 300).map(
                              "P{:03d}".format)}),
            pd.DataFrame({"map_index": m, "kind": np.int64(4),
                          "name": pd.Series((k * 11) % 300).map(
                              "S{:03d}".format)}),
        ]
        return pd.concat(frames, ignore_index=True)

    rows = _mdr_distinct(sf_dir, derive, ["map_index", "kind", "name"])
    rows = rows.sort_values(["map_index", "kind", "name"]).reset_index(
        drop=True
    )
    rows["seq"] = np.arange(1, len(rows) + 1, dtype=np.int64)
    firsts = rows.loc[rows.groupby("name")["seq"].idxmin()].sort_values(
        "seq"
    ).reset_index(drop=True)
    lens = firsts["name"].str.len().to_numpy(np.int64)
    firsts["str_off"] = 1 + np.r_[0, np.cumsum(lens + 1)[:-1]]
    firsts["str_len"] = lens
    out = firsts.rename(
        columns={"map_index": "first_map", "kind": "first_kind"}
    )
    return out[
        ["name", "str_off", "str_len", "first_map", "first_kind"]
    ].reset_index(drop=True)


def q_mdr17_prefix(sf_dir: str):
    """Mdr17 device prefix indexes (``Mdr17.java``/``PrefixIndex.java:
    createFromList``): walk a name-sorted record list, emit an index
    record whenever the length-``p`` prefix advances, pointing at the
    1-based input record where the run starts. Streets use prefix length
    4, cities length 2 (``Mdr17.java:20-23``). Street names here carry a
    W-suffix so the 4-char prefix genuinely groups runs."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        a = (k * 11) % 40
        b = k % 90
        return pd.DataFrame(
            {
                "street": pd.Series(a * 100 + b).map(
                    lambda v: "S{:03d}W{:02d}".format(v // 100, v % 100)
                ),
                "city": pd.Series((k * 7) % 50).map("C{:02d}".format),
                "map_index": (k % 16).astype(np.int64),
            }
        )

    recs = _mdr_distinct(sf_dir, derive, ["street", "city", "map_index"])

    def prefix_walk(names: pd.DataFrame, col: str, plen: int,
                    section: int) -> pd.DataFrame:
        lst = names.sort_values([col, "map_index"]).reset_index(drop=True)
        lst["in_rec"] = np.arange(1, len(lst) + 1, dtype=np.int64)
        lst["prefix"] = lst[col].str[:plen]
        new = (lst["prefix"] != lst["prefix"].shift()).to_numpy()
        idx = lst[new].copy()
        idx["out_rec"] = np.arange(1, len(idx) + 1, dtype=np.int64)
        n = lst.groupby("prefix")["in_rec"].size().rename("n")
        idx = idx.merge(n, on="prefix")
        idx["section"] = np.int64(section)
        return idx[["section", "out_rec", "prefix", "in_rec", "n"]]

    streets = recs[["street", "map_index"]].drop_duplicates()
    cities = recs[["city", "map_index"]].drop_duplicates()
    out = pd.concat(
        [
            prefix_walk(streets, "street", 4, 0),
            prefix_walk(cities, "city", 2, 1),
        ],
        ignore_index=True,
    )
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["section", "out_rec"]).reset_index(drop=True)


def q_mdr19_types(sf_dir: str):
    """Mdr19 POIs-sorted-by-type + Mdr18 type boundaries (``Mdr19.java:
    preWriteImpl`` natural-type sort, stable on the mdr11 record order;
    ``writeSectData``: name-change flag per record, an Mdr18 record at
    every type change holding the FIRST mdr19 record of the type run;
    ``MdrUtils.fullTypeToNaturalType``: ``type << 5 | (full & 0x1f)``
    for extended types)."""
    rows = _mdr_poi_rows(sf_dir)
    poi = rows[rows["grp"] > 0].copy()
    full = poi["full_type"].to_numpy(np.int64)
    typ = np.where((full & 0xFFF00) > 0, (full >> 8) & 0xFFF, full & 0xFF)
    sub = np.where((full & ~0xFF) != 0, full & 0x1F, 0)
    poi["natural_type"] = (typ << 5) | sub
    poi = poi.sort_values(["natural_type", "mdr11_rec"]).reset_index(
        drop=True
    )
    poi["mdr19_rec"] = np.arange(1, len(poi) + 1, dtype=np.int64)
    poi["name_flag"] = (
        poi["name"] != poi["name"].shift()
    ).astype(np.int64)
    poi["type_first"] = (
        poi.groupby("natural_type")["mdr19_rec"].transform("min")
        .astype(np.int64)
    )
    out = poi[
        ["k", "natural_type", "mdr19_rec", "mdr11_rec", "name_flag",
         "type_first"]
    ].rename(columns={"k": "o_orderkey"})
    return out.astype("int64")


def q_mdr4_types(sf_dir: str):
    """Mdr4 POI-type list (``imgfmt/app/mdr/Mdr4.java:37-49``: distinct
    (type, unknown=0, subtype) triples sorted by ``Mdr4Record.compareTo``
    = ``((type<<8)+subtype) & 0xffff``, 3 bytes per record). Fixture:
    full types with a subtype spread so the distinct set exercises both
    simple (< 0x100, subtype 0) and extended types."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        sel = k % 6
        full = np.select(
            [sel == 0, sel == 1, sel == 2, sel == 3, sel == 4],
            [0x04, 0x2A00 + (k % 7), 0x2D00 + (k % 4), 0x2800,
             0x6400 + (k % 5)],
            0x2B00 + (k % 3),
        )
        typ = np.where(full > 0xFF, (full >> 8) & 0xFF, full)
        sub = np.where(full > 0xFF, full & 0xFF, 0)
        return pd.DataFrame({"type": typ, "subtype": sub})

    rows = _mdr_distinct(sf_dir, derive, ["type", "subtype"])
    rows["sort_key"] = (
        ((rows["type"].to_numpy(np.int64) << 8)
         + rows["subtype"].to_numpy(np.int64)) & 0xFFFF
    )
    rows = rows.sort_values("sort_key").reset_index(drop=True)
    rows["mdr4_rec"] = np.arange(1, len(rows) + 1, dtype=np.int64)
    rows["unknown"] = np.int64(0)
    rows["item_size"] = np.int64(3)
    return rows[
        ["mdr4_rec", "type", "unknown", "subtype", "sort_key", "item_size"]
    ].astype("int64")


def q_mdr6_zips(sf_dir: str):
    """Mdr6 zip-code section (``imgfmt/app/mdr/Mdr6.java:40-64``: one
    record per (map, zip) = map index + per-map LBL zip index + Mdr15
    string offset, records name-sorted via ``MdrUtils.sortList``).
    Per-map zip index = the LBL creation rank (codes sorted within the
    map); every name is 5 chars so the zip string sub-table offsets are
    ``1 + 6*(name_rank-1)`` (len+1 per string, table starts with a
    NUL — ``Mdr15.java`` nextOffset convention)."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        return pd.DataFrame(
            {
                "map_index": (k % 24).astype(np.int64),
                "zip_num": ((k * 13) % 60).astype(np.int64),
            }
        )

    rows = _mdr_distinct(sf_dir, derive, ["map_index", "zip_num"])
    rows["name"] = rows["zip_num"].map("Z{:04d}".format)
    rows["zip_index"] = (
        rows.groupby("map_index")["zip_num"].rank(method="dense")
        .astype(np.int64)
    )
    rows = rows.sort_values(["name", "map_index"]).reset_index(drop=True)
    rows["mdr6_rec"] = np.arange(1, len(rows) + 1, dtype=np.int64)
    name_rank = rows["name"].rank(method="dense").astype(np.int64)
    rows["str_off"] = 1 + 6 * (name_rank - 1)
    return rows[
        ["mdr6_rec", "map_index", "zip_index", "name", "str_off"]
    ].reset_index(drop=True)


def q_mdr12_prefix(sf_dir: str):
    """Mdr12 POI-name prefix index (``imgfmt/app/mdr/Mdr12.java``:
    ``Mdr8`` over the mdr11 POI list — each 4-byte name prefix maps to
    the FIRST mdr11 record of its run plus the record count; the
    associated size is the POI pointer size)."""
    rows = _mdr_poi_rows(sf_dir)
    rows["prefix"] = rows["name"].str[:4]
    g = rows.groupby("prefix", sort=True)
    out = pd.DataFrame(
        {
            "first_rec": g["mdr11_rec"].min().astype(np.int64),
            "n_records": g.size().astype(np.int64),
        }
    ).reset_index()
    return out[["prefix", "first_rec", "n_records"]]


def q_mdr26_sort(sf_dir: str):
    """Mdr26 regions-sorted-by-country (``imgfmt/app/mdr/Mdr26.java:
    35-67``: the Mdr28 region-name records re-ordered by their Mdr14
    country name with the mdr28 record number as tiebreak; each new
    country name stamps its Mdr29 record with the FIRST mdr26 position
    of the run). Fixture = the ``q_mdr13_regions`` universe, where each
    distinct region name maps to one country."""

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        return pd.DataFrame(
            {"region_idx": (1 + k % 20).astype(np.int64)}
        )

    regs = _mdr_distinct(sf_dir, derive, ["region_idx"])
    regs["name"] = regs["region_idx"].map("R{:02d}".format)
    regs["country"] = (1 + regs["region_idx"] % 5).map("X{:d}".format)
    # mdr28 record order: the (name)-sorted walk of q_mdr13_regions
    regs = regs.sort_values("name").reset_index(drop=True)
    regs["mdr28_idx"] = np.arange(1, len(regs) + 1, dtype=np.int64)
    m26 = regs.sort_values(["country", "mdr28_idx"]).reset_index(drop=True)
    m26["mdr26_rec"] = np.arange(1, len(m26) + 1, dtype=np.int64)
    m26["mdr29_mdr26"] = (
        m26.groupby("country")["mdr26_rec"].transform("min")
        .astype(np.int64)
    )
    return m26[
        ["mdr26_rec", "mdr28_idx", "name", "country", "mdr29_mdr26"]
    ].reset_index(drop=True)


def q_overlay_expand(sf_dir: str):
    """``OverlayReader`` 1→N flat-map (``osmstyle/OverlayReader.java``:
    a styled element whose type has an overlay list is replaced by one
    element per overlaid type, in list order) — the vectorized
    ``apply_overlays`` stage over a closed-form gtype fixture."""
    from ..stages.stylestage import apply_overlays

    OVERLAYS = {2: (0x20, 0x21), 5: (0x30, 0x31, 0x32)}

    def derive(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "gtype": pa.array((1 + k % 8).astype(np.int32), pa.int32()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        derive, batch_format="pyarrow", batch_size=None
    )
    out = apply_overlays(ds, OVERLAYS).to_pandas()
    out["gtype"] = out["gtype"].astype("int64")
    return out.sort_values(["o_orderkey", "gtype"]).reset_index(drop=True)


def q_cycleway_synth(sf_dir: str):
    """``makeCycleWay`` 1→2 flat-map (``StyledConverter.java:352-357,
    549-571``): ways tagged ``mkgmap:make-cycle-way=yes`` emit a
    synthesized copy (access=no, bicycle=yes, oneway=no,
    mkgmap:synthesised=yes, explicit access tags stripped) while the
    original gets bicycle=no and loses the trigger tag."""
    from ..stages.stylestage import make_cycle_ways

    def derive(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        df = pd.DataFrame({"way_id": k})
        df["mkgmap:make-cycle-way"] = np.where(k % 4 == 0, "yes", None)
        df["oneway"] = np.where(k % 3 == 0, "yes", None)
        df["foot"] = np.where(k % 5 == 0, "no", None)
        df["bicycle"] = np.where(k % 7 == 0, "designated", None)
        return df

    out = (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(derive, batch_format="pyarrow", batch_size=None)
        .map_batches(make_cycle_ways, batch_format="pandas",
                     batch_size=None)
        .to_pandas()
    )
    cols = ["bicycle", "access", "oneway", "foot", "mkgmap:synthesised"]
    for c in cols:
        if c not in out.columns:
            out[c] = pd.NA
        out[c] = out[c].astype(object).where(out[c].notna(), "")
    out = out[["way_id"] + cols].rename(
        columns={"mkgmap:synthesised": "synthesised"}
    )
    out["way_id"] = out["way_id"].astype("int64")
    return out.sort_values(["way_id", "synthesised"]).reset_index(drop=True)


def q_name_finder(sf_dir: str):
    """``NameFinder`` label priority (``osmstyle/NameFinder.java``): the
    label is the first present tag of the ``name-tag-list`` — vectorized
    coalesce over closed-form tag columns."""
    from ..style.rules import finder_name

    def fn(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        n = len(k)
        tags = {
            "name": pd.Series(
                np.where(k % 2 == 0, np.char.add("NM", (k % 50).astype(str)),
                         None), dtype="string"),
            "place_name": pd.Series(
                np.where(k % 3 == 0, np.char.add("PL", (k % 40).astype(str)),
                         None), dtype="string"),
            "loc_name": pd.Series(
                np.where(k % 5 == 0, np.char.add("LC", (k % 30).astype(str)),
                         None), dtype="string"),
        }
        lbl = finder_name(tags, n)
        return pd.DataFrame(
            {
                "o_orderkey": k,
                "label": lbl.astype(object).where(lbl.notna(), ""),
            }
        )

    return (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(fn, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


def q_prefix_suffix(sf_dir: str):
    """``PrefixSuffixFilter`` Garmin road-label separators
    (``osmstyle/PrefixSuffixFilter.java:205-265``): a known prefix
    ending in a blank replaces the blank with 0x1e (else 0x1b after
    it); a known suffix starting with a blank replaces it with 0x1f
    (else 0x1c before it). Labels are dictionary-distinct per batch —
    the filter runs once per distinct (label, country), the row stream
    indexes the result (the label-dedup scale shape)."""
    from ..stages.labelenc import prefix_suffix_filter

    LABELS = [
        ("Rue de la Paix", "FRA"),
        ("Avenue Foch", "FRA"),
        ("The Mall", "GBR"),
        ("Baker Street", "GBR"),
        ("Hauptstrasse", "DEU"),
        ("Am Ring", "DEU"),
    ]
    FILTERED = np.asarray(
        [prefix_suffix_filter(lb, co) for lb, co in LABELS], object
    )
    RAW = np.asarray([lb for lb, _ in LABELS], object)
    CTY = np.asarray([co for _, co in LABELS], object)

    def fn(batch: pa.Table) -> pd.DataFrame:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        sel = k % 6
        return pd.DataFrame(
            {
                "o_orderkey": k,
                "label": RAW[sel],
                "country": CTY[sel],
                "filtered": FILTERED[sel],
            }
        )

    return (
        _read(sf_dir, "orders", ["o_orderkey"])
        .map_batches(fn, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


def q_round_obsolete(sf_dir: str):
    """``RoundCoordsFilter`` + ``RemoveObsoletePointsFilter``
    (``filters/RoundCoordsFilter.java`` +half-and-mask snap;
    ``RemoveObsoletePointsFilter.java`` collinear-middle removal): each
    order carries a 5-point polyline whose hp coords are grid values
    plus a sub-half jitter (rounds back exactly), with point j=2 the
    EXACT midpoint of its neighbours when the shape index is even —
    collinear, removed — and nudged off the line when odd — kept. The
    12 distinct shapes are filtered once per batch through the real
    engine filters and indexed per row (label-dedup scale shape)."""
    from ..geom.coords import DELTA_SHIFT
    from ..geom.polyfilters import remove_obsolete_points, round_coords

    def shape_points(s: int):
        x1 = 2 * (s % 7 + 1)
        y1 = 2 * (s % 5 + 1)
        e = s % 6 + 1
        f = -(s % 4 + 1)
        g = s % 5 + 1
        h2 = s % 3 + 1
        xs = [0, x1, x1 + e, x1 + 2 * e, x1 + 2 * e + 2 * g]
        ys = [0, y1, y1 + f, y1 + 2 * f, y1 + 2 * f + 2 * h2]
        if s % 2 == 1:
            xs[2] += 1  # off the line: nothing is obsolete
        return np.asarray(ys, np.int64), np.asarray(xs, np.int64)

    # the engine filters run once per distinct shape
    SHAPES = []
    for s in range(12):
        la, lo = shape_points(s)
        jit = np.int64((s * 17) % 53 - 26)  # |jit| < half(=32): snaps back
        rla, rlo = round_coords((la << DELTA_SHIFT) + jit,
                                (lo << DELTA_SHIFT) + jit, 0)
        keep = remove_obsolete_points(rla, rlo)
        SHAPES.append((rla >> DELTA_SHIFT, rlo >> DELTA_SHIFT,
                       keep.astype(np.int64)))
    LAT = np.stack([t[0] for t in SHAPES])  # (12, 5)
    LON = np.stack([t[1] for t in SHAPES])
    KEEP = np.stack([t[2] for t in SHAPES])

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        s = k % 12
        n = len(k)
        j = np.tile(np.arange(5, dtype=np.int64), n)
        kk = np.repeat(k, 5)
        return pa.table(
            {
                "o_orderkey": pa.array(kk, pa.int64()),
                "j": pa.array(j, pa.int64()),
                "lat_mu": pa.array(LAT[s].ravel(), pa.int64()),
                "lon_mu": pa.array(LON[s].ravel(), pa.int64()),
                "keep": pa.array(KEEP[s].ravel(), pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_estimated_sizes(sf_dir: str):
    """``MapArea.addSize`` byte estimates (``MapArea.java:555-613``):
    point → 9 bytes; line with >1 point / shape with >3 points →
    ``numElements*11 + numPoints*4`` with ``numElements =
    1+(numPoints-1)//250`` (post-split element counts); shapes count
    twice toward the splittable total. The vectorized ``element_stats``
    drives the MapSplitter refinement loop — this is its SQL face."""
    from ..splitter import element_stats

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        kind = k % 3
        n_points = np.where(kind == 0, 1, 2 + k % 497)
        n_pt, n_ln, n_sh, est, n_split = element_stats(kind, n_points)
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "kind": pa.array(kind, pa.int64()),
                "n_points": pa.array(n_points, pa.int64()),
                "n_pt": pa.array(n_pt, pa.int64()),
                "n_ln": pa.array(n_ln, pa.int64()),
                "n_sh": pa.array(n_sh, pa.int64()),
                "est_bytes": pa.array(est, pa.int64()),
                "n_split": pa.array(n_split, pa.int64()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_installer_ids(sf_dir: str):
    """NSIS registry family ids (``combiners/NsisBuilder.java:55-57``):
    hex of 0x10000|familyId with the low two bytes swapped; the SQL
    oracle mirrors with printf."""
    from ..stages.installer import nsis_reg_id

    def fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["o_orderkey"].combine_chunks(), np.int64)
        fid = 1 + k % 65535
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "family_id": pa.array(fid, pa.int64()),
                "reg_id": pa.array(nsis_reg_id(fid), pa.string()),
            }
        )

    return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        fn, batch_format="pyarrow", batch_size=None
    )


def q_dem_streams(sf_dir: str):
    """Per-tile DEM payload bit streams (``imgfmt/app/dem/DEMTile.java``
    plateau/predicter coder, bit-exact with the reference's
    DemTileTest): tiles from the closed-form layout are encoded
    tile-parallel; rows report stream length + a byte checksum
    (rows-only: the stream is sequential-predictive; the pytest oracle
    decodes it back to the exact height matrix)."""
    import ray

    from ..stages.dem import dem_layout
    from ..stages.demtile import encode_dem_tiles

    import pyarrow.parquet as pq

    ok = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    k = np.asarray(ok["o_orderkey"], np.int64)
    k = k[k % 1993 == 0]
    p = _dem_params(k)
    lay = dem_layout(p["top"], p["left"], p["ah"], p["aw"], p["dist"])
    sec = lay["section_of"]
    w = lay["width"]
    h = lay["height"]
    npts = w * h
    p0 = np.concatenate(([0], np.cumsum(npts)[:-1]))
    tile_of = np.repeat(np.arange(len(w), dtype=np.int64), npts)
    pidx = np.arange(int(npts.sum()), dtype=np.int64) - np.repeat(p0, npts)
    i = pidx // w[tile_of]
    j = pidx % w[tile_of]
    d = p["dist"][sec][tile_of]
    lat = lay["lat_off"][tile_of] - i * d
    lon = lay["lon_off"][tile_of] + j * d
    hv, void = _dem_height_fn(lat, lon)
    hv = np.where(void, -32768, hv)
    offsets = np.concatenate(([0], np.cumsum(npts))).astype(np.int32)
    tiles = pa.table(
        {
            "o_orderkey": pa.array(k[sec], pa.int64()),
            "trow": pa.array(lay["row"], pa.int64()),
            "tcol": pa.array(lay["col"], pa.int64()),
            "twidth": pa.array(w, pa.int64()),
            "theight": pa.array(h, pa.int64()),
            "heights": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(hv, pa.int64())
            ),
        }
    )
    out = (
        ray.data.from_arrow(tiles)
        .repartition(8)
        .map_batches(encode_dem_tiles, batch_format="pyarrow",
                     batch_size=None)
        .to_pandas()
    )
    import zlib

    out["stream_crc"] = [
        zlib.crc32(b) for b in out["stream"]
    ]
    return out[
        ["o_orderkey", "trow", "tcol", "base_height", "max_delta",
         "enc_type", "bit_len", "stream_crc"]
    ].astype("int64")


def q_image_transform(sf_dir: str):
    """Multimodal decode → crop+resize → re-encode over the image+
    caption table (input_hint shape): actor-pool stage on the generated
    image dataset; rows report the new geometry and phash (rows-only:
    pixel math has no SQL face; the pytest oracle checks pixels)."""
    from ..sources.images import images_dataset
    from ..stages.imageops import ImageTransform

    n = 2000  # fixed fleet like images_tiles: payload, not row count,
    # is the cost driver
    ds = images_dataset(n, rows_per_block=125)
    out = stateful_map_batches(
        ds, ImageTransform,
        fn_kwargs=dict(ops=[("crop", 48, 40), ("resize", 16, 16)]),
        batch_format="pyarrow", batch_size=200,
    )
    df = out.to_pandas()[["image_id", "w", "h", "phash", "caption"]]
    df["w"] = df["w"].astype("int64")
    df["h"] = df["h"].astype("int64")
    return df.sort_values("image_id").reset_index(drop=True)
