

def test_boundary_artifact_roundtrip_and_laziness(tmp_path):
    """Saved-artifact PIP equals the in-memory index, and a probe batch
    confined to one corner loads only that corner's cells."""
    import numpy as np

    from mkgmap_ray.stages.pipjoin import (
        LazyPIPJoin,
        PolygonIndex,
        save_boundary_artifact,
    )

    rng = np.random.default_rng(31)
    polys = []
    for pid in range(20):
        cy0 = int(rng.integers(0, 1 << 18))
        cx0 = int(rng.integers(0, 1 << 18))
        w = int(rng.integers(1000, 30000))
        la = np.array([cy0, cy0, cy0 + w, cy0 + w])
        lo = np.array([cx0, cx0 + w, cx0 + w, cx0])
        polys.append((pid, [(la, lo)]))
    art = str(tmp_path / "bnd")
    save_boundary_artifact(polys, art, raster_shift=14)

    lat = rng.integers(0, 1 << 18, 3000)
    lon = rng.integers(0, 1 << 18, 3000)
    import pyarrow as pa

    batch = pa.table(
        {
            "i": pa.array(np.arange(3000), pa.int64()),
            "lat_hp": pa.array(lat, pa.int64()),
            "lon_hp": pa.array(lon, pa.int64()),
        }
    )
    lazy = LazyPIPJoin(art, raster_shift=14)
    got = lazy(batch).to_pandas().sort_values(["i", "boundary_id"])
    idx = PolygonIndex(polys, raster_shift=14)
    rows, pids = idx.query(lat, lon)
    import pandas as pd

    want = (
        pd.DataFrame({"i": rows, "boundary_id": pids})
        .sort_values(["i", "boundary_id"])
        .reset_index(drop=True)
    )
    assert list(got["i"]) == list(want["i"])
    assert list(got["boundary_id"]) == list(want["boundary_id"])

    # laziness: a fresh actor probing one corner loads few cells
    lazy2 = LazyPIPJoin(art, raster_shift=14)
    small = pa.table(
        {
            "i": pa.array([0, 1], pa.int64()),
            "lat_hp": pa.array([100, 200], pa.int64()),
            "lon_hp": pa.array([100, 200], pa.int64()),
        }
    )
    lazy2(small)
    assert len(lazy2.loaded_cells) == 1
    total_cells = len(set(lazy.loaded_cells)) if lazy.loaded_cells else 0
    assert total_cells > 10  # the full probe touched many cells
