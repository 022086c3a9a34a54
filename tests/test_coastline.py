"""Precomp-sea artifact (PrecompSeaSaver analogue) roundtrip."""

def test_precomp_sea_artifact_roundtrip(tmp_path):
    import numpy as np

    from mkgmap_ray.stages.coastline import PrecompSeaIndex, save_precomp_sea

    states = {0: 0, 1: 1, 2: 2, 7: 2}
    rings = {
        2: [(np.array([0, 0, 10]), np.array([0, 10, 10]))],
        7: [
            (np.array([5, 5, 9, 9]), np.array([5, 9, 9, 5])),
            (np.array([1, 1, 2]), np.array([1, 2, 2])),
        ],
    }
    art = str(tmp_path / "sea")
    save_precomp_sea(states, rings, art)
    idx = PrecompSeaIndex(art)
    assert idx.state(0) == 0 and idx.state(1) == 1
    assert idx.state(5) == -1  # unknown cell
    got = idx.sea_rings(7)
    assert len(got) == 2
    assert got[0][0].tolist() == [5, 5, 9, 9]
    assert idx.sea_rings(0) == []  # uniform tile: no polygons stored
    # cache hit returns the same objects
    assert idx.sea_rings(7) is got
