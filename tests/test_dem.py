"""DEM section/tile layer vs a straight scalar transcription of the
Java algorithms (DEMSection.getTileInfo/calcTiles, DEMTile stats)."""

import numpy as np

from mkgmap_ray.stages.dem import (
    STD_DIM,
    dem_layout,
    dem_section_records,
    dem_tile_info,
    dem_tile_stats,
)


def _java_tile_info(dem_points: int, dem_dist: int):
    resolution = STD_DIM * dem_dist
    dem_points += dem_dist
    n_full = dem_points // resolution
    rest = dem_points - n_full * resolution
    num = n_full
    nonstd = rest // dem_dist
    if rest % dem_dist != 0:
        nonstd += 1
    if nonstd >= STD_DIM // 2:
        num += 1
    else:
        if num > 0:
            nonstd += STD_DIM
    if num == 0:
        num = 1
    return num, nonstd


def _height(lat, lon):
    h = (lat * 7 + lon * 13) % 509 - 250
    void = (lat * 11 + lon * 17) % 127 == 0
    return h, void


def _java_section(top, left, ah, aw, dist):
    tiles_lat, nonstd_h = _java_tile_info(ah, dist)
    tiles_lon, nonstd_w = _java_tile_info(aw, dist)
    res = STD_DIM * dist
    tiles = []
    min_base = max_base = max_h = max_delta = None
    has_extra = False
    has_stream = False
    for m in range(tiles_lat):
        h = nonstd_h if m + 1 == tiles_lat else STD_DIM
        for n in range(tiles_lon):
            w = nonstd_w if n + 1 == tiles_lon else STD_DIM
            lat_off = top - m * res
            lon_off = left + n * res
            vals, voids = [], 0
            for i in range(h):
                for j in range(w):
                    hv, void = _height(lat_off - i * dist, lon_off + j * dist)
                    if void:
                        voids += 1
                    else:
                        vals.append(hv)
            if not vals:
                base, mx, enc, has_data = 0, 0, 2, False
            elif voids:
                base, mx, enc, has_data = min(vals), max(vals) + 1, 2, True
            else:
                base, mx, enc, has_data = min(vals), max(vals), 0, True
            delta = mx - base
            tiles.append(
                dict(row=m, col=n, width=w, height=h, base=base,
                     delta=delta, enc=enc, has_data=has_data, voids=voids)
            )
            if has_data:
                min_base = base if min_base is None else min(min_base, base)
                max_base = base if max_base is None else max(max_base, base)
                th = base + delta - (0 if enc == 0 else 1)
                max_h = th if max_h is None else max(max_h, th)
                max_delta = (
                    delta if max_delta is None else max(max_delta, delta)
                )
                if delta > 0:
                    has_stream = True
            if enc != 0:
                has_extra = True
    if not has_stream:
        min_height = max_height = 0
    else:
        min_height, max_height = min_base, max_h
    delta_size = 2 if (max_delta is not None and max_delta > 255) else 1
    base_size = (
        2
        if (min_base is not None and not (-128 < min_base and max_base < 128))
        else 1
    )
    return tiles, dict(
        tiles_lat=tiles_lat, tiles_lon=tiles_lon, nonstd_h=nonstd_h,
        nonstd_w=nonstd_w, min_height=min_height, max_height=max_height,
        delta_size=delta_size, base_size=base_size,
        has_extra=1 if has_extra else 0,
    )


def test_tile_info_matches_java():
    rng = np.random.default_rng(5)
    pts = rng.integers(1, 3000, 300)
    dist = rng.integers(1, 9, 300)
    num, nonstd = dem_tile_info(pts, dist)
    for i in range(300):
        jn, js = _java_tile_info(int(pts[i]), int(dist[i]))
        assert (num[i], nonstd[i]) == (jn, js), (pts[i], dist[i])


def test_sections_match_java_scalar():
    rng = np.random.default_rng(9)
    n = 12
    top = rng.integers(10_000, 40_000, n)
    left = rng.integers(10_000, 40_000, n)
    ah = rng.integers(10, 400, n)
    aw = rng.integers(10, 400, n)
    dist = rng.integers(1, 5, n)

    layout = dem_layout(top, left, ah, aw, dist)
    stats = dem_tile_stats(layout, dist, _height)
    recs = dem_section_records(layout, stats, n)

    t = 0
    for s in range(n):
        tiles, sec = _java_section(
            int(top[s]), int(left[s]), int(ah[s]), int(aw[s]), int(dist[s])
        )
        assert recs["tiles_lat"][s] == sec["tiles_lat"]
        assert recs["tiles_lon"][s] == sec["tiles_lon"]
        assert recs["nonstd_height"][s] == sec["nonstd_h"]
        assert recs["nonstd_width"][s] == sec["nonstd_w"]
        assert recs["min_height"][s] == sec["min_height"]
        assert recs["max_height"][s] == sec["max_height"]
        assert recs["delta_size"][s] == sec["delta_size"]
        assert recs["base_size"][s] == sec["base_size"]
        assert recs["has_extra"][s] == sec["has_extra"]
        for tile in tiles:
            assert layout["section_of"][t] == s
            assert layout["row"][t] == tile["row"]
            assert layout["col"][t] == tile["col"]
            assert layout["width"][t] == tile["width"]
            assert layout["height"][t] == tile["height"]
            assert stats["base_height"][t] == tile["base"]
            assert stats["max_delta"][t] == tile["delta"]
            assert stats["enc_type"][t] == tile["enc"]
            assert bool(stats["has_data"][t]) == tile["has_data"]
            assert stats["n_void"][t] == tile["voids"]
            t += 1
    assert t == len(layout["row"])


def test_all_void_tile():
    # a 1x1 tile landing exactly on a void point
    def height(lat, lon):
        return np.zeros(len(lat), np.int64), np.ones(len(lat), bool)

    layout = dem_layout([100], [100], [1], [1], [1])
    stats = dem_tile_stats(layout, np.array([1]), height)
    recs = dem_section_records(layout, stats, 1)
    assert not stats["has_data"][0]
    assert stats["enc_type"][0] == 2
    assert stats["base_height"][0] == 0 and stats["max_delta"][0] == 0
    assert recs["min_height"][0] == 0 and recs["max_height"][0] == 0
    assert recs["delta_size"][0] == 1 and recs["base_size"][0] == 1


def test_empty_input_safe():
    # CORRECTNESS_r03: a block whose key filter leaves no sections must
    # produce typed empty outputs, not crash in np.repeat/reduceat.
    z = np.empty(0, np.int64)
    layout = dem_layout(z, z, z, z, z)
    assert len(layout["section_of"]) == 0
    stats = dem_tile_stats(layout, z, lambda la, lo: (la, la > 0))
    assert len(stats["base_height"]) == 0
    recs = dem_section_records(layout, stats, 0)
    assert len(recs["min_height"]) == 0
