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


def test_srt_char_table_sections():
    from mkgmap_ray.stages.collate import EXPANSIONS, srt_char_table_bytes

    out = srt_char_table_bytes()
    srt4, srt5 = out["srt4"], out["srt5"]
    assert len(srt4) == 256 * 3
    # 'a' and 'A': same primary/secondary, tertiary differs; letter flag
    fa, pa, tsa = srt4[ord("a") * 3: ord("a") * 3 + 3]
    fA, pA, tsA = srt4[ord("A") * 3: ord("A") * 3 + 3]
    assert fa == 1 and fA == 1
    assert pa == pA
    assert tsa & 0xF == tsA & 0xF  # secondary equal
    assert tsa >> 4 == 1 and tsA >> 4 == 2  # tertiary = case variant
    # digit flag
    f7 = srt4[ord("7") * 3]
    assert f7 == 2
    # 'b' primary follows 'a'
    assert srt4[ord("b") * 3 + 1] == pa + 1
    # expansion source char: count-1 in the flag nibble, primary = index
    code = "…".encode("cp1252")[0]
    fexp, pexp, _ = srt4[code * 3: code * 3 + 3]
    assert fexp >> 4 == len(EXPANSIONS["…"]) - 1
    # referenced expansion entries carry '.''s weights
    dot_p = srt4[ord(".") * 3 + 1]
    i = (pexp - 1) * 2
    assert srt5[i] == dot_p
    # ignorable (unmapped) char: all-zero weights
    assert srt4[5 * 3: 5 * 3 + 3] == bytes([0, 0, 0])


class TestCloseGaps:
    def _arc(self, *pts):
        import numpy as np
        return (np.array([p[0] for p in pts], np.int64),
                np.array([p[1] for p in pts], np.int64))

    def test_merges_smallest_gap_first(self):
        from mkgmap_ray.stages.coastline import close_gaps

        a = self._arc((0, 0), (100, 0), (100, 100))
        b = self._arc((100, 103), (0, 100))     # gap 3 from a's end
        c = self._arc((100, 102), (50, 50))     # gap 2 from a's end
        out, bridges = close_gaps([a, b, c], 10)
        # nearest START wins: c merges onto a first
        assert bridges[0] == ((100, 100), (100, 102))
        assert len(out) == 2  # a+c merged; b still separate (gap from
        # a+c end (50,50) to b start (100,103) is > 10)
        assert len(bridges) == 1

    def test_gap_over_limit_stays(self):
        from mkgmap_ray.stages.coastline import close_gaps

        a = self._arc((0, 0), (100, 100))
        b = self._arc((100, 111), (0, 100))  # gap 11 > limit 10
        out, bridges = close_gaps([a, b], 10)
        assert len(out) == 2 and not bridges

    def test_boundary_ends_excluded(self):
        from mkgmap_ray.geom.area import Area
        from mkgmap_ray.stages.coastline import close_gaps

        bounds = Area(0, 0, 1000, 1000)
        # a ends ON the boundary (lat 1000): never bridged
        a = self._arc((0, 500), (1000, 500))
        b = self._arc((1000, 502), (500, 800))
        out, bridges = close_gaps([a, b], 10, bounds)
        assert len(out) == 2 and not bridges

    def test_closed_rings_untouched(self):
        from mkgmap_ray.stages.coastline import close_gaps

        ring = self._arc((0, 0), (10, 0), (10, 10), (0, 0))
        open_ = self._arc((0, 2), (5, 5))
        out, bridges = close_gaps([ring, open_], 10)
        assert len(out) == 2 and not bridges
