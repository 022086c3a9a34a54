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
