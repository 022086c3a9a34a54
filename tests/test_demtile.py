"""DEMTile bit-stream coder vs the reference's own DemTileTest vectors
plus structural-layer consistency."""

import numpy as np
import pyarrow as pa

from mkgmap_ray.stages.demtile import (
    UNDEF,
    encode_dem_tile,
    encode_dem_tiles,
    get_big_bin_bits,
    get_max_length_zero_bits,
    get_start_hunit,
)


def test_known_bitstream_from_reference_test():
    # DemTileTest.testKnownBitstream (Dem-Daten.pdf example)
    rh = np.zeros(64 * 64, np.int64)
    rh[63 * 64] = 3
    r = encode_dem_tile(64, 64, rh)
    assert r["stream"] == bytes([0xFF] * 10 + [0xC0, 0x2E])


def test_flat_tiles_have_no_stream():
    r = encode_dem_tile(64, 64, np.zeros(64 * 64, np.int64))
    assert (r["bit_len"], r["base_height"], r["max_delta"], r["enc_type"]) == (
        0, 0, 0, 0,
    )
    r = encode_dem_tile(64, 64, np.ones(64 * 64, np.int64))
    assert (r["bit_len"], r["base_height"], r["max_delta"], r["enc_type"]) == (
        0, 1, 0, 0,
    )


def test_undef_bitstream_from_reference_test():
    # DemTileTest.testAllZeroOneUndef
    rh = np.zeros(64 * 64, np.int64)
    rh[63 * 64] = UNDEF
    r = encode_dem_tile(64, 64, rh)
    assert r["stream"] == bytes([0xFF] * 10 + [0xC0, 0x3E])
    assert (r["base_height"], r["max_delta"], r["enc_type"]) == (0, 1, 2)


def test_threshold_tables():
    assert get_max_length_zero_bits(1) == 15
    assert get_max_length_zero_bits(255) == 22
    assert get_max_length_zero_bits(20000) == 43
    assert get_start_hunit(0x9E) == 1
    assert get_start_hunit(0x11F) == 4
    assert get_start_hunit(0x5000) == 256
    assert get_big_bin_bits(1) == 1
    assert get_big_bin_bits(255) == 8
    assert get_big_bin_bits(20000) == 15


def test_random_tiles_encode_without_error():
    rng = np.random.default_rng(13)
    for w, h, spread in [
        (64, 64, 5), (64, 64, 300), (95, 33, 40), (7, 7, 2), (1, 1, 1),
        (64, 64, 5000),
    ]:
        rh = rng.integers(-200, -200 + spread, w * h)
        rh[rng.random(w * h) < 0.02] = UNDEF
        r = encode_dem_tile(w, h, rh)
        valid = rh != UNDEF
        if valid.any() and rh[valid].min() != (
            rh[valid].max() + (1 if (~valid).any() else 0)
        ):
            assert r["bit_len"] > 0
        assert len(r["stream"]) == (r["bit_len"] + 7) // 8


def test_batch_stage_matches_scalar():
    rng = np.random.default_rng(19)
    rows = []
    for _ in range(10):
        w = int(rng.integers(4, 20))
        h = int(rng.integers(4, 20))
        rows.append((w, h, rng.integers(0, 50, w * h).tolist()))
    batch = pa.table(
        {
            "twidth": pa.array([r[0] for r in rows], pa.int64()),
            "theight": pa.array([r[1] for r in rows], pa.int64()),
            "heights": pa.array([r[2] for r in rows], pa.list_(pa.int64())),
        }
    )
    out = encode_dem_tiles(batch)
    for i, (w, h, hts) in enumerate(rows):
        want = encode_dem_tile(w, h, np.asarray(hts))
        assert out["stream"][i].as_py() == want["stream"]
        assert out["max_delta"][i].as_py() == want["max_delta"]


def test_encode_decode_roundtrip():
    from mkgmap_ray.stages.demtile import DemTileDecoder

    rng = np.random.default_rng(29)
    for w, h, lo, spread, void_p in [
        (64, 64, 0, 5, 0.0),
        (64, 64, -100, 300, 0.0),
        (64, 64, 50, 2, 0.3),
        (33, 17, -50, 1000, 0.05),
        (95, 64, 0, 40, 0.01),
        (8, 8, -5, 3, 0.5),
        (64, 64, 0, 5000, 0.0),
    ]:
        rh = rng.integers(lo, lo + spread, w * h)
        if void_p:
            rh[rng.random(w * h) < void_p] = UNDEF
        r = encode_dem_tile(w, h, rh)
        if r["max_delta"] == 0:
            continue
        dec = DemTileDecoder(w, h, r["max_delta"], r["stream"]).decode()
        want = np.where(
            rh == UNDEF, r["max_delta"], rh - r["base_height"]
        ).reshape(h, w)
        assert (dec == want).all(), (w, h, lo, spread, void_p)
