"""Streaming image flagship: invariants, tiling, resume."""

import json
import os




import numpy as np
import pytest


def test_geo_tags_rows_block_independent():
    from mkgmap_ray.sources.images import geo_tags_rows

    rows = np.arange(100)
    la1, lo1 = geo_tags_rows(rows, (0, 0, 1.4, 1.4))
    la2, lo2 = geo_tags_rows(rows[40:60], (0, 0, 1.4, 1.4))
    np.testing.assert_array_equal(la1[40:60], la2)
    np.testing.assert_array_equal(lo1[40:60], lo2)


def test_decode_verify_batch():
    import pyarrow as pa

    from mkgmap_ray.sources.images import generate_batch
    from mkgmap_ray.stages.imagestage import DecodeVerify

    t = generate_batch(np.arange(24))
    out = DecodeVerify()(t)
    psnr = out["psnr_centi_db"].to_numpy()
    assert (psnr >= 4000).all()  # qraw ≥ 40 dB, png = 9999
    assert (out["phash_dist"].to_numpy() <= 4).all()
    assert (out["caption_ok"].to_numpy() == 1).all()
    # corrupted caption is caught
    t2 = t.set_column(
        t.column_names.index("caption"), "caption",
        pa.array(["wrong"] * 24, pa.string()),
    )
    assert (DecodeVerify()(t2)["caption_ok"].to_numpy() == 0).all()


def test_flagship_runs_and_resumes(ray_session, tmp_path):
    from mkgmap_ray.pipelines.images_flagship import run_images_flagship

    out = str(tmp_path / "imgtiles")
    summary, stats = run_images_flagship(1200, out, verify=True)
    assert stats["skipped_tiles"] == 0
    assert stats["written_tiles"] >= 2
    assert summary["n_images"].sum() == 1200
    # every tile's range files exist + combined marker stats agree
    from mkgmap_ray.state.manifest import RunManifest

    man = RunManifest(out)
    for _, row in summary.iterrows():
        tid = int(row["tile_id"])
        lin = man.read_tile(tid)
        assert lin is not None
        for fn in lin["files"]:
            assert os.path.isfile(f"{out}/tiles/{fn}")
        assert lin["stats"]["n_rows"] == int(row["n_images"])
        assert lin["stats"]["min_psnr_centi_db"] >= 4000

    # rerun: everything skipped, same summary (from manifest)
    summary2, stats2 = run_images_flagship(1200, out, verify=True)
    assert stats2["skipped_tiles"] == stats["n_tiles"]
    assert stats2["written_tiles"] == 0
    assert summary2.equals(summary)

    # invalidate one tile's lineage: it (plus range-file neighbors)
    # is rewritten
    victim = int(summary["tile_id"].iloc[0])
    man.unmark_tile(victim)
    summary3, stats3 = run_images_flagship(1200, out, verify=True)
    # range-file layout: the victim rewrites along with any tile
    # that shared its range files; final state identical
    assert 1 <= stats3["written_tiles"] <= stats["n_tiles"]
    assert summary3.equals(summary)
