"""Image payload stages: decode + fidelity verification as an actor pool.

The graft's per-row invariant (BASELINE.json input_hint): decoded pixels
match the source within PSNR ≥ 40 dB for the lossy format (bit-exact for
png) and captions byte-equal. The decode step runs as a map_batches actor
pool — the real-deployment shape where the codec library loads once per
actor (here the pure-python codecs stand in; the Ray-side plumbing is the
deliverable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import (
    decode_image,
    decode_stack,
    hamming64,
    make_caption,
    make_pixels,
    make_pixels_batch,
    phash64,
    phash64_batch,
)


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


def shape_groups(ws, hs):
    """Row-index groups by (w, h) — the vectorization unit for every
    pixel stage (same-shape rows stack into one (m, h, w, 3) array)."""
    key = np.asarray(ws, np.int64) * (1 << 20) + np.asarray(hs, np.int64)
    order = np.argsort(key, kind="stable")
    sk = key[order]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    ends = np.r_[starts[1:], len(sk)]
    return [(order[s:e]) for s, e in zip(starts, ends)]


class DecodeVerify:
    """Actor: decode every image, recompute phash, check caption equality
    and PSNR against the deterministic source pixels. Appends
    ``psnr_centi_db`` (int32; 9999 = lossless/∞), ``phash_dist`` (int32),
    ``caption_ok`` (int8). Rows are NEVER silently dropped — downstream
    aggregates assert the invariants. Pixel math is vectorized per shape
    group (decode stack → batch phash → batch PSNR); only the zlib
    entropy step and caption compare run per row."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        caps = batch["caption"].to_pylist()
        ph = np.asarray(batch["phash"].combine_chunks(), np.int64)
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        n = batch.num_rows
        rows = np.array([int(i[3:]) for i in ids], np.int64)
        psnr_c = np.empty(n, np.int32)
        pdist = np.empty(n, np.int32)
        cap_ok = np.array(
            [int(caps[i] == make_caption(int(rows[i]))) for i in range(n)],
            np.int8,
        )
        for idx in shape_groups(ws, hs):
            w, h = int(ws[idx[0]]), int(hs[idx[0]])
            rgb = decode_stack([data[i] for i in idx],
                               [fmts[i] for i in idx], w, h)
            src = make_pixels_batch(rows[idx], w, h)
            diff = src.astype(np.float64) - rgb.astype(np.float64)
            mse = np.einsum("mijk,mijk->m", diff, diff) / (h * w * 3)
            with np.errstate(divide="ignore"):
                p = 10.0 * np.log10(255.0 * 255.0 / mse)
            psnr_c[idx] = np.where(
                mse == 0, 9999, (p * 100).astype(np.int64)
            ).astype(np.int32)
            got = phash64_batch(rgb) if (h % 8 == 0 and w % 8 == 0) else (
                np.array([phash64(g) for g in rgb], np.int64)
            )
            x = (got ^ ph[idx]).view(np.uint64)
            pdist[idx] = np.array(
                [bin(int(v)).count("1") for v in x], np.int32
            )
        batch = batch.append_column(
            "psnr_centi_db", pa.array(psnr_c, pa.int32())
        )
        batch = batch.append_column("phash_dist", pa.array(pdist, pa.int32()))
        return batch.append_column("caption_ok", pa.array(cap_ok, pa.int8()))


def decode_verify(ds, **kw):
    from ..util import stateful_map_batches

    return stateful_map_batches(
        ds, DecodeVerify, batch_format="pyarrow", batch_size=None, **kw
    )


# --- perceptual-hash dedup ------------------------------------------------


class DecodePhash:
    """Actor: decode every image payload and recompute its 64-bit
    perceptual hash from PIXELS (not the stored column — the decode path
    is part of what's being verified). Emits (img_num, phash). Decode +
    hash run vectorized per shape group (``decode_stack`` →
    ``phash64_batch``); only the zlib entropy step is per row."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        n = batch.num_rows
        nums = np.array([int(i[3:]) for i in ids], np.int64)
        ph = np.empty(n, np.int64)
        for idx in shape_groups(ws, hs):
            w, h = int(ws[idx[0]]), int(hs[idx[0]])
            rgb = decode_stack([data[i] for i in idx],
                               [fmts[i] for i in idx], w, h)
            if h % 8 == 0 and w % 8 == 0:
                ph[idx] = phash64_batch(rgb)
            else:
                ph[idx] = [phash64(g) for g in rgb]
        return pa.table(
            {
                "img_num": pa.array(nums, pa.int64()),
                "phash": pa.array(ph, pa.int64()),
            }
        )


def band_slices(ph: np.ndarray, n_bands: int) -> np.ndarray:
    """Split each 64-bit hash into ``n_bands`` contiguous bit slices
    (pigeonhole: two hashes at Hamming ≤ n_bands-1 agree on ≥1 slice).
    Returns an (n, n_bands) int64 slice-value matrix."""
    ph = np.ascontiguousarray(ph, np.int64).view(np.uint64)
    widths = np.full(n_bands, 64 // n_bands, np.uint64)
    widths[: 64 % n_bands] += 1
    shifts = np.concatenate(([0], np.cumsum(widths)[:-1])).astype(np.uint64)
    out = np.empty((len(ph), n_bands), np.int64)
    for b in range(n_bands):
        mask = np.uint64((1 << int(widths[b])) - 1)
        out[:, b] = ((ph >> shifts[b]) & mask).view(np.int64)
    return out


def phash_rep_groups(ds, n_parts: int = 64):
    """documents/images → one row per DISTINCT perceptual signature:
    (phash, keep_img = smallest member, n_members). Hash-partitioned
    groupby over (img_num, phash) rows only — payloads never leave the
    decode stage."""
    import pandas as pd

    def add_part(b: pa.Table) -> pa.Table:
        ph = np.asarray(b["phash"].combine_chunks(), np.int64)
        return b.append_column(
            "part", pa.array(ph & np.int64(n_parts - 1), pa.int64())
        )

    def collapse(g: "pd.DataFrame") -> "pd.DataFrame":
        agg = g.groupby("phash", as_index=False).agg(
            keep_img=("img_num", "min"), n_members=("img_num", "size")
        )
        return agg[["phash", "keep_img", "n_members"]]

    return (
        ds.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(collapse, batch_format="pandas")
    )


def phash_near_pairs(reps, max_hamming: int = 4):
    """Distributed near-dup pair generation over signature
    representatives via pigeonhole banding (VERDICT r3 finding 3: the
    old path collected ALL signatures to the driver and ran
    ``np.triu_indices(m, 1)`` — O(m²) on a real corpus where distinct
    phashes ≈ image count).

    The 64-bit hash splits into ``max_hamming + 1`` bit slices; any pair
    at Hamming ≤ max_hamming collides in ≥1 slice, so candidates come
    from (band, slice) buckets exactly like ``minhash_candidates`` —
    bucket runs extracted vectorized per hash partition, full-hash
    Hamming verified in the same pass, pairs deduped exactly-once
    downstream. Only (keep_a, keep_b) PAIR rows ever reach the driver."""
    import pandas as pd

    from .dedup import (
        MAX_BUCKET,
        N_BUCKET_PARTS,
        _bucket_pairs,
        hamming64 as ham_vec,
        unique_pairs,
    )

    n_bands = max_hamming + 1

    def to_bands(b: pa.Table) -> "pd.DataFrame":
        ph = np.asarray(b["phash"].combine_chunks(), np.int64)
        keep = np.asarray(b["keep_img"].combine_chunks(), np.int64)
        sl = band_slices(ph, n_bands)
        n = len(ph)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(n_bands, dtype=np.int64), n),
                "slice": sl.reshape(-1),
                "keep_img": np.repeat(keep, n_bands),
                "phash": np.repeat(ph, n_bands),
                "part": (
                    sl.reshape(-1) * np.int64(31)
                    + np.tile(np.arange(n_bands, dtype=np.int64), n)
                )
                & np.int64(N_BUCKET_PARTS - 1),
            }
        )

    def pairs_part(g: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        if not len(g):
            return empty
        gid = g.groupby(["band", "slice"], sort=False).ngroup().to_numpy(
            np.int64
        )
        keep = g["keep_img"].to_numpy(np.int64)
        ph = g["phash"].to_numpy(np.int64)
        order = np.lexsort((keep, gid))
        gid, keep, ph = gid[order], keep[order], ph[order]
        iu, ju = _bucket_pairs(gid, MAX_BUCKET)
        if not len(iu):
            return empty
        ok = (ham_vec(ph[iu] ^ ph[ju]) <= max_hamming) & (
            keep[iu] != keep[ju]
        )
        out = pd.DataFrame({"a": keep[iu[ok]], "b": keep[ju[ok]]})
        return out.drop_duplicates(["a", "b"])

    pairs = (
        reps.map_batches(to_bands, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
    )
    return unique_pairs(pairs, ())


def cluster_pairs(keep: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union-find over PAIRS only: cluster label (smallest linked
    keep_img) for every id in ``keep``; ids not in any pair label
    themselves."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for i, j in zip(a.tolist(), b.tolist()):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    return np.fromiter((find(int(k)) for k in keep), np.int64, len(keep))


def phash_dedup(ds, max_hamming: int = 4, n_parts: int = 64):
    """Image near-dup dedup over a web-scale-shaped corpus: exact
    perceptual-signature groups first (hash-partitioned groupby — only
    (img_num, phash) rows shuffle, payloads never leave the decode
    stage), then near-dup LINKING of the group representatives at
    Hamming ≤ ``max_hamming`` via banded candidate pairs
    (``phash_near_pairs``) and union-find over the pairs alone.

    Scale shape: no stage holds all signatures in one place — exact
    collapse and pair generation are hash-partitioned; the driver sees
    only true near-dup pairs (sparse on a real corpus). The union-find
    runs on the driver over the PAIRS alone, and the resulting sparse
    label map (only ids that appear in a pair — everything else labels
    itself) is broadcast once via ``ray.put`` and applied inside a
    ``map_batches`` over the representatives: distinct signatures are
    never materialized on the driver (on a web corpus distinct phashes
    ≈ image count). Returns a lazy Dataset, one row per distinct
    signature: (phash, keep_img = smallest member, n_members, cluster =
    smallest keep_img among signatures linked transitively at ≤
    max_hamming)."""
    import ray

    from ..util import stateful_map_batches

    parts = stateful_map_batches(
        ds, DecodePhash, batch_format="pyarrow", batch_size=200,
    )
    # reps is consumed TWICE (pair generation + label join-back):
    # materialize the collapsed signature table in the OBJECT STORE
    # (distributed blocks of 3 int64 columns, never the driver) so the
    # decode chain doesn't recompute once per consumer
    reps_ds = phash_rep_groups(parts, n_parts=n_parts).materialize()
    pairs = phash_near_pairs(reps_ds, max_hamming=max_hamming).to_pandas()
    a = pairs["a"].to_numpy(np.int64)
    b = pairs["b"].to_numpy(np.int64)
    linked = np.unique(np.concatenate([a, b]))
    labels = cluster_pairs(linked, a, b)
    label_ref = ray.put((linked, labels))

    def add_cluster(batch: pa.Table) -> pa.Table:
        ids, labs = ray.get(label_ref)
        keep = np.asarray(batch["keep_img"].combine_chunks(), np.int64)
        cluster = keep.copy()  # unlinked signatures label themselves
        if len(ids):
            pos = np.searchsorted(ids, keep)
            pos_ok = np.minimum(pos, len(ids) - 1)
            hit = ids[pos_ok] == keep
            cluster[hit] = labs[pos_ok[hit]]
        out = {
            c: batch[c].combine_chunks().cast(pa.int64())
            for c in ("phash", "keep_img", "n_members")
        }
        out["cluster"] = pa.array(cluster, pa.int64())
        return pa.table(out)

    return reps_ds.map_batches(
        add_cluster, batch_format="pyarrow", batch_size=None
    )
