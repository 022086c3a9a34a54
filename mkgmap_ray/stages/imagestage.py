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
    hamming64,
    make_caption,
    make_pixels,
    phash64,
)


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 * 255.0 / mse))


class DecodeVerify:
    """Actor: decode every image, recompute phash, check caption equality
    and PSNR against the deterministic source pixels. Appends
    ``psnr_centi_db`` (int32; 9999 = lossless/∞), ``phash_dist`` (int32),
    ``caption_ok`` (int8). Rows are NEVER silently dropped — downstream
    aggregates assert the invariants."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        caps = batch["caption"].to_pylist()
        ph = batch["phash"].to_pylist()
        n = batch.num_rows
        psnr_c = np.empty(n, np.int32)
        pdist = np.empty(n, np.int32)
        cap_ok = np.empty(n, np.int8)
        for i in range(n):
            row = int(ids[i][3:])
            rgb = decode_image(data[i], fmts[i])
            src = make_pixels(row, rgb.shape[1], rgb.shape[0])
            p = psnr_db(src, rgb)
            psnr_c[i] = 9999 if p == float("inf") else int(p * 100)
            pdist[i] = hamming64(phash64(rgb), int(ph[i]))
            cap_ok[i] = int(caps[i] == make_caption(row))
        batch = batch.append_column(
            "psnr_centi_db", pa.array(psnr_c, pa.int32())
        )
        batch = batch.append_column("phash_dist", pa.array(pdist, pa.int32()))
        return batch.append_column("caption_ok", pa.array(cap_ok, pa.int8()))


def decode_verify(ds, **kw):
    from ..util import pool_concurrency

    kw.setdefault("concurrency", pool_concurrency())
    return ds.map_batches(
        DecodeVerify, batch_format="pyarrow", batch_size=None, **kw
    )


# --- perceptual-hash dedup ------------------------------------------------


class DecodePhash:
    """Actor: decode every image payload and recompute its 64-bit
    perceptual hash from PIXELS (not the stored column — the decode path
    is part of what's being verified). Emits (img_num, phash)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        n = batch.num_rows
        nums = np.empty(n, np.int64)
        ph = np.empty(n, np.int64)
        for i in range(n):
            nums[i] = int(ids[i][3:])
            ph[i] = phash64(decode_image(data[i], fmts[i]))
        return pa.table(
            {
                "img_num": pa.array(nums, pa.int64()),
                "phash": pa.array(ph, pa.int64()),
            }
        )


def phash_dedup(ds, max_hamming: int = 4, n_parts: int = 64):
    """Image near-dup dedup over a web-scale-shaped corpus: exact
    perceptual-signature groups first (hash-partitioned groupby — only
    (img_num, phash) rows shuffle, payloads never leave the decode
    stage), then near-dup LINKING of the group REPRESENTATIVES at
    Hamming ≤ ``max_hamming`` with union-find on the driver.

    Scale shape: representative count is bounded by DISTINCT signatures
    (output-sized — the synthetic gradient corpus collapses ~2000 images
    to ~50 signatures; a real corpus collapses burst shots / re-encodes
    the same way), so the driver linking is the standard output-sized
    combine, not an input-sized loop. Emitting raw pairs instead would be
    O(cluster²) — the round-1 LSH lesson.

    Returns one row per distinct signature: (phash, keep_img = smallest
    member, n_members, cluster = smallest keep_img among signatures
    linked transitively at ≤ max_hamming)."""
    import pandas as pd

    from ..util import pool_concurrency
    from .dedup import hamming64 as ham_vec

    parts = ds.map_batches(
        DecodePhash, batch_format="pyarrow", batch_size=200,
        concurrency=pool_concurrency(),
    )

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

    reps = (
        parts.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(collapse, batch_format="pandas")
        .to_pandas()
    )
    reps = reps.sort_values("keep_img").reset_index(drop=True)
    m = len(reps)
    ph = reps["phash"].to_numpy(np.int64)
    # union-find over representative pairs at <= max_hamming (m is
    # distinct-signature count; all-pairs here is m^2 over output rows)
    parent = np.arange(m)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    iu, ju = np.triu_indices(m, 1)
    close = ham_vec(ph[iu] ^ ph[ju]) <= max_hamming
    for i, j in zip(iu[close], ju[close]):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    roots = np.fromiter((find(i) for i in range(m)), np.int64, m)
    reps["cluster"] = reps["keep_img"].to_numpy(np.int64)[roots]
    return reps.astype("int64")
