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
