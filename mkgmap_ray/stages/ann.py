"""Similarity search over embedding columns.

- ``topk_dot``: brute-force top-k inner product against a broadcast query
  matrix — per-batch numpy matmul + per-batch partial top-k, merged on the
  driver (no shuffle; the scale path is embarrassingly parallel).
  Embeddings are quantized to integers (``round(x * SCALE)``) so scores are
  exact int64 — bit-identical to the DuckDB list-arithmetic oracle and
  independent of summation order.
- ``topk_cosine``: same with float cosine (rows-only check — float
  summation order differs across engines).
- ``lsh_bucketed_cosine_pairs``: random-hyperplane signatures → bucket
  groupby → in-bucket exact cosine — the near-duplicate / ANN scale path
  (candidates shuffle, payloads don't).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

QUANT_SCALE = 1024


def quantize(mat: np.ndarray) -> np.ndarray:
    """round-half-away to int64, mirrored in SQL as
    CAST(round(x * 1024) AS BIGINT) (DuckDB round() is half-away too)."""
    x = np.asarray(mat, np.float64) * QUANT_SCALE
    return np.trunc(np.where(x >= 0, x + 0.5, x - 0.5)).astype(np.int64)


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    values = np.asarray(arr.values, np.float64)
    n = len(arr)
    return values.reshape(n, -1)


class TopKDotPartial:
    """map_batches: emit each batch's local top-k per query (int scores)."""

    def __init__(self, queries_ref, k: int, id_col="vec_id", emb_col="embedding"):
        import ray

        q = (
            ray.get(queries_ref)
            if isinstance(queries_ref, ray.ObjectRef)
            else queries_ref
        )
        self.q_ids, q_mat = q
        self.qt = quantize(q_mat).T  # dim × nq
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = quantize(_emb_matrix(batch, self.emb_col))
        ids = np.asarray(batch[self.id_col].combine_chunks(), np.int64)
        scores = emb @ self.qt  # n × nq, exact int64
        k = min(self.k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(scores.shape[1]):
            col = scores[:, qi]
            # top-k by (score desc, id asc) — deterministic
            order = np.lexsort((ids, -col))[:k]
            out_q.append(np.full(k, self.q_ids[qi], np.int64))
            out_id.append(ids[order])
            out_s.append(col[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.int64()),
            }
        )


def topk_dot(ds, q_ids, q_mat, k: int = 10, id_col="vec_id", emb_col="embedding"):
    """Global top-k inner product per query: per-batch partials → driver
    merge (partials are k × nq rows per batch — tiny)."""
    import ray

    ref = ray.put((np.asarray(q_ids, np.int64), np.asarray(q_mat, np.float64)))
    parts = ds.map_batches(
        TopKDotPartial(ref, k, id_col, emb_col), batch_format="pyarrow", batch_size=None
    ).to_pandas()
    out = []
    for qid, g in parts.groupby("query_id", sort=True):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    return res[["query_id", "rank", "vec_id", "score"]]


class RandomHyperplaneSigner:
    """map_batches: append an LSH bucket (sign bits of r random projections)."""

    def __init__(self, dim: int, n_bits: int = 16, seed: int = 42,
                 emb_col="embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_bits))
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _emb_matrix(batch, self.emb_col)
        bits = (emb @ self.planes) > 0
        bucket = (bits.astype(np.int64) << np.arange(bits.shape[1])).sum(axis=1)
        return batch.append_column("lsh_bucket", pa.array(bucket, pa.int64()))


def lsh_bucketed_cosine_pairs(ds, dim: int, threshold: float = 0.9,
                              n_bits: int = 12, seed: int = 42,
                              id_col="vec_id", emb_col="embedding"):
    """Near-duplicate pairs by cosine ≥ threshold, candidates restricted to
    equal LSH buckets (recall < 1 by construction — the scale/efficiency
    tradeoff; raise n_bits for precision, repeat with different seeds for
    recall)."""
    signed = ds.map_batches(
        RandomHyperplaneSigner(dim, n_bits, seed, emb_col),
        batch_format="pyarrow", batch_size=None,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        emb = np.stack(g[emb_col].to_numpy())
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1
        unit = emb / norms[:, None]
        sim = unit @ unit.T
        iu = np.triu_indices(len(ids), k=1)
        keep = sim[iu] >= threshold
        return pd.DataFrame(
            {
                "a": ids[iu[0][keep]],
                "b": ids[iu[1][keep]],
                "cosine": sim[iu][keep],
            }
        )

    return signed.groupby("lsh_bucket").map_groups(pairs, batch_format="pandas")


class IVFTopKPartial:
    """IVF (inverted-file) approximate top-k: vectors are assigned to
    their nearest coarse centroid; each query probes only the ``nprobe``
    closest centroid lists. The scale path for similarity search — at
    10^12 rows the centroid assignment is the partition key and each
    probe touches ``nprobe/n_centroids`` of the data; here the list
    filter runs inside each batch and partial top-ks merge on the driver
    (same shape as the brute-force ``TopKDotPartial``, minus the skipped
    vectors)."""

    def __init__(self, queries_ref, centroids_ref, k: int, nprobe: int,
                 id_col="vec_id", emb_col="embedding"):
        import ray

        self.q_ids, q_mat = ray.get(queries_ref)
        self.q_mat = quantize(q_mat).astype(np.float64)  # integer scoring
        self.centroids = ray.get(centroids_ref)  # (c, dim) float64
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col
        # per query: the nprobe nearest centroids by dot product
        sims = self.q_mat @ self.centroids.T
        order = np.argsort(-sims, axis=1, kind="stable")
        self.probe = order[:, :nprobe]  # (nq, nprobe)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[self.id_col].combine_chunks(), np.int64)
        mat = quantize(_emb_matrix(batch, self.emb_col))
        # assign batch vectors to their nearest centroid
        assign = np.argmax(mat @ self.centroids.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.q_ids):
            m = np.isin(assign, self.probe[qi])
            if not m.any():
                continue
            scores = mat[m] @ self.q_mat[qi]
            sel = np.argsort(-scores, kind="stable")[: self.k]
            out_q.append(np.full(len(sel), qid, np.int64))
            out_v.append(ids[m][sel])
            out_s.append(scores[sel].astype(np.int64))
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.int64()),
            }
        )


def ivf_topk(ds, q_ids, q_mat, centroids, k: int = 10, nprobe: int = 4,
             id_col="vec_id", emb_col="embedding"):
    """IVF approximate top-k per query (see ``IVFTopKPartial``)."""
    import ray

    q_ref = ray.put((np.asarray(q_ids, np.int64), np.asarray(q_mat, np.float64)))
    c_ref = ray.put(np.asarray(centroids, np.float64))
    parts = ds.map_batches(
        IVFTopKPartial(q_ref, c_ref, k, nprobe, id_col, emb_col),
        batch_format="pyarrow", batch_size=None,
    ).to_pandas()
    out = []
    for qid, g in parts.groupby("query_id", sort=True):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        columns=["query_id", "vec_id", "score", "rank"]
    )
    return res[["query_id", "rank", "vec_id", "score"]]
