"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Shapes (per the large-scale dedup playbook):

- exact: content-hash column in ``map_batches`` → hash-partitioned
  ``groupby`` → keep the smallest id per group (deterministic);
- MinHash-LSH: shingle→minhash signature per doc (vectorized per batch) →
  explode to (band, band_hash, doc_id) rows → ``groupby(band, band_hash)``
  → candidate pairs within buckets → verified n-gram Jaccard;
- SimHash: 64-bit signature; pigeonhole blocking on 16-bit chunks groups
  candidates with Hamming distance ≤ 3 guaranteed caught in ≥1 chunk.

All stages pre-aggregate inside batches; only the (tiny) signature /
candidate tables shuffle, never the document payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..util import pool_concurrency
import pandas as pd

MERSENNE = (1 << 61) - 1


def text_hash64(s: pd.Series) -> pd.Series:
    return s.map(
        lambda t: int.from_bytes(
            hashlib.sha1(t.encode("utf-8")).digest()[:8], "big", signed=True
        )
    ).astype("int64")


def exact_dedup(ds, key: str = "text", id_col: str = "doc_id"):
    """Keep the smallest id per distinct key. Returns (keep_id, n_dups) per
    group. Hash-partitioned groupby on the 64-bit content hash; the raw key
    never shuffles."""

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"h": text_hash64(b[key]), id_col: b[id_col], key: b[key]}
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # within a hash bucket, group by the true key (collision-safe)
        out = (
            g.groupby(key, sort=True)[id_col]
            .agg(["min", "count"])
            .reset_index(drop=True)
        )
        return out.rename(columns={"min": "keep_id", "count": "n_dups"})

    return (
        ds.map_batches(add_hash, batch_format="pandas")
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
    )


# --- MinHash ----------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """64-bit FNV-1a hashes of the k-character shingles."""
    if len(text) < k:
        data = [text]
    else:
        data = [text[i : i + k] for i in range(len(text) - k + 1)]
    out = np.empty(len(data), np.uint64)
    for i, sh in enumerate(data):
        h = np.uint64(0xCBF29CE484222325)
        for b in sh.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


class MinHasher:
    """Per-batch minhash signatures (``num_perm`` permutations via the
    (a*x+b) mod p universal family, seeded)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.b = rng.integers(0, MERSENNE, num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        vals = _shingle_hashes(text, self.k)
        # (a * x + b) in uint64 wraparound arithmetic — a deterministic
        # universal-ish family, fully vectorized (perm × shingle matrix)
        with np.errstate(over="ignore"):
            m = self.a[:, None] * vals[None, :] + self.b[:, None]
        return m.min(axis=1)

    def jaccard_est(self, sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


class MinHashBands:
    """map_batches actor: doc → (band, band_hash, doc_id) rows."""

    def __init__(self, num_perm=64, bands=16, shingle_k=5, seed=42,
                 text_col="text", id_col="doc_id"):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm, shingle_k, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out_band, out_hash, out_id, out_sig = [], [], [], []
        for _, row in batch.iterrows():
            sig = self.mh.signature(row[self.text_col])
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                bh = int.from_bytes(
                    hashlib.sha1(chunk.tobytes()).digest()[:8], "big", signed=True
                )
                out_band.append(b)
                out_hash.append(bh)
                out_id.append(row[self.id_col])
                out_sig.append(sig.tobytes())
        return pd.DataFrame(
            {
                "band": np.asarray(out_band, np.int32),
                "band_hash": np.asarray(out_hash, np.int64),
                "doc_id": np.asarray(out_id, np.int64),
                "sig": out_sig,
            }
        )


def minhash_candidates(ds, num_perm=64, bands=16, shingle_k=5, seed=42,
                       threshold: float = 0.5, text_col="text", id_col="doc_id"):
    """documents → candidate near-dup pairs (a < b) with minhash-estimated
    Jaccard ≥ threshold. Pairs are deduped across bands downstream."""
    banded = ds.map_batches(
        MinHashBands,
        fn_constructor_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pandas",
        concurrency=pool_concurrency(),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []}).astype(
                {"a": np.int64, "b": np.int64, "est_jaccard": np.float64}
            )
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        sigs = [np.frombuffer(s, np.uint64) for s in g["sig"]]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = float((sigs[i] == sigs[j]).mean())
                if est >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_j.append(est)
        return pd.DataFrame(
            {
                "a": np.asarray(out_a, np.int64),
                "b": np.asarray(out_b, np.int64),
                "est_jaccard": np.asarray(out_j, np.float64),
            }
        )

    cand = banded.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )

    def dedupe_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["a", "b"]).drop_duplicates(["a", "b"])

    return cand.groupby("a").map_groups(dedupe_pairs, batch_format="pandas")


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-character-shingle Jaccard (the verifier for LSH candidates)."""
    sa = {text_a[i : i + k] for i in range(max(1, len(text_a) - k + 1))}
    sb = {text_b[i : i + k] for i in range(max(1, len(text_b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# --- SimHash ----------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit SimHash over token FNV hashes."""
    acc = np.zeros(64, np.int64)
    for t in tokens:
        h = np.uint64(0xCBF29CE484222325)
        for b in t.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    val = 0
    for i in range(64):
        if acc[i] > 0:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


class SimHashChunks:
    """map_batches: doc → 4 rows (chunk_idx, chunk_val, doc_id, simhash) —
    pigeonhole blocking for Hamming ≤ 3 candidate generation."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"chunk_idx": [], "chunk_val": [], "doc_id": [], "simhash": []}
        for _, row in batch.iterrows():
            sh = simhash64(row[self.text_col].split())
            u = sh & 0xFFFFFFFFFFFFFFFF
            for c in range(4):
                rows["chunk_idx"].append(c)
                rows["chunk_val"].append((u >> (16 * c)) & 0xFFFF)
                rows["doc_id"].append(row[self.id_col])
                rows["simhash"].append(sh)
        return pd.DataFrame(
            {
                "chunk_idx": np.asarray(rows["chunk_idx"], np.int32),
                "chunk_val": np.asarray(rows["chunk_val"], np.int32),
                "doc_id": np.asarray(rows["doc_id"], np.int64),
                "simhash": np.asarray(rows["simhash"], np.int64),
            }
        )


def simhash_candidates(ds, max_hamming: int = 3, text_col="text", id_col="doc_id"):
    chunked = ds.map_batches(
        SimHashChunks,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas",
        concurrency=pool_concurrency(),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        hashes = g["simhash"].to_numpy().astype(np.int64)
        out_a, out_b, out_d = [], [], []
        for i in range(len(ids)):
            x = np.bitwise_xor(hashes[i + 1 :], hashes[i])
            ham = np.array([bin(int(v) & 0xFFFFFFFFFFFFFFFF).count("1") for v in x])
            ok = np.flatnonzero(ham <= max_hamming)
            for j in ok:
                out_a.append(ids[i])
                out_b.append(ids[i + 1 + j])
                out_d.append(int(ham[j]))
        return pd.DataFrame(
            {
                "a": np.asarray(out_a, np.int64),
                "b": np.asarray(out_b, np.int64),
                "hamming": np.asarray(out_d, np.int64),
            }
        )

    cand = chunked.groupby(["chunk_idx", "chunk_val"]).map_groups(
        pairs, batch_format="pandas"
    )

    def dedupe_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["a", "b"]).drop_duplicates(["a", "b"])

    return cand.groupby("a").map_groups(dedupe_pairs, batch_format="pandas")
