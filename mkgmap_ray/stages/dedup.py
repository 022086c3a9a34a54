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

import numpy as np

import pandas as pd

def text_hash64(s: pd.Series) -> pd.Series:
    """Vectorized 64-bit content hash (pandas' C string hasher). Used only
    to hash-PARTITION groupbys — the true key always rides alongside, so
    collisions are safe; determinism is all that matters (round-2 version
    dispatched one Python sha1 call per row)."""
    h = pd.util.hash_pandas_object(s, index=False).to_numpy(np.uint64)
    return pd.Series(h.view(np.int64), index=s.index)


def exact_dedup(ds, key: str = "text", id_col: str = "doc_id"):
    """Keep the smallest id per distinct key. Returns (keep_id, n_dups) per
    group. Hash-partitioned groupby on the 64-bit content hash; the raw key
    never shuffles."""

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        h = text_hash64(b[key])
        return pd.DataFrame(
            {"h": h, "part": h.to_numpy(np.int64) & 255,
             id_col: b[id_col], key: b[key]}
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        # one call per hash PARTITION (bounded group count, not one Ray
        # group per distinct text); group by the true key inside
        # (collision-safe)
        out = (
            g.groupby(key, sort=True)[id_col]
            .agg(["min", "count"])
            .reset_index(drop=True)
        )
        return out.rename(columns={"min": "keep_id", "count": "n_dups"})

    return (
        ds.map_batches(add_hash, batch_format="pandas", batch_size=None)
        .groupby("part")
        .map_groups(keep_first, batch_format="pandas")
    )


# --- MinHash ----------------------------------------------------------------

# Modulus of the (a*x+b) mod p permutation family. 2^31-1 keeps every
# intermediate (< 2^62) inside int64, so the same arithmetic runs in numpy
# AND in a DuckDB BIGINT oracle (the SQL-checkable face of the operator).
P31 = (1 << 31) - 1
SHINGLE_BASE = 31  # base-31 polynomial over the k shingle bytes (< 2^31)


def _shingle_hash_batch(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Base-31 polynomial hashes of every k-byte shingle of every text,
    fully vectorized (k fused passes over one concatenated byte buffer —
    no per-row Python). Returns (vals, starts): flat int64 hash array in
    doc order plus per-doc start offsets (len n+1, counts >= 1: a text
    shorter than k contributes its whole-text polynomial)."""
    enc = [t.encode("utf-8") for t in texts]
    n = len(enc)
    lens = np.fromiter((len(e) for e in enc), np.int64, n)
    buf = np.frombuffer(b"".join(enc), np.uint8).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])
    counts = np.where(lens >= k, lens - k + 1, 1)
    starts = np.concatenate([[0], np.cumsum(counts)])
    total = int(starts[-1])

    doc_of = np.repeat(np.arange(n), counts)
    local = np.arange(total) - np.repeat(starts[:-1], counts)
    pos = offs[doc_of] + local
    vals = np.zeros(total, np.int64)
    if len(buf):  # all-empty batch: vals stay 0 (empty-string polynomial)
        guard = len(buf) - 1
        for j in range(k):
            vals = vals * SHINGLE_BASE + buf[np.minimum(pos + j, guard)]
    short = np.nonzero(lens < k)[0]
    for d in short:  # rare: whole-text polynomial
        h = 0
        for byte in enc[d]:
            h = h * SHINGLE_BASE + byte
        vals[starts[d]] = h
    return vals, starts


class MinHasher:
    """Minhash signatures via the (a*x+b) mod 2^31-1 universal family over
    base-31 shingle polynomials, seeded. Vectorized across a whole batch of
    documents (``signatures``); DuckDB-expressible closed form."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, P31, num_perm, dtype=np.int64)
        self.b = rng.integers(0, P31, num_perm, dtype=np.int64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) int64 signature matrix for a batch of texts.
        Perm × shingle products stay < 2^62 (int64-exact). Chunks are
        cache-resident (num_perm × 2^14 × 8 B ≈ 8 MB) and every op writes
        into two preallocated buffers — the round-2 version built ~8 fresh
        64 MB temporaries per chunk and was memory-bandwidth-bound on this
        box's slow first-touch pages (25.8 s → ~1.6 s for 5000 docs)."""
        vals, starts = _shingle_hash_batch(texts, self.k)
        n = len(starts) - 1
        sig = np.empty((n, self.num_perm), np.int64)
        CHUNK = 1 << 14  # shingles per slab (doc-aligned where possible)
        x = np.empty((self.num_perm, CHUNK), np.int64)
        t = np.empty((self.num_perm, CHUNK), np.int64)
        a2, b2 = self.a[:, None], self.b[:, None]
        d0 = 0
        while d0 < n:
            d1 = d0 + 1
            while d1 < n and starts[d1 + 1] - starts[d0] <= CHUNK:
                d1 += 1
            v = vals[starts[d0] : starts[d1]]
            w = len(v)
            if w <= CHUNK:
                xs, ts = x[:, :w], t[:, :w]
            else:  # single doc longer than CHUNK: one-off buffers
                xs = np.empty((self.num_perm, w), np.int64)
                ts = np.empty((self.num_perm, w), np.int64)
            np.multiply(a2, v[None, :], out=xs)
            xs += b2
            # Mersenne reduction: for p = 2^31-1 and x < 2^62,
            # x mod p = fold(high | low) twice + conditional subtract —
            # shifts/adds instead of int64 division, all in-place
            np.right_shift(xs, 31, out=ts)
            xs &= P31
            xs += ts
            np.right_shift(xs, 31, out=ts)
            xs &= P31
            xs += ts
            np.subtract(xs, P31, out=ts)
            np.copyto(xs, ts, where=xs >= P31)
            seg = (starts[d0 : d1] - starts[d0]).astype(np.int64)
            sig[d0:d1] = np.minimum.reduceat(xs, seg, axis=1).T
            d0 = d1
        return sig

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def jaccard_est(self, sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float((sig_a == sig_b).mean())


_BANDMIX = np.uint64(0x9E3779B97F4A7C15)


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) int64 bucket keys: per band, fold the band's signature
    values with a splitmix-style multiply-xor (vectorized uint64
    wraparound)."""
    n, num_perm = sig.shape
    r = num_perm // bands
    chunks = sig.astype(np.uint64).reshape(n, bands, r)
    h = np.full((n, bands), 0xCBF29CE484222325, np.uint64)
    with np.errstate(over="ignore"):
        for i in range(r):
            h = (h ^ chunks[:, :, i]) * _BANDMIX
            h ^= h >> np.uint64(29)
    return h.view(np.int64)


class MinHashBands:
    """map_batches actor: doc → (band, band_hash, doc_id, sig) rows —
    vectorized whole-batch signature + band-hash computation (no per-row
    Python; round 1's iterrows + per-byte FNV was the engine's slowest
    stage)."""

    def __init__(self, num_perm=64, bands=16, shingle_k=5, seed=42,
                 text_col="text", id_col="doc_id"):
        assert num_perm % bands == 0
        self.mh = MinHasher(num_perm, shingle_k, seed)
        self.bands = bands
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sig = self.mh.signatures(batch[self.text_col].tolist())
        bh = band_hashes(sig, self.bands)
        ids = batch[self.id_col].to_numpy(np.int64)
        sig_bytes = [s.tobytes() for s in sig]
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(self.bands, dtype=np.int32), n),
                "band_hash": bh.reshape(-1),
                "doc_id": np.repeat(ids, self.bands),
                "sig": [sig_bytes[i] for i in range(n) for _ in range(self.bands)],
            }
        )


N_BUCKET_PARTS = 64  # LSH buckets hash-partitioned into this many groups
MAX_BUCKET = 512  # cap per-bucket membership (deterministic: smallest ids)


def _bucket_pairs(gid: np.ndarray, max_bucket: int) -> tuple[np.ndarray, np.ndarray]:
    """Row-index pairs (iu, ju) within each run of a grouped-sorted code
    array. The dominant 2-member-bucket case extracts in ONE vectorized
    pass (sorted-run first-index + 1); only buckets with >2 members loop,
    capped at ``max_bucket`` rows (rows are id-sorted, so the cap keeps
    the smallest ids deterministically)."""
    if not len(gid):
        e = np.empty(0, np.int64)
        return e, e
    starts = np.flatnonzero(np.diff(gid, prepend=gid[0] - 1))
    sizes = np.diff(np.append(starts, len(gid)))
    iu_all, ju_all = [], []
    two = sizes == 2
    if two.any():
        i0 = starts[two]
        iu_all.append(i0)
        ju_all.append(i0 + 1)
    for bi in np.flatnonzero(sizes > 2):
        s = int(starts[bi])
        sz = min(int(sizes[bi]), max_bucket)
        li, lj = np.triu_indices(sz, 1)
        iu_all.append(s + li)
        ju_all.append(s + lj)
    if not iu_all:
        e = np.empty(0, np.int64)
        return e, e
    return (
        np.concatenate(iu_all).astype(np.int64),
        np.concatenate(ju_all).astype(np.int64),
    )


def unique_pairs(pairs_ds, value_cols: tuple[str, ...]):
    """Exactly-once (a, b) pairs: hash-partition the (small) pairs table
    and drop duplicates per partition. Replaces round 2's canonical-band
    local dedupe, which silently LOST a pair when the first co-bucketing
    band's bucket was capped (ADVICE round 2): every band now emits its
    surviving pairs and this stage dedupes them — only candidate pairs
    shuffle, never band rows or payloads."""

    def add_pp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        key = b["a"].to_numpy(np.int64) * 1000003 + b["b"].to_numpy(np.int64)
        b["pp"] = key & (N_BUCKET_PARTS - 1)
        return b

    cols = ["a", "b", *value_cols]

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[cols]

    return (
        pairs_ds.map_batches(add_pp, batch_format="pandas", batch_size=None)
        .groupby("pp")
        .map_groups(drop, batch_format="pandas")
    )


def minhash_candidates(ds, num_perm=64, bands=16, shingle_k=5, seed=42,
                       threshold: float = 0.5, text_col="text", id_col="doc_id"):
    """documents → candidate near-dup pairs (a < b) with minhash-estimated
    Jaccard ≥ threshold. Pairs are deduped across bands downstream.

    Scale shape: the shuffle moves only (band, band_hash, doc_id, sig)
    rows — never document payloads — hash-partitioned into
    ``N_BUCKET_PARTS`` groups (ONE vectorized pandas call per partition,
    not one per LSH bucket: round 1's per-bucket map_groups paid Ray
    group-dispatch overhead ~75k times). Buckets over ``MAX_BUCKET``
    members are capped deterministically (smallest doc_ids kept) so a
    heavy duplicate cluster cannot go O(n²)."""
    # instance (not class): hasher setup is microseconds, so plain tasks
    # beat an actor pool — the instance is pickled once into the task
    # closure, no per-query actor spin-up
    banded = ds.map_batches(
        MinHashBands(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k, seed=seed,
            text_col=text_col, id_col=id_col,
        ),
        batch_format="pandas",
        batch_size=None,
    )

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["part"] = b["band_hash"].to_numpy(np.int64) & (N_BUCKET_PARTS - 1)
        return b

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        # one call per hash partition, fully vectorized: bucket runs are
        # found by sorting once, the dominant 2-member buckets extract
        # their pair in one pass, and ALL pairs' signature comparisons run
        # as a single matrix op (round 2 looped Python over thousands of
        # tiny buckets — the engine's slowest query two rounds running).
        empty = pd.DataFrame({"a": [], "b": [], "est_jaccard": []}).astype(
            {"a": np.int64, "b": np.int64, "est_jaccard": np.float64}
        )
        if not len(g):
            return empty
        g = g.drop_duplicates(["band", "band_hash", "doc_id"])
        gid = g.groupby(["band", "band_hash"], sort=False).ngroup().to_numpy(
            np.int64
        )
        ids = g["doc_id"].to_numpy(np.int64)
        order = np.lexsort((ids, gid))
        gid, ids = gid[order], ids[order]
        iu, ju = _bucket_pairs(gid, MAX_BUCKET)
        if not len(iu):
            return empty
        sigs = g["sig"].to_numpy()[order]
        S = np.frombuffer(b"".join(sigs), np.int64).reshape(len(gid), -1)
        est = (S[iu] == S[ju]).mean(axis=1)
        keep = est >= threshold
        out = pd.DataFrame(
            {
                "a": ids[iu[keep]],
                "b": ids[ju[keep]],
                "est_jaccard": est[keep],
            }
        )
        return out.drop_duplicates(["a", "b"])

    pairs = (
        banded.map_batches(add_part, batch_format="pandas", batch_size=None)
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
    )
    # exactly-once across bands: every band emits, the (tiny) pairs table
    # dedupes — see unique_pairs for why the local canonical-band rule was
    # dropped (capped buckets could lose a pair permanently)
    return unique_pairs(pairs, ("est_jaccard",))


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-character-shingle Jaccard (the verifier for LSH candidates)."""
    sa = {text_a[i : i + k] for i in range(max(1, len(text_a) - k + 1))}
    sb = {text_b[i : i + k] for i in range(max(1, len(text_b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# --- SimHash ----------------------------------------------------------------


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv1a64_batch(tokens: list[bytes | str]) -> np.ndarray:
    """FNV-1a 64-bit of many byte strings at once: one uint64 vector pass
    per byte POSITION (padded matrix + done-mask), not per byte — bit-exact
    with the classic scalar loop."""
    enc = [t.encode("utf-8") if isinstance(t, str) else t for t in tokens]
    n = len(enc)
    if n == 0:
        return np.empty(0, np.uint64)
    lens = np.fromiter((len(e) for e in enc), np.int64, n)
    maxlen = int(lens.max(initial=0))
    M = np.zeros((n, maxlen), np.uint64)
    flat = np.frombuffer(b"".join(enc), np.uint8)
    offs = np.concatenate([[0], np.cumsum(lens)])
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(int(offs[-1])) - np.repeat(offs[:-1], lens)
    M[rows, cols] = flat
    h = np.full(n, _FNV_OFFSET, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            live = j < lens
            h = np.where(live, (h ^ M[:, j]) * _FNV_PRIME, h)
    return h


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """64-bit SimHash of each text over whitespace tokens, vectorized:
    token FNV hashes in one padded pass, per-bit ±1 votes combined with
    add.reduceat over token segments. Bit-exact with the classic per-token
    scalar algorithm. Returns int64 (two's-complement view)."""
    tok_lists = [t.split() for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), np.int64, len(texts))
    all_tokens = [t for toks in tok_lists for t in toks]
    hs = fnv1a64_batch(all_tokens)
    bits = (
        (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.int64)
    votes = 2 * bits - 1  # ±1 per bit per token
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    # reduceat runs over NON-EMPTY docs' starts only (strictly increasing,
    # each segment ends exactly where the next non-empty doc begins), so a
    # trailing/interior empty doc can never steal or clamp a neighbor's
    # token segment; empty docs keep acc = 0.
    acc = np.zeros((len(texts), 64), np.int64)
    nonempty = counts > 0
    if len(all_tokens):
        acc[nonempty] = np.add.reduceat(votes, starts[nonempty], axis=0)
    sh = np.where(acc > 0, np.uint64(1), np.uint64(0)) << np.arange(
        64, dtype=np.uint64
    )[None, :]
    return sh.sum(axis=1, dtype=np.uint64).view(np.int64)


def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit SimHash over token FNV hashes (scalar face of
    ``simhash64_batch``)."""
    return int(simhash64_batch([" ".join(tokens)])[0]) if tokens else int(
        simhash64_batch([""])[0]
    )


class SimHashChunks:
    """map_batches: doc → 4 rows (chunk_idx, chunk_val, doc_id, simhash) —
    pigeonhole blocking for Hamming ≤ 3 candidate generation. Whole-batch
    vectorized signatures."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sh = simhash64_batch(batch[self.text_col].tolist())
        u = sh.view(np.uint64)
        ids = batch[self.id_col].to_numpy(np.int64)
        chunk_vals = (
            (u[:, None] >> (np.uint64(16) * np.arange(4, dtype=np.uint64)))
            & np.uint64(0xFFFF)
        ).astype(np.int32)
        return pd.DataFrame(
            {
                "chunk_idx": np.tile(np.arange(4, dtype=np.int32), n),
                "chunk_val": chunk_vals.reshape(-1),
                "doc_id": np.repeat(ids, 4),
                "simhash": np.repeat(sh, 4),
            }
        )


_POPCNT8 = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1
).sum(axis=1).astype(np.int64)


def hamming64(x: np.ndarray) -> np.ndarray:
    """Popcount of int64/uint64 values via a byte lookup (vectorized)."""
    b = np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)
    return _POPCNT8[b].sum(axis=1)


def simhash_candidates(ds, max_hamming: int = 3, text_col="text", id_col="doc_id"):
    """Pigeonhole-blocked SimHash near-dup pairs (Hamming ≤ max_hamming).
    Same partitioned-bucket shape as ``minhash_candidates``: chunk buckets
    hash into ``N_BUCKET_PARTS`` groups, pair generation vectorized per
    bucket with popcount lookups, heavy buckets capped at ``MAX_BUCKET``."""
    chunked = ds.map_batches(
        SimHashChunks(text_col=text_col, id_col=id_col),
        batch_format="pandas",
        batch_size=None,
    )

    def add_part(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        key = (
            b["chunk_idx"].to_numpy(np.int64) * 65536
            + b["chunk_val"].to_numpy(np.int64)
        )
        b["part"] = key & (N_BUCKET_PARTS - 1)
        return b

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized (same sorted-run shape as minhash pairs_part)
        empty = pd.DataFrame({"a": [], "b": [], "hamming": []}).astype(
            np.int64
        )
        if not len(g):
            return empty
        g = g.drop_duplicates(["chunk_idx", "chunk_val", "doc_id"])
        gid = g.groupby(["chunk_idx", "chunk_val"], sort=False).ngroup(
        ).to_numpy(np.int64)
        ids = g["doc_id"].to_numpy(np.int64)
        order = np.lexsort((ids, gid))
        gid, ids = gid[order], ids[order]
        iu, ju = _bucket_pairs(gid, MAX_BUCKET)
        if not len(iu):
            return empty
        hs = g["simhash"].to_numpy(np.int64)[order]
        ham = hamming64(np.bitwise_xor(hs[iu], hs[ju]))
        keep = ham <= max_hamming
        out = pd.DataFrame(
            {"a": ids[iu[keep]], "b": ids[ju[keep]], "hamming": ham[keep]}
        )
        return out.drop_duplicates(["a", "b"])

    pairs = (
        chunked.map_batches(add_part, batch_format="pandas", batch_size=None)
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
    )
    return unique_pairs(pairs, ("hamming",))


class MinHashSig:
    """map_batches actor: per-doc SQL-checkable minhash face —
    (doc_id, sig_sum = sum of the 64 signature values, n_shingles).
    The (a*x+b) mod 2^31-1 family over base-31 shingle polynomials is
    int64-exact in both numpy and DuckDB (the oracle mirrors it closed
    form), graduating MinHash from a rows-only check."""

    def __init__(self, num_perm=64, shingle_k=5, seed=42,
                 text_col="text", id_col="doc_id"):
        self.mh = MinHasher(num_perm, shingle_k, seed)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].tolist()
        sig = self.mh.signatures(texts)
        lens = np.fromiter((len(t) for t in texts), np.int64, len(texts))
        return pd.DataFrame(
            {
                "doc_id": batch[self.id_col].to_numpy(np.int64),
                "sig_sum": sig.sum(axis=1),
                "n_shingles": np.where(
                    lens >= self.mh.k, lens - self.mh.k + 1, 1
                ),
            }
        )


class SimHashSig:
    """map_batches actor: per-doc (doc_id, simhash) — the SQL-checkable
    SimHash face (FNV-1a token hashes are reproduced in DuckDB with
    HUGEINT wraparound emulation)."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch[self.id_col].to_numpy(np.int64),
                "simhash": simhash64_batch(batch[self.text_col].tolist()),
            }
        )


# --- exact n-gram Jaccard ----------------------------------------------------

NGRAM_WORDS = 4  # shingle width in whitespace tokens
NGRAM_MAX_BUCKET = 4096  # safety cap only; see ngram_jaccard_pairs docstring
_NGRAM_F = np.uint64(0x100000001B3)  # FNV prime reused as the combine base


def _wordgram_hashes(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, hash) per word-k-gram, fully vectorized after token
    hashing: each token gets its FNV-1a 64 hash (one padded-matrix pass
    for the whole batch), then the k-gram hash is the base-FNV_PRIME
    polynomial of the k token hashes — computed with numpy uint64
    wraparound over shifted views, never a per-shingle Python loop.
    Windows never cross document boundaries (doc-index equality mask)."""
    toks_per_doc = [t.split() for t in texts]
    counts = np.fromiter((len(t) for t in toks_per_doc), np.int64,
                         len(toks_per_doc))
    flat = [w for ws in toks_per_doc for w in ws]
    if not flat:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    th = fnv1a64_batch(flat)  # uint64, vectorized per char position
    di = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    if len(th) < k:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = th[: len(th) - k + 1].copy()
    for j in range(1, k):
        h *= _NGRAM_F  # uint64 wraparound == HUGEINT % 2^64 in the oracle
        h += th[j : len(th) - k + 1 + j]
    valid = di[: len(di) - k + 1] == di[k - 1 :]
    return di[: len(di) - k + 1][valid], h[valid]


class WordGramExplode:
    """map_batches task: documents → one row per DISTINCT (k-gram hash,
    doc) with the doc's distinct-shingle count ``n`` riding along (so the
    union size na+nb-inter never needs a separate sizes join downstream)."""

    def __init__(self, k: int = NGRAM_WORDS, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy(np.int64)
        di, h = _wordgram_hashes(batch[self.text_col].tolist(), self.k)
        if not len(h):
            return pd.DataFrame(
                {"h": pd.Series([], dtype=np.int64),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64),
                 "part": pd.Series([], dtype=np.int64)}
            )
        # distinct (doc, hash): sort once, keep run heads
        order = np.lexsort((h, di))
        di, h = di[order], h[order]
        keep = np.r_[True, (di[1:] != di[:-1]) | (h[1:] != h[:-1])]
        di, h = di[keep], h[keep]
        n_per_doc = np.bincount(di, minlength=len(ids)).astype(np.int64)
        hs = h.view(np.int64)
        return pd.DataFrame(
            {
                "h": hs,
                "doc_id": ids[di],
                "n": n_per_doc[di],
                "part": hs & (N_BUCKET_PARTS - 1),
            }
        )


def ngram_jaccard_pairs(ds, k: int = NGRAM_WORDS, min_ppm: int = 500_000,
                        text_col: str = "text", id_col: str = "doc_id"):
    """EXACT word-k-gram Jaccard near-dup pairs: explode each doc's
    distinct shingle hashes, hash-partition by shingle, extract
    co-occurring (a < b) pairs per partition (vectorized sorted-run
    extraction, one call per partition), and sum per-pair intersection
    counts across partitions. ``jacc_ppm = inter * 1e6 // (na + nb -
    inter)`` is integer arithmetic on both engine and oracle sides.

    Scale shape: only (hash, doc_id, n) rows shuffle — never text. Word
    k-grams are long enough that shingle buckets stay tiny (max 6 members
    on the sf0.1 corpus); ``NGRAM_MAX_BUCKET`` guards a degenerate corpus
    but is NOT expected to bind (binding would undercount intersections —
    the exact operator is the LSH verifier, not the 100-TB first pass;
    minhash_candidates is the first pass and this confirms its survivors).
    The final combine is bounded by candidate-pair count (output-sized),
    per the combine_partials contract. Assumes doc_id < 2^31 for the
    packed pair key."""
    from .combine import combine_partials

    exploded = ds.map_batches(
        WordGramExplode(k=k, text_col=text_col, id_col=id_col),
        batch_format="pandas", batch_size=None,
    )

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"key": pd.Series([], dtype=np.int64),
             "inter": pd.Series([], dtype=np.int64),
             "na": pd.Series([], dtype=np.int64),
             "nb": pd.Series([], dtype=np.int64)}
        )
        if not len(g):
            return empty
        h = g["h"].to_numpy(np.int64)
        ids = g["doc_id"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        order = np.lexsort((ids, h))
        h, ids, n = h[order], ids[order], n[order]
        gid = np.cumsum(np.r_[True, h[1:] != h[:-1]])
        iu, ju = _bucket_pairs(gid, NGRAM_MAX_BUCKET)
        if not len(iu):
            return empty
        key = (ids[iu] << np.int64(32)) | ids[ju]
        uk, first, cnt = np.unique(key, return_index=True, return_counts=True)
        return pd.DataFrame(
            {"key": uk, "inter": cnt.astype(np.int64),
             "na": n[iu[first]], "nb": n[ju[first]]}
        )

    parts = exploded.groupby("part").map_groups(
        pairs_part, batch_format="pandas"
    )
    c = combine_partials(parts, "key", ["inter"], first_cols=["na", "nb"])
    key, inter = c["key"], c["inter"]
    na, nb = c["na"], c["nb"]
    union = na + nb - inter
    jacc_ppm = inter * 1_000_000 // np.maximum(union, 1)
    m = jacc_ppm >= min_ppm
    out = pd.DataFrame(
        {
            "a": (key[m] >> 32).astype(np.int64),
            "b": (key[m] & 0xFFFFFFFF).astype(np.int64),
            "inter": inter[m],
            "jacc_ppm": jacc_ppm[m].astype(np.int64),
        }
    )
    return out.sort_values(["a", "b"]).reset_index(drop=True)
