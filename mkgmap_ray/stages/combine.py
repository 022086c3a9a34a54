"""Partial-aggregate combining without an all-to-all shuffle.

The engine's standard reduce shape: every block pre-aggregates into ≤
(distinct keys in block) rows inside ``map_batches``, and the partials —
bounded by ``keys × blocks`` rows, NOT by input rows — are combined with
one numpy sort + ``reduceat`` on the driver. This beats Ray's sort-based
``groupby().aggregate()`` whenever the key cardinality is operator-output
sized (tiles, users, degrees…): the shuffle's fixed costs exceed the
driver combine by an order of magnitude on contended hosts, and the
driver never sees payload rows, only partials. For key spaces that scale
with the INPUT (dedup keys, join keys), use a real ``groupby`` —
documented per call site.
"""

from __future__ import annotations

import numpy as np


def combine_partials(
    parts_ds,
    key: str,
    sum_cols: list[str],
    first_cols: list[str] = (),
) -> dict[str, np.ndarray]:
    """Stream the partials dataset to the driver and combine by ``key``:
    ``sum_cols`` are summed, ``first_cols`` take the first-seen value.
    Returns columns as int64 numpy arrays sorted by key; empty input →
    empty arrays."""
    cols = {c: [] for c in (key, *sum_cols, *first_cols)}
    for b in parts_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for c in cols:
            cols[c].append(np.asarray(b[c].combine_chunks(), np.int64))
    if not cols[key] or sum(len(a) for a in cols[key]) == 0:
        return {c: np.empty(0, np.int64) for c in cols}
    k = np.concatenate(cols[key])
    order = np.argsort(k, kind="stable")
    k = k[order]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    out = {key: k[starts]}
    for c in sum_cols:
        out[c] = np.add.reduceat(np.concatenate(cols[c])[order], starts)
    for c in first_cols:
        out[c] = np.concatenate(cols[c])[order[starts]]
    return out
