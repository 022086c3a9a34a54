"""Gmapsupp combiner layer (``combiners/GmapsuppBuilder.java`` +
``imgfmt/sys/ImgFS.java`` / ``ImgHeader.java``) re-expressed for Ray
Data: the deterministic filesystem math — 8.3 sub-file names, the
best-block-size search, FAT directory-slot allocation, contiguous block
assignment and the partition CHS geometry — vectorized over MANY
mapsets at once (candidate/combination loops run over fixed-size
constant lists; all per-group state is numpy vectors).

Reproduced semantics (cited):

- 8.3 names (``GmapsuppBuilder.createImgFilename``,
  ``GmapsuppBuilder.java:358-377``): basename upper-cased, base
  truncated to 8, extension to 3.
- best block size (``ImgFS.java:270-316``): doubling candidates from
  512 to < 2^24; per candidate ``fileBlocks = Σ ceil(len/bs)``,
  ``headerSlots = 1 + Σ ceil(nBlocks/240)`` (files do not share
  directory blocks), ``headerBlocks = ceil((2 + headerSlots)*512/bs)``;
  candidates with ``headerBlocks > 240`` or ``totalBlocks > 0xfffe``
  are skipped, and the scan stops at the first size increase over the
  previously accepted candidate.
- block allocation: header/directory occupies blocks
  ``0..reserved-1``, files get contiguous runs in creation order
  starting at ``reserved`` (``ImgFS.createInitFS`` block managers).
- partition geometry (``ImgHeader.writeSizeValues``,
  ``ImgHeader.java:189-256``): ``endSector = ((numBlocks+1)*bs+511)/
  512``; first (h, s, c) from the ordered candidate lists with
  ``s*h*c > endSector`` (defaults 128/32/0x400 when none fits).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SLOTS_PER_ENTRY = 240
ENTRY_SIZE = 512
DIR_START_ENTRY = 2

_BLOCK_CANDIDATES = np.array([512 << i for i in range(15)], np.int64)

# ImgHeader.writeSizeValues candidate lists, in loop order (h, s, c)
_H = (16, 32, 64, 128, 256)
_S = (4, 8, 16, 32)
_C = (0x20, 0x40, 0x80, 0x100, 0x200, 0x3FF)
_CHS = np.array(
    [(h, s, c) for h in _H for s in _S for c in _C], np.int64
)
_CHS_PRODUCT = _CHS[:, 0] * _CHS[:, 1] * _CHS[:, 2]


def img_filename(paths: pd.Series) -> pd.Series:
    """``createImgFilename``: 8.3 upper-case name from a path."""
    name = paths.str.rsplit("/", n=1).str[-1].str.upper()
    base = name.str.rsplit(".", n=1).str[0].str.slice(0, 8)
    ext = name.str.rsplit(".", n=1).str[1].fillna("").str.slice(0, 3)
    return base + "." + ext


def best_block_size(sizes: np.ndarray, group_of: np.ndarray, n_groups: int):
    """Vectorized ``ImgFS`` block-size scan: one pass per candidate (15
    total), per-group state carried in numpy vectors.

    Returns (block_size, reserved_blocks, total_blocks) per group."""
    sizes = np.asarray(sizes, np.int64)
    group_of = np.asarray(group_of, np.int64)

    best_size = np.full(n_groups, np.int64(1) << 62, np.int64)
    best_bs = np.zeros(n_groups, np.int64)
    best_reserved = np.zeros(n_groups, np.int64)
    best_total = np.zeros(n_groups, np.int64)
    broken = np.zeros(n_groups, bool)
    # empty groups still get a header-only fs via the normal accept path

    for bs in _BLOCK_CANDIDATES:
        nb = (sizes + bs - 1) // bs
        slots = (nb + SLOTS_PER_ENTRY - 1) // SLOTS_PER_ENTRY
        file_blocks = np.zeros(n_groups, np.int64)
        np.add.at(file_blocks, group_of, nb)
        header_slots = np.ones(n_groups, np.int64)
        np.add.at(header_slots, group_of, slots)
        required = DIR_START_ENTRY + header_slots
        header_blocks = (required * ENTRY_SIZE + bs - 1) // bs
        total = header_blocks + file_blocks
        size = total * bs
        invalid = (header_blocks > SLOTS_PER_ENTRY) | (total > 0xFFFE)
        # the Java loop breaks on the first size increase over the
        # previously ACCEPTED candidate (invalid candidates 'continue')
        broken |= ~invalid & (size > best_size)
        accept = ~invalid & ~broken & (size <= best_size)
        best_size = np.where(accept, size, best_size)
        best_bs = np.where(accept, bs, best_bs)
        best_reserved = np.where(accept, header_blocks, best_reserved)
        best_total = np.where(accept, total, best_total)
    return best_bs, best_reserved, best_total


def allocate_blocks(
    sizes: np.ndarray,
    group_of: np.ndarray,
    block_size: np.ndarray,
    reserved: np.ndarray,
):
    """Contiguous per-file block runs in creation order: start block,
    block count, and the directory slots the file consumes."""
    sizes = np.asarray(sizes, np.int64)
    group_of = np.asarray(group_of, np.int64)
    bs = np.asarray(block_size, np.int64)[group_of]
    nb = (sizes + bs - 1) // bs
    cs = np.cumsum(nb)
    g_start = np.zeros(len(sizes), np.int64)
    first = np.concatenate(([True], group_of[1:] != group_of[:-1]))
    g_start[first] = cs[first] - nb[first]
    run0 = np.maximum.accumulate(g_start)
    start = np.asarray(reserved, np.int64)[group_of] + (cs - nb) - run0
    dir_slots = (nb + SLOTS_PER_ENTRY - 1) // SLOTS_PER_ENTRY
    return start, nb, dir_slots


def partition_geometry(total_blocks: np.ndarray, block_size: np.ndarray):
    """``writeSizeValues``: end sector + first fitting (h, s, c)."""
    total_blocks = np.asarray(total_blocks, np.int64)
    block_size = np.asarray(block_size, np.int64)
    end_sector = ((total_blocks + 1) * block_size + 511) // 512
    fits = _CHS_PRODUCT[None, :] > end_sector[:, None]
    any_fit = fits.any(axis=1)
    idx = np.argmax(fits, axis=1)
    heads = np.where(any_fit, _CHS[idx, 0], 128)
    sectors = np.where(any_fit, _CHS[idx, 1], 32)
    cyls = np.where(any_fit, _CHS[idx, 2], 0x400)
    return end_sector, heads, sectors, cyls
