"""Deterministic image+caption table generator + codecs.

Produces exactly the input_hint column shape from BASELINE.json:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)`` plus geo columns ``lat:float64,
lon:float64`` (80% uniform in the bbox, 20% in 3 dense hotspots — the skew
driver for salting tests; see FIXTURES.md T1).

Formats:
- ``png``: real lossless PNG via ``png.py`` — decode is bit-exact;
- ``qraw``: the *lossy* stand-in for JPEG (no JPEG codec in this
  container): pixels quantized to 5 bits per channel and zlib-compressed
  (error ≤ 4/255 → PSNR ≈ 40.7 dB, above the 40 dB invariant).
  Header ``b"QRAW" + w:u32 + h:u32``. A real deployment swaps
  ``decode_image``'s qraw branch for a JPEG codec; the Ray-side plumbing
  (schema, batch size, actor signature) is identical.

``phash``: 64-bit average-hash of the decoded pixels (8×8 block-mean of
grayscale, bit = block > mean), stable across encode/decode for both
formats.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from .png import decode_png, encode_png

HOTSPOTS = ((0.2, 0.3), (0.7, 0.6), (0.5, 0.85))  # fractions of the bbox


def encode_qraw(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    q = (rgb >> 3).astype(np.uint8)  # 5-bit quantization (lossy, ~40.7 dB)
    return (
        b"QRAW"
        + w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + zlib.compress(q.tobytes(), 6)
    )


def decode_qraw(data: bytes) -> np.ndarray:
    assert data[:4] == b"QRAW"
    w = int.from_bytes(data[4:8], "big")
    h = int.from_bytes(data[8:12], "big")
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return ((q << 3) | 4).astype(np.uint8)  # dequantize to bin center


def decode_stack(datas, fmts, w: int, h: int) -> np.ndarray:
    """Decode same-shape images into an (m, h, w, 3) uint8 stack. The
    entropy step (zlib) is per-row C calls; everything after is one
    vectorized pass (the png filter-0 unfilter is a reshape; qraw
    dequantization runs over the whole stack)."""
    m = len(datas)
    out = np.empty((m, h, w, 3), np.uint8)
    qraw_idx = []
    for i, (data, fmt) in enumerate(zip(datas, fmts)):
        if fmt == "png":
            out[i] = decode_png(data)
        elif fmt == "qraw":
            assert data[:4] == b"QRAW"
            out[i] = np.frombuffer(
                zlib.decompress(data[12:]), dtype=np.uint8
            ).reshape(h, w, 3)
            qraw_idx.append(i)
        else:
            raise NotImplementedError(f"format {fmt!r}")
    if qraw_idx:
        q = out[qraw_idx]
        out[qraw_idx] = (q << 3) | 4  # dequantize to bin center
    return out


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "qraw":
        return decode_qraw(data)
    raise NotImplementedError(
        f"format {fmt!r}: real image codecs (jpeg/webp) are not available in "
        "this container; plug a codec into decode_image"
    )


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


_PHASH_WEIGHTS = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))


def phash64(rgb: np.ndarray) -> int:
    """64-bit average hash: 8×8 block means of grayscale, bit set where the
    block exceeds the mean of block means. Bit-stable across lossless
    round-trips; lossy round-trips may flip a few borderline-block bits
    (the pipeline invariant is Hamming distance ≤ 4, see tests).

    When both dimensions divide by 8 (every engine fixture shape) the
    comparison runs in EXACT integers — ``S_block * 64 > sum(S)`` over
    channel-sum blocks — which is also what lets ``phash64_batch``
    vectorize whole same-shape stacks with identical bits."""
    h, w = rgb.shape[:2]
    if h % 8 == 0 and w % 8 == 0:
        return int(phash64_batch(rgb[None])[0])
    gray = rgb.astype(np.float64).mean(axis=2)
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def phash64_batch(stack: np.ndarray) -> np.ndarray:
    """Vectorized ``phash64`` over an (m, h, w, 3) uint8 stack with h, w
    divisible by 8: integer block sums (uint8 channel sums fit int64),
    exact integer comparison ``S_block * 64 > total`` (equal-size blocks
    make the mean-of-block-means the global mean), MSB-first bit pack."""
    m, h, w = stack.shape[:3]
    assert h % 8 == 0 and w % 8 == 0
    g3 = stack.astype(np.int64).sum(axis=3)  # 3×gray per pixel, exact
    s = g3.reshape(m, 8, h // 8, 8, w // 8).sum(axis=(2, 4))  # (m, 8, 8)
    total = s.sum(axis=(1, 2))
    bits = (s.reshape(m, 64) * 64) > total[:, None]
    packed = (bits.astype(np.uint64) * _PHASH_WEIGHTS[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return packed.view(np.int64)


_BASE_CACHE: dict = {}


def _gradient_base(w: int, h: int) -> np.ndarray:
    """The per-shape gradient term of ``make_pixels`` — row-independent,
    cached (the per-row cost is then just the seeded noise draw)."""
    key = (w, h)
    base = _BASE_CACHE.get(key)
    if base is None:
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.stack(
            [
                (xx * 255 / max(w - 1, 1)),
                (yy * 255 / max(h - 1, 1)),
                ((xx + yy) * 255 / max(w + h - 2, 1)),
            ],
            axis=2,
        )
        _BASE_CACHE[key] = base
    return base


def make_pixels(row: int, w: int, h: int) -> np.ndarray:
    """Seeded RGB gradient+noise image, deterministic per row index."""
    rng = np.random.default_rng(42 + row)
    noise = rng.integers(0, 32, size=(h, w, 3))
    return np.clip(_gradient_base(w, h) + noise, 0, 255).astype(np.uint8)


def make_pixels_batch(rows: np.ndarray, w: int, h: int) -> np.ndarray:
    """(m, h, w, 3) uint8 stack of ``make_pixels`` for same-shape rows:
    the gradient base is computed once; only the seeded per-row noise
    draws loop (each row's PCG64 stream must match the scalar path
    bit-for-bit)."""
    m = len(rows)
    noise = np.empty((m, h, w, 3), np.int64)
    for i, row in enumerate(rows):
        noise[i] = np.random.default_rng(42 + int(row)).integers(
            0, 32, size=(h, w, 3)
        )
    return np.clip(
        _gradient_base(w, h)[None] + noise, 0, 255
    ).astype(np.uint8)


_WORDS = (
    "tile map cell river road park image pixel caption garmin osm "
    "north south east west clip merge split index"
).split()


def make_caption(row: int) -> str:
    w1 = _WORDS[row % len(_WORDS)]
    w2 = _WORDS[(row * 7 + 3) % len(_WORDS)]
    uni = " – λ°" if row % 7 == 0 else ""
    return f"caption for img{row} {w1} {w2}{uni}"


def geo_tags(n: int, seed: int = 42, bbox=(0.0, 0.0, 1.0, 1.0)):
    """(lat, lon) float64 arrays: 80% uniform, 20% clustered in 3 hotspots."""
    rng = np.random.default_rng(seed)
    min_lat, min_lon, max_lat, max_lon = bbox
    lat = rng.uniform(min_lat, max_lat, n)
    lon = rng.uniform(min_lon, max_lon, n)
    n_hot = n // 5
    which = rng.integers(0, len(HOTSPOTS), n_hot)
    span_lat, span_lon = max_lat - min_lat, max_lon - min_lon
    for k, (fy, fx) in enumerate(HOTSPOTS):
        m = which == k
        cnt = int(m.sum())
        lat[:n_hot][m] = np.clip(
            rng.normal(min_lat + fy * span_lat, span_lat / 100, cnt), min_lat, max_lat
        )
        lon[:n_hot][m] = np.clip(
            rng.normal(min_lon + fx * span_lon, span_lon / 100, cnt), min_lon, max_lon
        )
    return lat, lon


def generate_images(
    n: int, seed: int = 42, bbox=(0.0, 0.0, 1.0, 1.0), with_geo: bool = True
) -> pa.Table:
    """Build the images table (FIXTURES.md T1). Sizes cycle {32,64,128} ×
    {32,48,96}; formats alternate png / qraw."""
    ws = [32, 64, 128]
    hs = [32, 48, 96]
    cols = {
        "image_id": [],
        "bytes": [],
        "w": [],
        "h": [],
        "fmt": [],
        "caption": [],
        "phash": [],
    }
    for row in range(n):
        w, h = ws[row % 3], hs[row % 3]
        fmt = "png" if row % 2 == 0 else "qraw"
        rgb = make_pixels(row, w, h)
        data = encode_png(rgb) if fmt == "png" else encode_qraw(rgb)
        cols["image_id"].append(f"img{row:012d}")
        cols["bytes"].append(data)
        cols["w"].append(w)
        cols["h"].append(h)
        cols["fmt"].append(fmt)
        cols["caption"].append(make_caption(row))
        cols["phash"].append(phash64(rgb))
    table = pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
        }
    )
    if with_geo:
        lat, lon = geo_tags(n, seed=seed, bbox=bbox)
        table = table.append_column("lat", pa.array(lat, pa.float64()))
        table = table.append_column("lon", pa.array(lon, pa.float64()))
    return table


def _hash01(rows: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic per-row uniform [0,1) via splitmix64-style mixing —
    block-independent (streaming generation can't use a sequential rng)."""
    x = (rows.astype(np.uint64) + np.uint64(salt)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def geo_tags_rows(rows: np.ndarray, bbox=(0.0, 0.0, 1.0, 1.0)):
    """Per-row closed-form geo tags: 80% uniform, 20% (row%5==0) in one of
    3 dense hotspots (the skew driver), deterministic per row id."""
    min_lat, min_lon, max_lat, max_lon = bbox
    span_lat, span_lon = max_lat - min_lat, max_lon - min_lon
    lat = min_lat + _hash01(rows, 1) * span_lat
    lon = min_lon + _hash01(rows, 2) * span_lon
    hot = (rows % 5) == 0
    which = rows % len(HOTSPOTS)
    for k, (fy, fx) in enumerate(HOTSPOTS):
        m = hot & (which == k)
        # box-muller-free gaussian-ish: sum of 4 uniforms, ±2% of span
        g1 = (_hash01(rows, 3 + k) + _hash01(rows, 6 + k) - 1.0)
        g2 = (_hash01(rows, 9 + k) + _hash01(rows, 12 + k) - 1.0)
        lat[m] = np.clip(
            min_lat + fy * span_lat + g1[m] * span_lat / 50,
            min_lat, max_lat,
        )
        lon[m] = np.clip(
            min_lon + fx * span_lon + g2[m] * span_lon / 50,
            min_lon, max_lon,
        )
    return lat, lon


def generate_batch(rows: np.ndarray, bbox=(0.0, 0.0, 1.0, 1.0)) -> pa.Table:
    """Images table for an arbitrary set of row ids — the streaming twin of
    ``generate_images`` (same pixels/captions per row; geo tags use the
    block-independent closed form)."""
    ws = [32, 64, 128]
    hs = [32, 48, 96]
    cols = {k: [] for k in
            ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    for row in rows:
        row = int(row)
        w, h = ws[row % 3], hs[row % 3]
        fmt = "png" if row % 2 == 0 else "qraw"
        rgb = make_pixels(row, w, h)
        cols["image_id"].append(f"img{row:012d}")
        cols["bytes"].append(encode_png(rgb) if fmt == "png" else encode_qraw(rgb))
        cols["w"].append(w)
        cols["h"].append(h)
        cols["fmt"].append(fmt)
        cols["caption"].append(make_caption(row))
        cols["phash"].append(phash64(rgb))
    lat, lon = geo_tags_rows(np.asarray(rows, np.int64), bbox)
    return pa.table(
        {
            "image_id": pa.array(cols["image_id"], pa.string()),
            "bytes": pa.array(cols["bytes"], pa.binary()),
            "w": pa.array(cols["w"], pa.int32()),
            "h": pa.array(cols["h"], pa.int32()),
            "fmt": pa.array(cols["fmt"], pa.string()),
            "caption": pa.array(cols["caption"], pa.string()),
            "phash": pa.array(cols["phash"], pa.int64()),
            "lat": pa.array(lat, pa.float64()),
            "lon": pa.array(lon, pa.float64()),
        }
    )


def images_dataset(n: int, bbox=(0.0, 0.0, 1.0, 1.0), rows_per_block: int = 500):
    """Streaming images source: ``range(n)`` → per-block deterministic
    generation (the Lance-table stand-in; blocks carry the binary payload
    so keep them small — SURVEY.md §4 "binary image column makes blocks
    heavy")."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return generate_batch(
            np.asarray(batch["id"].combine_chunks(), np.int64), bbox
        )

    n_blocks = max(1, n // rows_per_block)
    return rd.range(n, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )


# the BASELINE.json input_hint column contract
IMAGE_TABLE_COLUMNS = (
    "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
)


def read_images_table(path: str, columns=None):
    """Read a stored image+caption table per the input_hint contract
    (``image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64``): ``ray.data.read_lance`` when the
    ``lance`` package is installed, parquet otherwise — identical
    downstream schema either way. ``columns`` prunes at the read (the
    coordinate-only tree scans must never load ``bytes``)."""
    import os

    import ray.data as rd

    # dispatch on what the path IS, not on which readers import: a Lance
    # dataset is a directory ending in .lance (or containing _versions/);
    # anything else is parquet. Keying off `import lance` would break
    # working parquet inputs the moment the optional package appears.
    looks_lance = path.rstrip("/").endswith(".lance") or (
        os.path.isdir(path) and os.path.isdir(os.path.join(path, "_versions"))
    )
    if looks_lance:
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise ImportError(
                f"{path} looks like a Lance dataset but the 'lance' "
                "package is not installed"
            ) from e
        ds = rd.read_lance(path, columns=list(columns) if columns else None)
    else:
        ds = rd.read_parquet(
            path, columns=list(columns) if columns else None
        )
    want = set(columns) if columns else set(IMAGE_TABLE_COLUMNS)
    have = set(ds.schema().names)
    missing = want - have
    if missing:
        raise ValueError(
            f"image table at {path} is missing input_hint columns: "
            f"{sorted(missing)}"
        )
    return ds
