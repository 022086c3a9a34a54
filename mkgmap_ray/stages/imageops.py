"""Image-payload transform stages: decode → transform → re-encode as
actor-pool ``map_batches`` passes over the ``(image_id, bytes, w, h,
fmt, caption, phash)`` table (the BASELINE.json input_hint shape).

All pixel math is real numpy (the container ships no image libs; the
codecs in ``sources/images.py`` are real PNG + the documented lossy
qraw stand-in). Semantics:

- ``bilinear_resize``: align-corners=False sampling (the standard
  OpenCV/PIL convention), channel-vectorized gather + lerp.
- ``center_crop``: exact pixel slice.
- ``to_grayscale``: BT.601 integer weights (77R + 150G + 29B) >> 8
  (``phash64`` uses a plain channel mean; this is the luma form).

The ``ImageTransform`` actor decodes once, applies the configured ops
and re-encodes in the row's own format, updating w/h/phash — the
decode/transform/re-encode shape a 100-TB multimodal pipeline runs
tile-parallel (small batches: pixel payloads dominate memory).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def bilinear_resize(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """uint8 HxWx3 → out_h x out_w x 3, bilinear, half-pixel centers."""
    h, w = rgb.shape[:2]
    if (out_h, out_w) == (h, w):
        return rgb.copy()
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    p = rgb.astype(np.float64)
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def center_crop(rgb: np.ndarray, crop_w: int, crop_h: int) -> np.ndarray:
    h, w = rgb.shape[:2]
    cw, ch = min(crop_w, w), min(crop_h, h)
    y0 = (h - ch) // 2
    x0 = (w - cw) // 2
    return rgb[y0: y0 + ch, x0: x0 + cw]


def to_grayscale(rgb: np.ndarray) -> np.ndarray:
    """BT.601 integer luma (same weights as ``phash64``)."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


class ImageTransform:
    """Actor: decode each image, apply the configured transform chain,
    re-encode in the source format. ``ops`` is a list of
    ("resize", w, h) / ("crop", w, h) tuples applied in order."""

    def __init__(self, ops):
        from ..sources.images import (
            decode_image,
            encode_qraw,
            phash64,
        )
        from ..sources.png import encode_png

        self.ops = list(ops)
        self._decode = decode_image
        self._encode_png = encode_png
        self._encode_qraw = encode_qraw
        self._phash = phash64

    def _apply(self, rgb: np.ndarray) -> np.ndarray:
        for op in self.ops:
            if op[0] == "resize":
                rgb = bilinear_resize(rgb, int(op[1]), int(op[2]))
            elif op[0] == "crop":
                rgb = center_crop(rgb, int(op[1]), int(op[2]))
            else:
                raise ValueError(f"unknown op {op[0]}")
        return rgb

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        n = batch.num_rows
        out_bytes, out_w, out_h, out_ph = [], [], [], []
        for i in range(n):
            rgb = self._decode(data[i], fmts[i])
            rgb = self._apply(rgb)
            enc = (
                self._encode_png(rgb)
                if fmts[i] == "png"
                else self._encode_qraw(rgb)
            )
            out_bytes.append(enc)
            out_h.append(rgb.shape[0])
            out_w.append(rgb.shape[1])
            out_ph.append(self._phash(rgb))
        # replace only the pixel-derived columns; geo/caption/extra
        # columns ride through untouched
        repl = {
            "bytes": pa.array(out_bytes, pa.binary()),
            "w": pa.array(np.asarray(out_w, np.int32), pa.int32()),
            "h": pa.array(np.asarray(out_h, np.int32), pa.int32()),
            "phash": pa.array(
                np.asarray(out_ph, np.uint64).astype(np.int64), pa.int64()
            ),
        }
        for name, arr in repl.items():
            batch = batch.set_column(
                batch.schema.get_field_index(name), name, arr
            )
        return batch
