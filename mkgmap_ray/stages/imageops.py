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


def bilinear_resize_stack(stack: np.ndarray, out_w: int,
                          out_h: int) -> np.ndarray:
    """uint8 (m, H, W, 3) → (m, out_h, out_w, 3), bilinear, half-pixel
    centers — one gather+lerp for the whole same-shape stack."""
    m, h, w = stack.shape[:3]
    if (out_h, out_w) == (h, w):
        return stack.copy()
    ys = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[None, :, None, None]
    fx = (xs - x0)[None, None, :, None]
    p = stack.astype(np.float64)
    top = p[:, y0][:, :, x0] * (1 - fx) + p[:, y0][:, :, x1] * fx
    bot = p[:, y1][:, :, x0] * (1 - fx) + p[:, y1][:, :, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def bilinear_resize(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """uint8 HxWx3 → out_h x out_w x 3, bilinear, half-pixel centers."""
    return bilinear_resize_stack(rgb[None], out_w, out_h)[0]


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
    ("resize", w, h) / ("crop", w, h) tuples applied in order. Decode,
    transform and phash run vectorized per same-shape group
    (``decode_stack`` → stacked crop/resize → ``phash64_batch``); only
    the zlib entropy steps are per row."""

    def __init__(self, ops):
        from ..sources.images import encode_qraw
        from ..sources.png import encode_png

        self.ops = list(ops)
        self._encode_png = encode_png
        self._encode_qraw = encode_qraw

    def _apply_stack(self, stack: np.ndarray) -> np.ndarray:
        for op in self.ops:
            if op[0] == "resize":
                stack = bilinear_resize_stack(stack, int(op[1]), int(op[2]))
            elif op[0] == "crop":
                h, w = stack.shape[1:3]
                cw, ch = min(int(op[1]), w), min(int(op[2]), h)
                y0 = (h - ch) // 2
                x0 = (w - cw) // 2
                stack = stack[:, y0: y0 + ch, x0: x0 + cw]
            else:
                raise ValueError(f"unknown op {op[0]}")
        return stack

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.images import (
            decode_stack,
            phash64,
            phash64_batch,
        )
        from .imagestage import shape_groups

        data = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        n = batch.num_rows
        out_bytes = [None] * n
        out_w = np.empty(n, np.int32)
        out_h = np.empty(n, np.int32)
        out_ph = np.empty(n, np.int64)
        for idx in shape_groups(ws, hs):
            w, h = int(ws[idx[0]]), int(hs[idx[0]])
            stack = decode_stack([data[i] for i in idx],
                                 [fmts[i] for i in idx], w, h)
            stack = self._apply_stack(stack)
            oh, ow = stack.shape[1:3]
            out_h[idx] = oh
            out_w[idx] = ow
            if oh % 8 == 0 and ow % 8 == 0:
                out_ph[idx] = phash64_batch(stack)
            else:
                out_ph[idx] = [phash64(g) for g in stack]
            for j, i in enumerate(idx):
                out_bytes[i] = (
                    self._encode_png(stack[j])
                    if fmts[i] == "png"
                    else self._encode_qraw(stack[j])
                )
        # replace only the pixel-derived columns; geo/caption/extra
        # columns ride through untouched
        repl = {
            "bytes": pa.array(out_bytes, pa.binary()),
            "w": pa.array(out_w, pa.int32()),
            "h": pa.array(out_h, pa.int32()),
            "phash": pa.array(out_ph, pa.int64()),
        }
        for name, arr in repl.items():
            batch = batch.set_column(
                batch.schema.get_field_index(name), name, arr
            )
        return batch
