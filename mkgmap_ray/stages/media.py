"""Audio / video payload stages — the multimodal columns beyond images.

Same design contract as the image layer (``sources/images.py``): the
payloads are opaque ``binary`` columns with typed metadata, decode /
feature-extract / frame-sample run as ``map_batches`` stages, and the
codecs are deterministic stand-ins (no audio/video libraries in this
container — a real deployment swaps ``decode_pcm16`` for an MP3/FLAC
codec and the QVID frame walker for an mp4 demuxer; the Ray-side
plumbing — schema, batch sizing, per-frame decode skipping — is the
deliverable).

Containers:
- ``pcm16``: ``b"PCM1" + n:u32be + int16le samples`` — linear PCM.
- ``qvid``: ``b"QVID" + n_frames:u32be + [frame_len:u32be + qraw bytes]*``
  — length-prefixed frames, so frame sampling SEEKS past unsampled
  frames without decoding them (the whole point of frame-sample at
  100 TB: decode cost ∝ sampled fraction, not video length).

The synthetic signals are closed-form in (row, sample/frame index), so
the per-window audio features and per-frame means are integer-exact and
SQL-mirrorable — the decode path stays real (bytes → codec → features).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import decode_qraw, encode_qraw

AUDIO_N_SAMPLES = 1024
AUDIO_WINDOW = 256
AUDIO_RATE = 8000

VIDEO_FRAME_W = 8
VIDEO_FRAME_H = 8


# --- audio -------------------------------------------------------------------


def make_audio(row: int, n_samples: int = AUDIO_N_SAMPLES) -> np.ndarray:
    """Closed-form int16 signal: s_i = ((row*31 + i*17) % 201) - 100."""
    i = np.arange(n_samples, dtype=np.int64)
    return (((row * 31 + i * 17) % 201) - 100).astype(np.int16)


def encode_pcm16(samples: np.ndarray) -> bytes:
    s = np.asarray(samples, "<i2")
    return b"PCM1" + len(s).to_bytes(4, "big") + s.tobytes()


def decode_pcm16(data: bytes) -> np.ndarray:
    assert data[:4] == b"PCM1"
    n = int.from_bytes(data[4:8], "big")
    return np.frombuffer(data[8 : 8 + 2 * n], "<i2").astype(np.int64)


def audio_dataset(n: int, n_samples: int = AUDIO_N_SAMPLES,
                  rows_per_block: int = 500):
    """Streaming audio table: (audio_id, bytes, sample_rate, n_samples,
    fmt) — binary payload column, metadata typed."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        rows = np.asarray(batch["id"].combine_chunks(), np.int64)
        return pa.table(
            {
                "audio_id": pa.array(rows, pa.int64()),
                "bytes": pa.array(
                    [encode_pcm16(make_audio(int(r), n_samples))
                     for r in rows],
                    pa.binary(),
                ),
                "sample_rate": pa.array(
                    np.full(len(rows), AUDIO_RATE, np.int32), pa.int32()
                ),
                "n_samples": pa.array(
                    np.full(len(rows), n_samples, np.int32), pa.int32()
                ),
                "fmt": pa.array(["pcm16"] * len(rows), pa.string()),
            }
        )

    n_blocks = max(1, n // rows_per_block)
    return rd.range(n, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )


class AudioFeatures:
    """Actor: decode PCM payloads and emit per-window integer features —
    energy (sum of squares), zero crossings (strict sign flips between
    consecutive samples INSIDE the window), peak |amplitude|. All int64,
    so the DuckDB closed-form oracle matches bit-for-bit."""

    def __init__(self, window: int = AUDIO_WINDOW):
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["audio_id"].combine_chunks(), np.int64)
        data = batch["bytes"].to_pylist()
        w = self.window
        out_id, out_win, out_en, out_zc, out_pk = [], [], [], [], []
        for aid, blob in zip(ids, data):
            s = decode_pcm16(blob)
            nw = len(s) // w
            sw = s[: nw * w].reshape(nw, w)
            energy = (sw * sw).sum(axis=1)
            flips = (sw[:, :-1] * sw[:, 1:]) < 0
            peak = np.abs(sw).max(axis=1)
            out_id.append(np.full(nw, aid, np.int64))
            out_win.append(np.arange(nw, dtype=np.int64))
            out_en.append(energy)
            out_zc.append(flips.sum(axis=1).astype(np.int64))
            out_pk.append(peak)
        return pa.table(
            {
                "audio_id": pa.array(np.concatenate(out_id), pa.int64()),
                "win": pa.array(np.concatenate(out_win), pa.int64()),
                "energy": pa.array(np.concatenate(out_en), pa.int64()),
                "n_zc": pa.array(np.concatenate(out_zc), pa.int64()),
                "peak": pa.array(np.concatenate(out_pk), pa.int64()),
            }
        )


def audio_features(ds, window: int = AUDIO_WINDOW):
    return ds.map_batches(
        AudioFeatures(window), batch_format="pyarrow", batch_size=None
    )


# --- video -------------------------------------------------------------------


def video_frame_color(row: int, frame: int) -> int:
    """Closed-form solid frame color: (row*7 + frame*13) % 256."""
    return (row * 7 + frame * 13) % 256


def make_video(row: int) -> tuple[bytes, int]:
    """QVID container for row: 4 + row%5 solid-color qraw frames."""
    n_frames = 4 + row % 5
    parts = [b"QVID", n_frames.to_bytes(4, "big")]
    for f in range(n_frames):
        c = video_frame_color(row, f)
        rgb = np.full((VIDEO_FRAME_H, VIDEO_FRAME_W, 3), c, np.uint8)
        enc = encode_qraw(rgb)
        parts.append(len(enc).to_bytes(4, "big"))
        parts.append(enc)
    return b"".join(parts), n_frames


def video_dataset(n: int, rows_per_block: int = 500):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        rows = np.asarray(batch["id"].combine_chunks(), np.int64)
        blobs, counts = [], []
        for r in rows:
            b, nf = make_video(int(r))
            blobs.append(b)
            counts.append(nf)
        return pa.table(
            {
                "video_id": pa.array(rows, pa.int64()),
                "bytes": pa.array(blobs, pa.binary()),
                "n_frames": pa.array(
                    np.asarray(counts, np.int32), pa.int32()
                ),
                "fmt": pa.array(["qvid"] * len(rows), pa.string()),
            }
        )

    n_blocks = max(1, n // rows_per_block)
    return rd.range(n, override_num_blocks=n_blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )


class FrameSample:
    """Actor: walk each QVID container, SEEK past unsampled frames using
    the length prefixes (no decode), decode every ``k``-th frame through
    the real qraw codec, and emit its integer pixel mean. Decode cost is
    proportional to the sampled fraction — the frame-sample contract."""

    def __init__(self, k: int = 2):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["video_id"].combine_chunks(), np.int64)
        data = batch["bytes"].to_pylist()
        out_id, out_f, out_mean = [], [], []
        for vid, blob in zip(ids, data):
            assert blob[:4] == b"QVID"
            n_frames = int.from_bytes(blob[4:8], "big")
            pos = 8
            for f in range(n_frames):
                ln = int.from_bytes(blob[pos : pos + 4], "big")
                pos += 4
                if f % self.k == 0:
                    rgb = decode_qraw(blob[pos : pos + ln])
                    out_id.append(vid)
                    out_f.append(f)
                    out_mean.append(
                        int(rgb.astype(np.int64).sum()) // rgb.size
                    )
                pos += ln
        return pa.table(
            {
                "video_id": pa.array(
                    np.asarray(out_id, np.int64), pa.int64()
                ),
                "frame": pa.array(np.asarray(out_f, np.int64), pa.int64()),
                "mean_val": pa.array(
                    np.asarray(out_mean, np.int64), pa.int64()
                ),
            }
        )


def frame_sample(ds, k: int = 2):
    # instance task (not actor pool): the sampler holds no state worth a
    # per-query actor spin-up — same trade as MinHashBands
    return ds.map_batches(
        FrameSample(k), batch_format="pyarrow", batch_size=None
    )
