"""Audio/video payload stages: codec roundtrips, feature math vs naive
Python, frame-sample seek behavior. Stage classes are exercised directly
on Arrow tables (no Ray session needed)."""

import numpy as np
import pyarrow as pa

from mkgmap_ray.sources.images import decode_qraw
from mkgmap_ray.stages.media import (
    AUDIO_WINDOW,
    AudioFeatures,
    FrameSample,
    decode_pcm16,
    encode_pcm16,
    make_audio,
    make_video,
    video_frame_color,
)


class TestPcmCodec:
    def test_roundtrip(self):
        s = make_audio(7)
        assert (decode_pcm16(encode_pcm16(s)) == s.astype(np.int64)).all()

    def test_negative_values_survive(self):
        s = np.array([-100, 0, 100, -1], np.int16)
        assert decode_pcm16(encode_pcm16(s)).tolist() == [-100, 0, 100, -1]


class TestAudioFeatures:
    def test_matches_naive(self):
        rows = [0, 3, 11]
        batch = pa.table(
            {
                "audio_id": pa.array(rows, pa.int64()),
                "bytes": pa.array(
                    [encode_pcm16(make_audio(r)) for r in rows], pa.binary()
                ),
            }
        )
        out = AudioFeatures()(batch).to_pandas()
        for r in rows:
            s = make_audio(r).astype(np.int64)
            for w in range(len(s) // AUDIO_WINDOW):
                seg = s[w * AUDIO_WINDOW : (w + 1) * AUDIO_WINDOW]
                row = out[(out.audio_id == r) & (out.win == w)].iloc[0]
                assert row.energy == int((seg * seg).sum())
                assert row.n_zc == int(
                    ((seg[:-1] * seg[1:]) < 0).sum()
                )
                assert row.peak == int(np.abs(seg).max())

    def test_zero_crossing_is_window_local(self):
        # craft: last sample of win0 = -1, first of win1 = +1 — the flip
        # between windows must NOT count
        s = np.ones(AUDIO_WINDOW * 2, np.int16)
        s[AUDIO_WINDOW - 1] = -1
        batch = pa.table(
            {
                "audio_id": pa.array([0], pa.int64()),
                "bytes": pa.array([encode_pcm16(s)], pa.binary()),
            }
        )
        out = AudioFeatures()(batch).to_pandas()
        # win0 has one flip into -1 (and none back inside win0)
        assert out[out.win == 0].n_zc.iloc[0] == 1
        assert out[out.win == 1].n_zc.iloc[0] == 0


class TestVideoFrames:
    def test_container_and_sampling(self):
        blob, nf = make_video(9)
        assert nf == 4 + 9 % 5
        batch = pa.table(
            {
                "video_id": pa.array([9], pa.int64()),
                "bytes": pa.array([blob], pa.binary()),
            }
        )
        out = FrameSample(k=2)(batch).to_pandas()
        assert out.frame.tolist() == [f for f in range(nf) if f % 2 == 0]
        for _, row in out.iterrows():
            c = video_frame_color(9, int(row.frame))
            assert row.mean_val == ((c >> 3) << 3) | 4  # qraw bin center

    def test_seek_skips_unsampled(self):
        # k larger than n_frames: only frame 0 decoded
        blob, nf = make_video(2)
        batch = pa.table(
            {
                "video_id": pa.array([2], pa.int64()),
                "bytes": pa.array([blob], pa.binary()),
            }
        )
        out = FrameSample(k=100)(batch).to_pandas()
        assert out.frame.tolist() == [0]

    def test_frame_payloads_decode_independently(self):
        blob, nf = make_video(5)
        pos = 8
        for f in range(nf):
            ln = int.from_bytes(blob[pos : pos + 4], "big")
            pos += 4
            rgb = decode_qraw(blob[pos : pos + ln])
            assert rgb.shape == (8, 8, 3)
            c = video_frame_color(5, f)
            assert (rgb == (((c >> 3) << 3) | 4)).all()
            pos += ln
        assert pos == len(blob)
