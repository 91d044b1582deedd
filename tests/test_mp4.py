"""Pure-Python MJPEG-in-MP4 muxer (`utils/mp4.py`) — the no-ffmpeg mp4
path behind `write_video` (reference writes mp4 at `evaluation/eval.py:209`,
`vis/render.py:114-115`)."""
import struct

import numpy as np
import pytest

from nope_nerf_tpu.utils.mp4 import (
    parse_boxes,
    read_mjpeg_mp4,
    write_mjpeg_mp4,
)
from nope_nerf_tpu.utils.video import write_video


def _frames(n=6, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # smooth gradients compress well and survive JPEG closely
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([x / w, y / h, (x + y) / (w + h)], -1)
    shifts = rng.uniform(0, 0.3, size=(n, 1, 1, 3)).astype(np.float32)
    return np.clip((base[None] * 0.7 + shifts) * 255, 0, 255).astype(np.uint8)


class TestMuxer:
    def test_box_structure(self, tmp_path):
        path = str(tmp_path / "v.mp4")
        frames = _frames()
        write_mjpeg_mp4(path, frames, fps=10)
        data = open(path, "rb").read()
        kinds = [k for k, _, _ in parse_boxes(data)]
        assert kinds == [b"ftyp", b"mdat", b"moov"]
        # box sizes must tile the file exactly
        _, _, end = list(parse_boxes(data))[-1]
        assert end == len(data)
        assert data[4:8] == b"ftyp" and b"isom" in data[:24]

    def test_round_trip(self, tmp_path):
        path = str(tmp_path / "v.mp4")
        frames = _frames(n=5)
        write_mjpeg_mp4(path, frames, fps=12, quality=95)
        decoded, fps = read_mjpeg_mp4(path)
        assert decoded.shape == frames.shape
        assert abs(fps - 12.0) < 0.5
        # JPEG at q95 on smooth gradients: close in value
        err = np.abs(decoded.astype(int) - frames.astype(int)).mean()
        assert err < 4.0, err

    def test_samples_are_jpeg(self, tmp_path):
        path = str(tmp_path / "v.mp4")
        write_mjpeg_mp4(path, _frames(n=3), fps=30)
        data = open(path, "rb").read()
        for kind, s, e in parse_boxes(data):
            if kind == b"mdat":
                # every sample starts with a JPEG SOI marker; the first
                # sample sits at the very start of mdat payload (stco
                # points there)
                assert data[s:s + 2] == b"\xff\xd8"
                assert data[e - 2:e] == b"\xff\xd9"

    def test_stsz_matches_mdat(self, tmp_path):
        path = str(tmp_path / "v.mp4")
        write_mjpeg_mp4(path, _frames(n=4), fps=30)
        data = open(path, "rb").read()
        mdat = next((s, e) for k, s, e in parse_boxes(data) if k == b"mdat")
        # walk the box tree (a raw byte-find could false-hit JPEG data)
        span = dict(
            (k, (s, e)) for k, s, e in parse_boxes(data))[b"moov"]
        for kind in (b"trak", b"mdia", b"minf", b"stbl"):
            span = dict((k, (s, e))
                        for k, s, e in parse_boxes(data, *span))[kind]
        stbl = dict((k, (s, e)) for k, s, e in parse_boxes(data, *span))
        # stsz sample sizes must sum to the mdat payload
        s = stbl[b"stsz"][0]
        n = struct.unpack(">I", data[s + 8:s + 12])[0]
        sizes = struct.unpack(f">{n}I", data[s + 12:s + 12 + 4 * n])
        assert sum(sizes) == mdat[1] - mdat[0]
        # and the single stco chunk offset points at the mdat payload
        s = stbl[b"stco"][0]
        off = struct.unpack(">I", data[s + 8:s + 12])[0]
        assert off == mdat[0]

    def test_input_validation(self, tmp_path):
        path = str(tmp_path / "v.mp4")
        with pytest.raises(ValueError):
            write_mjpeg_mp4(path, np.zeros((0, 4, 4, 3), np.uint8))
        with pytest.raises(ValueError):
            write_mjpeg_mp4(path, np.zeros((2, 4, 4, 3), np.float32))
        # grayscale is broadcast to rgb
        write_mjpeg_mp4(path, np.zeros((2, 16, 16, 1), np.uint8))
        decoded, _ = read_mjpeg_mp4(path)
        assert decoded.shape == (2, 16, 16, 3)


class TestWriteVideoIntegration:
    def test_mp4_written_without_ffmpeg(self, tmp_path):
        """write_video must produce a real .mp4 here (no ffmpeg in image)."""
        path = str(tmp_path / "out.mp4")
        out = write_video(path, _frames(n=3), fps=8)
        assert out == path
        data = open(path, "rb").read()
        kinds = [k for k, _, _ in parse_boxes(data)]
        assert b"moov" in kinds and b"mdat" in kinds

    def test_non_mp4_extension_still_falls_back(self, tmp_path):
        path = str(tmp_path / "out.webm")
        out = write_video(path, _frames(n=2), fps=8)
        assert out != path  # gif or frame dir
