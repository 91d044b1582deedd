"""Video writing with graceful fallback.

The reference writes mp4 via imageio-ffmpeg (`evaluation/eval.py:209`,
`vis/render.py:114-115`). Preference order here: imageio's ffmpeg backend
(best codec, if the host has it) -> our own pure-Python MJPEG-in-MP4 muxer
(`utils/mp4.py`, always available) -> animated GIF + per-frame pngs.
"""
from __future__ import annotations

import os

import numpy as np


def write_video(path, frames, fps=30, quality=9):
    """frames: (N, H, W, 3) uint8. Writes mp4 if possible, else gif + pngs.

    Returns the path actually written.
    """
    import imageio

    frames = np.asarray(frames)
    try:
        imageio.mimwrite(path, frames, fps=fps, quality=quality)
        return path
    except Exception:
        pass
    if os.path.splitext(path)[1].lower() in (".mp4", ".m4v", ".mov"):
        try:
            from .mp4 import write_mjpeg_mp4

            # imageio quality is 0-10; JPEG quality is 1-95
            return write_mjpeg_mp4(
                path, frames, fps=fps,
                quality=int(np.clip(quality * 9.5, 50, 95)))
        except Exception as exc:  # pragma: no cover - defensive
            print(f"mjpeg-mp4 muxer failed ({exc}); falling back to gif")
    gif = os.path.splitext(path)[0] + ".gif"
    try:
        imageio.mimwrite(gif, frames, duration=1000.0 / fps, loop=0)
    except Exception:
        gif = None
    frame_dir = os.path.splitext(path)[0] + "_frames"
    os.makedirs(frame_dir, exist_ok=True)
    for i, f in enumerate(frames):
        imageio.imwrite(os.path.join(frame_dir, f"{i:04d}.png"), f)
    out = gif or frame_dir
    print(f"no mp4 backend available; wrote {out}")
    return out
