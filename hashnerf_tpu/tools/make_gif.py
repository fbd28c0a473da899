"""Stitch render frames into a convergence gif/video, iteration-stamped.

Capability parity: /root/reference/scripts/make_gif.py — walks renderonly_*
directories, stamps each frame with its iteration number, writes a gif.
Usage: python -m hashnerf_tpu.tools.make_gif <logdir> [out.gif]
"""
from __future__ import annotations

import os
import re
import sys
from typing import List, Optional

import numpy as np


def collect_frames(logdir: str) -> List[str]:
    """Find per-checkpoint render dirs (renderonly_*_NNNNNN / testset_NNNNNN)
    and pick the first frame of each, ordered by iteration."""
    entries = []
    for d in sorted(os.listdir(logdir)):
        m = re.match(r"(?:renderonly_\w+|testset)_(\d+)$", d)
        if not m:
            continue
        frame_dir = os.path.join(logdir, d)
        pngs = sorted(f for f in os.listdir(frame_dir) if f.endswith(".png"))
        if pngs:
            entries.append((int(m.group(1)), os.path.join(frame_dir, pngs[0])))
    return [(it, p) for it, p in sorted(entries)]


def stamp(img: np.ndarray, text: str) -> np.ndarray:
    from PIL import Image, ImageDraw

    pil = Image.fromarray(img)
    draw = ImageDraw.Draw(pil)
    draw.text((8, 8), text, fill=(255, 64, 64))
    return np.asarray(pil)


def make_gif(logdir: str, out: Optional[str] = None, fps: int = 4) -> str:
    import imageio.v2 as imageio

    frames = []
    for it, path in collect_frames(logdir):
        img = imageio.imread(path)
        frames.append(stamp(img[..., :3], f"iter {it}"))
    if not frames:
        raise FileNotFoundError(f"no render frames under {logdir}")
    out = out or os.path.join(logdir, "convergence.gif")
    imageio.mimwrite(out, frames, fps=fps)
    return out


if __name__ == "__main__":
    print(make_gif(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
