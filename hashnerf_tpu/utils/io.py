"""Artifact saving: rendered figures, PSNR pickles, videos, experiment args.

Capability parity: reference run_nerf_helpers.py:434-457 (rgb|depth figures,
PSNR pickle), run_nerf.py:338-345 (args.txt/config.txt), :691-692 (mp4 video),
eval_test_omninerf gif (run_nerf.py:184-185).
"""
from __future__ import annotations

import os
import pickle
from typing import Optional, Sequence

import numpy as np

from hashnerf_tpu.utils.metrics import to8b


def save_render_figures(savedir: str, rgbs: np.ndarray, depths: np.ndarray) -> None:
    """Side-by-side rgb|depth PNG per pose (matplotlib, plasma cmap)."""
    os.makedirs(savedir, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for i in range(rgbs.shape[0]):
        fig = plt.figure(figsize=(25, 15))
        ax = fig.add_subplot(1, 2, 1)
        ax.imshow(to8b(rgbs[i]))
        ax.axis("off")
        ax = fig.add_subplot(1, 2, 2)
        ax.imshow(depths[i], cmap="plasma", vmin=0, vmax=1)
        ax.axis("off")
        fig.savefig(
            os.path.join(savedir, "{:03d}.png".format(i)),
            bbox_inches="tight",
            pad_inches=0,
        )
        plt.close(fig)


def save_psnr_pickle(savedir: str, psnrs: Sequence[float]) -> None:
    avg = sum(psnrs) / len(psnrs)
    with open(
        os.path.join(savedir, "test_psnrs_avg{:0.2f}.pkl".format(avg)), "wb"
    ) as fp:
        pickle.dump(list(psnrs), fp)


def save_video(path: str, frames: np.ndarray, fps: int = 30, quality: int = 8) -> None:
    """mp4 via imageio-ffmpeg; falls back to an animated gif when no ffmpeg
    plugin is available (keeps render-only artifacts usable everywhere)."""
    import imageio

    try:
        imageio.mimwrite(path, to8b(frames), fps=fps, quality=quality)
    except Exception:
        gif_path = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(gif_path, to8b(frames), fps=min(fps, 24))


def save_gif(path: str, frames: np.ndarray, fps: int = 10) -> None:
    import imageio

    imageio.mimwrite(path, to8b(frames), fps=fps)


def dump_args(savepath: str, args_dict: dict, config_path: Optional[str] = None) -> None:
    os.makedirs(savepath, exist_ok=True)
    with open(os.path.join(savepath, "args.txt"), "w") as f:
        for k in sorted(args_dict):
            f.write("{} = {}\n".format(k, args_dict[k]))
    if config_path is not None and os.path.exists(config_path):
        with open(os.path.join(savepath, "config.txt"), "w") as f:
            f.write(open(config_path, "r").read())


def save_loss_history(savepath: str, losses, psnrs, times) -> None:
    with open(os.path.join(savepath, "loss_vs_time.pkl"), "wb") as fp:
        pickle.dump({"losses": losses, "psnr": psnrs, "time": times}, fp)
