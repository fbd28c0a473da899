"""Plot PSNR/loss curves from loss_vs_time.pkl.

Capability parity: /root/reference/scripts/plot_losses.py (PSNR curves from
the loss/psnr/time pickles the trainer writes).
Usage: python -m hashnerf_tpu.tools.plot_losses <logdir> [out.png]
"""
from __future__ import annotations

import os
import pickle
import sys
from typing import Optional


def plot_losses(logdir: str, out: Optional[str] = None) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(os.path.join(logdir, "loss_vs_time.pkl"), "rb") as f:
        hist = pickle.load(f)

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    axes[0].plot(hist["losses"])
    axes[0].set_title("loss")
    axes[0].set_yscale("log")
    axes[1].plot(hist["psnr"])
    axes[1].set_title("PSNR (dB)")
    axes[2].plot(hist["time"], hist["psnr"])
    axes[2].set_title("PSNR vs wall-time (s)")
    for ax in axes:
        ax.grid(True, alpha=0.3)
    out = out or os.path.join(logdir, "losses.png")
    fig.savefig(out, bbox_inches="tight", dpi=120)
    plt.close(fig)
    return out


if __name__ == "__main__":
    print(plot_losses(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
