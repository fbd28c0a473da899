"""Re-render every checkpoint of an experiment (convergence visualization).

Capability parity: /root/reference/scripts/run_all_checkpoints.sh — loops all
checkpoints of an experiment and runs render-only for each; the resulting
renderonly_* dirs feed tools/make_gif.py.

Usage: python -m hashnerf_tpu.tools.run_all_checkpoints --config <cfg> [args]
"""
from __future__ import annotations

import os
import sys


def main(argv=None):
    sys.path.insert(0, os.getcwd())
    from hashnerf_tpu.train.config import parse_args, create_expname

    args = parse_args(argv)
    expname = create_expname(args)
    savedir = os.path.join(args.basedir, expname)
    ckpts = sorted(f for f in os.listdir(savedir) if f.endswith(".ckpt"))
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints under {savedir}")

    import run_nerf

    base = list(argv) if argv is not None else sys.argv[1:]
    for ck in ckpts:
        print(f"=== rendering {ck} ===")
        run_nerf.main(base + ["--render_only", "--ft_path", os.path.join(savedir, ck)])


if __name__ == "__main__":
    main()
