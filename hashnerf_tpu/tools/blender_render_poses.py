"""Plot the blender spherical render path in 3D.

Capability parity: /root/reference/scripts/blender_render_poses.py (plot the
40-pose spherical demo path).
Usage: python -m hashnerf_tpu.tools.blender_render_poses [out.png]
"""
from __future__ import annotations

import sys

import numpy as np

from hashnerf_tpu.data.pose_paths import spherical_render_poses
from hashnerf_tpu.tools.pose_visualizer import CameraPoseVisualizer


def plot_render_path(out: str = "render_poses.png", n: int = 40) -> str:
    poses = spherical_render_poses(n)
    viz = CameraPoseVisualizer(xlim=(-5, 5), ylim=(-5, 5), zlim=(-5, 5))
    for i, p in enumerate(poses):
        viz.add_pose(p, color="tab:blue" if i else "tab:red")
    viz.save(out)
    return out


if __name__ == "__main__":
    print(plot_render_path(sys.argv[1] if len(sys.argv) > 1 else "render_poses.png"))
