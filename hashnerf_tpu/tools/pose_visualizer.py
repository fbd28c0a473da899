"""3D camera-frustum visualizer for transforms.json pose sets.

Capability parity: /root/reference/camera_pose_visualizer.py:10-54
(CameraPoseVisualizer: matplotlib 3D pyramids per camera).
Usage: python -m hashnerf_tpu.tools.pose_visualizer <transforms.json> [out.png]
"""
from __future__ import annotations

import json
import sys
from typing import Optional

import numpy as np


class CameraPoseVisualizer:
    def __init__(self, xlim=(-5, 5), ylim=(-5, 5), zlim=(-5, 5)):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self.plt = plt
        self.fig = plt.figure(figsize=(8, 8))
        self.ax = self.fig.add_subplot(projection="3d")
        self.ax.set_xlim(xlim)
        self.ax.set_ylim(ylim)
        self.ax.set_zlim(zlim)
        self.ax.set_xlabel("x")
        self.ax.set_ylabel("y")
        self.ax.set_zlabel("z")

    def add_pose(self, c2w: np.ndarray, color="tab:blue", focal_scale=0.3, aspect=0.25):
        """Draw one camera as a frustum pyramid (apex at camera center)."""
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        c2w = np.asarray(c2w)
        w = aspect
        corners_cam = np.array(
            [
                [0, 0, 0, 1],
                [w, w, -focal_scale, 1],
                [w, -w, -focal_scale, 1],
                [-w, -w, -focal_scale, 1],
                [-w, w, -focal_scale, 1],
            ]
        ).T
        m = np.eye(4)
        m[:3, :4] = c2w[:3, :4]
        pts = (m @ corners_cam).T[:, :3]
        faces = [
            [pts[0], pts[1], pts[2]],
            [pts[0], pts[2], pts[3]],
            [pts[0], pts[3], pts[4]],
            [pts[0], pts[4], pts[1]],
            [pts[1], pts[2], pts[3], pts[4]],
        ]
        self.ax.add_collection3d(
            Poly3DCollection(faces, facecolors=color, linewidths=0.3, edgecolors=color, alpha=0.25)
        )

    def save(self, path: str):
        self.fig.savefig(path, bbox_inches="tight", dpi=120)
        self.plt.close(self.fig)


def visualize_transforms(transforms_path: str, out: Optional[str] = None) -> str:
    with open(transforms_path) as f:
        meta = json.load(f)
    viz = CameraPoseVisualizer()
    for frame in meta["frames"]:
        viz.add_pose(np.array(frame["transform_matrix"]))
    out = out or transforms_path.replace(".json", "_poses.png")
    viz.save(out)
    return out


if __name__ == "__main__":
    print(visualize_transforms(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None))
