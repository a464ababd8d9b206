"""Matplotlib debug visualization (voxels / point clouds).

Counterpart of src/utils/visualize.py:7-85. Headless-safe (Agg backend).
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def visualize_data(data, data_type, out_file):
    """Dispatch by data type ('voxels' | 'pointcloud'). visualize.py:7-22."""
    if data_type == "voxels":
        visualize_voxels(data, out_file=out_file)
    elif data_type == "pointcloud":
        visualize_pointcloud(data, out_file=out_file)
    elif data_type is None or data_type == "idx":
        pass
    else:
        raise ValueError(f'Invalid data_type "{data_type}"')


def visualize_voxels(voxels, out_file=None, show=False):
    """3D voxel plot. visualize.py:25-48."""
    plt = _plt()
    voxels = np.asarray(voxels)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    voxels = voxels.transpose(2, 0, 1)
    ax.voxels(voxels, edgecolor="k")
    ax.set_xlabel("Z")
    ax.set_ylabel("X")
    ax.set_zlabel("Y")
    ax.view_init(elev=30, azim=45)
    if out_file is not None:
        plt.savefig(out_file)
    if show:
        plt.show()
    plt.close(fig)


def visualize_pointcloud(points, normals=None, out_file=None, show=False):
    """3D scatter with optional normals. visualize.py:51-85."""
    plt = _plt()
    points = np.asarray(points)
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(points[:, 2], points[:, 0], points[:, 1], s=2)
    if normals is not None:
        normals = np.asarray(normals)
        ax.quiver(
            points[:, 2], points[:, 0], points[:, 1],
            normals[:, 2], normals[:, 0], normals[:, 1],
            length=0.1, color="k",
        )
    ax.set_xlabel("Z")
    ax.set_ylabel("X")
    ax.set_zlabel("Y")
    ax.set_xlim(-0.5, 0.5)
    ax.set_ylim(-0.5, 0.5)
    ax.set_zlim(-0.5, 0.5)
    ax.view_init(elev=30, azim=45)
    if out_file is not None:
        plt.savefig(out_file)
    if show:
        plt.show()
    plt.close(fig)
