"""Parity tests: interp ops vs torch F.grid_sample (border, align_corners)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vtaco_tpu.ops import interp


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_plane_matches_grid_sample(rng, mode):
    B, H, W, C, N = 2, 9, 13, 5, 200
    fea = rng.standard_normal((B, H, W, C)).astype(np.float32)
    # include coords slightly outside [0,1] to exercise border clamping
    uv = rng.uniform(-0.1, 1.1, size=(B, N, 2)).astype(np.float32)

    got = np.asarray(interp.interp_plane(fea, uv, mode=mode))

    # torch: NCHW features, grid in [-1, 1], shape (B, N, 1, 2)
    t_fea = torch.from_numpy(fea).permute(0, 3, 1, 2)
    t_grid = torch.from_numpy(2.0 * uv - 1.0)[:, :, None, :]
    want = F.grid_sample(
        t_fea, t_grid, padding_mode="border", align_corners=True, mode=mode
    ).squeeze(-1).permute(0, 2, 1).numpy()

    atol = 1e-5 if mode == "bilinear" else 0
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-5)


def test_grid_matches_grid_sample_trilinear(rng):
    B, D, H, W, C, N = 2, 6, 7, 8, 4, 200
    fea = rng.standard_normal((B, D, H, W, C)).astype(np.float32)
    uvw = rng.uniform(-0.1, 1.1, size=(B, N, 3)).astype(np.float32)

    got = np.asarray(interp.interp_grid(fea, uvw))

    t_fea = torch.from_numpy(fea).permute(0, 4, 1, 2, 3)  # NCDHW
    t_grid = torch.from_numpy(2.0 * uvw - 1.0)[:, :, None, None, :]
    want = (
        F.grid_sample(
            t_fea, t_grid, padding_mode="border", align_corners=True, mode="bilinear"
        )
        .squeeze(-1)
        .squeeze(-1)
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_exact_cell_centers(rng):
    # sampling exactly at grid nodes returns the node values
    B, H, W, C = 1, 4, 4, 3
    fea = rng.standard_normal((B, H, W, C)).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    uv = np.stack([xs.ravel() / (W - 1), ys.ravel() / (H - 1)], axis=-1)[None].astype(
        np.float32
    )
    got = np.asarray(interp.interp_plane(fea, uv))
    want = fea.reshape(1, H * W, C)
    np.testing.assert_allclose(got, want, atol=1e-6)
