"""Scatter pooling vs a naive numpy reference (torch_scatter semantics)."""

import numpy as np

from vtaco_tpu.ops import scatter


def _np_scatter_mean(src, index, S):
    B, N, C = src.shape
    out = np.zeros((B, S, C), dtype=src.dtype)
    cnt = np.zeros((B, S), dtype=np.int64)
    for b in range(B):
        for n in range(N):
            out[b, index[b, n]] += src[b, n]
            cnt[b, index[b, n]] += 1
    nz = cnt > 0
    out[nz] /= cnt[nz][:, None]
    return out


def test_scatter_mean(rng):
    B, N, C, S = 3, 50, 4, 16
    src = rng.standard_normal((B, N, C)).astype(np.float32)
    idx = rng.integers(0, S, size=(B, N)).astype(np.int32)
    got = np.asarray(scatter.scatter_mean(src, idx, S))
    want = _np_scatter_mean(src, idx, S)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_scatter_max(rng):
    B, N, C, S = 2, 40, 3, 10
    src = rng.standard_normal((B, N, C)).astype(np.float32)
    idx = rng.integers(0, S, size=(B, N)).astype(np.int32)
    got = np.asarray(scatter.scatter_max(src, idx, S))
    for b in range(B):
        for s in range(S):
            m = idx[b] == s
            if m.any():
                np.testing.assert_allclose(got[b, s], src[b, m].max(0), atol=1e-6)
            else:
                np.testing.assert_allclose(got[b, s], 0.0)


def test_gather_roundtrip(rng):
    B, N, C, S = 2, 30, 4, 8
    cells = rng.standard_normal((B, S, C)).astype(np.float32)
    idx = rng.integers(0, S, size=(B, N)).astype(np.int32)
    got = np.asarray(scatter.gather_cells(cells, idx))
    for b in range(B):
        np.testing.assert_allclose(got[b], cells[b, idx[b]])


def test_grad_flows():
    import jax
    import jax.numpy as jnp

    def loss(src):
        pooled = scatter.scatter_mean(src, jnp.zeros((1, 5), jnp.int32), 4)
        return jnp.sum(pooled**2)

    g = jax.grad(loss)(jnp.ones((1, 5, 2)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0
