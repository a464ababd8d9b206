"""Iso-band sparse transfer (generate/band.py): payload round trip,
native/numpy reconstruction parity, and bit-identical marching cubes vs
the full-volume transfer (the guarantee that lets generate_obj_mesh_wnf
default to the band path on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtaco_tpu.generate import band
from vtaco_tpu.generate.marching_cubes import marching_cubes


def _field(rng, nx, kind="sphere"):
    x = np.linspace(-1, 1, nx)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    if kind == "sphere":
        v = 0.6 - np.sqrt(X**2 + Y**2 + Z**2)
        v = v + 0.05 * rng.standard_normal((nx, nx, nx))
    elif kind == "blobs":
        v = (np.exp(-((X - 0.3) ** 2 + Y**2 + Z**2) * 8)
             + np.exp(-((X + 0.4) ** 2 + (Y - 0.2) ** 2 + Z**2) * 12) - 0.4)
    else:  # noise everywhere: worst case for the band (huge active set)
        v = rng.standard_normal((nx, nx, nx))
    return np.asarray(v, np.float32)


@pytest.mark.parametrize("kind", ["sphere", "blobs"])
@pytest.mark.parametrize("mode", ["midpoint", "mean", "const"])
def test_band_mc_bit_matches_full_grid(rng, kind, mode):
    nx = 25
    vol = _field(rng, nx, kind)
    cap = 65536
    cnt, lvl, packed, vals = jax.device_get(
        jax.jit(lambda lf: band.band_extract(lf, nx, cap, mode, 0.1))(
            vol.reshape(-1)
        )
    )
    assert int(cnt) <= cap
    g_np = band._band_reconstruct_numpy(nx, float(lvl), int(cnt), packed,
                                        vals)
    # native reconstruction (skipped only if the toolchain is absent)
    try:
        from vtaco_tpu import native

        g_cc = native.mc.band_reconstruct(nx, float(lvl), int(cnt), packed,
                                          vals)
        assert np.array_equal(g_cc, g_np)
    except Exception:
        pass
    v_full, f_full = marching_cubes(vol, level=float(lvl))
    v_band, f_band = marching_cubes(g_np, level=float(lvl))
    assert np.array_equal(v_full, v_band)
    assert np.array_equal(f_full, f_band)


def test_band_counts_match_mask(rng):
    nx = 17
    vol = _field(rng, nx, "sphere")
    cnt, lvl, packed, vals = jax.device_get(
        jax.jit(lambda lf: band.band_extract(lf, nx, 4096, "midpoint", 0.0))(
            vol.reshape(-1)
        )
    )
    n = nx**3
    occ = np.unpackbits(np.asarray(packed), bitorder="little")[:n]
    assert np.array_equal(occ.astype(bool), vol.reshape(-1) > float(lvl))
    # numpy recon recomputes the active count from the mask and validates
    band._band_reconstruct_numpy(nx, float(lvl), int(cnt), packed, vals)
    with pytest.raises(ValueError):
        band._band_reconstruct_numpy(nx, float(lvl), int(cnt) + 1, packed,
                                     vals)


def test_generator_band_path_matches_full(rng):
    """eval_points_dense_band's grid meshes identically to the full f32
    transfer, and the generator falls back cleanly on cap overflow."""
    from tests.test_fast_decode import _setup
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1,
                      band_transfer=True)
    nx = 16

    full = gen.eval_points_dense(state, nx, c_planes,
                                 transfer_dtype=jnp.float32)
    grid_full = full.reshape(nx, nx, nx)
    level_full = (float(grid_full.min()) + float(grid_full.max())) / 2

    grid_band, level = gen.eval_points_dense_band(state, nx, c_planes)
    assert level == pytest.approx(level_full, abs=1e-6)
    v1, f1 = marching_cubes(grid_full, level=level)
    v2, f2 = marching_cubes(grid_band, level=level)
    assert np.array_equal(v1, v2) and np.array_equal(f1, f2)
    assert gen.band_overflows == 0

    # overflow: a 1-slot cap cannot hold the band → full-transfer fallback
    grid_of, level_of = gen.eval_points_dense_band(state, nx, c_planes,
                                                   cap=1)
    assert gen.band_overflows == 1
    np.testing.assert_allclose(grid_of, grid_full, atol=1e-6)

    # gated path goes through the same band program
    gate_pts = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 8, 3)), jnp.float32)
    gate_feat = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    gate_valid = jnp.asarray(rng.random((5, 8)) > 0.3)
    full_g = gen.eval_points_dense(state, nx, c_planes, "contact", gate_pts,
                                   gate_feat, gate_valid,
                                   transfer_dtype=jnp.float32)
    grid_fg = full_g.reshape(nx, nx, nx)
    lvl_g = (float(grid_fg.min()) + float(grid_fg.max())) / 2
    band_g, level_g = gen.eval_points_dense_band(
        state, nx, c_planes, "contact", gate_pts, gate_feat, gate_valid
    )
    assert level_g == pytest.approx(lvl_g, abs=1e-6)
    v1, f1 = marching_cubes(grid_fg, level=level_g)
    v2, f2 = marching_cubes(band_g, level=level_g)
    assert np.array_equal(v1, v2) and np.array_equal(f1, f2)


@pytest.mark.parametrize("kind", ["sphere", "blobs"])
def test_band_marching_cubes_fused(rng, kind):
    """band_marching_cubes (the fused native scanner — no grid
    reconstruction) emits the identical mesh to reconstruct+scan."""
    from vtaco_tpu.generate.band import band_marching_cubes

    nx = 33
    vol = _field(rng, nx, kind)
    cap = 65536
    cnt, lvl, packed, vals = jax.device_get(
        jax.jit(lambda lf: band.band_extract(lf, nx, cap, "midpoint", 0.0))(
            vol.reshape(-1)
        )
    )
    grid = band._band_reconstruct_numpy(nx, float(lvl), int(cnt), packed,
                                        vals)
    for grad in ("ascent", "descent"):
        v1, f1 = marching_cubes(grid, level=float(lvl), gradient=grad)
        v2, f2 = band_marching_cubes(nx, float(lvl), int(cnt), packed,
                                     vals, gradient=grad)
        assert np.array_equal(v1, v2)
        assert np.array_equal(f1, f2)


def test_generator_band_mesh_variant(rng):
    """eval_points_dense_band(mesh=True) returns the same mesh as the
    (grid, level) variant fed to marching cubes."""
    from tests.test_fast_decode import _setup
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1,
                      band_transfer=True)
    nx = 16
    grid, level = gen.eval_points_dense_band(state, nx, c_planes)
    v1, f1 = marching_cubes(grid, level=level, gradient="ascent")
    v2, f2, level2 = gen.eval_points_dense_band(state, nx, c_planes,
                                                mesh=True)
    assert level2 == pytest.approx(level, abs=1e-6)
    assert np.array_equal(v1, v2) and np.array_equal(f1, f2)


def test_batched_band_matches_per_object(rng):
    """decode_dense_batched_band: per-object band grids mesh identically
    to the full f32 batched transfer; overflow falls back per object."""
    from tests.test_fast_decode import _setup
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    B, nx = 3, 16
    cB = jax.tree.map(
        lambda x: jnp.concatenate([x * (1.0 + 0.1 * b) for b in range(B)],
                                  axis=0),
        c_planes,
    )
    full = gen.decode_dense_batched(state, nx, cB,
                                    transfer_dtype=jnp.float32)
    grids, levels = gen.decode_dense_batched_band(state, nx, cB)
    assert len(grids) == B and gen.band_overflows == 0
    for b in range(B):
        gf = full[b].reshape(nx, nx, nx)
        want = (float(gf.min()) + float(gf.max())) / 2
        assert levels[b] == pytest.approx(want, abs=1e-5)
        v1, f1 = marching_cubes(gf, level=levels[b])
        v2, f2 = marching_cubes(grids[b], level=levels[b])
        assert np.array_equal(v1, v2) and np.array_equal(f1, f2)

    # overflow: cap=1 forces the per-object full-volume fallback
    grids_of, _ = gen.decode_dense_batched_band(state, nx, cB, cap=1)
    assert gen.band_overflows == B
    for b in range(B):
        np.testing.assert_allclose(
            grids_of[b], full[b].reshape(nx, nx, nx), atol=1e-6
        )


def test_band_mc_level_modes(rng):
    """'mean' and fixed-logit mc_level settings resolve in-program."""
    from tests.test_fast_decode import _setup
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    nx = 16
    for mc_level, expect in [("mean", "mean"), (0.25, 0.25)]:
        gen = Generator3D(model, resolution0=4, padding=0.1,
                          band_transfer=True, mc_level=mc_level)
        full = gen.eval_points_dense(state, nx, c_planes,
                                     transfer_dtype=jnp.float32)
        want = float(np.mean(full)) if expect == "mean" else expect
        grid, level = gen.eval_points_dense_band(state, nx, c_planes)
        assert level == pytest.approx(want, abs=1e-6)
        v1, f1 = marching_cubes(full.reshape(nx, nx, nx), level=level)
        v2, f2 = marching_cubes(grid, level=level)
        assert np.array_equal(v1, v2) and np.array_equal(f1, f2)
