"""Multi-device decoding/training over the fake 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vtaco_tpu.models.conv_onet import ConvOccupancyNetwork
from vtaco_tpu.models.decoder import LocalDecoder
from vtaco_tpu.parallel.mesh import make_mesh


def _setup(rng, C=8, R=6):
    dec = LocalDecoder(c_dim=C, hidden_size=16, n_blocks=2)
    model = ConvOccupancyNetwork(decoder=dec)
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 4, 3)), jnp.float32)
    cp = {"grid": jnp.asarray(rng.standard_normal((1, R, R, R, C)), jnp.float32)}

    def initp(m):
        m.decode(p, cp)

    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), method=initp))()

    class S:
        params = v["params"]
        batch_stats = {}

    return model, cp, S()


def test_mesh_construction():
    mesh = make_mesh(data=8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_query_axis_sharded_decode(rng):
    from vtaco_tpu.generate.generator import Generator3D

    model, cp, state = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    mesh = make_mesh(data=8)
    nx = 16
    sharded = gen.eval_points_dense_sharded(state, nx, cp, mesh)
    single = gen.eval_points_dense(state, nx, cp, fast=True)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_batched_dp_decode(rng):
    from vtaco_tpu.generate.generator import Generator3D

    model, cp, state = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    mesh = make_mesh(data=8)
    B, R, C = 8, 6, 8
    cB = {"grid": jnp.asarray(rng.standard_normal((B, R, R, R, C)), jnp.float32)}
    out = gen.decode_dense_batched(state, 16, cB, device_mesh=mesh)
    assert out.shape == (8, 16**3)
    one = gen.eval_points_dense(state, 16, {"grid": cB["grid"][3:4]}, fast=True)
    np.testing.assert_allclose(out[3], one, atol=1e-5)
