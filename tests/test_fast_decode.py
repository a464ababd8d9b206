"""Fast channels-first decode + Pallas fused trunk parity."""

import jax
import jax.numpy as jnp
import numpy as np

from vtaco_tpu.models.conv_onet import ConvOccupancyNetwork
from vtaco_tpu.models.decoder import LocalDecoder
from vtaco_tpu.ops import fast_trunk as FT


def _setup(rng, C=8, R=6, n_blocks=3):
    dec = LocalDecoder(c_dim=C, hidden_size=16, n_blocks=n_blocks)
    model = ConvOccupancyNetwork(decoder=dec)
    c_planes = {
        "grid": jnp.asarray(rng.standard_normal((1, R, R, R, C)), jnp.float32),
        "xz": jnp.asarray(rng.standard_normal((1, R, R, C)), jnp.float32),
    }
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 4, 3)), jnp.float32)

    def initp(m):
        m.decode(p, c_planes)
        m.decode_img(p, c_planes, jnp.zeros((1, 4, C)))

    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), method=initp))()

    class S:
        params = v["params"]
        batch_stats = v.get("batch_stats", {})

    return model, c_planes, S(), v


def test_fast_dense_matches_module_paths(rng):
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    nx = 16

    slow = gen.eval_points_dense(state, nx, c_planes, fast=False,
                                 transfer_dtype=jnp.float32)
    fast = gen.eval_points_dense(state, nx, c_planes, fast=True,
                                 transfer_dtype=jnp.float32)
    np.testing.assert_allclose(fast, slow, atol=1e-5)

    gate_pts = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 8, 3)), jnp.float32)
    gate_feat = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    gate_valid = jnp.asarray(rng.random((5, 8)) > 0.3)
    slow = gen.eval_points_dense(state, nx, c_planes, "contact", gate_pts,
                                 gate_feat, gate_valid, fast=False,
                                 transfer_dtype=jnp.float32)
    fast = gen.eval_points_dense(state, nx, c_planes, "contact", gate_pts,
                                 gate_feat, gate_valid, fast=True,
                                 transfer_dtype=jnp.float32)
    np.testing.assert_allclose(fast, slow, atol=1e-5)

    # odd nx (the MISE coarse grid is (reso+1)³): both dense paths must
    # accept any grid size, not just multiples of the slab factor
    slow9 = gen.eval_points_dense(state, 9, c_planes, fast=False,
                                  transfer_dtype=jnp.float32)
    fast9 = gen.eval_points_dense(state, 9, c_planes, fast=True,
                                  transfer_dtype=jnp.float32)
    np.testing.assert_allclose(fast9, slow9, atol=1e-5)


def test_dense_decode_int8_transfer(rng):
    """transfer_dtype=int8 returns scale-dequantized logits within one
    quantization step of the exact f32 decode (quarter-payload transfer
    mode for the tunnel-bound serving path)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    exact = gen.eval_points_dense(state, 16, c_planes,
                                  transfer_dtype=jnp.float32)
    q = gen.eval_points_dense(state, 16, c_planes, transfer_dtype=jnp.int8)
    step = np.abs(exact).max() / 127.0
    np.testing.assert_allclose(q, exact, atol=step * 1.01)


def test_eval_points_single_dispatch_matches_chunked(rng):
    """The scattered decode's fused lax.map path (one dispatch for all
    chunks) must match the reference-style per-chunk loop, including the
    ragged final chunk and feature gating."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    gen.points_batch_size = 64
    pts = rng.uniform(-0.5, 0.5, (150, 3)).astype(np.float32)  # 3 chunks, ragged

    fused = gen.eval_points(state, pts, c_planes,
                            transfer_dtype=jnp.float32)
    # default transfer is bf16 (project convention for big device→host
    # results) — same values to bf16 resolution
    fused_bf16 = gen.eval_points(state, pts, c_planes)
    np.testing.assert_allclose(fused_bf16, fused, atol=0.05, rtol=0.02)
    # per-chunk fallback (what n <= bs or crop mode uses)
    per_chunk = np.concatenate([
        np.asarray(gen._decode_chunk(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(pts[i:i + 64]), c_planes, jnp.zeros((1, 3)),
            jnp.zeros((1, 1)), jnp.zeros((1,), bool), "none",
        )) for i in range(0, 150, 64)
    ])
    np.testing.assert_allclose(fused, per_chunk, atol=1e-5)

    gate_pts = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 8, 3)), jnp.float32)
    gate_feat = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    gate_valid = jnp.asarray(rng.random((5, 8)) > 0.3)
    fused_g = gen.eval_points(state, pts, c_planes, "contact", gate_pts,
                              gate_feat, gate_valid,
                              transfer_dtype=jnp.float32)
    per_chunk_g = np.concatenate([
        np.asarray(gen._decode_chunk(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(pts[i:i + 64]), c_planes, gate_pts, gate_feat,
            gate_valid, "contact",
        )) for i in range(0, 150, 64)
    ])
    np.testing.assert_allclose(fused_g, per_chunk_g, atol=1e-5)


def test_pallas_trunk_matches(rng):
    from vtaco_tpu.ops.pallas.decode import fused_trunk_cn, pack_trunk_params

    _, _, state, v = _setup(rng)
    N, C = 512, 8
    tp = FT.extract_trunk_params(v["params"]["decoder"], 3, with_img=True)
    p_cn = jnp.asarray(rng.uniform(-0.5, 0.5, (3, N)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)
    cimg = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)

    want = FT.trunk_cn(tp, p_cn, feats, cimg)
    packed = pack_trunk_params(tp, with_img=True)
    got = fused_trunk_cn(packed, p_cn, feats, cimg, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    tp2 = FT.extract_trunk_params(v["params"]["decoder"], 3, with_img=False)
    want2 = FT.trunk_cn(tp2, p_cn, feats)
    got2 = fused_trunk_cn(pack_trunk_params(tp2, with_img=False), p_cn, feats,
                          tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=1e-5)


def test_pallas_trunk_odd_n(rng):
    """N not a multiple of the tile (e.g. the MISE coarse grid's
    (reso+1)³) must zero-pad up to the tile, not collapse the tile to 1
    lane — and bf16 store_dtype must round only the streamed operands."""
    from vtaco_tpu.ops.pallas.decode import fused_trunk_cn, pack_trunk_params

    _, _, state, v = _setup(rng)
    N, C = 9 ** 3, 8  # odd, 729 = 5*128 + 89
    tp = FT.extract_trunk_params(v["params"]["decoder"], 3, with_img=False)
    p_cn = jnp.asarray(rng.uniform(-0.5, 0.5, (3, N)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)
    packed = pack_trunk_params(tp, with_img=False)

    want = FT.trunk_cn(tp, p_cn, feats)
    got = fused_trunk_cn(packed, p_cn, feats, tile=128, interpret=True)
    assert got.shape == (N,)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # odd N smaller than the tile
    got_small = fused_trunk_cn(packed, p_cn[:, :37], feats[:, :37],
                               tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_small), np.asarray(want)[:37],
                               atol=1e-5)

    got_bf16 = fused_trunk_cn(packed, p_cn, feats, tile=128,
                              store_dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(np.asarray(got_bf16), np.asarray(want),
                               atol=0.05, rtol=0.05)


def test_pallas_gated_trunk_matches(rng):
    """The fused contact-gated kernel must equal gate_contact_cn feeding
    the plain fused trunk (and the XLA trunk), including invalid contact
    rows, untouched points, the last-finger-wins overwrite, and odd N."""
    from vtaco_tpu.ops.pallas.decode import (
        fused_trunk_gated_cn,
        pack_trunk_params,
    )

    _, _, state, v = _setup(rng)
    N, C, K = 593, 8, 16  # odd N: pad-to-tile must hold
    tp = FT.extract_trunk_params(v["params"]["decoder"], 3, with_img=True)
    p_cn = jnp.asarray(rng.uniform(-0.5, 0.5, (3, N)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((C, N)), jnp.float32)
    # contact shells overlapping several fingers so overwrite order matters
    gate_pts = jnp.asarray(rng.uniform(-0.4, 0.4, (5, K, 3)), jnp.float32)
    gate_feat = jnp.asarray(rng.standard_normal((5, C)), jnp.float32)
    gate_valid = jnp.asarray(rng.random((5, K)) > 0.3)
    radius = 0.25  # wide: guarantee hits and multi-finger overlaps

    c_img = FT.gate_contact_cn(p_cn, gate_pts, gate_feat, gate_valid,
                               radius=radius)
    want = FT.trunk_cn(tp, p_cn, feats, c_img)
    packed = pack_trunk_params(tp, with_img=True)
    got = fused_trunk_gated_cn(packed, p_cn, feats, gate_pts, gate_feat,
                               gate_valid, radius=radius, tile=128,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # all-invalid gating == ungated with zero c_img
    got_none = fused_trunk_gated_cn(
        packed, p_cn, feats, gate_pts, gate_feat,
        jnp.zeros((5, K), bool), radius=radius, tile=128, interpret=True
    )
    want_none = FT.trunk_cn(tp, p_cn, feats, jnp.zeros_like(c_img))
    np.testing.assert_allclose(np.asarray(got_none), np.asarray(want_none),
                               atol=1e-5)

    # clustered contacts + tight radius: most tiles' conservative activity
    # mask is empty, so the skip path (pl.when) must still match exactly,
    # including points right at a tile boundary
    gate_tight = jnp.asarray(
        0.31 + 0.02 * rng.standard_normal((5, K, 3)), jnp.float32
    )
    c_img_t = FT.gate_contact_cn(p_cn, gate_tight, gate_feat, gate_valid,
                                 radius=0.03)
    assert float(jnp.abs(c_img_t).sum()) > 0  # some points do gate
    want_t = FT.trunk_cn(tp, p_cn, feats, c_img_t)
    got_t = fused_trunk_gated_cn(packed, p_cn, feats, gate_tight,
                                 gate_feat, gate_valid, radius=0.03,
                                 tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               atol=1e-5)

    # bf16 streaming mode rounds only the streamed operands (coords and
    # feats); gating then sees the rounded coords, so the reference for
    # exact comparison is the XLA path on identically-rounded inputs
    # (boundary points can legitimately flip their hit mask otherwise)
    p_r = p_cn.astype(jnp.bfloat16).astype(jnp.float32)
    feats_r = feats.astype(jnp.bfloat16).astype(jnp.float32)
    c_img_r = FT.gate_contact_cn(p_r, gate_pts, gate_feat, gate_valid,
                                 radius=radius)
    want_r = FT.trunk_cn(tp, p_r, feats_r, c_img_r)
    got_bf16 = fused_trunk_gated_cn(packed, p_cn, feats, gate_pts,
                                    gate_feat, gate_valid, radius=radius,
                                    tile=128, store_dtype=jnp.bfloat16,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got_bf16), np.asarray(want_r),
                               atol=1e-4)


def test_pallas_trunk_vmapped_matches(rng):
    """vmap-of-Pallas — the batched serving trunk decode_dense_batched
    defaults to on TPU — must match the vmapped XLA trunk per object.
    Interpret mode here; the real-chip A/B (136.9 vs 129.5 M pts/s at
    B=8×128³, exact f32 vs bf16) is recorded in docs/DESIGN.md."""
    from vtaco_tpu.ops.pallas.decode import fused_trunk_cn, pack_trunk_params

    _, _, state, v = _setup(rng)
    B, N, C = 3, 256, 8
    tp = FT.extract_trunk_params(v["params"]["decoder"], 3, with_img=False)
    p_cn = jnp.asarray(rng.uniform(-0.5, 0.5, (3, N)), jnp.float32)
    featsB = jnp.asarray(rng.standard_normal((B, C, N)), jnp.float32)
    packed = pack_trunk_params(tp, with_img=False)
    got = jax.vmap(lambda f: fused_trunk_cn(packed, p_cn, f, tile=128,
                                            interpret=True))(featsB)
    want = jax.vmap(lambda f: FT.trunk_cn(tp, p_cn, f))(featsB)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # odd N under vmap — the batched-MISE coarse grid is (reso+1)³, so the
    # pad-to-tile path must also hold inside a vmapped kernel
    No = 201
    got_o = jax.vmap(lambda f: fused_trunk_cn(packed, p_cn[:, :No], f,
                                              tile=128, interpret=True))(
        featsB[:, :, :No]
    )
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want)[:, :No],
                               atol=1e-5)


def test_gating_cn_matches_reference_semantics(rng):
    """Matmul-based gating must equal the broadcast-difference gating."""
    from vtaco_tpu.generate.generator import Generator3D

    model, _, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    N, C = 200, 8
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 3)), jnp.float32)
    p_cn = pts.T

    tips = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 3)), jnp.float32)
    feat = jnp.asarray(rng.standard_normal((5, C)), jnp.float32)
    valid = jnp.asarray([True, False, True, True, False])
    ref = gen._gate_chunk(pts, "tips", tips, feat, valid)
    fast = FT.gate_tips_cn(p_cn, tips, feat, valid).T
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)

    cpts = jnp.asarray(rng.uniform(-0.4, 0.4, (5, 16, 3)), jnp.float32)
    cvalid = jnp.asarray(rng.random((5, 16)) > 0.4)
    ref = gen._gate_chunk(pts, "contact", cpts, feat, cvalid)
    fast = FT.gate_contact_cn(p_cn, cpts, feat, cvalid).T
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-5)


def test_fast_dense_leaky_decoder(rng):
    """leaky=True decoders must decode identically through the fast trunk
    (it previously hardcoded ReLU)."""
    from vtaco_tpu.generate.generator import Generator3D

    C, R = 8, 6
    dec = LocalDecoder(c_dim=C, hidden_size=16, n_blocks=3, leaky=True)
    model = ConvOccupancyNetwork(decoder=dec)
    c_planes = {
        "grid": jnp.asarray(rng.standard_normal((1, R, R, R, C)), jnp.float32)
    }
    p = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 4, 3)), jnp.float32)
    v = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), p, c_planes, method=model.decode
    ))()

    class S:
        params = v["params"]
        batch_stats = {}

    gen = Generator3D(model, resolution0=4, padding=0.1)
    slow = gen.eval_points_dense(S(), 16, c_planes, fast=False,
                                 transfer_dtype=jnp.float32)
    fast = gen.eval_points_dense(S(), 16, c_planes, fast=True,
                                 transfer_dtype=jnp.float32)
    np.testing.assert_allclose(fast, slow, atol=1e-5)
    # batched path honors leaky too
    out = gen.decode_dense_batched(S(), 16, c_planes)
    np.testing.assert_allclose(
        out[0], slow.astype(jnp.bfloat16).astype(np.float32), atol=1e-2
    )


def test_scattered_features_cn_match_sample_features(rng):
    """Channels-first gather interpolation (the scattered fast path's
    feature stage) must equal the decoder's sample_features (interp_grid +
    interp_plane on normalized coords) for grid + all three planes."""
    from vtaco_tpu.ops.dense_decode import scattered_feature_volume_cn

    C, R = 8, 6
    dec = LocalDecoder(c_dim=C, hidden_size=16, n_blocks=2, padding=0.1)
    c_planes = {
        "grid": jnp.asarray(rng.standard_normal((1, R, R, R, C)), jnp.float32),
        "xz": jnp.asarray(rng.standard_normal((1, R, R, C)), jnp.float32),
        "xy": jnp.asarray(rng.standard_normal((1, R, R, C)), jnp.float32),
        "yz": jnp.asarray(rng.standard_normal((1, R, R, C)), jnp.float32),
    }
    # include outliers beyond the box to exercise the border remap
    pts = jnp.asarray(rng.uniform(-0.7, 0.7, (1, 37, 3)), jnp.float32)
    ref = dec.apply({}, pts, c_planes, method=dec.sample_features)[0]
    got = scattered_feature_volume_cn(c_planes, pts[0].T, 0.1).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_eval_points_fast_buckets_and_gating(rng):
    """eval_points_fast must match the legacy chunked path for arbitrary N
    (bucketed padding) and for every gating mode."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    gen.points_batch_size = 64

    assert Generator3D._scatter_bucket(1) == 2048
    assert Generator3D._scatter_bucket(2048) == 2048
    assert Generator3D._scatter_bucket(2049) == 4096
    assert Generator3D._scatter_bucket(5000) == 6144       # 1.5 * 4096
    assert Generator3D._scatter_bucket(2**21) == 2**21

    pts = rng.uniform(-0.55, 0.55, (301, 3)).astype(np.float32)
    legacy = gen.eval_points(state, pts, c_planes, fast=False,
                             transfer_dtype=jnp.float32)
    fast = gen.eval_points_fast(state, pts, c_planes,
                                transfer_dtype=jnp.float32)
    np.testing.assert_allclose(fast, legacy, atol=1e-5)

    # int8 transfer mode: scale-dequantized within one quantization step
    q = gen.eval_points_fast(state, pts, c_planes, transfer_dtype=jnp.int8)
    step = np.abs(legacy).max() / 127.0
    np.testing.assert_allclose(q, legacy, atol=step * 1.01)

    gate_pts = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 8, 3)), jnp.float32)
    gate_feat = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    gate_valid = jnp.asarray(rng.random((5, 8)) > 0.3)
    for gating, gp in (("contact", gate_pts), ("tips", gate_pts[:, 0])):
        legacy = gen.eval_points(state, pts, c_planes, gating, gp,
                                 gate_feat,
                                 gate_valid if gating == "contact"
                                 else gate_valid[:, 0],
                                 transfer_dtype=jnp.float32, fast=False)
        fast = gen.eval_points_fast(state, pts, c_planes, gating, gp,
                                    gate_feat,
                                    gate_valid if gating == "contact"
                                    else gate_valid[:, 0],
                                    transfer_dtype=jnp.float32)
        np.testing.assert_allclose(fast, legacy, atol=1e-5,
                                   err_msg=f"gating={gating}")


def test_eval_points_fast_lattice_exact(rng):
    """Integer-lattice upload mode (in-program box·(p/R − 0.5) coords) must
    match the host computing the same f32 expression to float-roundoff
    (XLA FMA-contracts the affine map; observed ≤3e-6 on logits) — the
    MISE refinement contract (generate/mise.py multires_decode)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    reso = 32
    box = 1 + gen.padding
    pts_int = rng.integers(0, reso + 1, (513, 3))
    coords = box * (pts_int.astype(np.float32) / reso - 0.5)
    # detect_lattice=False pins the f32-coord reference path (these coords
    # ARE a lattice, so the default would auto-take the compact upload)
    host = gen.eval_points_fast(state, coords, c_planes,
                                transfer_dtype=jnp.float32,
                                detect_lattice=False)
    lat = gen.eval_points_fast(state, pts_int, c_planes,
                               transfer_dtype=jnp.float32,
                               lattice_reso=reso)
    np.testing.assert_allclose(lat, host, atol=1e-5)


def test_eval_points_fast_lattice_autodetect(rng):
    """f32 query sets that ARE a lattice (dense grids, MISE refinement)
    must be auto-detected and take the compact uint8/int16 upload with
    results matching the exact f32-coord path to float roundoff; anything
    not on a lattice must keep the exact path untouched."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    box = 1 + gen.padding

    # estimator: random points are not a lattice; lattice points are
    assert gen._estimate_lattice_reso(
        rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32), box) is None
    for reso in (31, 127, 256):
        ii = rng.integers(0, reso + 1, (500, 3))
        coords = (box * (ii.astype(np.float64) / reso - 0.5)).astype(
            np.float32)
        est = gen._estimate_lattice_reso(coords, box)
        assert est is not None and est % 1 == 0 and reso % est == 0, (
            reso, est)

    reso = 127
    ii = rng.integers(0, reso + 1, (513, 3))
    coords = (box * (ii.astype(np.float64) / reso - 0.5)).astype(np.float32)
    exact = gen.eval_points_fast(state, coords, c_planes,
                                 transfer_dtype=jnp.float32,
                                 detect_lattice=False)
    auto = gen.eval_points_fast(state, coords, c_planes,
                                transfer_dtype=jnp.float32)
    np.testing.assert_allclose(auto, exact, atol=1e-5)
    # the detected path really took the compact lattice upload
    assert any("lattice" in sig for sig in gen._buckets_used
               if isinstance(sig, tuple)), gen._buckets_used

    # a point pushed off the lattice beyond the snap tolerance
    # (1e-3 lattice units) must force the exact f32 fallback
    coords_off = coords.copy()
    coords_off[7, 1] += 0.01 * box / reso
    off = gen.eval_points_fast(state, coords_off, c_planes,
                               transfer_dtype=jnp.float32)
    ref_off = gen.eval_points_fast(state, coords_off, c_planes,
                                   transfer_dtype=jnp.float32,
                                   detect_lattice=False)
    np.testing.assert_allclose(off, ref_off, atol=1e-6)


def test_lattice_detection_nan_safe(rng):
    """NaN/inf coordinates must not crash the detector (Fraction raises on
    non-finite input) nor slip through the encoders' residual checks as
    garbage lattice indices — the default eval_points path must keep the
    reference behavior of returning NaN logits for NaN queries."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    box = 1 + gen.padding
    reso = 31
    ii = rng.integers(0, reso + 1, (500, 3))
    coords = (box * (ii.astype(np.float64) / reso - 0.5)).astype(np.float32)
    for bad in (np.nan, np.inf, -np.inf):
        # estimator: a non-finite value IN ITS SAMPLE (index 0 is always
        # sampled) must be rejected, not passed into Fraction (raises)
        c_bad = coords.copy()
        c_bad[0, 0] = bad
        assert gen._estimate_lattice_reso(c_bad, box) is None
        # encoders (native and fallback): a NaN the 192-point sampler
        # MISSES (index 3,1 is unsampled at this size) must poison the
        # residual, not silently encode a garbage lattice index
        c_bad = coords.copy()
        c_bad[3, 1] = bad
        _, resid = gen._lattice_encode_host(c_bad, box, reso, 512)
        assert not (resid <= 1e-3), resid
        # end to end: NaN in → NaN logit out (no crash, no snapping)
        out = gen.eval_points(state, c_bad, c_planes,
                              transfer_dtype=jnp.float32)
        assert np.isnan(out[3])
        assert np.isfinite(np.delete(out, 3)).all()


def test_decode_points_batched_int8(rng):
    """decode_points_batched must implement the same per-object scaled
    int8 transfer contract as decode_dense_batched (a raw astype would
    truncate logits to garbage)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    B, M = 3, 301
    cB = {k: jnp.concatenate([v * (1 + 0.2 * b) for b in range(B)])
          for k, v in c_planes.items()}
    pts = rng.uniform(-0.5, 0.5, (B, M, 3)).astype(np.float32)
    exact = gen.decode_points_batched(state, pts, cB,
                                      transfer_dtype=jnp.float32)
    q = gen.decode_points_batched(state, pts, cB, transfer_dtype=jnp.int8)
    step = np.abs(exact).max(axis=1, keepdims=True) / 127.0
    assert (np.abs(q - exact) <= step * 1.01).all()


def test_eval_points_slices_above_limit(rng):
    """eval_points must slice fast-path inputs above scatter_slice_points
    (the corner-packed row-take is O(N)-wide on device) and still return
    the same logits as the unsliced path."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    pts = rng.uniform(-0.5, 0.5, (5000, 3)).astype(np.float32)
    ref = gen.eval_points(state, pts, c_planes, transfer_dtype=jnp.float32)
    gen2 = Generator3D(model, resolution0=4, padding=0.1)
    gen2.scatter_slice_points = 2048  # force 3 slices
    got = gen2.eval_points(state, pts, c_planes, transfer_dtype=jnp.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_lattice_encode_host_native_matches_numpy(rng):
    """The native one-pass lattice encoder and the numpy fallback must
    produce identical arrays and equivalent residuals."""
    from vtaco_tpu.generate.generator import Generator3D

    gen = Generator3D(None, resolution0=4)  # encoder unused here
    box = 1.1
    for reso, dt in ((127, np.uint8), (256, np.int16)):
        ii = rng.integers(0, reso + 1, (777, 3))
        p = (box * (ii.astype(np.float64) / reso - 0.5)).astype(np.float32)
        npad = 1024
        got, resid = gen._lattice_encode_host(p, box, reso, npad)
        assert got.dtype == dt and got.shape == (3, npad)
        np.testing.assert_array_equal(got[:, :777], ii.T)
        # tail [n:] is UNSPECIFIED (pooled buffer; callers pad it)
        assert resid <= 1e-3
        # numpy reference (the fallback body)
        w = p.astype(np.float32).T * (reso / box) + 0.5 * reso
        r = np.rint(w)
        np.testing.assert_array_equal(got[:, :777], r.astype(dt))
        # out-of-range coords poison the residual
        p_bad = p.copy()
        p_bad[0, 0] = box
        _, resid_bad = gen._lattice_encode_host(p_bad, box, reso, npad)
        assert resid_bad > 1e3


def test_full_grid_order_detector(rng):
    """_full_grid_order must recognize exactly the two canonical complete
    cube flattenings and nothing else."""
    from vtaco_tpu.generate.generator import Generator3D

    R1 = 5
    ii = np.arange(R1, dtype=np.int16)
    cube_ij = np.stack(np.meshgrid(ii, ii, ii, indexing="ij"),
                       axis=-1).reshape(-1, 3)  # x slowest / z fastest
    n = R1 ** 3
    assert Generator3D._full_grid_order(
        np.ascontiguousarray(cube_ij.T), n, R1) is True
    cube_xf = cube_ij[:, ::-1]  # x fastest (dense-internal order)
    assert Generator3D._full_grid_order(
        np.ascontiguousarray(cube_xf.T), n, R1) is False
    # permutation, subset, off-by-one value: all rejected
    perm = cube_ij[rng.permutation(n)]
    assert Generator3D._full_grid_order(
        np.ascontiguousarray(perm.T), n, R1) is None
    assert Generator3D._full_grid_order(
        np.ascontiguousarray(cube_ij[:-1].T), n - 1, R1) is None
    tweak = cube_ij.copy()
    tweak[n // 2, 1] += 1
    assert Generator3D._full_grid_order(
        np.ascontiguousarray(tweak.T), n, R1) is None


def test_eval_points_full_grid_dense_route(rng):
    """Complete-cube f32 query sets through the scattered API must take
    the zero-upload dense route (no scatter program compiled) and return
    logits identical to the dense decode in the caller's point order —
    for both canonical orders, with gating, with int8 transfer, through
    the explicit-lattice input mode, and above the slice limit. Shuffled
    cubes must keep the compact-coord scattered path with equal results."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    box = 1 + gen.padding
    nx = 9
    ii = np.arange(nx)
    cube_ij = np.stack(np.meshgrid(ii, ii, ii, indexing="ij"),
                       axis=-1).reshape(-1, 3)
    coords_ij = (box * (cube_ij.astype(np.float64) / (nx - 1) - 0.5)
                 ).astype(np.float32)
    dense = gen.eval_points_dense(state, nx, c_planes,
                                  transfer_dtype=jnp.float32)  # x-slowest
    got = gen.eval_points(state, coords_ij, c_planes,
                          transfer_dtype=jnp.float32)
    np.testing.assert_allclose(got, dense, atol=1e-5)
    # the dense route really was taken: no scatter bucket registered
    assert not gen._buckets_used, gen._buckets_used

    # x-fastest (dense-internal) order
    coords_xf = coords_ij[:, ::-1].copy()
    got_xf = gen.eval_points(state, coords_xf, c_planes,
                             transfer_dtype=jnp.float32)
    np.testing.assert_allclose(
        got_xf, dense.reshape(nx, nx, nx).transpose(2, 1, 0).reshape(-1),
        atol=1e-5)
    assert not gen._buckets_used

    # shuffled cube: not a canonical order → scattered path, same values
    perm = rng.permutation(nx ** 3)
    got_perm = gen.eval_points(state, coords_ij[perm], c_planes,
                               transfer_dtype=jnp.float32)
    np.testing.assert_allclose(got_perm, got[perm], atol=1e-5)
    assert gen._buckets_used  # the scattered program DID run here

    # gating + int8 transfer through the dense route
    gate_pts = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 8, 3)), jnp.float32)
    gate_feat = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    gate_valid = jnp.asarray(rng.random((5, 8)) > 0.3)
    ref_g = gen.eval_points_dense(state, nx, c_planes, "contact", gate_pts,
                                  gate_feat, gate_valid,
                                  transfer_dtype=jnp.float32)
    got_g = gen.eval_points(state, coords_ij, c_planes, "contact", gate_pts,
                            gate_feat, gate_valid,
                            transfer_dtype=jnp.float32)
    np.testing.assert_allclose(got_g, ref_g, atol=1e-5)
    q = gen.eval_points_fast(state, coords_ij, c_planes,
                             transfer_dtype=jnp.int8)
    step = np.abs(got).max() / 127.0
    assert (np.abs(q - got) <= step * 1.01).all()

    # explicit integer-lattice input mode detects the cube too...
    got_int = gen.eval_points_fast(state, cube_ij.astype(np.int16),
                                   c_planes, lattice_reso=nx - 1,
                                   transfer_dtype=jnp.float32)
    np.testing.assert_allclose(got_int, got, atol=1e-5)
    # ...unless the caller pins the upload path (the bench's A/B control)
    gen_pin = Generator3D(model, resolution0=4, padding=0.1)
    got_pin = gen_pin.eval_points_fast(state, cube_ij.astype(np.int16),
                                       c_planes, lattice_reso=nx - 1,
                                       transfer_dtype=jnp.float32,
                                       detect_dense=False)
    np.testing.assert_allclose(got_pin, got, atol=1e-5)
    assert gen_pin._buckets_used  # the upload program really ran

    # above the slice limit: the whole cube still goes dense in one piece
    gen2 = Generator3D(model, resolution0=4, padding=0.1)
    gen2.scatter_slice_points = 256  # far below nx³ = 729
    got_big = gen2.eval_points(state, coords_ij, c_planes,
                               transfer_dtype=jnp.float32)
    np.testing.assert_allclose(got_big, dense, atol=1e-5)
    assert not gen2._buckets_used


def test_generator_transfer_dtype_knob(rng):
    """generation.transfer_dtype must validate eagerly and thread through
    the generate pipelines (MISE here): 'int8' results stay within one
    quantization step of the exact path."""
    import pytest

    from vtaco_tpu.generate.generator import Generator3D
    from vtaco_tpu.generate.mise import multires_decode

    model, c_planes, state, _ = _setup(rng)
    with pytest.raises(ValueError):
        Generator3D(model, transfer_dtype="float16")

    gen = Generator3D(model, resolution0=4, padding=0.1)
    gen8 = Generator3D(model, resolution0=4, padding=0.1,
                       transfer_dtype="int8")
    assert gen8.transfer_dtype == jnp.int8
    # steps=0 pins the comparison to the dense level (refinement sets can
    # legitimately diverge when borderline voxels quantize across the
    # threshold)
    v, _ = multires_decode(gen, state, c_planes, 8, 0, 0.0)
    v8, _ = multires_decode(gen8, state, c_planes, 8, 0, 0.0)
    step = np.abs(v).max() / 127.0
    # v carries bf16 transfer rounding (≤0.5 step at these magnitudes),
    # v8 int8 quantization (≤0.5 step): allow both
    assert np.abs(v8 - v).max() <= step * 1.6


def test_eval_points_fast_coord_quant(rng):
    """uint16-quantized coord upload: logits within the error implied by
    an ≤8.4e-6 world-unit coordinate perturbation (finite-difference
    bound via a deliberately-perturbed exact decode)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    pts = rng.uniform(-0.5, 0.5, (301, 3)).astype(np.float32)
    exact = gen.eval_points_fast(state, pts, c_planes,
                                 transfer_dtype=jnp.float32)
    q = gen.eval_points_fast(state, pts, c_planes,
                             transfer_dtype=jnp.float32, coord_quant=True)
    # bound the sensitivity empirically: decode at +quantstep coords
    step = (1 + gen.padding) / 65535.0
    pert = gen.eval_points_fast(state, pts + step, c_planes,
                                transfer_dtype=jnp.float32)
    bound = np.abs(pert - exact).max() * 2 + 1e-6
    assert np.abs(q - exact).max() <= bound


def test_decode_points_batched_lattice(rng):
    """Batched lattice mode == batched f32-coords mode (to f32 roundoff;
    XLA FMA-contracts the in-program affine coord map)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    B, M, reso = 3, 65, 16
    box = 1 + gen.padding
    cB = {k: jnp.concatenate([v * (1 + 0.1 * b) for b in range(B)])
          for k, v in c_planes.items()}
    pts_int = rng.integers(0, reso + 1, (B, M, 3))
    coords = box * (pts_int.astype(np.float32) / reso - 0.5)
    f32 = gen.decode_points_batched(state, coords, cB,
                                    transfer_dtype=jnp.float32)
    lat = gen.decode_points_batched(state, pts_int, cB,
                                    transfer_dtype=jnp.float32,
                                    lattice_reso=reso)
    np.testing.assert_allclose(lat, f32, atol=1e-5)


def test_sticky_bucket_reuse(rng):
    """Bucket hysteresis: drifting N must reuse an already-compiled bucket
    within 2x instead of minting a new padded size (each new size is a
    fresh XLA compile — multi-minute through a remote-compile backend)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    sig = ("scatter", "none", False, False, "float32")
    b1 = gen._sticky_bucket(sig, 5000)       # fresh: 6144
    assert b1 == 6144
    assert gen._sticky_bucket(sig, 4097) == 6144   # 6144 <= 2*6144, reuse
    assert gen._sticky_bucket(sig, 6100) == 6144   # still fits
    b2 = gen._sticky_bucket(sig, 7000)       # fresh: 8192
    assert b2 == 8192
    assert gen._sticky_bucket(sig, 5000) == 6144   # smallest in-range wins
    assert gen._sticky_bucket(sig, 2048) == 2048   # 6144 > 2*2048: fresh
    # separate signatures do not share buckets
    assert gen._sticky_bucket(("other",), 5000) == 6144


def test_decode_dense_batched_int8(rng):
    """Batched dense decode with int8 transfer: per-object scale-dequantized
    values within one quantization step of the bf16/f32 path."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    B = 3
    cB = {k: jnp.concatenate([v * (1 + 0.2 * b) for b in range(B)])
          for k, v in c_planes.items()}
    exact = gen.decode_dense_batched(state, 8, cB, transfer_dtype=jnp.float32)
    q = gen.decode_dense_batched(state, 8, cB, transfer_dtype=jnp.int8)
    step = np.abs(exact).max(axis=1, keepdims=True) / 127.0
    assert (np.abs(q - exact) <= step * 1.01).all()


def test_decode_dense_batched_lax_map_path(rng):
    """Above batched_vmap_limit total points, decode_dense_batched swaps
    the vmapped body for lax.map (the giant vmapped program crashes the
    remote TPU compiler at 8×256³); both paths must agree exactly for
    every transfer dtype."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    B = 3
    cB = {k: jnp.concatenate([v * (1 + 0.2 * b) for b in range(B)])
          for k, v in c_planes.items()}
    for td in (jnp.float32, jnp.bfloat16, jnp.int8):
        ref = gen.decode_dense_batched(state, 8, cB, transfer_dtype=td)
        gen2 = Generator3D(model, resolution0=4, padding=0.1)
        gen2.batched_vmap_limit = 1  # force the lax.map branch
        got = gen2.decode_dense_batched(state, 8, cB, transfer_dtype=td)
        np.testing.assert_array_equal(got, ref, err_msg=str(td))


def test_legacy_paths_int8_transfer_coerces(rng):
    """The legacy (fast=False / crop-mode) decode paths don't implement the
    fast paths' scaled-int8 quantization; with transfer_dtype=int8 they
    must coerce to bfloat16 instead of raw-truncating logits to garbage
    (regression: crop-mode MISE passes generator.transfer_dtype into
    eval_points, which forces the legacy path)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    gen.points_batch_size = 64

    exact = gen.eval_points_dense(state, 9, c_planes, fast=False,
                                  transfer_dtype=jnp.float32)
    got = gen.eval_points_dense(state, 9, c_planes, fast=False,
                                transfer_dtype=jnp.int8)
    np.testing.assert_allclose(got, exact, atol=0.05, rtol=0.02)  # bf16 res

    pts = rng.uniform(-0.5, 0.5, (150, 3)).astype(np.float32)
    exact = gen.eval_points(state, pts, c_planes, fast=False,
                            transfer_dtype=jnp.float32)
    got = gen.eval_points(state, pts, c_planes, fast=False,
                          transfer_dtype=jnp.int8)
    np.testing.assert_allclose(got, exact, atol=0.05, rtol=0.02)
    # single-dispatch legacy branch (n > points_batch_size handled above;
    # also exercise the per-chunk loop via a short input)
    got_short = gen.eval_points(state, pts[:32], c_planes, fast=False,
                                transfer_dtype=jnp.int8)
    np.testing.assert_allclose(got_short, exact[:32], atol=0.05, rtol=0.02)

    B = 2
    cB = {k: jnp.concatenate([v * (1 + 0.2 * b) for b in range(B)])
          for k, v in c_planes.items()}
    pts_b = rng.uniform(-0.5, 0.5, (B, 70, 3)).astype(np.float32)
    exact = gen.decode_points_batched(state, pts_b, cB, fast=False,
                                      transfer_dtype=jnp.float32)
    got = gen.decode_points_batched(state, pts_b, cB, fast=False,
                                    transfer_dtype=jnp.int8)
    np.testing.assert_allclose(got, exact, atol=0.05, rtol=0.02)


def test_lattice_reso_estimate_samples_all_axes(rng):
    """Regression: the sampled estimator must draw whole (x, y, z) rows.
    The old flat-array stride could be a multiple of 3 (e.g. N=196608),
    sampling only the x column — lattice structure on y/z was invisible
    and genuine lattices missed the compact upload."""
    from vtaco_tpu.generate.generator import Generator3D

    model, _, _, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    box = 1 + gen.padding
    n = 196608  # old stride: 3*196608//192 = 3072, a multiple of 3
    ii = np.zeros((n, 3), np.int64)
    ii[:, 0] = 0                                   # x constant
    ii[:, 1] = rng.integers(0, 18, n)              # y on a reso-17 lattice
    ii[:, 2] = rng.integers(0, 18, n) * 1          # z too
    coords = (box * (ii.astype(np.float64) / 17 - 0.5)).astype(np.float32)
    est = gen._estimate_lattice_reso(coords, box)
    assert est is not None, "lattice estimate failed on y/z-only lattice"
    assert 17 % est == 0 or est % 17 == 0, est
    # and the encode at the estimate must verify
    cand, resid = gen._lattice_encode_host(coords, box, est, n)
    assert resid <= 1e-3, (est, resid)


def test_compact_serving_auto_defaults(rng):
    """The 'auto' serving defaults resolve per backend: bf16 logits and
    exact f32 coord uploads on CPU (where the parity suites run), int8
    logits + uint16 non-lattice coords on TPU. The resolution is lazy
    (a property), so one config serves both backends."""
    from unittest import mock

    from vtaco_tpu.generate.generator import Generator3D

    model, _, _, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)  # auto/auto
    assert gen.transfer_dtype == jnp.bfloat16  # CPU backend in tests
    assert gen._coord_quant_enabled() is False
    with mock.patch("jax.default_backend", return_value="tpu"):
        assert gen.transfer_dtype == jnp.int8
        assert gen._coord_quant_enabled() is True
    # pinned values override auto on any backend
    pinned = Generator3D(model, transfer_dtype="float32", coord_quant=False)
    with mock.patch("jax.default_backend", return_value="tpu"):
        assert pinned.transfer_dtype == jnp.float32
        assert pinned._coord_quant_enabled() is False
    import pytest

    with pytest.raises(ValueError):
        Generator3D(model, coord_quant="yes")


def test_decode_points_batched_coord_quant(rng):
    """Batched scattered decode with uint16 coord upload: same
    finite-difference error contract as the single-object path, and
    coord_quant + lattice input is rejected."""
    import pytest

    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    B, M = 3, 101
    cB = {k: jnp.concatenate([v * (1 + 0.1 * b) for b in range(B)])
          for k, v in c_planes.items()}
    pts_b = rng.uniform(-0.5, 0.5, (B, M, 3)).astype(np.float32)
    exact = gen.decode_points_batched(state, pts_b, cB,
                                      transfer_dtype=jnp.float32)
    q = gen.decode_points_batched(state, pts_b, cB,
                                  transfer_dtype=jnp.float32,
                                  coord_quant=True)
    step = (1 + gen.padding) / 65535.0
    pert = gen.decode_points_batched(state, pts_b + step, cB,
                                     transfer_dtype=jnp.float32)
    bound = np.abs(pert - exact).max() * 2 + 1e-6
    assert np.abs(q - exact).max() <= bound
    with pytest.raises(ValueError):
        gen.decode_points_batched(state, np.zeros((B, 9, 3), np.int16), cB,
                                  lattice_reso=16, coord_quant=True)


def test_window_kernel_matches_gather(rng):
    """Sorted windowed decode kernel (fused_trunk_window_cn): parity vs
    the corner-packed-gather XLA features + fused trunk, zero overflow
    with an adequate window, counted overflow with an undersized one."""
    from vtaco_tpu.ops.dense_decode import (
        scattered_grid_features_cn,
        supercell_keys,
        supercell_packed_volume,
    )
    from vtaco_tpu.ops.pallas.decode import (
        fused_trunk_cn,
        fused_trunk_window_cn,
        pack_trunk_params,
    )

    R, C = 17, 8          # odd reso stresses n1 = ceil((R-1)/L)
    padding = 0.1
    N, tile = 4096, 256
    g = jnp.asarray(rng.standard_normal((R, R, R, C)), jnp.float32)
    pts = rng.uniform(-0.62, 0.62, (3, N)).astype(np.float32)  # outliers too

    dec = LocalDecoder(c_dim=C, hidden_size=8, n_blocks=5)
    params = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 3)),
                      {"grid": g[None]})["params"]
    tp = FT.extract_trunk_params(params, dec.n_blocks, with_img=False)
    packed = pack_trunk_params(tp, with_img=False)

    # L=1: plain cells (8C corner payload); L=2: 2³-cell supers (27C)
    for L, S in ((1, 512), (2, 64)):
        keys = np.asarray(supercell_keys(jnp.asarray(pts), R, padding, L))
        pts_s = jnp.asarray(pts[:, np.argsort(keys, kind="stable")])
        feats = scattered_grid_features_cn(g, pts_s, padding)
        ref = fused_trunk_cn(packed, pts_s, feats, interpret=True)

        vol, n1 = supercell_packed_volume(g, S, L)
        out, n_over = fused_trunk_window_cn(
            packed, vol, pts_s, reso=R, n1=n1, padding=padding, L=L,
            S=S, tile=tile, interpret=True)
        assert int(n_over) == 0, (L, S)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)

        # an undersized window must REPORT the overrun, not hide it
        vol8, _ = supercell_packed_volume(g, 8, L)
        _, n_over8 = fused_trunk_window_cn(
            packed, vol8, pts_s, reso=R, n1=n1, padding=padding, L=L,
            S=8, tile=tile, interpret=True)
        assert int(n_over8) > 0, (L,)


def test_window_scatter_generator_routing(rng):
    """eval_points_fast routes grid-only non-lattice queries through the
    sorted window path (caller-order results, gating parity, plane
    fields rejected)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    gen.window_interpret = True
    c_grid = {"grid": c_planes["grid"]}
    N = 3000
    pts = rng.uniform(-0.6, 0.6, (N, 3)).astype(np.float32)

    ref = gen.eval_points_fast(state, pts, c_grid,
                               transfer_dtype=jnp.float32, use_pallas=False)
    win = gen.eval_points_fast(state, pts, c_grid,
                               transfer_dtype=jnp.float32, use_pallas=True)
    np.testing.assert_allclose(win, ref, atol=2e-5)

    gate_pts = jnp.asarray(rng.uniform(-0.3, 0.3, (5, 8, 3)), jnp.float32)
    gate_feat = jnp.asarray(rng.standard_normal((5, 8)), jnp.float32)
    gate_valid = jnp.asarray(rng.random((5, 8)) > 0.3)
    refg = gen.eval_points_fast(state, pts, c_grid, "contact", gate_pts,
                                gate_feat, gate_valid,
                                transfer_dtype=jnp.float32, use_pallas=False)
    wing = gen.eval_points_fast(state, pts, c_grid, "contact", gate_pts,
                                gate_feat, gate_valid,
                                transfer_dtype=jnp.float32, use_pallas=True)
    np.testing.assert_allclose(wing, refg, atol=2e-5)

    # uint16-quantized upload through the window path: must match the
    # EXISTING quant gather path (identical dequantized coords and
    # clipping contract; only interp summation order differs)
    winq = gen.eval_points_fast(state, pts, c_grid,
                                transfer_dtype=jnp.float32, use_pallas=True,
                                coord_quant=True)
    refq = gen.eval_points_fast(state, pts, c_grid,
                                transfer_dtype=jnp.float32, use_pallas=False,
                                coord_quant=True)
    np.testing.assert_allclose(winq, refq, atol=2e-5)

    # plane features present → the window path must decline
    tp = FT.extract_trunk_params(state.params["decoder"],
                                 model.decoder.n_blocks, with_img=False)
    assert gen._try_window_scatter(
        state, tp, pts, N, c_planes, "none", jnp.zeros((1, 3)),
        jnp.zeros((1, 1)), jnp.zeros((1,), bool), jnp.float32,
        use_pallas=True, leaky=False, quantize=False) is None


def test_window_overflow_sentinel_falls_back(rng):
    """The kernel's overflow count rides the padded tail of the result
    transfer (a separate scalar fetch would cost a tunnel RTT); a
    nonzero flag makes _try_window_scatter return None — gather-path
    fallback — instead of caller-order garbage (review r4)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    gen.window_interpret = True
    c_grid = {"grid": c_planes["grid"]}
    N = 3000
    pts = rng.uniform(-0.6, 0.6, (N, 3)).astype(np.float32)
    tp = FT.extract_trunk_params(state.params["decoder"],
                                 model.decoder.n_blocks, with_img=False)
    zp, zf, zv = jnp.zeros((1, 3)), jnp.zeros((1, 1)), jnp.zeros((1,), bool)

    out = gen._try_window_scatter(
        state, tp, pts, N, c_grid, "none", zp, zf, zv, jnp.float32,
        use_pallas=True, leaky=False, quantize=False)
    assert out is not None and out.shape == (N,)

    # device side: UNSORTED points through the jitted impl must raise the
    # flag in the last slot (their tile spans overflow any 2S window).
    # Tile the R=6 grid to reso 48 so n1³ ≫ 2S and the window can't
    # cover the whole volume.
    g = jnp.tile(c_grid["grid"][0], (8, 8, 8, 1))
    p_cn = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 1024)).astype(np.float32))
    raw = gen._decode_scatter_window(
        tp, p_cn, g, zp, zf, zv, gating="none", S=128, tile=256, L=1,
        out_dtype=None, coord_quant=False, interpret=True)
    assert float(np.asarray(raw)[-1]) != 0.0

    # host side: a reported overflow → fall back (monkeypatch the jitted
    # decode to poison the sentinel slot)
    orig = gen._decode_scatter_window

    def poisoned(*a, **k):
        res = orig(*a, **k)
        if isinstance(res, tuple):  # int8: (quantized, scale)
            return res[0].at[-1].set(jnp.int8(1)), res[1]
        return res.at[-1].set(jnp.asarray(1, res.dtype))

    gen._decode_scatter_window = poisoned
    try:
        assert gen._try_window_scatter(
            state, tp, pts, N, c_grid, "none", zp, zf, zv, jnp.float32,
            use_pallas=True, leaky=False, quantize=False) is None
    finally:
        gen._decode_scatter_window = orig


def test_eval_points_empty(rng):
    """(0, 3) query sets return empty logits instead of crashing the
    lattice/window planners (review r4)."""
    from vtaco_tpu.generate.generator import Generator3D

    model, c_planes, state, _ = _setup(rng)
    gen = Generator3D(model, resolution0=4, padding=0.1)
    gen.window_interpret = True
    empty = np.zeros((0, 3), np.float32)
    out = gen.eval_points_fast(state, empty, {"grid": c_planes["grid"]},
                               use_pallas=True)
    assert np.asarray(out).shape == (0,)
    out2 = gen.eval_points(state, empty, c_planes)
    assert np.asarray(out2).shape == (0,)
