"""MISE-style multi-resolution isosurface extraction.

Counterpart of the reference's (unused-by-shipped-configs)
MultiGridExtractor (src/utils/mesh.py:7-101): maintain a grid of occupancy
values where only points adjacent to "active" (boundary-possible) voxels
are evaluated; double the resolution and repeat. At 256³ this evaluates a
few percent of the dense grid.

TPU adaptation: the coarse level is decoded with the dense gather-free
path; refinement levels batch their (variable-count) query points into
fixed-size padded chunks for the jitted scattered decoder.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

# Per-object host-work thread count for the batched serving paths.
# None → os.cpu_count(). The native bookkeeping engine (native/mise.cpp)
# and marching cubes (native/mc.cpp) hold no cross-handle state (the
# shared page pool is mutex-protected) and ctypes releases the GIL around
# every foreign call, so B objects' grid passes genuinely overlap on a
# multi-core serving host — the measured 79%-host share of a batched
# 256³ flight (docs/DESIGN.md § Batched MISE) divides by min(B, cores).
HOST_THREADS = None


def host_map(fn, *seqs):
    """``map(fn, *seqs)`` across per-object host bookkeeping, threaded.

    Serial when only one worker is useful (1-core hosts, B=1) so the
    single-core bench path pays no pool overhead.
    """
    n = min(len(s) for s in seqs)
    w = min(HOST_THREADS or os.cpu_count() or 1, n)
    if w <= 1:
        return [fn(*args) for args in zip(*seqs)]
    with ThreadPoolExecutor(max_workers=w) as ex:
        return list(ex.map(fn, *seqs))


def upsample3d_nn(x):
    """Nearest 2x upsampling. src/utils/mesh.py:87-101."""
    y = np.repeat(np.repeat(np.repeat(x, 2, 0), 2, 1), 2, 2)
    return y


def _voxel_known(value_known):
    """True where all 8 corner values of a voxel are known."""
    k = value_known
    return (
        k[:-1, :-1, :-1] & k[:-1, :-1, 1:] & k[:-1, 1:, :-1] & k[:-1, 1:, 1:]
        & k[1:, :-1, :-1] & k[1:, :-1, 1:] & k[1:, 1:, :-1] & k[1:, 1:, 1:]
    )


def _voxel_boundary(occ):
    """True where a voxel's 8 corner occupancies disagree (surface voxel)."""
    o = occ
    corners = [
        o[:-1, :-1, :-1], o[:-1, :-1, 1:], o[:-1, 1:, :-1], o[:-1, 1:, 1:],
        o[1:, :-1, :-1], o[1:, :-1, 1:], o[1:, 1:, :-1], o[1:, 1:, 1:],
    ]
    any_occ = corners[0].copy()
    all_occ = corners[0].copy()
    for c in corners[1:]:
        any_occ |= c
        all_occ &= c
    return any_occ & ~all_occ


class _EngineView(np.ndarray):
    """ndarray view over C++-engine memory; ``_keepalive`` pins the owning
    extractor (and therefore the buffer) for the view's lifetime. The pin
    ALSO lives on the underlying ctypes buffer object (values_view), so
    base-class conversions (np.asarray / ascontiguousarray) that drop the
    subclass still keep the engine alive through their ``.base`` chain."""

    _keepalive = None

    def __array_finalize__(self, obj):
        # propagate the pin through subclass views/slices
        self._keepalive = getattr(obj, "_keepalive", None)


class MultiGridExtractorNumpy:
    """Active-voxel refinement bookkeeping (host side), numpy reference.

    Same protocol as the reference (src/utils/mesh.py:7-84):
      query() → integer grid locations needing evaluation;
      update(points, values) → record values, refresh voxel activity;
      increase_resolution() → double the grid, keeping known values.
    Note the reference's occupancies use ``values < threshold`` — its
    values are distances; for occupancy logits pass ``invert=False`` to use
    ``values >= threshold``.

    This is the parity oracle for the native engine below; the full-grid
    numpy passes (float64 ``np.repeat`` upsample especially) cost ~17 s
    per 8-object 256³ batched-MISE flight on this host's single core, so
    production traffic runs through :class:`MultiGridExtractor`.
    """

    def __init__(self, resolution0, threshold, invert=True):
        self.resolution = resolution0
        self.threshold = threshold
        self.invert = invert
        shape_values = (resolution0 + 1,) * 3
        self.values = np.empty(shape_values)
        self.value_known = np.full(shape_values, False)
        self.voxel_active = np.full((resolution0,) * 3, True)

    def query(self):
        idx = np.where(~self.value_known & self.value_active)
        return np.stack(idx, axis=-1)

    def update(self, points, values):
        i0, i1, i2 = points.T
        self.values[i0, i1, i2] = values
        self.value_known[i0, i1, i2] = True
        self.voxel_active = ~self.voxel_empty

    def increase_resolution(self):
        self.resolution = 2 * self.resolution
        shape_values = (self.resolution + 1,) * 3
        value_known = np.full(shape_values, False)
        value_known[::2, ::2, ::2] = self.value_known
        values = upsample3d_nn(self.values)[:-1, :-1, :-1]
        self.values = values
        self.value_known = value_known
        self.voxel_active = upsample3d_nn(self.voxel_active)

    @property
    def occupancies(self):
        if self.invert:
            return self.values < self.threshold
        return self.values >= self.threshold

    @property
    def values_view(self):
        """API parity with the native engine (a plain copy here)."""
        return self.values

    @property
    def value_active(self):
        va = np.full(self.values.shape, False)
        a = self.voxel_active
        for sx in (slice(None, -1), slice(1, None)):
            for sy in (slice(None, -1), slice(1, None)):
                for sz in (slice(None, -1), slice(1, None)):
                    va[sx, sy, sz] |= a
        return va

    @property
    def voxel_known(self):
        return _voxel_known(self.value_known)

    @property
    def voxel_empty(self):
        return ~_voxel_boundary(self.occupancies)


class MultiGridExtractorNative:
    """Native-engine MultiGridExtractor (vtaco_tpu/native/mise.cpp).

    Drop-in replacement for :class:`MultiGridExtractorNumpy` — identical
    query order (numpy.where C-order) and values (every value the
    protocol holds is an f32 decode output or a copy, so the f32 native
    grid matches the f64 numpy grid bit-exactly; parity test
    tests/test_generation_utils.py). Extras for the serving paths:
    ``update_queried(values)`` applies values in query order without
    re-passing points, and ``query_cn(npad)`` writes the scattered
    decoder's (3, npad) int16 layout directly (pad = last real point).
    """

    def __init__(self, resolution0, threshold, invert=True):
        import ctypes

        from vtaco_tpu.native import mise as _native_mise

        self._lib = _native_mise._ensure()
        self._ct = ctypes
        self.threshold = float(threshold)
        self.invert = bool(invert)
        self._h = self._lib.vtaco_mise_new(
            int(resolution0), ctypes.c_float(self.threshold),
            int(self.invert),
        )

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.vtaco_mise_free(h)
            self._h = None

    @property
    def resolution(self):
        return int(self._lib.vtaco_mise_resolution(self._h))

    def query(self):
        n = self._lib.vtaco_mise_query_count(self._h)
        out = np.empty((n, 3), np.int32)
        if n:
            self._lib.vtaco_mise_query_copy(
                self._h, out.ctypes.data_as(self._ct.POINTER(
                    self._ct.c_int32)),
            )
        return out

    def query_cn(self, npad, out=None):
        """(3, npad) int16 channels-first query layout + real count.

        ``out``: optional preallocated C-contiguous (3, npad) int16 view
        to write into (the engine fills every slot incl. the
        pad-with-last-point tail, so pooled buffers need no clearing).
        """
        if out is None:
            out = np.zeros((3, npad), np.int16)
        assert out.flags.c_contiguous and out.dtype == np.int16
        n = self._lib.vtaco_mise_query_copy_cn(
            self._h, out.ctypes.data_as(self._ct.POINTER(self._ct.c_int16)),
            npad,
        )
        return out, int(n)

    @property
    def query_count(self):
        """Number of pending query points (no copy)."""
        return int(self._lib.vtaco_mise_query_count(self._h))

    def update(self, points, values):
        pts = np.ascontiguousarray(points, np.int32)
        vals = np.ascontiguousarray(values, np.float32)
        self._lib.vtaco_mise_update(
            self._h, pts.ctypes.data_as(self._ct.POINTER(self._ct.c_int32)),
            vals.ctypes.data_as(self._ct.POINTER(self._ct.c_float)),
            len(vals),
        )

    def update_queried(self, values):
        """Record values for the last query()'s points, in query order."""
        vals = np.ascontiguousarray(values, np.float32)
        self._lib.vtaco_mise_update_queried(
            self._h, vals.ctypes.data_as(self._ct.POINTER(self._ct.c_float)),
        )

    def increase_resolution(self):
        self._lib.vtaco_mise_increase(self._h)

    @property
    def values(self):
        n = self.resolution + 1
        out = np.empty((n, n, n), np.float32)
        self._lib.vtaco_mise_values(
            self._h, out.ctypes.data_as(self._ct.POINTER(self._ct.c_float)),
        )
        return out

    @property
    def values_view(self):
        """Zero-copy READ-ONLY view of the engine's value grid.

        Skips the (R+1)³ f32 materialization copy — 540 MB at 512³, whose
        cold-page write faults cost multi-second on this class of host.
        The returned array subclass pins this extractor alive (the buffer
        belongs to the C++ engine), but the view is invalidated by a
        further ``increase_resolution``/``update`` — take it last, feed
        it to marching cubes, drop it.
        """
        n = self.resolution + 1
        ptr = self._lib.vtaco_mise_values_ptr(self._h)
        buf = (self._ct.c_float * (n * n * n)).from_address(ptr)
        # pin on the ctypes buffer: every derived array (incl. base-class
        # conversions like np.ascontiguousarray) reaches it via .base
        buf._keepalive = self
        arr = np.frombuffer(buf, np.float32).reshape(n, n, n)
        view = arr.view(_EngineView)
        view._keepalive = self
        view.flags.writeable = False
        return view

    @property
    def value_known(self):
        n = self.resolution + 1
        out = np.empty((n, n, n), np.uint8)
        self._lib.vtaco_mise_known(
            self._h, out.ctypes.data_as(self._ct.POINTER(self._ct.c_uint8)),
        )
        return out.astype(bool)

    @property
    def occupancies(self):
        if self.invert:
            return self.values < self.threshold
        return self.values >= self.threshold


def _pick_extractor():
    """Native engine when g++ is available, numpy protocol otherwise."""
    try:
        from vtaco_tpu.native import mise as _native_mise

        _native_mise._ensure()
        return MultiGridExtractorNative
    except Exception:
        return MultiGridExtractorNumpy


MultiGridExtractor = _pick_extractor()


class DelaunayMeshExtractor:
    """Mesh extraction from scattered implicit-function samples via
    Delaunay tetrahedralization.

    Counterpart of src/utils/mesh.py:104-199: simplices whose corners mix
    occupied/unoccupied are "active"; each crossing edge is subdivided at
    the linear iso-crossing; triangles are oriented by the sign of the
    tetrahedron volume against the reference corner's occupancy.
    """

    def __init__(self, points, values, threshold=0.0):
        from scipy.spatial import Delaunay

        self.points = np.asarray(points, np.float64)
        self.values = np.asarray(values, np.float64)
        self.threshold = threshold
        self.delaunay = Delaunay(self.points)

    def active_simplices(self):
        occ = self.values >= self.threshold
        simplices = self.delaunay.simplices
        s_occ = occ[simplices]
        active = np.any(s_occ, axis=1) & np.any(~s_occ, axis=1)
        return simplices[active]

    def update(self, points, values, reduce_to_active=True):
        from scipy.spatial import Delaunay

        if reduce_to_active:
            keep = np.unique(self.active_simplices().ravel())
            self.points = self.points[keep]
            self.values = self.values[keep]
        self.points = np.concatenate([self.points, points], axis=0)
        self.values = np.concatenate([self.values, values], axis=0)
        self.delaunay = Delaunay(self.points)

    def query(self, size):
        """Volume-weighted random samples inside active simplices
        (src/utils/mesh.py:183-214)."""
        tets = self.points[self.active_simplices()]
        vecs = tets[:, :3, :] - tets[:, 3:, :]
        vols = np.abs(np.linalg.det(vecs) / 6.0)
        probs = vols / vols.sum()
        pick = np.random.choice(len(tets), p=probs, size=size)
        w = np.random.dirichlet([1, 1, 1, 1], size=size)[:, :, None]
        return (w * tets[pick]).sum(axis=1)

    def extract_mesh(self):
        from itertools import combinations

        thr = self.threshold
        verts, tris = [], []
        edge_vertex = {}
        for simplex in np.sort(self.active_simplices(), axis=1):
            cut = []
            for i1, i2 in combinations(simplex, 2):
                v1, v2 = self.values[i1], self.values[i2]
                if (v1 < thr) != (v2 < thr):
                    key = (i1, i2)
                    if key not in edge_vertex:
                        tau = (thr - v1) / (v2 - v1)
                        p = (1 - tau) * self.points[i1] + tau * self.points[i2]
                        edge_vertex[key] = len(verts)
                        verts.append(p)
                    cut.append(edge_vertex[key])
            if len(cut) not in (3, 4):
                continue
            p0 = self.points[simplex[0]]
            v0 = self.values[simplex[0]]

            def emit(i1, i2, i3):
                vol = np.linalg.det(
                    np.stack([verts[i1], verts[i2], verts[i3]]) - p0
                ) / 6.0
                if vol * (v0 - thr) <= 0:
                    tris.append((i1, i2, i3))
                else:
                    tris.append((i1, i3, i2))

            emit(cut[0], cut[1], cut[2])
            if len(cut) == 4:
                emit(cut[1], cut[2], cut[3])
        return (
            np.asarray(verts, np.float32).reshape(-1, 3),
            np.asarray(tris, np.int32).reshape(-1, 3),
        )


def multires_decode(generator, state, c, resolution0, upsampling_steps,
                    threshold, gating="none", gate_pts=None, gate_feat=None,
                    gate_valid=None, chunk=65536, stats=None):
    """Coarse-to-fine occupancy evaluation → final dense value grid.

    Level 0 uses the gather-free dense decode at (resolution0+1)³; each
    refinement doubles resolution and evaluates only points adjacent to
    boundary voxels through the jitted scattered decoder (padded chunks).
    Returns ``(values, threshold)``: a ((R+1), (R+1), (R+1)) value grid at
    the final resolution (never-evaluated points hold interpolated coarse
    values) and the iso level used for refinement — pass it to marching
    cubes so the extraction matches the refinement.

    ``threshold=None`` derives the iso level from the coarse field's mean
    (the generator's ``mc_level: 'mean'`` semantics);
    ``threshold='midpoint'`` uses (min+max)/2 of the coarse field (the
    skimage-parity default of the dense path — robust when one mode
    dominates the field, where the mean sits inside that mode's noise).
    Use these self-calibrating forms when the caller has no calibrated
    level — e.g. untrained weights, or the t2d models whose
    generation-time c_img base differs from training's (the mirrored
    reference quirk, generation.py:173,223 vs training.py:814). ``chunk`` is kept for API compatibility; the
    refinement now runs through Generator3D.eval_points (size-bucketed
    single dispatch per level). ``stats`` (optional dict) receives a
    wall-time split: ``coarse_s`` (batched dense level-0 incl. transfer),
    ``decode_s`` (refinement decode dispatches incl. upload+fetch),
    ``host_s`` (grid bookkeeping on this host), ``query_pts`` per level.
    """
    import time as _time

    box_size = 1 + generator.padding
    st = stats if stats is not None else {}
    st.setdefault("coarse_s", 0.0)
    st.setdefault("decode_s", 0.0)
    st.setdefault("host_s", 0.0)
    st.setdefault("query_pts", [])

    def grid_to_coords(pts_int, reso):
        return box_size * (pts_int / reso - 0.5)

    # level 0: dense decode at (reso0+1)³ corners
    n0 = resolution0 + 1
    t0 = _time.time()
    values0 = generator.eval_points_dense(
        state, n0, c, gating, gate_pts, gate_feat, gate_valid,
        transfer_dtype=generator.transfer_dtype,
    ).reshape(n0, n0, n0)
    st["coarse_s"] += _time.time() - t0
    if threshold is None:
        threshold = float(values0.mean())
    elif threshold == "midpoint":
        threshold = (float(values0.min()) + float(values0.max())) / 2.0
    t0 = _time.time()
    mg = MultiGridExtractor(resolution0, threshold, invert=False)
    # dense grid spans ±0.5*box at indices 0..n0-1 == corners 0..reso0
    pts0 = mg.query()
    mg.update(pts0, values0[pts0[:, 0], pts0[:, 1], pts0[:, 2]])
    st["host_s"] += _time.time() - t0

    for _ in range(upsampling_steps):
        t0 = _time.time()
        mg.increase_resolution()
        pts = mg.query()
        st["host_s"] += _time.time() - t0
        st["query_pts"].append(int(len(pts)))
        if len(pts) == 0:
            continue
        # one dispatch per level through the scattered fast path (gather
        # interp + fused trunk, size-bucketed padding); the points upload
        # as int16 LATTICE coords (6 B/pt) and the world coords
        # ``box·(p/reso − 0.5)`` are computed in-program — matches
        # grid_to_coords to f32 roundoff, half the upload. The legacy
        # per-chunk loop costs a round trip per `chunk` points.
        t0 = _time.time()
        if (generator.input_type != "pointcloud_crop"
                and generator._fast_capable()):
            vals = generator.eval_points_fast(
                state, pts, c, gating, gate_pts, gate_feat, gate_valid,
                lattice_reso=mg.resolution,
                transfer_dtype=generator.transfer_dtype,
            ).astype(np.float32)
        else:
            coords = grid_to_coords(pts.astype(np.float32), mg.resolution)
            vals = generator.eval_points(
                state, coords, c, gating, gate_pts, gate_feat, gate_valid,
                transfer_dtype=generator.transfer_dtype,
            ).astype(np.float32)
        st["decode_s"] += _time.time() - t0
        t0 = _time.time()
        mg.update(pts, vals)
        st["host_s"] += _time.time() - t0

    t0 = _time.time()
    # zero-copy: marching cubes reads the engine's grid in place (the
    # returned view pins `mg` alive; 540 MB of copy + cold-page faults
    # at 512³ otherwise)
    out = mg.values_view
    st["host_s"] += _time.time() - t0
    return out, threshold


def multires_decode_batched(generator, state, c_batched, resolution0,
                            upsampling_steps, thresholds, device_mesh=None,
                            stats=None):
    """Batched MISE: B objects refined in lockstep, one dispatch per stage.

    The serving-side counterpart of :func:`multires_decode` — the coarse
    level is ONE batched dense decode (Generator3D.decode_dense_batched,
    optionally sharded over a device mesh's 'data' axis), and every
    refinement level gathers all B objects' active-boundary queries into a
    single padded (B, M, 3) batched scattered decode
    (Generator3D.decode_points_batched). The single-GPU reference serves
    objects one at a time (inferencing.py:59-183 loops its batch through
    generate_obj_mesh); here the whole flight shares each XLA dispatch.

    ``thresholds`` is a scalar, a per-object sequence of iso levels (in
    logit space), or None for per-object coarse-field means (see
    :func:`multires_decode`). Returns ``(grids, thresholds)``: a list of B
    value grids at the final resolution and the per-object levels used.
    ``stats`` (optional dict) receives the same wall-time split as
    :func:`multires_decode`.
    """
    import time as _time

    import jax

    B = jax.tree.leaves(c_batched)[0].shape[0]
    box_size = 1 + generator.padding
    st = stats if stats is not None else {}
    st.setdefault("coarse_s", 0.0)
    st.setdefault("decode_s", 0.0)
    st.setdefault("host_s", 0.0)
    st.setdefault("query_pts", [])

    n0 = resolution0 + 1
    t0 = _time.time()
    vals0 = generator.decode_dense_batched(
        state, n0, c_batched, device_mesh=device_mesh,
        transfer_dtype=generator.transfer_dtype,
    )
    st["coarse_s"] += _time.time() - t0
    if thresholds is None:
        thresholds = [float(vals0[b].mean()) for b in range(B)]
    elif np.isscalar(thresholds):
        thresholds = [float(thresholds)] * B
    t0 = _time.time()

    def _init_obj(b):
        mg = MultiGridExtractor(resolution0, thresholds[b], invert=False)
        v = vals0[b].reshape(n0, n0, n0)
        pts0 = mg.query()
        mg.update(pts0, v[pts0[:, 0], pts0[:, 1], pts0[:, 2]])
        return mg

    mgs = host_map(_init_obj, range(B))
    st["host_s"] += _time.time() - t0

    def _advance(mg):
        mg.increase_resolution()
        return mg.query()

    use_cn = (generator.input_type != "pointcloud_crop"
              and all(hasattr(mg, "query_cn") for mg in mgs))
    for _ in range(upsampling_steps):
        t0 = _time.time()
        if use_cn:
            # direct-packed int16 lattice upload: each engine writes its
            # (3, mpad) column slab straight into a POOLED (B, 3, mpad)
            # buffer (query_cn fills the pad tail too) — the previous
            # stack-into-(B,M,3) + transpose-into-(B,3,mpad) pair cost
            # ~0.5-1 s/flight in cold-page faults + strided copies here
            for mg in mgs:
                mg.increase_resolution()
            counts = [mg.query_count for mg in mgs]
            M = max(counts)
            st["query_pts"].append(int(M))
            if M == 0:
                st["host_s"] += _time.time() - t0
                continue
            import jax.numpy as jnp

            mpad = generator._sticky_bucket(
                ("scatter_batched", B, True, False,
                 jnp.dtype(generator.transfer_dtype).name), M,
            )
            buf = generator._pooled(("mise_cn", B, mpad),
                                    (B, 3, mpad), np.int16)
            host_map(lambda mg, bb: mg.query_cn(mpad, out=buf[bb]),
                     mgs, range(B))
            st["host_s"] += _time.time() - t0
            t0 = _time.time()
            vals = generator.decode_points_batched(
                state, None, c_batched, device_mesh=device_mesh,
                lattice_reso=mgs[0].resolution,
                transfer_dtype=generator.transfer_dtype,
                pts_cn=buf, n_real=M,
            )
            st["decode_s"] += _time.time() - t0
            t0 = _time.time()
            host_map(
                lambda mg, v, n: mg.update_queried(
                    np.ascontiguousarray(v[:n], np.float32)
                ) if n else None,
                mgs, list(vals), counts,
            )
            st["host_s"] += _time.time() - t0
            continue
        ptss = host_map(_advance, mgs)
        M = max(len(p) for p in ptss)
        st["query_pts"].append(int(M))
        if M == 0:
            st["host_s"] += _time.time() - t0
            continue
        if generator.input_type != "pointcloud_crop":
            # int16 lattice upload (6 B/pt, exact-to-roundoff coords)
            # — every object refines at the same lockstep resolution
            coords = np.zeros((B, M, 3), np.int16)
            for b, p in enumerate(ptss):
                if len(p):
                    coords[b, : len(p)] = p
            st["host_s"] += _time.time() - t0
            t0 = _time.time()
            vals = generator.decode_points_batched(
                state, coords, c_batched, device_mesh=device_mesh,
                lattice_reso=mgs[0].resolution,
                transfer_dtype=generator.transfer_dtype,
            )
            st["decode_s"] += _time.time() - t0
        else:
            coords = np.zeros((B, M, 3), np.float32)
            for b, p in enumerate(ptss):
                if len(p):
                    coords[b, : len(p)] = box_size * (
                        p.astype(np.float32) / mgs[b].resolution - 0.5
                    )
            st["host_s"] += _time.time() - t0
            t0 = _time.time()
            vals = generator.decode_points_batched(
                state, coords, c_batched, device_mesh=device_mesh,
                transfer_dtype=generator.transfer_dtype,
            )
            st["decode_s"] += _time.time() - t0
        t0 = _time.time()

        def _apply(mg, p, v):
            if len(p):
                mg.update(p, np.asarray(v[: len(p)]))

        host_map(_apply, mgs, ptss, list(vals))
        st["host_s"] += _time.time() - t0

    t0 = _time.time()
    # zero-copy engine views (each pins its extractor alive): per-object
    # marching cubes reads the engines' grids in place
    grids = host_map(lambda mg: mg.values_view, mgs)
    st["host_s"] += _time.time() - t0
    return grids, thresholds
