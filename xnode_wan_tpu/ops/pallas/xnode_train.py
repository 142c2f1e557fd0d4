"""Pallas TPU kernel: fused XNODE forward + spatial tangents with a custom
VJP — the training hot path.

The weak-form loss needs ``u(t_l, x_n)`` and the pointwise spatial gradient
``grad_x u`` for every sample of the batch, plus the parameter gradient of
everything built from them (reference hot loop ``src/training.py:125-138``;
honest-derivative directive SURVEY §3.5). The XLA path
(``ops/weak_form.py::u_with_spatial_grad``) runs a ``vmap(jax.jvp)`` scan:
correct, but ~360 tiny ``[<=46, B]`` matmuls round-tripping HBM per
forward, and as many again per backward — round-2 profiling put the primal
weak-form gradient at ~73% of the 11 ms outer step at 1.1% MFU
(``benchmarks/profile_d5.json``, DESIGN §11).

This kernel fuses the entire pipeline per block of paths with every weight
and intermediate VMEM-resident:

    seed/lift -> L masked intervals x n_sub substeps of the field MLP
              -> readout,  carrying the d spatial tangents jointly

* **Feature-major layout** ``[features, paths]`` — the nets are 10–50 wide,
  far under the 128-lane width, so paths go in lanes (same reasoning as
  the serving kernel, ``ops/pallas/xnode_eval.py``).
* **Tangents as lane-concatenated blocks**: the primal runs on ``[rows, B]``
  and the d directional tangents on ``[rows, d*B]`` — every linear layer is
  ONE matmul over the widened batch; elementwise rules pair each tangent
  block with the primal activations via a lane-tile.
* **Masking by zero-width intervals**: invalid sample steps get ``dt = 0``
  precomputed on the JAX side, making the interval an exact identity (and
  an exact-zero gradient) with no in-kernel branching.
* **Backward = stored states + reverse interval walk, in VMEM**: when the
  call is differentiated, the forward stores each interval's start state
  to HBM as custom-VJP residuals (~43 MB round trip at the d=5 shapes —
  ~0.1 ms at v5e bandwidth, vs ~0.4 ms for the full in-kernel forward
  recompute earlier rounds paid); the backward walks the intervals in
  reverse applying ``jax.vjp`` of the *shared* interval function — JAX
  derives the exact reverse (including the second-order terms from
  differentiating the tangent propagation); the kernel contributes the
  fusion and memory residency, not hand-derived calculus.

The public entry :func:`u_du_fused` is a drop-in for the contraction the
XLA path produces (``u [N, L]``, ``du [N, L, d]``) and carries a
``jax.custom_vjp`` whose backward returns parameter cotangents only (the
sample points are Monte-Carlo data, never differentiated).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xnode_wan_tpu.ops.pallas.steppers import rk_step

# ---------------------------------------------------------------------------
# Shared math: the joint primal+tangent network, written on VALUES so both
# kernels (and jax.vjp inside the backward kernel) trace the same function.
# Weights are [out, in] (transposed once on the JAX side); biases [out, 1].
# ---------------------------------------------------------------------------


# bf16 A/B experiment hook (benchmarks/microbench_step.py --fused-bf16):
# when set to jnp.bfloat16, every kernel matmul casts its operands and
# accumulates in f32 (the MXU's native mixed mode). Module-level on
# purpose — it must be set before the kernels trace; measured results in
# docs/DESIGN.md (the nets are 10-50 wide, so matmuls occupy ~1% of each
# 128x128 MXU pass either way — see the shape-feasibility analysis).
MM_DTYPE = None


def _mm(a, b):
    if MM_DTYPE is not None:
        a, b = a.astype(MM_DTYPE), b.astype(MM_DTYPE)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


# JAX's default transpose rules for ``dot_general`` produce lane-lane
# contractions, which Mosaic lowers as ``vector.multi_reduction``; when the
# backward kernel then accumulates them into the running parameter-gradient
# carry, Mosaic tries to fuse the add into the reduction's accumulator and
# fails ("only constant accumulators supported"). These custom VJPs pin the
# backward to STANDARD matmul forms (explicit small transposes + MXU
# matmuls, ones-column bias sums), which fuse fine.


@jax.custom_vjp
def _dot(w, z):
    return _mm(w, z)


def _mm_narrow(a, b):
    """``a @ b`` where ``b`` may have < 8 columns: Mosaic lowers a
    single-column matmul as a lane ``multi_reduction``, which cannot fuse
    into the backward kernel's loop-carried gradient accumulators ("only
    constant accumulators supported"); zero-padding to a sublane tile
    forces the MXU matmul lowering, and the slice after is free."""
    cols = b.shape[1]
    if cols >= 8:
        return _mm(a, b)
    pad = jnp.zeros((b.shape[0], 8 - cols), b.dtype)
    return _mm(a, jnp.concatenate([b, pad], axis=1))[:, :cols]


def _dot_fwd(w, z):
    return _mm(w, z), (w, z)


def _dot_bwd(res, cot):
    w, z = res
    return _mm_narrow(cot, z.T), _mm(w.T, cot)


_dot.defvjp(_dot_fwd, _dot_bwd)


@jax.custom_vjp
def _affine(w, b, z):
    """``W z + b``. The broadcast add is fine in the forward (the custom
    VJP below means its transpose is never taken inside a kernel)."""
    return _mm(w, z) + b


def _affine_fwd(w, b, z):
    return _affine(w, b, z), (w, z)


def _affine_bwd(res, cot):
    w, z = res
    ones_col = jnp.ones((z.shape[1], 1), dtype=z.dtype)
    return (_mm_narrow(cot, z.T), _mm_narrow(cot, ones_col),
            _mm(w.T, cot))


_affine.defvjp(_affine_fwd, _affine_bwd)


def _dot_t(a, b):
    """``a @ b^T`` via an explicit transpose (standard MXU matmul form)."""
    return _mm(a, b.T)


def _rep(a: jax.Array, d: int) -> jax.Array:
    """Tile ``[rows, B]`` to ``[rows, d*B]`` (pair primal with d tangents)."""
    if d == 1:
        return a
    return jnp.concatenate([a] * d, axis=1)


def _mlp_relu_fwd_tan(ws: Sequence[Tuple[jax.Array, jax.Array]],
                      z: jax.Array, zt: jax.Array, d: int):
    """``linear -> [relu, linear]*`` chain (lift MLP shape,
    models/xnode.py::lift_apply) on primal ``z`` and tangents ``zt``."""
    w, b = ws[0]
    a, at = _affine(w, b, z), _dot(w, zt)
    for w, b in ws[1:]:
        r = jax.nn.relu(a)
        rt = jnp.where(_rep(a, d) > 0, at, 0.0)
        a, at = _affine(w, b, r), _dot(w, rt)
    return a, at


def _field_fwd_tan(ws: Sequence[Tuple[jax.Array, jax.Array]],
                   xp: jax.Array, xt: jax.Array, t: jax.Array,
                   h: jax.Array, ht: jax.Array, d: int):
    """ODE field F(x, t, h) (models/xnode.py::field_apply) with tangents.

    ``xp [F, B]`` primal features, ``xt [F, d*B]`` their x-tangents
    (basis vectors / Fourier-bank jacobian columns), ``t [1, B]`` (no
    tangent: sample times are data), ``h [H, B]``, ``ht [H, d*B]``.
    """
    zt_t = jnp.zeros((1, ht.shape[1]), dtype=ht.dtype)
    z = jnp.concatenate([xp, t, h], axis=0)
    zt = jnp.concatenate([xt, zt_t, ht], axis=0)
    w, b = ws[0]
    a, at = _affine(w, b, z), _dot(w, zt)
    for w, b in ws[1:-1]:
        r = jax.nn.relu(a)
        rt = jnp.where(_rep(a, d) > 0, at, 0.0)
        a, at = _affine(w, b, r), _dot(w, rt)
    y = jnp.tanh(a)
    yt = (1.0 - _rep(y, d) ** 2) * at
    w, b = ws[-1]
    return _affine(w, b, y), _dot(w, yt)


def _interval(ws_field, xp, xt, h, ht, t0, dt, d: int, n_sub: int,
              method: str):
    """Integrate one sample interval: ``n_sub`` fixed substeps of ``dt``
    from ``t0`` (ops/integrate.py steppers, joint primal+tangent).

    ``dt`` is the per-path substep [1, B]; a masked (invalid) sample has
    ``dt = 0`` -> the interval is an exact identity.
    """
    dtd = _rep(dt, d)

    def f(t, hh, hht):
        return _field_fwd_tan(ws_field, xp, xt, t, hh, hht, d)

    for k in range(n_sub):
        t = t0 + k * dt
        if method == "euler":
            k1, k1t = f(t, h, ht)
            h, ht = h + dt * k1, ht + dtd * k1t
        elif method == "midpoint":
            k1, k1t = f(t, h, ht)
            k2, k2t = f(t + 0.5 * dt, h + 0.5 * dt * k1,
                        ht + 0.5 * dtd * k1t)
            h, ht = h + dt * k2, ht + dtd * k2t
        elif method == "heun":
            k1, k1t = f(t, h, ht)
            k2, k2t = f(t + dt, h + dt * k1, ht + dtd * k1t)
            h, ht = h + 0.5 * dt * (k1 + k2), ht + 0.5 * dtd * (k1t + k2t)
        elif method == "rk4":
            k1, k1t = f(t, h, ht)
            k2, k2t = f(t + 0.5 * dt, h + 0.5 * dt * k1,
                        ht + 0.5 * dtd * k1t)
            k3, k3t = f(t + 0.5 * dt, h + 0.5 * dt * k2,
                        ht + 0.5 * dtd * k2t)
            k4, k4t = f(t + dt, h + dt * k3, ht + dtd * k3t)
            h = h + dt * (k1 + 2 * k2 + 2 * k3 + k4) / 6.0
            ht = ht + dtd * (k1t + 2 * k2t + 2 * k3t + k4t) / 6.0
        else:  # pragma: no cover - validated in config
            raise ValueError(method)
    return h, ht


def _split_ws(flat: Sequence[jax.Array], n_lift: int, n_field: int):
    """Flat [W, b, W, b, ...] -> (lift pairs, field pairs, readout pair)."""
    pairs = [(flat[2 * i], flat[2 * i + 1]) for i in range(len(flat) // 2)]
    return (pairs[:n_lift], pairs[n_lift:n_lift + n_field], pairs[-1])


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(n_lift: int, n_field: int, L: int, d: int, n_sub: int,
                method: str,
                t0_ref, dt_ref, xp_ref, xt_ref, sp_ref, st_ref,
                *refs):
    weight_refs, u_ref, du_ref = refs[:-2], refs[-2], refs[-1]
    ws = [r[:] for r in weight_refs]
    lift, field, (wr, br) = _split_ws(ws, n_lift, n_field)

    xp, xt = xp_ref[:], xt_ref[:]
    h, ht = _mlp_relu_fwd_tan(lift, sp_ref[:], st_ref[:], d)

    def body(l, carry):
        h, ht = carry
        t0 = t0_ref[pl.ds(l, 1), :]
        dt = dt_ref[pl.ds(l, 1), :]
        h, ht = _interval(field, xp, xt, h, ht, t0, dt, d, n_sub, method)
        u_ref[pl.ds(l, 1), :] = _affine(wr, br, h)
        du_ref[pl.ds(l, 1), :] = _dot(wr, ht)
        return h, ht

    jax.lax.fori_loop(0, L, body, (h, ht))


def _fwd_store_kernel(n_lift: int, n_field: int, L: int, d: int,
                      n_sub: int, method: str,
                      t0_ref, dt_ref, xp_ref, xt_ref, sp_ref, st_ref,
                      *refs):
    """Forward that additionally WRITES each interval's start state
    (``hs [L, H, B]``, ``hts [L, H, d*B]``) — the custom-VJP residuals.
    Used only when the call is being differentiated; the backward kernel
    then skips its full forward recompute (measured ~0.4 ms of the
    ~0.96 ms d=5 backward) at the cost of one extra HBM write/read of the
    states (~43 MB round trip ≈ 0.1 ms at v5e bandwidth)."""
    weight_refs = refs[:-4]
    u_ref, du_ref, hs_ref, hts_ref = refs[-4:]
    ws = [r[:] for r in weight_refs]
    lift, field, (wr, br) = _split_ws(ws, n_lift, n_field)

    xp, xt = xp_ref[:], xt_ref[:]
    h, ht = _mlp_relu_fwd_tan(lift, sp_ref[:], st_ref[:], d)

    def body(l, carry):
        h, ht = carry
        hs_ref[pl.ds(l, 1)] = h[None]
        hts_ref[pl.ds(l, 1)] = ht[None]
        t0 = t0_ref[pl.ds(l, 1), :]
        dt = dt_ref[pl.ds(l, 1), :]
        h, ht = _interval(field, xp, xt, h, ht, t0, dt, d, n_sub, method)
        u_ref[pl.ds(l, 1), :] = _affine(wr, br, h)
        du_ref[pl.ds(l, 1), :] = _dot(wr, ht)
        return h, ht

    jax.lax.fori_loop(0, L, body, (h, ht))


# ---------------------------------------------------------------------------
# Tangentless forward-only kernel: u values at a path batch, no gradients.
# Serves the per-iteration fresh-sample metric forward (reference
# src/training.py:123,167 evaluates L^p against the exact solution every
# iteration) — the XLA scan forward costs ~1.1 ms per d=5 outer step
# (benchmarks/profile_d5.json u_forward_net_ms); primal-only lanes in one
# kernel cost ~0.2 ms.
# ---------------------------------------------------------------------------


def _field_fwd(ws, xp, t, h):
    z = jnp.concatenate([xp, t, h], axis=0)
    w, b = ws[0]
    a = _mm(w, z) + b
    for w, b in ws[1:-1]:
        a = _mm(w, jax.nn.relu(a)) + b
    w, b = ws[-1]
    return _mm(w, jnp.tanh(a)) + b


def _interval_p(ws_field, xp, h, t0, dt, n_sub: int, method: str):
    def f(t, hh):
        return _field_fwd(ws_field, xp, t, hh)

    for k in range(n_sub):
        h = rk_step(method, f, t0 + k * dt, dt, h)
    return h


def _fwd_only_kernel(n_lift: int, n_field: int, L: int, n_sub: int,
                     method: str, t0_ref, dt_ref, xp_ref, sp_ref, *refs):
    weight_refs, u_ref = refs[:-1], refs[-1]
    ws = [r[:] for r in weight_refs]
    lift, field, (wr, br) = _split_ws(ws, n_lift, n_field)
    xp = xp_ref[:]

    h = _mm(lift[0][0], sp_ref[:]) + lift[0][1]
    for w, b in lift[1:]:
        h = _mm(w, jax.nn.relu(h)) + b

    def body(l, h):
        t0 = t0_ref[pl.ds(l, 1), :]
        dt = dt_ref[pl.ds(l, 1), :]
        h = _interval_p(field, xp, h, t0, dt, n_sub, method)
        u_ref[pl.ds(l, 1), :] = _mm(wr, h) + br
        return h

    jax.lax.fori_loop(0, L, body, h)


@functools.lru_cache(maxsize=32)
def _build_fwd_only(n_lift: int, n_field: int, L: int, n_sub: int,
                    method: str, F: int, n_pad: int, block: int,
                    interpret: bool):
    grid = (n_pad // block,)

    def col(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def fwd(t0, dt, xp, sp, flat):
        kernel = functools.partial(_fwd_only_kernel, n_lift, n_field, L,
                                   n_sub, method)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n_pad), jnp.float32),
            grid=grid,
            in_specs=([col(L), col(L), col(F), col(1)]
                      + [full(a.shape) for a in flat]),
            out_specs=col(L),
            interpret=interpret,
        )(t0, dt, xp, sp, *flat)

    return fwd


def u_forward_fused(params, batch, problem, cfg, interpret: bool = False,
                    mesh=None, data_axis: str = "data") -> jax.Array:
    """Primal values ``u [N, L]`` only — the metric/serving forward on a
    path batch, VMEM-fused, no gradients (callers treat it as data).
    Seeds through :func:`models.xnode.path_seed_fn` — the one seeding
    definition shared with the XLA forward and the gradient kernel."""
    from xnode_wan_tpu.models.xnode import path_seed_fn, spatial_features

    xs = batch.space[:, 0, :].astype(jnp.float32)
    scale = float(cfg.u_scale_eff)
    seed = path_seed_fn(batch, problem, cfg)(xs)
    feats = spatial_features(xs, cfg.fourier_features)

    N, F = feats.shape
    L = batch.times.shape[1]
    # Size the lane block to the per-shard batch (capped at 2048): the
    # forward-only live set is tiny, so VMEM never binds here, but a
    # fixed 2048 would pad e.g. an N=4000 metric batch on an 8-device
    # mesh to 16384 lanes — 4x wasted step-loop work every iteration.
    n_shards = 1 if mesh is None else int(mesh.shape[data_axis])
    per_shard = -(-N // n_shards)
    block = min(2048, -(-per_shard // 128) * 128)
    n_pad = -(-N // (block * n_shards)) * (block * n_shards)
    n_lift, n_field = len(params["lift"]), len(params["field"])

    t0, dt = _prep_intervals(batch.times.astype(jnp.float32), batch.mask,
                             batch.t_start.astype(jnp.float32), cfg.n_sub)

    def padT(a, rows):
        a = a.astype(jnp.float32).T.reshape(rows, N)
        return jnp.pad(a, ((0, 0), (0, n_pad - N)))

    flat = tuple(_flatten_params_t(params))
    fwd = _build_fwd_only(n_lift, n_field, L, cfg.n_sub, cfg.solver, F,
                          n_pad // n_shards, block, interpret)
    args = (padT(t0, L), padT(dt, L), padT(feats, F), padT(seed[:, None], 1))
    if mesh is None:
        u_raw = fwd(*args, flat)
    else:
        from jax.sharding import PartitionSpec as P
        lane, rep = P(None, data_axis), P()

        def body(t0_, dt_, xp_, sp_, *fl):
            return fwd(t0_, dt_, xp_, sp_, fl)

        u_raw = jax.shard_map(
            body, mesh=mesh, in_specs=(lane,) * 4 + (rep,) * len(flat),
            out_specs=lane, check_vma=False)(*args, *flat)
    return u_raw[:, :N].T * scale


# ---------------------------------------------------------------------------
# Backward kernel: forward recompute (states to scratch) + reverse walk.
# ---------------------------------------------------------------------------


def _bwd_kernel(n_lift: int, n_field: int, L: int, d: int, n_sub: int,
                method: str,
                t0_ref, dt_ref, xp_ref, xt_ref, sp_ref, st_ref,
                *refs):
    """Reverse walk over the intervals consuming the START states the
    forward stored (``hs``/``hts`` residual inputs — see
    :func:`_fwd_store_kernel`; earlier rounds recomputed them here)."""
    n_w = 2 * (n_lift + n_field + 1)
    weight_refs = refs[:n_w]
    hs_ref, hts_ref = refs[n_w], refs[n_w + 1]
    ub_ref, dub_ref = refs[n_w + 2], refs[n_w + 3]
    grad_refs = refs[n_w + 4:]

    ws = [r[:] for r in weight_refs]
    lift, field, (wr, br) = _split_ws(ws, n_lift, n_field)
    xp, xt = xp_ref[:], xt_ref[:]
    sp, st = sp_ref[:], st_ref[:]
    h0 = hs_ref[pl.ds(0, 1)][0]
    ht0 = hts_ref[pl.ds(0, 1)][0]

    # --- reverse walk ------------------------------------------------------
    field_flat = [a for pair in field for a in pair]

    def interval_fn(ws_flat, h, ht, t0, dt):
        pairs = [(ws_flat[2 * i], ws_flat[2 * i + 1])
                 for i in range(len(ws_flat) // 2)]
        return _interval(pairs, xp, xt, h, ht, t0, dt, d, n_sub, method)

    zero_field = [jnp.zeros_like(a) for a in field_flat]
    wr_acc = jnp.zeros_like(wr)
    br_acc = jnp.zeros_like(br)
    hbar = jnp.zeros_like(h0)
    htbar = jnp.zeros_like(ht0)

    def bwd_body(i, carry):
        hbar, htbar, facc, wr_acc, br_acc = carry
        l = L - 1 - i
        ub = ub_ref[pl.ds(l, 1), :]          # [1, B]
        dub = dub_ref[pl.ds(l, 1), :]        # [1, d*B]
        h_l = hs_ref[pl.ds(l, 1)][0]
        ht_l = hts_ref[pl.ds(l, 1)][0]
        t0 = t0_ref[pl.ds(l, 1), :]
        dt = dt_ref[pl.ds(l, 1), :]
        # readout cotangent injection at the interval's END state: re-run
        # the interval to get that state (values only, VMEM-cheap), then
        # u_l = wr @ h_end + br, du_l = wr @ ht_end.
        (h_end, ht_end), vjp = jax.vjp(
            lambda ws, h, ht: interval_fn(ws, h, ht, t0, dt),
            field_flat, h_l, ht_l)
        wr_acc = wr_acc + _dot_t(ub, h_end) + _dot_t(dub, ht_end)
        br_acc = br_acc + _mm_narrow(
            ub, jnp.ones((ub.shape[1], 1), jnp.float32))
        hbar = hbar + _mm(wr.T, ub)
        htbar = htbar + _mm(wr.T, dub)
        fbar, hbar, htbar = vjp((hbar, htbar))
        facc = [a + g for a, g in zip(facc, fbar)]
        return hbar, htbar, facc, wr_acc, br_acc

    hbar, htbar, facc, wr_acc, br_acc = jax.lax.fori_loop(
        0, L, bwd_body, (hbar, htbar, zero_field, wr_acc, br_acc))

    # --- lift backward -----------------------------------------------------
    lift_flat = [a for pair in lift for a in pair]

    def lift_fn(ws_flat):
        pairs = [(ws_flat[2 * i], ws_flat[2 * i + 1])
                 for i in range(len(ws_flat) // 2)]
        return _mlp_relu_fwd_tan(pairs, sp, st, d)

    _, lift_vjp = jax.vjp(lift_fn, lift_flat)
    (lbar,) = lift_vjp((hbar, htbar))

    grads = lbar + facc + [wr_acc, br_acc]
    first = pl.program_id(0) == 0
    for g_ref, g in zip(grad_refs, grads):
        @pl.when(first)
        def _(g_ref=g_ref, g=g):
            g_ref[:] = g

        @pl.when(jnp.logical_not(first))
        def _(g_ref=g_ref, g=g):
            g_ref[:] = g_ref[:] + g


# ---------------------------------------------------------------------------
# JAX-side wrapper with custom VJP
# ---------------------------------------------------------------------------


def _pick_block(L: int, d: int, H: int) -> int:
    """Paths per block under a VMEM budget: the backward kernel's state
    store is ``(L+1) * H * (1+d) * B`` floats plus transient widened
    activations — keep the store under ~4 MB so Mosaic has headroom.

    The floor is 128: Pallas TPU requires lane-dim block sizes to be
    multiples of the 128-lane tile, so geometries whose footprint does
    not fit even at B=128 cannot run the full-``d`` kernel —
    :func:`fused_fits` detects those and the caller either keeps the XLA
    path (default) or, with ``fused_chunk: true``, runs the kernel in
    ``d_chunk``-tangent chunks (:func:`fused_chunk`) when the chunk
    count stays within the measured break-even (``cfg.fused_chunk_max``).
    """
    budget = 4 * 2 ** 20
    per_path = (L + 1) * H * (1 + d) * 4
    b = budget // max(per_path, 1)
    return max(128, min(1024, (b // 128) * 128))


_STAGES = {"euler": 1, "midpoint": 2, "heun": 2, "rk4": 4}


def _geom_fits(L: int, dc: int, H: int, F: int, width: int, n_field: int,
               n_sub: int, method: str, members: int = 1) -> bool:
    """Whether the backward kernel fits the ~16 MB scoped-VMEM stack at
    the minimum block size when carrying ``dc`` tangent directions.

    Mosaic allocates the backward's interval-``vjp`` residuals plus the
    explicit ``(L+1, H, B)``/``(L+1, H, dc*B)`` state stores on the scoped
    VMEM stack (16 MB limit). The block's lane width cannot go below 128
    paths (tile granularity), so at large ``dc``/widths the footprint
    exceeds the limit and the compile fails — this estimate, calibrated
    against Mosaic's reported scoped allocations on the d=50 cube and
    wide-field d=20 configs, gates those geometries off before that
    happens.

    ``members``: an ``ensemble: K`` run vmaps the kernel over members,
    which materializes the K axis inside the block and multiplies the
    scoped stack by K (measured: d=20 K=4 overflows Mosaic's 16 MB limit
    by 104 KB while d=5 K=4 fits) — so the budget scales down by K.
    """
    block = _pick_block(L, dc, H)
    lanes = block * (1 + dc)
    store = (L + 1) * H * lanes * 4
    # residual rows of one interval vjp: field-MLP layer inputs + output
    rows = (F + H + 1) + width * (n_field - 1) + H
    transient = 1.6 * _STAGES[method] * n_sub * rows * lanes * 4
    return members * (store + transient) <= 12 * 2 ** 20


def _geometry(params) -> Tuple[int, int, int]:
    H = params["lift"][-1]["w"].shape[-1]
    n_field = len(params["field"])
    width = params["field"][0]["w"].shape[-1]
    return H, n_field, width


def fused_fits(params, L: int, d: int, F: int, n_sub: int,
               method: str, members: int = 1) -> bool:
    """Whether the FULL-``d`` backward kernel fits scoped VMEM (see
    :func:`_geom_fits`); when it doesn't, :func:`fused_chunk` may still
    find a tangent-chunked geometry that does."""
    H, n_field, width = _geometry(params)
    return _geom_fits(L, d, H, F, width, n_field, n_sub, method,
                      members=members)


def fused_chunk(params, L: int, d: int, F: int, n_sub: int,
                method: str, members: int = 1):
    """Largest divisor ``dc`` of ``d`` whose kernel geometry fits scoped
    VMEM, or ``None`` if even one tangent direction per call does not.

    ``dc == d`` means the single-call kernel fits. ``dc < d`` means the
    caller should run ``d // dc`` kernel calls of ``dc`` tangent
    directions each (:func:`u_du_fused` with ``d_chunk=dc``): the primal
    is recomputed per chunk (cheap — it is one lane-block of the widened
    batch) and the parameter cotangents accumulate across chunks through
    the shared weights. Divisors only, so every call shares ONE compiled
    geometry.
    """
    H, n_field, width = _geometry(params)
    for dc in range(d, 0, -1):
        if d % dc == 0 and _geom_fits(L, dc, H, F, width, n_field,
                                      n_sub, method, members=members):
            return dc
    return None


def _flatten_params_t(params: Dict[str, Any]) -> List[jax.Array]:
    flat = []
    for group in (params["lift"], params["field"], [params["readout"]]):
        for layer in group:
            flat += [layer["w"].T.astype(jnp.float32),
                     layer["b"][:, None].astype(jnp.float32)]
    return flat


@functools.lru_cache(maxsize=32)
def _build(n_lift: int, n_field: int, L: int, d: int, n_sub: int,
           method: str, F: int, H: int, n_pad: int, block: int,
           interpret: bool):
    """Compile-cached (fwd, fwd_store, bwd) pallas_call builders for one
    geometry. ``fwd`` is the plain primal (no residuals — used when the
    call is not differentiated); ``fwd_store`` additionally emits the
    per-interval start states that ``bwd`` consumes."""
    grid = (n_pad // block,)
    db = d * block

    def col(rows, width):
        return pl.BlockSpec((rows, width), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def col3(width):
        return pl.BlockSpec((L, H, width), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def fwd(t0, dt, xp, xt, sp, st, flat):
        kernel = functools.partial(_fwd_kernel, n_lift, n_field, L, d,
                                   n_sub, method)
        in_specs = ([col(L, block), col(L, block), col(F, block),
                     col(F, db), col(1, block), col(1, db)]
                    + [full(a.shape) for a in flat])
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((L, n_pad), jnp.float32),
                       jax.ShapeDtypeStruct((L, d * n_pad), jnp.float32)),
            grid=grid,
            in_specs=in_specs,
            out_specs=(col(L, block), col(L, db)),
            interpret=interpret,
        )(t0, dt, xp, xt, sp, st, *flat)

    def fwd_store(t0, dt, xp, xt, sp, st, flat):
        kernel = functools.partial(_fwd_store_kernel, n_lift, n_field, L,
                                   d, n_sub, method)
        in_specs = ([col(L, block), col(L, block), col(F, block),
                     col(F, db), col(1, block), col(1, db)]
                    + [full(a.shape) for a in flat])
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((L, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((L, d * n_pad), jnp.float32),
                jax.ShapeDtypeStruct((L, H, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((L, H, d * n_pad), jnp.float32),
            ),
            grid=grid,
            in_specs=in_specs,
            out_specs=(col(L, block), col(L, db), col3(block), col3(db)),
            interpret=interpret,
        )(t0, dt, xp, xt, sp, st, *flat)

    def bwd(t0, dt, xp, xt, sp, st, flat, hs, hts, ub, dub):
        kernel = functools.partial(_bwd_kernel, n_lift, n_field, L, d,
                                   n_sub, method)
        in_specs = ([col(L, block), col(L, block), col(F, block),
                     col(F, db), col(1, block), col(1, db)]
                    + [full(a.shape) for a in flat]
                    + [col3(block), col3(db), col(L, block), col(L, db)])
        return pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(a.shape, jnp.float32)
                            for a in flat),
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(full(a.shape) for a in flat),
            interpret=interpret,
        )(t0, dt, xp, xt, sp, st, *flat, hs, hts, ub, dub)

    return fwd, fwd_store, bwd


def _prep_intervals(times: jax.Array, mask: jax.Array, t_start: jax.Array,
                    n_sub: int):
    """Per-interval (start time, substep) with masking-by-zero-width.

    Reproduces ``ops/integrate.py``'s carry semantics: each valid sample
    integrates from the previous VALID sample time (or ``t_start``);
    invalid samples get ``dt = 0`` (exact identity, exact zero gradient).
    """
    neg = jnp.asarray(-jnp.inf, times.dtype)
    prev = jnp.concatenate(
        [t_start[:, None], jnp.where(mask, times, neg)[:, :-1]], axis=1)
    t0 = jnp.maximum(jax.lax.cummax(prev, axis=1), t_start[:, None])
    dt = jnp.where(mask, jnp.maximum(times - t0, 0.0), 0.0) / n_sub
    return t0, dt


def u_du_fused(params, feats: jax.Array, dfeats: jax.Array,
               seed: jax.Array, dseed: jax.Array, times: jax.Array,
               mask: jax.Array, t_start: jax.Array, *, n_sub: int,
               method: str, scale: float, interpret: bool = False,
               d_chunk=None, mesh=None, data_axis: str = "data"
               ) -> Tuple[jax.Array, jax.Array]:
    """Fused ``(u [N, L], grad_x u [N, L, d])`` with parameter VJP.

    ``feats [N, F]``: per-path field spatial input (raw coords or coords +
    Fourier bank); ``dfeats [N, d, F]``: its jacobian wrt the d raw
    coordinates. ``seed [N]``, ``dseed [N, d]``: the (h/g) seed value and
    its spatial gradient, already divided by ``scale``. The output is
    multiplied by ``scale`` (models/xnode.py ``u_scale`` contract).

    ``d_chunk``: carry only this many tangent directions per kernel call
    (must divide ``d``; see :func:`fused_chunk`) — ``d // d_chunk``
    sequential calls whose parameter cotangents accumulate through the
    shared weights. ``u`` is taken from the first call (the chunks'
    primals are the same function, so its cotangent must flow exactly
    once); the geometry is identical across calls, so all share one
    compile.

    ``mesh``: run the kernel under ``jax.shard_map`` with the path/lane
    axis sharded over ``mesh.shape[data_axis]`` devices — each device
    executes the identical per-block kernel on its local paths
    (the multi-chip fast path; replaces the round-3 ``mesh is None``
    fallback to XLA). Weights are replicated in; the backward ``psum``s
    the parameter cotangents over the data axis. Mesh axes other than
    ``data_axis`` see replicated compute (correct, redundant) — callers
    gate those layouts (``ops/weak_form.py``).
    """
    d_all = dfeats.shape[1]
    dc = d_all if not d_chunk else int(d_chunk)
    if dc != d_all:
        # A stale/wrong chunk size should fail loudly, not silently run a
        # different (possibly full-d, possibly VMEM-overflowing) geometry.
        if dc > d_all or dc < 1 or d_all % dc != 0:
            raise ValueError(f"d_chunk={dc} must divide d={d_all}")
        u = None
        dus = []
        for lo in range(0, d_all, dc):
            u_c, du_c = u_du_fused(
                params, feats, dfeats[:, lo:lo + dc], seed,
                dseed[:, lo:lo + dc], times, mask, t_start, n_sub=n_sub,
                method=method, scale=scale, interpret=interpret,
                mesh=mesh, data_axis=data_axis)
            if u is None:
                u = u_c
            dus.append(du_c)
        return u, jnp.concatenate(dus, axis=-1)

    N, F = feats.shape
    L = times.shape[1]
    d = dfeats.shape[1]
    H = params["lift"][-1]["w"].shape[-1]
    block = _pick_block(L, d, H)
    n_shards = 1 if mesh is None else int(mesh.shape[data_axis])
    # Every device must receive a whole number of kernel blocks.
    n_pad = -(-N // (block * n_shards)) * (block * n_shards)
    n_lift, n_field = len(params["lift"]), len(params["field"])

    t0, dt = _prep_intervals(times.astype(jnp.float32),
                             mask, t_start.astype(jnp.float32), n_sub)

    def padT(a, rows):  # [N, rows] -> [rows, n_pad]
        a = a.astype(jnp.float32).T.reshape(rows, N)
        return jnp.pad(a, ((0, 0), (0, n_pad - N)))

    t0T, dtT = padT(t0, L), padT(dt, L)
    xpT = padT(feats, F)
    # tangents lane-concatenated: [F, d*n_pad] with block-local ordering
    # (block i covers lanes [i*d*B, (i+1)*d*B), grouped tangent-major).
    xtT = _tangent_lanes(dfeats.astype(jnp.float32), block, n_pad)
    spT = padT(seed[:, None], 1)
    stT = _tangent_lanes(dseed.astype(jnp.float32)[:, :, None], block, n_pad)

    flat = tuple(_flatten_params_t(params))
    meta = (n_lift, n_field, L, d, n_sub, method, F, H, n_pad, block,
            interpret)
    if mesh is None:
        u_raw, du_raw = _fused_core(flat, t0T, dtT, xpT, xtT, spT, stT,
                                    meta)
    else:
        u_raw, du_raw = _fused_core_sharded(
            flat, t0T, dtT, xpT, xtT, spT, stT, meta + (mesh, data_axis))

    u = u_raw[:, :N].T * scale                                    # [N, L]
    du = _tangent_unlanes(du_raw, block, d)[:, :, :N] * scale     # [L, d, N]
    return u, jnp.moveaxis(du, 2, 0)                              # [N, L, d]


def fused_from_batch(params, batch, problem, cfg, interpret: bool = False,
                     d_chunk=None, mesh=None, data_axis: str = "data"
                     ) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ``ops/weak_form.py::u_with_spatial_grad`` on the fused
    kernel: computes the seed (problem ``h``/``g`` data — user code, stays
    in JAX) and the feature/seed spatial tangents, then calls the kernel.

    Seeds through ``models/xnode.py::path_seed_fn`` — the one seeding
    definition shared with the XLA forward (reference
    ``src/model.py:92-96``) — jvp'd here for the spatial tangents.
    """
    from xnode_wan_tpu.models.xnode import path_seed_fn, spatial_features

    xs = batch.space[:, 0, :].astype(jnp.float32)
    d = xs.shape[-1]
    scale = float(cfg.u_scale_eff)
    seed_of = path_seed_fn(batch, problem, cfg)

    def feats_of(xs_):
        return spatial_features(xs_, cfg.fourier_features)

    basis = jnp.eye(d, dtype=xs.dtype)

    def one(e):
        tan = jnp.broadcast_to(e, xs.shape)
        _, ds = jax.jvp(seed_of, (xs,), (tan,))
        _, df = jax.jvp(feats_of, (xs,), (tan,))
        return ds, df

    dseed, dfeats = jax.vmap(one)(basis)          # [d, N], [d, N, F]
    return u_du_fused(
        params, feats_of(xs), jnp.moveaxis(dfeats, 0, 1),
        seed_of(xs), dseed.T, batch.times, batch.mask, batch.t_start,
        n_sub=cfg.n_sub, method=cfg.solver, scale=scale,
        interpret=interpret, d_chunk=d_chunk, mesh=mesh,
        data_axis=data_axis)


def _tangent_lanes(a: jax.Array, block: int, n_pad: int) -> jax.Array:
    """``[N, d, F]`` -> ``[F, d*n_pad]`` with per-block tangent grouping:
    lanes of block i are ``[tan_1 B | ... | tan_d B]`` for paths of that
    block (matches the kernel's ``_rep`` pairing)."""
    N, d, F = a.shape
    a = jnp.pad(a, ((0, n_pad - N), (0, 0), (0, 0)))
    nb = n_pad // block
    # [n_pad, d, F] -> [nb, block, d, F] -> [F, nb, d, block] -> [F, nb*d*block]
    a = a.reshape(nb, block, d, F).transpose(3, 0, 2, 1)
    return a.reshape(F, nb * d * block)


def _tangent_unlanes(a: jax.Array, block: int, d: int) -> jax.Array:
    """``[L, d*n_pad]`` (block-grouped lanes) -> ``[L, d, n_pad]``."""
    L = a.shape[0]
    nb = a.shape[1] // (d * block)
    a = a.reshape(L, nb, d, block).transpose(0, 2, 1, 3)
    return a.reshape(L, d, nb * block)


@functools.lru_cache(maxsize=32)
def _build_sharded(meta):
    """(fwd, fwd_store, bwd) builders running the kernel under
    ``jax.shard_map``.

    ``meta`` = the :func:`_build` geometry tuple + ``(mesh, data_axis)``.
    Lane-dimension arrays (including the stored state residuals) shard
    over ``data_axis`` (each device gets a whole number of kernel
    blocks — the caller padded for that); weights go in replicated. The
    backward ``psum``s each device's partial parameter cotangents over
    the data axis, so the returned grads are replicated — exactly what
    the optimizer's replicated params expect. Mesh axes other than
    ``data_axis`` (e.g. ``tangent``) replicate the compute: correct,
    redundant; callers gate those layouts.
    """
    from jax.sharding import PartitionSpec as P

    (n_lift, n_field, L, d, n_sub, method, F, H, n_pad, block,
     interp, mesh, axis) = meta
    n_shards = int(mesh.shape[axis])
    local_meta = (n_lift, n_field, L, d, n_sub, method, F, H,
                  n_pad // n_shards, block, interp)
    fwd_local, fwd_store_local, bwd_local = _build(*local_meta)
    lane = P(None, axis)
    lane3 = P(None, None, axis)
    rep = P()

    def fwd(t0T, dtT, xpT, xtT, spT, stT, flat):
        def body(t0, dt, xp, xt, sp, st, *fl):
            return fwd_local(t0, dt, xp, xt, sp, st, fl)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(lane,) * 6 + (rep,) * len(flat),
            out_specs=(lane, lane), check_vma=False,
        )(t0T, dtT, xpT, xtT, spT, stT, *flat)

    def fwd_store(t0T, dtT, xpT, xtT, spT, stT, flat):
        def body(t0, dt, xp, xt, sp, st, *fl):
            return fwd_store_local(t0, dt, xp, xt, sp, st, fl)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(lane,) * 6 + (rep,) * len(flat),
            out_specs=(lane, lane, lane3, lane3), check_vma=False,
        )(t0T, dtT, xpT, xtT, spT, stT, *flat)

    def bwd(t0T, dtT, xpT, xtT, spT, stT, flat, hs, hts, ub, dub):
        def body(t0, dt, xp, xt, sp, st, hs, hts, ub, dub, *fl):
            grads = bwd_local(t0, dt, xp, xt, sp, st, fl, hs, hts, ub, dub)
            return tuple(jax.lax.psum(g, axis) for g in grads)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(lane,) * 6 + (lane3, lane3, lane, lane)
            + (rep,) * len(flat),
            out_specs=(rep,) * len(flat), check_vma=False,
        )(t0T, dtT, xpT, xtT, spT, stT, hs, hts, ub, dub, *flat)

    return fwd, fwd_store, bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_core_sharded(flat, t0T, dtT, xpT, xtT, spT, stT, meta):
    return _build_sharded(meta)[0](t0T, dtT, xpT, xtT, spT, stT, flat)


def _fused_core_sharded_fwd(flat, t0T, dtT, xpT, xtT, spT, stT, meta):
    u, du, hs, hts = _build_sharded(meta)[1](
        t0T, dtT, xpT, xtT, spT, stT, flat)
    return (u, du), (flat, t0T, dtT, xpT, xtT, spT, stT, hs, hts)


def _fused_core_sharded_bwd(meta, res, cots):
    flat, t0T, dtT, xpT, xtT, spT, stT, hs, hts = res
    ub, dub = cots
    grads = _build_sharded(meta)[2](
        t0T, dtT, xpT, xtT, spT, stT, flat, hs, hts,
        ub.astype(jnp.float32), dub.astype(jnp.float32))
    zeros = tuple(jnp.zeros_like(a)
                  for a in (t0T, dtT, xpT, xtT, spT, stT))
    return (tuple(grads),) + zeros


_fused_core_sharded.defvjp(_fused_core_sharded_fwd, _fused_core_sharded_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _fused_core(flat, t0T, dtT, xpT, xtT, spT, stT, meta):
    return _build(*meta)[0](t0T, dtT, xpT, xtT, spT, stT, flat)


def _fused_core_fwd(flat, t0T, dtT, xpT, xtT, spT, stT, meta):
    # Differentiated call: run the state-storing forward so the backward
    # kernel skips its recompute (residuals ride HBM instead).
    u, du, hs, hts = _build(*meta)[1](t0T, dtT, xpT, xtT, spT, stT, flat)
    return (u, du), (flat, t0T, dtT, xpT, xtT, spT, stT, hs, hts)


def _fused_core_bwd(meta, res, cots):
    flat, t0T, dtT, xpT, xtT, spT, stT, hs, hts = res
    ub, dub = cots
    grads = _build(*meta)[2](t0T, dtT, xpT, xtT, spT, stT, flat, hs, hts,
                             ub.astype(jnp.float32),
                             dub.astype(jnp.float32))
    zeros = tuple(jnp.zeros_like(a)
                  for a in (t0T, dtT, xpT, xtT, spT, stT))
    return (tuple(grads),) + zeros


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)
