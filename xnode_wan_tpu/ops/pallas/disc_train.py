"""Pallas TPU kernel: fused discriminator forward + input-gradients with a
custom VJP — the adversary's training hot path.

The weak-form loss needs the test function's value ``v(p)`` and its
pointwise space-time gradient ``(d_t v, grad_x v)`` at every sample point,
plus — for the ``n2`` adversarial Adam steps — the gradient of everything
built from them w.r.t. the discriminator parameters (reference v-loop
``src/training.py:151-162``; ``phi = v*w`` input-gradients at
``src/loss.py:60-63``). The XLA path (``ops/weak_form.py::v_phi_and_grads``)
is a ``vmap(value_and_grad)``: correct, but ~40 tiny HBM-round-tripping ops
per evaluation and reverse-over-reverse for the parameter gradient —
measured ~1.4 ms of the 7.4 ms d=5 outer step (DESIGN.md component budget).

Design: **reverse-mode inside the kernel**. ``v`` is scalar per point, so
ONE backward sweep (a matmul chain mirroring the forward, using the stored
pre-activations) yields the gradient w.r.t. ALL ``F`` input features at
~2x forward cost — independent of the input dimension. (A first cut
carried ``C = d+1`` forward-mode tangent lanes like the XNODE training
kernel; measured SLOWER than XLA — 9.0 vs 7.5 ms/outer step — because the
``(1+C)``-widened lanes multiply every matmul by 7 where reverse-mode pays
2. The XNODE kernel needs forward tangents for its *sequential scan*; a
shallow pointwise MLP does not.) Everything is VMEM-resident per block of
points: one HBM read of the features, one write of ``(v, grad_F v)``.

The kernel differentiates w.r.t. the *feature* inputs; the pullback to raw
``(t, x)`` coordinates (identity without Fourier banks, the bank jacobian
with them) is one ``jax.vjp`` of the feature map per point on the JAX
side — which also avoids ever materializing the ``[M, C, F]`` jacobian.

The custom-VJP backward kernel re-runs the joint (value + reverse sweep)
computation under ``jax.vjp`` w.r.t. the weights, so the parameter
cotangents include the exact second-order terms (cotangents on ``grad v``
flowing through the reverse sweep) that the XLA path gets from
reverse-over-reverse. Weight tying (the reference's shared hidden layer,
``src/model.py:37-39``) falls out for free: the value function reuses one
``(w, b)`` pair per depth and ``jax.vjp`` accumulates across uses.

Like the training kernel, the public entry :func:`v_dv_fused` is a
drop-in for the contraction the XLA path produces (``v [M]``,
``dv [M, C]``) with parameter-only cotangents, and runs per-device under
``jax.shard_map`` when a mesh is given (lanes shard over the data axis,
weights replicate, parameter cotangents ``psum``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xnode_wan_tpu.ops.pallas.xnode_train import _affine, _dot


def _disc_fwd_revgrad(ws, z, v_layers: int, tied: bool):
    """Value + input-gradient of the discriminator at features ``z [F, B]``.

    Forward (models/discriminator.py::apply_discriminator):
    ``inp -> [relu, hidden]*v_layers -> tanh -> out``; then one reverse
    sweep through the stored pre-activations gives ``d v / d z [F, B]``.
    Written on values with the custom-VJP matmul forms (`_affine`/`_dot`)
    so the backward kernel's ``jax.vjp`` of this function lowers to
    standard MXU matmuls (see xnode_train.py on Mosaic accumulator
    fusion).
    """
    w, b = ws[0]
    a = _affine(w, b, z)
    pre = []
    for i in range(v_layers):
        w, b = ws[1] if tied else ws[1 + i]
        pre.append(a)
        a = _affine(w, b, jax.nn.relu(a))
    y = jnp.tanh(a)
    wo, bo = ws[-1]
    v = _affine(wo, bo, y)                       # [1, B]

    # reverse sweep: dv/dy = wo^T, through tanh', each hidden layer, relu'
    g = jnp.transpose(wo) * (1.0 - y * y)        # [H, B]
    for i in range(v_layers - 1, -1, -1):
        w, _ = ws[1] if tied else ws[1 + i]
        g = _dot(jnp.transpose(w), g)
        g = jnp.where(pre[i] > 0, g, 0.0)
    w, _ = ws[0]
    gin = _dot(jnp.transpose(w), g)              # [F, B]
    return v, gin


def _pairs(flat):
    return [(flat[2 * i], flat[2 * i + 1]) for i in range(len(flat) // 2)]


def _v_fwd_kernel(v_layers: int, tied: bool, xp_ref, *refs):
    weight_refs, v_ref, g_ref = refs[:-2], refs[-2], refs[-1]
    ws = _pairs([r[:] for r in weight_refs])
    v, gin = _disc_fwd_revgrad(ws, xp_ref[:], v_layers, tied)
    v_ref[:] = v
    g_ref[:] = gin


def _v_bwd_kernel(v_layers: int, tied: bool, xp_ref, *refs):
    # refs = weights (n_w) + (vb, gb) + grads (n_w)
    n_w = (len(refs) - 2) // 2
    weight_refs = refs[:n_w]
    vb_ref, gb_ref = refs[n_w], refs[n_w + 1]
    grad_refs = refs[n_w + 2:]
    flat = [r[:] for r in weight_refs]
    xp = xp_ref[:]

    def f(ws_flat):
        return _disc_fwd_revgrad(_pairs(ws_flat), xp, v_layers, tied)

    _, vjp = jax.vjp(f, flat)
    (grads,) = vjp((vb_ref[:], gb_ref[:]))

    first = pl.program_id(0) == 0
    for g_ref, g in zip(grad_refs, grads):
        @pl.when(first)
        def _(g_ref=g_ref, g=g):
            g_ref[:] = g

        @pl.when(jnp.logical_not(first))
        def _(g_ref=g_ref, g=g):
            g_ref[:] = g_ref[:] + g


def _v_pick_block(F: int, H: int, v_layers: int) -> int:
    """Points per block under a VMEM budget: the backward's ``jax.vjp``
    residuals are ~the forward+reverse activation rows, twice over."""
    rows = F + H * (2 * v_layers + 4) + 2
    per_point = rows * 4 * 2  # 2x headroom for vjp transients
    budget = 8 * 2 ** 20
    b = budget // max(per_point, 1)
    return max(128, min(4096, (b // 128) * 128))


def v_fused_fits(params, c: int, v_layers: int, tied: bool) -> bool:
    """Whether the backward kernel fits scoped VMEM at the 128-point
    minimum block (mirrors xnode_train's gate; fails closed to XLA).
    ``c`` is accepted for interface stability (reverse-mode cost is
    independent of the tangent count)."""
    del c
    H = params["out"]["w"].shape[0]
    F = params["inp"]["w"].shape[0]
    rows = F + H * (2 * v_layers + 4) + 2
    return rows * 128 * 4 * 2 <= 12 * 2 ** 20


def _flatten_disc_t(params, v_layers: int, tied: bool):
    layers = [params["inp"]]
    layers += [params["hidden"]] if tied else list(params["hidden"])
    layers += [params["out"]]
    flat = []
    for layer in layers:
        flat += [layer["w"].T.astype(jnp.float32),
                 layer["b"][:, None].astype(jnp.float32)]
    return flat


@functools.lru_cache(maxsize=32)
def _v_build(v_layers: int, tied: bool, F: int, m_pad: int,
             block: int, interpret: bool):
    grid = (m_pad // block,)

    def col(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def fwd(xp, flat):
        kernel = functools.partial(_v_fwd_kernel, v_layers, tied)
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
                       jax.ShapeDtypeStruct((F, m_pad), jnp.float32)),
            grid=grid,
            in_specs=[col(F)] + [full(a.shape) for a in flat],
            out_specs=(col(1), col(F)),
            interpret=interpret,
        )(xp, *flat)

    def bwd(xp, flat, vb, gb):
        kernel = functools.partial(_v_bwd_kernel, v_layers, tied)
        return pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(a.shape, jnp.float32)
                            for a in flat),
            grid=grid,
            in_specs=([col(F)] + [full(a.shape) for a in flat]
                      + [col(1), col(F)]),
            out_specs=tuple(full(a.shape) for a in flat),
            interpret=interpret,
        )(xp, *flat, vb, gb)

    return fwd, bwd


@functools.lru_cache(maxsize=32)
def _v_build_sharded(meta):
    """shard_map wrappers around :func:`_v_build` (same scheme as
    ``xnode_train._build_sharded``: lanes shard over the data axis,
    weights replicate, backward psums the parameter cotangents)."""
    from jax.sharding import PartitionSpec as P

    (v_layers, tied, F, m_pad, block, interp, mesh, axis) = meta
    n_shards = int(mesh.shape[axis])
    fwd_local, bwd_local = _v_build(v_layers, tied, F,
                                    m_pad // n_shards, block, interp)
    lane = P(None, axis)
    rep = P()

    def fwd(xp, flat):
        def body(xp, *fl):
            return fwd_local(xp, fl)

        return jax.shard_map(
            body, mesh=mesh, in_specs=(lane,) + (rep,) * len(flat),
            out_specs=(lane, lane), check_vma=False)(xp, *flat)

    def bwd(xp, flat, vb, gb):
        def body(xp, vb, gb, *fl):
            grads = bwd_local(xp, fl, vb, gb)
            return tuple(jax.lax.psum(g, axis) for g in grads)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(lane, lane, lane) + (rep,) * len(flat),
            out_specs=(rep,) * len(flat), check_vma=False,
        )(xp, vb, gb, *flat)

    return fwd, bwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _v_core(flat, xp, meta):
    if len(meta) > 6:
        return _v_build_sharded(meta)[0](xp, flat)
    return _v_build(*meta)[0](xp, flat)


def _v_core_fwd(flat, xp, meta):
    return _v_core(flat, xp, meta), (flat, xp)


def _v_core_bwd(meta, res, cots):
    flat, xp = res
    vb, gb = cots
    build = _v_build_sharded(meta) if len(meta) > 6 else _v_build(*meta)
    grads = build[1](xp, flat, vb.astype(jnp.float32),
                     gb.astype(jnp.float32))
    return (tuple(grads), jnp.zeros_like(xp))


_v_core.defvjp(_v_core_fwd, _v_core_bwd)


def v_dv_fused(params, pts: jax.Array, *, v_layers: int, tied: bool,
               n_freq: int = 0, interpret: bool = False, mesh=None,
               data_axis: str = "data") -> Tuple[jax.Array, jax.Array]:
    """Fused ``(v [M], dv [M, C])`` — discriminator values and pointwise
    space-time gradients at ``pts [M, C]`` (C = d+1, time at channel 0) —
    with a parameter-only custom VJP.

    Drop-in for the ``(v, grad v)`` pair ``ops/weak_form.py`` assembles
    ``phi = v*w`` and ``grad phi = w grad v + v grad w`` from (the cutoff
    ``w`` and its gradient are sample data, computed in JAX). ``n_freq``
    applies the ``v_fourier_features`` bank on the spatial channels; the
    kernel differentiates w.r.t. the bank *features* and the pullback to
    raw coordinates is one feature-map ``jax.vjp`` per point here (never
    materializing the ``[M, C, F]`` jacobian).
    """
    M, c = pts.shape
    pts = pts.astype(jnp.float32)

    def feats_of(p):
        if n_freq == 0:
            return p
        from xnode_wan_tpu.models.xnode import spatial_features
        return jnp.concatenate(
            [p[..., :1], spatial_features(p[..., 1:], n_freq)], axis=-1)

    feats = feats_of(pts)                         # [M, F]
    F = feats.shape[-1]
    H = params["out"]["w"].shape[0]
    block = _v_pick_block(F, H, v_layers)
    n_shards = 1 if mesh is None else int(mesh.shape[data_axis])
    m_pad = -(-M // (block * n_shards)) * (block * n_shards)
    xp = jnp.pad(feats.T, ((0, 0), (0, m_pad - M)))

    flat = tuple(_flatten_disc_t(params, v_layers, tied))
    meta = (v_layers, tied, F, m_pad, block, interpret)
    if mesh is not None:
        meta = meta + (mesh, data_axis)
    v_raw, g_raw = _v_core(flat, xp, meta)

    v = v_raw[0, :M]
    g_feats = g_raw[:, :M].T                      # [M, F]
    if n_freq == 0:
        return v, g_feats
    # pullback through the feature map: dv = J_feats(p)^T g_feats, one
    # per-point vjp (linear in g_feats, so the solver's parameter
    # gradient flows through it exactly)
    dv = jax.vmap(lambda p, g: jax.vjp(feats_of, p)[1](g)[0])(pts, g_feats)
    return v, dv
