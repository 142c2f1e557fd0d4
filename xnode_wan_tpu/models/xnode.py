"""XNODE primal network: a neural ODE integrated along each sample path,
seeded with the PDE's known initial/boundary data.

Reference: ``src/model.py:54-156`` —

* ``initial_layers``: scalar -> hidden lift MLP
  (``Linear(1,H), ReLU, Linear(H,H), ReLU, Linear(H,H)``, ``:78``),
* ``_ODEField``: the field ``F`` with input ``(x, t, h)``
  (``Linear(H+d+1, Hh), [ReLU, Linear]*(layers-1), Tanh, Linear(Hh, H)``,
  ``:115-141``; input ordering from ``_F.forward``, ``:153-156``),
* ``final_linear``: hidden -> scalar readout (``:85``),
* seeding: ``h(x)`` when the path starts at ``T0``, else ``g`` at the path's
  boundary-entry point (``:95-96`` — the "X" in XNODE).

The reference's three odeint variants (shared grid / index-select /
per-group Python loop, ``:103-106``) and its single-point-at-``T0`` shortcut
(``:89-91``) all collapse into the one masked scan of
``ops/integrate.py`` — a zero-width first interval reproduces the shortcut
exactly (``dt = 0`` leaves the lifted seed untouched).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.models.layers import linear, linear_init, mlp_init
from xnode_wan_tpu.ops.integrate import (ADAPTIVE_METHODS, integrate,
                                         integrate_adaptive)
from xnode_wan_tpu.ops.sampling import PathBatch


def _feature_dim(cfg: SolverConfig) -> int:
    """ODE-field spatial-input width: d raw coords + optional Fourier bank."""
    return cfg.dim * (1 + 2 * cfg.fourier_features)


def spatial_features(x: jax.Array, n_freq: int) -> jax.Array:
    """``[..., d] -> [..., d(1+2K)]``: raw coords plus ``sin/cos(k pi/2 x)``.

    Base frequency ``pi/2`` matches the shipped problems' spectra
    (reference ``configs/Ex4_3_funcs.py:6-10`` product of
    ``sin(pi/2 x + phase)``); higher harmonics at integer multiples.
    """
    if n_freq == 0:
        return x
    k = jnp.arange(1, n_freq + 1, dtype=x.dtype) * (jnp.pi / 2)
    phases = x[..., None] * k                       # [..., d, K]
    feats = jnp.concatenate([jnp.sin(phases), jnp.cos(phases)], axis=-1)
    return jnp.concatenate([x, feats.reshape(*x.shape[:-1], -1)], axis=-1)


def init_xnode(key: jax.Array, cfg: SolverConfig) -> Dict[str, Any]:
    k_lift, k_field, k_out = jax.random.split(key, 3)
    h, hh = cfg.u_hidden_dim, cfg.u_hidden_hidden_dim
    dt = jnp.float64 if cfg.x64 else jnp.float32
    field_dims = [h + _feature_dim(cfg) + 1] + [hh] * cfg.u_layers + [h]
    return {
        "lift": mlp_init(k_lift, [1, h, h, h], dtype=dt),
        "field": mlp_init(k_field, field_dims, dtype=dt),
        "readout": linear_init(k_out, h, 1, dtype=dt),
    }


def lift_apply(params: Dict[str, Any], seed: jax.Array) -> jax.Array:
    """Scalar seed ``[..., 1]`` -> hidden state ``[..., H]``."""
    layers = params["lift"]
    z = linear(layers[0], seed)
    for layer in layers[1:]:
        z = linear(layer, jax.nn.relu(z))
    return z


def field_apply(params: Dict[str, Any], x: jax.Array, t: jax.Array,
                h: jax.Array) -> jax.Array:
    """ODE field ``F(x, t, h) -> dh/dt``; ``x [N,d], t [N], h [N,H]``."""
    layers = params["field"]
    z = jnp.concatenate([x, t[:, None], h], axis=-1)
    z = linear(layers[0], z)
    for layer in layers[1:-1]:
        z = linear(layer, jax.nn.relu(z))
    return linear(layers[-1], jnp.tanh(z))


def path_seed_fn(batch: PathBatch, problem, cfg: SolverConfig):
    """The reference initial-value seeding, single-sourced.

    Returns ``seed_of(xs) -> [N]``: u's (u_scale-normalized) starting
    value per path — ``h`` at the path's first sample time where it
    begins at T0, ``g`` at ``t_start`` where it enters through the moving
    boundary (reference ``src/model.py:92-96``). Exposed as a function of
    the frozen spatial coords ``xs`` so the fused training kernel can
    ``jvp`` it for spatial tangents; the XLA forward (``apply_xnode``)
    and the fused metric/serving forward call it directly. Three
    consumers, ONE definition — a seeding fix cannot miss a backend.
    Computes in ``xs.dtype`` (f32 kernels, f64 parity runs).
    """
    def seed_of(xs):
        first_pts = jnp.concatenate(
            [batch.times[:, :1].astype(xs.dtype), xs], axis=-1)
        entry_pts = jnp.concatenate(
            [batch.t_start.astype(xs.dtype)[:, None], xs], axis=-1)
        scale = jnp.asarray(cfg.u_scale_eff, xs.dtype)
        return jnp.where(batch.seed_from_h, problem.h(first_pts),
                         problem.g(entry_pts)) / scale
    return seed_of


def apply_xnode(params: Dict[str, Any], batch: PathBatch, problem,
                cfg: SolverConfig) -> jax.Array:
    """Evaluate u at every sample point of ``batch`` -> ``u [N, L]``.

    The path's spatial coords are frozen at its first point
    (reference ``src/model.py:99``: ``_F(ODE_rhs, inputs[:, 0, 1:])``).
    """
    xs = batch.space[:, 0, :]                       # [N, d]
    scale = jnp.asarray(cfg.u_scale_eff, xs.dtype)
    seed = path_seed_fn(batch, problem, cfg)(xs)[:, None]
    h0 = lift_apply(params, seed)

    # x is frozen along each path, so the (optional) Fourier bank is
    # computed once per path, not per ODE step.
    xs_f = spatial_features(xs, cfg.fourier_features)

    def field(t, h):
        return field_apply(params, xs_f, t, h)

    if cfg.solver in ADAPTIVE_METHODS:
        # Adaptive embedded RK (dopri5/bosh3/adaptive_heun) — the
        # torchdiffeq method surface the reference passes through
        # (src/model.py:103-106).
        hs = integrate_adaptive(field, h0, batch.times, batch.t_start,
                                batch.mask, rtol=cfg.ode_rtol,
                                atol=cfg.ode_atol,
                                max_steps=cfg.ode_max_steps,
                                remat=cfg.adjoint or cfg.remat_scan,
                                strict=cfg.ode_strict,
                                method=cfg.solver)
    else:
        hs = integrate(field, h0, batch.times, batch.t_start, batch.mask,
                       n_sub=cfg.n_sub, method=cfg.solver,
                       remat=cfg.adjoint or cfg.remat_scan,
                       unroll=cfg.scan_unroll)
    return linear(params["readout"], hs)[..., 0] * scale   # [N, L]


def apply_xnode_adjoint(params: Dict[str, Any], batch: PathBatch, problem,
                        cfg: SolverConfig) -> jax.Array:
    """:func:`apply_xnode` with the **continuous-adjoint** backward pass.

    The TPU-native ``odeint_adjoint`` (reference ``src/model.py:8,103``):
    reverse-mode gradients w.r.t. ``params`` integrate the adjoint ODE
    backward in time (``ops/adjoint.py``) instead of differentiating
    through the scan — O(1) activation memory in the substep count, at
    the cost of gradients exact only up to discretization error.

    Scope: reverse-mode-only consumers (e.g. a plain supervised/collocation
    loss on u, or research use). The shipped weak-form training objective
    needs *forward-mode* spatial tangents through the integrator, which a
    ``jax.custom_vjp`` function cannot provide (JAX disallows ``jvp`` of
    ``custom_vjp``) — so ``adjoint: true`` in the solver config maps to
    ``jax.checkpoint`` remat, the memory-equivalent that composes with
    both AD modes (measured A/B: benchmarks/ab_adjoint.json; decision:
    docs/DESIGN.md).
    """
    if cfg.solver in ADAPTIVE_METHODS or cfg.solver in ("explicit_adams",
                                                        "fixed_adams"):
        raise ValueError(
            "continuous adjoint supports the fixed-step RK methods "
            f"(euler|midpoint|heun|rk4), not {cfg.solver!r}")
    from xnode_wan_tpu.ops.adjoint import make_adjoint_integrator

    xs = batch.space[:, 0, :]
    scale = jnp.asarray(cfg.u_scale_eff, xs.dtype)
    seed = path_seed_fn(batch, problem, cfg)(xs)[:, None]
    h0 = lift_apply(params, seed)
    xs_f = spatial_features(xs, cfg.fourier_features)

    def field_fn(field_params, xf, t, h):
        return field_apply({"field": field_params}, xf, t, h)

    run = make_adjoint_integrator(field_fn, cfg.n_sub, cfg.solver)
    hs = run(params["field"], xs_f, h0, batch.times,
             jnp.asarray(batch.t_start, h0.dtype), batch.mask)
    return linear(params["readout"], hs)[..., 0] * scale   # [N, L]


def evaluate_points(params: Dict[str, Any], pts: jax.Array, problem,
                    cfg: SolverConfig, k_steps: int | None = None,
                    domain=None, mesh=None) -> jax.Array:
    """Evaluate u at arbitrary space-time points ``pts [M, C]``.

    Each point becomes a fresh path of ``k_steps`` uniform intervals,
    integrated from its *domain-aware origin*: from ``T0`` with the
    ``h``-seed when the point's constant-x path stays inside, else from
    its boundary-entry time with the ``g``-seed there — the reference's
    direct-point-eval recipe (``README.md:32-35``, ``src/model.py:92-96``,
    ``bound_pad`` at ``src/dataset.py:127-152``). Pass ``domain`` for
    moving domains (hourglass ascending-branch points need the g-seed);
    without it the from-``T0`` h-seed is used everywhere (exact for the
    hypercube and cone). Used by contour plots and ad-hoc inference.

    ``mesh``: data-parallel serving — the point axis shards over
    ``cfg.data_axis`` (evaluation is pointwise, so there are no
    collectives and throughput scales linearly). The fused kernel runs
    per shard under ``jax.shard_map``; the XLA scan path gets a sharding
    constraint and GSPMD partitions it. The reference has no serving
    parallelism at all (``proj`` evaluates its grid on one device).
    """
    if k_steps is None:
        k_steps = max(cfg.min_steps, cfg.N_t)
    if mesh is not None and (
            cfg.data_axis not in mesh.axis_names
            or any(s > 1 for ax, s in mesh.shape.items()
                   if ax != cfg.data_axis)):
        # Serving is a pure map with replicated weights, so any training
        # mesh layout (data x tangent, member x data, member-only)
        # collapses to a flat data mesh over the SAME devices: every
        # device serves a point shard, instead of the extra axes silently
        # replicating compute (the drift species fused_gate excludes for
        # training) or a data-axis-less mesh dropping parallelism.
        import numpy as _np
        from jax.sharding import Mesh
        mesh = Mesh(_np.asarray(mesh.devices).reshape(-1), (cfg.data_axis,))
    if domain is not None and hasattr(domain, "entry"):
        t_entry, seed_from_h = domain.entry(pts)
    else:
        t_entry = jnp.full((pts.shape[0],), cfg.T0, dtype=pts.dtype)
        seed_from_h = jnp.ones((pts.shape[0],), dtype=bool)
    scale = cfg.u_scale_eff
    # Fused serving kernel: covers Fourier-feature configs too (the bank
    # is frozen per point, computed here, carried as extra feature rows).
    # Remaining exclusions: x64 parity runs, the adaptive solvers (the
    # kernel takes k_steps*n_sub fine fixed steps) and the Adams
    # multisteps (their histories don't map onto the kernel's step loop
    # — the XLA path below keeps the configured integrator so outputs
    # match across backends).
    from xnode_wan_tpu.ops.pallas.steppers import FUSED_KERNEL_METHODS
    if (cfg.use_pallas and not cfg.x64
            and cfg.solver in FUSED_KERNEL_METHODS
            and jax.default_backend() == "tpu"):
        from xnode_wan_tpu.ops.pallas.xnode_eval import fused_evaluate
        # Seed through path_seed_fn — the ONE seeding definition shared
        # with the XLA forward and the fused training kernel (for every
        # h-seeded point ``domain.entry`` returns ``t_entry == T0``, so a
        # single-sample batch at the entry time reproduces the reference
        # recipe exactly).
        entry_pts = pts.at[:, 0].set(t_entry)
        seed_batch = PathBatch(
            x=entry_pts[:, None, :],
            mask=jnp.ones((pts.shape[0], 1), dtype=bool),
            t_start=t_entry,
            seed_from_h=seed_from_h,
        )
        seed = path_seed_fn(seed_batch, problem, cfg)(pts[:, 1:])
        feats = spatial_features(pts[:, 1:], cfg.fourier_features)
        return fused_evaluate(params, pts, seed, k_steps * cfg.n_sub,
                              t_start=t_entry, feats=feats,
                              method=cfg.solver, mesh=mesh,
                              data_axis=cfg.data_axis) * scale
    m = pts.shape[0]
    t = pts[:, 0]
    frac = jnp.linspace(0.0, 1.0, k_steps + 1, dtype=pts.dtype)
    times = t_entry[:, None] + frac[None, :] * (t - t_entry)[:, None]
    x_full = jnp.concatenate(
        [times[:, :, None],
         jnp.broadcast_to(pts[:, None, 1:], (m, k_steps + 1, pts.shape[1] - 1))],
        axis=-1)
    batch = PathBatch(
        x=x_full,
        mask=jnp.ones((m, k_steps + 1), dtype=bool),
        t_start=t_entry,
        seed_from_h=seed_from_h,
    )
    if mesh is not None:
        from xnode_wan_tpu.parallel.mesh import shard_batch
        batch = shard_batch(batch, mesh, cfg.data_axis)
    return apply_xnode(params, batch, problem, cfg)[:, -1]
