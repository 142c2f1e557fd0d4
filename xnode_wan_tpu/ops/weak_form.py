"""Weak-form adversarial loss: Monte-Carlo estimate of <A[u], v*w> and the
log-ratio min-max objectives.

Reference: ``src/loss.py:12-96``. Terms (``:46-76``):

* ``s1`` — temporal boundary term ``V (u_T v_T - h v_0) / N`` from
  integration by parts in time (``:64``), evaluated at each path's first and
  last valid sample,
* ``s2`` — ``V u d_t(phi) / (N L)`` (``:65``),
* ``s3`` — diffusion ``sum_ij a_ij d_i(phi) d_j(u)``, drift
  ``sum_i b_i phi d_i(u)``, reaction+source ``(c u + f) phi`` (``:66-70``),
* ``I = sum_n s1 - sum_nl (s2 - s3)``; objectives
  ``int = log I^2 - log(V sum v^2 / M)`` (``:87-90``),
  ``loss_u = int + alpha (init + bdry)`` (``:92-93``), ``loss_v = -int``.

Deviations from the reference (all deliberate, flagged in SURVEY.md):

* **Pointwise derivatives.** The reference extracts ``du`` via
  ``.backward(ones)`` into ``X.grad`` (``:55-58``), which for the XNODE
  concentrates all sensitivity at time index 0 (SURVEY §3.5). Here
  ``grad_x u`` is computed honestly with ``jax.linearize`` through the scan
  integrator (one nonlinear + d linear passes), and ``(d_t, grad_x) phi``
  with reverse-mode per point — the paper's actual math.
* **Shared sample points** (default). The reference draws *independent*
  u/v interior clouds (``src/dataset.py:308-310``) yet multiplies their
  pointwise values — an artifact of torch ``.grad`` aliasing. u and v are
  evaluated at the same points here by default; set
  ``independent_uv: true`` to reproduce the reference's exact estimator
  (u on X, phi on XV, paired elementwise — ``src/loss.py:51-70``).
* **Global masked quadrature.** Ragged groups each got weight
  ``V/(N_g L_g)`` and a separate optimizer step; here every valid sample
  carries weight ``V/M`` in one estimator (identical for the hypercube,
  uniform-over-domain for the others).
* **init restricted to h-seeded paths** (the reference also penalizes
  ``u(t_re) = h(x)`` on boundary re-entry segments — a group-loop artifact).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.ops.coefficients import diffusion_term, drift_term
from xnode_wan_tpu.ops.sampling import PathBatch, _assemble


# Fixed-step schemes the fused Pallas kernels implement — single source
# in ops/pallas/steppers.py (re-exported here for gate callers).
from xnode_wan_tpu.ops.pallas.steppers import FUSED_KERNEL_METHODS


def fused_gate(cfg: SolverConfig, mesh):
    """The single eligibility predicate for the fused Pallas training
    kernel (``ops/pallas/xnode_train.py``) — shared by the loss builder
    below and the per-iteration metric forward (``training.py``) so the
    two paths can never drift.

    Returns ``(use_fused, fused_mesh, mesh_ok)``. Under a device mesh
    the kernel runs per-device via ``jax.shard_map`` over the data axis
    (paths shard, weights replicate, parameter cotangents psum) — that
    requires a plain data layout, so ``mesh_ok`` is False for
    ensemble > 1 (the step is vmapped over members; shard_map does not
    nest under that vmap — members already fill the idle MXU), for
    meshes without the data axis, and for meshes with any OTHER axis of
    size > 1 (e.g. ``tangent_shards > 1``): the kernel's shard_map only
    shards the data axis, so such a mesh would silently *replicate* the
    kernel across the extra axis's devices, while the XLA path genuinely
    shards the tangent-widened batch over them. Other exclusions: x64
    parity runs, adaptive/multistep solvers, the WAN primal (the kernel
    bakes the XNODE architecture), and non-TPU backends.
    """
    fused_mesh = None
    mesh_ok = mesh is None
    if (mesh is not None and cfg.ensemble == 1
            and cfg.data_axis in mesh.axis_names
            and all(size == 1 for ax, size in mesh.shape.items()
                    if ax != cfg.data_axis)):
        fused_mesh, mesh_ok = mesh, True
    # ensemble > 1 excludes the kernel even WITHOUT a mesh. The member
    # vmap materializes the K axis inside the kernel's scoped-VMEM stack;
    # measured at d=20 K=4 N_r=4000 the FULL vmapped training step
    # overflows Mosaic's 16 MB limit by 104 KB (compile failure), while
    # the same kernel compiles in isolation at smaller N — i.e. the
    # overflow depends on whole-program pressure the per-kernel estimate
    # (_geom_fits, which now takes `members`) cannot see, so the gate
    # stays conservative rather than risking a mid-run compile failure.
    # The XLA path handles vmapped members fine, and no ensemble config
    # has measured the fused kernel beating XLA.
    use_fused = (cfg.primal == "xnode" and cfg.fused_grad and not cfg.x64
                 and cfg.solver in FUSED_KERNEL_METHODS
                 and cfg.ensemble == 1
                 and mesh_ok and jax.default_backend() == "tpu")
    return use_fused, fused_mesh, mesh_ok


def u_with_spatial_grad(u_apply: Callable, u_params, batch: PathBatch,
                        problem, cfg: SolverConfig, tangent_sharding=None
                        ) -> Tuple[jax.Array, jax.Array]:
    """u values ``[N, L]`` and pointwise spatial gradients ``[N, L, d]``.

    Forward-mode through the integrator as ONE ``vmap``ped ``jax.jvp``
    over the ``d`` tangent directions: a single scan of batch width
    ``d*N`` carrying primal+tangent jointly. (The primal is replicated
    ``d`` times — extra FLOPs these tiny nets don't notice — in exchange
    for half the sequential scan depth of the previous
    ``jax.linearize``-then-replay form; measured 13.8 -> 11.5 ms per d=5
    outer iteration.) ``tangent_sharding`` optionally pins the d-sized
    tangent batch onto a mesh axis (2-D mesh tangent parallelism, see
    ``parallel/mesh.py::make_mesh_2d``).
    """
    xs0 = batch.space[:, 0, :]  # [N, d]

    def u_of(xs):
        b = batch.replace(x=_assemble(batch.times, xs))
        return u_apply(u_params, b, problem, cfg)

    basis = jnp.eye(xs0.shape[-1], dtype=xs0.dtype)

    def one(e):
        return jax.jvp(u_of, (xs0,), (jnp.broadcast_to(e, xs0.shape),))

    u_rep, du = jax.vmap(one)(basis)         # [d, N, L] each
    if tangent_sharding is not None:
        du = jax.lax.with_sharding_constraint(du, tangent_sharding)
    return u_rep[0], jnp.moveaxis(du, 0, -1)  # [N, L], [N, L, d]


def v_phi_and_grads(v_apply: Callable, v_params, pts: jax.Array,
                    func_w: Callable) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """v, phi = v*w, and pointwise ``(d_t, grad_x) phi`` at ``pts [N, L, C]``.

    Returns ``v [N,L]``, ``phi [N,L]``, ``dphi [N,L,C]`` (channel 0 = time).
    """
    n, l, c = pts.shape
    flat = pts.reshape(-1, c)

    def phi_point(p):
        v_val = v_apply(v_params, p)
        return v_val * func_w(p), v_val

    # has_aux returns v from the SAME forward pass instead of re-running
    # the discriminator over all N*L points a second time.
    (phi_flat, v_flat), dphi_flat = jax.vmap(
        jax.value_and_grad(phi_point, has_aux=True))(flat)
    return (v_flat.reshape(n, l), phi_flat.reshape(n, l),
            dphi_flat.reshape(n, l, c))


def v_phi_grads_fused(v_params, pts: jax.Array, func_w: Callable,
                      cfg: SolverConfig, mesh=None, interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused-kernel counterpart of :func:`v_phi_and_grads`.

    The discriminator's value and input-gradient come from the joint
    primal+tangent Pallas kernel (``ops/pallas/disc_train.py``); the
    cutoff ``w`` and its gradient are sample data (user domain code,
    stays in JAX), so ``phi = v w`` and ``grad phi = w grad v + v grad w``
    assemble elementwise. The parameter gradient flows through the
    kernel's custom VJP only.
    """
    from xnode_wan_tpu.ops.pallas.disc_train import v_dv_fused

    n, l, c = pts.shape
    flat = pts.reshape(-1, c)
    v, dv = v_dv_fused(v_params, flat, v_layers=cfg.v_layers,
                       tied=cfg.tied_v, n_freq=cfg.v_fourier_features,
                       mesh=mesh, data_axis=cfg.data_axis,
                       interpret=interpret)
    w, dw = jax.vmap(jax.value_and_grad(func_w))(flat)
    phi = v * w
    dphi = dv * w[:, None] + v[:, None] * dw
    return v.reshape(n, l), phi.reshape(n, l), dphi.reshape(n, l, c)


def _endpoint_indices(mask: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-path first/last valid time index and row-validity."""
    l = mask.shape[1]
    first = jnp.argmax(mask, axis=1)
    last = l - 1 - jnp.argmax(mask[:, ::-1], axis=1)
    return first, last, mask.any(axis=1)


def interior_terms(u: jax.Array, du: jax.Array, v: jax.Array, phi: jax.Array,
                   dphi: jax.Array, batch: PathBatch, problem, domain,
                   s1_raw_v: bool = False) -> Tuple[jax.Array, jax.Array]:
    """The operator estimate ``I`` and the test-norm ``V sum v^2 / M``.

    ``s1_raw_v``: the reference evaluates the temporal-boundary term with
    the *raw* discriminator ``v`` (``loss.py:64``), but the
    integration-by-parts identity behind ``s2`` pairs it with the full
    test function ``phi = v*w`` (which vanishes where a path exits through
    the moving boundary). On the hypercube the difference is a small bias;
    on moving domains every path exits and the raw-``v`` term poisons the
    estimator (observed: cone training stalls at ~14% rel-L2 vs
    converging with ``phi``). Default is the consistent ``phi`` form;
    pass True for exact reference parity.
    """
    dtype = u.dtype
    m = batch.mask.astype(dtype)
    big_m = jnp.maximum(m.sum(), 1.0)
    vol = jnp.asarray(domain.V(), dtype)

    first, last, row_valid = _endpoint_indices(batch.mask)
    rows = jnp.arange(u.shape[0])
    n_valid = jnp.maximum(row_valid.astype(dtype).sum(), 1.0)

    first_pts = batch.x[rows, first]                       # [N, C]
    # Initial value at each path's first valid time: h(x) for paths that
    # start at T0, but g(t_re, x) for g-seeded re-entry rows (hourglass
    # segment B) — the model's own seeding switch (models/xnode.py).
    # Substituting h there biases the integration-by-parts term by
    # (h - g(t_re))·phi(first) on every re-entry path.
    init_vals = jnp.where(batch.seed_from_h, problem.h(first_pts),
                          problem.g(first_pts))
    tf = v if s1_raw_v else phi
    s1 = (u[rows, last] * tf[rows, last] - init_vals * tf[rows, first])
    s1 = vol * jnp.sum(s1 * row_valid) / n_valid           # loss.py:64

    s2 = vol * jnp.sum(u * dphi[..., 0] * m) / big_m       # loss.py:65

    X = batch.x
    c_vals = problem.c(X, u)
    f_vals = problem.f(X)
    s3f = (diffusion_term(problem, X, dphi[..., 1:], du)
           + drift_term(problem, X, phi, du)
           + c_vals * u * phi + f_vals * phi)              # loss.py:66-70
    s3 = vol * jnp.sum(s3f * m) / big_m

    current = s1 - s2 + s3                                 # loss.py:73
    norm = vol * jnp.sum(v * v * m) / big_m                # loss.py:89
    return current, norm


def init_loss(u: jax.Array, batch: PathBatch, problem,
              all_rows: bool = False) -> jax.Array:
    """``mean (u(t_first, x) - h(x))^2`` (loss.py:78-80).

    Default: over h-seeded paths only — a boundary re-entry segment
    (hourglass) starts from ``g`` at its entry time, so penalizing it
    toward the *initial* data ``h`` there is a bias. ``all_rows=True`` is
    the reference-parity mode: the reference applies ``h`` on every row
    of the batch (``src/loss.py:78-80`` — a group-loop artifact; on the
    Hypercube the two are identical since every row starts at ``T0``).
    """
    first, _, row_valid = _endpoint_indices(batch.mask)
    rows = jnp.arange(u.shape[0])
    h_vals = problem.h(batch.x[rows, first])
    w_rows = row_valid if all_rows else (batch.seed_from_h & row_valid)
    w = w_rows.astype(u.dtype)
    sq = (u[rows, first] - h_vals) ** 2
    return jnp.sum(sq * w) / jnp.maximum(w.sum(), 1.0)


def bdry_from_values(u_b: jax.Array, bbatch: PathBatch, problem,
                     at_exit: bool = False) -> jax.Array:
    """Boundary penalty given precomputed ``u(BX) [N, L]`` (loss.py:83-85)."""
    if at_exit:
        _, last, row_valid = _endpoint_indices(bbatch.mask)
        rows = jnp.arange(u_b.shape[0])
        g_vals = problem.g(bbatch.x[rows, last])
        w = row_valid.astype(u_b.dtype)
        sq = (u_b[rows, last] - g_vals) ** 2
        return jnp.sum(sq * w) / jnp.maximum(w.sum(), 1.0)
    g_vals = problem.g(bbatch.x)
    m = bbatch.mask.astype(u_b.dtype)
    return jnp.sum((u_b - g_vals) ** 2 * m) / jnp.maximum(m.sum(), 1.0)


def bdry_loss(u_apply: Callable, u_params, bbatch: PathBatch, problem,
              cfg: SolverConfig, at_exit: bool = False) -> jax.Array:
    """``mean (u(BX) - g(BX))^2`` over valid boundary samples (loss.py:83-85).

    ``at_exit=True``: boundary-anchored *paths* (moving domains with
    ``path_boundary``) — only the final sample of each path lies on the
    boundary, so u is compared with g there alone; the interior history
    exists to drive the ODE to that point.
    """
    u_b = u_apply(u_params, bbatch, problem, cfg)
    return bdry_from_values(u_b, bbatch, problem, at_exit=at_exit)


def grouped_interior_objective(u, du, v, phi, dphi, batch: PathBatch,
                               problem, domain, s1_raw_v: bool = False
                               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-exit-group log-ratio objective (reference group semantics).

    The reference computes a *separate* loss ``log I_g^2 - log norm_g`` per
    ragged path group (one odeint group per boundary-exit time,
    ``src/training.py:128-137`` loops groups; ``src/loss.py:87-90``), so
    the adversary faces one residual channel per group — a much stronger
    signal on moving domains than a single pooled estimate. TPU-native
    reconstruction: group = per-path last-valid time index (static ``L``
    bins), per-bin sums via ``segment_sum``; weights ``V/(N_g L_n)``
    reproduce the reference's per-group ``V/(N_g L_g)`` exactly. On the
    hypercube every path lands in bin ``L-1`` and this reduces to the
    single pooled objective.

    Returns ``(int_loss, I_total, norm_total)``.
    """
    dtype = u.dtype
    l = u.shape[1]
    m = batch.mask.astype(dtype)
    vol = jnp.asarray(domain.V(), dtype)
    eps = jnp.asarray(1e-12, dtype)

    first, last, row_valid = _endpoint_indices(batch.mask)
    rows = jnp.arange(u.shape[0])
    rv = row_valid.astype(dtype)
    seg = jnp.where(row_valid, last, l)          # dead rows -> overflow bin
    n_g = jax.ops.segment_sum(rv, seg, num_segments=l + 1)[:l]
    occupied = n_g > 0
    n_g = jnp.maximum(n_g, 1.0)
    l_n = jnp.maximum(m.sum(axis=1), 1.0)        # per-path valid count

    first_pts = batch.x[rows, first]
    # h for T0-seeded rows, g(t_re, x) for g-seeded re-entry rows (same
    # switch as interior_terms / the model's own seeding)
    init_vals = jnp.where(batch.seed_from_h, problem.h(first_pts),
                          problem.g(first_pts))
    tf = v if s1_raw_v else phi
    s1_n = (u[rows, last] * tf[rows, last]
            - init_vals * tf[rows, first]) * rv

    X = batch.x
    c_vals = problem.c(X, u)
    f_vals = problem.f(X)
    s3f = (diffusion_term(problem, X, dphi[..., 1:], du)
           + drift_term(problem, X, phi, du)
           + c_vals * u * phi + f_vals * phi)
    s23_n = jnp.sum((s3f - u * dphi[..., 0]) * m, axis=1) / l_n  # [N]
    v2_n = jnp.sum(v * v * m, axis=1) / l_n

    i_g = vol * jax.ops.segment_sum(s1_n + s23_n * rv, seg,
                                    num_segments=l + 1)[:l] / n_g
    norm_g = vol * jax.ops.segment_sum(v2_n * rv, seg,
                                       num_segments=l + 1)[:l] / n_g

    per_g = (jnp.log(jnp.maximum(i_g ** 2, eps))
             - jnp.log(jnp.maximum(norm_g, eps)))
    int_loss = jnp.sum(jnp.where(occupied, per_g, 0.0))
    return int_loss, jnp.sum(jnp.where(occupied, i_g, 0.0)), \
        jnp.sum(jnp.where(occupied, norm_g, 0.0))


class WeakFormLosses(NamedTuple):
    """The two objectives plus their hoisted-precompute split forms.

    ``loss_u``/``loss_v`` are the self-contained objectives (used by tests
    and external callers). The split forms exist because inside one outer
    iteration the adversary side (``v``, ``phi``, ``grad phi``) is constant
    across the ``n1`` primal steps and the primal side (``u``, ``grad u``)
    is constant across the ``n2`` adversary steps — but XLA does not CSE
    those subgraphs across separate ``value_and_grad`` calls (measured
    ~2.4 ms of redundant per-u-step work on the d=5 bench config). The
    trainer precomputes each side once per phase and differentiates only
    the dependent half; gradients are mathematically identical because the
    hoisted quantities carry no dependence on the differentiated
    parameters.
    """
    loss_u: Callable
    loss_v: Callable
    v_side: Callable       # (v_params, batch, vbatch=None) -> (v, phi, dphi)
    loss_u_vside: Callable  # (u_params, vside, batch, bbatch) -> (loss, aux)
    u_side: Callable       # (u_params, batch) -> (u, du)
    loss_v_uside: Callable  # (v_params, uside, batch, vbatch=None)


def make_losses(problem, domain, cfg: SolverConfig, u_apply: Callable,
                v_apply: Callable, mesh=None) -> WeakFormLosses:
    """Build the two objectives.

    ``loss_u(u_params, v_params, batch, bbatch)`` — minimized by the primal
    net (reference ``loss.u``, loss.py:92-93).
    ``loss_v(v_params, u_params, batch)`` — minimized by the adversary
    (reference ``loss.v``, loss.py:95-96).
    Both return ``(loss, aux_dict)``. See :class:`WeakFormLosses` for the
    hoisted split forms.
    """
    tangent_sharding = None
    if (mesh is not None and cfg.tangent_shards > 1
            and "tangent" in mesh.axis_names):
        from jax.sharding import NamedSharding, PartitionSpec as P
        tangent_sharding = NamedSharding(
            mesh, P("tangent", cfg.data_axis, None))

    # Fused Pallas (u, grad_x u) + custom-VJP kernel on the TPU hot path
    # (ops/pallas/xnode_train.py): one kernel per direction instead of
    # ~360 HBM-round-tripping matmuls. Eligibility (incl. multi-chip
    # shard_map composition and its exclusions) lives in fused_gate above.
    use_fused, fused_mesh, mesh_ok = fused_gate(cfg, mesh)
    # The adversary-side fused kernel (disc_train.py) is OPT-IN
    # (fused_v: true): measured slower than the XLA vmap(value_and_grad)
    # path on the d=5 hot step (6.56 vs 6.13 ms — launch overhead beats
    # the fusion at 50-wide MLP shapes, DESIGN.md §14). It is independent
    # of the primal architecture (covers WAN/dopri5 runs) and composes
    # with the mesh via its cotangent psum; x64 and non-data mesh
    # layouts always keep the XLA path.
    use_fused_v = (cfg.fused_v and cfg.fused_grad and not cfg.x64
                   and mesh_ok and jax.default_backend() == "tpu")

    def u_side(u_params, batch):
        """Primal values + pointwise spatial gradients (constant across
        the adversary's n2 steps)."""
        if use_fused:
            from xnode_wan_tpu.ops.pallas.xnode_train import (
                fused_chunk, fused_from_batch)
            d = batch.space.shape[-1]
            F = d * (1 + 2 * cfg.fourier_features)
            dc = fused_chunk(u_params, batch.times.shape[1], d, F,
                             cfg.n_sub, cfg.solver, members=cfg.ensemble)
            if dc == d:
                return fused_from_batch(u_params, batch, problem, cfg,
                                        mesh=fused_mesh,
                                        data_axis=cfg.data_axis)
            if (dc is not None and cfg.fused_chunk
                    and d // dc <= cfg.fused_chunk_max):
                # Full-d geometry exceeds scoped VMEM (d=50, wide d=20):
                # run the kernel in dc-tangent chunks (d//dc calls of one
                # shared compiled geometry; opt-in, see config.fused_chunk).
                # Bounded by fused_chunk_max: past ~2 chunks the per-chunk
                # primal recompute + extra pallas_call launches measurably
                # lose to the XLA fallback (62.6 vs 45.9 ms/step at d=50's
                # 5 chunks, benchmarks/microbench_d50_chunk.json), so the
                # opt-in never silently decays toward dc=1.
                return fused_from_batch(u_params, batch, problem, cfg,
                                        d_chunk=dc, mesh=fused_mesh,
                                        data_axis=cfg.data_axis)
            # Geometry too large for the kernel's scoped-VMEM stack at
            # the minimum 128-path block (e.g. d=50): XLA path.
        return u_with_spatial_grad(u_apply, u_params, batch, problem, cfg,
                                   tangent_sharding=tangent_sharding)

    def v_side(v_params, batch, vbatch=None):
        """Adversary values ``(v, phi, dphi)`` (constant across the
        primal's n1 steps).

        independent_uv: the v side (v, phi, grad phi, func_w) is evaluated
        on its own interior cloud XV and paired elementwise with the u
        side at X — the reference's exact estimator (src/loss.py:51-70).
        """
        v_pts = batch.x if vbatch is None else vbatch.x
        if use_fused_v:
            from xnode_wan_tpu.ops.pallas.disc_train import v_fused_fits
            if v_fused_fits(v_params, v_pts.shape[-1], cfg.v_layers,
                            cfg.tied_v):
                return v_phi_grads_fused(v_params, v_pts, domain.func_w,
                                         cfg, mesh=fused_mesh)
        return v_phi_and_grads(v_apply, v_params, v_pts, domain.func_w)

    # Hypercube: every path occupies the single last-time exit group, so
    # the grouped objective IS the pooled one — skip the segment_sum
    # machinery (TPU scatters) statically.
    grouped = cfg.group_loss and not getattr(domain, "single_exit_group",
                                             False)

    def int_from_sides(u, du, vside, batch):
        v, phi, dphi = vside
        if grouped:
            # per-exit-group channels (reference group semantics)
            int_loss, current, norm = grouped_interior_objective(
                u, du, v, phi, dphi, batch, problem, domain,
                s1_raw_v=cfg.s1_raw_v)
        else:
            current, norm = interior_terms(u, du, v, phi, dphi, batch,
                                           problem, domain,
                                           s1_raw_v=cfg.s1_raw_v)
            # log-ratio objective (loss.py:87-90). The reference's bare
            # log(I^2) is singular whenever the residual estimate crosses 0
            # mid-training (observed NaN blowups on the moving domains);
            # the floor caps the gradient without moving any
            # non-degenerate optimum.
            eps = jnp.asarray(1e-12, current.dtype)
            int_loss = (jnp.log(jnp.maximum(current ** 2, eps))
                        - jnp.log(jnp.maximum(norm, eps)))
        return int_loss, {"I": current, "norm": norm, "int": int_loss}

    bdry_at_exit = bool(getattr(domain, "boundary_at_exit", False))

    def loss_u_vside(u_params, vside, batch, bbatch):
        """loss_u with the adversary side precomputed (hoisted)."""
        u, du = u_side(u_params, batch)
        int_loss, aux = int_from_sides(u, du, vside, batch)
        init = init_loss(u, batch, problem, all_rows=cfg.init_all_rows)
        # NOTE: the boundary term deliberately stays on the XLA scan path
        # even when the fused kernel is active — a tangentless Pallas
        # variant was built and measured SLOWER end-to-end (7.72 vs
        # 7.43 ms/outer step on the d=5 bench: two extra pallas_call
        # launches cost more than the small XLA forward+backward they
        # replace). See docs/DESIGN.md §11.
        bdry = bdry_loss(u_apply, u_params, bbatch, problem, cfg,
                         at_exit=bdry_at_exit)
        total = int_loss + cfg.alpha * (init + bdry)
        aux = dict(aux, init=init, bdry=bdry, loss_u=total)
        return total, aux

    def loss_v_uside(v_params, uside, batch, vbatch=None):
        """loss_v with the primal side precomputed (hoisted)."""
        u, du = uside
        int_loss, aux = int_from_sides(u, du, v_side(v_params, batch, vbatch),
                                       batch)
        total = -int_loss
        aux = dict(aux, loss_v=total)
        return total, aux

    def loss_u(u_params, v_params, batch, bbatch, vbatch=None):
        return loss_u_vside(u_params, v_side(v_params, batch, vbatch),
                            batch, bbatch)

    def loss_v(v_params, u_params, batch, vbatch=None):
        return loss_v_uside(v_params, u_side(u_params, batch), batch, vbatch)

    return WeakFormLosses(loss_u, loss_v, v_side, loss_u_vside,
                          u_side, loss_v_uside)
