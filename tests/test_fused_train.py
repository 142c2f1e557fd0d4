"""Equivalence of the fused Pallas training kernel (interpret mode) with
the XLA ``vmap(jvp)`` path: values, spatial gradients, and parameter
gradients of a contraction that exercises both (SURVEY §3.5 honest
pointwise derivatives; round-2 VERDICT item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.models.xnode import apply_xnode, init_xnode
from xnode_wan_tpu.ops.pallas.xnode_train import fused_from_batch
from xnode_wan_tpu.ops.sampling import make_domain
from xnode_wan_tpu.ops.weak_form import u_with_spatial_grad
from xnode_wan_tpu.problems import load_problem

BASE = dict(N_t=5, N_r=24, N_b=8, u_hidden_dim=6, u_hidden_hidden_dim=7,
            u_layers=2, min_steps=3)


def _compare(cfg, dom_name, sp, n_r=24):
    # Equivalence, not precision: on TPU the default matmul precision
    # (bf16-based passes) makes the two computation orders diverge at the
    # ~5e-4 level; pin full-f32 matmuls so the same tolerances hold on
    # every backend (XNODE_TEST_TPU=1 runs this suite on hardware).
    with jax.default_matmul_precision("highest"):
        _compare_inner(cfg, dom_name, sp, n_r)


def _compare_inner(cfg, dom_name, sp, n_r=24):
    prob = load_problem(
        "cube_pde" if dom_name == "Hypercube" else "Ex4_1_funcs", dim=cfg.dim)
    dom = make_domain(dom_name, sp, cfg.dim, cfg.T0, cfg.T, cfg.N_t)
    batch = dom.interior(jax.random.PRNGKey(0), n_r)
    params = init_xnode(jax.random.PRNGKey(1), cfg)

    u0, du0 = u_with_spatial_grad(apply_xnode, params, batch, prob, cfg)
    u1, du1 = fused_from_batch(params, batch, prob, cfg, interpret=True)
    m = batch.mask.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(u0 * m), np.asarray(u1 * m),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(du0 * m[..., None]),
                               np.asarray(du1 * m[..., None]), atol=5e-5)

    cu = jax.random.normal(jax.random.PRNGKey(2), u0.shape) * m
    cd = jax.random.normal(jax.random.PRNGKey(3), du0.shape) * m[..., None]

    def contraction(u, du):
        # linear + nonlinear-in-u terms, like the weak form
        return jnp.sum(u * cu) + jnp.sum(du * cd) + jnp.sum(
            jnp.tanh(u) * du[..., 0])

    g0 = jax.grad(lambda p: contraction(
        *u_with_spatial_grad(apply_xnode, p, batch, prob, cfg)))(params)
    g1 = jax.grad(lambda p: contraction(
        *fused_from_batch(p, batch, prob, cfg, interpret=True)))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        scale = float(jnp.abs(a).max()) + 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4 * max(scale, 1.0))


def test_hypercube_midpoint():
    _compare(SolverConfig(dim=3, shape_param=(-1.0, 1.0), **BASE),
             "Hypercube", (-1.0, 1.0))


def test_cone_masked_paths():
    _compare(SolverConfig(dim=3, shape_param=1.0, domain="NSphere_TCone",
                          **BASE), "NSphere_TCone", 1.0)


def test_hourglass_g_seeded_reentry():
    _compare(SolverConfig(dim=2, shape_param=1.0,
                          domain="NSphere_THourglass", **BASE),
             "NSphere_THourglass", 1.0)


def test_rk4_with_substeps():
    cfg = SolverConfig(dim=3, shape_param=(-1.0, 1.0), solver="rk4",
                       N_t=4, N_r=24, N_b=8, u_hidden_dim=6,
                       u_hidden_hidden_dim=7, u_layers=2, min_steps=6)
    assert cfg.n_sub > 1
    _compare(cfg, "Hypercube", (-1.0, 1.0))


def test_fourier_features_and_u_scale():
    _compare(SolverConfig(dim=3, shape_param=(-1.0, 1.0),
                          fourier_features=2, u_scale=3.7, **BASE),
             "Hypercube", (-1.0, 1.0))


def test_forward_only_kernel_matches_scan():
    # the tangentless metric/serving forward (u_forward_fused) matches
    # apply_xnode on a masked moving-domain batch with Fourier features
    # and u_scale, both unsharded and under the 8-device mesh
    from xnode_wan_tpu.ops.pallas.xnode_train import u_forward_fused
    from xnode_wan_tpu.parallel.mesh import make_mesh

    with jax.default_matmul_precision("highest"):
        cfg = SolverConfig(dim=3, shape_param=1.0, domain="NSphere_TCone",
                           fourier_features=1, u_scale=2.0, **BASE)
        prob = load_problem("Ex4_1_funcs", dim=3)
        dom = make_domain("NSphere_TCone", 1.0, 3, cfg.T0, cfg.T, cfg.N_t)
        batch = dom.interior(jax.random.PRNGKey(0), 24)
        params = init_xnode(jax.random.PRNGKey(1), cfg)
        u0 = apply_xnode(params, batch, prob, cfg)
        m = batch.mask.astype(jnp.float32)
        u1 = u_forward_fused(params, batch, prob, cfg, interpret=True)
        np.testing.assert_allclose(np.asarray(u0 * m), np.asarray(u1 * m),
                                   atol=5e-5)
        u2 = u_forward_fused(params, batch, prob, cfg, interpret=True,
                             mesh=make_mesh(jax.devices()))
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                                   atol=1e-6)


def test_sharded_kernel_matches_unsharded():
    # Multi-chip fast path: the fused kernel under jax.shard_map on the
    # 8-device mesh must reproduce the unsharded kernel's values AND
    # parameter gradients (paths shard over 'data', weights replicate,
    # parameter cotangents psum) — the round-3 'mesh is None' XLA
    # fallback is gone (ops/weak_form.py gate).
    with jax.default_matmul_precision("highest"):
        _sharded_kernel_matches_unsharded()


def _sharded_kernel_matches_unsharded():
    from xnode_wan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices())
    cfg = SolverConfig(dim=3, shape_param=(-1.0, 1.0), **BASE)
    prob = load_problem("cube_pde", dim=3)
    dom = make_domain("Hypercube", (-1.0, 1.0), 3, cfg.T0, cfg.T, cfg.N_t)
    batch = dom.interior(jax.random.PRNGKey(0), 24)
    params = init_xnode(jax.random.PRNGKey(1), cfg)

    u0, du0 = fused_from_batch(params, batch, prob, cfg, interpret=True)
    u1, du1 = fused_from_batch(params, batch, prob, cfg, interpret=True,
                               mesh=mesh)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(du0), np.asarray(du1), atol=1e-6)

    cu = jax.random.normal(jax.random.PRNGKey(2), u0.shape)
    cd = jax.random.normal(jax.random.PRNGKey(3), du0.shape)

    def loss(p, mesh):
        u, du = fused_from_batch(p, batch, prob, cfg, interpret=True,
                                 mesh=mesh)
        return jnp.sum(u * cu) + jnp.sum(du * cd) + jnp.sum(
            jnp.tanh(u) * du[..., 0])

    g0 = jax.grad(loss)(params, None)
    g1 = jax.jit(jax.grad(loss), static_argnums=1)(params, mesh)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_solver_trains_with_fused_flag_off_matches_api(tmp_path):
    # fused_grad=False must keep the XLA path selectable (fallback contract)
    cfg = SolverConfig(dim=2, shape_param=(-1.0, 1.0), iterations=2,
                       alpha=1e4, fused_grad=False, **BASE)
    prob = load_problem("cube_pde", dim=2)
    from xnode_wan_tpu.training import NODEWANSolver
    s = NODEWANSolver(cfg, prob, work_dir=str(tmp_path),
                      devices=jax.devices()[:1])
    m = s.train(report=False)
    assert np.isfinite(m["loss_u"])


def test_fused_fits_vmem_gate():
    # Geometries whose backward kernel exceeds the ~16 MB scoped-VMEM
    # stack at the minimum 128-path block must be gated off the fused
    # path (they failed to compile on TPU before the gate: d=50 cube and
    # the wide-field d=20 sines config overflowed by ~0.7 MB).
    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.ops.pallas.xnode_train import fused_fits

    def verdict(cfg):
        params = init_xnode(jax.random.PRNGKey(0), cfg)
        F = cfg.dim * (1 + 2 * cfg.fourier_features)
        return fused_fits(params, cfg.N_t, cfg.dim, F, cfg.n_sub,
                          cfg.solver)

    cube = load_params("configs/cube_pde.yaml")
    assert verdict(cube)                              # d=5 headline: fused
    assert verdict(cube.replace(dim=20))              # d=20 ensemble: fused
    assert not verdict(cube.replace(dim=50))          # d=50: XLA fallback
    assert not verdict(load_params("configs/highdim_d20.yaml"))


def test_fused_chunk_selection():
    # Geometries the full-d kernel cannot fit must still get a divisor
    # chunk size, so the fused path covers d=50 / wide d=20 via
    # d_chunk-tangent calls instead of falling back to XLA.
    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.ops.pallas.xnode_train import fused_chunk

    def chunk(cfg):
        params = init_xnode(jax.random.PRNGKey(0), cfg)
        F = cfg.dim * (1 + 2 * cfg.fourier_features)
        return fused_chunk(params, cfg.N_t, cfg.dim, F, cfg.n_sub,
                           cfg.solver), cfg.dim

    cube = load_params("configs/cube_pde.yaml")
    dc, d = chunk(cube)
    assert dc == d                                    # full kernel fits
    dc, d = chunk(cube.replace(dim=50))
    assert dc is not None and dc < d and d % dc == 0  # chunked, not XLA
    dc, d = chunk(load_params("configs/highdim_d20.yaml"))
    assert dc is not None and dc < d and d % dc == 0


def test_fused_chunk_break_even_cap():
    # The opt-in chunked path is bounded by fused_chunk_max (default 2,
    # the measured break-even — benchmarks/microbench_d20wide_chunk.json
    # ~parity at 2 chunks, microbench_d50_chunk.json loses at 5): a
    # geometry needing more chunks must fall back to XLA even with
    # fused_chunk: true, never silently decay toward dc=1.
    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.ops.pallas.xnode_train import fused_chunk

    def chunks_needed(cfg):
        params = init_xnode(jax.random.PRNGKey(0), cfg)
        F = cfg.dim * (1 + 2 * cfg.fourier_features)
        dc = fused_chunk(params, cfg.N_t, cfg.dim, F, cfg.n_sub,
                         cfg.solver)
        return cfg.dim // dc

    cube = load_params("configs/cube_pde.yaml").replace(fused_chunk=True)
    wide = load_params("configs/highdim_d20.yaml").replace(fused_chunk=True)
    # d=50 needs 5 chunks -> over the default cap -> gate rejects
    assert chunks_needed(cube.replace(dim=50)) > cube.fused_chunk_max
    # wide d=20 needs 2 -> within the cap -> gate accepts
    assert chunks_needed(wide) <= wide.fused_chunk_max


def test_chunked_matches_full_kernel():
    # d_chunk calls must reproduce the single-call kernel exactly:
    # same u (taken from chunk 0), same concatenated du, same parameter
    # gradients (cotangents accumulate across chunks via shared weights).
    with jax.default_matmul_precision("highest"):
        _chunked_matches_full_kernel()


def _chunked_matches_full_kernel():
    from xnode_wan_tpu.ops.pallas.xnode_train import fused_from_batch as ffb

    cfg = SolverConfig(dim=4, shape_param=(-1.0, 1.0), **BASE)
    prob = load_problem("cube_pde", dim=4)
    dom = make_domain("Hypercube", (-1.0, 1.0), 4, cfg.T0, cfg.T, cfg.N_t)
    batch = dom.interior(jax.random.PRNGKey(0), 24)
    params = init_xnode(jax.random.PRNGKey(1), cfg)

    u0, du0 = ffb(params, batch, prob, cfg, interpret=True)
    u1, du1 = ffb(params, batch, prob, cfg, interpret=True, d_chunk=2)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(u1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(du0), np.asarray(du1), atol=1e-6)

    cu = jax.random.normal(jax.random.PRNGKey(2), u0.shape)
    cd = jax.random.normal(jax.random.PRNGKey(3), du0.shape)

    def loss(p, d_chunk):
        u, du = ffb(p, batch, prob, cfg, interpret=True, d_chunk=d_chunk)
        return jnp.sum(u * cu) + jnp.sum(du * cd)

    g0 = jax.grad(loss)(params, None)
    g1 = jax.grad(loss)(params, 2)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
