"""Pallas fused-eval kernel vs the XLA scan path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.models.xnode import evaluate_points, init_xnode
from xnode_wan_tpu.ops.pallas.xnode_eval import fused_evaluate
from xnode_wan_tpu.problems import load_problem

CFG = SolverConfig(dim=3, N_t=6, N_r=8, N_b=8, u_hidden_dim=8,
                   u_hidden_hidden_dim=8, u_layers=2, v_layers=2,
                   v_hidden_dim=8, min_steps=4, shape_param=(-1.0, 1.0),
                   use_pallas=False)


def test_fused_matches_scan_path(key):
    problem = load_problem("cube_pde", dim=CFG.dim)
    params = init_xnode(key, CFG)
    pts = jax.random.uniform(jax.random.PRNGKey(5), (37, CFG.dim + 1),
                             minval=-0.8, maxval=0.8)
    pts = pts.at[:, 0].set(jnp.abs(pts[:, 0]))  # t >= 0
    k_steps = 8

    ref = evaluate_points(params, pts, problem, CFG, k_steps=k_steps)

    pts0 = pts.at[:, 0].set(CFG.T0)
    seed = problem.h(pts0)
    got = fused_evaluate(params, pts, seed, k_steps * CFG.n_sub, t0=CFG.T0,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_method_aware(key):
    # the serving kernel integrates with the configured fixed-step scheme
    # (previously always midpoint regardless of cfg.solver)
    cfg = CFG.replace(solver="rk4")
    problem = load_problem("cube_pde", dim=cfg.dim)
    params = init_xnode(key, cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(9), (17, cfg.dim + 1),
                             minval=-0.8, maxval=0.8)
    pts = pts.at[:, 0].set(jnp.abs(pts[:, 0]))
    ref = evaluate_points(params, pts, problem, cfg, k_steps=6)
    seed = problem.h(pts.at[:, 0].set(cfg.T0))
    got = fused_evaluate(params, pts, seed, 6 * cfg.n_sub, t0=cfg.T0,
                         method="rk4", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_fourier_features(key):
    # Fourier-bank configs (the d=20 sines recipe) serve through the
    # fused kernel too: the bank is frozen per point, so it enters as
    # extra feature rows computed outside (round-3 VERDICT item 6 — these
    # configs previously fell silently to the slow scan path).
    from xnode_wan_tpu.models.xnode import spatial_features

    cfg = CFG.replace(fourier_features=2)
    problem = load_problem("cube_pde", dim=cfg.dim)
    params = init_xnode(key, cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(7), (29, cfg.dim + 1),
                             minval=-0.8, maxval=0.8)
    pts = pts.at[:, 0].set(jnp.abs(pts[:, 0]))
    k_steps = 8

    ref = evaluate_points(params, pts, problem, cfg, k_steps=k_steps)

    seed = problem.h(pts.at[:, 0].set(cfg.T0))
    feats = spatial_features(pts[:, 1:], cfg.fourier_features)
    got = fused_evaluate(params, pts, seed, k_steps * cfg.n_sub, t0=cfg.T0,
                         feats=feats, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_fused_handles_nonmultiple_block(key):
    # M not a multiple of the 512-point block: padding must not leak
    problem = load_problem("cube_pde", dim=CFG.dim)
    params = init_xnode(key, CFG)
    pts = jax.random.uniform(jax.random.PRNGKey(6), (3, CFG.dim + 1))
    seed = problem.h(pts.at[:, 0].set(0.0))
    out = fused_evaluate(params, pts, seed, 4, interpret=True)
    assert out.shape == (3,)
    assert np.isfinite(np.asarray(out)).all()


def test_shared_stepper_rejects_unknown_method():
    # One stepper source for both fused kernels (ops/pallas/steppers.py):
    # unknown method names raise everywhere — the eval kernel used to
    # silently substitute midpoint (e.g. for the Adams multisteps, whose
    # serving now stays on the XLA path so outputs match across
    # backends; see evaluate_points' gate).
    import pytest

    from xnode_wan_tpu.ops.pallas.steppers import (FUSED_KERNEL_METHODS,
                                                   rk_step)
    assert "fixed_adams" not in FUSED_KERNEL_METHODS
    assert "explicit_adams" not in FUSED_KERNEL_METHODS
    with pytest.raises(ValueError, match="fixed_adams"):
        rk_step("fixed_adams", lambda t, h: h, 0.0, 0.1, jnp.ones(2))


def test_fused_gate_single_predicate():
    # weak_form.fused_gate is the one eligibility predicate shared by the
    # loss builder and the metric forward: multistep/adaptive solvers are
    # out regardless of backend, and mesh_ok tracks the data-axis layout.
    from jax.sharding import Mesh

    from xnode_wan_tpu.ops.weak_form import fused_gate

    base = dict(dim=3, N_t=4, N_r=8, N_b=8, shape_param=(-1.0, 1.0))
    for solver in ("fixed_adams", "explicit_adams", "dopri5", "dopri8"):
        use, fmesh, _ = fused_gate(SolverConfig(solver=solver, **base),
                                   None)
        assert not use and fmesh is None

    devs = np.array(jax.devices()[:1]).reshape(1)
    mesh = Mesh(devs, ("data",))
    _, fmesh, mesh_ok = fused_gate(SolverConfig(**base), mesh)
    assert mesh_ok and fmesh is mesh
    _, fmesh, mesh_ok = fused_gate(SolverConfig(ensemble=2, **base), mesh)
    assert not mesh_ok and fmesh is None

    # ensemble > 1 excludes the kernel even without a mesh (the member
    # vmap overflows the scoped-VMEM stack at full-program pressure —
    # measured Mosaic failure at d=20 K=4 N_r=4000)
    use, _, _ = fused_gate(SolverConfig(ensemble=2, **base), None)
    assert use is False or jax.default_backend() != "tpu"

    # ...and the per-geometry estimate scales with `members` so a future
    # relaxation of the gate inherits a K-aware budget
    from xnode_wan_tpu.models.xnode import init_xnode
    from xnode_wan_tpu.ops.pallas.xnode_train import fused_fits

    cfg20 = SolverConfig(dim=20, N_t=20, N_r=64, N_b=64, min_steps=5,
                         shape_param=(-1.0, 1.0))
    p20 = init_xnode(jax.random.PRNGKey(0), cfg20)
    assert fused_fits(p20, cfg20.N_t, 20, 20, cfg20.n_sub, "midpoint")
    assert not fused_fits(p20, cfg20.N_t, 20, 20, cfg20.n_sub, "midpoint",
                          members=4)
    other = Mesh(devs, ("member",))
    _, fmesh, mesh_ok = fused_gate(SolverConfig(**base), other)
    assert not mesh_ok and fmesh is None

    # tangent_shards > 1: the kernel's shard_map only shards the data
    # axis, so a data x tangent mesh must fall back to the XLA path
    # (which genuinely shards the tangent batch) instead of silently
    # replicating kernel compute across the tangent devices.
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs 2 devices for the 2-axis meshes")
    devs2 = np.array(jax.devices()[:2]).reshape(1, 2)
    tmesh = Mesh(devs2, ("data", "tangent"))
    _, fmesh, mesh_ok = fused_gate(SolverConfig(**base), tmesh)
    assert not mesh_ok and fmesh is None
    # ...but a degenerate (size-1) extra axis is a plain data layout.
    tmesh1 = Mesh(np.array(jax.devices()[:2]).reshape(2, 1),
                  ("data", "tangent"))
    _, fmesh, mesh_ok = fused_gate(SolverConfig(**base), tmesh1)
    assert mesh_ok and fmesh is tmesh1


def test_fused_evaluate_sharded_matches_unsharded(key):
    # Data-parallel serving: the same kernel under shard_map over the
    # data axis must return exactly the per-point values of the unsharded
    # call (pure map — no collectives, no reduction-order noise). 37
    # points exercises the pad-to-shards path.
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device mesh")
    from xnode_wan_tpu.parallel.mesh import make_mesh

    problem = load_problem("cube_pde", dim=CFG.dim)
    params = init_xnode(key, CFG)
    pts = jax.random.uniform(jax.random.PRNGKey(11), (37, CFG.dim + 1),
                             minval=-0.8, maxval=0.8)
    pts = pts.at[:, 0].set(jnp.abs(pts[:, 0]))
    seed = problem.h(pts.at[:, 0].set(CFG.T0))

    ref = fused_evaluate(params, pts, seed, 6, t0=CFG.T0, interpret=True)
    got = fused_evaluate(params, pts, seed, 6, t0=CFG.T0, interpret=True,
                         mesh=make_mesh(jax.devices()))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
