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
