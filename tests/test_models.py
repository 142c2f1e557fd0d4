"""Model-family tests: XNODE, discriminator (tied/untied), WAN baseline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.models.discriminator import (apply_discriminator,
                                                init_discriminator)
from xnode_wan_tpu.models.wan import apply_wan, init_wan
from xnode_wan_tpu.models.xnode import (apply_xnode, evaluate_points,
                                        init_xnode)
from xnode_wan_tpu.ops.sampling import Hypercube, NSphereTHourglass
from xnode_wan_tpu.problems import load_problem

CFG = SolverConfig(dim=2, N_t=6, N_r=8, N_b=8, u_hidden_dim=8,
                   u_hidden_hidden_dim=8, u_layers=2, v_layers=3,
                   v_hidden_dim=10, min_steps=4, shape_param=(-1.0, 1.0))


@pytest.fixture(scope="module")
def problem():
    return load_problem("cube_pde", dim=2)


def test_xnode_shapes_and_finiteness(problem, key):
    cube = Hypercube((-1.0, 1.0), 2, 0.0, 1.0, CFG.N_t)
    batch = cube.interior(key, 8)
    params = init_xnode(jax.random.PRNGKey(1), CFG)
    u = apply_xnode(params, batch, problem, CFG)
    assert u.shape == (8, CFG.N_t)
    assert np.isfinite(np.asarray(u)).all()


def test_xnode_seeded_with_initial_data(problem, key):
    # At t = T0 the XNODE output is readout(lift(h(x))) — before training
    # it won't equal h, but it must be *identical* for two batches whose
    # first points coincide (seed determinism), and differ when h differs.
    cube = Hypercube((-1.0, 1.0), 2, 0.0, 1.0, CFG.N_t)
    b1 = cube.interior(key, 8)
    params = init_xnode(jax.random.PRNGKey(1), CFG)
    u1 = apply_xnode(params, b1, problem, CFG)
    u2 = apply_xnode(params, b1, problem, CFG)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2))


def test_xnode_hourglass_reentry_rows(problem, key):
    hg = NSphereTHourglass(1.0, 2, 0.0, 1.0, CFG.N_t)
    batch = hg.interior(key, 16)
    params = init_xnode(jax.random.PRNGKey(1), CFG)
    u = apply_xnode(params, batch, problem, CFG)
    assert u.shape == (32, CFG.N_t)
    assert np.isfinite(np.asarray(u)).all()


def test_evaluate_points_consistent_with_path_forward(problem, key):
    # Pointwise eval integrates a fresh fine path from T0; it must agree
    # with the batched path forward at the path's own sample times.
    cube = Hypercube((-1.0, 1.0), 2, 0.0, 1.0, CFG.N_t)
    batch = cube.interior(key, 4)
    params = init_xnode(jax.random.PRNGKey(1), CFG)
    u_path = apply_xnode(params, batch, problem, CFG)
    pts = batch.x.reshape(-1, 3)
    u_pts = evaluate_points(params, pts, problem, CFG, k_steps=64)
    np.testing.assert_allclose(np.asarray(u_pts),
                               np.asarray(u_path.reshape(-1)), atol=5e-3)


def test_discriminator_tied_weight_sharing(key):
    # Reference ties every hidden layer (src/model.py:37-39): the tied
    # param count must not grow with depth.
    p3 = init_discriminator(key, 2, 10, 3, tied=True)
    p9 = init_discriminator(key, 2, 10, 9, tied=True)
    n3 = sum(x.size for x in jax.tree.leaves(p3))
    n9 = sum(x.size for x in jax.tree.leaves(p9))
    assert n3 == n9
    pu = init_discriminator(key, 2, 10, 3, tied=False)
    nu = sum(x.size for x in jax.tree.leaves(pu))
    assert nu > n3

    pts = jax.random.normal(jax.random.PRNGKey(2), (5, 7, 3))
    out = apply_discriminator(p9, pts, 9, tied=True)
    assert out.shape == (5, 7)
    out_flat = apply_discriminator(p9, pts[0, 0], 9, tied=True)
    assert out_flat.shape == ()


def test_wan_primal_model(problem, key):
    cube = Hypercube((-1.0, 1.0), 2, 0.0, 1.0, CFG.N_t)
    batch = cube.interior(key, 8)
    cfg = CFG.replace(primal="wan")
    params = init_wan(jax.random.PRNGKey(1), cfg)
    u = apply_wan(params, batch, problem, cfg)
    assert u.shape == (8, CFG.N_t)
    assert np.isfinite(np.asarray(u)).all()


def test_xavier_init_stats(key):
    from xnode_wan_tpu.models.layers import linear_init
    p = linear_init(key, 400, 400)
    limit = np.sqrt(6 / 800)
    w = np.asarray(p["w"])
    assert np.abs(w).max() <= limit + 1e-6
    assert np.allclose(np.asarray(p["b"]), 0.0)


def test_evaluate_points_hourglass_entry_seeding(problem):
    # Ascending-branch hourglass points (t > mid, |x| > r*mid) re-enter the
    # domain at t_re = |x|/r; honest direct eval must integrate from t_re
    # with the g-seed (reference src/model.py:92-96) — asserted here
    # against an explicitly-constructed re-entry path forward.
    hg = NSphereTHourglass(1.0, 2, 0.0, 1.0, CFG.N_t)
    params = init_xnode(jax.random.PRNGKey(1), CFG)
    t_q = jnp.asarray([0.9, 0.8])
    rho = jnp.asarray([0.7, 0.6])           # > r*mid = 0.5 -> re-entered
    pts = jnp.stack([t_q, rho, jnp.zeros(2)], axis=-1)

    t_entry, seed_h = hg.entry(pts)
    np.testing.assert_allclose(np.asarray(t_entry), np.asarray(rho))
    assert not bool(seed_h.any())

    u_pts = evaluate_points(params, pts, problem, CFG, k_steps=64, domain=hg)

    from xnode_wan_tpu.ops.sampling import PathBatch, _assemble
    k = 65
    frac = jnp.linspace(0.0, 1.0, k)
    times = t_entry[:, None] + frac[None, :] * (t_q - t_entry)[:, None]
    ref_batch = PathBatch(
        x=_assemble(times, pts[:, 1:]),
        mask=jnp.ones((2, k), dtype=bool),
        t_start=t_entry,
        seed_from_h=jnp.zeros((2,), dtype=bool),
    )
    u_ref = apply_xnode(params, ref_batch, problem, CFG)[:, -1]
    np.testing.assert_allclose(np.asarray(u_pts), np.asarray(u_ref),
                               rtol=1e-5, atol=1e-6)

    # and it must DIFFER from the dishonest from-T0 h-seeded integration
    u_naive = evaluate_points(params, pts, problem, CFG, k_steps=64)
    assert np.abs(np.asarray(u_pts) - np.asarray(u_naive)).max() > 1e-4


def test_fourier_features_field_input(problem, key):
    # K Fourier frequencies widen the field input by 2*K*d; the forward
    # still runs and differs from the raw-coordinate model
    cfg_f = CFG.replace(fourier_features=2)
    params = init_xnode(jax.random.PRNGKey(1), cfg_f)
    d = CFG.dim
    assert params["field"][0]["w"].shape[0] == \
        CFG.u_hidden_dim + 1 + d * (1 + 2 * 2)
    cube = Hypercube((-1.0, 1.0), 2, 0.0, 1.0, CFG.N_t)
    batch = cube.interior(key, 8)
    u = apply_xnode(params, batch, problem, cfg_f)
    assert u.shape == (8, CFG.N_t)
    assert np.isfinite(np.asarray(u)).all()

    from xnode_wan_tpu.models.xnode import spatial_features
    x = jnp.asarray([[0.5, -0.25]])
    f = spatial_features(x, 1)
    assert f.shape == (1, 6)
    np.testing.assert_allclose(np.asarray(f[0, :2]), [0.5, -0.25])
    # per-dim [sin, cos] blocks: [x1, x2, sin(px1), cos(px1), sin(px2), cos(px2)]
    p = np.pi / 2
    np.testing.assert_allclose(
        np.asarray(f[0, 2:]),
        [np.sin(p * 0.5), np.cos(p * 0.5),
         np.sin(p * -0.25), np.cos(p * -0.25)], rtol=1e-5, atol=1e-7)
