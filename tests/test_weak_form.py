"""Weak-form loss: derivative correctness vs finite differences, estimator
sanity on the hypercube."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.models.discriminator import (apply_discriminator,
                                                init_discriminator)
from xnode_wan_tpu.models.xnode import apply_xnode, init_xnode
from xnode_wan_tpu.ops.sampling import Hypercube, _assemble
from xnode_wan_tpu.ops.weak_form import (interior_terms, make_losses,
                                         u_with_spatial_grad,
                                         v_phi_and_grads)
from xnode_wan_tpu.problems import load_problem

CFG = SolverConfig(dim=2, N_t=6, N_r=16, N_b=8, u_hidden_dim=8,
                   u_hidden_hidden_dim=8, u_layers=2, v_layers=3,
                   v_hidden_dim=10, min_steps=3, shape_param=(-1.0, 1.0))


@pytest.fixture(scope="module")
def setup():
    cube = Hypercube((-1.0, 1.0), CFG.dim, CFG.T0, CFG.T, CFG.N_t)
    k = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(k, 3)
    batch = cube.interior(k1, CFG.N_r)
    u_params = init_xnode(k2, CFG)
    v_params = init_discriminator(k3, CFG.dim, CFG.v_hidden_dim,
                                  CFG.v_layers, tied=True)
    problem = load_problem("cube_pde", dim=CFG.dim)
    return cube, batch, u_params, v_params, problem


def test_u_spatial_grad_matches_fd(setup):
    cube, batch, u_params, _, problem = setup
    u, du = u_with_spatial_grad(apply_xnode, u_params, batch, problem, CFG)
    assert u.shape == (CFG.N_r, CFG.N_t)
    assert du.shape == (CFG.N_r, CFG.N_t, CFG.dim)

    eps = 1e-4
    xs0 = batch.space[:, 0, :]
    for axis in range(CFG.dim):
        e = jnp.zeros_like(xs0).at[:, axis].add(eps)
        bp = batch.replace(x=_assemble(batch.times, xs0 + e))
        bm = batch.replace(x=_assemble(batch.times, xs0 - e))
        fd = (apply_xnode(u_params, bp, problem, CFG)
              - apply_xnode(u_params, bm, problem, CFG)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(du[..., axis]),
                                   np.asarray(fd), atol=2e-3, rtol=2e-3)


def test_phi_grads_match_fd(setup):
    cube, batch, _, v_params, _ = setup

    def v_apply(p, pts):
        return apply_discriminator(p, pts, CFG.v_layers, tied=True)

    v, phi, dphi = v_phi_and_grads(v_apply, v_params, batch.x, cube.func_w)
    assert phi.shape == (CFG.N_r, CFG.N_t)
    assert dphi.shape == (CFG.N_r, CFG.N_t, CFG.dim + 1)

    w = cube.func_w(batch.x)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(v * w), rtol=1e-5)

    eps = 1e-4
    # FD in time channel (channel 0): smooth region so subgradients agree
    xp = batch.x.at[..., 0].add(eps)
    xm = batch.x.at[..., 0].add(-eps)
    fd = (v_apply(v_params, xp) * cube.func_w(xp)
          - v_apply(v_params, xm) * cube.func_w(xm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(dphi[..., 0]), np.asarray(fd),
                               atol=2e-3, rtol=2e-3)


def test_interior_terms_match_dense_reference_formula(setup):
    """Masked global estimator == direct dense formula on the full-mask cube."""
    cube, batch, u_params, v_params, problem = setup

    def v_apply(p, pts):
        return apply_discriminator(p, pts, CFG.v_layers, tied=True)

    u, du = u_with_spatial_grad(apply_xnode, u_params, batch, problem, CFG)
    v, phi, dphi = v_phi_and_grads(v_apply, v_params, batch.x, cube.func_w)
    current, norm = interior_terms(u, du, v, phi, dphi, batch, problem, cube,
                                   s1_raw_v=True)

    # the phi-form temporal term differs from the reference's raw-v one
    current_phi, _ = interior_terms(u, du, v, phi, dphi, batch, problem, cube)
    assert float(current_phi) != pytest.approx(float(current), rel=1e-3)

    # dense recomputation (reference loss.py:64-73 structure, full mask)
    n, l = u.shape
    vol = cube.V()
    h_vals = problem.h(batch.x[:, 0, :])
    s1 = vol * jnp.sum(u[:, -1] * v[:, -1] - h_vals * v[:, 0]) / n
    s2 = vol * jnp.sum(u * dphi[..., 0]) / (n * l)
    s3f = (jnp.sum(dphi[..., 1:] * du, -1)
           + problem.c(batch.x, u) * u * phi + problem.f(batch.x) * phi)
    s3 = vol * jnp.sum(s3f) / (n * l)
    np.testing.assert_allclose(float(current), float(s1 - s2 + s3), rtol=1e-5)
    np.testing.assert_allclose(float(norm),
                               float(vol * jnp.mean(v ** 2)), rtol=1e-5)


def test_grouped_equals_pooled_on_cube(setup):
    """On the hypercube every path lives in one exit group, so the grouped
    objective must equal the pooled log-ratio exactly."""
    from xnode_wan_tpu.ops.weak_form import grouped_interior_objective
    cube, batch, u_params, v_params, problem = setup

    def v_apply(p, pts):
        return apply_discriminator(p, pts, CFG.v_layers, tied=True)

    u, du = u_with_spatial_grad(apply_xnode, u_params, batch, problem, CFG)
    v, phi, dphi = v_phi_and_grads(v_apply, v_params, batch.x, cube.func_w)
    gi, gI, gnorm = grouped_interior_objective(u, du, v, phi, dphi, batch,
                                               problem, cube)
    current, norm = interior_terms(u, du, v, phi, dphi, batch, problem, cube)
    pooled = float(jnp.log(current ** 2) - jnp.log(norm))
    np.testing.assert_allclose(float(gi), pooled, rtol=1e-5)
    np.testing.assert_allclose(float(gI), float(current), rtol=1e-5)


def test_grouped_multi_bin_on_cone(key):
    """Cone paths exit at different times -> several active groups."""
    from xnode_wan_tpu.ops.sampling import NSphereTCone
    from xnode_wan_tpu.ops.weak_form import grouped_interior_objective
    cone = NSphereTCone(1.0, CFG.dim, CFG.T0, CFG.T, CFG.N_t)
    batch = cone.interior(key, 32)
    u_params = init_xnode(jax.random.PRNGKey(2), CFG)
    v_params = init_discriminator(jax.random.PRNGKey(3), CFG.dim,
                                  CFG.v_hidden_dim, CFG.v_layers, tied=True)
    problem = load_problem("cube_pde", dim=CFG.dim)

    def v_apply(p, pts):
        return apply_discriminator(p, pts, CFG.v_layers, tied=True)

    u, du = u_with_spatial_grad(apply_xnode, u_params, batch, problem, CFG)
    v, phi, dphi = v_phi_and_grads(v_apply, v_params, batch.x, cone.func_w)
    gi, gI, gnorm = grouped_interior_objective(u, du, v, phi, dphi, batch,
                                               problem, cone)
    assert np.isfinite(float(gi))
    # grads flow
    def f(up):
        uu, dd = u_with_spatial_grad(apply_xnode, up, batch, problem, CFG)
        out, _, _ = grouped_interior_objective(uu, dd, v, phi, dphi, batch,
                                               problem, cone)
        return out
    g = jax.grad(f)(u_params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_losses_finite_and_differentiable(setup):
    cube, batch, u_params, v_params, problem = setup
    bbatch = cube.boundary(jax.random.PRNGKey(9), CFG.N_b)

    def v_apply(p, pts):
        return apply_discriminator(p, pts, CFG.v_layers, tied=True)

    loss_u, loss_v = make_losses(problem, cube, CFG, apply_xnode, v_apply)[:2]
    (lu, aux), gu = jax.value_and_grad(loss_u, has_aux=True)(
        u_params, v_params, batch, bbatch)
    assert np.isfinite(float(lu))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(gu))
    (lv, _), gv = jax.value_and_grad(loss_v, has_aux=True)(
        v_params, u_params, batch)
    assert np.isfinite(float(lv))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree.leaves(gv))
    # adversary maximizes what the primal minimizes
    np.testing.assert_allclose(float(lv), -float(aux["int"]), rtol=1e-5)


def test_s1_initial_value_respects_seed_switch():
    # The integration-by-parts temporal term must use h(x) on T0-seeded
    # rows but g(t_re, x) on g-seeded re-entry rows (hourglass segment B)
    # — the same switch the model's own seeding applies.
    import jax.numpy as jnp
    from types import SimpleNamespace
    from xnode_wan_tpu.ops.sampling import PathBatch, _assemble
    from xnode_wan_tpu.ops.weak_form import interior_terms

    problem = SimpleNamespace(
        h=lambda X: jnp.full(X.shape[:-1], 2.0),
        g=lambda X: 3.0 + X[..., 0],          # g(t, x) = 3 + t
        c=lambda X, u: jnp.zeros(X.shape[:-1]),
        f=lambda X: jnp.zeros(X.shape[:-1]),
        b=None, a_kind="zero", a=None,
    )
    domain = SimpleNamespace(V=lambda: 1.0)
    times = jnp.array([[0.0, 0.5, 1.0], [0.4, 0.7, 1.0]])
    x = jnp.array([[0.1, 0.2], [0.1, 0.2]])
    batch = PathBatch(x=_assemble(times, x),
                      mask=jnp.ones((2, 3), dtype=bool),
                      t_start=jnp.array([0.0, 0.4]),
                      seed_from_h=jnp.array([True, False]))
    u = jnp.ones((2, 3))
    du = jnp.zeros((2, 3, 2))
    v = jnp.ones((2, 3))
    phi = jnp.ones((2, 3))
    dphi = jnp.zeros((2, 3, 3))
    current, _ = interior_terms(u, du, v, phi, dphi, batch, problem, domain)
    # s2 = s3 = 0 (dphi, c, f zero); s1 row0: u*phi - h = 1 - 2 = -1;
    # row1 (re-entry at t=0.4): 1 - g(0.4) = 1 - 3.4 = -2.4; mean = -1.7
    np.testing.assert_allclose(float(current), -1.7, rtol=1e-6)


def test_init_loss_all_rows_flag():
    # Default: init penalty over h-seeded rows only. init_all_rows=True is
    # the reference-parity mode (src/loss.py:78-80 applies h to every row,
    # including g-seeded re-entry segments). On an all-h-seeded batch
    # (Hypercube) the two must coincide.
    from types import SimpleNamespace
    from xnode_wan_tpu.ops.sampling import PathBatch, _assemble
    from xnode_wan_tpu.ops.weak_form import init_loss

    problem = SimpleNamespace(h=lambda X: jnp.full(X.shape[:-1], 2.0))
    times = jnp.array([[0.0, 0.5, 1.0], [0.4, 0.7, 1.0]])
    x = jnp.array([[0.1, 0.2], [0.1, 0.2]])
    batch = PathBatch(x=_assemble(times, x),
                      mask=jnp.ones((2, 3), dtype=bool),
                      t_start=jnp.array([0.0, 0.4]),
                      seed_from_h=jnp.array([True, False]))
    u = jnp.array([[1.0, 0.0, 0.0], [5.0, 0.0, 0.0]])
    # restricted: only row 0 counts -> (1-2)^2 = 1
    np.testing.assert_allclose(float(init_loss(u, batch, problem)), 1.0)
    # all rows: ((1-2)^2 + (5-2)^2)/2 = 5
    np.testing.assert_allclose(
        float(init_loss(u, batch, problem, all_rows=True)), 5.0)
    # all-h-seeded batch: identical either way
    both_h = PathBatch(x=batch.x, mask=batch.mask, t_start=batch.t_start,
                       seed_from_h=jnp.array([True, True]))
    np.testing.assert_allclose(
        float(init_loss(u, both_h, problem)),
        float(init_loss(u, both_h, problem, all_rows=True)))
