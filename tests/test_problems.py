"""Oracle tests: the shipped exact solutions actually satisfy their PDEs
(checked by autodiff), and boundary/initial data are consistent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.problems import load_problem, from_reference_callables


def pde_residual(problem, pt, dim):
    """u_t - sum_i d_i(sum_j a_ij d_j u) + sum_i b_i d_i u + c(u) u - f
    at a single (t, x) point (general form, reference main.py:12-22)."""
    u = problem.u_sol

    def u_point(p):
        return u(p)

    grad = jax.grad(u_point)(pt)
    u_t = grad[0]
    hess = jax.hessian(u_point)(pt)
    lap = jnp.trace(hess[1:, 1:])  # a = identity for shipped problems
    uval = u_point(pt)
    cval = problem.c(pt, uval)
    return u_t - lap + cval * uval - problem.f(pt)


@pytest.mark.parametrize("name", ["cube_pde", "Ex4_1_funcs"])
def test_cube_solution_satisfies_pde(name, key):
    problem = load_problem(name, dim=5)
    pts = jax.random.uniform(key, (32, 6), minval=-0.9, maxval=0.9)
    pts = pts.at[:, 0].set(jnp.abs(pts[:, 0]))  # t in [0, 0.9]
    res = jax.vmap(lambda p: pde_residual(problem, p, 5))(pts)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-4)


def test_ex4_1_has_early_stop():
    assert load_problem("Ex4_1_funcs").stop_rel_err == 0.01
    assert load_problem("cube_pde").stop_rel_err is None


def test_initial_and_boundary_data_consistent(key):
    problem = load_problem("cube_pde")
    pts = jax.random.uniform(key, (16, 6), minval=-1.0, maxval=1.0)
    pts0 = pts.at[:, 0].set(0.0)
    np.testing.assert_allclose(np.asarray(problem.h(pts0)),
                               np.asarray(problem.u_sol(pts0)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(problem.g(pts)),
                               np.asarray(problem.u_sol(pts)), rtol=1e-6)


def test_ex4_3_consistent_satisfies_pde(key):
    # The corrected source term must zero the PDE residual at any dim
    # (the reference's literal f only does at d=2 — see ex4_3.py).
    for d in (2, 7):
        problem = load_problem("Ex4_3_consistent", dim=d)
        pts = jax.random.uniform(key, (16, d + 1), minval=0.05, maxval=0.9)
        res = jax.vmap(lambda p: pde_residual(problem, p, d))(pts)
        np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-4)


def test_ex4_3_reference_f_is_inconsistent(key):
    # The reference's literal f does NOT zero the residual (its nonlinear
    # term drops the (2/pi)^{-2d} scaling squared) — kept only for parity.
    problem = load_problem("Ex4_3_funcs", dim=2)
    pts = jax.random.uniform(key, (16, 3), minval=0.05, maxval=0.9)
    res = jax.vmap(lambda p: pde_residual(problem, p, 2))(pts)
    assert float(np.abs(np.asarray(res)).max()) > 1e-3


def test_ex4_3_dim_factory(key):
    problem = load_problem("Ex4_3_funcs", dim=3)
    assert problem.dim == 3
    pts = jax.random.uniform(key, (8, 4))
    assert problem.u_sol(pts).shape == (8,)
    with pytest.raises(ValueError):
        load_problem("Ex4_3_funcs", dim=None)


def test_reference_style_adapter_matches_structured(key):
    """Dense func_a(X,i,j) adapter reproduces the isotropic fast path."""
    from xnode_wan_tpu.ops.coefficients import diffusion_term

    structured = load_problem("cube_pde")
    dim = 3

    def func_a(X, i, j):
        return jnp.where(i == j, jnp.ones(X.shape[:-1]),
                         jnp.zeros(X.shape[:-1]))

    dense = from_reference_callables(
        func_a, None, structured.c, structured.h, structured.f, structured.g,
        dim=dim, func_u_sol=structured.u_sol)

    X = jax.random.normal(key, (4, 5, dim + 1))
    dphi = jax.random.normal(jax.random.PRNGKey(1), (4, 5, dim))
    du = jax.random.normal(jax.random.PRNGKey(2), (4, 5, dim))
    np.testing.assert_allclose(
        np.asarray(diffusion_term(dense, X, dphi, du)),
        np.asarray(diffusion_term(structured, X, dphi, du)), rtol=1e-5)
