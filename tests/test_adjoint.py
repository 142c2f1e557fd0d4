"""Continuous-adjoint integrator (ops/adjoint.py): the TPU-native
``odeint_adjoint`` analogue (reference ``src/model.py:8,103``).

The adjoint's gradients solve the continuous adjoint ODE with the same
fixed-step scheme, so they match autodiff-through-scan only up to
discretization error — the tests therefore check (a) exact forward
agreement, (b) gradient agreement at a tolerance that tightens as the
step shrinks (the defining property of a correct continuous adjoint),
(c) masked rows contribute nothing, (d) all three cotangent paths
(params, xs, h0) are live.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xnode_wan_tpu.ops.adjoint import make_adjoint_integrator
from xnode_wan_tpu.ops.integrate import integrate

N, L, H, F = 6, 5, 4, 3


def field_fn(params, xs, t, h):
    z = jnp.concatenate([xs, t[:, None], h], axis=-1)
    z = jnp.tanh(z @ params["w1"] + params["b1"])
    return z @ params["w2"] + params["b2"]


@pytest.fixture
def setup():
    k = jax.random.split(jax.random.PRNGKey(3), 6)
    params = {
        "w1": 0.4 * jax.random.normal(k[0], (F + 1 + H, 8)),
        "b1": 0.1 * jax.random.normal(k[1], (8,)),
        "w2": 0.4 * jax.random.normal(k[2], (8, H)),
        "b2": 0.1 * jax.random.normal(k[3], (H,)),
    }
    xs = jax.random.normal(k[4], (N, F))
    h0 = jax.random.normal(k[5], (N, H))
    times = jnp.cumsum(
        0.1 + 0.1 * jax.random.uniform(jax.random.PRNGKey(9), (N, L)), axis=1)
    t_start = jnp.zeros((N,))
    mask = jnp.ones((N, L), dtype=bool)
    return params, xs, h0, times, t_start, mask


def _loss_pair(n_sub, method, setup):
    """(adjoint loss fn, autodiff-through-scan loss fn) on params/xs/h0."""
    params, xs, h0, times, t_start, mask = setup
    run_adj = make_adjoint_integrator(field_fn, n_sub, method)
    w = jax.random.normal(jax.random.PRNGKey(1), (N, L, H))

    def loss_adj(params, xs, h0):
        hs = run_adj(params, xs, h0, times, t_start, mask)
        return jnp.sum(hs * w)

    def loss_ref(params, xs, h0):
        hs = integrate(lambda t, h: field_fn(params, xs, t, h), h0,
                       times, t_start, mask, n_sub=n_sub, method=method)
        return jnp.sum(hs * w)

    return loss_adj, loss_ref


def test_forward_identical(setup):
    params, xs, h0, times, t_start, mask = setup
    run_adj = make_adjoint_integrator(field_fn, 2, "midpoint")
    hs_a = run_adj(params, xs, h0, times, t_start, mask)
    hs_r = integrate(lambda t, h: field_fn(params, xs, t, h), h0,
                     times, t_start, mask, n_sub=2, method="midpoint")
    np.testing.assert_allclose(np.asarray(hs_a), np.asarray(hs_r),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("method", ["euler", "midpoint", "heun", "rk4"])
def test_gradients_converge_to_discrete(method, setup):
    # The adjoint gradient differs from autodiff-through-scan by the
    # backward discretization error, which must SHRINK with the step.
    errs = []
    for n_sub in (2, 8):
        loss_adj, loss_ref = _loss_pair(n_sub, method, setup)
        ga = jax.grad(loss_adj, argnums=(0, 1, 2))(*setup[:3])
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*setup[:3])
        num = sum(float(jnp.sum((a - b) ** 2))
                  for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gr)))
        den = sum(float(jnp.sum(b ** 2)) for b in jax.tree.leaves(gr))
        errs.append((num / den) ** 0.5)
    assert errs[1] < errs[0], errs          # error decreases with the step
    assert errs[1] < 2e-2, errs             # and is small in absolute terms


def test_gradients_close_jit(setup):
    loss_adj, loss_ref = _loss_pair(8, "midpoint", setup)
    ga = jax.jit(jax.grad(loss_adj))(*setup[:3][:1], *setup[1:3])
    gr = jax.jit(jax.grad(loss_ref))(*setup[:3][:1], *setup[1:3])
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=1e-4)


def test_masked_rows_no_contribution(setup):
    params, xs, h0, times, t_start, mask = setup
    mask2 = mask.at[2, :].set(False).at[4, 3:].set(False)
    run_adj = make_adjoint_integrator(field_fn, 2, "midpoint")

    def loss(params):
        hs = run_adj(params, xs, h0, times, t_start, mask2)
        return jnp.sum(hs * mask2[..., None])   # consumers mask outputs

    g = jax.grad(loss)(params)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))
    # a fully-masked row's data can be garbage without poisoning grads
    times_bad = times.at[2, :].set(jnp.nan)

    def loss_bad(params):
        hs = run_adj(params, xs, h0, times_bad, t_start, mask2)
        return jnp.sum(hs * mask2[..., None])

    g2 = jax.grad(loss_bad)(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_h0_cotangent_matches_fd(setup):
    params, xs, h0, times, t_start, mask = setup
    run_adj = make_adjoint_integrator(field_fn, 8, "rk4")
    w = jax.random.normal(jax.random.PRNGKey(2), (N, L, H))

    def loss(h0):
        return jnp.sum(run_adj(params, xs, h0, times, t_start, mask) * w)

    g = jax.grad(loss)(h0)
    eps = 1e-3
    e = jnp.zeros_like(h0).at[1, 2].set(1.0)
    fd = (loss(h0 + eps * e) - loss(h0 - eps * e)) / (2 * eps)
    np.testing.assert_allclose(float(g[1, 2]), float(fd), rtol=2e-2)


def test_multistep_method_rejected():
    with pytest.raises(ValueError, match="euler|midpoint"):
        make_adjoint_integrator(field_fn, 2, "fixed_adams")


def test_apply_xnode_adjoint_full_model():
    # End-to-end on the real XNODE: forward identical to apply_xnode,
    # parameter gradients (lift + field + readout, via h0 cotangent /
    # adjoint ODE / output cotangent respectively) close to
    # autodiff-through-scan at the shipped step sizes.
    from xnode_wan_tpu.config import SolverConfig
    from xnode_wan_tpu.models.xnode import (apply_xnode, apply_xnode_adjoint,
                                            init_xnode)
    from xnode_wan_tpu.ops.sampling import Hypercube
    from xnode_wan_tpu.problems import load_problem

    cfg = SolverConfig(dim=3, N_t=6, N_r=16, N_b=8, u_hidden_dim=8,
                       u_hidden_hidden_dim=8, u_layers=2, min_steps=6,
                       shape_param=(-1.0, 1.0))
    problem = load_problem("cube_pde", dim=3)
    dom = Hypercube(cfg.shape_param, cfg.dim, cfg.T0, cfg.T, cfg.N_t)
    batch = dom.interior(jax.random.PRNGKey(0), cfg.N_r)
    params = init_xnode(jax.random.PRNGKey(1), cfg)

    u_a = apply_xnode_adjoint(params, batch, problem, cfg)
    u_r = apply_xnode(params, batch, problem, cfg)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_r),
                               rtol=1e-5, atol=1e-6)

    tgt = jax.random.normal(jax.random.PRNGKey(2), u_r.shape)

    def loss(apply):
        return lambda p: jnp.mean((apply(p, batch, problem, cfg) - tgt) ** 2)

    ga = jax.grad(loss(apply_xnode_adjoint))(params)
    gr = jax.grad(loss(apply_xnode))(params)
    num = sum(float(jnp.sum((a - b) ** 2))
              for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gr)))
    den = sum(float(jnp.sum(b ** 2)) for b in jax.tree.leaves(gr))
    assert (num / den) ** 0.5 < 0.05


def test_apply_xnode_adjoint_rejects_adaptive():
    from xnode_wan_tpu.config import SolverConfig
    from xnode_wan_tpu.models.xnode import apply_xnode_adjoint

    cfg = SolverConfig(dim=2, solver="dopri5", shape_param=(-1.0, 1.0))
    with pytest.raises(ValueError, match="fixed-step RK"):
        apply_xnode_adjoint(None, None, None, cfg)
