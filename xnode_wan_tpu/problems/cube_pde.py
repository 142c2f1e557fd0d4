"""The paper's d=5 hypercube test problem (reference ``configs/cube_pde_funcs.py``).

Exact solution ``u = 2 sin(pi/2 x_1) cos(pi/2 x_2) e^{-t}`` of
``u_t - Lap(u) - u^2 = f`` on ``[-1, 1]^d x [0, 1]`` with ``a = I``,
``b = 0``, nonlinear reaction ``c(X, u) = -u`` (so ``c u = -u^2``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from xnode_wan_tpu.problems import Problem

_HALF_PI = math.pi / 2


def u_sol(X):
    return (2.0 * jnp.sin(_HALF_PI * X[..., 1]) * jnp.cos(_HALF_PI * X[..., 2])
            * jnp.exp(-X[..., 0]))


def f(X):
    sincos = jnp.sin(_HALF_PI * X[..., 1]) * jnp.cos(_HALF_PI * X[..., 2])
    return ((math.pi ** 2 - 2.0) * sincos * jnp.exp(-X[..., 0])
            - 4.0 * sincos ** 2 * jnp.exp(-2.0 * X[..., 0]))


def g(X):
    return u_sol(X)


def h(X):
    # Initial data: u_sol at t = T0 = 0 (reference func_h takes the full
    # (t, x) first point, configs/cube_pde_funcs.py:17-18).
    return 2.0 * jnp.sin(_HALF_PI * X[..., 1]) * jnp.cos(_HALF_PI * X[..., 2])


def c(X, u):
    return -u


PROBLEM = Problem(
    name="cube_pde",
    h=h, f=f, g=g, c=c,
    a_kind="isotropic",  # reference func_a is the identity matrix
    b=None,              # reference func_b is zero
    u_sol=u_sol,
)


def get_problem(dim=None):
    del dim  # the solution only involves x_1, x_2 — any dim >= 2 works
    return PROBLEM
