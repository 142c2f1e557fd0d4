"""Continuous-adjoint backward pass for the fixed-step path integrator.

The reference exposes torchdiffeq's ``odeint_adjoint``
(``src/model.py:8,103``): instead of differentiating through the solver's
unrolled steps, the backward pass *integrates the adjoint ODE backward in
time* (Chen et al. 2018),

    dh/dt      = f(t, h)
    dlambda/dt = -lambda^T df/dh
    dg_theta/dt = -lambda^T df/dtheta,

reconstructing ``h`` on the fly — O(1) activation memory in the number of
integration steps, at the price of (a) one extra forward integration's
worth of field evaluations and (b) gradients that are consistent only up
to the discretization error (they are NOT the exact derivative of the
discrete forward pass, unlike autodiff-through-scan or remat).

This module is that algorithm, TPU-native: one reverse ``lax.scan`` over
the ``L`` sample intervals; within each interval the *augmented* system is
integrated backward with the same fixed-step scheme on a per-row
unit-time parametrization (``tau in [0,1]``, scalar substep — per-row
``dt`` folds into the dynamics, so the parameter cotangent accumulates
with the correct per-row quadrature weight via one batched ``jax.vjp``
per stage). Sample states ``hs[l]`` are reused from the forward output
(they are materialized anyway as the integrator's return value), so the
backward reconstruction only spans one interval at a time and cannot
drift across intervals.

Where it is used: ``benchmarks/ab_adjoint.py`` A/Bs this against
``jax.checkpoint`` remat (the default meaning of ``adjoint: true``,
``models/xnode.py``) at L=20..200. The structural reason remat stays the
default for *training*: the weak-form loss needs pointwise spatial
gradients of u via **forward-mode** tangents through the integrator
(``ops/weak_form.py::u_with_spatial_grad``), and a ``jax.custom_vjp``
function cannot be ``jvp``-ed — JAX raises ``TypeError`` — so the
continuous adjoint composes with the serving/metric paths and with
plain reverse-mode losses, not with the fused forward-over-reverse
training objective. See docs/DESIGN.md.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

# field_fn(params, xs, t, h) -> dh/dt, batched over rows:
#   params: pytree, xs: [N, F] frozen spatial features, t: [N], h: [N, H]
FieldFn = Callable


def _tree_axpy(a, x, y):
    """y + a * x over matching pytrees (a scalar)."""
    return jax.tree.map(lambda xi, yi: yi + a * xi, x, y)


def _rk_tree_step(method: str, G, tau, S, dtau):
    """One fixed step of ``method`` on pytree state ``S`` with scalar
    ``dtau`` (the unit-time interval parametrization makes the step
    scalar even though per-row dt differs)."""
    if method == "euler":
        return _tree_axpy(dtau, G(tau, S), S)
    if method == "midpoint":
        k1 = G(tau, S)
        return _tree_axpy(dtau, G(tau + 0.5 * dtau,
                                  _tree_axpy(0.5 * dtau, k1, S)), S)
    if method == "heun":
        k1 = G(tau, S)
        k2 = G(tau + dtau, _tree_axpy(dtau, k1, S))
        half = jax.tree.map(lambda a, b: 0.5 * (a + b), k1, k2)
        return _tree_axpy(dtau, half, S)
    if method == "rk4":
        k1 = G(tau, S)
        k2 = G(tau + 0.5 * dtau, _tree_axpy(0.5 * dtau, k1, S))
        k3 = G(tau + 0.5 * dtau, _tree_axpy(0.5 * dtau, k2, S))
        k4 = G(tau + dtau, _tree_axpy(dtau, k3, S))
        comb = jax.tree.map(
            lambda a, b, c, d: (a + 2 * b + 2 * c + d) / 6.0, k1, k2, k3, k4)
        return _tree_axpy(dtau, comb, S)
    raise ValueError(
        f"continuous adjoint supports the RK fixed-step methods "
        f"(euler|midpoint|heun|rk4), not {method!r} — multistep history "
        f"does not transfer to the backward-in-time augmented system")


def make_adjoint_integrator(field_fn: FieldFn, n_sub: int, method: str):
    """Build ``integrate(params, xs, h0, times, t_start, mask) -> hs`` whose
    backward pass is the continuous adjoint above.

    The forward pass is numerically IDENTICAL to
    :func:`ops.integrate.integrate` (same stepper, same masked-interval
    scan); only the derivative rule differs. Cotangents are produced for
    ``params``, ``xs`` and ``h0``; the sample times/mask are treated as
    constants (zero cotangent), matching their role as Monte-Carlo
    quadrature nodes.
    """
    from xnode_wan_tpu.ops.integrate import integrate

    # validate the method once at build time, not inside the trace
    if method not in ("euler", "midpoint", "heun", "rk4"):
        raise ValueError(
            f"continuous adjoint supports euler|midpoint|heun|rk4, "
            f"not {method!r}")

    @jax.custom_vjp
    def run(params, xs, h0, times, t_start, mask):
        def field(t, h):
            return field_fn(params, xs, t, h)
        return integrate(field, h0, times, t_start, mask, n_sub=n_sub,
                         method=method, remat=False, unroll=1)

    def fwd(params, xs, h0, times, t_start, mask):
        hs = run(params, xs, h0, times, t_start, mask)
        return hs, (params, xs, hs, times, t_start, mask)

    def bwd(res, g_hs):
        params, xs, hs, times, t_start, mask = res
        n, L = times.shape
        dtype = hs.dtype

        # Per-sample "previous valid time" (the forward scan's t_prev at
        # each step): t_start before the first valid sample, else the
        # last valid sample time before l.
        def prev_scan(prev, inp):
            t_l, m_l = inp
            out = prev
            prev = jnp.where(m_l, t_l, prev)
            return prev, out
        _, t_prev = jax.lax.scan(
            prev_scan, jnp.asarray(t_start, dtype),
            (jnp.moveaxis(times, 1, 0), jnp.moveaxis(mask, 1, 0)))
        t_prev = jnp.moveaxis(t_prev, 0, 1)                     # [N, L]

        g_params0 = jax.tree.map(jnp.zeros_like, params)
        g_xs0 = jnp.zeros_like(xs)
        lam0 = jnp.zeros_like(hs[:, 0, :])
        dtau = 1.0 / n_sub

        def interval_bwd(carry, inp):
            lam, g_params, g_xs = carry
            t_l, tp_l, m_l, h_l, gbar_l = inp
            # the cotangent of output l attaches to lambda at its
            # (stale-aware) position — see the induction in the module
            # docstring of training.py's caller chain
            lam = lam + gbar_l
            # masked rows may carry garbage (even NaN) times; dt_row = 0
            # makes their integration a no-op, but the field would still
            # see the garbage t and 0 * NaN poisons the row-summed
            # parameter cotangent — sanitize t on masked rows first
            t_l = jnp.where(m_l, t_l, 0.0)
            dt_row = jnp.where(m_l, jnp.maximum(t_l - tp_l, 0.0), 0.0)

            def G(tau, S):
                h, lam_s, gp, gx = S
                t = t_l - tau * dt_row                          # [N]
                f_val, vjp_fn = jax.vjp(
                    lambda p, xx, hh: field_fn(p, xx, t, hh),
                    params, xs, h)
                # per-row dt folds into the cotangent, so gh carries the
                # correct lambda dynamics scaling AND the parameter/space
                # cotangents accumulate with the per-row quadrature weight
                gp_d, gx_d, gh = vjp_fn(lam_s * dt_row[:, None])
                return (-dt_row[:, None] * f_val, gh, gp_d, gx_d)

            S = (h_l, lam, g_params, g_xs)
            for k in range(n_sub):
                S = _rk_tree_step(method, G, k * dtau, S, dtau)
            _, lam_new, g_params_new, g_xs_new = S
            # dt_row == 0 on invalid rows makes the integration a no-op
            # there, but keep the explicit select for exactness under
            # non-finite garbage times on masked rows
            lam = jnp.where(m_l[:, None], lam_new, lam)
            return (lam, g_params_new, g_xs_new), None

        seq = (jnp.moveaxis(times, 1, 0)[::-1],
               jnp.moveaxis(t_prev, 1, 0)[::-1],
               jnp.moveaxis(mask, 1, 0)[::-1],
               jnp.moveaxis(hs, 1, 0)[::-1],
               jnp.moveaxis(g_hs, 1, 0)[::-1])
        (lam, g_params, g_xs), _ = jax.lax.scan(
            interval_bwd, (lam0, g_params0, g_xs0), seq)
        import numpy as np
        g_mask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
        return (g_params, g_xs, lam, jnp.zeros_like(times),
                jnp.zeros_like(t_start), g_mask)

    run.defvjp(fwd, bwd)
    return run
