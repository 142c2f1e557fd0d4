"""Fixed-step ODE integration along path time grids as one masked ``lax.scan``.

Replaces the reference's torchdiffeq ``odeint``/``odeint_adjoint`` calls over
``fillt``-densified, possibly ragged per-group grids
(reference ``src/model.py:103-106``, ``src/dataset.py:13-32``) with a single
static-shape scan:

* the scan walks the ``L`` sample times; each interval ``[t_{l-1}, t_l]`` is
  integrated with ``n_sub`` equal substeps of a fixed-step scheme
  (euler/midpoint/heun/rk4 — the torchdiffeq fixed-grid methods). Because
  sample grids are stratified (see ``ops/sampling.py``), a static ``n_sub``
  guarantees the reference's fillt invariant (step ``<= (T-T0)/min_steps``).

* masking handles everything the reference does with raggedness and
  ``bound_pad``: per-path start times (boundary re-entry), per-path exit
  (shrinking domains) and single-point paths all run through the same scan —
  invalid steps leave the carried state untouched.

* ``remat=True`` wraps each scan step in ``jax.checkpoint``: the TPU-native
  analogue of the reference's ``odeint_adjoint`` option (O(1)-in-depth
  activation memory on the backward pass).

The per-step field evaluations are whole-batch ``[N, H + d + 1]`` matmuls, so
the MXU sees one large GEMM per substep instead of the reference's per-group
Python loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Field = Callable[[jax.Array, jax.Array], jax.Array]  # (t [N], h [N,H]) -> [N,H]


def _euler(field: Field, t, h, dt):
    return h + dt * field(t, h)


def _midpoint(field: Field, t, h, dt):
    k1 = field(t, h)
    return h + dt * field(t + 0.5 * dt[:, 0], h + 0.5 * dt * k1)


def _heun(field: Field, t, h, dt):
    k1 = field(t, h)
    k2 = field(t + dt[:, 0], h + dt * k1)
    return h + 0.5 * dt * (k1 + k2)


def _rk4(field: Field, t, h, dt):
    dt_ = dt[:, 0]
    k1 = field(t, h)
    k2 = field(t + 0.5 * dt_, h + 0.5 * dt * k1)
    k3 = field(t + 0.5 * dt_, h + 0.5 * dt * k2)
    k4 = field(t + dt_, h + dt * k3)
    return h + dt * (k1 + 2 * k2 + 2 * k3 + k4) / 6.0


STEPPERS = {"euler": _euler, "midpoint": _midpoint, "heun": _heun, "rk4": _rk4}


def integrate(
    field: Field,
    h0: jax.Array,        # [N, H] initial hidden state at t_start
    times: jax.Array,     # [N, L] per-path sample times (sorted where valid)
    t_start: jax.Array,   # [N]
    mask: jax.Array,      # [N, L] bool sample validity
    n_sub: int,
    method: str = "midpoint",
    remat: bool = False,
    unroll: int = 0,
) -> jax.Array:
    """Integrate ``dh/dt = field(t, h)`` to every valid sample time.

    ``unroll=0`` fully unrolls the scan (fastest at the shipped L<=20;
    measured 16.3 -> 13.3 ms per d=5 outer iteration vs unroll=4).
    Returns ``hs [N, L, H]``: the hidden state at each sample time (stale
    carry at masked-invalid positions — callers mask them out).
    """
    if unroll <= 0:
        unroll = times.shape[1]
    stepper = STEPPERS[method]

    def interval(h, t0, t1):
        # dt is clamped at 0 so masked (discarded) steps can't poison
        # gradients through jnp.where with NaN/garbage.
        dt = (jnp.maximum(t1 - t0, 0.0) / n_sub)[:, None]
        for k in range(n_sub):
            h = stepper(field, t0 + k * dt[:, 0], h, dt)
        return h

    def step(carry, inp):
        h, t_prev = carry
        t_l, m_l = inp
        h_new = interval(h, t_prev, t_l)
        h = jnp.where(m_l[:, None], h_new, h)
        t_prev = jnp.where(m_l, t_l, t_prev)
        return (h, t_prev), h

    if remat:
        step = jax.checkpoint(step)

    xs = (jnp.moveaxis(times, 1, 0), jnp.moveaxis(mask, 1, 0))
    _, hs = jax.lax.scan(step, (h0, jnp.asarray(t_start, h0.dtype)), xs,
                         unroll=min(unroll, times.shape[1]))
    return jnp.moveaxis(hs, 0, 1)
