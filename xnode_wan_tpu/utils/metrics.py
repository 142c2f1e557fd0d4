"""Error metrics: masked L^p norms and relative error.

Reference: ``utils/auxillary_funcs.py:7-30`` — ``L_norm`` =
``(V * mean |u_sol - u_net|^p)^{1/p}`` with ragged groups weighted
``n_k / N_r``, and ``rel_err = L_norm(err) / L_norm(sol)`` (the paper's
headline metric, early-stopped at < 0.01). The masked versions below are
identical on the hypercube and the honest uniform-over-domain estimator on
the ragged domains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_lp(vals: jax.Array, mask: jax.Array, volume, p: float) -> jax.Array:
    """``(V * sum |vals|^p mask / sum mask)^{1/p}``."""
    m = mask.astype(vals.dtype)
    mean = jnp.sum(jnp.abs(vals) ** p * m) / jnp.maximum(m.sum(), 1.0)
    return (volume * mean) ** (1.0 / p)


def l_norm(u_vals: jax.Array, sol_vals: jax.Array, mask: jax.Array,
           volume, p: float, error: bool = True) -> jax.Array:
    f = (sol_vals - u_vals) if error else sol_vals
    return masked_lp(f, mask, volume, p)


def rel_err(u_vals: jax.Array, sol_vals: jax.Array, mask: jax.Array,
            volume, p: float) -> jax.Array:
    return (l_norm(u_vals, sol_vals, mask, volume, p)
            / l_norm(u_vals, sol_vals, mask, volume, p, error=False))


def l_norm_reference_api(batch, u_apply_fn, p: float, func_u_sol,
                         volume, n_r: int, error: bool = True) -> jax.Array:
    """Reference-signature shim (``L_norm(X, u_net, p, func_u_sol, volume,
    N_r)``, reference ``utils/auxillary_funcs.py:7-22``) over a
    :class:`PathBatch` instead of ragged group lists."""
    del n_r  # masked weighting supersedes the reference's n_k/N_r weights
    u_vals = u_apply_fn(batch)
    return l_norm(u_vals, func_u_sol(batch.x), batch.mask, volume, p,
                  error=error)
