"""PDE coefficient evaluation with structure exploitation.

The reference materializes dense ``a[d, d, N, L]`` and ``b[d, N, L]`` tensors
by Python loops over ``product(range(d), repeat=2)`` on detached batch copies
(reference ``src/training.py:13-43`` ``func_eval``) — O(d^2 N L) memory, the
d=20-50 scaling bottleneck flagged in the survey.

Here problems declare the *structure* of the diffusion matrix
(``a_kind``: zero / isotropic / diagonal / full), and the quadrature
contraction ``sum_ij a_ij d_i(phi) d_j(u)`` only ever touches what exists:

* isotropic: one ``[N, L]`` field times an inner product,
* diagonal:  a ``[N, L, d]`` field, elementwise,
* full:      an einsum against ``[N, L, d, d]`` (only if truly dense).

A compatibility adapter accepts reference-style ``func_a(X, i, j)`` /
``func_b(X, i)`` entry callables and stacks them (the i,j loop runs at trace
time; XLA constant-folds structured cases).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def diffusion_term(problem, X: jax.Array, dphi_x: jax.Array,
                   du: jax.Array) -> jax.Array:
    """``sum_ij a_ij d_i(phi) d_j(u)`` -> ``[N, L]``.

    Index convention from the reference (``src/loss.py:66-68``):
    ``a[i, j] * dphi_{i+1} * du_{j+1}``.
    """
    kind = problem.a_kind
    if kind == "zero" or problem.a is None:
        return jnp.zeros(X.shape[:-1], dphi_x.dtype)
    a = problem.a(X)
    if kind == "isotropic":
        return jnp.asarray(a) * jnp.sum(dphi_x * du, axis=-1)
    if kind == "diagonal":
        return jnp.sum(jnp.asarray(a) * dphi_x * du, axis=-1)
    if kind == "full":
        return jnp.einsum("...ij,...i,...j->...", a, dphi_x, du)
    raise ValueError(f"unknown a_kind {kind!r}")


def drift_term(problem, X: jax.Array, phi: jax.Array,
               du: jax.Array) -> jax.Array:
    """``sum_i b_i phi d_i(u)`` -> ``[N, L]`` (reference ``src/loss.py:69``)."""
    if problem.b is None:
        return jnp.zeros(X.shape[:-1], phi.dtype)
    b = problem.b(X)  # [..., d]
    return phi * jnp.sum(b * du, axis=-1)


def full_a_from_entries(func_a: Callable, dim: int) -> Callable:
    """Reference-style ``func_a(X, i, j)`` -> dense ``a(X) [..., d, d]``.

    The (i, j) loop runs once at trace time (vs the reference's per-step
    Python loop, ``src/training.py:32-35``).
    """
    def a(X):
        rows = [jnp.stack([jnp.asarray(func_a(X, i, j)) for j in range(dim)],
                          axis=-1) for i in range(dim)]
        return jnp.stack(rows, axis=-2)
    return a


def b_from_entries(func_b: Optional[Callable], dim: int) -> Optional[Callable]:
    """Reference-style ``func_b(X, i)`` -> ``b(X) [..., d]``."""
    if func_b is None:
        return None

    def b(X):
        return jnp.stack([jnp.asarray(func_b(X, i)) for i in range(dim)],
                         axis=-1)
    return b
