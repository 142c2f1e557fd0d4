"""Randomized quasi-Monte-Carlo (shifted scrambled Halton) sample clouds.

The weak-form objective, its gradients, and the per-iteration relative-L^p
metric are all Monte-Carlo estimates over a fresh interior cloud
(reference ``src/dataset.py:246-255``, ``src/loss.py:46-76``). Their MC
variance is what makes the late training trajectory oscillate around the
stop tolerance and delays the 1% crossing. Replacing the i.i.d. uniform
cloud with a *randomized* low-discrepancy set is a pure estimator-variance
reduction: for the smooth integrands here, error decays ~N^-1 (log factors)
instead of N^-1/2, at zero additional per-step device cost.

Construction (Cranley-Patterson rotation):

* a **scrambled Halton** base set ``H in [0,1)^{n x d}`` is generated once
  per (n, d) on the host at trace time and baked into the compiled program
  as a constant (4000 x 50 f32 = 800 KB worst case — negligible),
* each iteration draws one uniform **shift** ``s ~ U[0,1)^d`` from the
  training PRNG key and uses ``frac(H + s)`` — fresh randomness per
  iteration, unbiased for any integrand, variance bounded by the QMC
  discrepancy.

The base set is a vendored *generalized (scrambled) Halton*: per
dimension and per digit position, a random permutation (with 0 fixed) of
the digits is applied inside the radical inverse — digit scrambling kills
the raw Halton correlations between high-prime dimensions, which matter
at d >= 20. The permutations come from ``np.random.RandomState(0)``, the
legacy generator whose bit stream numpy freezes forever, so the base is a
pure function of (n, d) **in every environment** — no scipy (or any
version-dependent library) in the construction. Determinism: the sampled
cloud is therefore a pure function of the PRNG key; checkpoints/resume
and multi-host replay behave exactly as with pseudo-random sampling,
including across machines with different installed packages.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59,
           61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127,
           131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181, 191, 193,
           197, 199, 211, 223, 227, 229, 233]  # 51 primes: covers the
# d+1 columns qmc_ball needs at the largest (d=50) scenario dimension


def _scrambled_radical_inverse(indices: np.ndarray, base: int,
                               perms: np.ndarray) -> np.ndarray:
    """Digit-scrambled van der Corput radical inverse in ``base`` (f64).

    ``perms [n_digits, base]`` maps the digit at each position through its
    own permutation; every permutation fixes 0, so the (infinite) trailing
    zero digits contribute nothing and truncation is exact.
    """
    idx = indices.astype(np.int64)
    out = np.zeros(idx.shape, dtype=np.float64)
    f = 1.0 / base
    k = 0
    while idx.max(initial=0) > 0:
        out += f * perms[k][idx % base]
        idx //= base
        f /= base
        k += 1
    return out


@functools.lru_cache(maxsize=16)
def halton_base(n: int, dim: int) -> np.ndarray:
    """Scrambled-Halton base set ``[n, dim]`` in [0,1) (host, cached).

    A pure function of (n, dim) in every environment: the per-dimension,
    per-digit-position scrambling permutations are drawn from the frozen
    ``np.random.RandomState(0)`` stream (dimension-major order). Covers
    ``dim <= 51`` — the d+1 columns ``qmc_ball`` needs at the largest
    supported scenario dimension d=50.
    """
    if dim > len(_PRIMES):
        raise ValueError(
            f"halton_base: dim={dim} exceeds the built-in prime table "
            f"({len(_PRIMES)})")
    rs = np.random.RandomState(0)
    idx = np.arange(1, n + 1)  # skip the all-zeros point
    cols = []
    for p in _PRIMES[:dim]:
        n_digits = 1
        while p ** n_digits <= n:
            n_digits += 1
        perms = np.stack([
            np.concatenate(([0], 1 + rs.permutation(p - 1)))
            for _ in range(n_digits)])
        cols.append(_scrambled_radical_inverse(idx, p, perms))
    return np.stack(cols, axis=1)


def qmc_uniform(key: jax.Array, n: int, dim: int, dtype,
                minval=0.0, maxval=1.0) -> jax.Array:
    """Shifted-Halton ``[n, dim]`` draw in ``[minval, maxval)``.

    Drop-in for ``jax.random.uniform(key, (n, dim), ...)``: the base set
    is a trace-time constant; ``key`` only feeds the d-dimensional
    Cranley-Patterson shift, so equal keys give equal batches and fresh
    keys give fresh (unbiased) randomizations.
    """
    base = jnp.asarray(halton_base(n, dim), dtype=dtype)
    shift = jax.random.uniform(key, (dim,), dtype=dtype)
    u01 = jnp.mod(base + shift[None, :], 1.0)
    return minval + (maxval - minval) * u01


def _gauss_dirs(u: jax.Array) -> jax.Array:
    """Uniform directions on S^{d-1} from uniform columns ``u [n, d]``.

    Per-coordinate inverse normal CDF then normalization — the standard
    smooth (monotone per coordinate) QMC map to the sphere; low
    discrepancy in the cube carries through to the direction measure.
    ``ndtri`` diverges at {0, 1}: the shifted base never hits 1 exactly
    but ``mod`` can return an exact 0 — clamp into the open interval.
    """
    tiny = 1e-7 if u.dtype == jnp.float32 else 1e-15
    from jax.scipy.special import ndtri
    g = ndtri(jnp.clip(u, tiny, 1.0 - tiny))
    return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-20)


def qmc_ball(key: jax.Array, n: int, dim: int, radius: float,
             dtype) -> jax.Array:
    """RQMC uniform draw in the ``dim``-ball of ``radius``.

    ``dim + 1`` shifted-Halton columns: the first ``dim`` map to a
    direction (``_gauss_dirs``), the last to the radial inverse CDF
    ``U^{1/d}``. Mirrors ``sampling._ball`` (same off-origin clamp: an
    exact radial 0 makes ``grad ||x||`` NaN and poisons the loss).
    """
    u = qmc_uniform(key, n, dim + 1, dtype)
    dirs = _gauss_dirs(u[:, :dim])
    ur = jnp.maximum(u[:, dim:], 1e-6)
    return radius * dirs * ur ** (1.0 / dim)


def qmc_time_sphere(key: jax.Array, n: int, dim: int, dtype):
    """RQMC pair for moving-domain boundary clouds: a scalar uniform
    column ``u [n]`` (fed to the caller's time inverse CDF — a monotone
    map, so the 1-D low discrepancy survives) plus matched directions
    ``dirs [n, dim]`` from the remaining columns."""
    u = qmc_uniform(key, n, dim + 1, dtype)
    return u[:, 0], _gauss_dirs(u[:, 1:])
