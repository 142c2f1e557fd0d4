"""Minimal functional NN layers over explicit param pytrees.

The models here are tiny MLPs (<= 50 wide, reference ``configs/cube_pde.yaml``);
plain pytrees + ``jnp`` keep them transparent to XLA fusion and trivially
shardable. Initialization matches the reference: Xavier-uniform weights,
zero biases on every linear layer (reference ``src/model.py:12-15``,
``src/training.py:46-49``).
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp


def _fdtype(x64=None) -> jnp.dtype:
    """``x64=None`` follows the global flag; True/False pins per call site
    (solvers with different precisions coexisting in one process)."""
    if x64 is None:
        x64 = jax.config.jax_enable_x64
    return jnp.float64 if x64 else jnp.float32


def linear_init(key: jax.Array, in_dim: int, out_dim: int,
                dtype=None) -> Dict[str, jax.Array]:
    dt = _fdtype() if dtype is None else dtype
    limit = math.sqrt(6.0 / (in_dim + out_dim))
    w = jax.random.uniform(key, (in_dim, out_dim), dtype=dt,
                           minval=-limit, maxval=limit)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype=dt)}


def linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def mlp_init(key: jax.Array, dims: List[int],
             dtype=None) -> List[Dict[str, jax.Array]]:
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, a, b, dtype=dtype)
            for k, a, b in zip(keys, dims[:-1], dims[1:])]
