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


def _fdtype() -> jnp.dtype:
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def linear_init(key: jax.Array, in_dim: int, out_dim: int) -> Dict[str, jax.Array]:
    limit = math.sqrt(6.0 / (in_dim + out_dim))
    w = jax.random.uniform(key, (in_dim, out_dim), dtype=_fdtype(),
                           minval=-limit, maxval=limit)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype=_fdtype())}


def linear(p: Dict[str, jax.Array], x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def mlp_init(key: jax.Array, dims: List[int]) -> List[Dict[str, jax.Array]]:
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, a, b) for k, a, b in zip(keys, dims[:-1], dims[1:])]
