"""Vanilla-WAN primal network: a plain pointwise MLP u_theta(t, x).

The paper's comparison baseline (reference ``README.md:6-8``): same weak
adversarial training, but the primal net is an ordinary DNN instead of the
data-seeded neural ODE. Exposes the same ``apply(params, batch, ...)``
surface as ``models/xnode.py`` so the trainer is model-agnostic
(``primal: "wan"`` in the config selects it).

Architecture: ``Linear(d+1, H) -> [Tanh, Linear(H, H)] * u_layers ->
Linear(H, 1)`` with Xavier init, mirroring the WAN literature's tanh MLPs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.models.layers import linear, mlp_init
from xnode_wan_tpu.ops.sampling import PathBatch


def init_wan(key: jax.Array, cfg: SolverConfig) -> Dict[str, Any]:
    h, d = cfg.u_hidden_dim, cfg.dim
    dt = jnp.float64 if cfg.x64 else jnp.float32
    return {"net": mlp_init(key, [d + 1] + [h] * (cfg.u_layers + 1) + [1],
                            dtype=dt)}


def _mlp(params: Dict[str, Any], pts: jax.Array) -> jax.Array:
    layers = params["net"]
    z = linear(layers[0], pts)
    for layer in layers[1:]:
        z = linear(layer, jnp.tanh(z))
    return z[..., 0]


def apply_wan(params: Dict[str, Any], batch: PathBatch, problem,
              cfg: SolverConfig) -> jax.Array:
    del problem
    scale = cfg.u_scale_eff
    return _mlp(params, batch.x) * scale


def evaluate_points(params: Dict[str, Any], pts: jax.Array, problem,
                    cfg: SolverConfig, k_steps: int | None = None,
                    domain=None, mesh=None) -> jax.Array:
    del problem, k_steps, domain  # plain MLP evaluates anywhere directly
    scale = cfg.u_scale_eff
    if mesh is not None and cfg.data_axis in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P
        pts = jax.lax.with_sharding_constraint(
            pts, NamedSharding(mesh, P(cfg.data_axis, None)))
    return _mlp(params, pts) * scale
