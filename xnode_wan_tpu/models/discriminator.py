"""Adversarial test-function network v_phi(t, x).

Reference: ``src/model.py:18-51`` — ``Linear(d+1 -> v_hidden)`` followed by
``v_layers`` repetitions of ``[ReLU, hidden]`` where ``hidden`` is a *single
shared* ``nn.Linear`` instance (weights tied across depth,
``src/model.py:37-39``), then ``Tanh`` and ``Linear(-> 1)``.

``tied=True`` (default) preserves that weight-tying; ``tied=False`` gives the
idiomatic untied stack.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from xnode_wan_tpu.models.layers import linear, linear_init, mlp_init


def init_discriminator(key: jax.Array, dim: int, v_hidden: int, v_layers: int,
                       tied: bool = True, n_freq: int = 0,
                       dtype=None) -> Dict[str, Any]:
    k_in, k_hid, k_out = jax.random.split(key, 3)
    hidden = (linear_init(k_hid, v_hidden, v_hidden, dtype=dtype) if tied else
              mlp_init(k_hid, [v_hidden] * (v_layers + 1), dtype=dtype))
    in_dim = 1 + dim * (1 + 2 * n_freq)
    return {
        "inp": linear_init(k_in, in_dim, v_hidden, dtype=dtype),
        "hidden": hidden,
        "out": linear_init(k_out, v_hidden, 1, dtype=dtype),
    }


def apply_discriminator(params: Dict[str, Any], pts: jax.Array,
                        v_layers: int, tied: bool = True,
                        n_freq: int = 0) -> jax.Array:
    """Evaluate v at points ``pts [..., d+1]`` -> ``[...]``.

    ``n_freq > 0`` appends ``sin/cos(k pi/2 x)`` banks to the spatial
    coordinates (``v_fourier_features`` config) — in high dimension the
    adversary must resolve oscillatory residual structure (e.g. the d=20
    product-of-sines target) that raw-coordinate ReLU stacks represent
    poorly.
    """
    if n_freq > 0:
        from xnode_wan_tpu.models.xnode import spatial_features
        pts = jnp.concatenate(
            [pts[..., :1], spatial_features(pts[..., 1:], n_freq)], axis=-1)
    z = linear(params["inp"], pts)
    for i in range(v_layers):
        layer = params["hidden"] if tied else params["hidden"][i]
        z = linear(layer, jax.nn.relu(z))
    z = linear(params["out"], jnp.tanh(z))
    return z[..., 0]
