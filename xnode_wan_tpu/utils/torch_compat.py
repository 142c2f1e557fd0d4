"""Interop with the reference's PyTorch checkpoints.

The reference saves ``torch.save(u_net.state_dict(), ...)`` of a
``DataParallel(NeuralODE)`` (reference ``src/training.py:147-149``); the
two XNODE implementations are architecturally identical layer-for-layer
(reference ``src/model.py:54-112`` vs ``models/xnode.py``):

    module.initial_layers.{0,2,4}.{weight,bias} -> params["lift"][0..2]
    module.ODE_rhs.net.{0,2,...}.{weight,bias}  -> params["field"][0..k]
    module.final_linear.{weight,bias}           -> params["readout"]

torch ``nn.Linear`` stores ``weight [out, in]``; this package stores
``w [in, out]`` — transposed on load. The ODE-field input ordering is the
same on both sides (``(x, t, h)``; reference ``src/model.py:153-156``),
so columns map 1:1 when ``fourier_features == 0``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def load_reference_state_dict(path: str, dtype=jnp.float64
                              ) -> Dict[str, Any]:
    """Load a reference ``best_model_weights_NODE.pth`` into an
    ``init_xnode``-shaped pytree (f64 by default — the reference trains in
    float64, ``src/model.py:43,78,85``)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k.removeprefix("module."): v for k, v in sd.items()}

    def layer(prefix):
        w = jnp.asarray(sd[f"{prefix}.weight"].numpy(), dtype=dtype)
        b = jnp.asarray(sd[f"{prefix}.bias"].numpy(), dtype=dtype)
        return {"w": w.T, "b": b}

    lift_ids = sorted({int(k.split(".")[1])
                       for k in sd if k.startswith("initial_layers.")})
    field_ids = sorted({int(k.split(".")[2])
                        for k in sd if k.startswith("ODE_rhs.net.")})
    return {
        "lift": [layer(f"initial_layers.{i}") for i in lift_ids],
        "field": [layer(f"ODE_rhs.net.{i}") for i in field_ids],
        "readout": layer("final_linear"),
    }
