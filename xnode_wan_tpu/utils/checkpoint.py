"""Checkpoint save/restore.

The reference only ever saves the primal net's ``state_dict`` (best-by-loss,
``src/training.py:147-149``) and has **no load path**. Here the full training
state — primal params, adversarial params, both Adam states, PRNG key and
step — round-trips through msgpack (``flax.serialization``), enabling
``--resume`` (SURVEY §5 checkpoint/resume plan). The best-primal-weights
file keeps a reference-style name (``best_model_weights_NODE.msgpack``).
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def save(path: str, pytree: Any) -> None:
    data = serialization.to_bytes(jax.device_get(pytree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)


def load(path: str, target: Any) -> Any:
    with open(path, "rb") as fh:
        return serialization.from_bytes(target, fh.read())
