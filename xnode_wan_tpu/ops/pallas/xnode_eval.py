"""Pallas TPU kernel: fully-fused XNODE pointwise evaluation (serving path).

Evaluating the trained solution at M arbitrary space-time points — the
inference workload behind contour plots, error metrics and downstream
consumers (reference ``README.md:32-35`` point eval, ``proj`` meshes,
``L_norm``) — integrates a fresh ODE per point. The XLA scan path
(``models/xnode.py::evaluate_points``) launches one fused loop per call but
still round-trips the carried state between scan iterations; this kernel
fuses the *entire* pipeline per block of points in VMEM:

    seed -> lift MLP -> K midpoint steps of the field MLP -> readout

with every weight matrix resident in VMEM (the nets are <= 50 wide; all
weights together are a few tens of KB) and one HBM write per point. Grid =
M / BLOCK over the point axis; each step's matmuls are ``[BLOCK, ~26]``
GEMMs on the MXU.

Gradients are not needed here (serving), so no custom VJP: the training
path keeps the differentiable ``lax.scan`` integrator.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512


def _flatten_params(params: Dict[str, Any]) -> List[jax.Array]:
    flat = []
    for layer in params["lift"]:
        flat += [layer["w"], layer["b"]]
    for layer in params["field"]:
        flat += [layer["w"], layer["b"]]
    flat += [params["readout"]["w"], params["readout"]["b"]]
    return flat


def _kernel(n_lift: int, n_field: int, k_steps: int, t0: float,
            pts_ref, seed_ref, *refs):
    weight_refs = refs[:-1]
    out_ref = refs[-1]

    def dot(a, w_ref, b_ref):
        return (jnp.dot(a, w_ref[:], preferred_element_type=jnp.float32)
                + b_ref[:])

    wi = 0

    def next_layer():
        nonlocal wi
        w, b = weight_refs[wi], weight_refs[wi + 1]
        wi += 2
        return w, b

    x = pts_ref[:, 1:]                       # [B, d]
    t_target = pts_ref[:, 0]                 # [B]

    # lift MLP: Linear, (ReLU, Linear)* (reference src/model.py:78)
    h = dot(seed_ref[:], *next_layer())
    for _ in range(n_lift - 1):
        h = dot(jax.nn.relu(h), *next_layer())

    # field MLP weights, loaded once per block
    field_layers = [next_layer() for _ in range(n_field)]

    def field(t, hh):
        z = jnp.concatenate([x, t[:, None], hh], axis=-1)
        z = dot(z, *field_layers[0])
        for wl in field_layers[1:-1]:
            z = dot(jax.nn.relu(z), *wl)
        return dot(jnp.tanh(z), *field_layers[-1])

    dt = (t_target - t0) / k_steps           # [B] per-point step size
    dtc = dt[:, None]
    for k in range(k_steps):                 # static unroll, all in VMEM
        t = t0 + k * dt
        k1 = field(t, h)
        h = h + dtc * field(t + 0.5 * dt, h + 0.5 * dtc * k1)

    u = dot(h, *next_layer())                # readout [B, 1]
    out_ref[:] = u


def fused_evaluate(params: Dict[str, Any], pts: jax.Array, seed: jax.Array,
                   k_steps: int, t0: float = 0.0,
                   interpret: bool = False) -> jax.Array:
    """Evaluate u at points ``pts [M, C]`` with seeds ``seed [M]``.

    ``seed`` is the problem's h/g data at each point's path origin
    (computed outside — problem callables are user code and stay in JAX).
    Returns ``u [M]``. M is padded internally to a multiple of BLOCK.
    """
    m, c = pts.shape
    m_pad = -(-m // BLOCK) * BLOCK
    if m_pad != m:
        pts = jnp.concatenate(
            [pts, jnp.zeros((m_pad - m, c), pts.dtype)], axis=0)
        seed = jnp.concatenate(
            [seed, jnp.zeros((m_pad - m,), seed.dtype)], axis=0)

    flat = _flatten_params(params)
    n_lift = len(params["lift"])
    n_field = len(params["field"])

    kernel = functools.partial(_kernel, n_lift, n_field, k_steps, float(t0))
    grid = (m_pad // BLOCK,)
    block = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        grid=grid,
        in_specs=[block((BLOCK, c)), block((BLOCK, 1))]
                 + [full(a) for a in flat],
        out_specs=block((BLOCK, 1)),
        interpret=interpret,
    )(pts.astype(jnp.float32), seed.astype(jnp.float32)[:, None],
      *[a.astype(jnp.float32) for a in flat])
    return out[:m, 0]
