"""A/B: continuous-adjoint backward vs jax.checkpoint remat vs plain scan.

Round-4 VERDICT item 8: the reference exposes ``odeint_adjoint``
(``src/model.py:8,103``); here ``adjoint: true`` maps to per-step remat.
This harness measures the actual trade at the shipped model shapes
(d=5 XNODE field, N=4000 paths, H=20) across path lengths L=20..200:

* wall-clock of one jitted ``value_and_grad`` step (timed to a device
  fetch of the loss — under the axon relay ``block_until_ready`` returns
  early; see benchmarks/profile_step.py),
* compiler-reported temp memory (``compiled.memory_analysis()`` —
  deterministic, no allocator noise),

for three backward strategies through the SAME forward integrator:
``remat`` (jax.checkpoint per scan step — the shipped ``adjoint: true``),
``noremat`` (store all activations), and ``adjoint`` (the continuous
adjoint of ops/adjoint.py — O(1) activations, gradients exact only up to
discretization error).

Writes benchmarks/ab_adjoint.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

N = int(os.environ.get("AB_N", 4000))
H = 20
HH = 10
D = 5
LAYERS = 8
N_SUB = 1
REPS = int(os.environ.get("AB_REPS", 5))


def main():
    import jax
    import jax.numpy as jnp

    from xnode_wan_tpu.models.layers import mlp_init
    from xnode_wan_tpu.ops.adjoint import make_adjoint_integrator
    from xnode_wan_tpu.ops.integrate import integrate

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = mlp_init(k1, [H + D + 1] + [HH] * LAYERS + [H])
    xs = jax.random.uniform(k2, (N, D), minval=-1.0, maxval=1.0)
    h0 = 0.1 * jax.random.normal(k3, (N, H))

    def field_fn(params, xs, t, h):
        from xnode_wan_tpu.models.layers import linear
        z = jnp.concatenate([xs, t[:, None], h], axis=-1)
        z = linear(params[0], z)
        for layer in params[1:-1]:
            z = linear(layer, jax.nn.relu(z))
        return linear(params[-1], jnp.tanh(z))

    results = {"N": N, "H": H, "layers": LAYERS, "device": None, "rows": []}

    for L in (20, 50, 100, 200):
        times = jnp.broadcast_to(jnp.linspace(0.0, 1.0, L)[None, :], (N, L))
        t_start = jnp.zeros((N,))
        mask = jnp.ones((N, L), dtype=bool)
        w = jax.random.normal(jax.random.PRNGKey(L), (N, L, H))

        def make_loss(mode):
            if mode == "adjoint":
                run = make_adjoint_integrator(field_fn, N_SUB, "midpoint")

                def loss(params):
                    hs = run(params, xs, h0, times, t_start, mask)
                    return jnp.sum(hs * w)
            else:
                remat = mode == "remat"

                def loss(params):
                    hs = integrate(
                        lambda t, h: field_fn(params, xs, t, h), h0,
                        times, t_start, mask, n_sub=N_SUB,
                        method="midpoint", remat=remat, unroll=1)
                    return jnp.sum(hs * w)
            return loss

        for mode in ("remat", "noremat", "adjoint"):
            fn = jax.jit(jax.value_and_grad(make_loss(mode)))
            lowered = fn.lower(params)
            compiled = lowered.compile()
            mem = compiled.memory_analysis()
            # warm
            v, g = fn(params)
            float(v)
            walls = []
            for _ in range(REPS):
                t0 = time.time()
                v, g = fn(params)
                float(v)  # device fetch = the only reliable barrier
                walls.append(time.time() - t0)
            row = {
                "L": L, "mode": mode,
                "step_ms": round(min(walls) * 1000, 2),
                "temp_mb": round(mem.temp_size_in_bytes / 2**20, 2),
                "argument_mb": round(mem.argument_size_in_bytes / 2**20, 2),
                "output_mb": round(mem.output_size_in_bytes / 2**20, 2),
            }
            results["rows"].append(row)
            print(row, flush=True)

    results["device"] = str(jax.devices()[0])
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "ab_adjoint.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
