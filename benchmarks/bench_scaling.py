"""Training-step throughput vs batch size (weak scaling in N_r).

DESIGN.md's shape-feasibility analysis argues the d=5 model's MFU is
capped by its 10-wide layers, not by the batch. This harness measures
how the outer step actually scales with the Monte-Carlo batch on the
real chip: one full outer step (sampling, n1 primal + n2 adversary
updates, metric forward) at N_r = N_b in {4000, 16000, 64000} on the
d=5 cube config.

Methodology: the chained-``lax.scan`` timing from
``microbench_step.py`` — K outer iterations compiled as one dispatch
via ``NODEWANSolver._outer_chunk`` (the exact program ``train()``
runs), completion forced with a ``device_get`` (under the axon relay
``block_until_ready`` returns early, DESIGN.md §11), one measured
dispatch floor subtracted, divided by K. The round-2 single-dispatch
floor-subtraction approach is NOT used here: at 4k paths the step is
~7 ms against a ~30 ms relay floor, so the floor's jitter would
dominate the signal.

Reported per size: ms/outer-step, weak-form samples/s
(N_r * N_t * (n1+n2) residual points per update cycle), and scaling
efficiency vs the 4k baseline (throughput_N / throughput_4k — 1.0
means per-sample cost is flat, >1 means bigger batches amortize
per-step fixed work).

Measured (TPU v5e, see bench_scaling.json and RESULTS.md): throughput
is FLAT — 40.7 / 40.5 / 36.9 M samples/s at 4k / 16k / 64k. The step
is already throughput-bound (not latency- or dispatch-bound) at the
paper batch, so a larger batch buys lower Monte-Carlo gradient
variance at proportional cost, not cheaper samples.

Writes benchmarks/bench_scaling.json and prints it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("SCALING_REPEATS", 5))
CHAIN = int(os.environ.get("SCALING_CHAIN", 40))
SIZES = [int(s) for s in
         os.environ.get("SCALING_SIZES", "4000,16000,64000").split(",")]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    here = os.path.dirname(os.path.abspath(__file__))
    base = load_params(os.path.join(here, "..", "configs", "cube_pde.yaml"))
    problem = load_problem("Ex4_1_funcs", dim=base.dim)

    # one relay round-trip, subtracted once per chained dispatch
    tiny = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,))
    jax.device_get(tiny(x))
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.device_get(tiny(x))
        floors.append(time.perf_counter() - t0)
    floors.sort()
    floor_s = floors[len(floors) // 2]

    report = {"device": str(jax.devices()[0]), "repeats": REPEATS,
              "chain": CHAIN, "dispatch_floor_ms": round(floor_s * 1e3, 2),
              "config": "cube_pde d=5 (N_r = N_b swept)", "sizes": []}

    thr_ref = None
    inf = jnp.asarray(float("inf"), jnp.float32)
    for n in SIZES:
        cfg = base.replace(N_r=n, N_b=n)
        solver = NODEWANSolver(cfg, problem,
                               work_dir=f"/tmp/bench_scaling_{n}")
        run = solver._outer_chunk(CHAIN)
        state, _, _, metrics = run(solver.state, inf)   # compile + warm
        jax.device_get(metrics["loss_u"])
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            state, _, _, metrics = run(state, inf)
            jax.device_get(metrics["loss_u"])
            times.append(time.perf_counter() - t0)
        times.sort()
        per_step = max(times[len(times) // 2] - floor_s, 1e-9) / CHAIN
        samples = n * cfg.N_t * (cfg.n1 + cfg.n2)
        thr = samples / per_step
        if thr_ref is None:
            thr_ref = thr
        report["sizes"].append({
            "N_r": n,
            "ms_per_outer_step": round(per_step * 1e3, 3),
            "weak_form_samples_per_s": round(thr),
            "scaling_efficiency_vs_base": round(thr / thr_ref, 3),
        })
        print(f"N_r={n}: {per_step*1e3:.2f} ms/outer step "
              f"({thr/1e6:.1f} M weak-form samples/s)",
              file=sys.stderr)
        del solver, run

    with open(os.path.join(here, "bench_scaling.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
