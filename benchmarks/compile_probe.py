"""Compile-budget probe: where does the cold-compile wall-clock go?

Times the AOT ``.lower()`` / ``.compile()`` of each entry-point program of
the d=5 cube solver (the exact programs bench.py / the CLI compile) under
the flag variations that plausibly dominate compile time, so the compile
budget can be cut where it actually is, not where it is guessed to be.

Usage:  python benchmarks/compile_probe.py [--variant NAME ...]
Writes benchmarks/compile_budget.json (merging previous runs).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_solver(**over):
    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_params(os.path.join(here, "..", "configs", "cube_pde.yaml"))
    cfg = cfg.replace(compile_cache="", **over)  # no persistent cache: raw cost
    problem = load_problem("Ex4_1_funcs", dim=cfg.dim)
    return NODEWANSolver(cfg, problem, work_dir="/tmp/compile_probe")


def probe(name, **over):
    import jax
    import jax.numpy as jnp

    t_build0 = time.time()
    solver = build_solver(**over)
    build_s = time.time() - t_build0
    # record the RESOLVED config knobs: the default scan_unroll changed
    # 0 -> 1 in round 5, so "baseline" rows from different commits are
    # only comparable through this field
    out = {"variant": name, "build_s": round(build_s, 2),
           "scan_unroll_resolved": solver.cfg.scan_unroll,
           "fused_grad_resolved": solver.cfg.fused_grad,
           "remat_resolved": solver.cfg.remat_scan}

    # 1) the single outer-step program (train() per-iteration path)
    t0 = time.time()
    lowered = jax.jit(solver._outer_step, donate_argnums=0).lower(solver.state)
    out["outer_lower_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    lowered.compile()
    out["outer_compile_s"] = round(time.time() - t0, 2)

    # 2) the train_until while_loop window program (bench.py's program)
    run = solver._build_train_until(200)
    t0 = time.time()
    lowered = run.lower(solver.state, jnp.asarray(0.01, jnp.float32),
                        jnp.asarray(8, jnp.int32))
    out["until_lower_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    lowered.compile()
    out["until_compile_s"] = round(time.time() - t0, 2)

    # 3) hot-step time (so compile cuts can be weighed against step cost):
    # fixed-size dispatches, timed to the (k, rel) device fetch — under
    # the axon relay block_until_ready alone can return early, so the
    # fetch is the only reliable completion barrier.
    compiled = run  # jit object; now warm
    for rep, cap in enumerate((50, 100)):
        t0 = time.time()
        state, k_d, rel_d, hist = compiled(
            solver.state, jnp.asarray(1e-12, jnp.float32),
            jnp.asarray(cap, jnp.int32))
        k, rel = jax.device_get((k_d, rel_d))
        out[f"run{cap}_s"] = round(time.time() - t0, 3)
        solver.state = state
        assert int(k) == cap, (int(k), cap)
    # the 100-iter dispatch timing (the 50-iter one can still carry the
    # jit-path compile: AOT .lower().compile() above does not populate the
    # jit call cache); ~28 ms of it is the relay round-trip floor
    out["step_ms"] = round(out["run100_s"] / 100 * 1000, 3)
    out["rel_after_150"] = round(float(rel), 4)
    out["device"] = str(jax.devices()[0])
    return out


VARIANTS = {
    "baseline": {},
    "no_fused": {"fused_grad": False, "use_pallas": False},
    "unroll4": {"scan_unroll": 4},
    "unroll1": {"scan_unroll": 1},
    "no_fused_unroll4": {"fused_grad": False, "use_pallas": False,
                         "scan_unroll": 4},
    "no_fused_unroll1": {"fused_grad": False, "use_pallas": False,
                         "scan_unroll": 1},
    "no_remat": {"remat_scan": False},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", action="append", default=None)
    args = ap.parse_args()
    names = args.variant or list(VARIANTS)

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "compile_budget.json")
    results = {}
    if os.path.exists(path):
        with open(path) as fh:
            results = json.load(fh)

    for name in names:
        print(f"[probe] {name} ...", file=sys.stderr, flush=True)
        r = probe(name, **VARIANTS[name])
        print(json.dumps(r), flush=True)
        results[name] = r
        with open(path, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
