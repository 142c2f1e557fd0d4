"""Run any config/problem scenario to a rel-L2 tolerance and record the
trajectory + outcome (round-2 regression runs for benchmarks/RESULTS.md).

Usage:
  python benchmarks/run_scenario.py --config configs/hourglass_pde.yaml \
      --problem Ex4_1_funcs --tol 0.01 --max-iters 1500 \
      --out /tmp/hourglass.json [key=value overrides...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--problem", required=True)
    ap.add_argument("--tol", type=float, default=0.01)
    ap.add_argument("--max-iters", type=int, default=2000)
    ap.add_argument("--window", type=int, default=100)
    ap.add_argument("--out", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    cfg = load_params(args.config)
    ov = {}
    for kv in args.overrides:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except ValueError:
            pass
        ov[k] = v
    if ov:
        cfg = cfg.replace(**ov)

    problem = load_problem(args.problem, dim=cfg.dim)
    solver = NODEWANSolver(cfg, problem, work_dir="/tmp/scenario_run")
    t0 = time.time()
    hist = solver.train_until(args.tol, args.max_iters, window=args.window)
    wall = time.time() - t0

    rel = [float(x) for x in hist["rel_err"]]
    result = {
        "config": args.config, "problem": args.problem,
        "overrides": ov, "tol": args.tol,
        "converged": hist["rel_err_final"] < args.tol,
        "rel_err_final": float(hist["rel_err_final"]),
        "best_rel_err": min(rel) if rel else None,
        "iterations_run": int(hist["iterations_run"]),
        "wall_s": wall,
        "rel_err_every_10": rel[::10],
        "device": str(jax.devices()[0]),
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "rel_err_every_10"}))


if __name__ == "__main__":
    main()
