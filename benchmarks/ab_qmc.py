"""A/B: i.i.d. uniform vs randomized-QMC (qmc: halton) sample clouds on
the headline d=5 cube benchmark (configs/cube_pde.yaml, Ex4_1_funcs).

The weak-form loss, its gradients and the stop metric are MC estimates;
`qmc: halton` (DESIGN.md §15) lowers their variance at zero per-step
cost. This harness measures whether that translates into fewer
iterations to the 1% rel-L² stop criterion — the headline quantity —
across seeds, in one process (shared in-process + persistent compile
cache), and writes benchmarks/ab_qmc.json.

Usage: python benchmarks/ab_qmc.py [--seeds 5] [--tol 0.01]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--tol", type=float, default=0.01)
    ap.add_argument("--max-iters", type=int, default=1000)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ab_qmc.json"))
    args = ap.parse_args()

    from bench import _device_preflight
    _device_preflight()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    here = os.path.dirname(os.path.abspath(__file__))
    cfg0 = load_params(os.path.join(here, "..", "configs", "cube_pde.yaml"))
    problem = load_problem("Ex4_1_funcs", dim=cfg0.dim)

    runs = {}
    for arm in ("none", "halton"):
        rows = []
        for seed in range(args.seeds):
            cfg = cfg0.replace(qmc=arm, seed=seed,
                               iterations=args.max_iters)
            solver = NODEWANSolver(cfg, problem, work_dir="/tmp/ab_qmc_run")
            t0 = time.time()
            hist = solver.train_until(args.tol, args.max_iters)
            rows.append({
                "seed": seed,
                "iterations_run": int(hist["iterations_run"]),
                "converged": bool(hist["rel_err_final"] < args.tol),
                "rel_err_final": float(hist["rel_err_final"]),
                "wall_train_s": float(hist["wall_train_s"]),
                "wall_total_s": time.time() - t0,
            })
            print(f"[ab] qmc={arm} seed={seed}: "
                  f"{rows[-1]['iterations_run']} iters "
                  f"rel={rows[-1]['rel_err_final']:.4f} "
                  f"wall={rows[-1]['wall_train_s']:.2f}s", file=sys.stderr)
        runs[arm] = rows

    def med(vals):
        s = sorted(vals)
        return s[len(s) // 2]

    try:
        git_rev = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=here).decode().strip()
    except Exception:
        git_rev = None
    import jax as _j
    summary = {
        "config": "configs/cube_pde.yaml", "problem": "Ex4_1_funcs",
        "tol": args.tol, "seeds": args.seeds, "git_rev": git_rev,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "device": str(_j.devices()[0]),
        "runs": runs,
        "median_iters": {a: med([r["iterations_run"] for r in rows])
                         for a, rows in runs.items()},
        "median_wall_train_s": {a: med([r["wall_train_s"] for r in rows])
                                for a, rows in runs.items()},
        "all_converged": {a: all(r["converged"] for r in rows)
                          for a, rows in runs.items()},
    }
    with open(args.out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("median_iters", "median_wall_train_s",
                       "all_converged")}))


if __name__ == "__main__":
    main()
