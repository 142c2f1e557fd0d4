"""d=20 product-of-sines stress runs (BASELINE.json config 4; VERDICT.md
round-1 item: converge <5% rel-L2 — round 1 plateaued at 17%).

Runs `Ex4_3_consistent` at d=20 with config overrides from the command
line and records the trajectory + outcome to a JSON file.

Usage:
  python benchmarks/run_d20.py --out /tmp/d20_a.json \
      fourier_features=1 u_hidden_hidden_dim=32 ensemble=4
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--tol", type=float, default=0.05)
    ap.add_argument("--max-iters", type=int, default=4000)
    ap.add_argument("--problem", default="Ex4_3_consistent")
    ap.add_argument("--fine-tune-tol", type=float, default=None,
                    help="after reaching --tol, drop lr 10x (fresh Adam) "
                         "and continue to this tolerance")
    ap.add_argument("--fine-tune-iters", type=int, default=3000)
    ap.add_argument("overrides", nargs="*",
                    help="key=value SolverConfig overrides")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_params(os.path.join(here, "..", "configs", "highdim_d20.yaml"))
    ov = {}
    for kv in args.overrides:
        k, v = kv.split("=", 1)
        try:
            v = json.loads(v)
        except ValueError:
            pass
        ov[k] = v
    cfg = cfg.replace(**ov)

    problem = load_problem(args.problem, dim=cfg.dim)
    solver = NODEWANSolver(cfg, problem, work_dir="/tmp/d20_run")
    t0 = time.time()
    hist = solver.train_until(args.tol, args.max_iters, window=100)
    rel = [float(x) for x in hist["rel_err"]]
    phase2 = None
    if (args.fine_tune_tol is not None
            and hist["rel_err_final"] < args.tol):
        solver.drop_learning_rate(0.1, lr_decay=0.99)
        h2 = solver.train_until(args.fine_tune_tol, args.fine_tune_iters,
                                window=100)
        rel += [float(x) for x in h2["rel_err"]]
        hist = dict(hist)
        hist["rel_err_final"] = h2["rel_err_final"]
        hist["iterations_run"] = (int(hist["iterations_run"])
                                  + int(h2["iterations_run"]))
        phase2 = {"tol": args.fine_tune_tol,
                  "iterations": int(h2["iterations_run"]),
                  "rel_err_final": float(h2["rel_err_final"])}
    wall = time.time() - t0
    final_tol = args.fine_tune_tol or args.tol
    result = {
        "problem": args.problem,
        "overrides": ov,
        "tol": args.tol,
        "fine_tune": phase2,
        "converged": hist["rel_err_final"] < final_tol,
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
