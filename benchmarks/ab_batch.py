"""A/B: Monte-Carlo batch size as a CONVERGENCE lever (round-4 VERDICT
item 2).

``benchmarks/bench_scaling.json`` shows weak-form throughput flat at
~40 M samples/s from N_r=4k to 64k — the batch axis is essentially free
on one chip up to 16x the paper's N_r=4000. This harness asks the
question that measurement left open: does a bigger batch (lower MC
gradient noise) cut *iterations-to-tolerance* enough to win *wall-clock*
to tolerance — the headline metric — and does it stack with ``qmc:
halton``?

Arms: N_r = N_b in {4000, 16000, 64000} x qmc in {none, halton}, each
over several seeds, on the d=5 cube (configs/cube_pde.yaml, reference
stop criterion rel-L2 < 1%). Optionally --config/--problem for the
moving-domain (cone) variant.

Writes benchmarks/ab_batch.json.
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
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--tol", type=float, default=0.01)
    ap.add_argument("--max-iters", type=int, default=1000)
    ap.add_argument("--config", default="configs/cube_pde.yaml")
    ap.add_argument("--problem", default="Ex4_1_funcs")
    ap.add_argument("--batches", default="4000,16000,64000")
    ap.add_argument("--qmc", default="none,halton")
    ap.add_argument("--out", default=None)
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
    root = os.path.dirname(here)
    cfg0 = load_params(os.path.join(root, args.config))
    problem = load_problem(args.problem, dim=cfg0.dim)
    out_path = args.out or os.path.join(
        here, "ab_batch" + ("" if "cube" in args.config else "_cone")
        + ".json")

    runs = []
    for n_r in [int(x) for x in args.batches.split(",")]:
        for arm in args.qmc.split(","):
            for seed in range(args.seeds):
                cfg = cfg0.replace(N_r=n_r, N_b=n_r, qmc=arm, seed=seed,
                                   iterations=args.max_iters)
                solver = NODEWANSolver(cfg, problem,
                                       work_dir="/tmp/ab_batch_run")
                t0 = time.time()
                hist = solver.train_until(args.tol, args.max_iters)
                row = {
                    "N_r": n_r, "qmc": arm, "seed": seed,
                    "iterations_run": int(hist["iterations_run"]),
                    "converged": float(hist["rel_err_final"]) < args.tol,
                    "rel_err_final": float(hist["rel_err_final"]),
                    "wall_train_s": round(float(hist["wall_train_s"]), 3),
                    "wall_total_s": round(time.time() - t0, 3),
                }
                runs.append(row)
                print(row, flush=True)

    try:
        rev = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=root).decode().strip()
    except Exception:
        rev = None
    # per-arm summary: median iterations / wall over seeds
    import statistics
    summary = {}
    for n_r in sorted({r["N_r"] for r in runs}):
        for arm in sorted({r["qmc"] for r in runs}):
            sel = [r for r in runs if r["N_r"] == n_r and r["qmc"] == arm]
            if sel:
                summary[f"N_r={n_r},qmc={arm}"] = {
                    "median_iters": statistics.median(
                        r["iterations_run"] for r in sel),
                    "median_wall_s": round(statistics.median(
                        r["wall_train_s"] for r in sel), 3),
                    "n_converged": sum(r["converged"] for r in sel),
                    "n": len(sel),
                }
    result = {
        "config": args.config, "problem": args.problem, "tol": args.tol,
        "seeds": args.seeds, "git_rev": rev,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "device": str(jax.devices()[0]),
        "summary": summary, "runs": runs,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
