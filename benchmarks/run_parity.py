"""ONE all-parity-flags f64 d=5 trajectory (round-4 VERDICT item 6).

Runs the paper d=5 cube config with EVERY reference-parity flag engaged —

  * ``x64: true``            — the reference's float64 numerics,
  * ``s1_raw_v: true``       — temporal boundary term with raw v
                               (reference ``src/loss.py:64``),
  * ``independent_uv: true`` — independent u/v interior clouds, paired
                               elementwise (``src/dataset.py:306-310``),
  * ``init_all_rows: true``  — init penalty on every row
                               (``src/loss.py:78-80``),
  * ``u_scale: 1``           — no output normalization (default),

— to the reference's own stop criterion (rel-L2 < 1%) and writes the
trajectory to ``benchmarks/convergence_d5_parity.json`` in the same
schema bench.py uses, so ``compare_trajectories.py`` can put it on the
same axes as the measured torch reference runs. f64 is a CPU run (the
TPU has no native f64; the measured reference baseline is torch-CPU on
this same machine, so the comparison is also like-for-like hardware).

Usage: python benchmarks/run_parity.py [--max-iters 1500] [--tol 0.01]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tol", type=float, default=0.01)
    ap.add_argument("--max-iters", type=int, default=1500)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")  # f64: no native TPU support

    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_params(os.path.join(here, "..", "configs", "cube_pde.yaml"))
    cfg = cfg.replace(x64=True, s1_raw_v=True, independent_uv=True,
                      init_all_rows=True, iterations=args.max_iters)
    problem = load_problem("Ex4_1_funcs", dim=cfg.dim)
    solver = NODEWANSolver(cfg, problem, work_dir="/tmp/parity_run")

    t0 = time.time()
    hist = solver.train_until(args.tol, args.max_iters)
    wall = time.time() - t0

    out = {
        "trajectory": {k: [float(x) for x in v] for k, v in hist.items()
                       if hasattr(v, "__len__")},
        "iterations": int(hist["iterations_run"]),
        "wall_s": float(hist["wall_train_s"]),
        "wall_total_s": wall,
        "rel_err_final": float(hist["rel_err_final"]),
        "converged": float(hist["rel_err_final"]) < args.tol,
        "parity_flags": {"x64": True, "s1_raw_v": True,
                         "independent_uv": True, "init_all_rows": True},
        "device": str(jax.devices()[0]),
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    path = os.path.join(here, "convergence_d5_parity.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "trajectory"},
                     indent=1))


if __name__ == "__main__":
    main()
