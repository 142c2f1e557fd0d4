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
    ap.add_argument("--fine-tune-tol", type=float, default=None,
                    help="two-phase: after reaching --tol, drop the "
                         "learning rate 10x and continue to this tolerance "
                         "(superseded by --stall-action drop_lr, which "
                         "triggers the same recipe automatically)")
    ap.add_argument("--fine-tune-iters", type=int, default=4000)
    ap.add_argument("--stall-action", default="none",
                    choices=["none", "drop_lr", "reinit_v", "restart"],
                    help="train_until stall self-healing (drop_lr = the "
                         "automatic two-phase lr recipe inside the solver)")
    ap.add_argument("--max-lr-drops", type=int, default=1)
    ap.add_argument("--drop-lr-at", type=float, default=0.0,
                    help="milestone-triggered 10x lr drop: fires the "
                         "first time the rel-err crosses this value "
                         "(the paper-style refinement handoff)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    # Bounded backend probe (the axon relay occasionally hangs after
    # killed processes; a bare import-and-init would block forever).
    from bench import _device_preflight
    _device_preflight()

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
    hist = solver.train_until(args.tol, args.max_iters, window=args.window,
                              stall_action=args.stall_action,
                              max_lr_drops=args.max_lr_drops,
                              drop_lr_at=args.drop_lr_at)
    phase2 = None
    if (args.fine_tune_tol is not None
            and hist["rel_err_final"] < args.tol):
        # two-phase refinement (the d=20 product-of-sines recipe):
        # 10x lr drop with fresh Adam moments, then descend to the
        # tighter tolerance
        solver.drop_learning_rate(0.1, lr_decay=0.99)
        h2 = solver.train_until(args.fine_tune_tol, args.fine_tune_iters,
                                window=args.window)
        phase2 = {"tol": args.fine_tune_tol,
                  "iterations_run": int(h2["iterations_run"]),
                  "rel_err_final": float(h2["rel_err_final"]),
                  "rel_err_every_10":
                      [float(x) for x in h2["rel_err"]][::10]}
        hist["rel_err_final"] = h2["rel_err_final"]
        hist["iterations_run"] += h2["iterations_run"]
        import numpy as _np
        hist["rel_err"] = _np.concatenate([hist["rel_err"], h2["rel_err"]])
    wall = time.time() - t0
    final_tol = (args.fine_tune_tol if args.fine_tune_tol is not None
                 else args.tol)

    # Provenance: the committed artifact must pin down exactly what ran
    # (round-2 VERDICT item 5 — every RESULTS.md number needs a committed
    # artifact plus the command that reproduces it).
    import hashlib
    import subprocess
    cfg_sha = hashlib.sha256(open(args.config, "rb").read()).hexdigest()[:12]
    try:
        git_rev = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__))).decode().strip()
    except Exception:
        git_rev = None

    rel = [float(x) for x in hist["rel_err"]]
    result = {
        "config": args.config, "config_sha256": cfg_sha,
        "problem": args.problem,
        "overrides": ov, "tol": args.tol, "seed": int(cfg.seed),
        "git_rev": git_rev, "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "command": "python benchmarks/run_scenario.py --config "
                   f"{args.config} --problem {args.problem} --tol {args.tol}"
                   f" --max-iters {args.max_iters} --window {args.window}"
                   + (f" --fine-tune-tol {args.fine_tune_tol}"
                      f" --fine-tune-iters {args.fine_tune_iters}"
                      if args.fine_tune_tol is not None else "")
                   + (f" --stall-action {args.stall_action}"
                      if args.stall_action != "none" else "")
                   + (f" --max-lr-drops {args.max_lr_drops}"
                      if args.max_lr_drops != 1 else "")
                   + (f" --drop-lr-at {args.drop_lr_at}"
                      if args.drop_lr_at > 0 else "")
                   + ("".join(" " + kv for kv in args.overrides)),
        "fine_tune": phase2,
        "stall_action": args.stall_action,
        "max_lr_drops": args.max_lr_drops,
        "drop_lr_at": args.drop_lr_at,
        "lr_drops_at": [int(x) for x in hist.get("lr_drops_at", [])],
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
