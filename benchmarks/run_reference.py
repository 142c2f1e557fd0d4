"""Run the ACTUAL PyTorch reference solver on CPU and measure wall-clock to
1% relative L2 on the d=5 cube PDE — the measured baseline VERDICT.md item 1
asked for (replacing bench.py's workload-matched shim estimate).

This executes ``/root/reference/src/training.py::NODE_WAN_solver`` verbatim
via imports (nothing is copied); the only scaffolding supplied here is

  * a vendored fixed-grid ``odeint`` (``vendored_odeint.py``) standing in
    for torchdiffeq, the one dependency missing from the image — the
    reference only uses fixed-grid methods (``src/model.py:103-106``);
  * working CLI plumbing: the reference's ``main.py:36,42`` hardcodes its
    argv and loads a YAML from a nonexistent path, so the params dict is
    built here in the exact key order its positional ``itertools.islice``
    split requires (``src/training.py:80-83``);
  * an instrumented ``stop`` callback implementing the reference's own
    criterion (rel_err < 0.01, ``configs/Ex4_1_funcs.py:36-37``) that also
    records the (time, rel-L2) trajectory. The reference hard-``exit()``s
    on stop (``src/training.py:142-145``); we catch the SystemExit.

Problem: the reference ``main.py``'s default pairing — ``cube_pde.yaml``
params + ``Ex4_1_funcs`` coefficients (d=5 hypercube, exact solution
``2 sin(pi x1/2) cos(pi x2/2) exp(-t)``) — the same problem bench.py runs.

Usage:
  python benchmarks/run_reference.py --n-r 400 --max-iters 2000 \
      --out benchmarks/reference_d5_nr400.json
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-r", type=int, default=400,
                    help="interior sample count (paper: 4000, notebook: 400)")
    ap.add_argument("--n-b", type=int, default=None,
                    help="boundary sample count (default: same as --n-r)")
    ap.add_argument("--max-iters", type=int, default=5000)
    ap.add_argument("--max-seconds", type=float, default=None,
                    help="abort (record plateau) after this much wall-clock")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, required=True,
                    help="JSON result path (absolute or repo-relative)")
    ap.add_argument("--workdir", type=str, default=None,
                    help="cwd for the reference's artifact dumps")
    args = ap.parse_args()

    out_path = os.path.abspath(args.out)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = os.path.abspath(
        args.workdir or os.path.join(repo, "benchmarks",
                                     f"ref_run_nr{args.n_r}"))
    os.makedirs(workdir, exist_ok=True)

    import torch
    torch.manual_seed(args.seed)
    torch.set_num_threads(os.cpu_count() or 1)

    # Vendored torchdiffeq stand-in must be registered before src.model
    # does `from torchdiffeq import odeint, odeint_adjoint`.
    sys.path.insert(0, os.path.join(repo, "benchmarks"))
    import vendored_odeint
    sys.modules["torchdiffeq"] = vendored_odeint

    sys.path.insert(0, "/root/reference")
    import numpy as np
    np.random.seed(args.seed)
    from configs import Ex4_1_funcs as funcs          # noqa: E402
    from src.training import NODE_WAN_solver          # noqa: E402
    from utils.auxillary_funcs import rel_err         # noqa: E402

    # numpy-version compat shim: src/loss.py:69 calls np.sum on a LIST of
    # torch tensors (fine under the 2020-era numpy the reference pinned;
    # modern numpy tries .numpy() on grad-tracking tensors and raises).
    # Give src.loss an `np` whose sum() uses builtin reduction for lists
    # of tensors — numerically identical. Surgical: only src.loss's view
    # of numpy changes; the real numpy module is untouched.
    import types
    # NB: `import src.loss as _` would bind the CLASS (the reference's
    # package __init__ shadows the submodule attribute); go via sys.modules.
    _ref_loss = sys.modules["src.loss"]

    _np_proxy = types.SimpleNamespace(**{k: getattr(np, k) for k in dir(np)
                                         if not k.startswith("_")})

    def _sum_compat(x, *a, **kw):
        if isinstance(x, (list, tuple)) and x and isinstance(x[0],
                                                             torch.Tensor):
            out = x[0]
            for t in x[1:]:
                out = out + t
            return out
        return np.sum(x, *a, **kw)

    _np_proxy.sum = _sum_compat
    _ref_loss.np = _np_proxy

    n_b = args.n_b if args.n_b is not None else args.n_r
    # Key order is load-bearing: islice splits positionally into
    # config(13) / setup(7) / iterations (src/training.py:80-83).
    params = {
        "alpha": 1e8, "u_layers": 8, "u_hidden_dim": 20,
        "u_hidden_hidden_dim": 10, "v_layers": 9, "v_hidden_dim": 50,
        "n1": 2, "n2": 1, "u_rate": 0.015, "v_rate": 0.04,
        "min_steps": 5, "adjoint": False, "solver": "midpoint",
        "dim": 5, "N_t": 20, "N_r": args.n_r, "N_b": n_b,
        "T0": 0, "T": 1, "shape_param": [-1, 1],
        "iterations": args.max_iters,
        "domain": "Hypercube",
    }

    trajectory = []          # (elapsed_seconds, rel_l2) per stop-check
    t_start = [None]

    def stop(solver, points, domain):
        r = rel_err(points, solver.u_net, solver.func_u_sol, solver.p,
                    domain.V(), solver.params["N_r"]).item()
        el = time.time() - t_start[0]
        trajectory.append([el, r])
        if len(trajectory) % 20 == 1:
            print(f"[ref] t={el:8.1f}s  checks={len(trajectory):4d}  "
                  f"rel_l2={r:.4f}", flush=True)
        if args.max_seconds is not None and el > args.max_seconds:
            return True
        return r < 0.01

    solver = NODE_WAN_solver(
        params, funcs.func_a, funcs.func_b, funcs.func_c, funcs.func_h,
        funcs.func_f, funcs.func_g, torch.device("cpu"), workdir + "/",
        stop=stop, func_u_sol=funcs.func_u_sol, p=2)

    os.chdir(workdir)  # the reference dumps artifacts into its cwd
    t_start[0] = time.time()
    stopped = False
    try:
        solver.train(report=False)
    except SystemExit:     # the reference's stop path calls exit()
        stopped = True
    wall = time.time() - t_start[0]

    best = min((r for _, r in trajectory), default=float("nan"))
    converged = stopped and best < 0.01
    result = {
        "problem": "cube_pde d=5 (Ex4_1_funcs + cube_pde.yaml pairing)",
        "backend": "torch CPU float64 (reference verbatim, vendored "
                   "fixed-grid midpoint odeint)",
        "threads": torch.get_num_threads(),
        "n_r": args.n_r, "n_b": n_b, "seed": args.seed,
        "converged": converged,
        "wall_clock_s": wall,
        "stop_checks": len(trajectory),
        # n1=2 stop checks per outer iteration (src/training.py:125-145)
        "outer_iterations": (len(trajectory) + 1) // 2,
        "best_rel_l2": best,
        "trajectory_time_rel_l2": trajectory,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "trajectory_time_rel_l2"}))


if __name__ == "__main__":
    main()
