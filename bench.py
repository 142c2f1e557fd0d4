"""Benchmark: wall-clock to 1% relative L2 on the d=5 cube PDE (BASELINE.json).

Runs the paper test-problem config (reference ``configs/cube_pde.yaml``:
d=5, N_t=20, N_r=N_b=4000, n1=2/n2=1, alpha=1e8, midpoint, Adam 0.015/0.04)
on the default JAX backend (the real TPU chip under the driver) until the
reference's own convergence criterion fires (relative L2 < 0.01, reference
``configs/Ex4_1_funcs.py:36-37``).

``vs_baseline``: **measured** — the actual PyTorch reference solver
(``/root/reference/src/training.py::NODE_WAN_solver`` run verbatim via
``benchmarks/run_reference.py`` with a vendored fixed-grid midpoint odeint
standing in for torchdiffeq) was run to the same <1% criterion on the same
problem/config on this machine's CPU; its wall-clock is read from
``benchmarks/reference_d5_nr4000.json``. If that file is missing, a
workload-matched torch-CPU shim of one reference outer iteration is timed
and scaled (clearly labelled ``baseline_source: "shim-estimate"``).

``BENCH_PRIMAL=wan`` switches the primal net to the paper's vanilla-WAN
baseline (plain MLP) for the XNODE-vs-WAN comparison (reference
``README.md:6-8``).

Prints ONE JSON line:
  {"metric": ..., "value": <wall-clock s to 1% rel-L2, excl. compile>,
   "unit": "s", "vs_baseline": <measured reference wall / ours>, ...}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MAX_ITERS = int(os.environ.get("BENCH_MAX_ITERS", 1500))
CHUNK = int(os.environ.get("BENCH_CHUNK", 50))
TORCH_SHIM_ITERS = int(os.environ.get("BENCH_TORCH_ITERS", 3))


def measure_torch_reference_iter() -> float:
    """Seconds per reference outer iteration (workload-matched shim, CPU)."""
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    d, n, l, steps = 5, 4000, 20, 25  # N_t=20 + fillt padding to min-step grid
    hid_u, hid_f, hid_v = 20, 10, 50

    lift = torch.nn.Sequential(
        torch.nn.Linear(1, hid_u), torch.nn.ReLU(),
        torch.nn.Linear(hid_u, hid_u), torch.nn.ReLU(),
        torch.nn.Linear(hid_u, hid_u)).double()
    field = torch.nn.Sequential(
        torch.nn.Linear(hid_u + d + 1, hid_f),
        *[m for _ in range(7) for m in
          (torch.nn.ReLU(), torch.nn.Linear(hid_f, hid_f))],
        torch.nn.Tanh(), torch.nn.Linear(hid_f, hid_u)).double()
    readout = torch.nn.Linear(hid_u, 1).double()
    v_net = torch.nn.Sequential(
        torch.nn.Linear(d + 1, hid_v),
        *[m for _ in range(9) for m in
          (torch.nn.ReLU(), torch.nn.Linear(hid_v, hid_v))],
        torch.nn.Tanh(), torch.nn.Linear(hid_v, 1)).double()
    params_u = (list(lift.parameters()) + list(field.parameters())
                + list(readout.parameters()))
    opt_u = torch.optim.Adam(params_u, lr=0.015)
    opt_v = torch.optim.Adam(v_net.parameters(), lr=0.04)

    def u_forward(x):
        # midpoint odeint along the path grid (torchdiffeq-equivalent cost)
        h = lift(x[:, :1, 1:2].reshape(n, 1))
        dt = 1.0 / steps
        outs = []
        xflat = x[:, 0, 1:]
        record = {round(i * (steps - 1) / (l - 1)) for i in range(l)}
        for k in range(steps):
            t = torch.full((n, 1), k * dt, dtype=torch.float64)
            k1 = field(torch.cat([xflat, t, h], 1))
            h = h + dt * field(torch.cat([xflat, t + dt / 2, h + dt / 2 * k1], 1))
            if k in record:
                outs.append(readout(h))
        return torch.stack(outs[:l], 1)

    def one_loss(step_u):
        x = torch.rand(n, l, d + 1, dtype=torch.float64, requires_grad=True)
        xv = torch.rand(n, l, d + 1, dtype=torch.float64, requires_grad=True)
        u = u_forward(x)
        v = v_net(xv)
        # reference func_eval: python d^2 loop building a[d,d,N,L]
        a = torch.empty(d, d, n, l, dtype=torch.float64)
        for i in range(d):
            for j in range(d):
                a[i, j] = float(i == j)
        # two input-gradient backward passes (loss.py:55,60)
        u.backward(torch.ones_like(u), retain_graph=True)
        v.backward(torch.ones_like(v), retain_graph=True)
        du, dv = x.grad, xv.grad
        s = (u.squeeze(-1) * dv[..., 0]).sum()
        for i in range(d):
            s = s + (a[i, i] * du[..., i + 1] * dv[..., i + 1]).sum()
        loss = torch.log(s ** 2) + (u[:, 0, 0] ** 2).mean()
        if step_u:
            opt_u.zero_grad()
            loss.backward()
            opt_u.step()
        else:
            opt_v.zero_grad()
            loss.backward()
            opt_v.step()

    t0 = time.time()
    for _ in range(TORCH_SHIM_ITERS):
        one_loss(True)
        one_loss(True)   # n1 = 2
        one_loss(False)  # n2 = 1
    return (time.time() - t0) / TORCH_SHIM_ITERS


def _device_preflight(
        timeout_s: int = int(os.environ.get("BENCH_PROBE_TIMEOUT", 120)),
        retries: int = int(os.environ.get("BENCH_PROBE_RETRIES", 10)),
        sleep_s: int = int(os.environ.get("BENCH_PROBE_SLEEP", 60))) -> None:
    """Fail fast (with retries) instead of hanging when the TPU relay is down.

    The axon tunnel occasionally hangs after killed processes; a bare
    ``jax.devices()`` then blocks *forever* inside backend init, which
    would make this benchmark silently record nothing. Probe in a
    subprocess with a hard timeout, retrying for ~10 min (the tunnel
    usually recovers), and emit a machine-readable error line if not.
    """
    import subprocess
    last = "unknown"
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=timeout_s)
            if r.returncode == 0:
                return
            last = (r.stderr or b"").decode()[-300:]
        except subprocess.TimeoutExpired:
            last = f"backend init hang (> {timeout_s}s)"
        print(f"[bench] device preflight {attempt + 1}/{retries} failed: "
              f"{last}", file=sys.stderr)
        if attempt < retries - 1:
            time.sleep(sleep_s)
    err = {
        "metric": "wall_clock_to_1pct_relL2_d5_cube", "value": None,
        "unit": "s", "vs_baseline": None, "converged": False,
        "error": f"TPU backend unavailable after {retries} probes: {last}",
    }
    # Attach the last successful on-TPU measurement (committed artifact)
    # so a relay outage at bench time doesn't erase the measured state —
    # clearly labelled as prior, not fresh.
    last_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "bench_last.json")
    if os.path.exists(last_path):
        with open(last_path) as fh:
            err["last_measured"] = json.load(fh)
    print(json.dumps(err))
    sys.exit(1)


def main():
    _device_preflight()
    import jax as _jax
    # persistent compile cache: repeated bench runs skip the ~3 min compile
    _jax.config.update("jax_compilation_cache_dir",
                       os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_params(os.path.join(here, "configs", "cube_pde.yaml"))
    cfg = cfg.replace(iterations=MAX_ITERS)
    primal = os.environ.get("BENCH_PRIMAL", "xnode")
    if primal != "xnode":
        cfg = cfg.replace(primal=primal)
    problem = load_problem("Ex4_1_funcs", dim=cfg.dim)
    solver = NODEWANSolver(cfg, problem, work_dir="/tmp/bench_run")

    import jax
    import jax.numpy as jnp
    tol = problem.stop_rel_err or 0.01

    # Cold pass: compiles the single-dispatch while_loop program AND runs a
    # full training to tolerance. Then reset and measure a hot pass — one
    # dispatch, one fetch, fresh trajectory.
    state0 = jax.tree.map(jnp.copy, solver.state)
    t_c = time.time()
    solver.train_until(tol, MAX_ITERS)
    compile_s = time.time() - t_c
    solver.state = state0
    print(f"[bench] cold pass (compile+run) {compile_s:.1f}s", file=sys.stderr)

    # Hot passes: repeat full training runs and keep the fastest — the chip
    # sits in a shared pool behind a relay, so single-run wall-clock mixes
    # queueing with compute; the min is the real performance number.
    walls = []
    hist = None
    for rep in range(int(os.environ.get("BENCH_REPEATS", 3))):
        solver.state = jax.tree.map(jnp.copy, state0)
        h = solver.train_until(tol, MAX_ITERS)
        # time-to-tolerance measured inside train_until: the loop until
        # the stop criterion fires, excluding the post-stop artifact
        # writes (best-weights + checkpoint msgpack files)
        walls.append(float(h["wall_train_s"]))
        print(f"[bench] hot pass {rep}: {walls[-1]:.2f}s "
              f"{h['iterations_run']} iters rel={h['rel_err_final']:.4f}",
              file=sys.stderr)
        if hist is None or walls[-1] == min(walls):
            hist = h
    wall = min(walls)
    iters = int(hist["iterations_run"])
    converged = hist["rel_err_final"] < tol
    last = {"rel_err": hist["rel_err_final"], "iterations_run": iters}
    steps_per_s = iters / wall

    # convergence-trajectory artifact (rel-L2 per iteration) for the
    # paper-parity check of error trajectories
    bench_dir = os.path.join(here, "benchmarks")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "convergence_d5.json"), "w") as fh:
        json.dump({"trajectory": {k: [float(x) for x in v]
                                  for k, v in hist.items()
                                  if hasattr(v, "__len__")},
                   "iterations": iters, "wall_s": wall,
                   "device": str(jax.devices()[0])}, fh)

    # Baseline: measured run of the actual reference solver (preferred),
    # produced by benchmarks/run_reference.py on this machine.
    baseline_s = None
    baseline_source = None
    baseline_extra = {}
    ref_json = os.path.join(here, "benchmarks", "reference_d5_nr4000.json")
    try:
        with open(ref_json) as fh:
            ref = json.load(fh)
        if ref.get("converged"):
            baseline_s = float(ref["wall_clock_s"])
            baseline_source = ("measured: reference torch-CPU solver "
                               f"({ref['threads']} thread), vendored "
                               "fixed-grid midpoint odeint")
            baseline_extra = {
                "baseline_iterations": ref["outer_iterations"],
                "baseline_rel_l2": round(ref["best_rel_l2"], 5),
            }
    except (OSError, KeyError, ValueError) as exc:
        print(f"[bench] no measured baseline ({exc!r})", file=sys.stderr)
    if baseline_s is None:
        try:
            torch_iter_s = measure_torch_reference_iter()
            print(f"[bench] torch shim {torch_iter_s:.1f}s/iter",
                  file=sys.stderr)
            baseline_s = torch_iter_s * iters
            baseline_source = "shim-estimate"
        except Exception as exc:  # torch missing/broken: no baseline
            print(f"torch shim failed: {exc!r}", file=sys.stderr)

    result = {
        "metric": "wall_clock_to_1pct_relL2_d5_cube",
        "value": round(wall, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / wall, 2) if baseline_s else None,
        "converged": bool(converged),
        "primal": cfg.primal,
        "iterations": iters,
        "rel_err": round(float(last.get("rel_err", float("nan"))), 5),
        "wall_s_all_repeats": [round(w, 2) for w in walls],
        "outer_iters_per_s": round(steps_per_s, 3),
        "train_steps_per_s": round(steps_per_s * (cfg.n1 + cfg.n2), 3),
        "compile_s": round(compile_s, 1),
        "baseline_s": round(baseline_s, 1) if baseline_s else None,
        "baseline_source": baseline_source,
        **baseline_extra,
        "device": str(jax.devices()[0]),
    }
    # Persist for the relay-down fallback (see _device_preflight): the
    # committed copy documents the last successful on-TPU measurement.
    # Only a converged TPU run qualifies — a CPU smoke or a truncated run
    # must not overwrite the real artifact.
    try:
        if not (converged and "TPU" in str(jax.devices()[0])):
            raise RuntimeError("not a converged TPU run; keeping prior")
        import subprocess
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        stamp = {"measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
                 "git_rev": rev.stdout.strip(), **result}
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "benchmarks", "bench_last.json"), "w") as fh:
            json.dump(stamp, fh, indent=1)
    except Exception as exc:
        print(f"[bench] bench_last.json not written: {exc!r}",
              file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
