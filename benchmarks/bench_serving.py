"""Serving-path throughput: fused Pallas eval kernel vs the XLA scan.

The reference's direct-point-eval recipe (`README.md:32-35`,
`src/model.py:99-106`) is the serving surface: evaluate the trained
network at arbitrary space-time points, each integrated as its own fresh
path. Here that is `models/xnode.py::evaluate_points`, which dispatches
to the fused Pallas serving kernel (`ops/pallas/xnode_eval.py`) on TPU
and to the masked-scan XLA path otherwise/by flag. This harness measures
both on the real chip:

  * d=5 cube config (the headline benchmark's model),
  * d=20 sines config (Fourier feature bank — the round-4 kernel
    extension; previously this config silently served via the scan),

at a production-shaped batch, using the relay-floor-subtracted
`device_get` barrier from `profile_step.py` (the axon relay returns from
`block_until_ready` before execution finishes, and every sync pays a
~25-32 ms round trip — both handled explicitly). A single 65536-point
dispatch finishes UNDER that floor on either path, so the timed program
chains BLOCKS independent 65536-point blocks with `lax.map` inside one
jit — the floor amortizes across blocks and the per-point number is
honest device throughput.

Writes benchmarks/bench_serving.json and prints it.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("SERVING_REPEATS", 10))
M_POINTS = int(os.environ.get("SERVING_POINTS", 65536))
BLOCKS = int(os.environ.get("SERVING_BLOCKS", 16))


def _force(out):
    import jax
    import jax.numpy as jnp
    jax.device_get(jnp.sum(out))


def timed(fn, *args, repeats=REPEATS):
    out = fn(*args)  # compile + warm
    _force(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def bench_config(cfg_path, problem_name, key, floor_s):
    import jax
    import jax.numpy as jnp

    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.models import xnode
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    cfg = load_params(cfg_path)
    problem = load_problem(problem_name, dim=cfg.dim)
    solver = NODEWANSolver(cfg, problem,
                           work_dir="/tmp/bench_serving_run")
    cfg = solver.cfg  # auto u_scale resolved
    params = solver.state.u_params

    # Interior points: uniform in the box x [T0, T] — the contour-plot /
    # ad-hoc-inference shape. Throughput does not depend on the weights.
    lo, hi = cfg.shape_param if isinstance(cfg.shape_param, (tuple, list)) \
        else (-cfg.shape_param, cfg.shape_param)
    kx, kt = jax.random.split(key)
    xs = jax.random.uniform(kx, (BLOCKS, M_POINTS, cfg.dim),
                            minval=lo, maxval=hi)
    ts = jax.random.uniform(kt, (BLOCKS, M_POINTS, 1),
                            minval=cfg.T0, maxval=cfg.T)
    pts = jnp.concatenate([ts, xs], axis=-1)

    entry = {"config": os.path.basename(cfg_path), "dim": cfg.dim,
             "fourier_features": cfg.fourier_features,
             "points_per_block": M_POINTS, "blocks_per_dispatch": BLOCKS,
             "k_steps": max(cfg.min_steps, cfg.N_t) * cfg.n_sub}
    outs = {}
    for label, use_pallas in (("fused", True), ("scan", False)):
        c = cfg.replace(use_pallas=use_pallas)

        def one_block(blk, _c=c):
            return xnode.evaluate_points(params, blk, problem, _c)

        # correctness probe: one block, full outputs
        outs[label] = jax.jit(one_block)(pts[0])

        # throughput: BLOCKS sequential blocks inside one program; each
        # block reduces to a scalar so the result transfer stays tiny
        fn = jax.jit(lambda p, q, _c=c: jax.lax.map(
            lambda blk: xnode.evaluate_points(p, blk, problem, _c).sum(),
            q))
        t, _ = timed(fn, params, pts)
        net = max(t - floor_s, 1e-9)
        entry[label] = {"ms_per_dispatch": t * 1e3,
                        "net_ms_per_block": net * 1e3 / BLOCKS,
                        "points_per_s": BLOCKS * M_POINTS / net}
    # NB: this probe runs at the DEFAULT TPU matmul precision (bf16
    # mantissas, f32 accumulate) on both backends, so ~1e-2 relative
    # drift over k_steps sequential steps is expected numerics, not a
    # backend bug — tests/test_tpu_hardware.py pins
    # default_matmul_precision("highest") and agrees to 5e-4 there.
    a, b = outs["fused"], outs["scan"]
    ref = float(jnp.max(jnp.abs(b)))
    entry["max_abs_diff"] = float(jnp.max(jnp.abs(a - b)))
    entry["max_abs_output"] = ref
    entry["rel_diff"] = entry["max_abs_diff"] / max(ref, 1e-30)
    entry["fused_speedup"] = (entry["scan"]["net_ms_per_block"]
                              / entry["fused"]["net_ms_per_block"])
    return entry


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    here = os.path.dirname(os.path.abspath(__file__))
    report = {"device": str(jax.devices()[0]), "repeats": REPEATS}

    tiny = jnp.zeros((8,))
    floor_s, _ = timed(jax.jit(lambda x: x + 1), tiny)
    report["dispatch_floor_ms"] = floor_s * 1e3

    key = jax.random.PRNGKey(7)
    report["d5_cube"] = bench_config(
        os.path.join(here, "..", "configs", "cube_pde.yaml"),
        "Ex4_1_funcs", key, floor_s)
    report["d20_sines"] = bench_config(
        os.path.join(here, "..", "configs", "highdim_d20.yaml"),
        "Ex4_3_consistent", key, floor_s)

    with open(os.path.join(here, "bench_serving.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
