"""Honest per-outer-step timing: chained ``lax.scan`` steps, synced once.

The round-2 floor-subtracted single-dispatch harness
(``profile_step.py``) is noisy at the single-digit-millisecond scale —
the relay round-trip floor (~26-32 ms) swamps the quantity being
measured. This harness times K *chained* outer iterations compiled as
one ``lax.scan`` program (``NODEWANSolver._outer_chunk`` — the exact
program ``train_chunked``/``bench.py`` run), forces completion with a
``device_get`` of the stacked metrics (under the axon relay
``block_until_ready`` returns before execution finishes — see
docs/DESIGN.md §11), and divides: per-iteration time with one relay
round-trip amortized over K.

Every iteration draws fresh samples and updates real parameters through
the scan carry, so XLA cannot constant-fold or hoist the gradient work
(an earlier draft perturbed a dummy carry with ``* 0.0`` and XLA deleted
the entire loss computation — numbers looked 3x too good).

Usage:
  python benchmarks/microbench_step.py [--config configs/cube_pde.yaml]
      [--chunk 100] [--repeats 5] [--fused-off]
      [--fused-bf16]                  # bf16-matmul A/B (DESIGN.md §14)
      [--set fused_v=true]            # adversary-kernel A/B arm

Writes benchmarks/microbench_step.json unless --no-write.
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(ROOT,
                                                     "configs/cube_pde.yaml"))
    ap.add_argument("--problem", default="Ex4_1_funcs")
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--fused-off", action="store_true",
                    help="also time with fused_grad=false for comparison")
    ap.add_argument("--no-write", action="store_true")
    ap.add_argument("--out", default=None,
                    help="output path (default microbench_step.json; use "
                         "e.g. microbench_adaptive_dopri5.json for "
                         "--set solver=... rows)")
    ap.add_argument("--scan-unroll", type=int, default=None,
                    help="override cfg.scan_unroll (compile-time vs "
                         "runtime tradeoff grid; 0 = full unroll)")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="override any SolverConfig field, e.g. "
                         "--set fused_chunk=true --set dim=50 "
                         "(bool/int/float coerced from the field's "
                         "current type)")
    ap.add_argument("--fused-bf16", action="store_true",
                    help="A/B: run the fused kernels' matmuls in bf16 "
                         "with f32 accumulation (sets "
                         "xnode_train.MM_DTYPE before tracing)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    if args.fused_bf16:
        import jax.numpy as jnp
        from xnode_wan_tpu.ops.pallas import xnode_train
        xnode_train.MM_DTYPE = jnp.bfloat16

    def coerce(cfg, kv: str):
        k, v = kv.split("=", 1)
        if k == "fused_grad":
            raise SystemExit("--set fused_grad is controlled per-arm by "
                             "this harness; use --fused-off for the A/B")
        try:
            cur = getattr(cfg, k)
        except AttributeError:
            import dataclasses
            names = ", ".join(sorted(
                f.name for f in dataclasses.fields(cfg)))
            raise SystemExit(
                f"--set {k}: unknown config field. Valid fields: {names}")
        if isinstance(cur, bool):
            low = v.lower()
            if low in ("1", "true", "yes"):
                val = True
            elif low in ("0", "false", "no"):
                val = False
            else:
                raise SystemExit(f"--set {k}={v}: not a bool literal")
        elif isinstance(cur, int):
            val = int(v)
        elif isinstance(cur, float):
            val = float(v)
        elif isinstance(cur, str):
            val = v.strip('"')
        else:
            raise SystemExit(f"--set {k}: field type "
                             f"{type(cur).__name__} not supported here")
        return cfg.replace(**{k: val})

    def time_variant(fused: bool) -> dict:
        cfg = load_params(args.config)
        if args.scan_unroll is not None:
            cfg = cfg.replace(scan_unroll=args.scan_unroll)
        for kv in args.set:
            cfg = coerce(cfg, kv)
        # per-arm selector LAST so --set cannot silently collapse the A/B
        cfg = cfg.replace(fused_grad=fused)
        problem = load_problem(args.problem, dim=cfg.dim)
        solver = NODEWANSolver(cfg, problem, work_dir="/tmp/microbench_run")
        import jax.numpy as jnp
        run = solver._outer_chunk(args.chunk)
        inf = jnp.asarray(float("inf"), jnp.float32)
        # warm-up: compile + one full execution
        t0 = time.time()
        state, _, _, metrics = run(solver.state, inf)
        jax.device_get(metrics["loss_u"])
        compile_s = time.time() - t0
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            state, _, _, metrics = run(state, inf)
            # device_get of a value depending on every iteration forces
            # real completion through the relay
            jax.device_get(metrics["loss_u"])
            times.append(time.time() - t0)
        best = min(times)
        return {
            "fused_grad": fused,
            "chunk": args.chunk,
            "repeats": args.repeats,
            "compile_plus_first_run_s": round(compile_s, 2),
            "wall_s_per_chunk": [round(t, 4) for t in times],
            "ms_per_outer_step": round(1e3 * best / args.chunk, 3),
        }

    results = {"config": os.path.relpath(args.config, ROOT),
               "problem": args.problem,
               "overrides": list(args.set),
               "scan_unroll": args.scan_unroll,
               "device": str(jax.devices()[0]),
               "fused": time_variant(True)}
    if args.fused_off:
        results["xla"] = time_variant(False)
    print(json.dumps(results, indent=1))
    if not args.no_write:
        out = args.out or os.path.join(HERE, "microbench_step.json")
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
