"""Outer-step time attribution + MFU (VERDICT.md round-1 item 5).

Times each component of the d=5 cube outer iteration as its own jitted
program (compile excluded, medians over repeats):

  * domain resampling alone,
  * primal loss+grad (the weak form: 1 nonlinear + d linearized scans,
    per-point v/phi grads, init/bdry terms, backward),
  * adversarial loss+grad,
  * one optax Adam update per net,
  * the fused full outer step (what training actually dispatches),

plus an analytic FLOP count of the step -> achieved FLOP/s and MFU vs the
chip peak. Writes benchmarks/profile_d5.json and optionally a
jax.profiler trace (PROFILE_TRACE_DIR=...).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("PROFILE_REPEATS", 20))


def _force(out):
    """Materialize a value that depends on the whole computation.

    NB: under the axon relay ``jax.block_until_ready`` returns before
    device execution completes (it waits on the handle, not the work) —
    timings taken with it are pure dispatch latency (~0.3-0.7 ms) however
    large the program. ``device_get`` of real leaves is the only honest
    barrier here. Verified: 111 chained outer steps give 21 ms/iter under
    device_get vs a fake 0.34 ms/iter under block_until_ready.
    """
    import jax
    import jax.numpy as jnp
    leaves = jax.tree.leaves(out)
    # scalar-reduce on device, transfer 4 bytes — don't pollute the timing
    # with megabyte result downloads
    jax.device_get(jnp.sum(leaves[-1]) + jnp.sum(leaves[0]))


def timed(fn, *args, repeats=REPEATS):
    out = fn(*args)          # compile
    _force(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def flops_estimate(cfg, n_steps_total):
    """Analytic forward-pass matmul FLOPs of one outer iteration (lower
    bound; backward ~2x forward, tangents x(d+1) on the primal side)."""
    d, n, l = cfg.dim, cfg.N_r, cfg.N_t
    hu, hh, hv = cfg.u_hidden_dim, cfg.u_hidden_hidden_dim, cfg.v_hidden_dim
    # field MLP: (hu+d+1)->hh x layers -> hu, two evals per midpoint substep
    per_field = 2 * ((hu + d + 1) * hh + hh * hh * (cfg.u_layers - 1)
                     + hh * hu)
    field_calls = 2 * n_steps_total * n          # 2 per midpoint step
    u_fwd = per_field * field_calls + 2 * n * (1 * hu + hu * hu * 2 + hu)
    v_fwd = 2 * n * l * ((d + 1) * hv + hv * hv * (cfg.v_layers - 1) + hv)
    # u side: nonlinear + d tangent passes, then reverse pass (~2x);
    # v side: fwd + per-point value_and_grad (~3x fwd)
    total = (cfg.n1 + cfg.n2) * (u_fwd * (1 + d + 2) + v_fwd * 3)
    return total


def main():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xnode_wan_tpu.config import load_params
    from xnode_wan_tpu.problems import load_problem
    from xnode_wan_tpu.training import NODEWANSolver

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_params(os.path.join(here, "..", "configs", "cube_pde.yaml"))
    problem = load_problem("Ex4_1_funcs", dim=cfg.dim)
    solver = NODEWANSolver(cfg, problem, work_dir="/tmp/profile_run")
    state = solver.state
    key = jax.random.PRNGKey(123)

    report = {"config": "cube_pde d=5 N_r=4000", "repeats": REPEATS,
              "device": str(jax.devices()[0])}

    # Relay round-trip floor: a trivial program through the same barrier.
    # Every *_ms below includes this constant; subtract it for device time.
    tiny = jnp.zeros((8,))
    t_floor, _ = timed(jax.jit(lambda x: x + 1), tiny)
    report["dispatch_floor_ms"] = t_floor * 1e3

    # --- components ---
    sample = jax.jit(solver._sample)
    t_sample, (batch, bbatch, vbatch) = timed(sample, key)
    report["sample_ms"] = t_sample * 1e3

    loss_u_grad = jax.jit(jax.value_and_grad(solver._loss_u, has_aux=True))
    t_lu, _ = timed(loss_u_grad, state.u_params, state.v_params, batch,
                    bbatch, vbatch)
    report["loss_u_grad_ms"] = t_lu * 1e3

    loss_v_grad = jax.jit(jax.value_and_grad(solver._loss_v, has_aux=True))
    t_lv, _ = timed(loss_v_grad, state.v_params, state.u_params, batch,
                    vbatch)
    report["loss_v_grad_ms"] = t_lv * 1e3

    # forward-only u and the d-tangent pass, to split the primal cost
    fwd_u = jax.jit(lambda p, b: solver._u_apply(p, b, problem, solver.cfg))
    t_fu, _ = timed(fwd_u, state.u_params, batch)
    report["u_forward_ms"] = t_fu * 1e3

    from xnode_wan_tpu.ops.weak_form import u_with_spatial_grad
    fwd_du = jax.jit(lambda p, b: u_with_spatial_grad(
        solver._u_apply, p, b, problem, solver.cfg))
    t_fdu, _ = timed(fwd_du, state.u_params, batch)
    report["u_forward_plus_tangents_ms"] = t_fdu * 1e3

    from xnode_wan_tpu.ops.weak_form import v_phi_and_grads
    fwd_v = jax.jit(lambda p, x: v_phi_and_grads(
        solver._v_apply, p, x, solver.domain.func_w))
    t_fv, _ = timed(fwd_v, state.v_params, batch.x)
    report["v_phi_grads_ms"] = t_fv * 1e3

    adam = jax.jit(lambda g, o, p: solver._tx_u.update(g, o, p))
    _, (aux, grads) = timed(loss_u_grad, state.u_params, state.v_params,
                            batch, bbatch, vbatch, repeats=1)
    t_adam, _ = timed(adam, grads, state.opt_u, state.u_params)
    report["adam_update_ms"] = t_adam * 1e3

    # --- the real fused step (non-donating jit so repeats can reuse state)
    outer = jax.jit(solver._step_fn)
    t_outer, _ = timed(outer, state)
    report["outer_step_ms"] = t_outer * 1e3

    # --- net (floor-subtracted) device times ---
    floor = t_floor
    for k in list(report):
        if k.endswith("_ms") and k != "dispatch_floor_ms":
            report[k.replace("_ms", "_net_ms")] = max(
                0.0, report[k] - floor * 1e3)

    # --- MFU (on the net outer-step device time) ---
    t_net = max(t_outer - floor, 1e-6)
    n_steps_total = (cfg.N_t - 1) * solver.cfg.n_sub
    fl = flops_estimate(solver.cfg, n_steps_total)
    report["flops_per_outer_step_est"] = fl
    report["achieved_tflops"] = fl / t_net / 1e12
    peak = float(os.environ.get("PEAK_TFLOPS_BF16", 394))  # v5e ~394 bf16
    report["peak_tflops_assumed"] = peak
    report["mfu_pct"] = 100.0 * fl / t_net / 1e12 / peak

    trace_dir = os.environ.get("PROFILE_TRACE_DIR")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)
        for _ in range(5):
            state, m = solver._outer(state)
        jax.block_until_ready(m)
        jax.profiler.stop_trace()
        report["trace_dir"] = trace_dir

    with open(os.path.join(here, "profile_d5.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
