"""High-dimension stress (d=20, structure-aware coefficients) and the f64
numerics-parity mode (the reference is float64 throughout,
reference ``src/model.py:43,78,85``)."""

import jax
import numpy as np
import pytest

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.problems import load_problem
from xnode_wan_tpu.training import NODEWANSolver


def test_d20_step_runs_without_dense_coeffs(tmp_path):
    # d=20: the reference would build a[20,20,N,L] (training.py:32-35);
    # the isotropic fast path must run a full outer step without it.
    cfg = SolverConfig(dim=20, N_t=6, N_r=32, N_b=32, u_hidden_dim=8,
                       u_hidden_hidden_dim=8, u_layers=2, v_layers=2,
                       v_hidden_dim=8, iterations=2, alpha=1e4,
                       shape_param=(-1.0, 1.0), min_steps=3)
    problem = load_problem("Ex4_3_funcs", dim=20)
    solver = NODEWANSolver(cfg, problem, work_dir=str(tmp_path))
    m = solver.train(report=False)
    assert np.isfinite(m["loss_u"])
    assert np.isfinite(m["rel_err"])


def test_x64_mode(tmp_path):
    cfg = SolverConfig(dim=2, N_t=6, N_r=32, N_b=32, u_hidden_dim=8,
                       u_hidden_hidden_dim=8, u_layers=2, v_layers=2,
                       v_hidden_dim=8, iterations=2, alpha=1e4,
                       shape_param=(-1.0, 1.0), min_steps=3, x64=True)
    problem = load_problem("cube_pde", dim=2)
    try:
        solver = NODEWANSolver(cfg, problem, work_dir=str(tmp_path))
        assert solver.state.u_params["readout"]["w"].dtype == np.float64
        m = solver.train(report=False)
        assert np.isfinite(m["loss_u"])
    finally:
        jax.config.update("jax_enable_x64", False)


def test_x64_and_f32_solvers_coexist(tmp_path):
    # The x64 solver only ever ENABLES the global flag; every array in the
    # package carries an explicit per-solver dtype, so an f32 solver built
    # afterwards (flag still on) stays f32 end-to-end (VERDICT r2 item 8).
    base = SolverConfig(dim=2, N_t=6, N_r=32, N_b=32, u_hidden_dim=8,
                        u_hidden_hidden_dim=8, u_layers=2, v_layers=2,
                        v_hidden_dim=8, iterations=2, alpha=1e4,
                        shape_param=(-1.0, 1.0), min_steps=3)
    problem = load_problem("cube_pde", dim=2)
    try:
        s64 = NODEWANSolver(base.replace(x64=True), problem,
                            work_dir=str(tmp_path / "a"))
        assert jax.config.jax_enable_x64
        s32 = NODEWANSolver(base, problem, work_dir=str(tmp_path / "b"))
        assert s64.state.u_params["readout"]["w"].dtype == np.float64
        assert s32.state.u_params["readout"]["w"].dtype == np.float32
        assert s64.state.v_params["out"]["w"].dtype == np.float64
        assert s32.state.v_params["out"]["w"].dtype == np.float32
        m64 = s64.train(report=False)
        m32 = s32.train(report=False)
        assert np.isfinite(m64["loss_u"]) and np.isfinite(m32["loss_u"])
        # f32 solver's params stayed f32 after training under the flag
        assert s32.state.u_params["readout"]["w"].dtype == np.float32
    finally:
        jax.config.update("jax_enable_x64", False)
