"""Multi-device tests on the 8-way virtual CPU mesh (the stand-in for a TPU
slice; SURVEY §4). Sharded and single-device training must agree."""

import jax
import numpy as np
import pytest

from xnode_wan_tpu.config import SolverConfig
from xnode_wan_tpu.parallel.mesh import make_mesh, round_up
from xnode_wan_tpu.problems import load_problem
from xnode_wan_tpu.training import NODEWANSolver

CFG = SolverConfig(dim=2, N_t=6, N_r=64, N_b=64, u_hidden_dim=8,
                   u_hidden_hidden_dim=8, u_layers=2, v_layers=3,
                   v_hidden_dim=12, iterations=5, alpha=1e4,
                   shape_param=(-1.0, 1.0), min_steps=3, seed=7)


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def test_round_up():
    assert round_up(4000, 8) == 4000
    assert round_up(4001, 8) == 4008
    assert round_up(1, 8) == 8


def test_sharded_matches_single_device(tmp_path, problem=None):
    problem = load_problem("cube_pde", dim=2)
    single = NODEWANSolver(CFG, problem, work_dir=str(tmp_path / "s"),
                           devices=jax.devices()[:1])
    assert single.mesh is None
    m1 = single.train(report=False)

    mesh = make_mesh(jax.devices())
    sharded = NODEWANSolver(CFG, problem, work_dir=str(tmp_path / "m"),
                            mesh=mesh)
    assert sharded.mesh.size == 8
    m8 = sharded.train(report=False)

    # identical seeds => same trajectory up to reduction-order noise
    assert m8["loss_u"] == pytest.approx(m1["loss_u"], rel=1e-3)
    assert m8["rel_err"] == pytest.approx(m1["rel_err"], rel=1e-3)


def test_batch_actually_sharded():
    problem = load_problem("cube_pde", dim=2)
    mesh = make_mesh(jax.devices())
    solver = NODEWANSolver(CFG, problem, mesh=mesh, work_dir="/tmp/shardchk")

    batch, _, _ = jax.jit(solver._sample)(jax.random.PRNGKey(0))
    shardings = batch.x.sharding
    # the path axis is split over all 8 devices
    assert len(shardings.device_set) == 8


def test_2d_mesh_tangent_parallel(tmp_path):
    """4x2 (data x tangent) mesh: trajectory matches the 1-D mesh."""
    from xnode_wan_tpu.parallel.mesh import make_mesh_2d
    problem = load_problem("cube_pde", dim=2)
    cfg = CFG.replace(iterations=3, tangent_shards=2)
    mesh = make_mesh_2d(jax.devices(), tangent_shards=2)
    assert mesh.shape == {"data": 4, "tangent": 2}
    s2d = NODEWANSolver(cfg, problem, work_dir=str(tmp_path / "2d"),
                        mesh=mesh)
    m2 = s2d.train(report=False)
    s1d = NODEWANSolver(CFG.replace(iterations=3), problem,
                        work_dir=str(tmp_path / "1d"),
                        devices=jax.devices()[:1])
    m1 = s1d.train(report=False)
    assert m2["loss_u"] == pytest.approx(m1["loss_u"], rel=1e-3)


def test_odd_batch_rounded_to_shards():
    problem = load_problem("cube_pde", dim=2)
    mesh = make_mesh(jax.devices())
    solver = NODEWANSolver(CFG.replace(N_r=61, N_b=63), problem, mesh=mesh,
                           work_dir="/tmp/shardrnd")
    assert solver.cfg.N_r % 8 == 0 and solver.cfg.N_b % 8 == 0
